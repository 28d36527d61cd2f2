package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CountMin sketch: bucket parity with Spark's xxhash64 builtin (what the
  * SQL probe path depends on), partitioning-invariant merge, exactness in
  * the collision-free regime, and the overestimate guarantee under forced
  * collisions (W = 2).
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  test("version gate: an untagged (pre-r14) grid fails with the versioned message") {
    // a v1-era buffer: the bare D*W*8 grid, no header word
    val v1 = new Array[Byte](CountMin.D * CountMin.W * 8)
    Seq[Array[Byte] => Any](
      b => CountMin.reduce(b, "tok"),
      b => CountMin.merge(b, CountMin.zero),
      b => CountMin.merge(CountMin.zero, b),
      b => CountMin.finish(b)).foreach { f =>
      val e = intercept[IllegalStateException](f(v1))
      assert(e.getMessage.contains("layout v2"), e.getMessage)
      assert(e.getMessage.contains("discard the streaming checkpoint"), e.getMessage)
    }
    // a mismatched GRID SHAPE is also a layout error, not a misparse
    val other = new CountMinSketch(2, 8)
    assert(
      intercept[IllegalStateException](CountMin.merge(CountMin.zero, other.zero)).getMessage
        .contains("layout v2"))
  }

  test("bucket() is bit-identical to pmod(xxhash64(tok, i), W)") {
    val toks = Seq("alpha", "beta", "yotta zeta", "", "日本語", "x")
    val fromSql = toks
      .toDF("tok")
      .select(
        col("tok"),
        pmod(xxhash64(col("tok"), lit(0L)), lit(CountMin.W.toLong)).as("b0"),
        pmod(xxhash64(col("tok"), lit(1L)), lit(CountMin.W.toLong)).as("b1"),
        pmod(xxhash64(col("tok"), lit(2L)), lit(CountMin.W.toLong)).as("b2"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    toks.foreach { t =>
      val (b0, b1, b2) = fromSql(t)
      assert(CountMin.bucket(t, 0).toLong == b0, s"row0 '$t'")
      assert(CountMin.bucket(t, 1).toLong == b1, s"row1 '$t'")
      assert(CountMin.bucket(t, 2).toLong == b2, s"row2 '$t'")
    }
  }

  test("sketch is partitioning-invariant (element-wise-add merge)") {
    val data = (1 to 500).map(i => s"tok${i % 37}")
    val cm = udaf(CountMin)
    def run(parts: Int): Seq[Long] =
      data
        .toDF("tok")
        .repartition(parts)
        .agg(cm(col("tok")))
        .collect()(0)
        .getSeq[Long](0)
    assert(run(1) == run(7))
  }

  test("collision-free regime: estimates are exact") {
    val counts = Map("a" -> 5, "bb" -> 3, "ccc" -> 11, "dddd" -> 1)
    val stream = counts.toSeq.flatMap { case (t, n) => Seq.fill(n)(t) }
    val sk = CountMin.finish(stream.foldLeft(CountMin.zero)(CountMin.reduce))
    counts.foreach { case (t, n) =>
      assert(CountMin.estimate(sk, t) == n.toLong, t)
    }
  }

  test("forced collisions (W=2) still satisfy est >= true count") {
    val cm = new CountMinSketch(2, 2)
    val counts = Map("a" -> 50, "b" -> 3, "c" -> 7, "d" -> 1, "e" -> 2)
    val stream = counts.toSeq.flatMap { case (t, n) => Seq.fill(n)(t) }
    // merge two halves built separately to cover the merge path too
    val (s1, s2) = stream.splitAt(stream.length / 2)
    val sk = cm.finish(cm.merge(
      s1.foldLeft(cm.zero)(cm.reduce),
      s2.foldLeft(cm.zero)(cm.reduce)))
    val n = stream.length.toLong
    counts.foreach { case (t, c) =>
      val est = cm.estimate(sk, t)
      assert(est >= c.toLong, t) // the one-sided guarantee
      assert(est <= n, t) // and never more than the whole stream
    }
  }
}
