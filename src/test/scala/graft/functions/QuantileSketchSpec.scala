package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** LogHistQuantile (DDSketch-style log-histogram): exact mergeability
  * (any partition/merge tree gives the SAME sketch) and the ≤ ~2%
  * relative-error contract against exact percentiles.
  */
class QuantileSketchSpec extends SparkSuite {

  test("sketch result is partitioning-invariant (exact merge)") {
    val qsk = udaf(new LogHistQuantile(Seq(0.5, 0.95, 0.99)))
    def run(parts: Int): Seq[(String, Seq[Double])] =
      graft.Tables
        .lineitem(spark, sf001)
        .repartition(parts)
        .groupBy(col("l_returnflag"))
        .agg(qsk(col("l_extendedprice")).as("qv"))
        .orderBy("l_returnflag")
        .collect()
        .toSeq
        .map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(run(1) == run(13))
  }

  test("quantile estimates are within 2% of the exact percentiles") {
    val qsk = udaf(new LogHistQuantile(Seq(0.5, 0.95, 0.99)))
    val est = graft.Tables
      .lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(qsk(col("l_extendedprice")).as("qv"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
      .toMap
    val exact = graft.Tables
      .lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").as("p"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
      .toMap
    exact.foreach { case (k, ps) =>
      ps.zip(est(k)).foreach { case (p, e) =>
        assert(math.abs(e - p) / p <= 0.02, s"$k: est $e vs exact $p")
      }
    }
  }

  test("degenerate inputs: empty group is NaN, non-positive values report 0") {
    import spark.implicits._
    val qsk = udaf(new LogHistQuantile(Seq(0.5)))
    val allUnder = Seq(("a", -1.0), ("a", 0.0))
      .toDF("g", "v")
      .groupBy("g")
      .agg(qsk(col("v")).as("qv"))
      .head()
      .getSeq[Double](1)
    assert(allUnder == Seq(0.0))
    // mixed: the underflow bucket occupies the low ranks
    val mixed = Seq(("a", -5.0), ("a", 100.0), ("a", 101.0))
      .toDF("g", "v")
      .groupBy("g")
      .agg(qsk(col("v")).as("qv"))
      .head()
      .getSeq[Double](1)
    assert(math.abs(mixed.head - 100.0) / 100.0 <= 0.02)
    // NaN inputs are IGNORED, not counted below the data
    val withNaN = Seq(("a", Double.NaN), ("a", 100.0))
      .toDF("g", "v")
      .groupBy("g")
      .agg(qsk(col("v")).as("qv"))
      .head()
      .getSeq[Double](1)
    assert(math.abs(withNaN.head - 100.0) / 100.0 <= 0.02)
  }
}
