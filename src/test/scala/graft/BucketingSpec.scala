package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join story for repeated large joins at
  * 100 TB. Writing both sides bucketed by the join key lets every
  * subsequent join run with NO shuffle exchange — the scan partitions ARE
  * the join partitions. This spec proves the engine's tables compose with
  * that layout: the bucketed join plan contains no Exchange, and results
  * equal the plain join.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join with no shuffle exchange, same results") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small sf would broadcast; force the shuffle-join planner path so
      // the bucketing (not broadcast) is what removes the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables
        .orders(spark, sf001)
        .write
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", s"$wh/orders_b")
        .mode("overwrite")
        .saveAsTable("orders_b")
      Tables
        .customer(spark, sf001)
        .write
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", s"$wh/customer_b")
        .mode("overwrite")
        .saveAsTable("customer_b")

      val bucketed = spark
        .table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)

      val plain = Tables
        .orders(spark, sf001)
        .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
      assert(bucketed.exceptAll(plain).count() == 0 && plain.exceptAll(bucketed).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("banded ANN index bucketed by its key joins probes with no index-side exchange") {
    // The qSimAnn scaladoc's 100 TB claim, proven as a plan: persist the
    // (vec_id, band, key) index bucketed by key; a non-broadcastable
    // probe relation then joins it with exchanges on the PROBE side only
    // — the index partitions are never reshuffled, which is what turns
    // the lookup into a bucket-pruned read instead of a corpus shuffle.
    val wh = java.nio.file.Files.createTempDirectory("graft_ann_buckets").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = graft.queries.LlmOps.bandedIndex(
        Tables.embeddings(spark, sf001).where(col("vec_id") =!= 0))
      idx.write
        .bucketBy(8, "band", "key")
        .option("path", s"$wh/ann_idx_b")
        .mode("overwrite")
        .saveAsTable("ann_idx_b")
      val probes = idx.select("band", "key").limit(200).distinct()
      val lookup = spark
        .table("ann_idx_b")
        .join(probes, Seq("band", "key"), "left_semi")
      val plan = lookup.queryExecution.executedPlan.toString
      assert(plan.contains("ann_idx_b"), plan)
      // self-calibrating: the same lookup against the UNBUCKETED index
      // relation needs one more shuffle — the index side's. Bucketing
      // must remove exactly that exchange and nothing else.
      val plain = idx.join(probes, Seq("band", "key"), "left_semi")
      def exchanges(p: String): Int = "Exchange".r.findAllIn(p).size
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(
        exchanges(plan) == exchanges(plainPlan) - 1,
        s"bucketed plan should drop exactly the index-side exchange\n-- bucketed:\n$plan\n-- plain:\n$plainPlan")
      assert(lookup.exceptAll(plain).count() == 0 && plain.exceptAll(lookup).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS ann_idx_b")
    }
  }
}
