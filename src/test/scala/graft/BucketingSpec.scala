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
}
