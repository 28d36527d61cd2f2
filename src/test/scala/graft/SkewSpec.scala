package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** SaltedJoin: result-identical to the plain join, and the plan joins on
  * (key, salt) so a hot key spreads across `buckets` shuffle partitions.
  */
class SkewSpec extends SparkSuite {

  test("salted inner join equals plain inner join (incl. duplicate-key rows)") {
    val orders = Tables.orders(spark, sf001)
    val customer = Tables.customer(spark, sf001)
    val salted = SaltedJoin
      .inner(
        orders,
        orders("o_custkey"),
        orders("o_orderkey"),
        customer,
        customer("c_custkey"),
        buckets = 8)
      .select("o_orderkey", "o_custkey", "c_name")
    val plain = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted join plans the salt into the join keys") {
    val orders = Tables.orders(spark, sf001)
    val customer = Tables.customer(spark, sf001)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val p = SaltedJoin
        .inner(
          orders,
          orders("o_custkey"),
          orders("o_orderkey"),
          customer,
          customer("c_custkey"),
          buckets = 8)
        .queryExecution
        .executedPlan
        .toString
      assert(p.contains(SaltedJoin.SaltCol), p)
      // hot-key spreading only works if the exchange hashes key AND salt
      assert(p.contains("hashpartitioning(o_custkey"), p)
      assert(
        p.linesIterator.exists(l => l.contains("hashpartitioning") && l.contains(SaltedJoin.SaltCol)),
        p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }
}
