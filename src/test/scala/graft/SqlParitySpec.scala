package graft

import org.apache.spark.sql.functions._

/** The second front door (SURVEY.md §3, engine lifecycle (b)): the same
  * workloads expressed as `spark.sql` over registered temp views must hit
  * the identical Catalyst pipeline and produce identical results to the
  * DataFrame API. Pins the claim that the engine adds no custom IR — SQL
  * and DataFrame users get the same engine.
  */
class SqlParitySpec extends SparkSuite {

  private def withViews[T](f: => T): T = {
    Seq("lineitem", "orders", "customer", "nation", "region", "documents")
      .foreach(t => Tables.table(spark, sf001, t).createOrReplaceTempView(t))
    try f
    finally Seq("lineitem", "orders", "customer", "nation", "region", "documents")
      .foreach(spark.catalog.dropTempView)
  }

  test("flagship revenue-by-nation: SQL text equals the DataFrame plan's result") {
    withViews {
      val sql = spark.sql("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(1) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")
      val api = SparkEntry.entry(spark)
      assert(sql.collect().toSeq == api.collect().toSeq)
    }
  }

  test("windowed quartiles: SQL text equals the DataFrame API result") {
    withViews {
      val sql = spark.sql("""
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ntile(4)      OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist()    OVER w AS cdf
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_custkey""")
      val api = graft.queries.Relational.qWindowDist(spark, sf001)
      assert(sql.collect().toSeq == api.collect().toSeq)
    }
  }

  test("exact dedup digests: SQL text equals the DataFrame API result") {
    withViews {
      val sql = spark.sql("""
        SELECT sha2(text, 256) AS h, min(doc_id) AS keep_id, count(1) AS n_dups
        FROM documents GROUP BY sha2(text, 256) ORDER BY h""")
      val api = graft.queries.LlmOps.qDedupExact(spark, sf001)
      assert(sql.collect().toSeq == api.collect().toSeq)
    }
  }

  test("tilecache connector mounts via SQL DDL (USING tilecache)") {
    val root = graft.queries.TileCacheQueries.ensureFixture()
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW tile_cache USING tilecache OPTIONS (path '$root')")
    try {
      val sql = spark
        .sql("SELECT level, row, col, length FROM tile_cache WHERE level = 3 ORDER BY row, col")
        .collect()
      val api = spark.read
        .format("tilecache")
        .load(root)
        .where(col("level") === 3)
        .select("level", "row", "col", "length")
        .orderBy("row", "col")
        .collect()
      assert(sql.nonEmpty && sql.sameElements(api))
    } finally spark.catalog.dropTempView("tile_cache")
  }
}
