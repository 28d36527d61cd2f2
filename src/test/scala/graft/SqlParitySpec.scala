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

  test("every injected SQL kernel has a parity pin: SQL text == Column API, full list (r15)") {
    // r14 ask #7: GraftExtensions.sqlFunctions is the contract-of-record
    // — this test enumerates it with a completeness gate, so a kernel
    // injected without a parity pin here FAILS the suite rather than
    // silently shipping SQL-unreachable or SQL-divergent.
    import org.apache.spark.sql.{Column, DataFrame}
    val ext = ExtSession.spark
    val docs = ext.read.parquet(s"$sf001/documents.parquet")
    val emb = ext.read.parquet(s"$sf001/embeddings.parquet")
    docs.createOrReplaceTempView("docs_par")
    emb.createOrReplaceTempView("emb_par")
    def overDocs(sqlExpr: String, api: Column): (DataFrame, DataFrame) = (
      ext.sql(s"SELECT doc_id, $sqlExpr AS v FROM docs_par ORDER BY doc_id"),
      docs.select(col("doc_id"), api.as("v")).orderBy("doc_id"))
    def overEmb(sqlExpr: String, api: Column): (DataFrame, DataFrame) = (
      ext.sql(s"SELECT vec_id, $sqlExpr AS v FROM emb_par ORDER BY vec_id"),
      emb.select(col("vec_id"), api.as("v")).orderBy("vec_id"))
    val pinned: Map[String, (DataFrame, DataFrame)] = Map(
      "text_profile" -> overDocs("text_profile(text)", graft.functions.TextProfile.profile(col("text"))),
      "text_fingerprint" ->
        overDocs("text_fingerprint(text)", graft.functions.TextFingerprint.of(col("text"))),
      "readability_counts" ->
        overDocs("readability_counts(text)", graft.functions.ReadabilityCounts.of(col("text"))),
      "simhash64" -> overDocs("simhash64(text)", graft.functions.SimHash64.of(col("text"))),
      "minhash16" -> overDocs("minhash16(text)", graft.functions.MinHash16.of(col("text"))),
      "shingles3" -> overDocs("shingles3(text)", graft.functions.Shingles3.of(col("text"))),
      "shingles3_hashed" ->
        overDocs("shingles3_hashed(text)", graft.functions.Shingles3Hashed.of(col("text"))),
      "token_windows" ->
        overDocs("token_windows(text, 3)", graft.functions.TokenWindows.of(col("text"), 3)),
      "plane_sig16" -> overEmb("plane_sig16(embedding)", graft.functions.PlaneSig16.of(col("embedding"))),
      "plane_sig64" ->
        overEmb("plane_sig64(embedding, 1)", graft.functions.PlaneSig64.of(col("embedding"), 1)),
      "edit_within" -> overDocs(
        "edit_within(substr(text, 1, 24), substr(text, 3, 24))",
        graft.functions.EditWithin.of(substring(col("text"), 1, 24), substring(col("text"), 3, 24))),
      // the SQL surface exposes the RAW scaled BIGINT (the kernel); the
      // descaled .dot helper is BIGINT/1e12, so pin against the raw form
      "scaled_dot" -> overEmb(
        "scaled_dot(embedding, embedding)", {
          import org.apache.spark.sql.graftbridge.Bridge
          Bridge.column(graft.functions.ScaledDot(
            Bridge.expression(col("embedding")),
            Bridge.expression(col("embedding"))))
        }),
      "nfc_normalize" -> overDocs("nfc_normalize(text)", graft.functions.NfcNormalize.of(col("text"))),
      "deflate_len" -> overDocs("deflate_len(text)", graft.functions.DeflateLen.of(col("text"))),
      "hilbert_key" -> overDocs(
        "hilbert_key(doc_id % 256, doc_id % 199)",
        graft.functions.HilbertKey.of((col("doc_id") % 256).cast("long"), (col("doc_id") % 199).cast("long"))),
      "scaled_long" -> overDocs(
        "scaled_long(n_chars / 7.0, 1e2)",
        graft.functions.ScaledLong.of(col("n_chars") / lit(7.0), 100.0)))
    // completeness: the pin map must cover EXACTLY the injected list
    val registered = GraftExtensions.sqlFunctions.map(_._1.funcName).toSet
    assert(
      registered == pinned.keySet,
      s"unpinned injected kernels: ${(registered -- pinned.keySet).toSeq.sorted.mkString(", ")}; " +
        s"stale pins: ${(pinned.keySet -- registered).toSeq.sorted.mkString(", ")}")
    pinned.toSeq.sortBy(_._1).foreach { case (name, (sqlDf, apiDf)) =>
      val sv = sqlDf.collect().toSeq
      val av = apiDf.collect().toSeq
      withClue(name) {
        assert(sv.nonEmpty, s"$name parity query returned no rows — vacuous pin")
        assert(sv == av, s"$name: SQL and Column API results differ")
      }
    }
    ext.catalog.dropTempView("docs_par")
    ext.catalog.dropTempView("emb_par")
  }
}
