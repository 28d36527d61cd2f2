package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the kernels must resolve as SQL functions in a
  * session built with `spark.sql.extensions=graft.GraftExtensions`, and
  * produce the same values as the Column API.
  */
class ExtensionsSpec extends AnyFunSuite {

  // Session construction extracted to ExtSession (r15: shared with the
  // SqlParitySpec kernel battery) — see its scaladoc for the
  // getOrCreate/static-conf/suite-order pitfalls it navigates.
  private lazy val ext: SparkSession = ExtSession.spark

  test("kernels resolve and evaluate as injected SQL functions") {
    val r = ext
      .sql("""SELECT simhash64('the quick brown fox') AS sh,
             |       (text_profile('the quick brown fox')).n_tokens AS nt,
             |       text_fingerprint('a b c d e') AS fp,
             |       size(minhash16('a b c d e')) AS mh,
             |       size(shingles3('a b c d')) AS sg,
             |       size(shingles3_hashed('a b c d')) AS sgh,
             |       scaled_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
             |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS sd,
             |       edit_within('abcdefghij', 'abcdefghiX') AS ed,
             |       edit_within('abcdefghij', 'XYZdefXYZX') AS ed_far,
             |       hilbert_key(CAST(0 AS BIGINT), CAST(0 AS BIGINT)) AS h0,
             |       hilbert_key(CAST(65535 AS BIGINT), CAST(0 AS BIGINT)) AS hmax,
             |       scaled_long(CAST(2.5 AS DOUBLE), 1e2) AS sl
             |""".stripMargin)
      .head()
    assert(r.getAs[Int]("nt") == 4)
    assert(!r.isNullAt(r.fieldIndex("sh")))
    assert(!r.isNullAt(r.fieldIndex("fp")))
    assert(r.getAs[Int]("mh") == 16)
    assert(r.getAs[Int]("sg") == 2)
    assert(r.getAs[Int]("sgh") == 2)
    assert(r.getAs[Long]("sd") == (3.0 + 8.0) * 1e12.toLong)
    assert(r.getAs[Int]("ed") == 1)
    assert(r.getAs[Int]("ed_far") == -1)
    assert(r.getAs[Long]("h0") == 0L) // curve starts at the origin
    // (65535, 0) is the curve's other endpoint: d = 2^32 - 1
    assert(r.getAs[Long]("hmax") == (1L << 32) - 1)
    assert(r.getAs[Long]("sl") == 250L)
  }

  test("optimizer rule rewrites the HOF token count to the kernel, same values") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_rule")
    val df = ext.sql(
      "SELECT doc_id, size(filter(split(text, ' '), t -> t != '')) AS n FROM docs_rule ORDER BY doc_id")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("text_profile"), optimized)
    assert(!optimized.contains("lambdafunction"), optimized)
    // values must equal the un-rewritten HOF evaluated in the plain session
    val plain = SparkSuite.spark
    plain.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_plain")
    val expected = plain
      .sql("SELECT doc_id, size(filter(split(text, ' '), t -> t != '')) AS n FROM docs_plain ORDER BY doc_id")
      .collect()
    assert(df.collect().sameElements(expected))
  }

  test("optimizer rule leaves non-matching HOF shapes untouched") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_rule2")
    // comma delimiter: must NOT rewrite
    val df = ext.sql(
      "SELECT size(filter(split(text, ','), t -> t != '')) AS n FROM docs_rule2")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("text_profile"), optimized)
    assert(df.count() > 0)
  }

  test("SQL text_profile equals the Column API on real documents") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_ext")
    val viaSql = ext
      .sql("SELECT doc_id, (text_profile(text)).n_tokens AS n FROM docs_ext ORDER BY doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val viaApi = ext.read
      .parquet(s"$sf/documents.parquet")
      .select(
        org.apache.spark.sql.functions.col("doc_id"),
        functions.TextProfile.profile(org.apache.spark.sql.functions.col("text")).getField("n_tokens").as("n"))
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(viaSql.sameElements(viaApi))
  }

  test("window top-k SQL rewrites to the native GroupTopK operator, same rows") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_ext")
    val sql = """SELECT * FROM (
                | SELECT c_mktsegment, c_custkey, c_acctbal,
                |  row_number() OVER (PARTITION BY c_mktsegment
                |                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                | FROM cust_ext)
                |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    // same rows as the un-rewritten window form (plain suite session)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/customer.parquet")
      .selectExpr(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn")
      .where("rn <= 5")
      .orderBy("c_mktsegment", "rn")
      .collect()
    assert(df.collect().toSeq == viaWindow.toSeq)
  }

  test("ASC-first window top-k (bottom-k by distance) rewrites to GroupTopK, same rows") {
    // the recall harnesses' candidate shape: rank by ascending metric
    // (a distance), tiebreak ascending — r11 generalization of the rule
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_asc")
    val sql = """SELECT * FROM (
                | SELECT c_mktsegment, c_custkey, c_acctbal,
                |  row_number() OVER (PARTITION BY c_mktsegment
                |                     ORDER BY c_acctbal ASC, c_custkey ASC) AS rn
                | FROM cust_asc)
                |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/customer.parquet")
      .selectExpr(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS rn")
      .where("rn <= 5")
      .orderBy("c_mktsegment", "rn")
      .collect()
    assert(df.collect().toSeq == viaWindow.toSeq)
  }

  test("multi-key window top-k (PARTITION BY a, b) rewrites to GroupTopK, same rows") {
    // r11: composite group keys — the per-(source, lang) shape
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_multi")
    val sql = """SELECT * FROM (
                | SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal,
                |  row_number() OVER (PARTITION BY c_mktsegment, c_nationkey
                |                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                | FROM cust_multi)
                |WHERE rn <= 3 ORDER BY c_mktsegment, c_nationkey, rn""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/customer.parquet")
      .selectExpr(
        "c_mktsegment",
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        "row_number() OVER (PARTITION BY c_mktsegment, c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn")
      .where("rn <= 3")
      .orderBy("c_mktsegment", "c_nationkey", "rn")
      .collect()
    assert(df.collect().toSeq == viaWindow.toSeq)
  }

  test("tie-aware rank() top-k rewrites to bucket-mode GroupTopK, same rows incl. boundary ties (r12)") {
    // the score-ranked-retrieval common case: rank() with a tie group
    // straddling k — every tied row must survive, like the window form
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_rank")
    val sql = """SELECT * FROM (
                | SELECT o_custkey, o_orderkey, o_orderpriority,
                |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority DESC) AS rnk
                | FROM ord_rank)
                |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/orders.parquet")
      .selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority DESC) AS rnk")
      .where("rnk <= 3")
      .orderBy("o_custkey", "rnk", "o_orderkey")
      .collect()
    val got = df.collect()
    assert(got.length == viaWindow.length && got.toSeq == viaWindow.toSeq)
    // the fixture must actually exercise a tie group straddling k, or
    // this test is vacuous (row_number would produce the same rows)
    assert(
      viaWindow.groupBy(_.getLong(0)).exists(_._2.length > 3),
      "no customer with boundary ties at sf0.001 — pick a coarser order column")
  }

  test("dense_rank() top-k rewrites to bucket-mode GroupTopK, same rows (r12)") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_dense")
    val sql = """SELECT * FROM (
                | SELECT l_linestatus, l_orderkey, l_linenumber, l_quantity,
                |  dense_rank() OVER (PARTITION BY l_linestatus ORDER BY l_quantity DESC) AS rnk
                | FROM li_dense)
                |WHERE rnk <= 3 ORDER BY l_linestatus, rnk, l_orderkey, l_linenumber""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/lineitem.parquet")
      .selectExpr(
        "l_linestatus",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "dense_rank() OVER (PARTITION BY l_linestatus ORDER BY l_quantity DESC) AS rnk")
      .where("rnk <= 3")
      .orderBy("l_linestatus", "rnk", "l_orderkey", "l_linenumber")
      .collect()
    val got = df.collect()
    assert(got.length == viaWindow.length && got.toSeq == viaWindow.toSeq)
  }

  test("two-sort-column rank() (ties on the (v, t) pair) rewrites to GroupTopK, same rows (r12)") {
    // the (order, tie) bucket-key path: rank ties are on the FULL sort
    // tuple, so rows duplicated on (priority, status) share a rank while
    // a unique custkey would have made rank degenerate to row_number —
    // order by two non-unique columns to keep real tie groups
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_rank2")
    val sql = """SELECT * FROM (
                | SELECT o_custkey, o_orderkey, o_orderpriority, o_orderstatus,
                |  rank() OVER (PARTITION BY o_custkey
                |               ORDER BY o_orderpriority DESC, o_orderstatus ASC) AS rnk
                | FROM ord_rank2)
                |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin
    val df = ext.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/orders.parquet")
      .selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority DESC, o_orderstatus ASC) AS rnk")
      .where("rnk <= 3")
      .orderBy("o_custkey", "rnk", "o_orderkey")
      .collect()
    val got = df.collect()
    assert(got.length == viaWindow.length && got.toSeq == viaWindow.toSeq)
    // tie groups on the PAIR must actually occur (rank must jump somewhere)
    assert(viaWindow.exists(_.getInt(4) == 3) && viaWindow.exists(r => r.getInt(4) == 1))
    assert(
      viaWindow.groupBy(r => (r.getLong(0), r.getInt(4))).exists(_._2.length > 1),
      "no (group, rank) tie pair at sf0.001 — the pair-key path is untested")
  }

  test("argmax-per-group (rn = 1) rewrites to GroupTopK for row_number AND rank (r12)") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_argmax")
    // row_number = 1: one best row per group
    val rn = ext.sql("""SELECT * FROM (
                | SELECT c_mktsegment, c_custkey, c_acctbal,
                |  row_number() OVER (PARTITION BY c_mktsegment
                |                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                | FROM cust_argmax)
                |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin)
    assert(rn.queryExecution.executedPlan.toString.contains("GroupTopK"))
    assert(!rn.queryExecution.executedPlan.toString.contains("Window"))
    val rnWant = graft.SparkSuite.spark
      .read.parquet(s"$sf/customer.parquet")
      .selectExpr(
        "c_mktsegment", "c_custkey", "c_acctbal",
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn")
      .where("rn = 1").orderBy("c_mktsegment").collect()
    assert(rn.collect().toSeq == rnWant.toSeq)
    // rank = 1: ALL rows tied at the best value
    ext.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_argmax")
    val rk = ext.sql("""SELECT * FROM (
                | SELECT o_custkey, o_orderkey, o_orderpriority,
                |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority DESC) AS rnk
                | FROM ord_argmax)
                |WHERE rnk = 1 ORDER BY o_custkey, o_orderkey""".stripMargin)
    assert(rk.queryExecution.executedPlan.toString.contains("GroupTopK"))
    val rkWant = graft.SparkSuite.spark
      .read.parquet(s"$sf/orders.parquet")
      .selectExpr(
        "o_custkey", "o_orderkey", "o_orderpriority",
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority DESC) AS rnk")
      .where("rnk = 1").orderBy("o_custkey", "o_orderkey").collect()
    val rkGot = rk.collect()
    assert(rkGot.toSeq == rkWant.toSeq)
    // the tie semantics must be exercised: some group keeps > 1 row
    assert(rkWant.groupBy(_.getLong(0)).exists(_._2.length > 1))
    // rn = 2 is a SLICE, not a prefix — must stay on WindowExec
    val slice = ext.sql("""SELECT * FROM (
                | SELECT c_mktsegment, row_number() OVER (PARTITION BY c_mktsegment
                |   ORDER BY c_acctbal DESC, c_custkey ASC) AS rn FROM cust_argmax)
                |WHERE rn = 2""".stripMargin)
    assert(slice.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("registry tie-aware entries plan GroupTopK under the extension tier (r12)") {
    // the production (Verify/Bench) sessions run extensions-on, so the
    // REGISTRY functions themselves — not just the SQL forms — must
    // plan the native operator there
    for (
      fn <- Seq(
        graft.queries.Relational.qTopkGroupTies _,
        graft.queries.Relational.qTopkGroupDense _,
        // r12 third session: the hash-priority reservoir sample is the
        // row_number ≤ k shape (md5 order + event_id tiebreak) — it must
        // ride the native heap too
        graft.queries.LlmOps.qSampleReservoir _)
    ) {
      val p = fn(ext, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(p.contains("GroupTopK"), p)
      assert(!p.contains("Window"), p)
    }
  }

  test("window shapes GroupTopK can't express stay on WindowExec") {
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_ext2")
    // percent_rank needs the full partition cardinality — not a top-k shape
    val pctRank = ext.sql("""SELECT * FROM (
                | SELECT c_mktsegment, percent_rank() OVER (PARTITION BY c_mktsegment
                |   ORDER BY c_acctbal DESC, c_custkey ASC) AS pr FROM cust_ext2)
                |WHERE pr <= 0.5""".stripMargin)
    assert(pctRank.queryExecution.executedPlan.toString.contains("Window"))
    // single-order-column row_number has a nondeterministic row set — the
    // rewrite requires the explicit tiebreak (rank/dense_rank don't)
    val noTie = ext.sql("""SELECT * FROM (
                | SELECT c_mktsegment, row_number() OVER (PARTITION BY c_mktsegment
                |   ORDER BY c_acctbal DESC) AS rn FROM cust_ext2)
                |WHERE rn <= 5""".stripMargin)
    assert(noTie.queryExecution.executedPlan.toString.contains("Window"))
    // non-default null ordering is out of the strict match (the heap
    // comparator implements exactly Spark's default per direction)
    val nullsFirst = ext.sql("""SELECT * FROM (
                | SELECT c_mktsegment, row_number() OVER (PARTITION BY c_mktsegment
                |   ORDER BY c_acctbal DESC NULLS FIRST, c_custkey ASC) AS rn FROM cust_ext2)
                |WHERE rn <= 5""".stripMargin)
    assert(nullsFirst.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("expression partition keys rewrite via the analyzer's extracted _w0 attribute, same rows") {
    // ExtractWindowExpressions projects `c_nationkey % 5` into a _w0
    // column BEFORE the optimizer runs, so the rule legitimately sees an
    // attribute partition key and the rewrite fires — pin the parity
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_expr")
    val sql = """SELECT * FROM (
                | SELECT c_mktsegment, c_custkey, row_number() OVER (PARTITION BY c_nationkey % 5
                |   ORDER BY c_acctbal DESC, c_custkey ASC) AS rn FROM cust_expr)
                |WHERE rn <= 5 ORDER BY c_custkey""".stripMargin
    val df = ext.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("GroupTopK"))
    val viaWindow = graft.SparkSuite.spark
      .read.parquet(s"$sf/customer.parquet")
      .selectExpr(
        "c_mktsegment",
        "c_custkey",
        "row_number() OVER (PARTITION BY c_nationkey % 5 ORDER BY c_acctbal DESC, c_custkey ASC) AS rn")
      .where("rn <= 5")
      .orderBy("c_custkey")
      .collect()
    assert(df.collect().toSeq == viaWindow.toSeq)
  }

  test("round-4 kernels resolve as SQL functions: token_windows, plane_sig16/64") {
    val tw = ext
      .sql("SELECT token_windows('a b c d', 2) AS w")
      .head()
      .getSeq[String](0)
    assert(tw == Seq("a b", "b c", "c d"))
    val sf = "/root/testdata/sf0.001"
    ext.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb_ext")
    val viaSql = ext
      .sql("SELECT vec_id, plane_sig16(embedding) AS s16, plane_sig64(embedding, 0) AS s64 FROM emb_ext ORDER BY vec_id LIMIT 5")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaApi = ext.read
      .parquet(s"$sf/embeddings.parquet")
      .select(
        org.apache.spark.sql.functions.col("vec_id"),
        functions.PlaneSig16.of(org.apache.spark.sql.functions.col("embedding")).as("s16"),
        functions.PlaneSig64.of(org.apache.spark.sql.functions.col("embedding"), 0).as("s64"))
      .orderBy("vec_id")
      .limit(5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaSql.sameElements(viaApi))
    // usage text survives registration (DESCRIBE FUNCTION shows it)
    val desc = ext.sql("DESCRIBE FUNCTION token_windows").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("sliding windows"), desc)
  }

  test("nfc_normalize resolves in SQL and matches the Column API (r11)") {
    // decomposed e+U+0301 composes; already-NFC text is identity
    // (Spark's chr() is mod-256, so embed the combining accent directly)
    val decomposed = "caf" + "e\u0301"
    val viaSql = ext
      .sql(s"SELECT nfc_normalize('$decomposed') AS a, nfc_normalize('plain') AS b")
      .head()
    assert(viaSql.getString(0) == "café" && viaSql.getString(0).length == 4)
    assert(viaSql.getString(1) == "plain")
    import ext.implicits._
    val viaApi = Seq(decomposed)
      .toDF("t")
      .select(functions.NfcNormalize.of(org.apache.spark.sql.functions.col("t")))
      .head()
      .getString(0)
    assert(viaSql.getString(0) == viaApi)
  }

  test("deflate_len resolves in SQL and matches the Column API") {
    val viaSql = ext
      .sql("SELECT deflate_len('spam ham spam ham spam ham') AS z")
      .head()
      .getInt(0)
    import ext.implicits._
    val viaApi = Seq("spam ham spam ham spam ham")
      .toDF("t")
      .select(functions.DeflateLen.of(org.apache.spark.sql.functions.col("t")))
      .head()
      .getInt(0)
    assert(viaSql == viaApi && viaSql > 0)
  }
}
