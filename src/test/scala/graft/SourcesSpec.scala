package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV/JSON source coverage (SURVEY.md §2.2-B: exercised in tests).
  * Round-trips a real table through each format with an explicit schema —
  * the production pattern for text sources at scale (schema inference
  * costs an extra full pass over 100 TB; never rely on it).
  */
class SourcesSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip with explicit schema, header, and pushed-down filter") {
    val nation = Tables.nation(spark, sf001).orderBy("n_nationkey")
    val dir = tmp("graft_csv")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read
      .schema(schema)
      .option("header", "true")
      .csv(dir)
      .orderBy("n_nationkey")
    assert(back.schema == schema)
    assert(back.collect().sameElements(nation.collect()))
    // filters prune on read (no full materialization before the predicate)
    assert(back.where(col("n_regionkey") === 0).count() == nation.where(col("n_regionkey") === 0).count())
  }

  test("JSON round-trip with explicit schema preserves values and nulls") {
    val docs = Tables
      .documents(spark, sf001)
      .select("doc_id", "lang", "n_chars", "text")
      .orderBy("doc_id")
    val dir = tmp("graft_json")
    docs.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("text", StringType)))
    val back = spark.read.schema(schema).json(dir).orderBy("doc_id")
    assert(back.schema == schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("ORC round-trip preserves schema and values, filter pushes to the scan") {
    val orders = Tables
      .orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
    val dir = tmp("graft_orc")
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).orderBy("o_orderkey")
    assert(back.schema == orders.schema)
    assert(back.collect().sameElements(orders.collect()))
    // ORC scans support predicate pushdown like parquet — the filter must
    // reach the scan node, not evaluate post-materialization
    val p = back.where(col("o_totalprice") > 150000.0).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,150000.0)]"), p)
  }

  test("JSON reader handles corrupt records in PERMISSIVE mode without failing the job") {
    val dir = tmp("graft_json_corrupt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"v\": \"ok\"}\nNOT JSON AT ALL\n{\"id\": 2, \"v\": \"also ok\"}\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val back = spark.read.schema(schema).json(dir).cache()
    try {
      assert(back.count() == 3)
      assert(back.where(col("_corrupt_record").isNotNull).count() == 1)
      assert(back.where(col("id").isNotNull).count() == 2)
    } finally back.unpersist()
  }

  test("CSV reader handles corrupt records in PERMISSIVE mode without failing the job (r12)") {
    // the q_io_csv_roundtrip reader's degraded path: a malformed line
    // (wrong arity / unparsable numeric) lands in _corrupt_record, the
    // well-formed rows still parse — ingest survives a bad export line
    val dir = tmp("graft_csv_corrupt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      "1,ok,7\nthis line is not,csv\n2,\"quoted, comma\",9\n3,bad-number,NOT_A_LONG\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("n", LongType),
      StructField("_corrupt_record", StringType)))
    val back = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache()
    try {
      assert(back.count() == 4)
      assert(back.where(col("_corrupt_record").isNotNull).count() == 2)
      // the quoted-comma row parses as ONE field, not two
      assert(back.where(col("id") === 2L).select("v").head().getString(0) == "quoted, comma")
      assert(back.where(col("n").isNotNull).count() == 2)
    } finally back.unpersist()
  }

  test("CSV round-trip survives embedded quotes, commas, and newlines (the registry dialect, r12)") {
    import spark.implicits._
    val dir = tmp("graft_csv_rt_hard")
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside"),
      (5L, "both \"x\", and\nmore"))
    val df = rows.toDF("id", "s")
    df.write.mode("overwrite").option("header", "true").option("escape", "\"").csv(dir)
    val back = spark.read
      .schema(df.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1))
  }

  test("XML round-trip survives markup entities, newlines, and edge whitespace (the registry dialect, r12)") {
    import spark.implicits._
    val dir = tmp("graft_xml_rt_hard")
    val rows = Seq(
      (1L, "plain"),
      (2L, "angle <tag> inside"),
      (3L, "amp & entity &amp; literal"),
      (4L, "newline\ninside"),
      (5L, "  edge whitespace  "),
      (6L, "quote \" and apos ' mixed"))
    val df = rows.toDF("id", "s")
    df.write.mode("overwrite").option("rootTag", "rows").option("rowTag", "row").xml(dir)
    // the reader DEFAULT trims value whitespace — the registry dialect
    // disables it, and this row set is the proof it matters (row 5)
    val back = spark.read
      .schema(df.schema)
      .option("rowTag", "row")
      .option("ignoreSurroundingSpaces", "false")
      .xml(dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1))
  }

  test("partitionBy write prunes at the directory level on a filtered read (r12)") {
    val docs = Tables.documents(spark, sf001)
    val dir = tmp("graft_part_prune")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.schema(docs.schema).parquet(dir)
    val pruned = back.where(col("lang").isin("en", "zh"))
    // correctness: the pruned read returns exactly the filtered original
    assert(pruned.count() == docs.where(col("lang").isin("en", "zh")).count())
    // scale property: the IN predicate lands in partitionFilters and the
    // pruned LISTING enumerates only matching lang= directories — the
    // other three languages are never opened (inputFiles would be wrong
    // here: it reports the relation's full file set, pre-pruning)
    val scan = pruned.queryExecution.executedPlan
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .get
    assert(scan.partitionFilters.exists(_.toString.contains("lang")), scan.partitionFilters)
    val files = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files)
      .map(_.getPath.toString)
    assert(files.nonEmpty)
    assert(
      files.forall(f => f.contains("lang=en") || f.contains("lang=zh")),
      files.filterNot(f => f.contains("lang=en") || f.contains("lang=zh")).take(3).mkString(", "))
  }

  test("parquet schema evolution: mergeSchema unions column vintages") {
    // the lakehouse reality: yesterday's files lack the column added
    // today; a merged read must surface the union schema with NULLs for
    // the missing vintage, and plain reads of either vintage still work
    import spark.implicits._
    val dir = tmp("graft_evolve")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val v2 = Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
    v1.write.parquet(s"$dir/day=2026-01-01")
    v2.write.parquet(s"$dir/day=2026-01-02")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "day"))
    assert(merged.count() == 4)
    // old vintage reads NULL for the new column; new vintage keeps values
    assert(merged.where(col("score").isNull).select("id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L)))
    assert(merged.where(col("score").isNotNull).count() == 2)
    // filters on the evolved column prune correctly
    assert(merged.where(col("score") > 0.7).select("id").head().getLong(0) == 4L)
  }

  test("ignoreCorruptFiles: a garbage file in the directory doesn't kill the scan") {
    import spark.implicits._
    val dir = tmp("graft_corrupt")
    Seq((1L, "ok"), (2L, "fine")).toDF("id", "s").write.mode("append").parquet(dir)
    // a file with a .parquet name but garbage bytes — the torn-upload /
    // partial-write reality of object stores
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-99999-torn.snappy.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    // default (fail-fast) surfaces the corruption loudly…
    val failed =
      try { spark.read.parquet(dir).count(); false }
      catch { case _: Throwable => true }
    assert(failed, "corrupt file should fail a strict read")
    // …and the operational toggle degrades to skip-and-continue
    val tolerant = spark.read
      .option("ignoreCorruptFiles", "true")
      .parquet(dir)
    assert(tolerant.count() == 2)
    assert(tolerant.select("id").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
  }
}
