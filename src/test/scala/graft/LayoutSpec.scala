package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Partition-layout coverage: hive-style partitioned writes and the scan
  * pruning they buy. At 100 TB, partitioning by a low-cardinality filter
  * column (language, date, level) is the difference between scanning one
  * directory and scanning the corpus — the plan must show the partition
  * predicate as a PartitionFilter (directory-level pruning), not a data
  * Filter.
  */
class LayoutSpec extends SparkSuite {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }.get

  test("partitioned write prunes directories: partition filter, not data filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables
      .documents(spark, sf001)
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(dir)
    val langs = new java.io.File(dir).list().filter(_.startsWith("lang=")).toSeq
    assert(langs.size >= 3, s"expected one directory per language, got $langs")

    val back = spark.read.parquet(dir).where(col("lang") === "en")
    val scan = scanOf(back)
    // the predicate lands in partitionFilters (directory pruning)...
    assert(scan.partitionFilters.exists(_.toString.contains("lang")), scan.partitionFilters)
    // ...and the scan enumerates ONLY the lang=en directory's files
    val files = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(files.nonEmpty)
    assert(files.forall(_.files.forall(_.getPath.toString.contains("lang=en"))))
    // row parity with the unpartitioned filter
    val expected = Tables.documents(spark, sf001).where(col("lang") === "en").count()
    assert(back.count() == expected)
  }

  test("partition values round-trip: distinct langs match the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part2").toString
    val src = Tables.documents(spark, sf001)
    src.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = back.select("lang").distinct().collect().map(_.getString(0)).sorted.toSeq
    val b = src.select("lang").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
    assert(back.count() == src.count())
  }

  test("z-order key clusters BOTH dimensions; a 1-D sort only clusters its own") {
    import spark.implicits._
    val o = Tables
      .orders(spark, sf001)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val z = graft.queries.CorpusOps
      .qLayoutZorder(spark, sf001)
      .join(o, "o_orderkey")
    // simulate 16 files: contiguous z-ranges (what a z-sorted write
    // produces), then measure each file's min/max span on each dim as a
    // fraction of the domain — the quantity file-skipping depends on
    def meanSpan(df: org.apache.spark.sql.DataFrame, sortCol: String): (Double, Double) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(sortCol), col("o_orderkey"))
      val bucketed = df.withColumn("b", ntile(16).over(w))
      val spans = bucketed
        .groupBy("b")
        .agg(
          (max($"o_custkey") - min($"o_custkey")).cast("double").as("ck_span"),
          datediff(max($"o_orderdate"), min($"o_orderdate")).cast("double").as("d_span"))
      val dom = df
        .agg(
          (max($"o_custkey") - min($"o_custkey")).cast("double"),
          datediff(max($"o_orderdate"), min($"o_orderdate")).cast("double"))
        .head()
      val r = spans.agg(avg($"ck_span" / dom.getDouble(0)), avg($"d_span" / dom.getDouble(1))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zCk, zDate) = meanSpan(z, "zval")
    val (sCk, sDate) = meanSpan(z, "o_custkey")
    // z-order: materially narrow on both dims at once
    assert(zCk < 0.5 && zDate < 0.5, s"z spans: custkey $zCk, date $zDate")
    // custkey sort: near-perfect on custkey, near-useless on date
    assert(sCk < 0.15, s"1-D sort custkey span $sCk")
    assert(sDate > 0.8, s"1-D sort date span $sDate")
    // and z beats the 1-D sort on the dimension it neglects
    assert(zDate < sDate / 2, s"z date span $zDate vs 1-D $sDate")

    // Hilbert on the SAME harness: clusters both dims, and its combined
    // file span does not lose to z-order (the no-diagonal-jumps claim,
    // measured — small margin for the synthetic grid's quantization)
    val h = graft.queries.CorpusOps
      .qLayoutHilbert(spark, sf001)
      .join(o, "o_orderkey")
    val (hCk, hDate) = meanSpan(h, "hval")
    assert(hCk < 0.5 && hDate < 0.5, s"hilbert spans: custkey $hCk, date $hDate")
    assert(hCk + hDate <= (zCk + zDate) * 1.05, s"hilbert $hCk+$hDate vs z $zCk+$zDate")
  }

  test("Hilbert kernel equals the 16-stage dataframe walk bit-for-bit") {
    val kernel = graft.queries.CorpusOps
      .qLayoutHilbert(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val staged = graft.queries.CorpusOps
      .hilbertStaged(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(kernel.nonEmpty)
    assert(kernel.sameElements(staged))
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    import spark.implicits._
    // the ETL re-run shape: re-landing one day must not wipe the others
    // (static overwrite mode truncates the whole table first)
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn").toString + "/t"
    Seq((1L, "a", "d1"), (2L, "b", "d2"), (3L, "c", "d2"))
      .toDF("id", "v", "day")
      .write
      .partitionBy("day")
      .parquet(dir)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((20L, "B2", "d2")) // re-land day d2 only
        .toDF("id", "v", "day")
        .write
        .mode("overwrite")
        .partitionBy("day")
        .parquet(dir)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val back = spark.read.parquet(dir).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 20L)) // d1 intact, d2 replaced
    assert(back.map(_.getString(2)).toSeq == Seq("d1", "d2"))
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    // The star-join shape at 100 TB: the fact table is partitioned on the
    // join key's functional image (lang), the dim filter arrives only
    // through the join — a static planner would scan every partition;
    // DPP injects the dim's key set into the fact scan's partition
    // filters at runtime.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/fact"
    Tables
      .documents(spark, sf001)
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must keep a selective Filter node for DPP's heuristic — a
    // literal Seq folds into a filter-less LocalTableScan, so land it as
    // parquet first (which is also the realistic star shape)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    Seq(("en", 1), ("de", 2), ("fr", 3)).toDF("d_lang", "pri").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("pri") === 1)
    val joined = fact.join(dim, col("lang") === col("d_lang"))
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.contains("dynamicpruning"), planned.take(2000))
    // correctness: equals the statically filtered count
    val expected = Tables.documents(spark, sf001).where(col("lang") === "en").count()
    assert(joined.count() == expected)
  }
}
