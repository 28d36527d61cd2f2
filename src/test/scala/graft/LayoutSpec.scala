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
}
