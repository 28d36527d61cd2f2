package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the driver-owned fixture contract (TESTDATA.md).
  *
  * The engine has no control over `/root/testdata` — the driver regenerates
  * it between rounds, and a silent physical-schema change once broke 47
  * registry queries at analysis time (round 5: `events.ts` moved from INT64
  * TIMESTAMP(NANOS) to INT64 TIMESTAMP_MICROS/NTZ). This spec turns any
  * future refresh into ONE pointed failure naming the drifted column instead
  * of dozens of downstream analysis errors.
  *
  * Assertions compare `(name, dataType.sql)` pairs — nullability is
  * deliberately ignored (it is not part of the contract the queries rely
  * on; every fixture column is non-null in practice but the writer is free
  * to mark them optional).
  */
class FixtureSchemaSpec extends SparkSuite {

  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.map(f => (f.name, f.dataType.sql)).toSeq

  private def pin(table: String, expected: (String, String)*): Unit =
    test(s"fixture schema: $table") {
      assert(shape(spark.read.parquet(s"$sf001/$table.parquet")) == expected.toSeq)
    }

  pin("region", "r_regionkey" -> "INT", "r_name" -> "STRING")
  pin("nation", "n_nationkey" -> "INT", "n_name" -> "STRING", "n_regionkey" -> "INT")
  pin(
    "customer",
    "c_custkey" -> "BIGINT",
    "c_name" -> "STRING",
    "c_nationkey" -> "INT",
    "c_acctbal" -> "DOUBLE",
    "c_mktsegment" -> "STRING")
  pin(
    "supplier",
    "s_suppkey" -> "BIGINT",
    "s_name" -> "STRING",
    "s_nationkey" -> "INT",
    "s_acctbal" -> "DOUBLE")
  pin(
    "part",
    "p_partkey" -> "BIGINT",
    "p_name" -> "STRING",
    "p_brand" -> "STRING",
    "p_type" -> "STRING",
    "p_size" -> "INT",
    "p_retailprice" -> "DOUBLE")
  pin(
    "orders",
    "o_orderkey" -> "BIGINT",
    "o_custkey" -> "BIGINT",
    "o_orderstatus" -> "STRING",
    "o_totalprice" -> "DOUBLE",
    "o_orderdate" -> "TIMESTAMP_NTZ",
    "o_orderpriority" -> "STRING")
  pin(
    "lineitem",
    "l_orderkey" -> "BIGINT",
    "l_partkey" -> "BIGINT",
    "l_suppkey" -> "BIGINT",
    "l_linenumber" -> "INT",
    "l_quantity" -> "DOUBLE",
    "l_extendedprice" -> "DOUBLE",
    "l_discount" -> "DOUBLE",
    "l_tax" -> "DOUBLE",
    "l_returnflag" -> "STRING",
    "l_linestatus" -> "STRING",
    "l_shipdate" -> "TIMESTAMP_NTZ")
  pin(
    "documents",
    "doc_id" -> "BIGINT",
    "text" -> "STRING",
    "lang" -> "STRING",
    "source" -> "STRING",
    "n_chars" -> "BIGINT")
  pin(
    "embeddings",
    "vec_id" -> "BIGINT",
    "embedding" -> "ARRAY<FLOAT>",
    "label" -> "INT")
  // events raw layout on disk as of the 2026-08-13 refresh: micros NTZ
  pin(
    "events",
    "event_id" -> "BIGINT",
    "ts" -> "TIMESTAMP_NTZ",
    "user_id" -> "BIGINT",
    "event_type" -> "STRING",
    "value" -> "DOUBLE",
    "props" -> "STRING")

  test("Tables.events normalizes ts to session-zoned TIMESTAMP on the current fixtures") {
    val ev = Tables.events(spark, sf001)
    assert(
      shape(ev) == Seq(
        "event_id" -> "BIGINT",
        "ts" -> "TIMESTAMP",
        "user_id" -> "BIGINT",
        "event_type" -> "STRING",
        "value" -> "DOUBLE",
        "props" -> "STRING"))
    // UTC session: NTZ wall-clock micros reinterpret exactly — spot-check one
    // row against the raw NTZ value formatted in UTC.
    val raw = spark.read
      .parquet(s"$sf001/events.parquet")
      .orderBy("event_id")
      .select(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head()
      .getString(0)
    val cooked = ev
      .orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head()
      .getString(0)
    assert(cooked == raw)
  }

  test("Tables.events still reads the retired nanos-as-long layout") {
    import spark.implicits._
    // TIMESTAMP(NANOS) surfaces as LongType under nanosAsLong=true, which is
    // byte-identical to a plain INT64 column — so a long-typed fixture
    // exercises the exact code path the legacy layout took.
    val dir = java.nio.file.Files.createTempDirectory("graft_events_nanos").toString
    val nanos = 1700000000123456789L // 2023-11-14 22:13:20.123456789 UTC
    Seq((1L, nanos, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == nanos / 1000L) // truncation, not rounding
  }
}
