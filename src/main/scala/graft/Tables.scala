package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans except `events`, whose `ts` column has
  * shipped in two physical layouts across fixture generations, so the loader
  * adapts to whatever is on disk:
  *
  *   - INT64 TIMESTAMP(NANOS): Spark refuses to read it natively
  *     (PARQUET_TYPE_ILLEGAL); with `spark.sql.legacy.parquet.nanosAsLong`
  *     it surfaces as LongType epoch-nanos. We truncate to microseconds with
  *     integer division (`div`), matching DuckDB's TIMESTAMP_NS → TIMESTAMP
  *     cast (truncation, not rounding). Going through a double (`/ 1000`)
  *     would corrupt the low digits: epoch-nanos ≈ 1.7e18 exceeds double's
  *     2^53 integer range.
  *   - INT64 TIMESTAMP_MICROS with isAdjustedToUTC=false: Spark reads
  *     TIMESTAMP_NTZ. The session timezone is pinned to UTC in every entry
  *     point, so `cast("timestamp")` reinterprets the wall-clock value
  *     exactly, and DuckDB reads the same micros natively — oracle hashes
  *     are unaffected.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table, layout-adaptive (see object doc).
    *
    * @note SESSION-GLOBAL SIDE EFFECT: loading this table pins
    *       `spark.sql.session.timeZone` to UTC (loudly, on stderr) unless
    *       the configured zone already normalizes to the UTC offset, and
    *       enables `nanosAsLong`. The pin is load-bearing for the NTZ
    *       fixture layout and cannot be restored after the lazy cast.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Our own entry points (Bench/Verify/Explain/tests) set these at session
    // build; the guarded fallbacks exist only for externally-owned sessions
    // (the driver's t1 smoke passes its own SparkSession into SparkEntry).
    // nanosAsLong is harmless for micros/NTZ files — it only affects
    // TIMESTAMP(NANOS). The UTC pin is LOAD-BEARING for the NTZ layout:
    // `cast(ntz as timestamp)` reinterprets the wall clock in the SESSION
    // zone, so a non-UTC external session would silently shift every
    // events timestamp against the oracle's naive read.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Normalize before comparing (round-6 ADVICE): Etc/UTC, GMT, +00:00
    // etc. all resolve to the UTC offset — overriding those would be a
    // needless session-global mutation. Unparseable zone ids fall through
    // to the override (the pin is the safe direction).
    val tzConf = spark.conf.get("spark.sql.session.timeZone")
    val alreadyUtc =
      try java.time.ZoneId.of(tzConf).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    if (!alreadyUtc) {
      // Session-global side effect, so be LOUD about it. Restoring after
      // the read is impossible (the cast evaluates lazily at action
      // time), and without the pin every events timestamp is silently
      // shifted — the worse failure mode.
      System.err.println(
        "[graft] overriding spark.sql.session.timeZone -> UTC " +
          s"(required for the events NTZ fixture; was $tzConf)")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val ts = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast("timestamp")
      case _                => col("ts")
    }
    raw
      .withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Injective DECIMAL(38,0) encoding of a (ts, id) total order for
    * `min_by`/`max_by` extrema: micros (≤16 digits for any realistic
    * epoch) × 10²¹ + id (unique, < 10²¹ with margin) — value ≤ ~1.7e36
    * < 10³⁸, so the product neither overflows nor loses scale-0
    * precision. A STRUCT ordering key would be semantically identical,
    * but structs are not hash-aggregable buffer types: the whole
    * aggregation falls back to SortAggregate (a per-partition sort of
    * the raw input), and in STREAMING mode a struct buffer forces the
    * same demotion inside the state store. A decimal IS a mutable
    * buffer type, keeping batch plans on HashAggregate and streaming
    * state flat. Shared by `q_time_m4` and `s_stream_m4` so the batch
    * and streaming first/last semantics cannot drift.
    */
  def tsIdKey(ts: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (unix_micros(ts).cast("decimal(16,0)") *
      lit(java.math.BigDecimal.ONE.scaleByPowerOfTen(21)).cast("decimal(22,0)") +
      id.cast("decimal(38,0)")).cast("decimal(38,0)")

  /** 60-bit md5 hash of a key column, as its 15-hex prefix — lowercase
    * hex sorts identically to the numeric value, so sketch states can
    * carry the string directly. ONE definition shared by the HLL
    * registers and the whole KMV family (batch distinct/intersect +
    * streaming state): the cross-engine certs depend on every call site
    * producing bit-identical hash streams, so the expression must not
    * be hand-copied (r12 third-session review).
    */
  def hash60Hex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(c.cast("string").cast("binary")), 1, 15)

  /** [[hash60Hex]] as a 60-bit long. */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(hash60Hex(c), 16, 10).cast("long")

  /** 2⁶⁰ — the KMV hash range, exactly representable as a double. */
  val KmvRange: Double = 1152921504606846976.0

  /** Dense slot grid over [b0, b1] per key row, fanned out CHUNKED
    * (days first, then ≤perDay in-day slots) — the shared fan-out of
    * `q_dq_heartbeat` and `q_events_interpolate`, extracted so the
    * chunk arithmetic cannot drift between them (r12 third-session
    * review). Day indices use a pmod-based FLOOR division: plain `div`
    * truncates toward zero, which for negative (pre-1970) buckets
    * produced descending, out-of-span `sequence()` runs — phantom slots
    * the original unchunked `sequence(b0, b1)` never emitted.
    * `b0 − pmod(b0, p)` is an exact multiple of p, so its `div` IS the
    * floor for any sign.
    */
  def chunkedSlotGrid(
      span: org.apache.spark.sql.DataFrame,
      keyCol: String,
      b0: String,
      b1: String,
      perDay: Long = 288L): org.apache.spark.sql.DataFrame =
    span
      .select(
        col(keyCol),
        col(b0),
        col(b1),
        explode(
          sequence(
            expr(s"($b0 - pmod($b0, ${perDay}L)) div ${perDay}L"),
            expr(s"($b1 - pmod($b1, ${perDay}L)) div ${perDay}L"))).as("day"))
      .select(
        col(keyCol),
        explode(
          sequence(
            greatest(col("day") * perDay, col(b0)),
            least(col("day") * perDay + (perDay - 1), col(b1)))).as("bucket"))

  /** Exact decimal-core double aggregation: cast each addend to
    * DECIMAL(18,6) so partial-aggregate order (Spark shuffles) and engine
    * (Spark vs DuckDB) cannot perturb the sum, then surface a double.
    * Oracle-side equivalent: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE).
    */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact fixed-point power sum — the cheaper sibling of [[dsum]] for
    * multi-sum aggregates (see `q_agg_corr_matrix`, round 6): each addend
    * quantizes to `round(x * grain)` as a LONG, so the hot loop is a
    * double-mult + long-add inside whole-stage codegen instead of a
    * BigDecimal buffer update, and the sum is merge-order-independent by
    * integer exactness. The caller picks `grain` so |sum| stays far below
    * 2^63 for the column's value bound at the target row count. Oracle
    * twin: `CAST(sum(CAST(round((x) * grain) AS BIGINT)) AS DOUBLE) /
    * grain` (DuckDB sums BIGINT into HUGEINT — exact on its side at any
    * grain).
    */
  def fsum(c: org.apache.spark.sql.Column, grain: Double): org.apache.spark.sql.Column = {
    val addend = graft.functions.ScaledLong.of(c.cast("double"), grain)
    // Overflow canary (round-6 ADVICE): the LONG sum wraps SILENTLY in
    // non-ANSI mode, while the DuckDB oracle sums into HUGEINT — a wrap
    // would surface as a hash mismatch only if an oracle run covers that
    // scale. |sum| ≤ count·max|addend|, and that bound is computed in
    // DOUBLES (cannot itself wrap), so asserting it below 2^62 makes a
    // grain/row-count combination that outgrows the documented sizing
    // fail loudly instead of corrupting results. The canary adds + 0.0
    // to the value (assert_true is NULL on pass), so oracle parity and
    // IEEE bits are untouched.
    val bound = count(c).cast("double") * coalesce(max(abs(addend)), lit(0L)).cast("double")
    sum(addend).cast("double") / grain +
      coalesce(
        assert_true(
          bound < lit(4.611686018427388e18), // 2^62
          lit(s"fsum(grain=$grain) overflow canary: count*max|addend| >= 2^62 " +
            "- the fixed-point sum may have wrapped; shrink the grain")).cast("double"),
        lit(0.0))
  }

  /** Deterministic average built from the exact decimal sum; the oracle
    * mirrors the same double-division so both engines produce identical
    * IEEE results: CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)/COUNT(x).
    */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,6)")).cast("double") / count(c)

  /** `CAST(x AS DECIMAL(18,6))` as exact Long micros — the scalar twin of
    * [[dsum]] for typed/stateful accumulators (WeightedAvg, stateful
    * sessionize) that need the identical quantization without a BigDecimal
    * buffer.
    */
  def decimalMicros(x: Double): Long =
    BigDecimal
      .decimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal
      .unscaledValue()
      .longValueExact()
}
