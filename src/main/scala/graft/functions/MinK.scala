package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "k smallest hash priorities" aggregation — the mergeable core
  * of the streaming per-group reservoir sample (`s_stream_reservoir`,
  * the incremental twin of `q_sample_reservoir`): each row carries a
  * reproducible md5 priority, and the k-smallest-priority set is a
  * uniform without-replacement k-sample of everything seen so far.
  *
  * Why this is streaming-safe with NO watermark: the state is a
  * bounded MONOTONE lattice join (taking the k smallest under the total
  * (rkey, event_id) order) — commutative, associative, idempotent — so
  * any partial-aggregation/merge tree, trigger chunking, or restart
  * replay produces the identical ≤k-row state, the same argument as the
  * HLL register table's `max(rho)` (Streams.hllRegisters). State is
  * O(k) per group forever; the sample "improves" monotonically as
  * smaller priorities arrive.
  *
  * Buffer is parallel primitive arrays (the SpaceSaving layout) — an
  * array-of-struct buffer would still encode, but parallel arrays keep
  * the row flat. Sizes here are k+1 at worst between squeezes; the
  * insert is append + sort + truncate, fine for sample-sized k (≤ tens);
  * a production impl for large k swaps in a bounded heap without
  * changing the contract.
  */
case class MinKBuf(rkeys: Array[String], ids: Array[Long], uids: Array[Long])

case class MinKEntry(rkey: String, event_id: Long, user_id: Long)

class MinK(k: Int) extends Aggregator[MinKEntry, MinKBuf, Array[MinKEntry]] {

  override def zero: MinKBuf = MinKBuf(Array.empty, Array.empty, Array.empty)

  /** Sort by (rkey, id), DEDUP identical (rkey, id) pairs, keep k. The
    * dedup makes the lattice join idempotent ELEMENT-wise too: re-fed
    * duplicates (KMV hashes of re-seen users, replayed batches) cannot
    * occupy multiple slots. For the reservoir caller event_ids are
    * unique, so the dedup is a no-op there.
    */
  private def squeeze(rk: Array[String], id: Array[Long], ui: Array[Long]): MinKBuf = {
    val ord = rk.indices.sortBy(i => (rk(i), id(i)))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var prevR: String = null
    var prevI = 0L
    ord.foreach { i =>
      if (out.size < k && (out.isEmpty || rk(i) != prevR || id(i) != prevI)) {
        out += i
        prevR = rk(i)
        prevI = id(i)
      }
    }
    MinKBuf(out.map(rk).toArray, out.map(id).toArray, out.map(ui).toArray)
  }

  override def reduce(b: MinKBuf, in: MinKEntry): MinKBuf = {
    if (in == null || in.rkey == null) return b
    // fast reject: a full buffer whose worst entry beats the newcomer
    if (b.rkeys.length == k) {
      val w = b.rkeys.length - 1
      val worse = (in.rkey > b.rkeys(w)) ||
        (in.rkey == b.rkeys(w) && in.event_id >= b.ids(w))
      if (worse) return b
    }
    squeeze(b.rkeys :+ in.rkey, b.ids :+ in.event_id, b.uids :+ in.user_id)
  }

  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
    squeeze(a.rkeys ++ b.rkeys, a.ids ++ b.ids, a.uids ++ b.uids)

  /** Entries ascending by (rkey, event_id) — position+1 IS the rank the
    * batch twin's row_number assigns.
    */
  override def finish(b: MinKBuf): Array[MinKEntry] = {
    val s = squeeze(b.rkeys, b.ids, b.uids)
    Array.tabulate(s.rkeys.length)(i => MinKEntry(s.rkeys(i), s.ids(i), s.uids(i)))
  }

  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[Array[MinKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[MinKEntry]]()
}
