package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch (Metwally et al.) as a typed
  * Aggregator — the bounded-memory scale path beside the exact
  * `q_text_wordcount`: per partition the sketch holds at most `capacity`
  * counters regardless of stream length, and only sketches (not raw
  * tokens) cross the shuffle.
  *
  * Estimate contract: for every tracked token, `est ≥ true count` and
  * `true count ≥ est − err` (the classic overestimate guarantee).
  * Eviction: a full sketch replaces its min-count entry; the newcomer
  * inherits `min+1` with `err = min`. Merge (two-sketch union): a token
  * absent from a FULL side could have been counted there up to that
  * side's min counter, so the absent side contributes its min to both
  * est and err — keeps the overestimate guarantee across any merge tree
  * (partial aggregation order included). When `capacity ≥ vocabulary`
  * nothing ever evicts and the sketch is EXACT and deterministic — the
  * property `q_topk_approx` leans on for its oracle (31-token corpus vs
  * capacity 256); the approximate regime is spec-tested with capacity 4
  * on crafted skew.
  *
  * Counters live in parallel arrays with linear probes — fine at demo
  * capacities (≤ a few hundred); a production impl swaps in an
  * open-addressing map + min-heap without changing the contract.
  */
case class SSBuf(toks: Array[String], counts: Array[Long], errs: Array[Long])

case class SSEntry(tok: String, est: Long, err: Long)

class SpaceSaving(capacity: Int) extends Aggregator[String, SSBuf, Array[SSEntry]] {

  override def zero: SSBuf = SSBuf(Array.empty, Array.empty, Array.empty)

  private def minIdx(counts: Array[Long]): Int = {
    var mi = 0
    var i = 1
    while (i < counts.length) { if (counts(i) < counts(mi)) mi = i; i += 1 }
    mi
  }

  private def minOf(b: SSBuf): Long =
    if (b.toks.length < capacity) 0L
    else b.counts(minIdx(b.counts))

  override def reduce(b: SSBuf, tok: String): SSBuf = {
    if (tok == null) return b
    var i = 0
    while (i < b.toks.length) {
      if (b.toks(i) == tok) { b.counts(i) += 1; return b }
      i += 1
    }
    if (b.toks.length < capacity)
      SSBuf(b.toks :+ tok, b.counts :+ 1L, b.errs :+ 0L)
    else {
      val mi = minIdx(b.counts)
      val m = b.counts(mi)
      b.toks(mi) = tok
      b.counts(mi) = m + 1
      b.errs(mi) = m
      b
    }
  }

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    if (a.toks.isEmpty) return b
    if (b.toks.isEmpty) return a
    val mA = minOf(a)
    val mB = minOf(b)
    val union = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < a.toks.length) {
      union(a.toks(i)) = (a.counts(i), a.errs(i)); i += 1
    }
    i = 0
    while (i < b.toks.length) {
      val t = b.toks(i)
      union.get(t) match {
        case Some((c, e)) => union(t) = (c + b.counts(i), e + b.errs(i))
        case None => union(t) = (b.counts(i) + mA, b.errs(i) + mA)
      }
      i += 1
    }
    // tokens seen only in a get the other side's min mass
    val inB = b.toks.toSet
    i = 0
    while (i < a.toks.length) {
      val t = a.toks(i)
      if (!inB.contains(t)) {
        val (c, e) = union(t)
        union(t) = (c + mB, e + mB)
      }
      i += 1
    }
    // keep the top `capacity` by estimate (deterministic tiebreak)
    val kept = union.toArray
      .sortBy { case (t, (c, _)) => (-c, t) }
      .take(capacity)
    SSBuf(kept.map(_._1), kept.map(_._2._1), kept.map(_._2._2))
  }

  override def finish(b: SSBuf): Array[SSEntry] = {
    val out = Array.tabulate(b.toks.length)(i => SSEntry(b.toks(i), b.counts(i), b.errs(i)))
    out.sortBy(e => (-e.est, e.tok))
  }

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[Array[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[SSEntry]]()
}
