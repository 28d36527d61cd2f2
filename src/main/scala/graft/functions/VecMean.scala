package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed vector-mean UDAF: per-group centroid of an ARRAY<FLOAT> column
  * with an exact fixed-point accumulator (SURVEY.md §2.2-C,
  * `q_embed_centroid`).
  *
  * Why an Aggregator and not posexplode+avg: exploding a 64-dim embedding
  * multiplies the scan output ×64 BEFORE partial aggregation gets to
  * shrink it — at 100 TB that is 6.4 PB of transient rows feeding the
  * hash-agg. The Aggregator keeps the vector whole: each partition folds
  * its rows into one (sums[dim], count) buffer, and only K buffers per
  * partition reach the shuffle (map-side partial merge is automatic for
  * Aggregators). The shuffle payload is K × (64 longs + 1), independent
  * of row count.
  *
  * Exactness: each element is quantized to scale-6 fixed point with
  * [[ScaledDot.roundHalfAway]] (std::round / DuckDB round semantics on
  * the exact double), summed as Long — so partial-merge order cannot
  * perturb the result and the DuckDB oracle
  * `SUM(CAST(round(CAST(v AS DOUBLE)*1e6, 0) AS BIGINT))` matches
  * bit-for-bit. The mean surfaces as `(sum/1e6)/n` in the same IEEE
  * operation order as the oracle's `CAST(... AS DOUBLE)/1e6/count`.
  *
  * Long-micros overflow headroom: |x| ≤ 1 embeddings sum to ≤ 1e6·n —
  * safe to ~9.2e12 rows per group, far past any real per-label count.
  */
case class VecBuf(sums: Array[Long], n: Long)

object VecMean extends Aggregator[Array[Float], VecBuf, Array[Double]] {

  override def zero: VecBuf = VecBuf(Array.emptyLongArray, 0L)

  override def reduce(b: VecBuf, v: Array[Float]): VecBuf = {
    if (v == null) b
    else {
      // dimension mismatches are data corruption: fail loudly. The old
      // fallback (fresh zero array) silently DISCARDED every previously
      // accumulated sum while n kept counting — a wrong centroid with no
      // error.
      require(
        b.n == 0L || b.sums.length == v.length,
        s"VecMean: vector of dim ${v.length} in a group accumulating dim ${b.sums.length}")
      val s = if (b.sums.length == v.length) b.sums else new Array[Long](v.length)
      var i = 0
      while (i < v.length) {
        s(i) += ScaledDot.roundHalfAway(v(i).toDouble * 1e6)
        i += 1
      }
      VecBuf(s, b.n + 1)
    }
  }

  override def merge(a: VecBuf, b: VecBuf): VecBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(
        a.sums.length == b.sums.length,
        s"VecMean: merging buffers of dim ${a.sums.length} and ${b.sums.length}")
      val s = a.sums.clone()
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VecBuf(s, a.n + b.n)
    }

  override def finish(b: VecBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray
    else b.sums.map(s => s.toDouble / 1e6 / b.n)

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
