package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch via a relative-error log-histogram (the
  * DDSketch idea, Masson et al., VLDB'19) as a typed Aggregator — the
  * quantile member of the re-aggregatable sketch family beside the HLL
  * distinct sketches (`q_agg_hll_merge`) and the Space-Saving top-k:
  * precompute one sketch per partition/day/group, merge to answer any
  * rollup, never rescan raw values.
  *
  * Design: positive values map to bucket `floor(ln(x) / ln(gamma))` with
  * `gamma = 1.02` — every value in a bucket is within one gamma of the
  * bucket's geometric midpoint, so any reported quantile has ≤ ~1%
  * relative error by construction. Zero/negative values count into a
  * dedicated underflow bucket (reported as 0.0); NaN inputs are IGNORED
  * (they are not "below all data" — counting them anywhere would
  * silently deflate every quantile). Buckets live in sorted parallel
  * arrays (same zero-garbage reduce discipline as [[SpaceSaving]]: the
  * common case bumps a count in place; a new bucket — bounded by the
  * data's DYNAMIC RANGE, ~700 buckets across 1..10⁶ at 2% grain, never
  * by row count — pays one array copy). Merge is exact element-wise
  * addition — associative and commutative, so partial-aggregation order
  * cannot perturb the result and the sketch is fully deterministic
  * (partitioning-invariance is spec-pinned, with ≤ 2% error vs the
  * exact percentile, in QuantileSketchSpec).
  */
case class QBuf(bins: Array[Int], counts: Array[Long])

class LogHistQuantile(qs: Seq[Double]) extends Aggregator[Double, QBuf, Array[Double]] {

  private val lnGamma = math.log(1.02)

  /** Zero/negative sentinel bin; Int.MinValue sorts before every real
    * log-bucket index, so the rank walk sees it first.
    */
  private val Under = Int.MinValue

  override def zero: QBuf = QBuf(Array.empty, Array.empty)

  private def bump(b: QBuf, bin: Int): QBuf = {
    val idx = java.util.Arrays.binarySearch(b.bins, bin)
    if (idx >= 0) {
      b.counts(idx) += 1L // in-place: zero allocation on the hot path
      b
    } else {
      val at = -idx - 1
      val nb = new Array[Int](b.bins.length + 1)
      val nc = new Array[Long](b.counts.length + 1)
      System.arraycopy(b.bins, 0, nb, 0, at)
      System.arraycopy(b.counts, 0, nc, 0, at)
      nb(at) = bin
      nc(at) = 1L
      System.arraycopy(b.bins, at, nb, at + 1, b.bins.length - at)
      System.arraycopy(b.counts, at, nc, at + 1, b.counts.length - at)
      QBuf(nb, nc)
    }
  }

  override def reduce(b: QBuf, x: Double): QBuf =
    if (x.isNaN) b
    else if (!(x > 0.0)) bump(b, Under)
    else bump(b, math.floor(math.log(x) / lnGamma).toInt)

  override def merge(a: QBuf, b: QBuf): QBuf = {
    // merge two sorted (bin, count) runs
    val nb = new Array[Int](a.bins.length + b.bins.length)
    val nc = new Array[Long](nb.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.bins.length || j < b.bins.length) {
      if (j >= b.bins.length || (i < a.bins.length && a.bins(i) < b.bins(j))) {
        nb(k) = a.bins(i); nc(k) = a.counts(i); i += 1
      } else if (i >= a.bins.length || b.bins(j) < a.bins(i)) {
        nb(k) = b.bins(j); nc(k) = b.counts(j); j += 1
      } else {
        nb(k) = a.bins(i); nc(k) = a.counts(i) + b.counts(j); i += 1; j += 1
      }
      k += 1
    }
    QBuf(java.util.Arrays.copyOf(nb, k), java.util.Arrays.copyOf(nc, k))
  }

  override def finish(b: QBuf): Array[Double] = {
    var total = 0L
    b.counts.foreach(total += _)
    if (total == 0L) Array.fill(qs.length)(Double.NaN)
    else
      qs.map { q =>
        // lower nearest-rank quantile over the cumulative bucket counts
        val rank = math.max(1L, math.ceil(q * total).toLong)
        var acc = 0L
        var i = 0
        var out = Double.NaN
        while (i < b.bins.length && out.isNaN) {
          acc += b.counts(i)
          if (acc >= rank) {
            out =
              if (b.bins(i) == Under) 0.0
              // geometric midpoint of bucket [gamma^k, gamma^(k+1))
              else math.exp((b.bins(i) + 0.5) * lnGamma)
          }
          i += 1
        }
        out
      }.toArray
  }

  override def bufferEncoder: Encoder[QBuf] = Encoders.product[QBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
