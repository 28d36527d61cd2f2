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
  * relative error by construction. Buckets are a sparse (index → count)
  * map whose size is bounded by the DYNAMIC RANGE of the data, not its
  * volume (~700 buckets span 1 .. 10⁶ at 2% grain); merge is exact
  * element-wise addition — associative and commutative, so partial
  * aggregation order cannot perturb the result and (unlike a sampled
  * t-digest) the sketch is fully deterministic. Zero/negative inputs
  * count into a dedicated underflow bucket (reported as 0.0).
  *
  * The quantile estimate walks the cumulative counts to the target rank
  * and returns the bucket's geometric midpoint — deterministic, and
  * spec-pinned to ≤ 2% relative error against the exact percentile
  * (QuantileSketchSpec also pins merged ≡ direct).
  */
case class QBuf(bins: Map[Int, Long], under: Long)

class LogHistQuantile(qs: Seq[Double]) extends Aggregator[Double, QBuf, Array[Double]] {

  private val lnGamma = math.log(1.02)

  override def zero: QBuf = QBuf(Map.empty, 0L)

  override def reduce(b: QBuf, x: Double): QBuf =
    if (!(x > 0.0)) b.copy(under = b.under + 1)
    else {
      val bin = math.floor(math.log(x) / lnGamma).toInt
      b.copy(bins = b.bins.updated(bin, b.bins.getOrElse(bin, 0L) + 1L))
    }

  override def merge(a: QBuf, b: QBuf): QBuf =
    QBuf(
      b.bins.foldLeft(a.bins) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) },
      a.under + b.under)

  override def finish(b: QBuf): Array[Double] = {
    val total = b.under + b.bins.valuesIterator.sum
    if (total == 0L) Array.fill(qs.length)(Double.NaN)
    else {
      val sorted = b.bins.toArray.sortBy(_._1)
      qs.map { q =>
        // rank of the q-quantile under the lower nearest-rank definition
        val rank = math.max(1L, math.ceil(q * total).toLong)
        if (rank <= b.under) 0.0
        else {
          var acc = b.under
          var i = 0
          var out = Double.NaN
          while (i < sorted.length && out.isNaN) {
            acc += sorted(i)._2
            if (acc >= rank) {
              // geometric midpoint of bucket [gamma^k, gamma^(k+1))
              out = math.exp((sorted(i)._1 + 0.5) * lnGamma)
            }
            i += 1
          }
          out
        }
      }.toArray
    }
  }

  override def bufferEncoder: Encoder[QBuf] = Encoders.product[QBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
