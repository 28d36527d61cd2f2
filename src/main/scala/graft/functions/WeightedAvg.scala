package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo (SURVEY.md §2.2-B): weighted average with an exact
  * decimal accumulator. Each addend is quantized to scale 6 exactly like
  * `CAST(x AS DECIMAL(18,6))` (shortest-repr BigDecimal → setScale
  * HALF_UP), so partial-merge order can't perturb the result and the
  * DuckDB oracle (decimal sums → double division) matches bit-for-bit.
  *
  * The buffer is fixed-point Long micros, not BigDecimal: the quantized
  * addends are exact integers at scale 6, so Long addition carries the
  * identical value while the per-row buffer ser/de stays primitive
  * (a BigDecimal buffer pays object round-trips through the row format on
  * every row — measured as the dominant cost of the first version).
  * Long micros cap at ~9.2e12 in DECIMAL(18,6) terms, the same headroom
  * the declared DECIMAL(18,6) oracle type has.
  */
case class WavgBuf(sumPwMicros: Long, sumWMicros: Long)

object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {

  private def micros6(x: Double): Long = graft.Tables.decimalMicros(x)

  override def zero: WavgBuf = WavgBuf(0L, 0L)
  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val (x, w) = in
    WavgBuf(b.sumPwMicros + micros6(x * w), b.sumWMicros + micros6(w))
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.sumPwMicros + b.sumPwMicros, a.sumWMicros + b.sumWMicros)
  /** Micros → double by SPLIT reconstruction (r8): integer part via one
    * correctly-rounded long→double, fraction exactly, one IEEE add — the
    * same three steps the oracle's `CAST(floor(S) AS DOUBLE) +
    * CAST(S - floor(S) AS DOUBLE)` performs, so the doubles are identical
    * across engines even when the scaled sum exceeds 2^64 and DuckDB's
    * direct int128→double would double-round (the r7 ×10 probe measured
    * wavg 2 ulp off through `BigDecimal.doubleValue`, whose single
    * rounding DIFFERS from the oracle-side two-step exactly there).
    * floorDiv/floorMod mirror SQL floor() on negatives.
    */
  private def splitToDouble(micros: Long): Double =
    Math.floorDiv(micros, 1000000L).toDouble +
      Math.floorMod(micros, 1000000L).toDouble / 1e6

  override def finish(b: WavgBuf): Double =
    if (b.sumWMicros == 0L) Double.NaN
    else splitToDouble(b.sumPwMicros) / splitToDouble(b.sumWMicros)
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
