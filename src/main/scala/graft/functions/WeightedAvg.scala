package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo (SURVEY.md §2.2-B): weighted average with an exact
  * decimal accumulator. Each addend is quantized to scale 6 exactly like
  * `CAST(x AS DECIMAL(18,6))` (shortest-repr BigDecimal → setScale
  * HALF_UP), so partial-merge order can't perturb the result and the
  * DuckDB oracle (decimal sums → double division) matches bit-for-bit.
  */
case class WavgBuf(sumPw: BigDecimal, sumW: BigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {
  private def dec6(x: Double): BigDecimal =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val (x, w) = in
    WavgBuf(b.sumPw + dec6(x * w), b.sumW + dec6(w))
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.sumPw + b.sumPw, a.sumW + b.sumW)
  override def finish(b: WavgBuf): Double =
    if (b.sumW.signum == 0) Double.NaN else b.sumPw.toDouble / b.sumW.toDouble
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
