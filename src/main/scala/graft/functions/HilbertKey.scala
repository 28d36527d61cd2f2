package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 16-level Hilbert-curve key (see `q_layout_hilbert`): the
  * classic xy→d walk over a 16-bit × 16-bit plane as ONE expression call.
  *
  * Why it exists: the same walk as 16 chained projection stages is correct
  * (and is exactly what the DuckDB oracle still replays as 16 CTEs), but
  * it pays for 16 `withColumn` layers of expression tree per row — the
  * round-4/5 benches put the query at ~3-4 s, the worst healthy entry at
  * sf0.1. The static monomorphic loop keeps the whole walk in one
  * JIT-owned method (the standard kernel-tier rationale: see
  * [[ScaledDot]]); the dataframe side shrinks to normalize → one call.
  * Pure integer math — bit-identical to the staged form by construction,
  * which `LayoutSpec` pins (kernel ≡ staged on real orders rows).
  */
case class HilbertKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKey.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val cls = HilbertKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"${ev.value} = $cls.xy2d($x, $y);"
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object HilbertKey {

  /** The 16 rotation/reflection rounds in one static call. Identical
    * per-round math to the staged dataframe form it replaced (and to the
    * oracle's generated CTE chain): rx/ry bit tests, d += s²·((3·rx)⊕ry),
    * then the ry=0 rotation (rx=1: both coordinates reflect; rx=0: swap).
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          val t = x
          x = (s - 1) - y
          y = (s - 1) - t
        } else {
          val t = x
          x = y
          y = t
        }
      }
      s >>= 1
    }
    d
  }

  /** Column API: hilbert_key(x, y) → BIGINT distance along the curve. */
  def of(x: Column, y: Column): Column =
    Bridge.column(HilbertKey(Bridge.expression(x), Bridge.expression(y)))
}
