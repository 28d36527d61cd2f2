package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd scaled dot product over two ARRAY<FLOAT> columns:
  * Σ round(x_i·y_i·1e12) as a LONG.
  *
  * Why it exists (SURVEY.md §2.2-C, q_sim_* / q_dedup_embed):
  *   - float×float is exact in double, and rounding each product to a
  *     scaled integer makes the SUM order-independent — bit-identical
  *     across partitionings and engines (DuckDB oracle:
  *     SUM(CAST(round(x*y*1e12, 0) AS BIGINT))).
  *   - The same computation via zip_with+aggregate runs on the
  *     interpreted higher-order-function path (measured: 125k pairs ×
  *     64 dims ≈ 190 s). This expression generates a tight Java loop —
  *     the hot path stays inside whole-stage codegen.
  *
  * Rounding is half-away-from-zero evaluated on the exact double (the
  * semantics of C/C++ `std::round`, DuckDB's round, and Java BigDecimal
  * HALF_UP on the exact binary value) — NOT Math.round (half-toward-
  * +inf) and NOT floor(x+0.5) (FP-add mis-rounds values just below .5).
  */
case class ScaledDot(left: Expression, right: Expression) extends BinaryExpression {

  // Inputs must both be ARRAY<FLOAT> (AbstractDataType/ExpectsInputTypes
  // is private[sql], so enforcement is by construction via `dot`).
  override def dataType: DataType = LongType
  override def prettyName: String = "scaled_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += ScaledDot.roundHalfAway(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e12)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val cls = ScaledDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $cls.roundHalfAway(((double) $x.getFloat($i)) * ((double) $y.getFloat($i)) * 1e12);
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ScaledDot {

  /** std::round semantics on the exact double: half away from zero.
    * `p - floor(p)` is exact for |p| < 2^52, so the .5 comparison is
    * exact (no `+0.5` FP hazard).
    */
  def roundHalfAway(p: Double): Long = {
    val f = Math.floor(p)
    val r = f.toLong
    val d = p - f
    if (d > 0.5) r + 1
    else if (d < 0.5) r
    else if (p >= 0) r + 1
    else r
  }

  /** Column API: exact scaled dot as DOUBLE (descaled). */
  def dot(a: Column, b: Column): Column =
    Bridge
      .column(ScaledDot(Bridge.expression(a), Bridge.expression(b)))
      .cast("double") / 1e12
}
