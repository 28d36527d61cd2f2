package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd raw-DEFLATE compressed length of a string's UTF-8 bytes —
  * the engine's 10th kernel, backing the compressibility quality signal
  * (`q_text_compressibility`): machine-generated/boilerplate text
  * compresses far below natural prose, so `deflate_len / n_bytes` is the
  * classic cheap gate for it (used alongside the repetition ratios of
  * `q_text_repetition`, which catch token-level loops; DEFLATE catches
  * longer-range and sub-token redundancy those miss).
  *
  * Deterministic: fixed level 6, fixed strategy, `nowrap` (no zlib
  * header/checksum), single `setInput`+`finish` stream per value — zlib's
  * output is a pure function of (bytes, parameters) under that usage. One
  * native Deflater is reused per thread via reset() (allocation-free hot
  * path; Deflater.end() leaks are the classic pitfall this avoids).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.len(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${DeflateLen.Mod}.len($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }

  def len(u: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(u.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column API: raw-DEFLATE length of the UTF-8 bytes. */
  def of(c: Column): Column = Bridge.column(DeflateLen(Bridge.expression(c)))
}
