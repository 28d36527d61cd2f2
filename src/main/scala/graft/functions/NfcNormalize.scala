package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the canonical first repair of a
  * web-corpus ingest (backing `q_text_normalize`): visually identical
  * strings with different codepoint sequences (é as U+00E9 vs e+U+0301)
  * must hash/dedup/join identically, so every text operator downstream
  * of ingest assumes NFC. Spark has no builtin for it; this is the
  * 11th kernel rather than a UDF so it stays inside whole-stage codegen
  * on the scan path.
  *
  * Fast path: `Normalizer.isNormalized` is an allocation-free scan that
  * short-circuits for already-NFC text (the overwhelming case — real
  * corpora are mostly NFC), returning the input UTF8String untouched;
  * only genuinely decomposed strings pay the String round-trip.
  * Determinism: Unicode canonical composition is version-stable for
  * assigned codepoints (normalization stability policy), so JVM and
  * DuckDB's utf8proc agree on every input the fixtures or a real corpus
  * produce.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${NfcNormalize.Mod}.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API: NFC-normalized text. */
  def of(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
