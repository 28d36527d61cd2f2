package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen'd readability counts (r16, guide step 4 "eliminate
  * non-codegen hot-path work"): the three per-document integers
  * `q_text_readability` needs —
  *
  *   - `n_words`: space-split non-empty token count (the battery's `toks`
  *     semantics, identical to `size(filter(split(text, ' '), t -> t <> ''))`);
  *   - `n_vowel_runs`: maximal `[aeiou]+` runs of the Locale.ROOT-lowered
  *     text (the classic syllable proxy). Replays Spark `lower` exactly:
  *     `UTF8String.toLowerCase` is an ASCII fast path falling back to
  *     `String.toLowerCase(Locale.ROOT)`, which this kernel calls outright
  *     (identical on ASCII, identical by construction beyond it);
  *   - `n_sent_runs`: maximal `[.!?]+` runs of the raw text.
  *
  * The old formulation built TWO regex-replaced copies of every document
  * (marker substitution) plus two `translate` copies and four length
  * scans per doc — ~2-3 s of pure task CPU at sf0.1. Counting run STARTS
  * in one static monomorphic pass is the same cure [[TextProfile]]
  * applied to the HOF battery; the entry's DuckDB oracle still replays
  * the regexp_replace formulation, so the hash match proves count
  * equivalence, not just plausibility.
  */
case class ReadabilityCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ReadabilityCounts.schema
  override def prettyName: String = "readability_counts"

  override def nullSafeEval(input: Any): Any =
    ReadabilityCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${ReadabilityCounts.Mod}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ReadabilityCounts {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_vowel_runs", IntegerType, nullable = false),
    StructField("n_sent_runs", IntegerType, nullable = false)))

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length

    // words + sentence-mark runs: one pass over the RAW text
    var nWords = 0
    var nSent = 0
    var inWord = false
    var inSent = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') { if (inWord) { nWords += 1; inWord = false } }
      else if (!inWord) inWord = true
      val sent = c == '.' || c == '!' || c == '?'
      if (sent) { if (!inSent) { nSent += 1; inSent = true } }
      else inSent = false
      i += 1
    }
    if (inWord) nWords += 1

    // vowel runs: counted over the SAME lowering Spark's `lower` performs
    // (UTF8String.toLowerCase = ASCII fast path, else
    // String.toLowerCase(Locale.ROOT) — calling the latter outright is
    // identical on ASCII and definitionally identical beyond it)
    val ls = s.toLowerCase(java.util.Locale.ROOT)
    val m = ls.length
    var nVowel = 0
    var inRun = false
    i = 0
    while (i < m) {
      if (isVowel(ls.charAt(i))) { if (!inRun) { nVowel += 1; inRun = true } }
      else inRun = false
      i += 1
    }

    new GenericInternalRow(Array[Any](nWords, nVowel, nSent))
  }

  /** Column API: readability_counts(text) → struct (see [[schema]]). */
  def of(c: Column): Column = Bridge.column(ReadabilityCounts(Bridge.expression(c)))
}
