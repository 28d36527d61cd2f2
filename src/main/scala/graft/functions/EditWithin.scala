package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd bounded edit distance: levenshtein(a, b) if it is ≤
  * ⌊max(|a|,|b|)/5⌋ (the fuzzy-dedup 20% threshold), else -1.
  *
  * Why it exists (q_dedup_fuzzy): Spark's `levenshtein` runs the full
  * O(n·m) matrix through the UTF8String codepoint path, and the filter
  * form `levenshtein(t1,t2)*5 <= mx` gets folded into the join condition
  * AND recomputed by the output projection — measured 23.8 s at sf0.1
  * for only ~6k candidate pairs. This kernel (a) bands the DP to the
  * ±k diagonal, O(n·k) instead of O(n·m), (b) aborts a row early once
  * every band cell exceeds k, and (c) runs on primitive char arrays in
  * one static monomorphic method (the same JIT-stability shape as
  * ScaledDot — see build.sbt). Threshold folded into the function makes
  * the filter a cheap `>= 0` int compare.
  *
  * Distance is counted over UTF-16 units, which equals codepoint
  * distance for BMP text (the corpus is ASCII; DuckDB's levenshtein
  * counts codepoints — identical on BMP, documented divergence on
  * astral-plane input).
  */
case class EditWithin(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_within"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditWithin.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val cls = EditWithin.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"${ev.value} = $cls.dist($x, $y);"
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object EditWithin {

  /** Banded levenshtein with threshold k = max(n,m)/5; returns -1 when the
    * distance exceeds k. Standard two-row DP restricted to the |i-j| ≤ k
    * diagonal band, with an early abort when a whole band row floors
    * above k (no cell can recover).
    */
  def dist(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    // order so the inner dimension is the shorter string
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    val k = math.max(n, m) / 5
    if (m - n > k) return -1
    if (m == 0) return 0 // both empty (m >= n)
    val Inf = k + 1
    // prev(j) = edit distance for (i-1, j); band means j in [i-k, i+k].
    // Rows swap each iteration; the two guard writes (below lo, above hi)
    // keep every band-adjacent cell fresh across the swap, since the band
    // only moves right by one per row.
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else Inf; j += 1 }
    var i = 1
    while (i <= m) {
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      cur(0) = if (i <= k) i else Inf
      if (lo > 1) cur(lo - 1) = Inf
      var best = Inf
      val tc = t.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(j - 1) == tc) prev(j - 1) else {
          val del = if (prev(j) < cur(j - 1)) prev(j) else cur(j - 1)
          val sub = if (prev(j - 1) < del) prev(j - 1) else del
          sub + 1
        }
        val c = if (cost > Inf) Inf else cost
        cur(j) = c
        if (c < best) best = c
        j += 1
      }
      if (hi < n) cur(hi + 1) = Inf
      if (best > k) return -1 // every band cell is past the threshold
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(n) > k) -1 else prev(n)
  }

  /** Column API: edit distance if within 20% of the longer input, else -1. */
  def of(a: Column, b: Column): Column =
    Bridge.column(EditWithin(Bridge.expression(a), Bridge.expression(b)))
}
