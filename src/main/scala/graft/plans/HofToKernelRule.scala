package graft.plans

import graft.functions.TextProfile
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (injected via [[graft.GraftExtensions]]): rewrite the
  * naive higher-order-function whitespace token count
  *
  * {{{ size(filter(split(text, ' '), t -> t <> '')) }}}
  *
  * to the codegen'd kernel `text_profile(text).n_tokens`. Semantics are
  * pinned equal (the kernel replays exactly this tokenization —
  * `SimHashSpec`/oracle checks), so a user writing the idiomatic SQL
  * shape transparently gets the kernel's compiled single pass instead of
  * the interpreted HOF chain — the query-rewrite half of what an engine
  * owning its kernels is for.
  *
  * Matching is deliberately strict: exactly `split` on a single-space
  * literal with the default limit, and exactly a `<> ''` (or `!= ''`)
  * lambda — anything else is left untouched.
  */
object HofToKernelRule extends Rule[LogicalPlan] {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  private def isSpaceLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _) => s == Space
    case _ => false
  }

  private def isEmptyLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _) => s == Empty
    case _ => false
  }

  private def isNotEmptyLambda(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Not(EqualTo(v: NamedLambdaVariable, lit)), Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId && isEmptyLit(lit)
    case LambdaFunction(Not(EqualTo(lit, v: NamedLambdaVariable)), Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId && isEmptyLit(lit)
    case _ => false
  }

  private val nTokensOrdinal = TextProfile.schema.fieldIndex("n_tokens")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // legacySizeOfNull must be false (ANSI default): under the legacy
    // flag, size(NULL) returns -1 while the kernel rewrite would return
    // NULL — an optimizer rule must never change results, so the legacy
    // shape is left on the HOF path
    case Size(ArrayFilter(StringSplit(str, regex, Literal(-1, _)), lf: LambdaFunction), false)
        if isSpaceLit(regex) && isNotEmptyLambda(lf) =>
      GetStructField(TextProfile(str), nTokensOrdinal, Some("n_tokens"))
  }
}
