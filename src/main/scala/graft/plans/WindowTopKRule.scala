package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (injected via [[graft.GraftExtensions]]): rewrite the
  * idiomatic per-group top-k window shape
  *
  * {{{ ... row_number() OVER (PARTITION BY g ORDER BY v DESC, t ASC) AS rn
  *     ... WHERE rn <= k }}}
  *
  * to the native bounded-heap operator [[GroupTopKPlan]] — the operator-
  * substitution half of owning a custom physical operator: users keep
  * writing the standard SQL/DataFrame form and transparently get one
  * hash exchange + k-slot heaps instead of a full partition sort under
  * WindowExec (row/rank parity pinned in GroupTopKSpec and by
  * `q_topk_group` hash-matching with the rule active).
  *
  * r12: the TIE-AWARE top-k family rewrites too — `rank()` and
  * `dense_rank()` with the same bound, over either ONE order column or
  * the (order, tie) pair. Ties at the k boundary all survive (the
  * bucket structure in [[GroupTopKBuckets]]), exactly matching the
  * window form; score-ranked retrieval where ties are the common case
  * no longer falls back to a partition-wide sort. Low-NDV caveat: Dense
  * mode retains every row of the top-k distinct order values in both
  * phases, so over a very low-cardinality order column the map-side
  * bound degrades to the output size (which is what the query asked
  * for — but the rule has no NDV statistics to refuse the shape).
  *
  * Matching is deliberately strict, like [[HofToKernelRule]]: a Filter
  * whose condition is exactly `rn <= IntLiteral` (or `rn < lit`,
  * `lit >= rn`, `lit > rn`) over a Window computing exactly ONE window
  * expression — `row_number()`/`rank()`/`dense_rank()` partitioned by
  * one or more plain attributes and ordered by (attr DESC, attr ASC) or
  * (attr ASC, attr ASC) — rank/dense_rank also accept a single order
  * attribute — with Spark's default null ordering for each direction —
  * optionally through a pass-through Project. Analyzer-extracted
  * expression keys legitimately match too: `PARTITION BY c_nationkey %
  * 5` is projected to a `_w0` attribute by ExtractWindowExpressions
  * BEFORE the optimizer runs, so the rule sees a plain attribute and
  * rewrites (pinned in ExtensionsSpec). The ASC-first form is the
  * bottom-k shape of ascending metrics (nearest distances: the recall
  * harnesses' ADC candidate top-50); without it those windows fell back
  * to a full WindowExec partition sort over only nQ partitions — a
  * parallelism collapse the bounded heap sidesteps. Anything else
  * (percent_rank/ntile, non-default null ordering, expressions in the
  * sort) stays on WindowExec. Spark's own InferWindowGroupLimit may
  * have wrapped the window's child in a WindowGroupLimit pre-filter by
  * the time this rule runs; it is subsumed by the rewrite and unwrapped.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** (rankAttr exprId, k) from the filter condition, if it is a pure
    * rank bound. `rn = 1` (r12) is the ubiquitous argmax-per-group
    * shape and is exactly top-1 — every rank function starts at 1, so
    * equality at 1 ≡ `rn <= 1`; equality at any HIGHER literal selects
    * a slice, not a prefix, and must not match.
    */
  private def rankBound(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
    case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
    case GreaterThan(Literal(k: Int, _), a: Attribute) => Some((a, k - 1))
    case EqualTo(a: Attribute, Literal(1, _)) => Some((a, 1))
    case EqualTo(Literal(1, _), a: Attribute) => Some((a, 1))
    case _ => None
  }

  /** The window rank function, if it is one GroupTopK implements. */
  private def rankFn(e: Expression): Option[TopKMode] = e match {
    case _: RowNumber => Some(TopKMode.RowNum)
    case _: Rank => Some(TopKMode.Rank)
    case _: DenseRank => Some(TopKMode.Dense)
    case _ => None
  }

  /** (order, tie, ascFirst) from the window ORDER BY, if the shape (and
    * per-direction default null ordering) is one the operator
    * implements. Tie-aware modes accept a single order column — the
    * common rank() shape — by passing the order column as its own
    * (vacuous) tiebreak; row_number NEEDS the explicit tiebreak for a
    * deterministic row set, so the single-column form stays on
    * WindowExec.
    */
  private def sortShape(
      sos: Seq[SortOrder],
      mode: TopKMode): Option[(Attribute, Attribute, Boolean)] = sos match {
    case Seq(
          SortOrder(v: Attribute, Descending, NullsLast, _),
          SortOrder(t: Attribute, Ascending, NullsFirst, _)) =>
      Some((v, t, false))
    case Seq(
          SortOrder(v: Attribute, Ascending, NullsFirst, _),
          SortOrder(t: Attribute, Ascending, NullsFirst, _)) =>
      Some((v, t, true))
    case Seq(SortOrder(v: Attribute, Descending, NullsLast, _)) if mode != TopKMode.RowNum =>
      Some((v, v, false))
    case Seq(SortOrder(v: Attribute, Ascending, NullsFirst, _)) if mode != TopKMode.RowNum =>
      Some((v, v, true))
    case _ => None
  }

  /** The single rank-family window alias of a Window node, with its
    * (groups, order, tie) attributes, order direction (true = ASC-first)
    * and mode — None unless the shape is one GroupTopK implements.
    */
  private def topkWindow(
      w: Window): Option[(Alias, Seq[Attribute], Attribute, Attribute, Boolean, TopKMode)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(fn, WindowSpecDefinition(gs, sos, _)), _))
          if gs.nonEmpty && gs.forall(_.isInstanceOf[Attribute]) =>
        for {
          mode <- rankFn(fn)
          (v, t, asc) <- sortShape(sos, mode)
        } yield (a, gs.map(_.asInstanceOf[Attribute]), v, t, asc, mode)
      case _ => None
    }

  /** Skip a WindowGroupLimit inserted by InferWindowGroupLimit — the
    * native operator subsumes that pre-filter.
    */
  private def unwrapGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case gl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => gl.child
    case other => other
  }

  private def rewrite(
      cond: Expression,
      w: Window,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    for {
      (rnRef, k) <- rankBound(cond)
      (alias, gs, v, t, asc, mode) <- topkWindow(w)
      if rnRef.exprId == alias.exprId && k > 0
    } yield {
      val topk =
        GroupTopKPlan(unwrapGroupLimit(w.child), gs, v, t, k, alias.toAttribute, asc, mode)
      // keep the Filter node: it is now trivially true, but preserving it
      // keeps this rewrite purely local (no one above can tell)
      Filter(cond, wrap(topk))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      rewrite(cond, w, topk => p.copy(child = topk)).getOrElse(f)
  }
}
