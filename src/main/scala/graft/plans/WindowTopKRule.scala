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
  * Matching is deliberately strict, like [[HofToKernelRule]]: a Filter
  * whose condition is exactly `rn <= IntLiteral` (or `rn < lit`,
  * `lit >= rn`, `lit > rn`) over a Window computing exactly ONE window
  * expression — `row_number()` partitioned by one or more plain
  * attributes (r11: multi-key `PARTITION BY a, b` — the
  * per-(source, lang) shape) and ordered by (attr DESC, attr ASC) or
  * (attr ASC, attr ASC) with Spark's default null ordering for each
  * direction — optionally through a pass-through Project. The
  * ASC-first form is the bottom-k shape of ascending metrics (nearest
  * distances: the recall harnesses' ADC candidate top-50); without it
  * those windows fell back to a full WindowExec partition sort over
  * only nQ partitions — a parallelism collapse the bounded heap
  * sidesteps. Anything else (rank with ties, expressions in the
  * partition or sort) stays on WindowExec. Spark's own
  * InferWindowGroupLimit may have wrapped the window's child in a
  * WindowGroupLimit pre-filter by the time this rule runs; it is
  * subsumed by the rewrite and unwrapped.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** (rankAttr exprId, k) from the filter condition, if it is a pure
    * rank bound.
    */
  private def rankBound(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
    case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
    case GreaterThan(Literal(k: Int, _), a: Attribute) => Some((a, k - 1))
    case _ => None
  }

  /** The single row_number window alias of a Window node, with its
    * (groups, order, tie) attributes and the order direction (true =
    * ASC-first) — None unless the shape is one GroupTopK implements.
    */
  private def topkWindow(
      w: Window): Option[(Alias, Seq[Attribute], Attribute, Attribute, Boolean)] =
    w.windowExpressions match {
      case Seq(
            a @ Alias(
              WindowExpression(
                _: RowNumber,
                WindowSpecDefinition(
                  gs,
                  Seq(
                    SortOrder(v: Attribute, Descending, NullsLast, _),
                    SortOrder(t: Attribute, Ascending, NullsFirst, _)),
                  _)),
              _)) if gs.nonEmpty && gs.forall(_.isInstanceOf[Attribute]) =>
        Some((a, gs.map(_.asInstanceOf[Attribute]), v, t, false))
      case Seq(
            a @ Alias(
              WindowExpression(
                _: RowNumber,
                WindowSpecDefinition(
                  gs,
                  Seq(
                    SortOrder(v: Attribute, Ascending, NullsFirst, _),
                    SortOrder(t: Attribute, Ascending, NullsFirst, _)),
                  _)),
              _)) if gs.nonEmpty && gs.forall(_.isInstanceOf[Attribute]) =>
        Some((a, gs.map(_.asInstanceOf[Attribute]), v, t, true))
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
      (alias, gs, v, t, asc) <- topkWindow(w)
      if rnRef.exprId == alias.exprId && k > 0
    } yield {
      val topk = GroupTopKPlan(unwrapGroupLimit(w.child), gs, v, t, k, alias.toAttribute, asc)
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
