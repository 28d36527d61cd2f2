package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  AttributeReference,
  AttributeSet,
  BindReferences,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native sort-merge AS-OF join — the one custom physical operator
  * SURVEY §4 deferred: for each left row, the greatest right time ≤ the
  * left time within the same key, emitted as one extra column.
  *
  * Why a custom operator instead of the union-window formulation
  * (`Relational.qJoinAsof`): the window form materializes
  * left ∪ right through ONE sort on (key, time, kind) and carries every
  * left column through that union (padded nulls on the right side). The
  * native operator keeps the sides separate — each sorts only its own
  * columns — and the per-partition merge is a single forward pass with
  * O(1) state (no window frame machinery). Same shuffle count (one
  * hash-partition per side on its key, exactly like a sort-merge join).
  *
  * Planning contract, declared not hand-scheduled: requiredChild-
  * Distribution = ClusteredDistribution per side (EnsureRequirements
  * co-partitions the sides), requiredChildOrdering = (key, time) per
  * side (EnsureRequirements inserts the sorts) — Catalyst/AQE own the
  * exchanges, the operator owns only the merge.
  *
  * Tie semantics: inclusive (right time == left time matches), and the
  * matched value is the right TIME itself — deliberately tie-insensitive
  * (which right ROW among equal times wins is not deterministic in any
  * engine; the time value is). Mirrors DuckDB `ASOF JOIN ... ON l.t >=
  * r.t`'s matched-time semantics, so the same oracle SQL applies.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    outAttr: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan = copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec (registered via
  * `spark.experimental.extraStrategies` by [[AsOfJoin.asof]], and via
  * `GraftExtensions` for extension-configured sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, out) =>
      AsOfJoinExec(lk, rk, lt, rt, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    outAttr: Attribute,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    // widen to Expression: bindReference casts its result back to the
    // argument's static type, and a bound Attribute is a BoundReference
    val lKey =
      BindReferences.bindReference(leftKey: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val lTime =
      BindReferences.bindReference(leftTime: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val rKey =
      BindReferences.bindReference(rightKey: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    val rTime =
      BindReferences.bindReference(rightTime: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    val keyOrd =
      TypeUtils.getInterpretedOrdering(leftKey.dataType).asInstanceOf[Ordering[Any]]
    val timeOrd =
      TypeUtils.getInterpretedOrdering(leftTime.dataType).asInstanceOf[Ordering[Any]]
    val outputAttrs = output
    val leftAttrs = left.output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outputAttrs, leftAttrs :+ outAttr)
      val joined = new JoinedRow
      val matchRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      var pending: InternalRow = null
      var pendingKey: Any = null
      var pendingTime: Any = null
      def advance(): Unit = {
        pending = null
        // skip right rows with null key or null time — they can't match.
        // The eval'd values are RETAINED across iterator advances
        // (pendingKey/Time, then matchKey/Time), and the right iterator
        // reuses its UnsafeRow buffer — buffer-backed values (string
        // keys, nested times) must be deep-copied or they silently
        // mutate; primitives copy for free (same rule as GroupTopKExec).
        while (pending == null && ri.hasNext) {
          val r = ri.next()
          val k = rKey.eval(r)
          val t = rTime.eval(r)
          if (k != null && t != null) {
            pending = r
            pendingKey = InternalRow.copyValue(k)
            pendingTime = InternalRow.copyValue(t)
          }
        }
      }
      advance()
      // O(1) merge state: the last right (key, time) consumed
      var matchKey: Any = null
      var matchTime: Any = null
      li.map { l =>
        val k = lKey.eval(l)
        val t = lTime.eval(l)
        var out: Any = null
        if (k != null && t != null) {
          // drop right rows keyed before the current left key
          while (pending != null && keyOrd.compare(pendingKey, k) < 0) advance()
          // consume right rows at this key with time <= left time; the
          // LAST consumed is the as-of match (right side sorted by time)
          while (pending != null && keyOrd.equiv(pendingKey, k) &&
            timeOrd.compare(pendingTime, t) <= 0) {
            matchKey = pendingKey
            matchTime = pendingTime
            advance()
          }
          if (matchKey != null && keyOrd.equiv(matchKey, k)) out = matchTime
        }
        matchRow.update(0, out)
        proj(joined(l, matchRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

/** Public builder: `AsOfJoin.asof(events, "user_id", "ts", orders,
  * "o_custkey", "o_orderdate", "last_order_date")` → events columns plus
  * the as-of matched order date.
  */
object AsOfJoin {
  def asof(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      outName: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output
        .find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val rt = attr(rp, rightTime)
    val out = AttributeReference(outName, rt.dataType, nullable = true)()
    Bridge.dataset(
      spark,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime), rt, out))
  }
}
