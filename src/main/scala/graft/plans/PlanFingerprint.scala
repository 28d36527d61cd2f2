package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import scala.collection.immutable.SortedMap

/** Normalized static-plan fingerprint for the registry-wide plan-shape
  * golden gate (r15 VERDICT ask #7).
  *
  * Identity = SparkPlan node CLASS counts over the physical tree
  * (subquery plans included), plus derived exchange / whole-stage-codegen
  * tallies. Expression ids, statistics, file paths, and partition counts
  * are deliberately excluded, so the fingerprint is stable across runs
  * and machines and moves only when the plan SHAPE moves — an extra
  * exchange, a HashAggregate demoted to SortAggregate (the M4 struct-key
  * cliff class), a codegen span lost, a join strategy change. Those are
  * exactly the silent 10× regressions every correctness gate stays green
  * through.
  *
  * Fingerprints are taken with AQE OFF: the non-adaptive executedPlan is
  * fully resolved statically (codegen spans inserted, exchanges placed)
  * without running the query, and is deterministic — AQE's runtime
  * re-plans (which only ever REMOVE shuffles or upgrade joins) would
  * otherwise make the shape data-dependent. The gate therefore pins the
  * plan Catalyst commits to BEFORE adaptive improvement.
  */
object PlanFingerprint {

  /** Operator-kind counts (class simple name → occurrences). */
  def of(df: DataFrame): SortedMap[String, Int] = {
    val plan = df.queryExecution.executedPlan
    require(
      !plan.isInstanceOf[AdaptiveSparkPlanExec],
      "fingerprint requires spark.sql.adaptive.enabled=false (adaptive plans are lazily shaped)")
    val counts = scala.collection.mutable.Map.empty[String, Int]
    def walk(p: SparkPlan): Unit =
      p.foreach { n =>
        val k = n.getClass.getSimpleName
        counts.update(k, counts.getOrElse(k, 0) + 1)
        // scalar/IN/EXISTS subquery plans hang off expressions, not
        // children — without this a decorrelation regression that moves
        // work into a subquery would be invisible
        n.subqueries.foreach(walk)
      }
    walk(plan)
    SortedMap.empty[String, Int] ++ counts
  }

  /** One deterministic golden line: `<name> exchanges=<n> wscg=<n>
    * <Kind>=<n> ...` with kinds sorted. Text lines keep the golden file
    * git-diffable and need no JSON parser on the compare side.
    */
  def line(name: String, df: DataFrame): String = {
    val ops = of(df)
    val exchanges = ops.collect { case (k, n) if k.contains("Exchange") => n }.sum
    val wscg = ops.getOrElse("WholeStageCodegenExec", 0)
    val kinds = ops.map { case (k, n) => s"$k=$n" }.mkString(" ")
    s"$name exchanges=$exchanges wscg=$wscg $kinds"
  }
}
