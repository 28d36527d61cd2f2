package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected candidate-pair edge list —
  * the step that turns near-dup PAIRS into actionable dedup GROUPS
  * (keep one representative per component, drop the rest).
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with
  * itself; each iteration every vertex takes the min of its own and its
  * neighbors' labels; fixpoint = components labeled by their minimum
  * vertex id. Pure DataFrame ops — per iteration one join (edge ⋈ label)
  * and one min-aggregate, both key-equality shuffles; iterations are
  * bounded by the component diameter (near-dup clusters are dense, so
  * typically 2-3). `localCheckpoint` truncates the lineage each round —
  * without it the plan doubles per iteration and the driver dies at
  * scale long before the executors do.
  *
  * The convergence check (`changed == 0`) costs one count per iteration;
  * that is the standard price of any iterative fixpoint on Spark and is
  * O(vertices) distributed work, not a driver-side collect.
  */
object DedupClusters {

  def clusters(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    // undirected: propagate both ways
    val sym = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym
      .select(col("a").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val msgs = sym
        .join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("label"))
      val next = labels
        .union(msgs)
        .groupBy("id")
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = labels
        .withColumnRenamed("label", "old")
        .join(next, "id")
        .where(col("old") =!= col("label"))
        .count()
      labels = next
      i += 1
    }
    labels
  }

  /** Component summary: (cluster representative = min member id, size,
    * members sorted) — the shape a dedup job consumes (keep `cluster`,
    * drop the other members).
    */
  def summarize(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    clusters(pairs, aCol, bCol)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_members"), sort_array(collect_list(col("id"))).as("members"))
      .orderBy("cluster")
}
