package graft

import graft.operators.DedupClusters
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** DedupClusters (connected components via min-label propagation) pinned
  * against a plain Scala union-find on generated edge lists — chains
  * (forcing multiple propagation rounds), stars, cliques, and random
  * sparse graphs.
  */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val expected = unionFind(edges)
    val got = DedupClusters
      .clusters(edges.toDF("d1", "d2"), "d1", "d2")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expected, s"edges $edges")
  }

  test("chains, stars, cliques, and singleton edges") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) // chain: several rounds
    check(Seq((10L, 11L), (10L, 12L), (10L, 13L))) // star
    check(Seq((20L, 21L), (20L, 22L), (21L, 22L))) // clique
    check(Seq((30L, 31L), (40L, 41L), (50L, 50L))) // disjoint + self-loop
    check(Seq((9L, 1L), (8L, 9L), (7L, 8L))) // min label enters last
  }

  test("random sparse graphs match union-find") {
    val edgeGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))
    (51L to 53L).foreach { seed =>
      check(edgeGen.pureApply(Gen.Parameters.default, Seed(seed)))
    }
  }

  test("path doubling: same components as plain propagation, fewer rounds") {
    // chains are the worst case for plain propagation (rounds = diameter)
    // and the best case for pointer jumping (rounds ~ log2 diameter)
    val chains = Seq(
      (1L until 16L).map(i => (i, i + 1)),
      (9L to 1L by -1).map(i => (i + 1, i)), // min label enters last
      Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L)))
    chains.foreach { edges =>
      val expected = unionFind(edges)
      val got = DedupClusters
        .clusters(edges.toDF("d1", "d2"), "d1", "d2", pathDoubling = true)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"edges $edges")
    }
    // a 16-node path (diameter 15) must converge within ~log2 rounds when
    // doubling — maxIters = 6 would fail plain propagation
    val path = (1L until 16L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      DedupClusters.clusters(path, "d1", "d2", maxIters = 6).collect()
    }
    val doubled = DedupClusters
      .clusters(path, "d1", "d2", maxIters = 6, pathDoubling = true)
      .collect()
    assert(doubled.forall(_.getLong(1) == 1L))
  }

  test("derived budget: a diameter past the 20-round base converges instead of aborting") {
    // 30-node path, diameter 29 > base 20, plain propagation: the
    // default (derived) budget extends once to |V| + 1 and converges
    // where the old fixed 20-round default threw (r14 ask #1)
    val path = (1L to 29L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = DedupClusters.clusters(path, "d1", "d2").collect()
    assert(labels.length == 30 && labels.forall(_.getLong(1) == 1L))
    // an EXPLICIT maxIters stays a final contract and still throws
    intercept[IllegalStateException] {
      DedupClusters.clusters(path, "d1", "d2", maxIters = 20).collect()
    }
  }

  test("strict mode throws when a component's diameter exceeds maxIters") {
    // a path graph 1-2-3-...-8 needs ~log2(diameter) doubling rounds to
    // fully propagate label 1 to vertex 8; maxIters = 1 cannot converge
    val path = (1L until 8L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      DedupClusters.clusters(path, "d1", "d2", maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // strict = false keeps the old warn-and-return-partial behavior: the
    // partial labels still cover every vertex, just possibly split
    val partial =
      DedupClusters.clusters(path, "d1", "d2", maxIters = 1, strict = false).collect()
    assert(partial.map(_.getLong(0)).toSet == (1L to 8L).toSet)
  }

  test("reliable checkpointing runs the loop and matches union-find") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    // without a checkpoint dir the operator must fail up front, not
    // rounds later inside Spark's RDD machinery
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    intercept[IllegalStateException] {
      DedupClusters.clusters(edges.toDF("d1", "d2"), "d1", "d2", reliableCheckpoint = true)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      spark.sparkContext.setCheckpointDir(dir)
      val got = DedupClusters
        .clusters(edges.toDF("d1", "d2"), "d1", "d2", reliableCheckpoint = true)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == unionFind(edges))
    } finally {
      // un-setting isn't exposed; leave the dir configured but delete the
      // files so repeated local runs don't accumulate checkpoint blocks
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("round join plans exchange-free: edge list pre-partitioned on the join key (r12)") {
    // observes the loop's OWN per-round msgs plan via the roundProbe test
    // seam (round-12 ADVICE: the first pin reconstructed the sym/labels
    // frames and could drift from the real loop): in pathDoubling mode
    // the per-round edges ⋈ labels join must plan with NO exchange on
    // either side — sym is checkpointed repartition(a), labels come off
    // their checkpoint hash-partitioned by id (the id → a rename
    // alias-propagates), and Dataset.localCheckpoint preserves
    // outputPartitioning through LogicalRDD. If this breaks, every
    // propagation round silently re-shuffles the 2|E| edge list.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // one 512-cycle (diameter 256): long-path enough that pathDoubling
      // is the configuration under test, small enough for fast rounds
      val edges = (0L until 512L).map(i => (i, (i + 1) % 512)).toDF("a", "b")
      var rounds = 0
      val labels = DedupClusters.clusters(
        edges,
        "a",
        "b",
        maxIters = 40,
        pathDoubling = true,
        roundProbe = { (_, msgs) =>
          rounds += 1
          val exchanges =
            msgs.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }
          assert(exchanges.isEmpty, msgs.queryExecution.executedPlan.toString)
        })
      assert(rounds >= 2, s"probe must see every round, saw $rounds")
      // and the loop still computes the right components (one cycle)
      assert(labels.select(countDistinct(col("label"))).head().getLong(0) == 1L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("summarize emits representative, size, and sorted members") {
    val df = DedupClusters
      .summarize(Seq((3L, 1L), (1L, 2L), (10L, 11L)).toDF("d1", "d2"), "d1", "d2")
    // members is a scalar STRING (comma-joined, sorted), not ARRAY — the
    // shape any downstream comparator can hash (see summarize scaladoc)
    assert(df.schema("members").dataType == org.apache.spark.sql.types.StringType)
    val rows = df.collect()
    assert(rows.length == 2)
    val first = rows(0)
    assert(first.getLong(0) == 1L && first.getLong(1) == 3L)
    assert(first.getString(2) == "1,2,3")
    val second = rows(1)
    assert(second.getLong(0) == 10L && second.getLong(1) == 2L)
    assert(second.getString(2) == "10,11")
  }

  /** Drain the async listener bus BEFORE registering a counting listener
    * (r15 ADVICE): events from earlier tests' actions are posted to a
    * FIFO bus, so a straggler still queued at register() time would be
    * dispatched to the new listener and inflate an exact-count assert.
    * A sentinel action with a recognizable literal is run under a
    * throwaway listener; once the sentinel's own event arrives, every
    * event queued before it has been dispatched.
    */
  private def drainListenerBus(): Unit = {
    val sentinelLo = 918273645L
    val seen = new java.util.concurrent.CountDownLatch(1)
    val marker = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.analyzed.toString.contains(sentinelLo.toString)) seen.countDown()
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(marker)
    try {
      spark.range(sentinelLo, sentinelLo + 1).toDF().count(): Unit
      assert(
        seen.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "listener bus failed to deliver the drain sentinel within 30 s")
    } finally spark.listenerManager.unregister(marker)
  }

  test("one driver action per propagation round (r13 fused convergence pin)") {
    // regression pin for the r13 lazy-checkpoint + fused-count round: a
    // reintroduced eager-checkpoint-plus-probe round would double the
    // per-round Dataset actions and trip the budget below
    val byName = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { byName.merge(funcName, 1, _ + _); () }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // path graph 1-…-8: diameter 7 → enough rounds that a 2×-per-round
    // regression clearly separates from the constant setup cost
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("a", "b")
    var rounds = 0
    drainListenerBus()
    spark.listenerManager.register(listener)
    val labels =
      try DedupClusters
        .clusters(pairs, "a", "b", roundProbe = (i, _) => rounds = i + 1)
        .collect()
      finally spark.listenerManager.unregister(listener)
    assert(labels.forall(_.getLong(1) == 1L)) // one component, min label
    assert(rounds >= 5, s"fixture too shallow: $rounds rounds")
    // listener delivery is async: poll until the tallies stabilize,
    // BOUNDED so a delivery anomaly fails the test instead of hanging
    // the suite (r13 ADVICE #2)
    var last = -1
    var stable = 0
    var polls = 0
    while (stable < 5 && polls < 150) {
      Thread.sleep(100)
      polls += 1
      val now = byName.values().stream().mapToInt(_.intValue()).sum()
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    assert(stable >= 5, s"listener tallies never stabilized within ${polls * 100} ms: $byName")
    // the round's ONE materializing job is the fused `count`; the lazy
    // checkpoint marks also emit (job-less) listener events under their
    // own funcName and are deliberately not budgeted here
    assert(
      byName.getOrDefault("count", 0) == rounds,
      s"$byName over $rounds rounds — expected exactly one count job per round")
    // the retired per-round probe shapes must not reappear
    assert(!byName.containsKey("isEmpty") && !byName.containsKey("take"), byName.toString)
  }

  test("forced budget extension: fires once, pays exactly one extra action, same labels (r15)") {
    // r14 ask #8's in-JVM half: lower the BASE budget so the lazy
    // extension must fire on a graph that needs more rounds — the result
    // must equal the default-budget run and the total driver actions must
    // be exactly rounds + 1 (the one |V| count the extension pays)
    val byName = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { byName.merge(funcName, 1, _ + _); () }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("a", "b")
    var rounds = 0
    drainListenerBus()
    spark.listenerManager.register(listener)
    val got =
      try DedupClusters
        .clusters(pairs, "a", "b", baseRounds = 2, roundProbe = (i, _) => rounds = i + 1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sorted
        .toSeq
      finally spark.listenerManager.unregister(listener)
    // the default-budget reference run happens AFTER unregistering: the
    // listener bus is async, so a run issued just before register() could
    // leak its own count events into the tally (r15 self-review)
    val want = DedupClusters
      .clusters(pairs, "a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
      .toSeq
    assert(got == want, "forced-extension labels differ from the default-budget run")
    assert(rounds > 2, s"extension never needed: converged in $rounds rounds at base 2")
    var last = -1
    var stable = 0
    var polls = 0
    while (stable < 5 && polls < 150) {
      Thread.sleep(100)
      polls += 1
      val now = byName.values().stream().mapToInt(_.intValue()).sum()
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    assert(stable >= 5, s"listener tallies never stabilized within ${polls * 100} ms: $byName")
    // rounds fused counts + EXACTLY ONE extension count (the |V| bound)
    assert(
      byName.getOrDefault("count", 0) == rounds + 1,
      s"$byName over $rounds rounds — expected rounds + 1 count jobs (one extension)")
  }
}
