package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Native as-of join (AsOfJoinPlan/Exec) pinned against the union-window
  * formulation and crafted edges: no-match-yet rows, inclusive ties,
  * keys with no right side, and partitioning invariance.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("crafted edges: before-first, inclusive tie, missing key, updates") {
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any right row -> null
      (2L, 10L, ts("2024-01-01 10:00:00")), // after r1 -> r1
      (3L, 10L, ts("2024-01-02 09:00:00")), // inclusive tie with r2 -> r2
      (4L, 10L, ts("2024-03-01 00:00:00")), // long after -> latest r2
      (5L, 20L, ts("2024-01-05 00:00:00"))) // key with no right rows -> null
      .toDF("event_id", "k", "t")
    val rights = Seq(
      (10L, ts("2024-01-01 06:00:00")),
      (10L, ts("2024-01-02 09:00:00")),
      (30L, ts("2024-01-01 00:00:00"))) // key never asked for
      .toDF("rk", "rt")
    for (parts <- Seq(1, 4)) {
      val got = AsOfJoin
        .asof(lefts.repartition(parts), "k", "t", rights.repartition(parts), "rk", "rt", "m")
        .orderBy("event_id")
        .collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(3)))
      assert(got.toSeq == Seq(
        1L -> None,
        2L -> Some(ts("2024-01-01 06:00:00")),
        3L -> Some(ts("2024-01-02 09:00:00")),
        4L -> Some(ts("2024-01-02 09:00:00")),
        5L -> None))
    }
  }

  test("native as-of equals the union-window formulation on real tables") {
    // the window form coerces the matched column to TIMESTAMP (union type
    // widening); the native operator preserves the source's NTZ type —
    // align before the row-for-row compare
    val native = graft.queries.Relational
      .qJoinAsofNative(spark, sf001)
      .withColumn("last_order_date", col("last_order_date").cast("timestamp"))
      .collect()
    val window = graft.queries.Relational.qJoinAsof(spark, sf001).collect()
    assert(native.length == window.length && native.length > 0)
    assert(native.toSeq == window.toSeq)
  }

  test("planner places AsOfJoin with EnsureRequirements-owned exchanges and sorts") {
    val df = graft.queries.Relational.qJoinAsofNative(spark, sf001)
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // nodeName = class name minus Exec
    assert(!p.contains("!AsOfJoin"), s"missing-input marker in plan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Sort "), p)
  }

  test("property: random frames match a driver-side reference, across partitionings (r11)") {
    // 5 seeded random (key, time) worlds x 2 partitionings, checked
    // against an independent Scala reference (per left row: the max
    // right time <= t within its key) — covers dense ties, keys missing
    // on either side, and rows before any right row, at shapes the
    // crafted fixtures don't enumerate
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(8)
      val nLeft = 50 + rnd.nextInt(300)
      val nRight = 20 + rnd.nextInt(200)
      // coarse time grid (0..40) forces frequent exact ties
      val lefts = (0 until nLeft).map { i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong, ts(f"2024-01-01 00:${rnd.nextInt(41)}%02d:00"))
      }
      val rights = (0 until nRight).map { _ =>
        (rnd.nextInt(nKeys).toLong, ts(f"2024-01-01 00:${rnd.nextInt(41)}%02d:00"))
      }
      val expected = lefts.map { case (id, k, t) =>
        id -> rights.collect { case (rk, rt) if rk == k && !rt.after(t) => rt }.sorted.lastOption
      }.toMap
      val lDf = lefts.toDF("event_id", "k", "t")
      val rDf = rights.toDF("rk", "rt")
      for (parts <- Seq(3, 8)) {
        val got = AsOfJoin
          .asof(lDf.repartition(parts), "k", "t", rDf.repartition(parts), "rk", "rt", "m")
          .collect()
          .map(r => r.getLong(0) -> Option(r.getTimestamp(3)))
          .toMap
        assert(got.size == nLeft, s"trial $trial parts=$parts: row count")
        expected.foreach { case (id, want) =>
          assert(got(id) == want, s"trial $trial parts=$parts left row $id")
        }
      }
    }
  }

  test("string keys survive UnsafeRow buffer reuse on the right side") {
    // varying-width columns shift each deserialized row's string offsets;
    // the retained right-side key must be a deep copy or it mutates as
    // the merge advances (same hazard class as GroupTopKExec)
    val lefts = spark
      .range(300)
      .select(
        col("id").as("event_id"),
        concat(lit("k"), (col("id") % 7).cast("string")).as("k"),
        (col("id") * 1000).as("t"))
    val rights = spark
      .range(50)
      .select(
        concat(lit("pad"), repeat(lit("y"), (col("id") % 13).cast("int"))).as("payload"),
        concat(lit("k"), (col("id") % 7).cast("string")).as("rk"),
        (col("id") * 5000).as("rt"))
    val got = AsOfJoin
      .asof(lefts, "k", "t", rights, "rk", "rt", "m")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // oracle: per left row, max rt <= t within the same key (computed
    // naively on the driver)
    val rm = (0L until 50L).map(i => (s"k${i % 7}", i * 5000))
    val want = (0L until 300L).map { i =>
      val key = s"k${i % 7}"
      val t = i * 1000
      val m = rm.filter(p => p._1 == key && p._2 <= t).map(_._2).reduceOption(_ max _)
      (i, m)
    }
    assert(got.toSeq == want)
  }
}
