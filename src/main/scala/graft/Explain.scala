package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one registry query (or `entry`) with timing and an
  * optional formatted plan dump.
  *
  *   sbt "runMain graft.Explain <name|entry> [sfDir] [--plan] [--final] [--count]"
  *
  * `--plan` prints the pre-execution formatted plan (NO codegen
  * markers under AQE); `--final` executes and prints the
  * isFinalPlan=true tree with real WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("entry")
    val sfDir = args.drop(1).headOption.filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      // extension tier ON, matching Verify/Bench: explained plans are
      // the production plans
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Time CONSTRUCTION + execution, like Bench/ScaleProbe do: queries
    // with eager checkpoints or driver-coordinated rounds (graph edge
    // lists, BPE training) do their dominant work while the DataFrame is
    // being BUILT — timing only the final action would report a 4-row
    // local relation as ~0 s and mislead a band-gate investigation.
    def build() =
      if (name == "entry") SparkEntry.entry(spark)
      else SparkEntry.queries(name)(spark, sfDir)
    // build df0 only when --plan asked for it: construction is the
    // dominant cost for eager-checkpoint / driver-coordinated queries,
    // so an unconditional extra build roughly doubled tool wall time
    if (args.contains("--plan")) build().explain("formatted")
    // --final: EXECUTED plan (AQE isFinalPlan=true) — the only view that
    // shows real WholeStageCodegen spans; the pre-execution formatted
    // plan of an adaptive query carries no codegen markers at all
    if (args.contains("--final")) {
      // execute THIS plan instance (a .write would plan a fresh command
      // and leave this AdaptiveSparkPlan unexecuted/isFinalPlan=false)
      val plan = build().queryExecution.executedPlan
      plan.execute().count()
      println(plan.toString)
    }
    // --jobs: per-action accounting for the iterative entries (r16
    // verdict ask #2 — "count jobs per round" before cutting driver
    // actions). Prints one line per Spark job with wall ms and stage
    // count, then a summary; runs on the SECOND (warm) execution so
    // per-job times aren't polluted by first-run JIT.
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val jobStages = new java.util.concurrent.atomic.AtomicInteger
    if (args.contains("--jobs")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t = Option(starts.get(je.jobId)).map(s => (System.nanoTime() - s) / 1000000L)
          jobLog.put(je.jobId, (t.getOrElse(-1L), 0))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          jobStages.incrementAndGet(); ()
        }
      })
    }
    val t0 = System.nanoTime()
    if (args.contains("--count")) println(s"ROWS=${build().count()}")
    else build().write.format("noop").mode("overwrite").save()
    println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    jobLog.clear(); jobStages.set(0)
    val t1 = System.nanoTime()
    build().write.format("noop").mode("overwrite").save()
    println(f"TIME2 $name ${(System.nanoTime() - t1) / 1e9}%.2f s (warm)")
    // --reps=N: N more warm builds+runs, report each and the min — the
    // low-variance A/B protocol for sub-second plan deltas (single cold
    // runs swing ±25% on UNCHANGED entries in this sandbox)
    args.collectFirst { case a if a.startsWith("--reps=") => a.drop(7).toInt }.foreach { n =>
      val times = (1 to n).map { _ =>
        val t = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      println(
        f"REPS $name min ${times.min}%.3f s of ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    if (args.contains("--jobs")) {
      Thread.sleep(300) // drain the async listener bus
      import scala.jdk.CollectionConverters._
      val jobs = jobLog.asScala.toSeq.sortBy(_._1)
      jobs.foreach { case (id, (ms, _)) => println(s"JOB $id ${ms} ms") }
      println(s"JOBS $name n=${jobs.size} stages=${jobStages.get} " +
        s"sum_ms=${jobs.map(_._2._1).sum}")
    }
    spark.stop()
  }
}
