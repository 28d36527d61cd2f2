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
    val t0 = System.nanoTime()
    if (args.contains("--count")) println(s"ROWS=${build().count()}")
    else build().write.format("noop").mode("overwrite").save()
    println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    build().write.format("noop").mode("overwrite").save()
    println(f"TIME2 $name ${(System.nanoTime() - t1) / 1e9}%.2f s (warm)")
    spark.stop()
  }
}
