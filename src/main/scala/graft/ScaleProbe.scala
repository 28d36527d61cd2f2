package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe (round-6 verdict ask #3): inflate the sf0.1
  * fixtures N× into a scratch directory — a union of re-keyed copies,
  * computed engine-side; the read-only fixtures are never touched — and
  * time the most expensive benched queries against the inflated data,
  * next to a same-JVM baseline run at 1×. The artifact (SCALEPROBE.json)
  * records both, so nonlinear movement is visible as
  * `scaled_sec / (base_sec · factor)` ≫ 1 (values well BELOW 1 are
  * expected: at sf0.1 most queries underutilize 32 cores, so added rows
  * first fill idle parallelism).
  *
  * Re-keying: per copy i, fact-table primary/fact-join keys shift by
  * i·10⁹ (orderkey pairs stay joined, users stay coherent, doc/vec ids
  * stay unique); dimension tables and dimension FOREIGN keys are left
  * alone — at 100 TB facts grow and dims don't, so each dim row fans out
  * to factor× facts, which is exactly the density/skew stress the plans
  * must survive (co-purchase edge support multiplies, dedup text groups
  * carry factor× identical members, per-customer order counts multiply).
  *
  * Usage: ScaleProbe <srcSfDir> <workDir> <factor> [query...]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALEPROBE_OUT (JSON out path).
  */
object ScaleProbe {

  private val Off = 1000000000L

  /** Fact keys to shift per copy; tables absent from this map (dims) are
    * copied once, unshifted.
    */
  private val factKeys: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey"),
    "orders" -> Seq("o_orderkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val dims = Seq("customer", "supplier", "part", "nation", "region")

  /** The probe set: the bench's most expensive plans plus the families
    * the round-6 verdict names as prime suspects for nonlinear movement
    * (iterative dedup-cluster checkpointing, graph wedge joins under
    * densified co-purchase support, shingle/MinHash shuffles over a
    * factor×-duplicated corpus, sessionization over factor× users).
    */
  private val DefaultQueries = Seq(
    "q_dedup_clusters",
    // r8: the probe measures the CAPPED production path — the uncapped
    // entry stays in the registry as the oracle anchor, but its in×in
    // wedge arm is Σ in-deg² by construction and the ×20 duplication
    // probe densifies co-purchase degrees far past useful (123.7 s /
    // ratio 2.40 measured in r7, the probe's only superlinear row).
    // q_graph_common_neighbors_capped is the same trichotomy with hub
    // centers (deg > 32) pruned pre-shuffle; pristine answers identical
    // (SearchOpsSpec pin).
    "q_graph_common_neighbors_capped",
    "q_graph_triangles",
    "q_market_basket",
    "q_embed_pca",
    "q_dedup_near",
    "q_dedup_near_capped",
    "q_dedup_ngram_capped",
    "q_dedup_exact",
    "q_events_sessionize",
    "q_tpch_q5",
    "q_tpch_q18",
    "q_text_tfidf",
    // r7 continuation: the new token-stream-heavy curation tier — BPE's
    // word-count agg + vocab-frame rounds, DSIR's two-pass scoring, the
    // ppl-bucket global ntile, and the upsampling explode all see
    // factor× token streams (documents are re-keyed copies, so the word
    // frequency table keeps its SIZE while counts multiply — the
    // model-table-stays-small regime these ops claim)
    "q_bpe_merges",
    "q_curation_dsir",
    "q_text_ppl_buckets",
    "q_mix_epochs",
    // r8 (verdict ask #6): the ANN BUILD tier gets a timing signal —
    // these two are bench=false (driver-coordinated Lloyd/codebook
    // iterations make min-of-2 JIT-noisy for the band gate), but index
    // construction cost at 1× vs ×N is exactly what a 100 TB embedding
    // corpus needs measured: the model state is bounded (K=16 centroids,
    // 8×16 codewords), so build time should scale with the assignment
    // scans, i.e. sublinearly here.
    "q_sim_ann_ivf",
    "q_sim_ann_pq")

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def inflate(spark: SparkSession, srcDir: String, workDir: String, factor: Int): Unit = {
    val marker = new java.io.File(workDir, s"_INFLATED_x$factor")
    if (marker.exists()) {
      System.err.println(s"[scaleprobe] reusing inflated data at $workDir (x$factor)")
      return
    }
    val wd = new java.io.File(workDir)
    if (wd.exists()) org.apache.commons.io.FileUtils.deleteDirectory(wd)
    wd.mkdirs()
    (factKeys.keys.toSeq.sorted ++ dims).foreach { t =>
      val raw = spark.read.parquet(s"$srcDir/$t.parquet")
      val keys = factKeys.getOrElse(t, Nil)
      val out =
        if (keys.isEmpty) raw
        else
          (0 until factor)
            .map { i =>
              keys.foldLeft(raw) { (d, k) =>
                d.withColumn(k, (col(k) + lit(i * Off)).cast(raw.schema(k).dataType))
              }
            }
            .reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$workDir/$t.parquet")
      System.err.println(s"[scaleprobe] inflated $t" + (if (keys.isEmpty) " (dim, 1x)" else s" x$factor"))
    }
    marker.createNewFile(): Unit
  }

  /** min-of-2 noop-sink wall time, the Bench measurement discipline. */
  private def time(q: (SparkSession, String) => DataFrame, spark: SparkSession, dir: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, workDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val queries = if (args.length > 3) args.drop(3).toSeq else DefaultQueries
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // infrastructure warmup (codegen compiler, parquet reader, noop sink)
    spark.range(0, 1000000, 1, 8).selectExpr("sum(id * 2) as s")
      .write.format("noop").mode("overwrite").save()
    inflate(spark, srcDir, workDir, factor)
    val reg = Registry.all.toMap
    var base = Vector.empty[(String, Double)]
    var scaled = Vector.empty[(String, Double)]
    var failed = Vector.empty[String]
    queries.foreach { name =>
      val q = reg(name).fn
      try {
        val b = time(q, spark, srcDir)
        val s = time(q, spark, workDir)
        System.err.println(
          f"[scaleprobe] $name base $b%.2f s, x$factor $s%.2f s, " +
            f"ratio-vs-linear ${s / (b * factor)}%.2f")
        base :+= (name -> b)
        scaled :+= (name -> s)
      } catch {
        case e: Throwable =>
          System.err.println(s"[scaleprobe] $name FAILED: ${e.getMessage}")
          failed :+= name
      }
    }
    def obj(xs: Vector[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val json =
      s"""{"factor":$factor,"src":"$srcDir","cpus":$cpus,"base_sec":${obj(base)},""" +
        s""""scaled_sec":${obj(scaled)},"failed":${failed
            .map("\"" + _ + "\"")
            .mkString("[", ",", "]")}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_SCALEPROBE_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"): Unit
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
