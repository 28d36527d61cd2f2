package graft

import graft.plans.PlanFingerprint
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide plan-shape golden gate (r15 VERDICT ask #7).
  *
  * PLANGOLD.txt commits one normalized static-plan fingerprint line per
  * registry entry (operator-kind counts + exchange count + codegen span
  * count, AQE off, extensions on — see [[PlanFingerprint]]). This spec
  * regenerates every fingerprint and fails on ANY drift, naming the
  * entry and the exact kind deltas: plan pins exist for only ~dozens of
  * entries, and the SortAggregate-demotion class (the M4 struct-key
  * cliff, the feature-hashing argmax) showed a silent plan regression
  * can cost 10× while every correctness gate stays green.
  *
  * Intentional plan changes: regenerate with
  * `GRAFT_PLANGOLD_UPDATE=1 sbt "testOnly graft.PlanGoldSpec"` and
  * review the PLANGOLD.txt diff like code — an unexplained extra
  * exchange or a lost codegen span in the diff IS the regression this
  * gate exists to catch.
  *
  * Runs on the extensions-enabled session so fingerprints are the
  * production plans (HofToKernelRule / WindowTopKRule / GroupTopK
  * rewrites included), over sf0.001 so eager-construction entries
  * (checkpointed loops, stream-backed entries) stay cheap.
  */
class PlanGoldSpec extends AnyFunSuite {
  private lazy val spark = ExtSession.spark
  private val goldPath = java.nio.file.Paths.get("PLANGOLD.txt")
  private val sfDir = "/root/testdata/sf0.001"

  test("registry-wide static plan fingerprints match the committed golden (r16)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val got: Seq[(String, String)] =
      try
        Registry.all.sortBy(_._1).map { case (name, q) =>
          val l =
            try PlanFingerprint.line(name, q.fn(spark, sfDir))
            catch {
              case e: Throwable =>
                fail(s"$name: fingerprint construction failed: ${e.getMessage}", e)
            }
          name -> l
        }
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    if (sys.env.get("GRAFT_PLANGOLD_UPDATE").contains("1")) {
      val header =
        "# Registry plan-shape golden (PlanGoldSpec, r16). One line per entry:\n" +
          "# <name> exchanges=<n> wscg=<n> <NodeClass>=<count>...\n" +
          "# Static plans: AQE off, GraftExtensions on, sf0.001. Regenerate with\n" +
          "# GRAFT_PLANGOLD_UPDATE=1 sbt \"testOnly graft.PlanGoldSpec\" and review the diff.\n"
      java.nio.file.Files.writeString(
        goldPath,
        header + got.map(_._2).mkString("", "\n", "\n"))
      info(s"PLANGOLD.txt regenerated with ${got.size} entries — review the git diff")
    } else {
      assert(
        java.nio.file.Files.exists(goldPath),
        "PLANGOLD.txt missing — regenerate with GRAFT_PLANGOLD_UPDATE=1")
      val want: Map[String, String] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files
          .readAllLines(goldPath)
          .asScala
          .filterNot(l => l.startsWith("#") || l.isEmpty)
          .map(l => l.takeWhile(_ != ' ') -> l)
          .toMap
      }
      val gotMap = got.toMap
      val missing = gotMap.keySet -- want.keySet
      val dangling = want.keySet -- gotMap.keySet
      assert(
        missing.isEmpty && dangling.isEmpty,
        s"golden out of sync with the registry — entries without a golden line: " +
          s"${missing.toSeq.sorted.mkString(", ")}; golden lines without an entry: " +
          s"${dangling.toSeq.sorted.mkString(", ")} (regenerate with GRAFT_PLANGOLD_UPDATE=1)")
      val drifted = got.collect { case (name, l) if want(name) != l => (name, want(name), l) }
      assert(
        drifted.isEmpty,
        drifted
          .map { case (name, w, g) =>
            // show only the kind deltas, not two full lines
            def kinds(s: String): Map[String, String] =
              s.split(' ').drop(1).map(_.split('=')).collect { case Array(k, v) => k -> v }.toMap
            val (kw, kg) = (kinds(w), kinds(g))
            val delta = (kw.keySet ++ kg.keySet).toSeq.sorted.flatMap { k =>
              val (a, b) = (kw.getOrElse(k, "0"), kg.getOrElse(k, "0"))
              if (a == b) None else Some(s"$k $a->$b")
            }
            s"$name: ${delta.mkString(", ")}"
          }
          .mkString(
            s"${drifted.size} entries drifted from PLANGOLD.txt (golden->current):\n  ",
            "\n  ",
            "\n(intentional? regenerate with GRAFT_PLANGOLD_UPDATE=1 and review the diff)"))
    }
  }
}
