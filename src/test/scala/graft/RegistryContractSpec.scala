package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry ↔ SURVEY contract gate (round-8 verdict ask #6).
  *
  * `Registry.all` IS the driver contract: every entry lands in
  * `SparkEntry.queries` and therefore in the correctness AND bench
  * surface. SURVEY.md §2.2 is the engine's contract-of-record the next
  * fresh-context round reads. Round 8 shipped seven registry entries with
  * no §2.2 row (two of them also with no spec) — functionally correct,
  * but invisible to the record and unverified by the builder. This spec
  * makes that structurally impossible: an entry may be registered only if
  * it has a §2.2 row, or is explicitly declared work-in-progress in
  * [[newThisRound]] below (a loud, reviewable list — not a silent
  * widening).
  */
class RegistryContractSpec extends AnyFunSuite {

  /** Entries allowed to exist in the registry WITHOUT a SURVEY §2.2 row
    * yet — the explicit in-flight allowlist. MUST be emptied (rows
    * written) before a round's end-of-round snapshot; leaving a name here
    * across rounds is the smell this gate exists to surface.
    */
  private val newThisRound: Set[String] = Set.empty

  private lazy val section22: Vector[String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md")("UTF-8").getLines().toVector
    val start = lines.indexWhere(_.startsWith("### 2.2"))
    assert(start >= 0, "SURVEY.md lost its '### 2.2' heading")
    lines.drop(start + 1).takeWhile(l => !l.startsWith("## ")) // to next top-level section
  }

  /** Every backticked query name mentioned anywhere in §2.2 — the early
    * battery entries are documented in grouped bullets / combined rows
    * (`q_join_inner`, ... in one line), not one row each.
    */
  private lazy val surveyNames: Set[String] = {
    val mention = """`([a-z0-9_]+)`""".r
    section22.flatMap(l => mention.findAllMatchIn(l).map(_.group(1))).toSet
  }

  /** Names that LEAD a §2.2 table row — the strict per-entry rows used
    * for the reverse (staleness) check.
    */
  private lazy val surveyRowNames: Set[String] = {
    val row = """^\|\s*`([a-z0-9_]+)`\s*\|""".r
    section22.flatMap(l => row.findFirstMatchIn(l).map(_.group(1))).toSet
  }

  test("every registry entry has a SURVEY §2.2 row (or a declared in-flight entry)") {
    val registered = Registry.all.map(_._1).toSet
    val orphans = registered -- surveyNames -- newThisRound
    assert(
      orphans.isEmpty,
      s"registry entries with no SURVEY §2.2 row and no newThisRound declaration: " +
        s"${orphans.toSeq.sorted.mkString(", ")} — write the row (or declare in-flight)")
  }

  test("no stale in-flight declarations: newThisRound names must be real and row-less") {
    val registered = Registry.all.map(_._1).toSet
    val ghosts = newThisRound -- registered
    assert(ghosts.isEmpty, s"newThisRound names not in the registry: $ghosts")
    val done = newThisRound intersect surveyNames
    assert(done.isEmpty, s"newThisRound names that already have rows (remove them): $done")
  }

  test("no dangling SURVEY §2.2 rows for unregistered queries") {
    // only enforce for names that LOOK like registry entries (q_/s_/tile_
    // prefixes); prose tables elsewhere in 2.2 are out of scope
    val registered = Registry.all.map(_._1).toSet
    val queryLike = surveyRowNames.filter(n =>
      n.startsWith("q_") || n.startsWith("s_stream") || n.startsWith("tile_"))
    val stale = queryLike -- registered
    assert(
      stale.isEmpty,
      s"SURVEY §2.2 rows naming queries the registry does not have: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }
}
