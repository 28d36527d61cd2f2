package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving sketch contract: exactness when capacity ≥ vocabulary,
  * the overestimate guarantee under eviction, and merge correctness
  * across arbitrary partition splits.
  */
class SpaceSavingSpec extends AnyFunSuite {

  private def run(ss: SpaceSaving, tokens: Seq[String], splits: Int): Array[SSEntry] = {
    val parts = tokens.grouped(math.max(1, tokens.length / splits)).toSeq
    val bufs = parts.map(p => p.foldLeft(ss.zero)(ss.reduce))
    ss.finish(bufs.reduce(ss.merge))
  }

  private def exact(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }

  test("capacity >= vocabulary: exact counts, zero error, any split") {
    val tokens = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++ Seq("d")
    val truth = exact(tokens)
    for (splits <- Seq(1, 3, 8)) {
      val got = run(new SpaceSaving(16), scala.util.Random.shuffle(tokens), splits)
      assert(got.map(e => e.tok -> e.est).toMap == truth)
      assert(got.forall(_.err == 0))
    }
  }

  test("under eviction: every estimate overestimates, est - err lower-bounds") {
    val rnd = new scala.util.Random(7)
    val tokens = (1 to 2000).map { _ =>
      // skewed stream: few heavy tokens + long tail
      if (rnd.nextInt(100) < 60) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(200)}"
    }
    val truth = exact(tokens)
    for (splits <- Seq(1, 4)) {
      val got = run(new SpaceSaving(4), tokens, splits)
      assert(got.length <= 4)
      got.foreach { e =>
        val t = truth.getOrElse(e.tok, 0L)
        assert(e.est >= t, s"${e.tok}: est ${e.est} < true $t")
        assert(e.est - e.err <= t, s"${e.tok}: lower bound ${e.est - e.err} > true $t")
      }
      // the heaviest token must be tracked (its count dwarfs the tail)
      val heaviest = truth.maxBy { case (t, c) => (c, t) }._1
      assert(got.exists(_.tok == heaviest))
    }
  }
}
