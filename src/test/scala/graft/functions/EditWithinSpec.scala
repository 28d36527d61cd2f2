package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** EditWithin (banded thresholded levenshtein) pinned against a plain
  * full-matrix reference on generated strings, including threshold
  * boundary cases.
  */
class EditWithinSpec extends AnyFunSuite {

  private def full(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) =
        if (a(i - 1) == b(j - 1)) d(i - 1)(j - 1)
        else 1 + math.min(d(i - 1)(j - 1), math.min(d(i - 1)(j), d(i)(j - 1)))
    d(a.length)(b.length)
  }

  private def expected(a: String, b: String): Int = {
    val d = full(a, b)
    if (d <= math.max(a.length, b.length) / 5) d else -1
  }

  private def kernel(a: String, b: String): Int =
    EditWithin.dist(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand cases: identical, 20% boundary, just beyond, empty") {
    assert(kernel("abcdefghij", "abcdefghij") == 0)
    // 10 chars: threshold 2
    assert(kernel("abcdefghij", "abcdefghiX") == 1)
    assert(kernel("abcdefghij", "abcdefghXY") == 2)
    assert(kernel("abcdefghij", "abcdefgXYZ") == -1)
    assert(kernel("", "") == 0)
    assert(kernel("abcd", "") == -1) // distance 4 > 4/5
    assert(kernel("short", "a completely different long string") == -1)
  }

  test("generated strings match the full-matrix reference with threshold") {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val gen = for {
      n <- Gen.choose(0, 40)
      m <- Gen.choose(0, 40)
      a <- Gen.listOfN(n, alpha)
      b <- Gen.listOfN(m, alpha)
    } yield (a.mkString, b.mkString)
    (1L to 400L).foreach { seed =>
      val (a, b) = gen.pureApply(Gen.Parameters.default, Seed(seed))
      assert(kernel(a, b) == expected(a, b), s"a='$a' b='$b'")
    }
  }

  test("near-identical long strings stay exact through the band") {
    val base = ("the quick brown fox jumps over the lazy dog " * 10).trim
    val mutated = base.updated(17, 'Z').updated(101, 'Q') + " tail"
    assert(kernel(base, base) == 0)
    assert(kernel(base, mutated) == full(base, mutated))
  }
}
