package graft.queries

import graft.SparkSuite
import graft.functions.TokenWindows
import org.apache.spark.sql.functions._

/** Exact-substring dedup semantics (`q_dedup_substring`): the TokenWindows
  * kernel, duplicated-window flagging (cross-doc AND within-doc), and the
  * per-document interval union of flagged windows.
  */
class SubstringDedupSpec extends SparkSuite {

  test("TokenWindows emits every k-window in order, single-spaced, with dups") {
    import spark.implicits._
    val got = Seq("a  b c d c d a b c d")
      .toDF("text")
      .select(TokenWindows.of($"text", 3).as("w"))
      .head()
      .getSeq[String](0)
    // tokens: a b c d c d a b c d (multi-space collapses, empties dropped)
    assert(got == Seq(
      "a b c", "b c d", "c d c", "d c d", "c d a", "d a b", "a b c", "b c d"))
  }

  test("TokenWindows: fewer than k tokens yields an empty array") {
    import spark.implicits._
    val got = Seq("one two", "", "   ")
      .toDF("text")
      .select(size(TokenWindows.of($"text", 3)).as("n"))
      .collect()
      .map(_.getInt(0))
    assert(got.toSeq == Seq(0, 0, 0))
  }

  test("cross-document duplicated span is found and interval-merged") {
    import spark.implicits._
    // docs 1 and 2 share the 5-token run "v w x y z"; with k=3 the shared
    // windows in doc 1 are positions 2,3,4 -> one island covering tokens
    // 2..6 = 5 tokens. Doc 3 is unique -> absent from the output.
    val docs = Seq(
      (1L, "a b v w x y z c"),
      (2L, "q r s v w x y z"),
      (3L, "totally different words with no repeats at all")
    ).toDF("doc_id", "text")
    val got = LlmOps
      .substringSpans(docs, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 5L, 8L), (2L, 1L, 5L, 8L)))
  }

  test("within-document repetition counts as duplicated text") {
    import spark.implicits._
    // "a b c" occurs twice inside the single doc (positions 0 and 4);
    // islands: [0,2] and [4,6] -> 2 spans, 6 tokens covered.
    val docs = Seq((7L, "a b c z a b c")).toDF("doc_id", "text")
    val got = LlmOps
      .substringSpans(docs, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((7L, 2L, 6L, 7L)))
  }

  test("overlapping and adjacent flagged windows merge into maximal spans") {
    import spark.implicits._
    // doc 1 and doc 2 are identical -> every window duplicated -> one
    // island spanning the whole doc.
    val docs = Seq(
      (1L, "t u v w x y"),
      (2L, "t u v w x y")
    ).toDF("doc_id", "text")
    val got = LlmOps
      .substringSpans(docs, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }
}
