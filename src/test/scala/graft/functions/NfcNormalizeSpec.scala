package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** NFC kernel + the q_text_normalize audit columns on CRAFTED damage —
  * the fixtures are clean (all-NFC, no control bytes), so the oracle
  * certifies the zero/identity readings and this spec pins the non-zero
  * behavior: canonical composition, mojibake signatures, control and
  * replacement counting, and the already-NFC fast path. Damage bytes are
  * written as \\uXXXX escapes so the source file itself stays clean text.
  */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  // the audit projection of LlmOps.qTextNormalize, applied to a crafted frame
  private def audit(rows: Seq[(Long, String)]) = {
    def nfc = NfcNormalize.of(col("text"))
    rows
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        length(col("text")).as("n_cp_raw"),
        length(nfc).as("n_cp_nfc"),
        (length(col("text")) - length(nfc)).as("nfc_delta"),
        (nfc === col("text")).as("is_nfc"),
        regexp_count(col("text"), lit("[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]"))
          .as("n_ctrl"),
        regexp_count(col("text"), lit("\\x{FFFD}")).as("n_repl"),
        regexp_count(col("text"), lit("\\x{C3}[\\x{80}-\\x{BF}]")).as("n_mojibake"))
      .orderBy("doc_id")
      .collect()
  }

  test("decomposed accents compose: e+U+0301 -> \\u00e9, length shrinks, is_nfc false") {
    val decomposed = "café" // 5 codepoints, NFC = café (4)
    val got = audit(Seq((1L, decomposed))).head
    assert(got.getInt(1) == 5) // n_cp_raw
    assert(got.getInt(2) == 4) // n_cp_nfc
    assert(got.getInt(3) == 1) // nfc_delta
    assert(!got.getBoolean(4)) // is_nfc
    // and the kernel's value is the composed form
    val v = Seq(decomposed).toDF("text").select(NfcNormalize.of(col("text"))).head.getString(0)
    assert(v == "café")
  }

  test("already-NFC text is identity (fast path) and counters read zero") {
    val got = audit(
      Seq((1L, "plain ascii text"), (2L, "komponiert: café über 中文"))).toSeq
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2) && r.getInt(3) == 0 && r.getBoolean(4), r)
      assert(r.getInt(5) == 0 && r.getInt(6) == 0 && r.getInt(7) == 0, r)
    }
  }

  test("mojibake signatures count: UTF-8-as-Latin-1 patterns") {
    // é (bytes C3 A9) read as Latin-1 shows as U+00C3 U+00A9 — the signature
    val moji = "cafÃ© and naÃ¯ve" // 2 signatures
    val got = audit(Seq((1L, moji))).head
    assert(got.getInt(7) == 2, got)
    // bare Ã before a non-continuation codepoint is NOT a signature
    val bare = audit(Seq((1L, "Ã alone, ÃZ too"))).head
    assert(bare.getInt(7) == 0, bare)
  }

  test("control and replacement chars count; tab/newline/CR are NOT control damage") {
    // NUL, BEL, DEL + two U+FFFD, built programmatically (no raw control
    // bytes in source); \t \n \r present but excluded from the class
    val s = "a\tb\nc\rd" + Seq(0, 7, 127).map(_.toChar).mkString + "\ufffd middle \ufffd"
    val got = audit(Seq((1L, s))).head
    assert(got.getInt(5) == 3, got) // NUL, BEL, DEL — not \t \n \r
    assert(got.getInt(6) == 2, got) // two U+FFFD
  }

  test("null text stays null through the kernel") {
    val r = Seq((1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(NfcNormalize.of(col("text")))
      .head
    assert(r.isNullAt(0))
  }

  test("kernel matches java.text.Normalizer on varied inputs (interpreted + codegen)") {
    val inputs = Seq(
      "",
      "á̧ stacked combiners",
      "ḍ̇ dot above then below", // reorders + composes under NFC
      "ﬁ ligature stays (NFC is not NFKC)",
      "Hangul jamo: 각") // composes to U+AC01
    val got = inputs.toDF("text").select(NfcNormalize.of(col("text"))).collect().map(_.getString(0))
    val want = inputs.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    assert(want(4) == "Hangul jamo: 각")
  }
}
