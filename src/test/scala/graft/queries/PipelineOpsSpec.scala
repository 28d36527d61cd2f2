package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics of the training-data hygiene ops: repetition quality,
  * train↔test decontamination, PII scrub. The DuckDB oracles replay the
  * same formulas engine-to-engine; these tests pin the semantics against
  * hand-computed values and crafted inputs (including the PII cases the
  * synthetic corpus doesn't contain).
  */
class PipelineOpsSpec extends SparkSuite {

  test("q_sample_weighted: equals a local A-ES recompute; keys strictly ordered") {
    val rows = LlmOps.qSampleWeighted(spark, sf001).collect()
    assert(rows.length == 20)
    // independent local recompute of every doc's A-ES key
    val docs = graft.Tables
      .documents(spark, sf001)
      .select("doc_id", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x")
        .mkString
    val want = docs
      .map { case (id, w) =>
        val h = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 10), 16) + 1L
        val lnq = BigDecimal(math.log(h.toDouble) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong
        (id, w, (27725887L - lnq).toDouble / w)
      }
      .sortBy { case (id, _, k) => (k, id) }
      .take(20)
      .toSeq
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    val keys = got.map(_._3)
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b })
    assert(keys.forall(_ >= 0.0)) // h <= 2^40 so the capped ln never goes negative
  }

  test("repetition metrics match a hand computation of one document") {
    import spark.implicits._
    val doc0 = graft.Tables
      .documents(spark, sf001)
      .where($"doc_id" === 0)
      .select("text")
      .head()
      .getString(0)
    val toks = doc0.split(" ").filter(_.nonEmpty)
    val counts = toks.groupBy(identity).map(_._2.length)
    val row = LlmOps
      .qTextRepetition(spark, sf001)
      .where($"doc_id" === 0)
      .head()
    assert(row.getLong(1) == toks.length.toLong)
    assert(row.getLong(2) == counts.size.toLong)
    assert(row.getDouble(3) == counts.max.toDouble / toks.length)
    assert(row.getDouble(4) == 1.0 - counts.size.toDouble / toks.length)
    val rep = row.getDouble(3) > 0.125 || row.getDouble(4) > 0.3
    assert(row.getBoolean(5) == rep)
  }

  test("contamination counts distinct shared shingles against the eval set") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b c d"), // shingles: "a b c", "b c d"
      (2L, "x y z w"), // no overlap
      (3L, "p q") //      < 3 tokens: zero shingles
    ).toDF("doc_id", "text")
    val eval_ = Seq((10L, "b c d e")).toDF("doc_id", "text") // "b c d", "c d e"
    val got = LlmOps
      .contamination(train, eval_)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3))))
    assert(got(0) == ((1L, 2L, 1L, Some(0.5))))
    assert(got(1) == ((2L, 2L, 0L, Some(0.0))))
    assert(got(2) == ((3L, 0L, 0L, None))) // 0/0 -> null, not a crash
  }

  test("decontaminate emits exactly the train split, self-consistent") {
    import spark.implicits._
    val out = LlmOps.qDecontaminate(spark, sf001).collect()
    val trainIds = graft.Tables
      .documents(spark, sf001)
      .where(pmod(($"doc_id" % 2147483648L) * 40503L, lit(100L)) < 80)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    assert(out.map(_.getLong(0)).toSet == trainIds)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_shared > n_shingles in $r")
    }
  }

  test("PII scrub redacts emails and phones, counts match") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jo.doe+x@ex-ample.org or 555-123-4567 today"),
      (2L, "two mails a@b.io c@d.co one phone 111.222.3333"),
      (3L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val got = df
      .select(
        $"doc_id",
        regexp_count($"text", lit(LlmOps.EmailRe)).as("e"),
        regexp_count($"text", lit(LlmOps.PhoneRe)).as("p"),
        LlmOps.scrubPii($"text").as("clean"))
      .orderBy("doc_id")
      .collect()
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 1)
    assert(got(0).getString(3) == "contact me at <EMAIL> or <PHONE> today")
    assert(got(1).getInt(1) == 2 && got(1).getInt(2) == 1)
    assert(got(2).getInt(1) == 0 && got(2).getInt(2) == 0)
    assert(got(2).getString(3) == "clean text with no pii at all")
  }

  test("observe(): pipeline metrics ride the job instead of a second pass") {
    // the production pattern for ingest counters: Observation attaches
    // named aggregates to the SAME action (no extra scan, no accumulator
    // double-count on retries); here the cleaning pipeline reports its
    // own gate statistics
    import org.apache.spark.sql.Observation
    val obs = Observation("clean_metrics")
    val docs = graft.Tables.documents(spark, sf001)
    val prof = graft.functions.TextProfile.profile(col("text"))
    val gated = docs
      .select(col("doc_id"), prof.getField("n_tokens").as("n_toks"))
      .observe(
        obs,
        count(lit(1)).as("n_docs"),
        sum(when(col("n_toks") < 5, 1).otherwise(0)).as("n_too_short"))
      .where(col("n_toks") >= 5)
    val kept = gated.count()
    val m = obs.get
    assert(m("n_docs").asInstanceOf[Long] == docs.count())
    assert(m("n_docs").asInstanceOf[Long] - m("n_too_short").asInstanceOf[Long] == kept)
  }
}
