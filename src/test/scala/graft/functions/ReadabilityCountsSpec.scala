package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ReadabilityCounts]] ≡ the marker-substitution formulation it replaced
  * (r16): word count = `size(filter(split(text, ' '), t -> t <> ''))`,
  * vowel-run count = markers left by
  * `regexp_replace(lower(text), "[aeiou]+", MARK)`, sentence-run count =
  * markers left by `regexp_replace(text, "[.!?]+", MARK)`. The entry's
  * DuckDB oracle pins the fixture corpus; this spec pins the crafted
  * edges the fixtures don't exercise (empty/blank docs, run boundaries at
  * string ends, uppercase vowels through the lowering, non-ASCII).
  */
class ReadabilityCountsSpec extends SparkSuite {
  import spark.implicits._

  private val mark = "\u0001"

  private def both(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val vm = regexp_replace(lower(col("text")), "[aeiou]+", mark)
    val sm = regexp_replace(col("text"), "[.!?]+", mark)
    val legacy = df
      .select(
        col("id"),
        size(filter(split(col("text"), " "), x => x =!= lit(""))).as("w"),
        (length(vm) - length(translate(vm, mark, ""))).as("syl"),
        (length(sm) - length(translate(sm, mark, ""))).as("s"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val kernel = df
      .select(col("id"), ReadabilityCounts.of(col("text")).as("r"))
      .select(col("id"), col("r.n_words"), col("r.n_vowel_runs"), col("r.n_sent_runs"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    (legacy.toSeq, kernel.toSeq)
  }

  test("kernel counts equal the regexp_replace formulation on crafted edges") {
    val texts = Seq(
      "",
      " ",
      "   ",
      "a",
      "aeiou",
      "xyz",
      "Hello world. How are you?! Fine... really",
      "AEIOU SHOUTING VOWELS",
      "ends with vowel runs aa",
      "ee starts and ends ii",
      ".!?.!?",
      "no marks at all",
      "  double  spaces   everywhere  ",
      "tab\tis not a separator here",
      "unicode: café über 中文 naïve",
      "q.e.d. x!y?z",
      "aa bb aa bb aa")
    val (legacy, kernel) = both(texts)
    assert(kernel == legacy)
  }

  test("readability entry columns: kernel form equals legacy per-doc columns on a corpus slice") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(200)
    val vm = regexp_replace(lower(col("text")), "[aeiou]+", mark)
    val sm = regexp_replace(col("text"), "[.!?]+", mark)
    val legacy = docs
      .select(
        col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= lit(""))).cast("double").as("w"),
        (length(vm) - length(translate(vm, mark, ""))).cast("double").as("syl"),
        greatest(lit(1), length(sm) - length(translate(sm, mark, ""))).cast("double").as("s"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    val r = ReadabilityCounts.of(col("text"))
    val kernel = docs
      .select(col("doc_id"), r.as("r"))
      .select(
        col("doc_id"),
        col("r.n_words").cast("double").as("w"),
        col("r.n_vowel_runs").cast("double").as("syl"),
        greatest(lit(1), col("r.n_sent_runs")).cast("double").as("s"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    assert(kernel == legacy)
  }
}
