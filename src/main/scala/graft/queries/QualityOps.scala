package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation and operational-quality operators (SURVEY.md §2.2
  * additions, round 4 continuation):
  *
  *   - `q_text_gopher` — the Gopher-style quality-rule battery (Rae et
  *     al. 2021 shape): per-document word-count bounds, mean-word-length
  *     bounds, stopword floor, type-token-ratio floor, and the composite
  *     verdict. Complements `q_text_quality` (raw ratios) with the
  *     rule/verdict form real filter pipelines ship; rides the same
  *     single [[graft.functions.TextProfile]] codegen pass.
  *   - `q_mix_temperature` — temperature-based sampling weights over the
  *     language distribution (`q ∝ p^α`, α = 0.7): the multilingual-
  *     corpus rebalancing formula (upsample tails, damp the head).
  *     Complements `q_mix_sources` (explicit target weights) with the
  *     derived-weights form.
  *   - `q_dq_ks` — exact two-sample Kolmogorov–Smirnov statistic between
  *     two event-type value distributions, on a 1e-3 value grid. The
  *     cross-multiplied integer form (`max |c1·n2 − c2·n1|`) makes the
  *     sup-distance EXACT (no float accumulation at all); sqrt — the one
  *     libm call in the significance threshold — is IEEE
  *     correctly-rounded, so both engines agree bit-for-bit.
  *   - `q_layout_compaction` — the OPTIMIZE planner's grouping step:
  *     per table partition, size-sorted next-fit binning of small files
  *     into compaction groups targeting a size budget. Pure integer
  *     arithmetic.
  *
  * Scale shapes: gopher is one kernel pass, no shuffle until the
  * (optional) downstream filter; temperature is two 1-row broadcast
  * aggs over a |langs|-row table; KS is a per-bucket partial agg whose
  * ordered scan is bounded by the CLAMPED grid (hard ≤ 2e6 + 1 cells),
  * not the data;
  * compaction windows are partitioned per table-partition (file counts
  * per partition are bounded in any sane layout).
  */
object QualityOps {

  // -------------------------------------------------------- gopher rules

  /** Rule battery over the kernel profile. Mean word length uses the
    * single-space invariant (chars-of-words = len − (n_tok − 1)), which
    * `SourcesSpec` pins for this corpus; nullif guards keep empty docs
    * NULL rather than crashing, same contract as `q_text_quality`.
    */
  def qTextGopher(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = col("p.n_tokens")
    val meanWlen =
      (col("p.len") - (nTok - lit(1))).cast("double") / nullif(nTok, lit(0))
    val ttr = col("p.n_distinct").cast("double") / nullif(nTok, lit(0))
    LlmOps
      .profiled(spark, sfDir)
      .select(
        col("doc_id"),
        nTok.as("n_tok"),
        round(meanWlen, 6).as("mean_wlen"),
        col("p.n_stop").as("n_stop"),
        round(ttr, 6).as("ttr"),
        (nTok >= 50 && nTok <= 100000).as("pass_len"),
        (meanWlen >= 3.0 && meanWlen <= 10.0).as("pass_wlen"),
        (col("p.n_stop") >= 2).as("pass_stop"),
        (ttr >= 0.2).as("pass_ttr"))
      .withColumn(
        "gopher_pass",
        col("pass_len") && col("pass_wlen") && col("pass_stop") && col("pass_ttr"))
      .orderBy("doc_id")
  }

  /** Per-language readability profile (Flesch–Kincaid grade shape) —
    * the curation signal BESIDE the Gopher rule battery: word/sentence
    * length and a syllable proxy say "how hard is this text to read",
    * which mix designers use to tier corpora (children's text vs
    * academic prose) where Gopher only says "is it junk".
    *
    * The syllable proxy is the classic vowel-group count (maximal
    * `[aeiou]+` runs per word — the standard cheap estimator); sentences
    * are `[.!?]+` runs floored at 1 so mark-free docs (this fixture's
    * word soup — the degenerate-but-correct case) read as one sentence.
    * Both counts use the marker-substitution idiom (global
    * regexp_replace to a U+0001 marker, then a length difference) —
    * exact integers, no regex-count builtin needed, and the marker
    * cannot occur in text.
    *
    * Exactness: per-doc ratios and the FK chain
    * `0.39·(w/s) + 11.8·(syl/w) − 15.59` are fixed IEEE sequences on
    * exact integers (literals parse to identical doubles in both
    * engines); per-language means go through `dsum`'s DECIMAL(18,6)
    * quantization so partial-agg order cannot perturb them; min/max are
    * exact. Scale shape: one stateless regex+split pass at the scan,
    * one partial-aggregating shuffle to the |langs| frame. The regexes
    * are anchored character classes — linear scans, no backtracking.
    */
  def qTextReadability(spark: SparkSession, sfDir: String): DataFrame = {
    // r16: the marker-substitution idiom (two regexp_replace copies + two
    // translate copies + four length scans per document) moved into the
    // one-pass [[graft.functions.ReadabilityCounts]] codegen kernel --
    // identical counts (word = space-split non-empty; vowel/sentence runs
    // = maximal-run counts, vowels over the same Locale.ROOT lowering
    // Spark's `lower` performs), and the oracle still replays the
    // regexp_replace formulation, so the hash match proves equivalence.
    val r = graft.functions.ReadabilityCounts.of(col("text"))
    val perDoc = Tables
      .documents(spark, sfDir)
      .select(col("lang"), r.as("r"))
      .select(
        col("lang"),
        col("r.n_words").cast("double").as("w"),
        col("r.n_vowel_runs").cast("double").as("syl"),
        greatest(lit(1), col("r.n_sent_runs")).cast("double").as("s"))
      .where(col("w") > 0)
    val wps = col("w") / col("s")
    val spw = col("syl") / col("w")
    val fk = lit(0.39) * wps + lit(11.8) * spw - lit(15.59)
    perDoc
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        Tables.dsum(wps).as("sw"),
        Tables.dsum(spw).as("ss"),
        Tables.dsum(fk).as("sf"),
        min(fk).as("min_fk"),
        max(fk).as("max_fk"))
      .select(
        col("lang"),
        col("n_docs"),
        (col("sw") / col("n_docs")).as("avg_wps"),
        (col("ss") / col("n_docs")).as("avg_spw"),
        (col("sf") / col("n_docs")).as("avg_fk"),
        col("min_fk"),
        col("max_fk"))
      .orderBy("lang")
  }

  /** Per-source curation scorecard: the dashboard a dataset owner reads
    * before deciding which sources to keep, reweight, or drop — doc
    * counts, Gopher-rule pass rates, repetition-flag rates, and mean
    * token entropy. The repetition and entropy signals use the SAME
    * per-(doc, token) counts, so both are computed from ONE shared token
    * aggregation (naive composition of `q_text_repetition` +
    * `q_text_entropy` would shuffle the token stream twice — at 100 TB
    * that second shuffle is the whole cost); the formulas are verbatim
    * those queries' (same 1e-6 ln quantization), which the shared-CTE
    * oracle mirrors. Gopher flags ride the one TextProfile kernel scan.
    * Per-doc entropies are 1e-6-quantized, so the per-source mean is an
    * exact fixed-point sum.
    */
  def qCurationScorecard(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir).select("doc_id", "source")
    val gop = qTextGopher(spark, sfDir).select("doc_id", "gopher_pass")
    val lnMicro = round(log(col("n")) * 1e6, 0).cast("long")
    val hN = round(log(col("n_tokens")) * 1e6, 0).cast("long").cast("double")
    val topFrac = col("top_tok_n").cast("double") / col("n_tokens")
    val dupFrac = lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")
    val sig = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(
        max(col("n")).as("top_tok_n"),
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * lnMicro).as("s_micro"))
      .select(
        col("doc_id"),
        (topFrac > 0.125 || dupFrac > 0.3).as("repetitive"),
        round((hN - col("s_micro").cast("double") / col("n_tokens").cast("double")) / 1e6, 6)
          .as("entropy"))
    src
      .join(gop, "doc_id")
      .join(sig, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_gopher_pass"),
        sum(when(col("repetitive"), 1L).otherwise(0L)).as("n_repetitive"),
        sum(round(col("entropy") * 1e6).cast("long")).as("ent_fp"))
      .select(
        col("source"),
        col("n_docs"),
        col("n_gopher_pass"),
        col("n_repetitive"),
        round(col("n_gopher_pass").cast("double") / col("n_docs"), 6).as("gopher_rate"),
        round(col("ent_fp").cast("double") / 1e6 / col("n_docs"), 6).as("avg_entropy"))
      .orderBy("source")
  }

  // ------------------------------------------------ temperature sampling

  /** `q_l ∝ p_l^0.7`. The powered weights are quantized to 1e-6
    * fixed-point LONGs before normalization (`pow` is the one
    * not-correctly-rounded libm call here — same portability grain as
    * the ln-quantization precedent), so the normalizing sum is exact
    * integer arithmetic and partition-order-proof.
    */
  def qMixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables
      .documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("n"))
    val weighted = counts
      .crossJoin(broadcast(tot))
      .withColumn("p", col("n_docs").cast("double") / col("n"))
      .withColumn("q_fp", round(pow(col("p"), 0.7) * lit(1e6)).cast("long"))
    val z = weighted.agg(sum("q_fp").as("z"))
    weighted
      .crossJoin(broadcast(z))
      .select(
        col("lang"),
        col("n_docs"),
        round(col("p"), 6).as("p"),
        round(col("q_fp").cast("double") / col("z"), 6).as("q_share"),
        round(col("q_fp").cast("double") / col("z") / col("p"), 6).as("boost"))
      .orderBy("lang")
  }

  // --------------------------------------------------------- KS test

  /** D = sup |F₁ − F₂| between 'click' and 'purchase' value ECDFs on the
    * 1e-3 grid (|values| ≥ 1000 clamp into terminal cells), via integer
    * cross-multiplication; significance at α = 0.05 (c(α) = 1.358). The
    * cumulative scan is a window over GRID-bounded bucket rows — the
    * clamp makes the cell count a hard ≤ 2e6 + 1 regardless of the data's
    * value range or row count, which is what makes the single ordered
    * pass safe at any corpus size.
    */
  /** Benford first-digit drift report (r8) — the classic fraud/anomaly
    * screen for naturally-occurring amounts: observed first-significant-
    * digit shares of `o_totalprice` against Benford's law
    * `P(d) = log10(1 + 1/d)`, as exact ppm integers.
    *
    * Engine-exact by construction: prices quantize to integer CENTS
    * (the house HALF_UP micro pattern), the first digit comes from the
    * INTEGER's decimal string (`substring(cast(n AS string), 1, 1)` —
    * integer→string is identical across engines, no log10 on data), the
    * Benford expectations are nine spec CONSTANTS (`round(log10(1+1/d)
    * ·1e6)`, precomputed — no runtime transcendental at all), and every
    * emitted column is an exact integer. Digits absent from the data
    * still report (LEFT join from the 9-row constant frame).
    *
    * Scale shape: one scan → 9-group partial agg; the constant frame
    * and 1-row total broadcast. Nothing else moves.
    */
  def qDqBenford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val benford = Seq(
      (1, 301030L), (2, 176091L), (3, 124939L), (4, 96910L), (5, 79181L),
      (6, 66947L), (7, 57992L), (8, 51153L), (9, 45757L))
      .toDF("digit", "benford_ppm")
    // checkpoint the ≤9-row count table (§4 rule): it feeds both the
    // join and the grand total, and an uncheckpointed subtree would
    // re-scan orders once per reference
    val counts = Tables
      .orders(spark, sfDir)
      .select(
        substring(round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
          .cast("int")
          .as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint()
    val total = counts.agg(sum("n_obs").as("total"))
    benford
      .join(broadcast(counts), Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(
        col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        round(coalesce(col("n_obs"), lit(0L)) * lit(1e6) / col("total"), 0)
          .cast("long")
          .as("share_ppm"),
        col("benford_ppm"),
        (round(coalesce(col("n_obs"), lit(0L)) * lit(1e6) / col("total"), 0).cast("long") -
          col("benford_ppm")).as("delta_ppm"))
      .orderBy("digit")
  }

  def qDqKs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables
      .events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(
        (col("event_type") === "click").as("is1"),
        // the grid cap is what makes the ordered scan data-independent:
        // raw floor(value*1000) grows with the value RANGE (which grows
        // with sf), so each tail clamps into a terminal cell at ±1e6 —
        // KS stays exact for |values| < 1000 and the cell count is a
        // hard 2e6 + 1 bound at any corpus size
        // two-sided: the lower clamp mirrors the oracle's so values
        // < -1000 bucket into the same terminal cell in both engines
        greatest(least(floor(col("value") * lit(1000)), lit(1000000L)), lit(-1000000L))
          .cast("long")
          .as("bucket"))
    val byBucket = ev
      .groupBy("bucket")
      .agg(
        sum(when(col("is1"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("is1"), 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byBucket
      .withColumn("f1", sum("c1").over(w))
      .withColumn("f2", sum("c2").over(w))
    val tot = byBucket.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    // exact while n1·n2 < 2^63 (≈3e9 rows per side); past that the sup
    // distance would move to the double form with an explicit error bar
    cum
      .crossJoin(broadcast(tot))
      .agg(
        max("n1").as("n1"),
        max("n2").as("n2"),
        count(lit(1)).as("n_buckets"),
        max(abs(col("f1") * col("n2") - col("f2") * col("n1"))).as("d_num"))
      .select(
        col("n1"),
        col("n2"),
        col("n_buckets"),
        round(col("d_num").cast("double") / (col("n1") * col("n2")), 6).as("d"),
        (col("d_num").cast("double") / (col("n1") * col("n2")) >
          lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") / (col("n1") * col("n2"))))
          .as("significant"))
  }

  // ------------------------------------------- epoch-aware mix materialization

  /** Materializes the `q_mix_temperature` decision as per-document epoch
    * copies — the missing step between computing mixing weights and
    * actually training on them. Each language's boost (target share /
    * raw share, ppm fixed point, derived by the exact `q_mix_temperature`
    * arithmetic) becomes per-doc copy counts: `boost div 1e6` whole
    * epochs for every doc plus one more for the deterministic
    * md5-selected `boost mod 1e6` ppm fraction — so tails upsample to
    * fractional epochs (the LLaMA/DoReMi repeat-factor recipe) and the
    * damped head downsamples by the same rule (floor 0 + fractional
    * keep). Output is the per-language rollup OF the materialized frame
    * (docs kept, total copies, effective epochs) so the explode itself is
    * exercised and certified.
    *
    * Scale shape: the weight model is two ≤|langs|-row broadcast aggs;
    * materialization is one broadcast-hash join + a per-row
    * `explode(sequence)` — map-side, shuffle-free, linear in OUTPUT size
    * (the only honest cost of upsampling); the rollup is a |langs|-row
    * partial agg. The md5-hex60 fraction is the house split-by-document
    * determinism trick: stable under any partitioning, replayed
    * bit-for-bit by the oracle.
    */
  def qMixEpochs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    // materialize the |langs|-row count table ONCE: boost is referenced
    // from the materialization join AND the final rollup join, and its
    // lineage reaches the corpus scan from ~9 plan positions without
    // this (the §4 plan-subtree-reuse rule) — checkpointed, the whole
    // query reads the corpus exactly twice (model pass + explode pass)
    val counts =
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs")).localCheckpoint()
    val tot = counts.agg(sum("n_docs").as("n"))
    val weighted = counts
      .crossJoin(broadcast(tot))
      .withColumn("p", col("n_docs").cast("double") / col("n"))
      .withColumn("q_fp", round(pow(col("p"), 0.7) * lit(1e6)).cast("long"))
    val z = weighted.agg(sum("q_fp").as("z"))
    val boost = weighted
      .crossJoin(broadcast(z))
      .select(
        col("lang"),
        col("n_docs"),
        round(col("q_fp").cast("double") / col("z") / col("p") * 1e6)
          .cast("long")
          .as("boost_ppm"))
    val mat = docs
      .join(broadcast(boost), "lang")
      .withColumn(
        "u_ppm",
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long") % 1000000L)
      .withColumn(
        "copies",
        expr("boost_ppm div 1000000") +
          when(col("u_ppm") < col("boost_ppm") % 1000000L, 1L).otherwise(0L))
      .where(col("copies") > 0)
      .select(col("lang"), col("doc_id"), explode(sequence(lit(1L), col("copies"))).as("epoch"))
    // LEFT join from boost: a fully-damped language (every doc's md5
    // fraction at or above its sub-1-epoch boost) must still appear in
    // the report with zero kept docs — vanishing silently is the one
    // outcome a mix readout must not have
    boost
      .join(
        mat
          .groupBy("lang")
          .agg(countDistinct("doc_id").as("kept"), count(lit(1)).as("copies")),
        Seq("lang"),
        "left")
      .select(
        col("lang"),
        col("n_docs"),
        col("boost_ppm"),
        coalesce(col("kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("copies"), lit(0L)).as("n_copies"),
        round(coalesce(col("copies"), lit(0L)).cast("double") / col("n_docs"), 6)
          .as("eff_epochs"))
      .orderBy("lang")
  }

  // ------------------------------------------------- DSIR data selection

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" shape): per-document
    * importance weight = mean hashed-unigram log-likelihood ratio between
    * a target domain (here `lang = 'en'` — the declarative stand-in for
    * "looks like my downstream corpus") and the raw corpus, with add-1
    * smoothing over B = 64 hash buckets. The published method resamples
    * by `exp(weight)`; the engine emits the top-20 ranked docs — the
    * deterministic head a curation pipeline thresholds on.
    *
    * Parity and scale shape:
    *   - bucket = first 15 md5 hex chars (60 bits, exactly long-safe on
    *     both engines) mod B — the house md5 trick, so DuckDB replays
    *     the feature hash bit-for-bit;
    *   - per-bucket LLR is 1e-6 fixed-point BEFORE the per-doc sum, so
    *     the doc aggregation is an order-independent LONG sum (the one
    *     float op per bucket happens once in a 64-row frame);
    *   - the LLR model is a ≤64-row broadcast — scoring is one exploded
    *     scan + broadcast-hash-join + per-doc partial agg; the only
    *     wide exchange carries (doc_id, long) pairs. Two passes over
    *     the token stream (train the model, score with it) is the
    *     canonical two-phase shape — at 100 TB each pass is map-side
    *     until its respective tiny aggregation.
    */
  def qCurationDsir(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 64
    val toks = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn(
        "bucket",
        conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long") % B)
    // ONE model pass (r16, guide §2.4): raw counts, target counts and both
    // totals fold out of a single ≤B-row bucket aggregation (c_t as a
    // conditional count ≡ the old left-join + zero-fill; the totals are
    // sums OF the bucket counts, not a third corpus pass). The old shape
    // re-derived the tokenize+md5 explode from THREE model subtrees plus
    // the scoring join — four corpus passes where the documented two-phase
    // contract needs exactly two. Checkpointed: ≤64 rows feeding the
    // totals agg and the LLR projection.
    val model = toks
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("c_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
      .localCheckpoint()
    val tots = model.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    val llr = model
      .crossJoin(broadcast(tots))
      .select(
        col("bucket"),
        round(
          (log((col("c_t") + 1).cast("double") / (col("n_t") + lit(B)).cast("double")) -
            log((col("c_r") + 1).cast("double") / (col("n_r") + lit(B)).cast("double"))) * 1e6,
          0).cast("long").as("llr_fp"))
    toks
      .join(broadcast(llr), "bucket")
      .groupBy("doc_id", "source", "lang")
      .agg(count(lit(1)).as("n_tok"), sum(col("llr_fp")).as("s_fp"))
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        col("n_tok"),
        round(col("s_fp").cast("double") / col("n_tok") / 1e6, 6).as("avg_llr"))
      .orderBy(col("avg_llr").desc, col("doc_id"))
      .limit(20)
  }

  // ----------------------------------------------------- compaction plan

  /** Small-file compaction groups: files (here: 16 content-hash buckets
    * per source, sized by their text bytes) are sorted size-descending
    * within their partition and binned next-fit against a 4 KiB target.
    * Output is the per-group manifest a compactor would execute. Integer
    * division only — `div`, not `/` (Spark's `/` on longs is DOUBLE
    * division; the oracle's `//` truncates).
    */
  def qLayoutCompaction(spark: SparkSession, sfDir: String): DataFrame = {
    val target = 4096L
    val files = Tables
      .documents(spark, sfDir)
      .groupBy(col("source"), pmod(col("doc_id"), lit(16)).as("file_id"))
      .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
    val w = Window
      .partitionBy("source")
      .orderBy(col("bytes").desc, col("file_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $target"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("tot_bytes"))
      .orderBy("source", "bin")
  }

  // ------------------------------------------------- robust outliers (MAD)

  /** Median-absolute-deviation outlier audit per nation over customer
    * balances — the ROBUST member of the dq family (z-scores
    * (`q_events_anomaly`) break when the outliers themselves inflate the
    * stddev; median/MAD don't). Per nation: lower median of the cent
    * balances, MAD = lower median of |x − med|, and the count of rows
    * beyond 3·MAD.
    *
    * Exactness: balances become cents (exact LONGs), and both medians
    * are POSITION picks (row_number = ⌊(n+1)/2⌋ over the sorted values —
    * the lower median, deterministic under ties because equal values
    * occupy the tied positions). No float enters until the final /100
    * displays dollars. The oracle replays the identical picks.
    *
    * Scale shape: three hash shuffles on the group key; the per-group
    * sorts are nation-bounded here. At unbounded group sizes the
    * position pick generalizes to two-pass selection or a KLL sketch —
    * the audit REPORT shape (per-group median/MAD/outlier-count) is
    * what this entry pins.
    */
  def qDqOutlierMad(spark: SparkSession, sfDir: String): DataFrame = {
    val cts = Tables
      .customer(spark, sfDir)
      .select(
        col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val wp = Window.partitionBy("c_nationkey")
    val wv = Window.partitionBy("c_nationkey").orderBy(col("bal_c").asc)
    val med = cts
      .select(
        col("c_nationkey"),
        col("bal_c"),
        row_number().over(wv).as("rn"),
        count(lit(1)).over(wp).as("n"))
      .where(col("rn") === floor((col("n") + 1) / 2))
      .select(col("c_nationkey"), col("bal_c").as("med_c"), col("n"))
    val dev = cts
      .join(med, "c_nationkey")
      .select(
        col("c_nationkey"),
        col("n"),
        col("med_c"),
        abs(col("bal_c") - col("med_c")).as("ad"))
    val wa = Window.partitionBy("c_nationkey").orderBy(col("ad").asc)
    val mad = dev
      .withColumn("rn", row_number().over(wa))
      .where(col("rn") === floor((col("n") + 1) / 2))
      .select(col("c_nationkey"), col("ad").as("mad_c"))
    dev
      .join(mad, "c_nationkey")
      .groupBy("c_nationkey")
      .agg(
        max(col("n")).as("n"),
        max(col("med_c")).as("med_c"),
        max(col("mad_c")).as("mad_c"),
        sum(when(col("ad") > lit(3) * col("mad_c"), 1L).otherwise(0L)).as("n_outliers"))
      .select(
        col("c_nationkey"),
        col("n"),
        (col("med_c").cast("double") / 100).as("median_bal"),
        (col("mad_c").cast("double") / 100).as("mad"),
        col("n_outliers"))
      .orderBy("c_nationkey")
  }

  // ------------------------------------------------------------- registry

  private val DOCS_T = LlmOps.DOCS_T

  /** Mutual information between two categorical columns (market segment
    * × customer nation) — the "are these dimensions independent?"
    * readout a feature-selection or leakage audit starts from: MI ≈ 0
    * says segment carries no nation signal; the normalized NMI
    * (MI / √(H_seg·H_nat)) makes the number comparable across column
    * pairs with different cardinalities.
    *
    * Exactness: one (seg, nation) count shuffle builds the contingency
    * table; every ln takes an INTEGER argument (N·n_ij, n_i, n_j, N —
    * micro-quantized, the NLL discipline), so the MI and entropy
    * numerators are exact LONG sums over ≤ |seg|·|nation| cells; the
    * emitted doubles are short identical IEEE sequences on those exact
    * integers. Scale shape: corpus-scale work is the ONE cell count agg
    * (partial map-side); everything after runs on the ~125-row
    * contingency frame (checkpointed — it feeds three marginal aggs).
    */
  def qStatsMutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    def lnq(c: Column): Column = round(log(c) * 1e6).cast("long")
    val nat = Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name"))
    val cells = Tables
      .customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint() // ~125 rows, feeds four downstream aggs
    val segM = cells.groupBy("seg").agg(sum("nij").as("ni"))
    val natM = cells.groupBy("nat").agg(sum("nij").as("nj"))
    val tot = cells.agg(sum("nij").as("n"))
    val mi = cells
      .join(segM, "seg")
      .join(natM, "nat")
      .crossJoin(broadcast(tot))
      .select(
        (col("nij") *
          (lnq(col("n") * col("nij")) - lnq(col("ni")) - lnq(col("nj")))).as("t"))
      .agg(sum("t").as("mi_micro"))
    val hSeg = segM.agg(sum(col("ni") * lnq(col("ni"))).as("s_seg"))
    val hNat = natM.agg(sum(col("nj") * lnq(col("nj"))).as("s_nat"))
    tot
      .crossJoin(mi)
      .crossJoin(hSeg)
      .crossJoin(hNat)
      .select(
        col("n").as("n_customers"),
        (col("mi_micro").cast("double") / col("n") / 1e6).as("mi_nats"),
        ((col("n") * lnq(col("n")) - col("s_seg")).cast("double") / col("n") / 1e6)
          .as("h_segment"),
        ((col("n") * lnq(col("n")) - col("s_nat")).cast("double") / col("n") / 1e6)
          .as("h_nation"))
      .withColumn("nmi", col("mi_nats") / sqrt(col("h_segment") * col("h_nation")))
  }

  /** Pearson chi-squared independence test between two categorical event
    * dimensions (event_type × a fixed value bucket) — the classical
    * "does this feature depend on that one?" gate next to
    * [[qStatsMutualInfo]]'s information-theoretic readout: chi² near its
    * dof says independent; Cramér's V normalizes the statistic to [0,1]
    * so it compares across tables of different size/cardinality.
    *
    * Exactness discipline: observed counts and both marginals are exact
    * LONGs from one contingency aggregation; each cell's expected count
    * is `(rt·ct) AS DOUBLE / n` — the long product stays ≪ 2^53 (≤ 30
    * cells over event counts), so the double is exact before its one
    * division, and the per-cell term `(o−e)²/e` is the identical short
    * IEEE sequence on both engines. The cell terms sum through
    * [[Tables.dsum]]'s DECIMAL(18,6) quantization, so partial-aggregate
    * order cannot perturb chi². Cramér's V is one more identical IEEE
    * sqrt/division chain on exact inputs.
    *
    * Scale shape: corpus-scale work is the ONE (type, bucket) cell count
    * (map-side partial agg); marginals, total, and the chi² fold all run
    * on the ≤ 30-row contingency frame (checkpointed — it feeds three
    * downstream aggs and the final join).
    */
  /** Pairwise Welch's t-test over event-type value distributions — the
    * unequal-variance two-sample test an experimentation platform runs
    * beside the chi-square ([[qStatsChi2]]) and KS (`q_dq_ks`) checks:
    * for every pair of event types, the t statistic and Welch–
    * Satterthwaite degrees of freedom for the difference in mean value.
    *
    * Exact-INTEGER core (r13 reformulation — retires the r12-flagged
    * DECIMAL(38,6) quantization band): `value` lives on the 1e-2 cent
    * grid by fixture construction (and the organic probe synthesis
    * never rewrites it), so `w = round(100·value)` is an EXACT integer
    * on both engines (products of cent values × 100 land within ~1e-9
    * of an integer — never near a rounding midpoint) and the ONLY
    * corpus-scale pass is one per-type partial agg of
    * (n, Σw, Σw²) in DECIMAL(38,0) — exact integer sums with NO
    * double→decimal quantization anywhere, portable at ANY scale (the
    * old shape cast ~1e12-magnitude DOUBLE square sums to (38,6),
    * where the 1e-6 grid sits below the double ulp and Spark's
    * shortest-repr rounding can disagree with DuckDB's exact-binary
    * rounding — the measured kruskal divergence mechanism). The
    * centered second moment `M2 = n·Σw² − (Σw)²` (= n·Σ(w−w̄)²) is
    * computed IN EXACT DECIMAL — the catastrophic cancellation of the
    * textbook form happens in integer arithmetic where it is exact,
    * not in floating point. Means, Welch variances, t, and dof are
    * then IEEE doubles on the ≤|types|² pair frame from those exact
    * integers, mirrored op-for-op by the oracle (division and sqrt
    * are correctly-rounded, so the two engines agree bit-for-bit —
    * the q_agg_corr discipline; no libm transcendentals anywhere).
    * Magnitude contract: n·Σw² ≤ N²·max(w)² must stay under 1e38
    * (decimal(38,0) / HUGEINT) — holds to ~1e13 rows of ~1e5-cent
    * values; past it BOTH engines now fail loudly (the oracle's
    * HUGEINT raises, the Spark side raises via [[m2Checked]] — r13
    * ADVICE #4 closed the silent-NULL divergence).
    *
    * Scale shape: one map-side-combined agg over events; the pair
    * construction is a self-join of the ≤|types|-row model frame
    * (broadcast by size). Degenerate pairs (n ≤ 1 or both variances 0)
    * emit NULL t/dof rather than NaN — the cramers_v convention.
    */
  def qStatsWelchTtest(spark: SparkSession, sfDir: String): DataFrame = {
    val g = centSums(spark, sfDir)
    def side(p: String) = g.select(
      col("et").as(s"${p}et"),
      col("n").as(s"${p}n"),
      (col("sw").cast("double") / col("n") / 100.0).as(s"${p}mean"),
      m2Checked(col("n"), col("sw"), col("sww"))
        .cast("double")
        .as(s"${p}m2"))
    val a = side("a_")
    val b = side("b_")
    // unbiased sample variance in value units: M2/(1e4·n·(n−1))
    def svar(p: String) =
      col(s"${p}m2") / 10000.0 / col(s"${p}n") / (col(s"${p}n") - 1)
    val se2 = svar("a_") / col("a_n") + svar("b_") / col("b_n")
    val ok = col("a_n") > 1 && col("b_n") > 1 && se2 > 0.0
    a.crossJoin(b)
      .where(col("a_et") < col("b_et"))
      .select(
        col("a_et").as("type_a"),
        col("b_et").as("type_b"),
        col("a_n").as("n_a"),
        col("b_n").as("n_b"),
        col("a_mean").as("mean_a"),
        col("b_mean").as("mean_b"),
        when(ok, (col("a_mean") - col("b_mean")) / sqrt(se2)).as("t_stat"),
        when(
          ok,
          se2 * se2 /
            ((svar("a_") / col("a_n")) * (svar("a_") / col("a_n")) / (col("a_n") - 1) +
              (svar("b_") / col("b_n")) * (svar("b_") / col("b_n")) / (col("b_n") - 1)))
          .as("welch_dof"))
      .orderBy("type_a", "type_b")
  }

  /** Shared exact-integer cent-grid power sums of the two parametric
    * tests ([[qStatsWelchTtest]], [[qStatsAnova]]): per-type
    * (n, Σw, Σw²) with `w = round(100·value)` as DECIMAL(19,0) —
    * see the Welch scaladoc for the portability argument.
    * Checkpointed: both callers re-read the ≤|types|-row frame
    * (pair self-join / grand-total + deviation folds) and must not
    * rescan events.
    */
  private def centSums(spark: SparkSession, sfDir: String): DataFrame = {
    val w = round(col("value") * lit(100.0)).cast("decimal(19,0)")
    Tables
      .events(spark, sfDir)
      .where(col("value").isNotNull)
      .groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"), sum(w).as("sw"), sum(w * w).as("sww"))
      .localCheckpoint()
  }

  /** Guarded exact-decimal M2 numerator `n·Σw² − (Σw)²` (r13 ADVICE #4):
    * past the documented ~1e38 magnitude contract, Spark's non-ANSI
    * decimal multiply returns NULL where the DuckDB oracle's HUGEINT
    * arithmetic RAISES — divergent failure modes. This guard makes the
    * Spark side fail equally loudly at the contract boundary (inputs
    * non-null but the product NULL ⇒ overflow) instead of degrading to
    * silent NULL t/F statistics. Runs on ≤|types|-row model frames —
    * zero corpus-scale cost.
    */
  private[graft] def m2Checked(n: Column, sw: Column, sww: Column): Column = {
    val m2 = n.cast("decimal(19,0)") * sww - sw * sw
    when(
      m2.isNull && n.isNotNull && sw.isNotNull && sww.isNotNull,
      raise_error(lit(
        "centSums magnitude contract exceeded: n*sum(w^2) overflows decimal(38,0) (~1e38) " +
          "- the cent-grid stats are exact only inside the documented band; shard the " +
          "aggregation or rescale the grid")))
      .otherwise(m2)
  }

  /** One-way ANOVA over event-type value distributions — the k-sample
    * generalization of [[qStatsWelchTtest]]: between/within sums of
    * squares, the F statistic, and eta² (effect size) for "does mean
    * value differ across event types at all", run before the pairwise
    * drill-down.
    *
    * Exact-INTEGER core + deviation form (r13 reformulation — retires
    * the r12-flagged DECIMAL(38,6) quantization band; see
    * [[qStatsWelchTtest]] for the cent-grid portability argument): the
    * SAME one-pass per-type (n, Σw, Σw²) integer cent sums via
    * [[centSums]]. The total sum of squares comes from the exact
    * decimal numerator `N·ΣΣw² − (ΣΣw)²` (cancellation happens in
    * integer arithmetic), and SSB uses the MEAN-DEVIATION form
    * `Σ n_i·(m̄_i − m̄)²` — the q_stats_kruskal discipline: its
    * cross-type terms are ≈ n_i × squared effect in VALUE units
    * (~1e7 at probe scale, ≲ 4e9 before the (38,6) quantization of
    * the k-row fold leaves its portable band — documented contract),
    * not ≈ N·Var ~ 1e12 like the retired Σs_i²/n_i form.
    * SSW = SST − SSB is one IEEE subtraction of quantities both
    * engines compute bit-identically from exact integers. Degenerate
    * layouts (k ≤ 1 or N ≤ k) emit NULL F.
    *
    * Scale shape: one map-side-combined agg over events + two
    * ≤|types|-row folds — nothing else touches the corpus.
    */
  def qStatsAnova(spark: SparkSession, sfDir: String): DataFrame = {
    val g = centSums(spark, sfDir)
    val tot = g.agg(
      sum(col("n")).as("n_tot"),
      count(lit(1)).as("k"),
      sum(col("sw")).as("swt"),
      sum(col("sww")).as("swwt"))
    // per-type mean deviation from the grand mean, in value units
    val dev = col("sw").cast("double") / col("n") / 100.0 -
      col("swt").cast("double") / col("n_tot") / 100.0
    val folded = g
      .crossJoin(broadcast(tot))
      .groupBy("n_tot", "k", "swt", "swwt")
      .agg(
        sum((col("n").cast("double") * (dev * dev)).cast("decimal(38,6)"))
          .cast("double")
          .as("ssb"))
    val sst = m2Checked(col("n_tot"), col("swt"), col("swwt"))
      .cast("double") / col("n_tot") / 10000.0
    val ssw = sst - col("ssb")
    val ok = col("k") > 1 && col("n_tot") > col("k") && ssw > 0.0
    folded.select(
      col("n_tot"),
      col("k").as("n_groups"),
      col("ssb").as("ss_between"),
      ssw.as("ss_within"),
      when(ok, (col("ssb") / (col("k") - 1)) / (ssw / (col("n_tot") - col("k")))).as("f_stat"),
      when(ok, col("ssb") / (col("ssb") + ssw)).as("eta_sq"))
  }

  /** Pairwise Mann–Whitney U (Wilcoxon rank-sum) test over event-type
    * value distributions — the NONPARAMETRIC sibling of
    * [[qStatsWelchTtest]]: no normality assumption, rank-based, the test
    * an experimentation platform reaches for when value distributions
    * are skewed (revenue, latency). For every type pair: U, the
    * tie-corrected normal-approximation z, and the group sizes.
    *
    * Exact-integer core: U counts cross-group order pairs —
    * `U = Σ_v cntA(v)·(ltB(v) + ½·eqB(v))`. Doubling clears the half:
    * `2U = Σ_v cntA(v)·(2·ltB(v) + eqB(v))` is an EXACT integer, and
    * the tie term `Σ_t (t³ − t)` over combined tie groups is exact too,
    * so the only IEEE arithmetic is the final mean/variance/z chain on
    * the 10-row pair frame, mirrored op-for-op by the oracle (divisions
    * and sqrt are correctly-rounded — the Welch/ANOVA discipline).
    * Per-row products and both sums run in DECIMAL (19,0 factors;
    * 38,0 sums): counts ≤ 1e18 and `Σ t³ ≤ n³` stay in 38 digits at any
    * realistic scale, where a LONG product would silently wrap at
    * ~1e9 × 1e9 rows.
    *
    * Scale shape: the ONLY corpus-scale pass is the (value, type) count
    * aggregation (map-side combined). Everything downstream runs on the
    * distinct-VALUE frame: the D×|types| dense matrix (zero-filled via a
    * broadcast of the ≤|types| type list), per-type strictly-less
    * running counts as a two-phase distributed prefix sum (bounded
    * range-partitioned slices — see [[rankMatrix]]; a continuous-valued
    * metric with D ≈ corpus no longer concentrates a type's D rows in
    * one window task), and a self-join on value producing D·|types|²
    * rows folded map-side to the pair frame.
    */
  /** Shared rank machinery of the two rank tests
    * ([[qStatsMannWhitney]], [[qStatsKruskal]]): the dense
    * D×|types| (value, type) matrix with exact per-cell counts and
    * per-type strictly-less running counts. Checkpointed — both callers
    * reread it (pair self-join / two grouped folds) and must not rescan
    * events.
    *
    * The running count is a TWO-PHASE distributed prefix sum (r14 ask
    * #2 — the `q_orders_pareto` shape, replacing one WindowExec whose
    * per-type partition held all D rows): range-partition the dense
    * matrix on the full (et, v) order key — every slice is a contiguous
    * run of one type's values, bounded by D·|types|/N, and (et, v) is
    * UNIQUE per row so a slice boundary can never split equal keys —
    * then local inclusive cumsums per slice, per-slice partials (≤
    * N·|types| rows) prefix-offset on the tiny frame, offsets broadcast
    * back, and strictly-less = inclusive − own cnt. A continuous-valued
    * metric (D ≈ corpus) now sorts in bounded slices instead of one
    * task per type. The oracle keeps the naive per-type running-count
    * SQL — prefix sums are partition-invariant, so the hash match
    * proves the offset algebra.
    */
  private[graft] def rankMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val vt = Tables
      .events(spark, sfDir)
      .where(col("value").isNotNull)
      .groupBy(col("value").as("v"), col("event_type").as("et"))
      .agg(count(lit(1)).as("cnt"))
      // materialize the ONE corpus-scale pass (r16, guide §2.4): vt is
      // referenced from three plan positions (the type list, the distinct
      // value spine, the zero-fill join) and each uncheckpointed reference
      // re-ran the events scan + (value, type) count shuffle. ≤ D×|types|
      // rows of (double, string, long) — executor-local blocks.
      .localCheckpoint()
    val types = vt.select("et").distinct()
    // dense D×|types| matrix: every (value, type) cell, zero-filled
    val dense = vt
      .select("v")
      .distinct()
      .crossJoin(broadcast(types))
      .join(vt, Seq("v", "et"), "left")
      .select(col("v"), col("et"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    // phase 1: contiguous (et, v)-ordered slices, local inclusive cumsum.
    // localCheckpoint PINS the slice assignment by data (r14 ADVICE): both
    // branches below re-derive spark_partition_id() from this subplan, and
    // without the pin their agreement rests on exchange reuse — a
    // canonicalization miss (or spark.sql.exchange.reuse=false) would let
    // the range sampler pick different boundaries per instantiation and
    // silently corrupt lt.
    val sliced = dense
      .repartitionByRange(col("et"), col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window
      .partitionBy("et", "pid")
      .orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sliced.withColumn("lcum", sum("cnt").over(wLocal))
    // phase 2: per-slice partials → exclusive offsets on the tiny frame
    // (from the PRE-window frame — the offsets branch needs only sums,
    // so it must not depend on phase 1's window pass)
    val wOff = Window.partitionBy("et").orderBy("pid")
    val offsets = sliced
      .groupBy("et", "pid")
      .agg(sum(col("cnt")).as("c_part"))
      .select(col("et"), col("pid"), (sum("c_part").over(wOff) - col("c_part")).as("cum_off"))
    local
      .join(broadcast(offsets), Seq("et", "pid"))
      .select(
        col("v"),
        col("et"),
        col("cnt"),
        (col("lcum") + col("cum_off") - col("cnt")).as("lt"))
      .localCheckpoint()
  }

  def qStatsMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val m = rankMatrix(spark, sfDir)
    def side(p: String) = m.select(
      col("v"),
      col("et").as(s"${p}et"),
      col("cnt").as(s"${p}cnt"),
      col("lt").as(s"${p}lt"))
    val t = (col("a_cnt") + col("b_cnt")).cast("decimal(12,0)")
    val pairs = side("a_")
      .join(side("b_"), Seq("v"))
      .where(col("a_et") < col("b_et"))
      .groupBy(col("a_et").as("type_a"), col("b_et").as("type_b"))
      .agg(
        sum(col("a_cnt")).as("n_a"),
        sum(col("b_cnt")).as("n_b"),
        sum(col("a_cnt").cast("decimal(19,0)") *
          (lit(2L) * col("b_lt") + col("b_cnt")).cast("decimal(19,0)")).as("u2"),
        sum(t * t * t - t).as("ties3"))
    // IEEE tail on the ≤|types|² pair frame, from exact integers only
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val u = col("u2").cast("double") / 2.0
    val mu = na * nb / 2.0
    val varU = na * nb / 12.0 *
      ((n + 1.0) - col("ties3").cast("double") / (n * (n - 1.0)))
    pairs
      .select(
        col("type_a"),
        col("type_b"),
        col("n_a"),
        col("n_b"),
        u.as("u_stat"),
        when(varU > 0.0, (u - mu) / sqrt(varU)).as("z"))
      .orderBy("type_a", "type_b")
  }

  /** Kruskal–Wallis H test across ALL event-type value distributions —
    * the k-sample rank test: the nonparametric sibling of
    * [[qStatsAnova]] exactly as [[qStatsMannWhitney]] is of the Welch
    * t-test, run as the omnibus gate before the pairwise rank
    * drill-down. Tie-corrected.
    *
    * Exact-integer core on the SAME [[rankMatrix]]: a value's average
    * rank is `cumAll + (t+1)/2` where `cumAll = Σ_types lt` (the global
    * strictly-less count — summing the PER-TYPE growing counts avoids
    * any single-partition global window), so the doubled rank sum
    * `2R_i = Σ_v cnt_i·(2·cumAll + t + 1)` and the tie term `Σ(t³−t)`
    * are exact DECIMAL sums. H then uses the MEAN-RANK-DEVIATION form
    * `H = 12/(N(N+1)) · Σ n_i·(R̄_i − (N+1)/2)²` — algebraically equal
    * to the Σ R_i²/n_i − 3(N+1) textbook form, chosen because its
    * cross-type terms are SMALL (≈ n_i × squared effect, not ≈ N³):
    * the (38,6) quantization of the cross-type sum is only
    * engine-portable while the 1e-6 step exceeds the term's double ulp
    * (Spark rounds the shortest decimal repr, DuckDB the exact binary
    * expansion — they agree only when the value is ≫ ulp away from the
    * grid boundary, i.e. |term| ≲ 1e9; the Σ R_i²/n_i form sits at
    * ~5e10 on this fixture and DID diverge in the 12th digit). Same
    * magnitude contract class as the fsum grains — documented, and the
    * deviation form keeps the margin ~1e5 at fixture scale.
    *
    * Scale shape: everything below the one (value, type) corpus agg
    * runs on the distinct-value frame — a D-row grouped fold for the
    * global tie/cum terms and a ≤|types|-row fold for H.
    */
  def qStatsKruskal(spark: SparkSession, sfDir: String): DataFrame = {
    val m = rankMatrix(spark, sfDir)
    val g = m
      .groupBy(col("v"))
      .agg(sum(col("cnt")).as("t"), sum(col("lt")).as("cum_all"))
    val td = col("t").cast("decimal(12,0)")
    val joined = m.join(g, "v")
    val perType = joined
      .groupBy(col("et"))
      .agg(
        sum(col("cnt")).as("n_i"),
        sum(col("cnt").cast("decimal(19,0)") *
          (lit(2L) * col("cum_all") + col("t") + lit(1L)).cast("decimal(19,0)")).as("r2"))
    val ties = g.agg(
      sum(td * td * td - td).as("ties3"),
      sum(col("t")).as("n_tot"))
    val n = col("n_tot").cast("double")
    // mean-rank deviation per type: IEEE on exact integers only
    val dev = col("r2").cast("double") / (lit(2.0) * col("n_i").cast("double")) -
      (n + lit(1.0)) / lit(2.0)
    val fold = perType
      .crossJoin(broadcast(ties))
      .select(col("n_i"), col("ties3"), col("n_tot"), dev.as("dev"))
      .groupBy("ties3", "n_tot")
      .agg(
        count(lit(1)).as("k"),
        sum((col("n_i").cast("double") * (col("dev") * col("dev"))).cast("decimal(38,6)"))
          .cast("double")
          .as("st"))
    val h0 = lit(12.0) / (n * (n + lit(1.0))) * col("st")
    val corr = lit(1.0) - col("ties3").cast("double") / (n * n * n - n)
    fold.select(
      col("n_tot"),
      col("k").as("n_groups"),
      when(col("k") > 1 && corr > 0.0, h0 / corr).as("h_stat"),
      corr.as("tie_factor"))
  }

  def qStatsChi2(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables
      .events(spark, sfDir)
      .where(col("value").isNotNull)
      .select(
        col("event_type").as("et"),
        least(floor(col("value") / 50.0), lit(5.0)).cast("int").as("vb"))
      .groupBy("et", "vb")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // ≤ 30 rows; feeds marginals, total, and the fold
    val rowM = cells.groupBy("et").agg(sum("o").as("rt"))
    val colM = cells.groupBy("vb").agg(sum("o").as("ct"))
    val tot = cells.agg(
      sum("o").as("n"),
      countDistinct("et").as("r"),
      countDistinct("vb").as("c"),
      count(lit(1)).as("n_cells"))
    val e = (col("rt") * col("ct")).cast("double") / col("n")
    val diff = col("o").cast("double") - e
    cells
      .join(rowM, "et")
      .join(colM, "vb")
      .crossJoin(broadcast(tot))
      .agg(
        first(col("n")).as("n_rows"),
        first(col("n_cells")).as("n_cells"),
        first((col("r") - 1) * (col("c") - 1)).as("dof"),
        first(least(col("r") - 1, col("c") - 1)).as("min_dim"),
        Tables.dsum(diff * diff / e).as("chi2"))
      .select(
        col("n_rows"),
        col("n_cells"),
        col("dof"),
        col("chi2"),
        // min_dim = 0 (single row or column category) makes V a 0/0;
        // emit NULL rather than NaN, mirroring the survival query's
        // NULL log_surv convention for S = 0
        when(
          col("min_dim") > 0,
          sqrt(col("chi2") / (col("n_rows") * col("min_dim")).cast("double")))
          .as("cramers_v"))
  }

  /** Per-column completeness/cardinality profile of the events table —
    * the standard data-quality gate (the Deequ/GE "profile" check) a
    * pipeline runs before trusting an ingest batch: row count, null
    * count, exact distinct count, and the completeness ratio per column.
    * A schema-shaped drop (a column suddenly 40% null, a key column's
    * cardinality collapsing) shows here before any downstream join
    * silently inner-joins the rows away.
    *
    * Scale shape: ONE aggregation pass computes all 13 aggregates —
    * 1 row count + 6 columns x (count, countDistinct) — (the
    * multi-distinct expands to a grouping-id union internally — the
    * honest exact cost; at 100 TB swap the distincts for the HLL sketch
    * of `q_agg_approx`, same readout shape) and the per-column unpivot
    * runs on the single result row. Counts are exact longs; the ratio
    * is one IEEE division per column.
    */
  def qDqCompleteness(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c =>
      Seq(count(col(c)).as(s"c_$c"), countDistinct(col(c)).as(s"d_$c")))
    val one = Tables.events(spark, sfDir).agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c =>
        one.select(
          lit(c).as("column_name"),
          col("n").as("n_rows"),
          (col("n") - col(s"c_$c")).as("n_null"),
          col(s"d_$c").as("n_distinct"),
          (col(s"c_$c").cast("double") / col("n")).as("completeness")))
      .reduce(_ unionByName _)
    stacked.orderBy("column_name")
  }

  /** Per-stream freshness audit — the data-latency gate beside
    * [[qDqCompleteness]]'s shape gate: for each event type, its row
    * count, last-seen timestamp, staleness lag behind the table's
    * global high-water mark (whole seconds), and how many rows arrived
    * in the trailing day — the readout that catches one silently
    * stalled upstream producer (its lag grows while the others' stay
    * ~0) before a downstream join starts quietly under-counting it.
    *
    * Exactness: lags are integer micros subtracted then integer-divided
    * to seconds (no float time math); counts exact longs. Scale shape:
    * one 1-row global max agg (ts column only — scan prunes to it) +
    * one per-type conditional agg against the broadcast high-water
    * mark; both map-side partial, |event types| output rows.
    */
  def qDqFreshness(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hwm = ev.agg(max(col("ts")).as("hwm"))
    ev.crossJoin(broadcast(hwm))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("ts")).as("last_ts"),
        first(col("hwm")).as("hwm"),
        sum(
          when(col("ts") >= col("hwm") - expr("INTERVAL 1 DAY"), 1L)
            .otherwise(0L)).as("n_last_day"))
      .select(
        col("event_type"),
        col("n_rows"),
        col("last_ts"),
        expr("(unix_micros(hwm) - unix_micros(last_ts)) div 1000000").as("lag_s"),
        col("n_last_day"))
      .orderBy("event_type")
  }

  /** Heartbeat-gap audit — the time-CONTINUITY gate beside
    * [[qDqFreshness]]'s staleness gate: per event type, slice its live
    * span into 5-minute epoch-aligned buckets and report how many
    * buckets saw zero events, the LONGEST consecutive outage run (in
    * minutes), and the active-bucket completeness ratio. Freshness
    * catches a producer that stopped; this catches one that flapped —
    * intermittent outages inside the span that leave last_ts healthy.
    *
    * Scale shape: the ONLY corpus pass is one (type, bucket) partial
    * count agg. Span, the expected-bucket fan-out (CHUNKED: days first,
    * then ≤288 in-day slots — a decade span explodes ~3.7k bounded
    * arrays per type instead of one multi-million-element `sequence`
    * row), the anti-join for empties,
    * and the gaps-and-islands window for run lengths all run on the
    * MODEL frame (≤ |types| × span-buckets rows — slots grow with wall
    * time, not corpus size, so a 100 TB day has the same 288 buckets a
    * 1 GB day has). Buckets are exact integer floor-divisions of
    * micros; completeness is the single IEEE division per type.
    */
  def qDqHeartbeat(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = Tables
      .events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 300000000").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
    val span = b
      .groupBy("event_type")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"), count(lit(1)).as("n_active"))
      .localCheckpoint() // ≤|types| rows; fan-out + report reread this, not events
    // chunked fan-out (days → ≤288 in-day slots) via the SHARED
    // Tables.chunkedSlotGrid (one copy of the chunk arithmetic for this
    // and qEventsInterpolate): closes the r12 ADVICE caveat that a
    // decade-span stream would materialize one multi-million-element
    // sequence() array per type row
    val expected = Tables.chunkedSlotGrid(span.select("event_type", "b0", "b1"), "event_type", "b0", "b1")
    val empty = expected.join(b, Seq("event_type", "bucket"), "left_anti")
    val runKey = col("bucket") - row_number().over(
      Window.partitionBy(col("event_type")).orderBy(col("bucket")))
    val maxRun = empty
      .select(col("event_type"), col("bucket"), runKey.as("rk"))
      .groupBy("event_type", "rk")
      .agg(count(lit(1)).as("run"))
      .groupBy("event_type")
      .agg(max(col("run")).as("max_run"))
    span
      .join(maxRun, Seq("event_type"), "left")
      .select(
        col("event_type"),
        (col("b1") - col("b0") + 1).as("n_slots"),
        col("n_active"),
        (col("b1") - col("b0") + 1 - col("n_active")).as("n_empty"),
        (coalesce(col("max_run"), lit(0L)) * 5).as("max_gap_min"),
        (col("n_active").cast("double") / (col("b1") - col("b0") + 1)).as("completeness"))
      .orderBy("event_type")
  }

  /** Referential-integrity audit across the star schema's FK edges plus
    * the events→customer identity edge: per relationship, total child
    * rows, rows whose FK resolves to no parent, and how many DISTINCT
    * orphan keys those rows collapse to (the triage number — one bad
    * upstream key vs a systematic range shift read very differently).
    * The orphan COUNT being nonzero is the gate a pipeline trips before
    * an inner join silently drops the rows.
    *
    * Scale shape: each relation aggregates the child side to (fk, cnt)
    * FIRST — the join that decides orphan-hood runs on distinct keys
    * (bounded by parent cardinality + true orphan keys), never on fact
    * rows; the parent side joins as a distinct key column (Spark prunes
    * the scan to that one column). Five independent single-shuffle
    * audits; the final union is 5 rows. No broadcast hint — at TPC-H
    * scale customer/orders parents are fact-sized, AQE picks per-side.
    */
  def qDqReferential(spark: SparkSession, sfDir: String): DataFrame = {
    def audit(
        relation: String,
        child: DataFrame,
        fk: String,
        parent: DataFrame,
        pk: String): DataFrame =
      child
        .where(col(fk).isNotNull)
        .groupBy(col(fk).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .join(parent.select(col(pk).as("pk")).distinct(), col("k") === col("pk"), "left")
        .agg(
          sum("cnt").as("child_rows"),
          sum(when(col("pk").isNull, col("cnt")).otherwise(lit(0L))).as("orphan_rows"),
          count(when(col("pk").isNull, lit(1))).as("orphan_keys"))
        .select(
          lit(relation).as("relation"),
          col("child_rows"),
          col("orphan_rows"),
          col("orphan_keys"))
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    Seq(
      audit("events.user_id->customer", Tables.events(spark, sfDir), "user_id", cust, "c_custkey"),
      audit("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
      audit("lineitem.l_partkey->part", li, "l_partkey", Tables.part(spark, sfDir), "p_partkey"),
      audit("lineitem.l_suppkey->supplier", li, "l_suppkey", Tables.supplier(spark, sfDir), "s_suppkey"),
      audit("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy("relation")
  }

  val all: Seq[(String, Q)] = Seq(
    "q_text_gopher" -> Q(
      qTextGopher,
      Some(s"""WITH p AS (
              | SELECT doc_id, CAST(len(toks) AS INT) AS n_tok,
              |  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / nullif(CAST(len(toks) AS INT), 0) AS mw,
              |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS INT) AS n_stop,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(CAST(len(toks) AS INT), 0) AS ttr
              | FROM $DOCS_T)
              |SELECT doc_id, n_tok, round(mw, 6) AS mean_wlen, n_stop, round(ttr, 6) AS ttr,
              | (n_tok >= 50 AND n_tok <= 100000) AS pass_len,
              | (mw >= 3.0 AND mw <= 10.0) AS pass_wlen,
              | (n_stop >= 2) AS pass_stop,
              | (ttr >= 0.2) AS pass_ttr,
              | (n_tok >= 50 AND n_tok <= 100000 AND mw >= 3.0 AND mw <= 10.0
              |  AND n_stop >= 2 AND ttr >= 0.2) AS gopher_pass
              |FROM p ORDER BY doc_id""".stripMargin)),
    "q_text_readability" -> Q(
      qTextReadability,
      Some("""WITH r AS (
             | SELECT lang,
             |  regexp_replace(lower(text), '[aeiou]+', chr(1), 'g') AS vm,
             |  regexp_replace(text, '[.!?]+', chr(1), 'g') AS sm,
             |  text
             | FROM documents),
             |d AS (
             | SELECT lang,
             |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS w,
             |  CAST(length(vm) - length(replace(vm, chr(1), '')) AS DOUBLE) AS syl,
             |  CAST(greatest(1, length(sm) - length(replace(sm, chr(1), ''))) AS DOUBLE) AS s
             | FROM r),
             |m AS (
             | SELECT lang, w / s AS wps, syl / w AS spw,
             |  CAST(0.39 AS DOUBLE) * (w / s) + CAST(11.8 AS DOUBLE) * (syl / w)
             |   - CAST(15.59 AS DOUBLE) AS fk
             | FROM d WHERE w > 0)
             |SELECT lang, CAST(count(1) AS BIGINT) AS n_docs,
             | CAST(sum(CAST(wps AS DECIMAL(18,6))) AS DOUBLE) / count(1) AS avg_wps,
             | CAST(sum(CAST(spw AS DECIMAL(18,6))) AS DOUBLE) / count(1) AS avg_spw,
             | CAST(sum(CAST(fk AS DECIMAL(18,6))) AS DOUBLE) / count(1) AS avg_fk,
             | min(fk) AS min_fk, max(fk) AS max_fk
             |FROM m GROUP BY 1 ORDER BY lang""".stripMargin)),
    "q_mix_epochs" -> Q(
      qMixEpochs,
      Some("""WITH c AS (SELECT lang, count(1) AS n_docs FROM documents GROUP BY lang),
             |t AS (SELECT sum(n_docs) AS n FROM c),
             |w AS (SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / n AS p,
             |       CAST(round(pow(CAST(n_docs AS DOUBLE) / n, 0.7) * 1e6, 0) AS BIGINT) AS q_fp
             |      FROM c, t),
             |z AS (SELECT sum(q_fp) AS z FROM w),
             |b AS (SELECT lang, n_docs,
             |       CAST(round(CAST(q_fp AS DOUBLE) / z / p * 1e6, 0) AS BIGINT) AS boost_ppm
             |      FROM w, z),
             |d AS (SELECT documents.lang, doc_id,
             |       (boost_ppm // 1000000) +
             |       CASE WHEN CAST(('0x' || substr(md5(text), 1, 15))::UBIGINT % 1000000 AS BIGINT)
             |            < boost_ppm % 1000000 THEN 1 ELSE 0 END AS copies
             |      FROM documents JOIN b USING (lang)),
             |m AS (SELECT lang, doc_id, unnest(generate_series(1, copies)) AS epoch
             |      FROM d WHERE copies > 0),
             |mm AS (SELECT lang, count(DISTINCT doc_id) AS kept, count(1) AS copies
             |       FROM m GROUP BY lang)
             |SELECT lang, n_docs, boost_ppm,
             | coalesce(kept, 0) AS n_docs_kept, coalesce(copies, 0) AS n_copies,
             | round(CAST(coalesce(copies, 0) AS DOUBLE) / n_docs, 6) AS eff_epochs
             |FROM b LEFT JOIN mm USING (lang) ORDER BY lang""".stripMargin)),
    "q_curation_dsir" -> Q(
      qCurationDsir,
      Some("""WITH toks AS (
             | SELECT doc_id, source, lang, t AS tok,
             |  CAST(('0x' || substr(md5(t), 1, 15))::UBIGINT % 64 AS BIGINT) AS bucket
             | FROM (SELECT doc_id, source, lang,
             |        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |       FROM documents)),
             |tots AS (
             | SELECT count(1) AS n_r,
             |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t FROM toks),
             |raw AS (SELECT bucket, count(1) AS c_r FROM toks GROUP BY bucket),
             |tgt AS (SELECT bucket, count(1) AS c_t FROM toks WHERE lang = 'en' GROUP BY bucket),
             |llr AS (
             | SELECT raw.bucket,
             |  CAST(round((ln(CAST(coalesce(c_t, 0) + 1 AS DOUBLE) / (n_t + 64)) -
             |              ln(CAST(c_r + 1 AS DOUBLE) / (n_r + 64))) * 1e6, 0) AS BIGINT) AS llr_fp
             | FROM raw LEFT JOIN tgt USING (bucket), tots),
             |w AS (
             | SELECT doc_id, source, lang, count(1) AS n_tok, sum(llr_fp) AS s_fp
             | FROM toks JOIN llr USING (bucket)
             | GROUP BY doc_id, source, lang)
             |SELECT doc_id, source, lang, n_tok,
             | round(CAST(s_fp AS DOUBLE) / n_tok / 1e6, 6) AS avg_llr
             |FROM w ORDER BY avg_llr DESC, doc_id LIMIT 20""".stripMargin)),
    "q_curation_scorecard" -> Q(
      qCurationScorecard,
      Some(s"""WITH tf AS (
              | SELECT doc_id, tok, count(1) AS n
              | FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
              |       FROM documents)
              | GROUP BY doc_id, tok),
              |agg AS (
              | SELECT doc_id, CAST(max(n) AS BIGINT) AS top_tok_n,
              |  CAST(sum(n) AS BIGINT) AS n_tokens, count(1) AS n_distinct,
              |  CAST(sum(n * CAST(round(ln(n) * 1e6, 0) AS BIGINT)) AS BIGINT) AS s_micro
              | FROM tf GROUP BY doc_id),
              |sig AS (
              | SELECT doc_id,
              |  (CAST(top_tok_n AS DOUBLE) / n_tokens > 0.125
              |   OR 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens > 0.3) AS repetitive,
              |  round((CAST(CAST(round(ln(n_tokens) * 1e6, 0) AS BIGINT) AS DOUBLE)
              |   - CAST(s_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 1e6, 6) AS entropy
              | FROM agg),
              |gop AS (
              | SELECT doc_id,
              |  (n_tok >= 50 AND n_tok <= 100000 AND mw >= 3.0 AND mw <= 10.0
              |   AND n_stop >= 2 AND ttr >= 0.2) AS gopher_pass
              | FROM (
              |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tok,
              |   CAST(length(text) - (len(toks) - 1) AS DOUBLE) / nullif(CAST(len(toks) AS INT), 0) AS mw,
              |   CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS INT) AS n_stop,
              |   CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(CAST(len(toks) AS INT), 0) AS ttr
              |  FROM $DOCS_T))
              |SELECT source, count(1) AS n_docs,
              | CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
              | CAST(sum(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
              | round(CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS DOUBLE) / count(1), 6) AS gopher_rate,
              | round(CAST(CAST(sum(CAST(round(entropy * 1e6, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 / count(1), 6) AS avg_entropy
              |FROM documents JOIN sig USING (doc_id) JOIN gop USING (doc_id)
              |GROUP BY source ORDER BY source""".stripMargin)),
    "q_mix_temperature" -> Q(
      qMixTemperature,
      Some("""WITH c AS (SELECT lang, count(1) AS n_docs FROM documents GROUP BY lang),
             |t AS (SELECT sum(n_docs) AS n FROM c),
             |wt AS (
             | SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / n AS p,
             |  CAST(round(power(CAST(n_docs AS DOUBLE) / n, 0.7) * 1e6, 0) AS BIGINT) AS q_fp
             | FROM c, t),
             |z AS (SELECT sum(q_fp) AS z FROM wt)
             |SELECT lang, n_docs, round(p, 6) AS p,
             | round(CAST(q_fp AS DOUBLE) / z, 6) AS q_share,
             | round(CAST(q_fp AS DOUBLE) / z / p, 6) AS boost
             |FROM wt, z ORDER BY lang""".stripMargin)),
    // nine spec constants, integer cents, string-of-integer digit — no
    // transcendental touches data, so the ppm table is engine-exact
    "q_dq_completeness" -> Q(
      qDqCompleteness,
      Some {
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        val aggs = cols
          .map(c => s"count($c) AS c_$c, count(DISTINCT $c) AS d_$c")
          .mkString(", ")
        val heads = cols
          .map(c =>
            s"""SELECT '$c' AS column_name, n AS n_rows, n - c_$c AS n_null,
               | d_$c AS n_distinct, CAST(c_$c AS DOUBLE) / n AS completeness FROM s""".stripMargin)
          .mkString("\n UNION ALL ")
        s"""WITH s AS (SELECT count(1) AS n, $aggs FROM ${LlmOps.EV})
           |$heads
           |ORDER BY column_name""".stripMargin
      }),
    "q_dq_referential" -> Q(
      qDqReferential,
      Some {
        def one(rel: String, child: String, fk: String, parent: String, pk: String) =
          s"""SELECT '$rel' AS relation, CAST(sum(cnt) AS BIGINT) AS child_rows,
             | CAST(sum(CASE WHEN p.pk IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS orphan_rows,
             | count(CASE WHEN p.pk IS NULL THEN 1 END) AS orphan_keys
             |FROM (SELECT $fk AS k, count(1) AS cnt FROM $child
             |      WHERE $fk IS NOT NULL GROUP BY 1) c
             |LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $parent) p ON c.k = p.pk""".stripMargin
        Seq(
          one("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
          one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          one("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          one("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
      }),
    "q_stats_mutual_info" -> Q(
      qStatsMutualInfo,
      Some("""WITH cells AS (
             | SELECT c_mktsegment AS seg, n_name AS nat, count(1) AS nij
             | FROM customer JOIN nation ON c_nationkey = n_nationkey
             | GROUP BY 1, 2),
             |sm AS (SELECT seg, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
             |nm AS (SELECT nat, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
             |mi AS (
             | SELECT CAST(sum(nij * (CAST(round(ln(n * nij) * 1e6, 0) AS BIGINT)
             |                        - CAST(round(ln(ni) * 1e6, 0) AS BIGINT)
             |                        - CAST(round(ln(nj) * 1e6, 0) AS BIGINT))) AS BIGINT) AS mi_micro
             | FROM cells JOIN sm USING (seg) JOIN nm USING (nat), t),
             |hs AS (SELECT CAST(sum(ni * CAST(round(ln(ni) * 1e6, 0) AS BIGINT)) AS BIGINT) AS s_seg FROM sm),
             |hn AS (SELECT CAST(sum(nj * CAST(round(ln(nj) * 1e6, 0) AS BIGINT)) AS BIGINT) AS s_nat FROM nm),
             |base AS (
             | SELECT n AS n_customers,
             |  CAST(mi_micro AS DOUBLE) / n / 1e6 AS mi_nats,
             |  CAST(n * CAST(round(ln(n) * 1e6, 0) AS BIGINT) - s_seg AS DOUBLE) / n / 1e6 AS h_segment,
             |  CAST(n * CAST(round(ln(n) * 1e6, 0) AS BIGINT) - s_nat AS DOUBLE) / n / 1e6 AS h_nation
             | FROM t, mi, hs, hn)
             |SELECT n_customers, mi_nats, h_segment, h_nation,
             | mi_nats / sqrt(h_segment * h_nation) AS nmi
             |FROM base""".stripMargin)),
    "q_stats_anova" -> Q(
      qStatsAnova,
      Some("""WITH g AS (
             | SELECT event_type AS et, count(1) AS n,
             |  sum(CAST(round(value * 100.0) AS DECIMAL(19,0))) AS sw,
             |  sum(CAST(round(value * 100.0) AS DECIMAL(19,0))
             |      * CAST(round(value * 100.0) AS DECIMAL(19,0))) AS sww
             | FROM events WHERE value IS NOT NULL GROUP BY 1),
             |t AS (
             | SELECT CAST(sum(n) AS BIGINT) AS n_tot, count(1) AS k,
             |  sum(sw) AS swt, sum(sww) AS swwt FROM g),
             |f AS (
             | SELECT n_tot, k, swt, swwt,
             |  CAST(sum(CAST(CAST(n AS DOUBLE) *
             |    ((CAST(sw AS DOUBLE) / n / 100.0 - CAST(swt AS DOUBLE) / n_tot / 100.0)
             |     * (CAST(sw AS DOUBLE) / n / 100.0 - CAST(swt AS DOUBLE) / n_tot / 100.0))
             |    AS DECIMAL(38,6))) AS DOUBLE) AS ssb
             | FROM g CROSS JOIN t GROUP BY 1, 2, 3, 4),
             |r AS (
             | SELECT n_tot, k, ssb,
             |  CAST(CAST(n_tot AS HUGEINT) * CAST(swwt AS HUGEINT)
             |       - CAST(swt AS HUGEINT) * CAST(swt AS HUGEINT) AS DOUBLE)
             |    / n_tot / 10000.0 AS sst
             | FROM f)
             |SELECT n_tot, k AS n_groups,
             | ssb AS ss_between,
             | sst - ssb AS ss_within,
             | CASE WHEN k > 1 AND n_tot > k AND sst - ssb > 0.0
             |  THEN (ssb / (k - 1)) / ((sst - ssb) / (n_tot - k)) END AS f_stat,
             | CASE WHEN k > 1 AND n_tot > k AND sst - ssb > 0.0
             |  THEN ssb / (ssb + (sst - ssb)) END AS eta_sq
             |FROM r""".stripMargin)),
    "q_stats_welch_ttest" -> Q(
      qStatsWelchTtest,
      Some("""WITH g AS (
             | SELECT event_type AS et, count(1) AS n,
             |  sum(CAST(round(value * 100.0) AS DECIMAL(19,0))) AS sw,
             |  sum(CAST(round(value * 100.0) AS DECIMAL(19,0))
             |      * CAST(round(value * 100.0) AS DECIMAL(19,0))) AS sww
             | FROM events WHERE value IS NOT NULL GROUP BY 1),
             |s AS (
             | SELECT et, n, CAST(sw AS DOUBLE) / n / 100.0 AS m,
             |  CAST(CAST(n AS HUGEINT) * CAST(sww AS HUGEINT)
             |       - CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT) AS DOUBLE) AS m2
             | FROM g)
             |SELECT a.et AS type_a, b.et AS type_b, a.n AS n_a, b.n AS n_b,
             | a.m AS mean_a, b.m AS mean_b,
             | CASE WHEN a.n > 1 AND b.n > 1
             |       AND a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |         + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n > 0.0
             |  THEN (a.m - b.m)
             |     / sqrt(a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |          + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n) END AS t_stat,
             | CASE WHEN a.n > 1 AND b.n > 1
             |       AND a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |         + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n > 0.0
             |  THEN (a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |      + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n)
             |     * (a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |      + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n)
             |     / (a.m2 / 10000.0 / a.n / (a.n - 1) / a.n
             |         * (a.m2 / 10000.0 / a.n / (a.n - 1) / a.n) / (a.n - 1)
             |       + b.m2 / 10000.0 / b.n / (b.n - 1) / b.n
             |         * (b.m2 / 10000.0 / b.n / (b.n - 1) / b.n) / (b.n - 1)) END AS welch_dof
             |FROM s a JOIN s b ON a.et < b.et
             |ORDER BY type_a, type_b""".stripMargin)),
    "q_stats_mannwhitney" -> Q(
      qStatsMannWhitney,
      Some(s"""WITH vt AS (
              | SELECT value AS v, event_type AS et, count(1) AS cnt
              | FROM ${LlmOps.EV} WHERE value IS NOT NULL GROUP BY 1, 2),
              |m AS (
              | SELECT d.v, ty.et, COALESCE(vt.cnt, 0) AS cnt,
              |  COALESCE(sum(COALESCE(vt.cnt, 0)) OVER (PARTITION BY ty.et ORDER BY d.v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
              | FROM (SELECT DISTINCT v FROM vt) d
              | CROSS JOIN (SELECT DISTINCT et FROM vt) ty
              | LEFT JOIN vt ON vt.v = d.v AND vt.et = ty.et),
              |p AS (
              | SELECT a.et AS type_a, b.et AS type_b,
              |  CAST(sum(a.cnt) AS BIGINT) AS n_a, CAST(sum(b.cnt) AS BIGINT) AS n_b,
              |  sum(CAST(a.cnt AS DECIMAL(19,0)) * CAST(2 * b.lt + b.cnt AS DECIMAL(19,0))) AS u2,
              |  sum(CAST(a.cnt + b.cnt AS DECIMAL(12,0)) * CAST(a.cnt + b.cnt AS DECIMAL(12,0))
              |        * CAST(a.cnt + b.cnt AS DECIMAL(12,0))
              |      - CAST(a.cnt + b.cnt AS DECIMAL(12,0))) AS ties3
              | FROM m a JOIN m b ON a.v = b.v AND a.et < b.et
              | GROUP BY 1, 2)
              |SELECT type_a, type_b, n_a, n_b,
              | CAST(u2 AS DOUBLE) / 2.0 AS u_stat,
              | CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
              |    ((CAST(n_a + n_b AS DOUBLE) + 1.0)
              |     - CAST(ties3 AS DOUBLE)
              |       / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0.0
              |  THEN (CAST(u2 AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
              |     / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
              |        ((CAST(n_a + n_b AS DOUBLE) + 1.0)
              |         - CAST(ties3 AS DOUBLE)
              |           / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))) END AS z
              |FROM p ORDER BY type_a, type_b""".stripMargin)),
    "q_stats_kruskal" -> Q(
      qStatsKruskal,
      Some(s"""WITH vt AS (
              | SELECT value AS v, event_type AS et, count(1) AS cnt
              | FROM ${LlmOps.EV} WHERE value IS NOT NULL GROUP BY 1, 2),
              |m AS (
              | SELECT d.v, ty.et, COALESCE(vt.cnt, 0) AS cnt,
              |  COALESCE(sum(COALESCE(vt.cnt, 0)) OVER (PARTITION BY ty.et ORDER BY d.v
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
              | FROM (SELECT DISTINCT v FROM vt) d
              | CROSS JOIN (SELECT DISTINCT et FROM vt) ty
              | LEFT JOIN vt ON vt.v = d.v AND vt.et = ty.et),
              |g AS (
              | SELECT v, CAST(sum(cnt) AS BIGINT) AS t, CAST(sum(lt) AS BIGINT) AS cum_all
              | FROM m GROUP BY 1),
              |pt AS (
              | SELECT m.et, CAST(sum(m.cnt) AS BIGINT) AS n_i,
              |  sum(CAST(m.cnt AS DECIMAL(19,0)) * CAST(2 * g.cum_all + g.t + 1 AS DECIMAL(19,0))) AS r2
              | FROM m JOIN g USING (v) GROUP BY 1),
              |tt AS (
              | SELECT sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
              |        - CAST(t AS DECIMAL(12,0))) AS ties3,
              |  CAST(sum(t) AS BIGINT) AS n_tot
              | FROM g),
              |px AS (
              | SELECT n_i, ties3, n_tot,
              |  CAST(r2 AS DOUBLE) / (2.0 * CAST(n_i AS DOUBLE))
              |   - (CAST(n_tot AS DOUBLE) + 1.0) / 2.0 AS dev
              | FROM pt CROSS JOIN tt),
              |f AS (
              | SELECT ties3, n_tot, count(1) AS k,
              |  CAST(sum(CAST(CAST(n_i AS DOUBLE) * (dev * dev) AS DECIMAL(38,6))) AS DOUBLE) AS st
              | FROM px GROUP BY 1, 2)
              |SELECT n_tot, k AS n_groups,
              | CASE WHEN k > 1 AND 1.0 - CAST(ties3 AS DOUBLE)
              |       / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
              |          - CAST(n_tot AS DOUBLE)) > 0.0
              |  THEN 12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0)) * st
              |     / (1.0 - CAST(ties3 AS DOUBLE)
              |        / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
              |           - CAST(n_tot AS DOUBLE))) END AS h_stat,
              | 1.0 - CAST(ties3 AS DOUBLE)
              |  / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
              |     - CAST(n_tot AS DOUBLE)) AS tie_factor
              |FROM f""".stripMargin)),
    "q_stats_chi2" -> Q(
      qStatsChi2,
      Some("""WITH cells AS (
             | SELECT event_type AS et, CAST(least(floor(value / 50.0), 5.0) AS INT) AS vb, count(1) AS o
             | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |rm AS (SELECT et, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
             |cm AS (SELECT vb, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT et) AS r,
             |             count(DISTINCT vb) AS c, count(1) AS n_cells FROM cells)
             |SELECT n AS n_rows, n_cells, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
             | CAST(sum(CAST((CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / n)
             |              * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / n)
             |              / (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
             | CASE WHEN least(r - 1, c - 1) > 0 THEN
             |   sqrt(CAST(sum(CAST((CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / n)
             |              * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / n)
             |              / (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(18,6))) AS DOUBLE)
             |      / CAST(n * least(r - 1, c - 1) AS DOUBLE)) END AS cramers_v
             |FROM cells JOIN rm USING (et) JOIN cm USING (vb), t
             |GROUP BY n, n_cells, r, c""".stripMargin)),
    "q_dq_heartbeat" -> Q(
      qDqHeartbeat,
      Some(s"""WITH b AS (
              | SELECT event_type, epoch_us(ts) // 300000000 AS bucket, count(1) AS n
              | FROM ${LlmOps.EV} GROUP BY 1, 2),
              |span AS (
              | SELECT event_type, min(bucket) AS b0, max(bucket) AS b1,
              |        count(1) AS n_active
              | FROM b GROUP BY 1),
              |expd AS (
              | SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM span),
              |emp AS (
              | SELECT e.event_type, e.bucket
              | FROM expd e LEFT JOIN b ON e.event_type = b.event_type AND e.bucket = b.bucket
              | WHERE b.event_type IS NULL),
              |runs AS (
              | SELECT event_type,
              |  bucket - row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rk
              | FROM emp),
              |mr AS (
              | SELECT event_type, CAST(max(run) AS BIGINT) AS max_run
              | FROM (SELECT event_type, rk, count(1) AS run FROM runs GROUP BY 1, 2)
              | GROUP BY 1)
              |SELECT s.event_type, b1 - b0 + 1 AS n_slots, n_active,
              | b1 - b0 + 1 - n_active AS n_empty,
              | coalesce(mr.max_run, 0) * 5 AS max_gap_min,
              | CAST(n_active AS DOUBLE) / (b1 - b0 + 1) AS completeness
              |FROM span s LEFT JOIN mr ON s.event_type = mr.event_type
              |ORDER BY s.event_type""".stripMargin)),
    "q_dq_freshness" -> Q(
      qDqFreshness,
      Some(s"""WITH h AS (SELECT max(ts) AS hwm FROM ${LlmOps.EV})
              |SELECT event_type, count(1) AS n_rows, max(ts) AS last_ts,
              | (epoch_us(h.hwm) - epoch_us(max(ts))) // 1000000 AS lag_s,
              | CAST(sum(CASE WHEN ts >= h.hwm - INTERVAL 1 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day
              |FROM ${LlmOps.EV}, h
              |GROUP BY event_type, h.hwm ORDER BY event_type""".stripMargin)),
    "q_dq_benford" -> Q(
      qDqBenford,
      Some("""WITH b AS (
             | SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
             |  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
             |  AS t(digit, benford_ppm)),
             |c AS (
             | SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
             |  count(1) AS n_obs
             | FROM orders GROUP BY 1),
             |tt AS (SELECT sum(n_obs) AS total FROM c)
             |SELECT b.digit, coalesce(c.n_obs, 0) AS n_obs,
             | CAST(round(coalesce(c.n_obs, 0) * 1e6 / tt.total, 0) AS BIGINT) AS share_ppm,
             | CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
             | CAST(round(coalesce(c.n_obs, 0) * 1e6 / tt.total, 0) AS BIGINT) - b.benford_ppm AS delta_ppm
             |FROM b LEFT JOIN c ON b.digit = c.digit CROSS JOIN tt
             |ORDER BY b.digit""".stripMargin)),
    // both medians are POSITION picks over exact cents, so the report
    // is engine-deterministic end-to-end (ties occupy tied positions)
    "q_dq_outlier_mad" -> Q(
      qDqOutlierMad,
      Some("""WITH cts AS (
             | SELECT c_nationkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
             | FROM customer),
             |r AS (
             | SELECT c_nationkey, bal_c,
             |  row_number() OVER (PARTITION BY c_nationkey ORDER BY bal_c ASC) AS rn,
             |  count(1) OVER (PARTITION BY c_nationkey) AS n
             | FROM cts),
             |med AS (SELECT c_nationkey, bal_c AS med_c, n FROM r WHERE rn = (n + 1) // 2),
             |dev AS (
             | SELECT c.c_nationkey, m.n, m.med_c, abs(c.bal_c - m.med_c) AS ad
             | FROM cts c JOIN med m ON c.c_nationkey = m.c_nationkey),
             |r2 AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY ad ASC) AS rn
             |       FROM dev),
             |mad AS (SELECT c_nationkey, ad AS mad_c FROM r2 WHERE rn = (n + 1) // 2)
             |SELECT d.c_nationkey, d.n AS n,
             | CAST(d.med_c AS DOUBLE) / 100 AS median_bal,
             | CAST(m.mad_c AS DOUBLE) / 100 AS mad,
             | CAST(sum(CASE WHEN d.ad > 3 * m.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM dev d JOIN mad m ON d.c_nationkey = m.c_nationkey
             |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin)),
    "q_dq_ks" -> Q(
      qDqKs,
      Some("""WITH ev AS (
             | SELECT event_type = 'click' AS is1,
             |  CAST(greatest(least(floor(value * 1000), 1000000), -1000000) AS BIGINT) AS bucket
             | FROM events WHERE event_type IN ('click', 'purchase')),
             |b AS (
             | SELECT bucket,
             |  CAST(sum(CASE WHEN is1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |  CAST(sum(CASE WHEN is1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
             | FROM ev GROUP BY bucket),
             |cum AS (
             | SELECT c1, c2,
             |  CAST(sum(c1) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f1,
             |  CAST(sum(c2) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f2,
             |  CAST(sum(c1) OVER () AS BIGINT) AS n1, CAST(sum(c2) OVER () AS BIGINT) AS n2
             | FROM b)
             |SELECT max(n1) AS n1, max(n2) AS n2, count(1) AS n_buckets,
             | round(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (max(n1) * max(n2)), 6) AS d,
             | (CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (max(n1) * max(n2)) >
             |  1.358 * sqrt(CAST(max(n1) + max(n2) AS DOUBLE) / (max(n1) * max(n2)))) AS significant
             |FROM cum""".stripMargin)),
    "q_layout_compaction" -> Q(
      qLayoutCompaction,
      Some("""WITH f AS (
             | SELECT source, doc_id % 16 AS file_id,
             |  CAST(sum(n_chars) AS BIGINT) AS bytes, count(1) AS n_docs
             | FROM documents GROUP BY source, doc_id % 16),
             |c AS (
             | SELECT source, bytes,
             |  CAST(sum(bytes) OVER (PARTITION BY source ORDER BY bytes DESC, file_id
             |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             | FROM f)
             |SELECT source, (cum - bytes) // 4096 AS bin,
             | count(1) AS n_files, CAST(sum(bytes) AS BIGINT) AS tot_bytes
             |FROM c GROUP BY source, (cum - bytes) // 4096
             |ORDER BY source, bin""".stripMargin)))
}
