package graft.queries

import graft.{Registry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Smoke + targeted semantics for the registry (full oracle equivalence is
  * the driver's t2; tools/check.py replicates it locally).
  */
class QueriesSpec extends SparkSuite {

  test("every registered query executes at sf0.001") {
    // legitimately empty at this sf (no hamming<=3 simhash pairs exist);
    // q_join_anti and the embed pair queries were de-vacuated in round 6
    // and MUST now return rows here
    val emptyOk = Set("q_dedup_simhash_pairs", "q_dedup_simhash_pairs_capped")
    Registry.all.foreach { case (name, q) =>
      val n = q.fn(spark, sf001).count()
      withClue(name) { assert(n > 0 || emptyOk(name), s"$name returned $n rows") }
    }
  }

  test("every oracle-less registry entry declares its no-oracle reason") {
    // the Q scaladoc contract: oracle=None REQUIRES a one-line reason
    // (Verify emits them as the no_oracle_reasons.json sidecar)
    val missing = Registry.all.collect {
      case (name, q) if q.oracle.isEmpty && q.noOracleReason.forall(_.trim.isEmpty) => name
    }
    assert(missing.isEmpty, s"oracle-less entries without a reason: $missing")
    // and no dangling reasons on entries that DO have an oracle
    val dangling = Registry.all.collect {
      case (name, q) if q.oracle.isDefined && q.noOracleReason.isDefined => name
    }
    assert(dangling.isEmpty, s"entries with both oracle and no-oracle reason: $dangling")
  }

  test("capped LSH equals uncapped on the pristine corpus (no organic bucket over cap)") {
    val uncapped = LlmOps.qDedupNear(spark, sf001).collect().toSet
    val capped = LlmOps.qDedupNearCapped(spark, sf001).collect().toSet
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("capped LSH drops over-cap boilerplate buckets, keeps organic near-dup pairs") {
    import spark.implicits._
    // 20 identical "template" docs (every band bucket holds all 20 →
    // over CapBucket=16) + one organic near-dup pair + isolated docs.
    val template = "the quick brown fox jumps over the lazy dog again and again in this template body"
    val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val nearB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omicron"
    val docs = ((1L to 20L).map(i => (i, template)) ++
      Seq((100L, nearA), (101L, nearB), (200L, "completely unrelated text about tile caches")))
      .toDF("doc_id", "text")
    val uncapped = LlmOps
      .bandPairs(LlmOps.minhashBands(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val capped = LlmOps
      .cappedPairsCore(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // uncapped pays C(20,2) = 190 pairs for the template cluster alone
    assert(uncapped.count { case (a, b) => a <= 20 && b <= 20 } == 190)
    // the cap removes every template pair...
    assert(capped.forall { case (a, b) => a > 20 && b > 20 })
    // ...but keeps the organic near-dup pair (its buckets are size 2)
    assert(capped.contains((100L, 101L)))
    assert(uncapped.contains((100L, 101L)))
  }

  test("hamming cap: capped == uncapped on a pristine signature corpus") {
    import spark.implicits._
    // all-distinct signatures diverse across ALL four 16-bit segments
    // (golden-ratio multiply), paired off at hamming 1 — every segment
    // bucket holds at most one pair, so the cap must be a no-op
    val sigs = (0L until 10L)
      .flatMap { i =>
        val base = 0x9e3779b97f4a7c15L * (i + 1)
        Seq((2 * i, base), (2 * i + 1, base ^ 1L))
      }
      .toDF("doc_id", "sig")
    val uncapped = LlmOps.hammingPairs64(sigs, "sig", cap = None).collect().toSeq
    val capped =
      LlmOps.hammingPairs64(sigs, "sig", cap = Some(LlmOps.CapBucket)).collect().toSeq
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("hamming cap: over-cap clique contributes nothing, small cliques survive") {
    import spark.implicits._
    // 20 identical signatures (> CapBucket=16: every one of their four
    // segment buckets holds all 20) + one hamming-1 organic pair + noise
    val clique = (1L to 20L).map(i => (i, 0x1234_5678_9abc_def0L))
    val organic = Seq((100L, 0x0f0f_0f0f_0f0f_0f0fL), (101L, 0x0f0f_0f0f_0f0f_0f0eL))
    val noise = Seq((200L, -0x6f89_1122_3344_5566L))
    val sigs = (clique ++ organic ++ noise).toDF("doc_id", "sig")
    val uncapped = LlmOps
      .hammingPairs64(sigs, "sig", cap = None)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val capped = LlmOps
      .hammingPairs64(sigs, "sig", cap = Some(LlmOps.CapBucket))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // uncapped pays the full C(20,2) = 190 clique pairs
    assert(uncapped.count { case (a, b) => a <= 20 && b <= 20 } == 190)
    // the cap removes every clique pair (exact digest dedup owns those)...
    assert(capped.forall { case (a, b) => a > 20 && b > 20 })
    // ...but keeps the organic near-dup pair (its buckets are size <= 3)
    assert(capped.contains((100L, 101L)))
    assert(uncapped.contains((100L, 101L)))
  }

  test("hamming cap fires on the organic phash corpus (capped strictly below uncapped)") {
    // the %97 image synthesis makes real cliques at sf0.001: the capped
    // twin must be non-vacuous AND strictly smaller than the uncapped run
    val uncapped = LlmOps.qMultimodalPhash(spark, sf001).count()
    val capped = LlmOps.qMultimodalPhashCapped(spark, sf001).count()
    assert(capped > 0, "capped phash output is empty — vacuous entry")
    assert(capped < uncapped, s"cap never fired: capped=$capped uncapped=$uncapped")
  }

  test("cross-source leakage: cross pair counted once, within-source kept, cap honored") {
    import spark.implicits._
    val template = "the quick brown fox jumps over the lazy dog again and again in this template body"
    val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val nearB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omicron"
    val docs = (
      // over-cap template cluster spanning sources: must NOT appear
      (1L to 20L).map(i => (i, template, if (i % 2 == 0) "srcA" else "srcB")) ++
        Seq(
          (100L, nearA, "srcA"), (101L, nearB, "srcB"), // cross-source near-dup
          (110L, nearA, "srcC"), (111L, nearB, "srcC"), // within-source near-dup
          (200L, "completely unrelated text about tile caches", "srcA"))
    ).toDF("doc_id", "text", "source")
    val rows = LlmOps.crossSourceCore(docs).collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // canonical ordering: src_a <= src_b on every row
    rows.foreach(r => assert(r.getString(0) <= r.getString(1)))
    // template cluster is over CapBucket in every band → contributes nothing
    // cross pair: the A/B near-dup (plus the C/C one does not pollute it)
    assert(m.get(("srcA", "srcB")).exists(_ >= 1L))
    assert(m.get(("srcC", "srcC")).exists(_ >= 1L))
    // est_sim means are in (0, 1]
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // 100↔110 are identical texts in different sources (nearA twice) —
    // the (srcA, srcC) cell must exist with full similarity
    assert(m.get(("srcA", "srcC")).exists(_ >= 1L))
  }

  test("q_text_chunk: windows recompute from the raw strings; coverage and overlap laws") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val rows = LlmOps.qTextChunk(spark, sf001).collect()
    assert(rows.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x")
        .mkString
    val texts = Tables
      .documents(spark, sf001)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .toMap
    val byDoc = rows.groupBy(_.getLong(0))
    texts.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val expected = (1 to toks.length by LlmOps.ChunkStride).zipWithIndex.map {
        case (start, idx) =>
          val win = toks.slice(start - 1, start - 1 + LlmOps.ChunkWin)
          Row(id, idx, start, win.length, md5hex(win.mkString(" ")))
      }
      val got = byDoc.getOrElse(id, Array.empty[Row]).sortBy(_.getInt(1)).toSeq
      assert(got.size == expected.size, s"doc $id chunk count")
      got.zip(expected).foreach { case (g, e) =>
        assert(
          g.getInt(1) == e.getInt(1) && g.getInt(2) == e.getInt(2) &&
            g.getInt(3) == e.getInt(3) && g.getString(4) == e.getString(4),
          s"doc $id chunk ${e.getInt(1)}")
      }
      // coverage law: consecutive starts differ by the stride, so with
      // win > stride every token index is inside at least one window
      if (toks.nonEmpty) {
        val starts = got.map(_.getInt(2))
        assert(starts.head == 1)
        assert(starts.zip(starts.tail).forall { case (a, b) => b - a == LlmOps.ChunkStride })
        val lastEnd = starts.last + got.last.getInt(3) - 1
        assert(lastEnd == toks.length)
      }
    }
  }

  test("tokenizer fertility: per-lang sums recompute from the raw strings") {
    import spark.implicits._
    val rows = LlmOps.qTokenizerFertility(spark, sf001).collect()
    assert(rows.nonEmpty)
    val re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val local = Tables
      .documents(spark, sf001)
      .select(col("lang"), col("text"))
      .as[(String, String)]
      .collect()
      .groupBy(_._1)
      .map { case (lang, g) =>
        val ws = g.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
        val bpe = g.map(d => re.findAllIn(d._2).size.toLong).sum
        val nb = g.map(_._2.getBytes("UTF-8").length.toLong).sum
        lang -> (g.length.toLong, ws, bpe, nb)
      }
    rows.foreach { r =>
      val (nd, ws, bpe, nb) = local(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == ws && r.getLong(3) == bpe && r.getLong(4) == nb)
      val fert = java.math.BigDecimal
        .valueOf(bpe.toDouble / ws.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue
      assert(r.getDouble(5) == fert)
    }
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }

  test("micro-quantized ln args stay far from the .5 rounding boundary (r10, ADVICE)") {
    // q_sample_weighted / q_privacy_dp_count / q_stats_mutual_info all
    // compute round(ln(integer)·1e6) live on BOTH engines; JVM Math.log
    // and DuckDB's libm ln are each within 1 ulp but not identically
    // rounded, so a value within ~1 ulp of a .5 micro-grid boundary
    // could round to different LONGs and break the bit-identical parity
    // claim. This pins the actual fixture argument sets > 1e-6 away
    // from every boundary (~270 ulps at the 2.7e7 magnitude; measured
    // minimum 2.1e-4), making the accepted q_text_zipf-pattern risk an
    // ASSERTED margin instead of a hope. A future fixture refresh that
    // lands a value on the knife edge fails here, not as a driver hash
    // mismatch.
    def minDist(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(min(abs(col("x") - floor(col("x")) - lit(0.5)))).head().getDouble(0)
    val dirs = Seq(sf001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      // A-ES draw: ln(h), h = 40-bit md5(doc_id) + 1 — one per document
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 10), 16, 10)
        .cast("long") + lit(1L)
      val es = Tables.documents(spark, dir).select((log(h) * 1e6).as("x"))
      assert(minDist(es) > 1e-6, s"q_sample_weighted ln(h) margin at $dir")
      // Laplace inverse-CDF: ln(m), m from the 40-bit md5 of n_name
      val hn = conv(substring(md5(col("n_name").cast("binary")), 1, 10), 16, 10).cast("long")
      val m = greatest(lit(1L), lit(1L << 40) - lit(2L) * abs(hn - lit(1L << 39)))
      val dp = Tables.nation(spark, dir).select((log(m) * 1e6).as("x"))
      assert(minDist(dp) > 1e-6, s"q_privacy_dp_count ln(m) margin at $dir")
      // mutual info: ln over {n·nij, ni, nj, n} of the (seg, nation)
      // contingency — the exact argument multiset the query quantizes
      val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
      val cells = Tables
        .customer(spark, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
        .agg(count(lit(1)).as("nij"))
      val segM = cells.groupBy("seg").agg(sum("nij").as("ni"))
      val natM = cells.groupBy("nat").agg(sum("nij").as("nj"))
      val tot = cells.agg(sum("nij").as("n"))
      val mi = cells
        .join(segM, "seg")
        .join(natM, "nat")
        .crossJoin(broadcast(tot))
        .select(explode(array(col("n") * col("nij"), col("ni"), col("nj"), col("n"))).as("v"))
        .distinct()
        .select((log(col("v")) * 1e6).as("x"))
      assert(minDist(mi) > 1e-6, s"q_stats_mutual_info ln margin at $dir")
    }
  }

  test("incremental near-dup: batch probe finds its corpus twin, over-cap index buckets drop (r10)") {
    import spark.implicits._
    // corpus: 20 identical template docs (over CapBucket=16 in every
    // band → the index must drop those buckets) + one organic doc.
    val template = "the quick brown fox jumps over the lazy dog again and again in this template body"
    val organic = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val corpus = ((1L to 20L).map(i => (i, template)) :+ (100L, organic))
      .toDF("doc_id", "text")
    // batch: a near-copy of the organic corpus doc (must surface), a
    // template copy (must NOT — its index buckets are capped away), and
    // an unrelated doc (no candidate at all).
    val batch = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omicron"),
      (1001L, template),
      (1002L, "completely unrelated text about tile caches and parquet footers"))
      .toDF("doc_id", "text")
    val got = LlmOps
      .nearIncrementalCore(corpus, batch)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1000L, 100L)), got.mkString(", "))
    // jaccard of the surfaced pair is the exact shingle Jaccard: 14
    // tokens → 12 3-shingles per side, only the last shingle differs →
    // common = 11, union = 13
    val row = LlmOps.nearIncrementalCore(corpus, batch).collect()(0)
    assert(row.getLong(2) == 11L && row.getDouble(3) == 11.0 / 13.0, row.toString)
  }

  test("hybrid RRF: fused score is exactly the rank-reciprocal sum; both-legs docs outrank (r10)") {
    val rows = SearchOps.qSearchHybridRrf(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (doc, lexR, semR, rrf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(doc != 0L) // the query document is excluded from both legs
      assert(lexR >= 0 && lexR <= 20 && semR >= 0 && semR <= 20)
      assert(lexR > 0 || semR > 0) // a fused row came from at least one leg
      def c(k: Long) = if (k == 0) 0L else math.round(1e6 / (60 + k))
      assert(rrf == (c(lexR) + c(semR)).toDouble / 1e6, r.toString)
    }
    // output is rrf-descending with doc_id tiebreak
    val keys = rows.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("binary quantization: sign bits, popcount, and error recompute exactly (r10)") {
    val got = LlmOps.qEmbedQuantizeBinary(spark, sf001).collect()
    val raw = graft.Tables
      .embeddings(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    assert(got.length == raw.size)
    got.foreach { r =>
      val x = raw(r.getLong(0)).map(_.toDouble)
      val pos = x.map(_ > 0)
      // n_pos equals the popcount of the packed signature (dims = 64)
      val sigHi = r.getLong(4)
      val sigLo = r.getLong(5)
      assert(r.getLong(3) == pos.count(identity).toLong)
      assert(java.lang.Long.bitCount(sigHi) + java.lang.Long.bitCount(sigLo) == r.getLong(3))
      // every bit matches its dimension's sign
      (0 until 32).foreach { i =>
        assert(((sigLo >> i) & 1L) == (if (pos(i)) 1L else 0L), s"lo bit $i of ${r.getLong(0)}")
        assert(((sigHi >> i) & 1L) == (if (pos(i + 32)) 1L else 0L), s"hi bit $i of ${r.getLong(0)}")
      }
      // halves never touch bits >= 32 (bit 63 stays clear of the LONG sign)
      assert((sigHi >>> 32) == 0L && (sigLo >>> 32) == 0L)
      // scale and mean reconstruction error replay the fixed-point path
      val absFp = x.map(v => math.round(math.abs(v) * 1e9)).sum
      val scale = absFp.toDouble / x.length / 1e9
      val scaleR = BigDecimal(scale).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) == scaleR, s"scale of ${r.getLong(0)}")
      val errFp = x.map(v => math.round(math.abs(math.abs(v) - scale) * 1e9)).sum
      val meanErr = BigDecimal(errFp.toDouble / x.length / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(7) == meanErr, s"mean_err of ${r.getLong(0)}")
    }
  }

  test("ngram capped == ngram exact when no shingle exceeds the df cap") {
    // 50 docs at sf0.001 — no shingle can reach df > 50, so the capped
    // variant must reproduce the exact variant bit-for-bit.
    val a = LlmOps.qDedupNgram(spark, sf001).collect()
    val b = LlmOps.qDedupNgramCapped(spark, sf001).collect()
    assert(a.sameElements(b))
  }

  test("simhash pairs == brute-force hamming<=3 (pigeonhole completeness)") {
    import spark.implicits._
    val sigs = LlmOps.qDedupSimhash(spark, sf001).collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2)).toSet
    val got = LlmOps
      .qDedupSimhashPairs(spark, sf001)
      .select("d1", "d2")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == brute) // the 4-segment join is exact at radius 3, not approximate
  }

  test("embed LSH dedup finds clustered near-dups and is a subset of exact") {
    import spark.implicits._
    // sf0.001 has no cos>=0.8 pair, so drive the cores over a clustered
    // fixture: 3 exact groups of near-identical vectors + noise vectors.
    val rnd = new scala.util.Random(7)
    def base(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows = (0 until 3).flatMap { g =>
      val b = base(g)
      (0 until 4).map { i =>
        val v = b.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
        (g * 10L + i, v)
      }
    } ++ (100 until 120).map(i => (i.toLong, base(i)))
    val emb = rows.toDF("vec_id", "embedding")
    val exact = LlmOps
      .embedPairsExact(emb)
      .select("v1", "v2")
      .as[(Long, Long)]
      .collect()
      .toSet
    val lsh = LlmOps
      .embedPairsLsh(emb)
      .select("v1", "v2")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(lsh.subsetOf(exact), "LSH rerank must never emit a non-near-dup pair")
    // each 4-vector cluster has 6 true pairs = 18 total; banded LSH with
    // P(candidate) ~= 0.87 per pair must find a clear majority of them
    assert(exact.size == 18, s"fixture produced ${exact.size} exact pairs")
    assert(lsh.size >= 12, s"LSH recall too low: ${lsh.size}/18")
  }

  test("banded ANN == dense any-band-hamming<=2 filter (probe equivalence)") {
    import spark.implicits._
    // The banded multi-probe semi-join must select EXACTLY the vectors a
    // dense "∃ band b: bit_count(key_b(v) ^ key_b(q)) <= 2" filter
    // selects — i.e. the 1096-key probe enumeration is complete (misses
    // no bucket in the radius) and sound (adds none outside it).
    val e = graft.Tables
      .embeddings(spark, sf001)
      .withColumn("sig0", graft.functions.PlaneSig64.of(col("embedding"), 0))
      .withColumn("sig1", graft.functions.PlaneSig64.of(col("embedding"), 1))
    val q = e.where($"vec_id" === 0).select($"sig0".as("q0"), $"sig1".as("q1"))
    def key(word: org.apache.spark.sql.Column, b: Int) =
      shiftright(word, 16 * (b % 4)).bitwiseAND(lit(0xffffL))
    val anyBand = (0 until 8)
      .map { b =>
        val (w, qw) = if (b < 4) ($"sig0", $"q0") else ($"sig1", $"q1")
        bit_count(key(w, b).bitwiseXOR(key(qw, b))) <= 2
      }
      .reduce(_ || _)
    val brute = e
      .where($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .where(anyBand)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    val ballKeep = LlmOps.qSimAnn(spark, sf001) // top-10 of the candidate set
    val annCand = ballKeep.select("vec_id").as[Long].collect().toSet
    assert(annCand.subsetOf(brute))
    // and the top-10 rerank picks the 10 best of the brute candidate set
    assert(annCand.size == math.min(10, brute.size))
  }

  test("q_ann_recall: metric laws hold; a planted near-duplicate is recalled") {
    // metric-law pass on the real fixture (low recall here is the
    // documented random-cosine-floor property, not a harness bug)
    val rows = LlmOps.qAnnRecall(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nc, nh, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nh <= math.min(nc, 10L))
      assert(rec == nh.toDouble / 10)
    }
    // planted fixture: queries 0-4 are EXACT copies of data vectors 5-9 —
    // identical signatures land in the same buckets, cosine 1 ranks
    // first in both arms, so every query must recall its plant
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_recall").toString
    val vecs = (5L until 60L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt)
    }
    val planted = ((0L until 5L).map(q => (q, vecs(q.toInt)._2, vecs(q.toInt)._3)) ++ vecs).toSeq
    planted
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val pr = LlmOps.qAnnRecall(spark, dir).collect()
    assert(pr.length == 5)
    pr.foreach { r =>
      assert(r.getLong(1) >= 1L) // the identical-signature plant is a candidate
      assert(r.getLong(2) >= 1L) // and it is recalled in the top 10
    }
  }

  test("q_ann_recall_ivf: metric laws hold; a planted exact copy is recalled") {
    // metric-law pass on the real fixture; candidate counts are cluster
    // sizes (≈ NProbe/K of the corpus), not a hamming ball
    val rows = LlmOps.qAnnRecallIvf(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nc, nh, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nc >= 1L) // probe-4 of 16 clusters always selects members
      assert(nh <= math.min(nc, 10L))
      assert(rec == nh.toDouble / 10)
    }
    // planted fixture: queries 0-4 are EXACT copies of corpus vectors
    // 5-9 — a query's centroid ranking is its copy's, so the copy's own
    // cluster is always probed, cosine 1 ranks first in both arms
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_recall_ivf").toString
    val vecs = (5L until 60L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt)
    }
    val planted = ((0L until 5L).map(q => (q, vecs(q.toInt)._2, vecs(q.toInt)._3)) ++ vecs).toSeq
    planted
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val pr = LlmOps.qAnnRecallIvf(spark, dir).collect()
    assert(pr.length == 5)
    pr.foreach { r =>
      assert(r.getLong(1) >= 1L) // the copy's own cluster is probed
      assert(r.getLong(2) >= 1L) // and the copy is recalled in the top 10
    }
  }

  test("q_ann_recall_pq: metric laws hold; a planted exact copy is recalled") {
    // metric-law pass on the real fixture; the PQ candidate budget is a
    // FIXED 50 per query (or the whole corpus if smaller)
    val rows = LlmOps.qAnnRecallPq(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nc, nh, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nc >= 1L && nc <= 50L)
      assert(nh <= math.min(nc, 10L))
      assert(rec == nh.toDouble / 10)
    }
    // planted fixture: queries 0-4 are EXACT copies of corpus vectors
    // 5-9 — a copy's codes are the query's own nearest codes, so its
    // ADC distance is the minimum possible and it survives the top-50;
    // cosine 1 then ranks it first in both arms
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_recall_pq").toString
    val vecs = (5L until 60L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f), (id % 3).toInt)
    }
    val planted = ((0L until 5L).map(q => (q, vecs(q.toInt)._2, vecs(q.toInt)._3)) ++ vecs).toSeq
    planted
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val pr = LlmOps.qAnnRecallPq(spark, dir).collect()
    assert(pr.length == 5)
    pr.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(2) >= 1L) // the exact copy is recalled in the top 10
    }
  }

  test("q_embed_matryoshka: metric laws; prefix-determined fixture scores perfect recall") {
    // metric laws on the real fixture (random embeddings spread signal
    // across all 64 dims, so prefix recall is genuinely < 1 here — the
    // degradation the eval exists to measure)
    val rows = LlmOps.qEmbedMatryoshka(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nh, rec) = (r.getLong(1), r.getDouble(2))
      assert(nh >= 0L && nh <= 10L)
      assert(rec == nh.toDouble / 10)
    }
    // planted fixture: every vector is zero beyond dim 16, so the prefix
    // cosine IS the full cosine — the two rankings coincide and every
    // query must score recall 1.0
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dir = java.nio.file.Files.createTempDirectory("graft_mrl").toString
    val vecs = (0L until 40L).map { id =>
      val v = Array.fill(64)(0f)
      (0 until LlmOps.MrlPrefixDims).foreach(i => v(i) = rnd.nextFloat() * 2f - 1f)
      (id, v, (id % 3).toInt)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val pr = LlmOps.qEmbedMatryoshka(spark, dir).collect()
    assert(pr.length == 5)
    pr.foreach { r =>
      assert(r.getLong(1) == 10L)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("q_dedup_exact keeps one representative per distinct text") {
    val docs = Tables.documents(spark, sf001).count()
    val out = LlmOps.qDedupExact(spark, sf001)
    val distinctTexts =
      Tables.documents(spark, sf001).select("text").distinct().count()
    assert(out.count() == distinctTexts)
    assert(out.agg(sum("n_dups")).head().getLong(0) == docs)
  }

  test("q_sim_topk returns 10 rows ordered by similarity desc") {
    val rows = LlmOps.qSimTopk(spark, sf001).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
  }

  test("q_embed_quantize: int8 round trip recomputed for vec 0; error bounded by scale/2") {
    val rows = LlmOps.qEmbedQuantize(spark, sf001).collect()
    val nVecs = Tables.embeddings(spark, sf001).count()
    assert(rows.length.toLong == nVecs)
    // no clipping error is possible (|x| <= mx so |x/scale| <= 127), so
    // the worst reconstruction error is half a quantization step
    rows.foreach { r =>
      val (scale, maxErr) = (r.getDouble(3), r.getDouble(4))
      assert(maxErr <= scale / 2 + 5e-7, s"vec ${r.getLong(0)}") // 6-dec rounding slack
      assert(r.getDouble(5) <= maxErr + 5e-7)
    }
    // full recompute for vec 0
    val x = Tables
      .embeddings(spark, sf001)
      .where(col("vec_id") === 0)
      .select("embedding")
      .head()
      .getSeq[Float](0)
      .map(_.toDouble)
    val mx = x.map(math.abs).max
    val scale = mx / 127.0
    val errs = x.map { v =>
      val q = math.max(-127.0, math.min(127.0, BigDecimal(v / scale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble))
      math.abs(v - q * scale)
    }
    val r0 = rows.find(_.getLong(0) == 0L).get
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getLong(2) == x.length.toLong)
    assert(r0.getDouble(3) == r6(scale))
    assert(r0.getDouble(4) == r6(errs.max))
    val meanFp = errs.map(e =>
      BigDecimal(e * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
    assert(r0.getDouble(5) == r6(meanFp.toDouble / x.length / 1e9))
  }

  test("q_sim_ann candidates are a subset-quality approximation of exact topk") {
    val exact = LlmOps.qSimTopk(spark, sf001).select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = LlmOps.qSimAnn(spark, sf001).select("vec_id").collect().map(_.getLong(0)).toSet
    // recall isn't guaranteed, but the hash buckets must overlap some
    assert(ann.nonEmpty)
    assert((exact intersect ann).nonEmpty)
  }

  test("IVF ANN returns 10 valid candidates overlapping exact topk") {
    import spark.implicits._
    val ivf = LlmOps.qSimAnnIvf(spark, sf001).collect()
    assert(ivf.length == 10)
    val sims = ivf.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    val exact = LlmOps.qSimTopk(spark, sf001).select("vec_id").as[Long].collect().toSet
    val got = ivf.map(_.getAs[Long]("vec_id")).toSet
    assert((exact intersect got).nonEmpty)
  }

  test("sessionize: session boundaries respect the 30-minute gap") {
    import spark.implicits._
    val sessions = LlmOps.qEventsSessionize(spark, sf001)
    // within a user, next session starts >= 30 min after previous ends
    val bad = sessions
      .withColumn(
        "prev_end",
        lag($"session_end", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("session_id")))
      .where(
        $"prev_end".isNotNull &&
          unix_micros($"session_start") - unix_micros($"prev_end") < 1800000000L)
      .count()
    assert(bad == 0)
  }

  test("session_window batch equals hand-rolled sessionize") {
    val a = StreamingQueries
      .session(spark, sf001)
      .select("user_id", "session_start", "n_events")
    val b = LlmOps
      .qEventsSessionize(spark, sf001)
      .select(
        col("user_id"),
        col("session_start"),
        col("n_events"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("topk(k) is a prefix of topk(k+n)") {
    val t100 = Relational.qTopk(spark, sf001).collect().map(_.getLong(0))
    val t50 = Tables
      .orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
      .collect()
      .map(_.getLong(0))
    assert(t100.take(50).sameElements(t50))
  }

  test("set algebra: union = intersect + except(sym)") {
    val u = Relational.qSetUnion(spark, sf001).count()
    val i = Relational.qSetIntersect(spark, sf001).count()
    val e95 = Relational.qSetExcept(spark, sf001).count()
    val c95 = Tables
      .orders(spark, sf001)
      .where(year(col("o_orderdate")) === 1995)
      .select("o_custkey")
      .distinct()
      .count()
    assert(c95 == i + e95)
    assert(u >= c95)
  }

  test("minhash est_sim correlates with exact jaccard on flagged pairs") {
    import spark.implicits._
    val exact = LlmOps
      .qDedupNgram(spark, sf001)
      .select($"d1", $"d2", $"jaccard")
    val est = LlmOps.qDedupNear(spark, sf001).select($"d1", $"d2", $"est_sim")
    val joined = exact.join(est, Seq("d1", "d2")).collect()
    // every high-jaccard pair (>= 0.8) should be an LSH candidate
    val high = exact.where($"jaccard" >= 0.8).count()
    val found = exact.where($"jaccard" >= 0.8).join(est, Seq("d1", "d2")).count()
    assert(high == 0 || found >= (high * 0.8).toLong)
    assert(joined.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("multimodal meta: header probe is deterministic and batch-shaped") {
    val a = LlmOps.qMultimodalMeta(spark, sf001).collect()
    val b = LlmOps.qMultimodalMeta(spark, sf001).collect()
    assert(a.sameElements(b))
    // this corpus's payloads are UTF-8 text, not image containers
    assert(a.forall { r =>
      r.getAs[String]("format") == "unknown" && r.getAs[Int]("width") == -1
    })
    assert(a.forall(r => r.getAs[Long]("n_bytes") > 0))
  }

  test("multimodal frames: 1:N sampling emits every 4th block, deterministic") {
    import spark.implicits._
    val frames = LlmOps.qMultimodalFrames(spark, sf001)
    val byDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    val docs = Tables
      .documents(spark, sf001)
      .select($"doc_id", octet_length(encode($"text", "UTF-8")).as("len"))
    val joined = byDoc.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Long]("n")
      val len = r.getAs[Int]("len")
      val blocks = (len + 1023) / 1024
      val expected = (blocks + 3) / 4 // ceil(blocks / stride)
      assert(n == expected, s"doc ${r.getAs[Long]("doc_id")}: $n frames, $len bytes")
      assert(r.getAs[Int]("mx") == n - 1) // contiguous frame indices
    }
    val a = frames.collect()
    val b = LlmOps.qMultimodalFrames(spark, sf001).collect()
    assert(a.sameElements(b))
  }

  test("weighted avg UDAF matches the closed form") {
    val got = Relational
      .qUdfWavg(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val exp = Tables
      .lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(
        (sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(18,6)")).cast("double") /
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double")).as("w"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k) }
  }

  test("bag set ops: intersectAll + exceptAll partition the left multiset") {
    // per value: min(a,b) + max(a-b, 0) = a, so the two results together
    // hold exactly the left side's rows
    val a = Relational.qSetIntersectAll(spark, sf001).count() +
      Relational.qSetExceptAll(spark, sf001).count()
    val left = graft.Tables
      .orders(spark, sf001)
      .where(year(col("o_orderdate")) === 1995)
      .count()
    assert(a == left)
  }

  test("containment dominates jaccard on the same capped shingle sets") {
    val cont = LlmOps
      .qDedupContainment(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(cont.nonEmpty)
    cont.values.foreach(c => assert(c >= 0.8 && c <= 1.0))
    // containment(a->b) >= jaccard(a,b) (same numerator, smaller
    // denominator), so every high-jaccard pair must appear in BOTH
    // directions of the containment output
    LlmOps
      .qDedupNgramCapped(spark, sf001)
      .collect()
      .filter(_.getDouble(3) >= 0.8)
      .foreach { r =>
        val (d1, d2) = (r.getLong(0), r.getLong(1))
        assert(cont.contains((d1, d2)) && cont((d1, d2)) >= r.getDouble(3))
        assert(cont.contains((d2, d1)))
      }
  }

  test("fn_struct: inline fans each order into idx 1,2 and preserves fields") {
    val rows = Relational.qFnStruct(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length % 2 == 0)
    rows.grouped(2).foreach { case Array(a, b) =>
      assert(a.getLong(0) == b.getLong(0)) // same order key
      assert(a.getLong(1) == a.getLong(0)) // s.key round-trips
      assert(a.getInt(4) == 1 && b.getInt(4) == 2)
      assert(b.getString(3) == b.getString(5).toUpperCase) // prio field consistent
    }
  }

  test("null-safe join: the NULL bucket pairs up instead of vanishing") {
    val rows = Relational.qJoinNullsafe(spark, sf001).collect()
    val cust = graft.Tables.customer(spark, sf001)
    val supp = graft.Tables.supplier(spark, sf001)
    val nullA = cust.where(pmod(col("c_custkey"), lit(10)) === 7).count()
    val nullB = supp.where(pmod(col("s_suppkey"), lit(10)) === 7).count()
    assert(nullA > 0 && nullB > 0) // the data actually exercises the case
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == nullA * nullB)
    // a plain equi-join loses exactly that bucket
    val plain = cust
      .select(nullif(pmod(col("c_custkey"), lit(10)), lit(7)).as("nk"))
      .join(
        supp.select(nullif(pmod(col("s_suppkey"), lit(10)), lit(7)).as("bk")),
        col("nk") === col("bk"))
      .count()
    assert(rows.map(_.getLong(1)).sum == plain + nullA * nullB)
  }

  test("lateral top-2 per nation equals the window-rank formulation") {
    val rows = Relational.qJoinLateral(spark, sf001).collect()
    assert(rows.nonEmpty)
    val viaWindow = graft.Tables
      .customer(spark, sf001)
      .join(graft.Tables.nation(spark, sf001), col("c_nationkey") === col("n_nationkey"))
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("n_nationkey")
            .orderBy(col("c_acctbal").desc, col("c_name"))))
      .where(col("rn") <= 2)
      .select("n_name", "c_name", "c_acctbal")
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      viaWindow.map(r => (r.getString(0), r.getString(1))).toSeq)
  }

  test("unpivot emits one row per measure and round-trips the values") {
    val rows = Relational.qReshapeUnpivot(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length % 4 == 0)
    val src = graft.Tables
      .lineitem(spark, sf001)
      .where(col("l_orderkey") % 50 === 0)
    assert(rows.length == src.count() * 4)
    val first = src.orderBy("l_orderkey", "l_linenumber").head()
    val key = (first.getLong(0), first.getInt(3))
    val mine = rows
      .filter(r => (r.getLong(0), r.getInt(1)) == key)
      .map(r => r.getString(2) -> r.getDouble(3))
      .toMap
    assert(mine("l_quantity") == first.getDouble(4))
    assert(mine("l_extendedprice") == first.getDouble(5))
  }

  test("lambda battery: one doc recomputed from the raw string") {
    val rows = Relational.qFnLambda(spark, sf001).collect()
    assert(rows.length == 500)
    val text = graft.Tables
      .documents(spark, sf001)
      .where(col("doc_id") === 0L)
      .select("text")
      .head()
      .getString(0)
    val toks = text.split(" ")
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getInt(1) == toks.count(_.length > 4))
    assert(r0.getInt(2) == toks.map(_.length).sum)
    assert(r0.getBoolean(3) == toks.contains("spark"))
    assert(r0.getBoolean(4) == toks.forall(_.length <= 12))
  }

  test("variant round trip: typed extraction equals the source columns") {
    val rows = Relational.qFnVariant(spark, sf001).collect()
    assert(rows.length == 5) // one per event type
    // one uniform schema inferred for every row
    assert(rows.map(_.getString(1)).distinct.length == 1)
    val ev = graft.Tables.events(spark, sf001)
    val expect = ev
      .groupBy("event_type")
      .agg(
        sum(round(col("value") * 100).cast("long")).as("svc"),
        sum(pmod(col("user_id"), lit(5))).as("st0"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val (svc, st0) = expect(r.getString(0))
      assert(r.getLong(3) == svc, s"sum_vc for ${r.getString(0)}")
      assert(r.getLong(4) == st0, s"sum_t0 for ${r.getString(0)}")
      assert(r.getLong(5) == 0L) // try_variant_get on a missing path is NULL
    }
  }
}
