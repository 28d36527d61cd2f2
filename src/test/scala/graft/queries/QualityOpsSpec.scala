package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** QualityOps: gopher verdict consistency + a from-the-raw-string
  * recompute, temperature-sampling normalization laws, an exact local KS
  * recount, and compaction-plan closure invariants. Values are
  * oracle-hash-checked; these pin the laws.
  */
class QualityOpsSpec extends SparkSuite {
  import spark.implicits._

  test("q_dq_freshness: lags and trailing-day counts recompute from raw timestamps") {
    val rows = QualityOps.qDqFreshness(spark, sf001).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables
      .events(spark, sf001)
      .select(col("event_type"), unix_micros(col("ts")))
      .as[(String, Long)]
      .collect()
    val hwm = ev.map(_._2).max
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq == byType.keySet.toSeq.sorted)
    rows.foreach { r =>
      val g = byType(r.getString(0)).map(_._2)
      assert(r.getLong(1) == g.length.toLong)
      val last = g.max
      assert(r.getLong(3) == (hwm - last) / 1000000L)
      assert(r.getLong(3) >= 0L)
      assert(r.getLong(4) == g.count(_ >= hwm - 86400000000L).toLong)
    }
    // at least one stream IS the high-water mark (lag 0)
    assert(rows.exists(_.getLong(3) == 0L))
  }

  test("q_text_readability: FK chain recomputes from raw strings via java regex") {
    val rows = QualityOps.qTextReadability(spark, sf001).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables
      .documents(spark, sf001)
      .select(col("lang"), col("text"))
      .as[(String, String)]
      .collect()
    val byLang = docs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq == byLang.keySet.toSeq.sorted)
    rows.foreach { r =>
      val m = byLang(r.getString(0)).map { case (_, t) =>
        val w = t.split(" ", -1).count(_.nonEmpty).toDouble
        val syl = "[aeiou]+".r.findAllIn(t.toLowerCase).size.toDouble
        val s = math.max(1, "[.!?]+".r.findAllIn(t).size).toDouble
        (w, syl, s)
      }.filter(_._1 > 0)
      assert(r.getLong(1) == m.length.toLong)
      val fks = m.map { case (w, syl, s) => 0.39 * (w / s) + 11.8 * (syl / w) - 15.59 }
      val avgFk = m.map { case (w, syl, s) =>
        BigDecimal.decimal(0.39 * (w / s) + 11.8 * (syl / w) - 15.59)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / m.length
      assert(math.abs(r.getDouble(4) - avgFk) < 1e-9)
      assert(r.getDouble(5) == fks.min && r.getDouble(6) == fks.max)
    }
  }

  test("q_stats_mannwhitney: U and z recompute from brute-force pair counting") {
    val rows = QualityOps.qStatsMannWhitney(spark, sf001).collect()
    val ev = graft.Tables
      .events(spark, sf001)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
      .collect()
    val byType = ev.groupBy(_._1).map { case (k, g) => k -> g.map(_._2) }
    val types = byType.keySet.toSeq.sorted
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val (a, b) = (byType(r.getString(0)), byType(r.getString(1)))
      assert(r.getLong(2) == a.length.toLong && r.getLong(3) == b.length.toLong)
      // exact 2U by quadratic pair counting (the definition, not the
      // engine's distinct-value factorization)
      var u2 = 0L
      for (x <- a; y <- b) { if (y < x) u2 += 2 else if (y == x) u2 += 1 }
      assert(r.getDouble(4) == u2.toDouble / 2.0)
      val ties3 =
        (a ++ b).groupBy(identity).map { case (_, g) => val t = g.length.toLong; t * t * t - t }.sum
      val na = a.length.toDouble
      val nb = b.length.toDouble
      val n = na + nb
      val varU = na * nb / 12.0 * ((n + 1.0) - ties3.toDouble / (n * (n - 1.0)))
      if (varU > 0.0) {
        val z = (u2.toDouble / 2.0 - na * nb / 2.0) / math.sqrt(varU)
        assert(math.abs(r.getDouble(5) - z) < 1e-9)
      } else assert(r.isNullAt(5))
    }
    // anti-vacuity: the fixture's 2-decimal values DO collide (48 dup
    // rows at sf0.001), so the tie-correction path is genuinely exercised
    assert(byType.values.flatten.toSeq.groupBy(identity).exists(_._2.length > 1))
  }

  test("m2Checked: decimal overflow past the ~1e38 contract raises loudly, in-band passes") {
    // in-band: exact small values flow through unchanged
    val ok = Seq(1)
      .toDF("x")
      .select(
        QualityOps
          .m2Checked(
            lit(3L),
            lit(new java.math.BigDecimal(60)).cast("decimal(38,0)"),
            lit(new java.math.BigDecimal(1400)).cast("decimal(38,0)"))
          .as("m2"))
      .head()
    assert(ok.getDecimal(0).longValueExact() == 3L * 1400 - 60L * 60) // n·Σw² − (Σw)²
    // past the band: n·Σw² ≈ 1e40 overflows decimal(38,0) — the Spark
    // side must RAISE like the oracle's HUGEINT, not emit NULL stats.
    // Under ANSI (the Spark 4 default) the multiply itself raises
    // NUMERIC_VALUE_OUT_OF_RANGE; under ansi=false (where the r13
    // ADVICE's silent-NULL divergence lived) the m2Checked guard fires.
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    def overflow(): Seq[String] = {
      val big = new java.math.BigDecimal("9" * 38)
      val e = intercept[Exception] {
        Seq(1)
          .toDF("x")
          .select(QualityOps
            .m2Checked(lit(100L), lit(java.math.BigDecimal.ZERO), lit(big).cast("decimal(38,0)")))
          .collect()
      }
      messages(e)
    }
    val ansiMsgs = overflow()
    assert(ansiMsgs.exists(_.contains("NUMERIC_VALUE_OUT_OF_RANGE")), ansiMsgs.mkString(" | "))
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val nullMsgs = overflow()
      assert(
        nullMsgs.exists(_.contains("magnitude contract exceeded")),
        nullMsgs.mkString(" | "))
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("rankMatrix: two-phase prefix sum equals the per-type running count (high-D)") {
    // r14 ask #2: the strictly-less running count is assembled from
    // range-partitioned slice cumsums + broadcast offsets; prefix sums
    // are partition-invariant, so it must equal the naive per-type
    // exclusive prefix sum EXACTLY, cell for cell
    val m = QualityOps
      .rankMatrix(spark, sf001)
      .collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val types = m.map(_._2).distinct.sorted
    val vs = m.map(_._1).distinct
    // anti-vacuity: the continuous value column IS high-D — many more
    // distinct values than shuffle partitions, so the range exchange
    // genuinely splits each type's run across slices
    assert(vs.length > 64, s"fixture too narrow: D = ${vs.length}")
    assert(m.length == vs.length * types.length) // dense, zero-filled
    types.foreach { t =>
      var run = 0L
      m.filter(_._2 == t).sortBy(_._1).foreach { case (_, _, cnt, lt) =>
        assert(lt == run, s"type $t: lt $lt vs expected $run")
        run += cnt
      }
    }
  }

  test("q_stats_kruskal: H recomputes from locally computed average ranks") {
    val r = QualityOps.qStatsKruskal(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    val ev = graft.Tables
      .events(spark, sf001)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
      .collect()
    val n = ev.length
    assert(row.getLong(0) == n.toLong)
    // classic average ranks over the pooled sample
    val sorted = ev.map(_._2).sorted
    val rankOf = sorted.zipWithIndex
      .groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.length }
    val byType = ev.groupBy(_._1)
    assert(row.getLong(1) == byType.size.toLong)
    val hUnc = 12.0 / (n.toDouble * (n + 1)) * byType.values.map { g =>
      val rbar = g.map(e => rankOf(e._2)).sum / g.length
      g.length * math.pow(rbar - (n + 1) / 2.0, 2)
    }.sum
    val ties3 = sorted.groupBy(identity).map { case (_, g) => val t = g.length.toLong; t * t * t - t }.sum
    val corr = 1.0 - ties3.toDouble / (n.toDouble * n * n - n)
    assert(math.abs(row.getDouble(3) - corr) < 1e-12)
    assert(math.abs(row.getDouble(2) - hUnc / corr) < 1e-6)
  }

  test("q_stats_chi2: statistic recomputes exactly from a local contingency table") {
    val r = QualityOps.qStatsChi2(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    // local recompute from the raw events
    val cells = graft.Tables
      .events(spark, sf001)
      .where(col("value").isNotNull)
      .select(
        col("event_type"),
        least(floor(col("value") / 50.0), lit(5.0)).cast("int").as("vb"))
      .as[(String, Int)]
      .collect()
      .groupBy(identity)
      .map { case (k, g) => (k, g.length.toLong) }
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (k, g) => k -> g.values.sum }
    val chi2 = cells.map { case ((et, vb), o) =>
      val e = (rt(et) * ct(vb)).toDouble / n
      val d = o.toDouble - e
      BigDecimal.decimal(d * d / e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == cells.size.toLong)
    assert(row.getLong(2) == (rt.size - 1).toLong * (ct.size - 1))
    assert(row.getDouble(3) == chi2)
    val v = math.sqrt(chi2 / (n * math.min(rt.size - 1, ct.size - 1)).toDouble)
    assert(row.getDouble(4) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_dq_completeness: crafted nulls are counted; laws hold on the fixture") {
    // real fixture: 6 columns, each row's laws hold
    val rows = QualityOps.qDqCompleteness(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    rows.foreach { r =>
      val (n, nn, nd, comp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nn >= 0 && nd <= n - nn)
      assert(comp == (n - nn).toDouble / n)
    }
    // crafted fixture: 2 null values + 1 null props in 5 rows, 3 distinct users
    val dir = java.nio.file.Files.createTempDirectory("graft_dqc").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, t0, 10L, "view", Some(1.0), Some("{}")),
      (2L, t0, 10L, "click", None, Some("{}")),
      (3L, t0, 11L, "view", None, None),
      (4L, t0, 12L, "view", Some(2.0), Some("{}")),
      (5L, t0, 12L, "purchase", Some(2.0), Some("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = QualityOps
      .qDqCompleteness(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got("value") == ((5L, 2L, 2L, 0.6))) // 2 nulls, distinct {1.0, 2.0}
    assert(got("props") == ((5L, 1L, 1L, 0.8)))
    assert(got("user_id") == ((5L, 0L, 3L, 1.0)))
    assert(got("ts") == ((5L, 0L, 1L, 1.0)))
  }

  test("q_stats_mutual_info: equals a local contingency recompute; information laws hold") {
    val rows = QualityOps.qStatsMutualInfo(spark, sf001).collect()
    assert(rows.length == 1)
    val r = rows.head
    // local recompute with the same integer-ln micro quantization
    val cells = graft.Tables
      .customer(spark, sf001)
      .join(
        graft.Tables.nation(spark, sf001),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_mktsegment", "n_name")
      .count()
      .as[(String, String, Long)]
      .collect()
    def lnq(x: Long): Long =
      BigDecimal(math.log(x.toDouble) * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val n = cells.map(_._3).sum
    val ni = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val nj = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val miMicro = cells.map { case (s, t, c) =>
      c * (lnq(n * c) - lnq(ni(s)) - lnq(nj(t)))
    }.sum
    val hSeg = (n * lnq(n) - ni.values.map(v => v * lnq(v)).sum).toDouble / n / 1e6
    val hNat = (n * lnq(n) - nj.values.map(v => v * lnq(v)).sum).toDouble / n / 1e6
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == miMicro.toDouble / n / 1e6)
    assert(r.getDouble(2) == hSeg)
    assert(r.getDouble(3) == hNat)
    assert(r.getDouble(4) == r.getDouble(1) / math.sqrt(hSeg * hNat))
    // information laws: 0 <= MI <= min(H); NMI in [0, 1] (up to the 1e-6
    // ln grid, whose per-cell error can push MI a hair below zero on
    // near-independent columns — allow the grid's slack)
    val slack = 1e-4
    assert(r.getDouble(1) >= -slack)
    assert(r.getDouble(1) <= math.min(hSeg, hNat) + slack)
    assert(r.getDouble(4) <= 1.0 + slack)
  }

  test("q_text_gopher: verdict is the AND of its rules; one doc recomputed raw") {
    val rows = QualityOps.qTextGopher(spark, sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getBoolean(9) ==
        (r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8)))
    }
    // recompute doc 0's profile directly from the string
    val text = graft.Tables
      .documents(spark, sf001)
      .where(col("doc_id") === 0L)
      .select("text")
      .as[String]
      .head()
    val toks = text.split(" ").filter(_.nonEmpty)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getInt(1) == toks.length)
    val mw = BigDecimal((text.length - (toks.length - 1)).toDouble / toks.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(r0.getDouble(2) == mw)
    val stops = Set("the", "a", "of", "and", "to", "in", "is")
    assert(r0.getInt(3) == toks.count(stops))
  }

  test("q_mix_temperature: shares normalize, tails boost up, head damps down") {
    val rows = QualityOps.qMixTemperature(spark, sf001).collect()
    assert(rows.length == 5) // five languages in the corpus
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 5e-6 * rows.length) // per-row 1e-6 rounding
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    val en = byLang("en")
    assert(en.getDouble(4) < 1.0, "head language must be damped")
    rows.filter(_.getString(0) != "en").foreach { r =>
      assert(r.getDouble(4) > 1.0, s"tail ${r.getString(0)} must be boosted")
    }
    // α = 0.7 flattens but must preserve the count ordering
    val ordered = rows.sortBy(-_.getLong(1)).map(_.getDouble(3))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
  }

  test("q_dq_benford: shares recompute exactly; always 9 digit rows") {
    val rows = QualityOps.qDqBenford(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    // recompute from first principles: first digit of the cents integer
    val digits = graft.Tables
      .orders(spark, sf001)
      .select(org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(0) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong
        cents.toString.head.asDigit
      }
    val total = digits.length.toLong
    val byDigit = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (d, nObs, share, benford, delta) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nObs == byDigit.getOrElse(d, 0L))
      assert(share == math.round(nObs * 1e6 / total))
      assert(delta == share - benford)
      assert(benford == math.round(math.log10(1.0 + 1.0 / d) * 1e6))
    }
    // Benford constants are a probability distribution on the ppm grid
    assert(math.abs(rows.map(_.getLong(3)).sum - 1000000L) <= 5)
  }

  test("q_dq_ks: statistic equals an exact local recount") {
    val row = QualityOps.qDqKs(spark, sf001).collect().head
    val (n1, n2) = (row.getLong(0), row.getLong(1))
    val vals = graft.Tables
      .events(spark, sf001)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type") === "click", floor(col("value") * 1000).cast("long"))
      .as[(Boolean, Long)]
      .collect()
    assert(n1 == vals.count(_._1) && n2 == vals.count(!_._1))
    val buckets = vals.groupBy(_._2).toSeq.sortBy(_._1)
    var (f1, f2) = (0L, 0L)
    var dNum = 0L
    buckets.foreach { case (_, vs) =>
      f1 += vs.count(_._1)
      f2 += vs.count(!_._1)
      dNum = math.max(dNum, math.abs(f1 * n2 - f2 * n1))
    }
    val d = BigDecimal(dNum.toDouble / (n1 * n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(row.getDouble(3) == d)
    assert(row.getLong(2) == buckets.length)
  }

  test("q_curation_scorecard: closes over the corpus and re-derives from the signals") {
    val rows = QualityOps.qCurationScorecard(spark, sf001).collect()
    assert(rows.map(_.getLong(1)).sum == 500) // every doc lands in one source row
    val gopher = QualityOps
      .qTextGopher(spark, sf001)
      .select("doc_id", "gopher_pass")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    val srcOf = graft.Tables
      .documents(spark, sf001)
      .select("doc_id", "source")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val passBySrc =
      gopher.groupBy { case (id, _) => srcOf(id) }.map { case (s, m) =>
        s -> m.count(_._2).toLong
      }
    rows.foreach { r =>
      assert(r.getLong(2) == passBySrc(r.getString(0)), s"source ${r.getString(0)}")
      val rate = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(r.getDouble(4) == rate)
    }
  }

  test("q_mix_epochs: copies re-derive per doc; boosts damp head, lift tails") {
    val rows = QualityOps.qMixEpochs(spark, sf001).collect()
    assert(rows.length == 5)
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    // the head language is damped below one epoch, tails above
    assert(byLang("en").getLong(2) < 1000000L, "en boost_ppm < 1")
    rows.filter(_.getString(0) != "en").foreach { r =>
      assert(r.getLong(2) > 1000000L, s"tail ${r.getString(0)} boost_ppm > 1")
    }
    // recompute each lang's copy totals from the docs + the md5 rule
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def uPpm(text: String): Long = {
      val h = md5.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 1000000L
    }
    val docs = graft.Tables
      .documents(spark, sf001)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)]
      .collect()
    rows.foreach { r =>
      val (lang, boost) = (r.getString(0), r.getLong(2))
      val copies = docs.collect {
        case (_, l, text) if l == lang =>
          boost / 1000000L + (if (uPpm(text) < boost % 1000000L) 1L else 0L)
      }
      assert(r.getLong(1) == copies.length, s"$lang n_docs")
      assert(r.getLong(3) == copies.count(_ > 0), s"$lang n_docs_kept")
      assert(r.getLong(4) == copies.sum, s"$lang n_copies")
      val eff = BigDecimal(copies.sum.toDouble / copies.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(r.getDouble(5) == eff, s"$lang eff_epochs")
    }
  }

  test("q_curation_dsir: top-20 equals a full local DSIR recompute") {
    val rows = QualityOps.qCurationDsir(spark, sf001).collect()
    assert(rows.length == 20)
    // exact local replay: hashed-unigram LLR model (B=64 buckets, add-1
    // smoothing) trained on the collected corpus, then per-doc mean LLR
    val docs = graft.Tables
      .documents(spark, sf001)
      .select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)]
      .collect()
    val B = 64
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): Long = {
      val h = md5.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % B
    }
    val toks = docs.flatMap { case (id, src, lang, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, src, lang, bucket(t)))
    }
    val nR = toks.length.toLong
    val nT = toks.count(_._3 == "en").toLong
    val cR = toks.groupBy(_._4).map { case (b, v) => b -> v.length.toLong }
    val cT =
      toks.filter(_._3 == "en").groupBy(_._4).map { case (b, v) => b -> v.length.toLong }
    val llrFp = cR.map { case (b, cr) =>
      val ct = cT.getOrElse(b, 0L)
      b -> BigDecimal(
        (math.log((ct + 1).toDouble / (nT + B)) -
          math.log((cr + 1).toDouble / (nR + B))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    }
    val wantAll = toks
      .groupBy(t => (t._1, t._2, t._3))
      .map { case ((id, src, lang), v) =>
        val n = v.length.toLong
        val s = v.map(t => llrFp(t._4)).sum
        val avg = BigDecimal(s.toDouble / n / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        (id, src, lang, n, avg)
      }
      .toSeq
      .sortBy { case (id, _, _, _, avg) => (-avg, id) }
    val got = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == wantAll.take(20))
    // directional law: the importance weight must favor the target domain
    // on average (64 hash buckets blur per-doc separation, so assert the
    // corpus-wide mean, not top-20 membership)
    val (enScores, otherScores) = wantAll.partition(_._3 == "en")
    val meanEn = enScores.map(_._5).sum / enScores.length
    val meanOther = otherScores.map(_._5).sum / otherScores.length
    assert(meanEn > meanOther, s"mean LLR en=$meanEn must exceed non-en=$meanOther")
  }

  test("q_layout_compaction: plan closes over all bytes; no group starts past budget") {
    val rows = QualityOps.qLayoutCompaction(spark, sf001).collect()
    assert(rows.nonEmpty)
    val planned = rows.map(_.getLong(3)).sum
    val total = graft.Tables
      .documents(spark, sf001)
      .agg(sum("n_chars"))
      .as[Long]
      .head()
    assert(planned == total) // every byte lands in exactly one group
    // every source's plan starts at bin 0 (first file's offset is 0)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).min == 0L)
    }
  }

  test("q_dq_outlier_mad: one nation's median/MAD/outliers recomputed locally") {
    val rows = QualityOps.qDqOutlierMad(spark, sf001).collect()
    assert(rows.nonEmpty)
    val nk = rows.head.getInt(0)
    val cents = graft.Tables
      .customer(spark, sf001)
      .where(col("c_nationkey") === nk)
      .select(round(col("c_acctbal") * 100).cast("long"))
      .as[Long]
      .collect()
      .sorted
    val n = cents.length
    val med = cents((n + 1) / 2 - 1) // lower median, 1-based pick
    val ads = cents.map(x => math.abs(x - med)).sorted
    val mad = ads((n + 1) / 2 - 1)
    val nOut = ads.count(_ > 3 * mad)
    val r0 = rows.head
    assert(r0.getLong(1) == n.toLong)
    assert(r0.getDouble(2) == med.toDouble / 100)
    assert(r0.getDouble(3) == mad.toDouble / 100)
    assert(r0.getLong(4) == nOut.toLong)
    // outliers never exceed the group (tiny sf0.001 nations CAN be
    // mostly "outliers" when 3·MAD is narrow — no minority law here)
    rows.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(1)))
  }

  test("q_dq_referential: five relations; counts close; events edge recomputed") {
    val rows = QualityOps.qDqReferential(spark, sf001).collect()
    assert(rows.length == 5)
    val names = rows.map(_.getString(0))
    assert(names.sameElements(names.sorted))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1)) // orphan_rows ≤ child_rows
      assert(r.getLong(3) <= r.getLong(2)) // distinct keys ≤ orphan rows
    }
    // star-schema edges are FK-consistent in the fixture
    rows.filter(_.getString(0).startsWith("lineitem")).foreach(r => assert(r.getLong(2) == 0L))
    // the events identity edge recomputed locally
    val custKeys = graft.Tables.customer(spark, sf001)
      .select("c_custkey").as[Long].collect().toSet
    val evUsers = graft.Tables.events(spark, sf001)
      .where(col("user_id").isNotNull).select("user_id").as[Long].collect()
    val evRow = rows.find(_.getString(0) == "events.user_id->customer").get
    assert(evRow.getLong(1) == evUsers.length.toLong)
    assert(evRow.getLong(2) == evUsers.count(u => !custKeys.contains(u)).toLong)
    assert(evRow.getLong(3) == evUsers.filter(u => !custKeys.contains(u)).distinct.length.toLong)
  }
}
