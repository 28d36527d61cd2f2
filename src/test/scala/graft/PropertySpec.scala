package graft

import graft.tile.{Tile, TileConfig}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based suites (SURVEY.md §5.4), generators from scalacheck.
  *
  * The scalatest↔scalacheck bridge artifact isn't available offline, so
  * generators are driven directly with fixed seeds (fully deterministic —
  * a CI failure is reproducible by seed). Each property evaluates the
  * PRODUCTION column algebra over one generated DataFrame of many cases
  * (not one tiny Spark job per case — a forAll of single-row jobs would be
  * hundreds of times slower for the same coverage).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val cfg = TileConfig()

  private val tileCase = for {
    level <- Gen.choose(1, 20)
    row <- Gen.choose(-64, 1 << math.min(level, 20))
    col <- Gen.choose(-64, 1 << math.min(level, 20))
  } yield (level, row, col)

  test("property: tile -> bbox -> containing tile round-trips (incl. negative indices)") {
    (1L to 5L).foreach { seed =>
      val df = sample(Gen.listOfN(200, tileCase), seed).toDF("level", "row", "col")
      val bbox = Tile.tileBBox(cfg, $"level", $"row", $"col")
      // the floor-based inverse of the bbox math must recover the tile
      // from its center point at every index, negative included (the
      // reference's trunc-toward-zero is only valid on-world — that
      // divergence is pinned by TileSpec's trunc test)
      val ts = Tile.tileSize(cfg, $"level")
      val cx = (bbox(0) + bbox(2)) / 2
      val cy = (bbox(1) + bbox(3)) / 2
      val bad = df
        .select(
          $"row",
          $"col",
          floor((lit(cfg.webMercatorDelta) - cy) / ts).cast("int").as("row2"),
          floor((cx + lit(cfg.webMercatorDelta)) / ts).cast("int").as("col2"))
        .where($"row" =!= $"row2" || $"col" =!= $"col2")
        .count()
      assert(bad == 0, s"seed $seed")
    }
  }

  test("property: bbox edges are exact neighbors' edges and enclose positive area") {
    (11L to 15L).foreach { seed =>
      val df = sample(Gen.listOfN(200, tileCase), seed).toDF("level", "row", "col")
      val b = Tile.tileBBox(cfg, $"level", $"row", $"col")
      val right = Tile.tileBBox(cfg, $"level", $"row", $"col" + 1)
      val below = Tile.tileBBox(cfg, $"level", $"row" + 1, $"col")
      val bad = df
        .where(
          b(0) >= b(2) || b(1) >= b(3) || // degenerate area
            b(2) =!= right(0) || // right neighbor shares the east edge
            b(1) =!= below(3)) // lower neighbor shares the south edge
        .count()
      assert(bad == 0, s"seed $seed")
    }
  }

  test("property: topk(k) is a prefix of topk(k+n)") {
    val base = Tables
      .orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val top = base.limit(120).collect().map(_.getLong(0))
    (21L to 25L).foreach { seed =>
      val (k, n) = sample(Gen.zip(Gen.choose(1, 100), Gen.choose(1, 20)), seed)
      val tk = base.limit(k).collect().map(_.getLong(0))
      val tkn = base.limit(k + n).collect().map(_.getLong(0))
      assert(tkn.take(k).sameElements(tk), s"seed $seed k=$k n=$n")
      assert(top.take(k).sameElements(tk), s"seed $seed k=$k")
    }
  }

  test("property: union/intersect/except algebra on generated key sets") {
    // |A ∪ B| = |A| + |B| − |A ∩ B|  and  A = (A ∩ B) ⊎ (A \ B),
    // evaluated through the PRODUCTION set operators (DISTINCT semantics)
    val keyGen = Gen.listOfN(150, Gen.choose(0L, 60L))
    (41L to 43L).foreach { seed =>
      val as = sample(keyGen, seed)
      val bs = sample(keyGen, seed + 100)
      val a = as.toDF("k").distinct()
      val b = bs.toDF("k").distinct()
      val union = a.union(b).distinct().count()
      val inter = a.intersect(b).count()
      val diff = a.except(b).count()
      assert(union == a.count() + b.count() - inter, s"seed $seed")
      assert(a.count() == inter + diff, s"seed $seed")
      assert(a.except(b).intersect(b).count() == 0, s"seed $seed")
    }
  }

  test("property: tsIdKey orders exactly like (ts, id) on random timestamp collisions (r12)") {
    // the M4 first/last contract rests on this key being an ORDER
    // ISOMORPHISM of (ts, id); generate rows with heavy deliberate ts
    // collisions so the id tiebreak is exercised, then compare the
    // min_by/max_by picks against an explicit (ts, id) struct ordering
    (21L to 25L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 400).map { i =>
        // ~8 distinct timestamps -> dozens of collisions per ts
        val tsMicros = 1700000000000000L + rnd.nextInt(8) * 60000000L
        (i.toLong, new java.sql.Timestamp(tsMicros / 1000), rnd.nextDouble())
      }
      val df = rows.toDF("event_id", "ts", "value").withColumn("g", lit(1))
      val viaKey = df
        .withColumn("tk", Tables.tsIdKey($"ts", $"event_id"))
        .groupBy($"g")
        .agg(
          min_by($"value", $"tk").as("v_first"),
          max_by($"value", $"tk").as("v_last"))
        .select("v_first", "v_last")
        .head()
      val byStruct = df
        .groupBy($"g")
        .agg(
          min(struct($"ts", $"event_id", $"value")).getField("value").as("v_first"),
          max(struct($"ts", $"event_id", $"value")).getField("value").as("v_last"))
        .select("v_first", "v_last")
        .head()
      assert(viaKey == byStruct, s"seed $seed")
    }
  }

  test("property: exact dedup is idempotent") {
    val corpus = Gen.listOfN(
      120,
      Gen.oneOf(
        Gen.oneOf("alpha beta", "gamma delta", "epsilon zeta"), // heavy dups
        Gen.alphaNumStr.map(s => s"doc $s")))
    (31L to 33L).foreach { seed =>
      val texts = sample(corpus, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = graft.queries.LlmOps.dedupExactCore(docs)
      // re-deduping the kept representatives must be a fixpoint: every
      // group collapses to itself (n_dups == 1, same keep set)
      val kept = docs.join(once.select($"keep_id".as("doc_id")), "doc_id")
      val twice = graft.queries.LlmOps.dedupExactCore(kept)
      assert(twice.where($"n_dups" =!= 1).count() == 0, s"seed $seed")
      assert(
        twice.select("keep_id").collect().map(_.getLong(0)).toSet ==
          once.select("keep_id").collect().map(_.getLong(0)).toSet,
        s"seed $seed")
    }
  }

  test("property: token entropy matches a direct computation on random docs") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff", "gg")
    val doc = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    (1L to 3L).foreach { seed =>
      val docs = sample(Gen.listOfN(80, doc), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      // direct computation under the SAME quantization contract
      def entropyOf(text: String): Double = {
        val toks = text.split(" ").filter(_.nonEmpty)
        val n = toks.length.toDouble
        val s = toks.groupBy(identity).values
          .map(g => g.length.toLong * math.round(math.log(g.length.toDouble) * 1e6))
          .sum
        val hN = math.round(math.log(n) * 1e6).toDouble
        BigDecimal((hN - s.toDouble / n) / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ent$seed")
      try {
        docs.toDF("doc_id", "text")
          .withColumn("lang", lit("en"))
          .withColumn("source", lit("src0"))
          .withColumn("n_chars", length($"text").cast("long"))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = graft.queries.LlmOps
          .qTextEntropy(spark, dir.toString)
          .collect()
          .map(r => r.getLong(0) -> r.getDouble(3))
          .toMap
        docs.foreach { case (id, text) =>
          assert(math.abs(got(id) - entropyOf(text)) < 1e-9, s"seed $seed doc $id: '$text'")
        }
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("property: media probes are total on arbitrary bytes (fuzz, no throw)") {
    // the probes run against UNTRUSTED cache bytes at scale — they must
    // classify or return unknown, never throw or hang, whatever the input
    import graft.operators.{AudioProbe, MediaProbe, VideoProbe}
    val rng = new scala.util.Random(424242L)
    def corrupt(b: Array[Byte], n: Int): Array[Byte] = {
      val c = b.clone()
      (1 to n).foreach { _ =>
        c(rng.nextInt(c.length)) = rng.nextInt(256).toByte
      }
      c
    }
    (1 to 200).foreach { i =>
      // pure noise of random length
      val noise = new Array[Byte](rng.nextInt(256))
      rng.nextBytes(noise)
      MediaProbe.probe(noise)
      AudioProbe.probe(noise)
      VideoProbe.probe(noise)
      // corrupted valid containers (signatures survive often enough to
      // reach the parsing walks)
      val wav = AudioProbe.wavHeader(2, 44100, 16, 1000L + i)
      AudioProbe.probe(corrupt(wav, 1 + rng.nextInt(4)))
      val mp4 = VideoProbe.mp4Header("isom", 1000, 5000L, 640, 360)
      VideoProbe.probe(corrupt(mp4, 1 + rng.nextInt(4)))
      val bmp = graft.operators.ImageCodec.bmp8x8(i.toLong)
      MediaProbe.probe(corrupt(bmp, 1 + rng.nextInt(4)))
      // truncations at arbitrary points
      val cut = rng.nextInt(wav.length)
      AudioProbe.probe(java.util.Arrays.copyOf(wav, cut))
      VideoProbe.probe(java.util.Arrays.copyOf(mp4, rng.nextInt(mp4.length)))
    }
  }

  test("property: PNG decode under random single-byte corruption fails loudly or flags CRC") {
    // a corrupted compressed payload must never hang, loop, or silently
    // return crc_ok — the three acceptable outcomes are: a thrown
    // IllegalArgument/requirement failure, a zlib DataFormatException,
    // or a decode with crcOk == false
    val rng = new scala.util.Random(20260813L)
    (1 to 300).foreach { _ =>
      val id = rng.nextInt(10000).toLong
      val bytes = graft.operators.PngCodec.png8x8(id)
      val pos = 8 + rng.nextInt(bytes.length - 8) // keep the signature intact
      val flip = (1 + rng.nextInt(255)).toByte
      val tampered = bytes.clone()
      tampered(pos) = (tampered(pos) ^ flip).toByte
      try {
        val png = graft.operators.PngCodec.decode(tampered)
        assert(
          !png.crcOk || java.util.Arrays.equals(tampered, bytes),
          s"silent success on corrupt byte at $pos of doc $id")
      } catch {
        case _: IllegalArgumentException => () // require() / unsupported filter
        case _: java.util.zip.DataFormatException => ()
        case e: RuntimeException
            if e.getCause.isInstanceOf[java.util.zip.DataFormatException] =>
          ()
      }
    }
  }
}
