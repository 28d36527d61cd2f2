package graft

import graft.operators.{ImageCodec, MediaProbe}

/** ImageCodec: BMP well-formedness (via the independent MediaProbe header
  * parser), decode round-trip against the synthesis formula, the
  * single-bit flip law, and pigeonhole completeness of the phash pair
  * query against brute force.
  */
class ImageCodecSpec extends SparkSuite {

  test("synthesized BMPs parse as 8x8 BMPs by the independent header probe") {
    (0L to 20L).foreach { id =>
      val p = MediaProbe.probe(ImageCodec.bmp8x8(id))
      assert(p == MediaProbe.Probe("bmp", 8, 8))
    }
  }

  test("decode + aHash equals the hash computed directly from the formula") {
    (0L to 200L).foreach { id =>
      val lums = (0 until 64).map(ImageCodec.lum(id, _))
      val mean = lums.map(_.toLong).sum / 64
      val direct = lums.zipWithIndex.foldLeft(0L) { case (h, (l, i)) =>
        if (l > mean) h | (1L << i) else h
      }
      assert(ImageCodec.aHash(ImageCodec.bmp8x8(id)) == direct, s"doc $id")
    }
  }

  test("the flip rule moves exactly one hash bit within a scene") {
    // docs 97 (no flip: 97 % 3 = 1) and 291 (flip: 291 % 3 = 0) share
    // scene 0 (both ≡ 0 mod 97)
    val unflipped = ImageCodec.aHash(ImageCodec.bmp8x8(97L))
    val flipped = ImageCodec.aHash(ImageCodec.bmp8x8(291L))
    assert(java.lang.Long.bitCount(unflipped ^ flipped) == 1)
  }

  test("q_multimodal_phash pairs equal brute-force hamming <= 3 at sf0.001") {
    val got = graft.queries.LlmOps
      .qMultimodalPhash(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val ids = Tables.documents(spark, sf001).select("doc_id").collect().map(_.getLong(0))
    val hashes = ids.map(id => id -> ImageCodec.aHash(ImageCodec.bmp8x8(id))).toMap
    val brute = (for {
      a <- ids; b <- ids if a < b
      hd = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the scene construction actually produces pairs
  }
}
