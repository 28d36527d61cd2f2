package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins the SimHash64 kernel bit-for-bit against the reference
  * formulation it replaced: explode tokens → md5-derived 64-bit hash per
  * token → 64 ±1-vote SUM aggregates → sign assembly. Any divergence in
  * tokenization, hashing (first 8 MD5 bytes, big-endian), vote math, or
  * bit assembly fails here.
  */
class SimHashSpec extends SparkSuite {

  /** Independent md5-hash64 twin: Spark builtin `md5` (hex string) → top
    * 16 hex chars parsed as an unsigned 64-bit value → signed long. Goes
    * through `java.lang.Long.parseUnsignedLong` in a UDF because `conv()`
    * returns an unsigned decimal STRING that overflows a signed cast.
    */
  private val md5h64 =
    udf((hex: String) => java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16))

  test("SimHash64 kernel equals the explode + 64-vote aggregate formulation") {
    val docs = Tables.documents(spark, sf001)
    val toksCol = filter(split(col("text"), " "), t => t =!= "")
    val tokenHashes = docs
      .select(col("doc_id"), explode(toksCol).as("tok"))
      .select(col("doc_id"), md5h64(md5(col("tok"))).as("h"))
    val votes = (0 until 64).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$i")
    }
    val assembled = (0 until 64)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val reference = tokenHashes
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val kernel = docs
      .select(col("doc_id"), SimHash64.of(col("text")).as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // docs with zero tokens have no aggregate row; kernel yields sig 0
    assert(reference.nonEmpty)
    reference.foreach { case (id, sig) => assert(kernel(id) == sig, s"doc $id") }
  }

  test("MinHash16 kernel equals the shingle-explode + 16-MIN aggregate formulation") {
    val P = 2038074743L
    // independent md5-unsigned-mod-P twin of the kernel's base hash
    val md5hmodP = udf((hex: String) =>
      java.lang.Long.remainderUnsigned(java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16), P))
    val docs = Tables.documents(spark, sf001)
    val toksCol = filter(split(col("text"), " "), t => t =!= "")
    // reference formulation: explode tokens -> window shingles -> distinct
    // -> md5-hash mod P -> 16 affine MINs (the round-1 shape)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val ex = docs
      .select(col("doc_id"), posexplode(toksCol).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .where(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      .distinct()
      .withColumn("h", md5hmodP(md5(col("sh"))))
    val minCols = (0 until 16).map { j =>
      min(pmod(col("h") * lit(1L + 37L * j) + lit(101L + 97L * j), lit(P))).as(s"mh$j")
    }
    val reference = ex
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 16).map(j => col(s"mh$j")): _*).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val kernel = docs
      .select(col("doc_id"), MinHash16.of(col("text")).as("sig"))
      .where(col("sig").isNotNull)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    assert(reference.nonEmpty)
    assert(kernel.keySet == reference.keySet)
    reference.foreach { case (id, sig) => assert(kernel(id) == sig, s"doc $id") }
  }

  test("SimHash64 token hash matches first-8-MD5-bytes on multi-byte UTF-8") {
    import spark.implicits._
    val texts = Seq("héllo wörld 中文 分词", "  spaced   out  ", "", "one")
    val df = texts.toDF("text")
    val toksCol = filter(split(col("text"), " "), t => t =!= "")
    // same tokens hashed through the kernel's byte-level path: equality of
    // the full signature on single-token rows pins the per-token hash
    val single = df
      .select(explode(toksCol).as("tok"))
      .select(col("tok"), SimHash64.of(col("tok")).as("sig"), md5h64(md5(col("tok"))).as("h"))
      .collect()
    assert(single.nonEmpty)
    single.foreach { r =>
      val sig = r.getLong(1)
      val h = r.getLong(2)
      // one token: vote(b) = ±1 directly from bit b of h ⇒ sig == h's bit pattern
      assert(sig == h, s"kernel sig $sig != md5-hash64 $h for token '${r.getString(0)}'")
      // and the builtin-independent JVM digest agrees byte-for-byte
      val bytes = r.getString(0).getBytes("UTF-8")
      assert(h == SimHash64.md5Hash64(bytes, 0, bytes.length))
    }
  }

}
