package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen'd text profile: every per-document metric the text
  * battery needs (`q_text_stats` / `q_text_quality` / `q_text_langid` /
  * `q_text_tokens`), computed by a single static, monomorphic Scala
  * method and returned as a struct.
  *
  * Why not the `filter`/`transform`/`aggregate` higher-order functions the
  * round-1 versions used: HOFs always run on the interpreted expression
  * path, whose shared eval loops (`HigherOrderFunction.eval` etc.) are hot
  * across EVERY interpreted query in the process. Once enough distinct
  * expression classes have flowed through them, the JIT's inline caches go
  * megamorphic, the compiled loops deopt, and every interpreted query runs
  * 25-100× slower for the remaining life of the JVM (measured: the same
  * `q_text_quality` plan 1.5 s early in a bench run vs 113 s late, CPU
  * time ≈ wall time, zero GC). A static helper called from generated code
  * keeps the hot loop in one statically-dispatched method the JIT owns —
  * the same cure `ScaledDot` applied to the HOF dot product.
  *
  * Token semantics match the battery's `toks` helper exactly: split on the
  * single space character, drop empties. Length/char metrics count Unicode
  * code points (Spark `length` / DuckDB `length` semantics); the "BPE-ish"
  * count replays the regex `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` with Java
  * `\s` = `[ \t\n\x0B\f\r]`.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "text_profile"

  override def nullSafeEval(input: Any): Any =
    TextProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextProfile.Mod}.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  val schema: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_zh", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))

  private val Stop = mkSet("the", "a", "of", "and", "to", "in", "is")
  private val En = mkSet("the", "and", "of", "to", "is")
  private val De = mkSet("der", "und", "die", "das", "ist")
  private val Fr = mkSet("le", "la", "et", "les", "est")
  private val Es = mkSet("el", "los", "y", "es", "las")

  private def mkSet(w: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    w.foreach(s.add)
    s
  }

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    var len = 0
    var nPunct = 0
    var sZh = 0
    var nTok = 0
    var sumTokLen = 0
    var nStop = 0
    var sEn = 0
    var sDe = 0
    var sFr = 0
    var sEs = 0
    val distinct = new java.util.HashSet[String]()

    // char-level pass: code-point length, punctuation, CJK
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      val cp = s.codePointAt(i)
      len += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) sZh += 1
      if (ch == '.' || ch == '!' || ch == '?' || ch == ',' || ch == ';' || ch == ':') nPunct += 1
      i += Character.charCount(cp)
    }

    // token pass
    val it = tokens(s).iterator
    while (it.hasNext) {
      val t = it.next()
      nTok += 1
      sumTokLen += t.codePointCount(0, t.length)
      distinct.add(t)
      if (Stop.contains(t)) nStop += 1
      if (En.contains(t)) sEn += 1
      if (De.contains(t)) sDe += 1
      if (Fr.contains(t)) sFr += 1
      if (Es.contains(t)) sEs += 1
    }

    // BPE-ish scan: [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s], Java \s (ASCII)
    var nBpe = 0
    i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')) {
        nBpe += 1
        while (i < n && { val c = s.charAt(i); (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') }) i += 1
      } else if (ch >= '0' && ch <= '9') {
        nBpe += 1
        while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
      } else if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r') {
        i += 1
      } else {
        nBpe += 1
        i += Character.charCount(s.codePointAt(i))
      }
    }

    new GenericInternalRow(
      Array[Any](len, nTok, sumTokLen, distinct.size, nStop, nPunct, sEn, sDe, sFr, sEs, sZh, nBpe))
  }

  /** Space-split non-empty tokens (the battery's `toks` semantics). */
  private def tokens(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    var start = -1
    while (i < n) {
      if (s.charAt(i) == ' ') {
        if (start >= 0) { out.add(s.substring(start, i)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out.add(s.substring(start, n))
    out
  }

  /** Column API: profile(text) → struct (see [[schema]]). */
  def profile(c: Column): Column = Bridge.column(TextProfile(Bridge.expression(c)))
}

/** Codegen'd distinct 3-token shingle set (the n-gram dedup family's
  * candidate keys): tokens are the battery's space-split semantics,
  * shingles are consecutive token triples joined by single spaces,
  * deduplicated per document inside the kernel (insertion order).
  *
  * Replaces a posexplode → window(lead,lead) → distinct pipeline: the
  * window pass ran on WindowExec's interpreted per-row path (same
  * megamorphic cliff as the HOFs — measured 74 s task CPU late-JVM vs
  * ~4 s healthy for the identical plan), and the per-document `distinct`
  * cost a full extra shuffle of every (doc_id, shingle) row. One
  * generated call per document does both for free.
  */
/** Shared space-split token scan (the battery's tokenization — single
  * space separator, empties dropped) as (start, end) char offsets;
  * [[Shingles3]] and [[TokenWindows]] both rebuild their windows from
  * these offsets, so the semantics live in exactly one loop.
  */
private[functions] object TokenOffsets {
  def of(s: String): (java.util.ArrayList[Integer], java.util.ArrayList[Integer]) = {
    val n = s.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var start = -1
    while (i < n) {
      if (s.charAt(i) == ' ') {
        if (start >= 0) { starts.add(start); ends.add(i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) { starts.add(start); ends.add(n) }
    (starts, ends)
  }
}

case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${Shingles3.Mod}.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  /** ONE definition of the per-document shingle walk: every consecutive
    * token triple rebuilt with single spaces, in source order, duplicates
    * included (the callers dedupe on their own key — string or hash).
    * [[Shingles3]] and [[Shingles3Hashed]] both iterate through here, so
    * the shingle-construction semantics cannot drift between the string
    * SQL surface and the hashed dedup family.
    */
  private[functions] def forEachShingle(s: String)(f: String => Unit): Unit = {
    val (starts, ends) = TokenOffsets.of(s)
    val m = starts.size()
    var j = 0
    while (j + 2 < m) {
      // tokens are adjacent in the source except for the space runs they
      // were split on; rebuild with single spaces (the shingle format)
      val sb = new java.lang.StringBuilder(ends.get(j + 2) - starts.get(j))
      sb.append(s, starts.get(j), ends.get(j)).append(' ')
      sb.append(s, starts.get(j + 1), ends.get(j + 1)).append(' ')
      sb.append(s, starts.get(j + 2), ends.get(j + 2))
      f(sb.toString)
      j += 1
    }
  }

  def shingles(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.LinkedHashSet[String]()
    forEachShingle(u.toString)(sh => out.add(sh))
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Column API: distinct 3-token shingles as ARRAY<STRING>. */
  def of(c: Column): Column = Bridge.column(Shingles3(Bridge.expression(c)))
}

/** [[Shingles3]] with the shingle emitted as its 64-bit md5 hash (first 8
  * MD5 bytes big-endian, the engine-portable hash of [[SimHash64]]):
  * ARRAY<LONG> of distinct shingle hashes. The n-gram dedup family joins
  * and aggregates on this instead of the shingle STRING, so its candidate
  * shuffle carries 8-byte keys instead of ~25-byte text — the difference
  * between shuffling the corpus vocabulary and shuffling fixed-width ids
  * at 100 TB. Distinctness is on the HASH (a within-doc collision would
  * merge two shingles); the DuckDB twin replays exactly that:
  * `list_distinct(list_transform(shingles, s ->
  * ('0x' || substr(md5(s), 1, 16))::UBIGINT))`.
  */
case class Shingles3Hashed(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingles3_hashed"

  override def nullSafeEval(input: Any): Any =
    Shingles3Hashed.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${Shingles3Hashed.Mod}.shingleHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3Hashed {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  def shingleHashes(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    Shingles3.forEachShingle(u.toString) { sh =>
      val bytes = sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.add(SimHash64.md5Hash64(bytes, 0, bytes.length))
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Column API: distinct 3-token shingle hashes as ARRAY<BIGINT>. */
  def of(c: Column): Column = Bridge.column(Shingles3Hashed(Bridge.expression(c)))
}

/** Codegen'd 64-bit SimHash (see `q_dedup_simhash`): per-token hash =
  * first 8 bytes of MD5(token UTF-8 bytes), big-endian, as a signed long;
  * ±1 votes per bit, sign-assembled signature. One generated call per
  * document replaces an explode of every token plus a 64-column SUM
  * aggregate: the per-row work is identical, but there is no token
  * shuffle at all and no 64-wide aggregate to plan/codegen (measured
  * ~6 s of driver planning per run).
  *
  * MD5 (not xxhash64) is deliberate: it is the one 64-bit-derivable hash
  * both engines expose — DuckDB computes the identical value as
  * `('0x' || substr(md5(t), 1, 16))::UBIGINT` — which graduates the
  * whole SimHash family from rows-only to full oracle hash-match
  * (round-4 verdict ask #5). MD5 costs more per token than XXH64, but
  * the signature pass is a tiny fraction of any dedup pipeline and the
  * kernel amortizes one thread-local digest instance across all tokens.
  *
  * Tokenization is done on the raw UTF-8 bytes (0x20 never occurs inside
  * a multi-byte UTF-8 sequence, so byte-level space splitting is exact).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        val r = ctx.freshName("sh")
        c => s"""
        |java.lang.Long $r = ${SimHash64.Mod}.simhash($c);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
        |""".stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(bytes[start, start+len)) big-endian as a signed
    * long — the engine-portable token hash (DuckDB:
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT`, same bit pattern).
    */
  def md5Hash64(bytes: Array[Byte], start: Int, len: Int): Long = {
    val md = Md5.get()
    md.reset()
    md.update(bytes, start, len)
    val d = md.digest()
    var h = 0L
    var k = 0
    while (k < 8) {
      h = (h << 8) | (d(k) & 0xffL)
      k += 1
    }
    h
  }

  def simhash(u: UTF8String): java.lang.Long = {
    val bytes = u.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var tokens = 0
    var i = 0
    var start = -1
    while (i <= n) {
      val isSpace = i == n || bytes(i) == 0x20
      if (isSpace) {
        if (start >= 0) {
          val h = md5Hash64(bytes, start, i - start)
          var b = 0
          while (b < 64) {
            votes(b) += (((h >>> b) & 1L).toInt * 2) - 1
            b += 1
          }
          tokens += 1
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    // token-less documents have NO signature (the explode+SUM
    // formulation produced no row for them) — returning 0 instead made
    // every empty doc collide at signature 0 and spuriously pair with
    // any real doc within hamming range of 0
    if (tokens == 0) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** Column API: simhash64(text) → BIGINT signature (NULL if no tokens). */
  def of(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
}

/** Codegen'd 16-bit random-hyperplane signature (the LSH family shared by
  * `q_sim_ann` / `q_dedup_embed_lsh`): bit j = sign of plane_j · v, planes
  * are deterministic ±1 vectors from a splitmix-style mix of the index.
  * One call per row computes all 16 plane dots over a primitive float[]
  * (single bulk `toFloatArray`) — replacing 16 separate ScaledDot
  * expressions against array literals (16 expression evaluations and
  * 16×64 virtual `ArrayData.getFloat` calls per row). Bit-identical to
  * that formulation: same per-element product → scaled-round → sum order,
  * and `dot > 0 ⇔ scaled sum > 0` exactly.
  */
/** The ONE deterministic ±1 hyperplane family every plane-LSH kernel
  * draws from: 128 planes over 64 dims via a splitmix-style index mix.
  * [[PlaneSig16]] uses rows 0–15; [[PlaneSig64]] planeSet `s` uses rows
  * s*64 … s*64+63 — a single table (and a single scaled-round-sum dot,
  * ScaledDot semantics) so the families cannot de-correlate by a
  * constant tweak applied to one copy.
  */
private[graft] object HyperPlanes {

  val Table: Array[Array[Float]] = Array.tabulate(128) { j =>
    Array.tabulate(64) { i =>
      var z = j.toLong * 64 + i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0f else -1.0f
    }
  }

  /** Plane j as a 64-bit sign mask (bit i set ⇔ plane value +1) — the
    * shape the generated DuckDB oracles inline as BIGINT literals, so the
    * SQL twin reads the SAME deterministic family as the kernels
    * (generate-the-oracle-from-the-Scala-constants house pattern).
    */
  def signMask(j: Int): Long = {
    var m = 0L
    var i = 0
    while (i < 64) {
      if (Table(j)(i) > 0f) m |= 1L << i
      i += 1
    }
    m
  }

  /** Sign of plane_j · xs under the exact scaled-round-sum dot. */
  def dotPositive(xs: Array[Float], j: Int): Boolean = {
    val p = Table(j)
    val n = math.min(xs.length, p.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += ScaledDot.roundHalfAway(xs(i).toDouble * p(i).toDouble * 1e12)
      i += 1
    }
    s > 0
  }
}

case class PlaneSig16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "plane_sig16"

  override def nullSafeEval(input: Any): Any =
    PlaneSig16.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${PlaneSig16.Mod}.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneSig16 {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  def sig(a: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val xs = a.toFloatArray()
    var out = 0
    var j = 0
    while (j < 16) {
      if (HyperPlanes.dotPositive(xs, j)) out |= 1 << j
      j += 1
    }
    out
  }

  /** Column API: plane_sig16(embedding) → INT signature. */
  def of(c: Column): Column = Bridge.column(PlaneSig16(Bridge.expression(c)))
}

/** Codegen'd 64-bit random-hyperplane signature (the banded multi-probe
  * ANN of `q_sim_ann` consumes two of these = 128 bits → 8×16-bit
  * bands): bit j = sign of plane_(planeSet*64+j) · v, planes drawn from
  * the same deterministic splitmix ±1 family as [[PlaneSig16]] (which
  * uses plane indices 0-15). `planeSet` selects a disjoint 64-plane
  * block per signature word so the two words are independent. Same
  * scaled-round-sum core as PlaneSig16/ScaledDot — one bulk
  * `toFloatArray` per row, all 64 plane dots in one static monomorphic
  * loop (the §6 deopt-cliff-proof shape).
  */
case class PlaneSig64(child: Expression, planeSet: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "plane_sig64"

  override def nullSafeEval(input: Any): Any =
    PlaneSig64.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planeSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${PlaneSig64.Mod}.sig($c, $planeSet)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneSig64 {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  def sig(a: org.apache.spark.sql.catalyst.util.ArrayData, planeSet: Int): Long = {
    val xs = a.toFloatArray()
    val base = planeSet * 64
    var out = 0L
    var j = 0
    while (j < 64) {
      if (HyperPlanes.dotPositive(xs, base + j)) out |= 1L << j
      j += 1
    }
    out
  }

  /** Column API: plane_sig64(embedding, planeSet) → BIGINT signature. */
  def of(c: Column, planeSet: Int): Column =
    Bridge.column(PlaneSig64(Bridge.expression(c), planeSet))
}

/** Codegen'd 16-hash MinHash signature over distinct 3-token shingles
  * (see `q_dedup_near`): per-shingle base hash = first 8 MD5 bytes
  * big-endian taken unsigned mod P (DuckDB twin:
  * `(('0x' || substr(md5(sh), 1, 16))::UBIGINT) % P` — same md5 choice
  * and rationale as [[SimHash64]]: it graduates the MinHash family to
  * full oracle hash-match), then 16 affine permutations
  * `(h*(1+37j) + (101+97j)) % P` minimized in one pass. NULL when the
  * document has < 3 tokens (such docs had no signature row in the
  * explode + groupBy formulation either). Replaces shingle-explode →
  * hash → 16-column MIN aggregate: the signature becomes a pure map-side
  * computation with no shuffle at all.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash16"

  override def nullSafeEval(input: Any): Any =
    MinHash16.minhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        val r = ctx.freshName("mh")
        c => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $r = ${MinHash16.Mod}.minhash($c);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
        |""".stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16 {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  private val P = 2038074743L // prime < 2^31: a*h+b stays in Long

  def minhash(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val n = u.numBytes()
    // token byte ranges (0x20 split is exact on UTF-8)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var start = -1
    while (i <= n) {
      if (i == n || org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        if (start >= 0) { starts.add(start); ends.add(i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val m = starts.size()
    if (m < 3) return null
    val mins = new Array[Long](16)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[UTF8String]()
    var buf = new Array[Byte](64)
    var j = 0
    while (j + 2 < m) {
      val len =
        (ends.get(j) - starts.get(j)) + (ends.get(j + 1) - starts.get(j + 1)) +
          (ends.get(j + 2) - starts.get(j + 2)) + 2
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var p = 0
      var t = 0
      while (t < 3) {
        val s0 = starts.get(j + t)
        val e0 = ends.get(j + t)
        org.apache.spark.unsafe.Platform.copyMemory(
          base,
          off + s0,
          buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + p,
          e0 - s0)
        p += e0 - s0
        if (t < 2) { buf(p) = 0x20; p += 1 }
        t += 1
      }
      val sh = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      if (seen.add(sh)) {
        val x = SimHash64.md5Hash64(buf, 0, len)
        // unsigned mod, NOT signed pmod: DuckDB reads the 16 hex chars as
        // UBIGINT, so both engines must reduce the same 2^64 value
        val h = java.lang.Long.remainderUnsigned(x, P)
        var k = 0
        while (k < 16) {
          val v = (h * (1L + 37L * k) + (101L + 97L * k)) % P // positive: no pmod needed
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Column API: minhash16(text) → ARRAY<BIGINT>[16] (NULL if < 3 tokens). */
  def of(c: Column): Column = Bridge.column(MinHash16(Bridge.expression(c)))
}

/** Codegen'd winnowing-lite fingerprint (see `q_text_fingerprint`):
  * per-token polynomial rolling hash over code points mod 1e9+7, then the
  * min over 4-token windows; NULL when the document has < 4 tokens. Same
  * static-helper design (and reason) as [[TextProfile]].
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "text_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev, {
        val r = ctx.freshName("fp")
        c => s"""
        |java.lang.Long $r = ${TextFingerprint.Mod}.fingerprint($c);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
        |""".stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFingerprint {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  private val P = 1000000007L

  def fingerprint(u: UTF8String): java.lang.Long = {
    val s = u.toString
    val n = s.length
    var th = new Array[Long](16)
    var m = 0
    var i = 0
    var start = -1
    def push(end: Int): Unit = {
      var acc = 0L
      var j = start
      while (j < end) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      if (m == th.length) th = java.util.Arrays.copyOf(th, m * 2)
      th(m) = acc
      m += 1
    }
    while (i < n) {
      if (s.charAt(i) == ' ') {
        if (start >= 0) { push(i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) push(n)
    if (m < 4) null
    else {
      var best = Long.MaxValue
      var j = 0
      while (j + 3 < m) {
        val v = (th(j) * 31957 + th(j + 1) * 1031 + th(j + 2) * 97 + th(j + 3)) % P
        if (v < best) best = v
        j += 1
      }
      java.lang.Long.valueOf(best)
    }
  }

  /** Column API: fingerprint(text) → BIGINT (NULL if < 4 tokens). */
  def of(c: Column): Column = Bridge.column(TextFingerprint(Bridge.expression(c)))
}

/** Codegen'd k-token sliding windows (the exact-substring-dedup candidate
  * generator, see `q_dedup_substring`): every run of `k` consecutive
  * tokens, in positional order, NOT deduplicated — position matters (a
  * window repeated inside one document is still a duplicated span).
  * Tokens are the battery's space-split semantics; windows are rebuilt
  * with single spaces like [[Shingles3]]. Returns NULL-free
  * ARRAY<STRING>, empty when the document has fewer than `k` tokens.
  *
  * `k` is a plan-time constant (constructor parameter, like
  * [[PlaneSig64]]'s planeSet), so the generated call keeps one static
  * monomorphic helper on the hot loop — same design rationale as
  * [[TextProfile]].
  */
case class TokenWindows(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"token_windows: k must be >= 1, got $k") // fail at plan time

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_windows"

  override def nullSafeEval(input: Any): Any =
    TokenWindows.windows(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TokenWindows.Mod}.windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindows {

  private[functions] val Mod = getClass.getName.stripSuffix("$") + "$.MODULE$"

  def windows(u: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    val (starts, ends) = TokenOffsets.of(s)
    val m = starts.size()
    val cnt = math.max(0, m - k + 1)
    val arr = new Array[Any](cnt)
    var j = 0
    while (j < cnt) {
      val sb = new java.lang.StringBuilder(ends.get(j + k - 1) - starts.get(j))
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(s, starts.get(j + t), ends.get(j + t))
        t += 1
      }
      arr(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Column API: all k-token windows in order as ARRAY<STRING>. */
  def of(c: Column, k: Int): Column =
    Bridge.column(TokenWindows(Bridge.expression(c), k))
}
