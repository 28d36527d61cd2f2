package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the r13 binary MinK buffer (no SparkSession needed):
  * the byte-codec's insert splice (head/middle/tail), the O(1) full-
  * buffer fast reject, (rkey, id) dedup idempotency, and merge-tree
  * invariance — the lattice properties the streaming entries
  * (`s_stream_reservoir`, `s_stream_kmv`) rely on, checked at the
  * buffer level where an offset bug would live.
  */
class MinKSpec extends AnyFunSuite {

  private def ref(k: Int, es: Seq[MinKEntry]): Seq[(String, Long, Long)] =
    es.map(e => (e.rkey, e.event_id, e.user_id))
      .sortBy(t => (t._1, t._2))
      .foldLeft(Vector.empty[(String, Long, Long)]) { (acc, e) =>
        if (acc.exists(x => x._1 == e._1 && x._2 == e._2)) acc else acc :+ e
      }
      .take(k)

  test("version gate: an untagged (pre-r14) buffer fails with the versioned message") {
    val mk = new MinK(3)
    // a v1-era buffer: 8-byte untagged header [int n][int lastOff]
    val v1 = new Array[Byte](8)
    Seq[Array[Byte] => Any](
      b => mk.reduce(b, MinKEntry("aa", 1L, 1L)),
      b => mk.merge(b, mk.zero),
      b => mk.merge(mk.zero, b),
      b => mk.finish(b)).foreach { f =>
      val e = intercept[IllegalStateException](f(v1))
      assert(e.getMessage.contains("layout v2"), e.getMessage)
      assert(e.getMessage.contains("discard the streaming checkpoint"), e.getMessage)
    }
    // and a FUTURE layout (v3 tag) is rejected the same way, not misparsed
    val v3 = mk.zero
    v3(3) = 3
    assert(intercept[IllegalStateException](mk.finish(v3)).getMessage.contains("layout v2"))
  }

  private def run(k: Int, es: Seq[MinKEntry]): Seq[(String, Long, Long)] = {
    val mk = new MinK(k)
    mk.finish(es.foldLeft(mk.zero)(mk.reduce)).toSeq
      .map(e => (e.rkey, e.event_id, e.user_id))
  }

  test("reduce stream equals sorted-dedup-take-k, any feed order") {
    // NOTE: dup (rkey, id) pairs carry the SAME uid here — which uid
    // survives a cross-uid collision is feed-order-defined (first seen
    // wins), exactly as the old sort-stability buffer behaved; callers
    // never produce that shape (reservoir ids are unique, kmv pins 0)
    val base = Seq(
      MinKEntry("0b", 2L, 20L),
      MinKEntry("aa", 1L, 10L),
      MinKEntry("aa", 1L, 10L), // dup (rkey, id): one slot
      MinKEntry("a", 7L, 70L), // prefix of "aa": shorter sorts first
      MinKEntry("zz", 3L, 30L),
      MinKEntry("0b", 1L, 11L),
      MinKEntry("mm", 5L, 50L))
    for (k <- Seq(1, 2, 3, 4, 10)) {
      val want = ref(k, base)
      // head/middle/tail inserts all exercised across permuted feeds
      Seq(base, base.reverse, base.sortBy(_.rkey), base.sortBy(_.rkey).reverse)
        .foreach(feed => assert(run(k, feed) == want, s"k=$k feed=$feed"))
    }
  }

  test("full-buffer fast reject returns the SAME buffer instance (zero allocation)") {
    val mk = new MinK(2)
    val full = Seq(MinKEntry("aa", 1L, 1L), MinKEntry("bb", 2L, 2L))
      .foldLeft(mk.zero)(mk.reduce)
    // worse than the worst entry → identical reference, not a copy
    assert(mk.reduce(full, MinKEntry("zz", 9L, 9L)) eq full)
    // equal to the worst entry (dup) → also rejected by reference
    assert(mk.reduce(full, MinKEntry("bb", 2L, 7L)) eq full)
    // better than the worst → a new spliced buffer
    assert(!(mk.reduce(full, MinKEntry("ab", 5L, 5L)) eq full))
  }

  test("merge is partitioning-invariant and truncates to k") {
    val es = (1 to 40).map { i =>
      MinKEntry(f"${(i * 37) % 100}%02d", i.toLong, i.toLong * 10)
    }
    val mk = new MinK(5)
    val want = ref(5, es)
    // single stream vs two-way vs unbalanced merge trees
    val whole = es.foldLeft(mk.zero)(mk.reduce)
    val (l, r) = es.splitAt(13)
    val two = mk.merge(l.foldLeft(mk.zero)(mk.reduce), r.foldLeft(mk.zero)(mk.reduce))
    val byOne = es.map(e => mk.reduce(mk.zero, e)).foldLeft(mk.zero)(mk.merge)
    Seq(whole, two, byOne).foreach { b =>
      assert(mk.finish(b).toSeq.map(e => (e.rkey, e.event_id, e.user_id)) == want)
    }
    // idempotency: merging a sketch with itself is a no-op
    assert(mk.finish(mk.merge(whole, whole)).toSeq ==
      mk.finish(es.foldLeft(mk.zero)(mk.reduce)).toSeq)
  }

  test("oversized rkey fails loudly instead of corrupting the buffer") {
    val mk = new MinK(3)
    val big = "x" * 65536 // one past the short length field's capacity
    intercept[IllegalArgumentException] {
      mk.reduce(mk.zero, MinKEntry(big, 1L, 1L))
    }
    // the boundary itself still round-trips
    val max = "y" * 65535
    val out = mk.finish(mk.reduce(mk.zero, MinKEntry(max, 1L, 1L)))
    assert(out.length == 1 && out(0).rkey == max)
  }

  test("null and empty inputs are inert") {
    val mk = new MinK(3)
    assert(mk.finish(mk.zero).isEmpty)
    val z = mk.zero
    assert(mk.reduce(z, null) eq z) // null row: buffer untouched
    assert(mk.reduce(z, MinKEntry(null, 1L, 1L)) eq z) // null rkey: ignored
    assert(mk.finish(mk.merge(mk.zero, mk.zero)).isEmpty)
  }
}
