package graft.queries

import graft.SparkSuite

/** Product-quantization ANN (`q_sim_ann_pq`): deterministic end-to-end,
  * and the ADC-candidate → exact-rerank pipeline must recover most of
  * the true top-k (the property that makes a 64× compression usable).
  */
class PqSpec extends SparkSuite {

  test("PQ run is deterministic end-to-end") {
    val a = LlmOps.qSimAnnPq(spark, sf001).collect().toSeq
    val b = LlmOps.qSimAnnPq(spark, sf001).collect().toSeq
    assert(a == b)
    assert(a.size == 10)
  }

  test("rerank recall: PQ top-10 overlaps the exact top-10") {
    val pq = LlmOps.qSimAnnPq(spark, sf001).collect().map(_.getLong(0)).toSet
    val exact = LlmOps.qSimTopk(spark, sf001).collect().map(_.getLong(0)).toSet
    val recall = (pq & exact).size
    // ADC top-50 + exact rerank on clustered synthetic embeddings: the
    // true neighbors overwhelmingly survive candidate generation
    assert(recall >= 6, s"recall@10 = $recall/10 (pq=$pq exact=$exact)")
    // and the sims reported ARE exact cosines (rerank output), so the
    // PQ list's scores must be a subset of brute-force-computable values
    val sims = LlmOps.qSimAnnPq(spark, sf001).collect().map(_.getDouble(2))
    assert(sims.sorted.reverse.sameElements(sims), "descending order")
  }
}
