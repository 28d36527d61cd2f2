package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** MiningOps: market-basket laws, TPC-H shape invariants, embed-outlier
  * determinism, SemDeDup drop-list laws. The heavy value checking is the
  * DuckDB oracle (all six entries are oracle-hash-checked); these specs
  * pin the invariants an oracle diff would not explain well.
  */
class MiningOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------- market basket

  test("q_market_basket: ordered pairs, support threshold, exact lift") {
    val rows = MiningOps.qMarketBasket(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // unordered pair canonical form
      assert(r.getLong(2) >= 3L) // support floor
    }
    // lift recomputed from first principles for one pair
    val li = graft.Tables.lineitem(spark, sf001)
    val items = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct().cache()
    val n = items.select(countDistinct("o")).as[Long].head()
    val first = rows.head
    val (p1, p2, support) = (first.getLong(0), first.getLong(1), first.getLong(2))
    val c1 = items.where(col("p") === p1).count()
    val c2 = items.where(col("p") === p2).count()
    val expected = BigDecimal(support.toDouble * n / (c1.toDouble * c2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(first.getDouble(3) == expected)
    items.unpersist()
  }

  // ------------------------------------------------------------ TPC-H Q1

  test("q_tpch_q1: group count closes to the filtered scan, sums positive") {
    val df = MiningOps.qTpchQ1(spark, sf001)
    val rows = df.collect()
    assert(rows.length == 6) // 3 return flags x 2 line statuses in this data
    val total = rows.map(_.getLong(9)).sum
    val scan = graft.Tables
      .lineitem(spark, sf001)
      .where(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .count()
    assert(total == scan)
    rows.foreach { r =>
      // columns: ..., 3=sum_base_price, 4=sum_disc_price, 5=sum_charge
      // charge >= disc_price (tax >= 0) and disc_price <= base (discount >= 0)
      assert(r.getDouble(5) >= r.getDouble(4))
      assert(r.getDouble(4) <= r.getDouble(3))
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("q_tpch_q3: top-10 revenue is sorted and within the date gates") {
    val rows = MiningOps.qTpchQ3(spark, sf001).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // o_orderdate reads back as TIMESTAMP_NTZ => java.time.LocalDateTime
    rows.foreach(r =>
      assert(r.getAs[java.time.LocalDateTime](1)
        .isBefore(java.time.LocalDateTime.parse("1998-03-15T00:00:00"))))
  }

  test("q_tpch_q5: revenue per ASIA nation, local-supply condition holds") {
    val rows = MiningOps.qTpchQ5(spark, sf001).collect()
    assert(rows.nonEmpty)
    // every output nation is in ASIA
    val asia = graft.Tables
      .nation(spark, sf001)
      .join(
        graft.Tables.region(spark, sf001).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name")
      .as[String]
      .collect()
      .toSet
    rows.foreach(r => assert(asia.contains(r.getString(0))))
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  // -------------------------------------------------------- embed outlier

  test("q_embed_outlier: 20 ascending-cosine rows, stable across partitionings") {
    val a = MiningOps.qEmbedOutlier(spark, sf001).collect()
    assert(a.length == 20)
    val cs = a.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (x, y) => x <= y })
    // fixed-point centroid + kernel dots => bit-identical on a second run
    val b = MiningOps.qEmbedOutlier(spark, sf001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  // ------------------------------------------------------------ semdedup

  test("q_semdedup: keep_id is a lower id in the same label with cos >= threshold") {
    val rows = MiningOps.qSemDedup(spark, sf001).collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables
      .embeddings(spark, sf001)
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Float](2).toArray))
      .toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (p, q) =>
          graft.functions.ScaledDot.roundHalfAway(p.toDouble * q.toDouble * 1e12)
        }.sum.toDouble / 1e12
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    rows.foreach { r =>
      val (dropId, keepId) = (r.getLong(0), r.getLong(1))
      assert(keepId < dropId)
      val (dl, de) = emb(dropId)
      val (kl, ke) = emb(keepId)
      assert(dl == kl)
      assert(cos(de, ke) >= 0.3)
    }
    // drop rule is "any lower-id similar neighbor": a dropped id may
    // still appear as keep_id for an even later one, but never drops itself
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
  }
}
