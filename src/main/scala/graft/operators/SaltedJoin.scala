package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation for large-large shuffle joins (SURVEY.md §4 /
  * the 100 TB checklist: "salting for skew").
  *
  * A shuffle join partitions by the join key, so one hot key (a user with
  * 10⁸ events, an empty-string document) lands every matching row in ONE
  * task. Salting splits it: the probe side gets a deterministic salt in
  * `[0, buckets)` derived from a secondary column, the build side is
  * replicated once per salt value, and the join key becomes
  * `(key, salt)` — the hot key's rows now spread across `buckets` shuffle
  * partitions at the cost of `buckets`× replication of the build side.
  * Use when AQE's runtime skew-join split (which handles partition-level
  * skew after the fact) isn't available or the skew is in a single key.
  *
  * The salt is `pmod(xxhash64(saltSource), buckets)` — deterministic, so
  * results are reproducible and the same row always lands in the same
  * bucket (no RNG, no per-run variance).
  */
object SaltedJoin {

  val SaltCol = "__graft_salt"

  def inner(
      probe: DataFrame,
      probeKey: Column,
      saltSource: Column,
      build: DataFrame,
      buildKey: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = probe.withColumn(SaltCol, pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val r = build.withColumn(SaltCol, explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r, probeKey === buildKey && l(SaltCol) === r(SaltCol), "inner")
      .drop(SaltCol)
  }
}
