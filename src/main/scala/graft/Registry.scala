package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation, its DuckDB oracle (None for
  * non-SQL-expressible / non-deterministic ops — the driver then records a
  * weaker rows-only check), whether Bench includes it in the headline set,
  * and — REQUIRED whenever `oracle` is None — the one-line machine-readable
  * reason there is no oracle (Verify emits these as a sidecar next to
  * oracle_sql.json, so a `no_oracle` correctness row self-documents
  * instead of requiring SURVEY archaeology; RegistryContractSpec enforces
  * the invariant).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true,
    noOracleReason: Option[String] = None)

/** Central registry; SparkEntry projects this into the driver contract. */
object Registry {
  lazy val all: Seq[(String, Q)] =
    graft.queries.TileQueries.all ++
      graft.queries.Relational.all ++
      graft.queries.LlmOps.all ++
      graft.queries.CorpusOps.all ++
      graft.queries.MiningOps.all ++
      graft.queries.SearchOps.all ++
      graft.queries.QualityOps.all ++
      graft.queries.StreamingQueries.all
}
