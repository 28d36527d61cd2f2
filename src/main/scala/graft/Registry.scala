package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation, its DuckDB oracle (None for
  * non-SQL-expressible / non-deterministic ops — the driver then records a
  * weaker rows-only check), and whether Bench includes it in the headline
  * set.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

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
