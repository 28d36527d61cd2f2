package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms (SURVEY.md §2.2-S), written against a generic
  * DataFrame so the SAME definition serves `readStream` (with watermark →
  * late-data drop + state cleanup) and the batch equivalence queries the
  * driver oracle-checks. Structured Streaming only — no DStreams.
  */
object Streams {
  import graft.Tables.dsum

  /** 5-minute tumbling windows per event_type. Streaming: append mode
    * after watermark expiry; batch: plain groupBy(window(...)).
    */
  def tumbling(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .select(
        col("window.start").as("ws"),
        col("window.end").as("we"),
        col("event_type"),
        col("n"),
        col("sum_v"))
  }

  /** 10-minute windows sliding by 5 — each event lands in 2 windows. */
  def sliding(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("event_type"), col("n"))
  }

  /** Per-user session windows, 30-minute gap. Session end = last event +
    * gap (Spark session_window semantics).
    */
  def session(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "30 minutes") else events
    src
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }
}
