package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events stream — the
  * always-on counterpart of Analytics.sessionize/funnel. At 100 TB/day
  * these run as continuous jobs: watermarks bound state, windowed
  * aggregations emit append-mode results, and the same code works on a
  * bounded DataFrame for backfill (batch) because the transforms are
  * identical Catalyst plans.
  */
object EventStreams {

  /** Tumbling-window counts per event type with a watermark bounding
    * late data (and therefore state size).
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based session windows (native session_window — state handled
    * by Spark's streaming session aggregation).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sess_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"), col("sess_value"))
}
