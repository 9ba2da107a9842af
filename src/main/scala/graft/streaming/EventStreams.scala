package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful sessionizer. */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session accumulator carried in GroupState between batches. */
case class SessionState(start_ms: Long, last_ms: Long, n: Long, value: Double)

/** Closed session emitted downstream. */
case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                      n_events: Long, sess_value: Double)

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

  /** Streaming exact dedup on event id: at-least-once sources (Kafka
    * replays, retried micro-batches) become effectively-once
    * downstream. dropDuplicatesWithinWatermark keeps only ids younger
    * than the watermark in state, so state is bounded by the late-data
    * horizon — the streaming counterpart of Dedup.exact.
    */
  def dedupedStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

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

  /** Sliding-window item engagement counts — the always-on feed under
    * a trending dashboard (the streaming building block behind
    * Analytics.itemTrending's batch ratios): each event votes into
    * every `windowDur` window that contains it, advancing every
    * `slideDur`, so the newest window is at most one slide stale. The
    * item key comes out of the JSON props exactly like the batch
    * operators'. Ranking/thresholding happens downstream of the sink
    * (a top-k over a sliding window is not expressible in append mode
    * — the window's membership keeps changing until the watermark
    * closes it); the state store holds |open windows|×|active items|
    * rows, bounded by the watermark horizon.
    */
  def trendingCounts(events: DataFrame, windowDur: String = "1 hour",
                     slideDur: String = "15 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .groupBy(window(col("ts"), windowDur, slideDur), col("item_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("item_id"), col("n"))

  /** Stream-stream interval join — the online twin of
    * Analytics.eventsAsOf's attribution question: every purchase is
    * matched to the same user's views in the lookback window
    * [p_ts − maxLag, p_ts). Both sides carry a watermark and the join
    * condition bounds event-time distance, so Spark can expire join
    * state once `watermark + maxLag` has passed — without the time
    * bound the state store would grow forever (Spark rejects an
    * unbounded stream-stream join in append mode for exactly that
    * reason). The same plan runs on bounded frames for backfill.
    */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
                              maxLag: String = "1 hour",
                              watermark: String = "2 hours"): DataFrame = {
    val v = views
      .withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val p = purchases
      .withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
    p.join(v,
      col("v_user") === col("user_id") &&
        col("v_ts") < col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $maxLag"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("view_id"), col("v_ts"), col("value"))
  }

  /** Streaming anomaly flagger: windowed per-type counts z-scored
    * against a STATIC baseline frame (event_type, mean, std — built
    * offline by the batch seasonality/anomaly operators and refreshed
    * on whatever cadence the ops team trusts). Stream-static joins
    * need no watermark on the static side and never grow state, so
    * this is the cheapest online detector shape: the heavy statistics
    * stay in batch, the stream pays one broadcast join per
    * micro-batch. Windows whose |z| clears `zThreshold` carry
    * `anomaly = true`; rows with no baseline (new event type) flag
    * NULL — surfaced, not dropped, because an unknown type IS an
    * anomaly signal.
    */
  def anomalyFlags(events: DataFrame, baseline: DataFrame,
                   windowDur: String = "1 hour", watermark: String = "2 hours",
                   zThreshold: Double = 3.0): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(baseline), Seq("event_type"), "left_outer")
      .select(col("window.start").as("w_start"), col("event_type"), col("n"),
        round((col("n") - col("mean")) / col("std"), 5).as("z"),
        (abs((col("n") - col("mean")) / col("std")) >= zThreshold).as("anomaly"))

  /** Custom stateful sessionizer via flatMapGroupsWithState — the
    * fully-controlled variant of sessionWindows for semantics
    * session_window can't express (per-session running payloads,
    * mid-session emissions, custom close rules). State per user is one
    * small SessionState; the event-time timeout (watermark-driven)
    * closes idle sessions, so state size is bounded by active users,
    * not history.
    */
  def statefulSessions(events: Dataset[UserEvent], gapMs: Long = 1800000L,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start_ms, s.last_ms, s.n, s.value))
          } else {
            val evs = rows.toSeq.sortBy(_.ts.getTime)
            val closed = List.newBuilder[SessionOut]
            var open = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last_ms <= gapMs =>
                  open = Some(s.copy(last_ms = t, n = s.n + 1, value = s.value + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.start_ms, s.last_ms, s.n, s.value)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
