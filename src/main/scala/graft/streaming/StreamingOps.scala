package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.8 E5). Each op takes a
  * (possibly streaming) events DataFrame `(ts timestamp, event_type string,
  * user_id long, value double)` and returns the transformed frame — the
  * same declarative plan serves `readStream` (incremental, stateful,
  * watermark-bounded state eviction) and batch (oracle parity: the batch
  * twin of `hourly` is hash-checked as eq3). Tests drive these with
  * `MemoryStream` and hold them to batch parity.
  */
object StreamingOps {

  /** Tumbling 1-hour counts with a 10-minute watermark: in append mode a
    * window emits once the watermark passes its end, and later-than-
    * watermark events are dropped — bounded state at any scale. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour/15-minute windows per event type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows with a 30-minute inactivity gap — the streaming twin
    * of [[graft.pipeline.EventOps.sessionize]]'s lag-based batch program
    * (per-user session event counts must agree; pinned by test). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
