package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, lastMs: Long, n: Int)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Int)

  private val GapMs = 30L * 60 * 1000

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API for session logic `session_window` can't express
    * (here it reimplements the same 30-minute gap, as the worked example).
    * State = the one open session per user; event-time timeout fires once
    * the watermark passes last-activity + gap, emitting the closed session
    * and clearing state — so state size is O(active users), never
    * O(events). Input must carry a watermark on `ts`. */
  def statefulSessions(events: Dataset[UserEvent]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, it: Iterator[UserEvent],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      def close(s: OpenSession) = ClosedSession(userId,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).toIterator
        state.remove()
        out
      } else {
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var cur = state.getOption
        it.toSeq.sortBy(_.ts.getTime).foreach { ev =>
          val t = ev.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs >= GapMs =>
              closed += close(s)
              cur = Some(OpenSession(t, t, 1))
            case Some(s) if s.startMs - t >= GapMs =>
              // late (within-watermark) straggler older than the open
              // session by a full gap: it is its own, already-closed
              // session — emit it; the open session is untouched
              closed += ClosedSession(userId,
                new java.sql.Timestamp(t), new java.sql.Timestamp(t), 1)
            case Some(s) =>
              // merge; a late straggler inside the gap window may extend
              // the session BACKWARD, so take min on start as well
              cur = Some(OpenSession(
                math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
            case None =>
              cur = Some(OpenSession(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + GapMs)
        }
        closed.iterator
      }
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup — the training-pipeline dedup primitive in
    * streaming form: `dropDuplicatesWithinWatermark` keeps per-key state
    * only until the watermark passes, so duplicate events arriving within
    * the watermark horizon are dropped with bounded state (an unbounded
    * `dropDuplicates` would grow state forever at 100 TB/day rates). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

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
