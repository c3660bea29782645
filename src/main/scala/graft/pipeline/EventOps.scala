package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table (SURVEY.md §2.8 E5, batch
  * form — the streaming form with watermarks lives in
  * [[graft.streaming.StreamingOps]] and is held to batch parity by test).
  *
  * All three shapes shuffle once on their natural keys and aggregate
  * partially map-side; nothing is collected to the driver. At 100 TB the
  * `events` source would be date-partitioned so the window queries prune to
  * the scanned time range.
  */
object EventOps {

  /** Tumbling 1-hour windows per event type: the canonical
    * `groupBy(window(...))` aggregation. Window start rendered ISO for
    * oracle parity (DuckDB `time_bucket`). */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    hourlyDf(Tables.load(spark, dir, "events"))

  def hourlyDf(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(window(col("ts"), "1 hour").getField("start"),
          "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .orderBy("hour_start", "event_type")

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4 windows
    * (Spark expands via the `window` generator — no self-join). Distinct
    * users per window is exact. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    slidingDf(Tables.load(spark, dir, "events"))

  def slidingDf(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(window(col("ts"), "1 hour", "15 minutes").getField("start"),
          "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("window_start", "event_type")

  /** Two-phase salted aggregation — the skew pattern for hot grouping keys
    * (here: only 5 event_type values, so a plain groupBy funnels the whole
    * table through ≤5 reducers at scale). Phase 1 aggregates on
    * (key, salt ∈ [0,32)), spreading each hot key over 32 reducers; phase 2
    * merges the 32 partials per key. Values are summed as integer cents
    * (`round(value·100)` per element — exact: fixture values are 2 dp), so
    * partial sums re-associate with NO floating-point order sensitivity and
    * the result is bit-equal to a direct single-phase groupBy — which is
    * exactly what the DuckDB oracle runs, making the salted plan
    * hash-compared against the unsalted semantics. AQE's skew-join split
    * handles the join-side analogue automatically. */
  def saltedEventTotalsDf(events: DataFrame, saltBuckets: Int = 32): DataFrame =
    events
      .withColumn("salt", pmod(hash(col("event_id")), lit(saltBuckets)))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pc"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("pc")).cast("double") / 100.0, 6).as("total_value"))
      .orderBy("event_type")

  def saltedEventTotals(spark: SparkSession, dir: String): DataFrame =
    saltedEventTotalsDf(Tables.load(spark, dir, "events"))

  /** Sessionization with a 30-minute inactivity gap, the batch analogue of
    * `session_window`: lag → session-start flags → running session ids →
    * per-session sizes → per-user stats. Both running windows use the
    * default RANGE frame so timestamp ties get identical values in Spark
    * and DuckDB. One shuffle on user_id; sessions never leave their
    * partition. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeDf(Tables.load(spark, dir, "events"))

  def sessionizeDf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapUs = 30L * 60 * 1000000
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // >= gap splits: matches session_window's [start, last+gap) windows,
      // where an event exactly at last+gap does NOT merge — keeps the
      // batch, session_window, and flatMapGroupsWithState variants in
      // agreement on the boundary
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("session_events"))
    sessions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("session_events")).as("n_events"),
        max(col("session_events")).as("max_session_events"))
      .orderBy("user_id")
  }

  /** eq53 — per-user inter-event gap statistics: the lag-window "think
    * time" features behind session quality scoring and bot detection.
    * Gaps are exact integer microseconds (`unix_micros` differences), so
    * the per-user sum is order-insensitive and the mean is one final
    * division; min/max/avg are rendered in seconds at 6 dp. Equal
    * timestamps contribute a 0 gap whichever side of the (ts, event_id)
    * tie-break they land on, so the per-user gap multiset — and therefore
    * every aggregate — is deterministic. One shuffle on user_id; the lag
    * window and the aggregation share that partitioning, so the window
    * output aggregates without a second exchange. */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame =
    interEventGapsDf(Tables.load(spark, dir, "events"))

  def interEventGapsDf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(sum(col("gap_us")).cast("double") / (count(lit(1)) * 1000000.0), 6)
          .as("avg_gap_s"),
        round(min(col("gap_us")) / lit(1000000.0), 6).as("min_gap_s"),
        round(max(col("gap_us")) / lit(1000000.0), 6).as("max_gap_s"))
      .orderBy("user_id")
  }
}
