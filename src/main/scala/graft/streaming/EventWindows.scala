package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Exact._
import graft.Tables

/** Event-time windowing (SURVEY.md §2.12). The reference is batch-only;
  * this layer provides the streaming-semantics operators the north star
  * requires, computed with the exact same `window()` / `session_window()`
  * expressions Structured Streaming uses — so the identical code runs
  * under `readStream` (see [[StreamingRunner]] and StreamingSpec).
  *
  * Window starts are emitted as epoch microseconds (BIGINT) rather than
  * timestamps so the DuckDB oracle compares integers, not tz-sensitive
  * timestamp encodings.
  */
object EventWindows {

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))

  def tumblingSql: String = s"""
    SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
           event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Sliding windows: 10-minute window sliding by 5 — every event lands
    * in exactly two windows. The oracle reproduces window assignment by
    * unioning the two bucket formulas. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))

  def slidingSql: String = s"""
    WITH assigned AS (
      SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) AS window_start_us, event_type, value FROM events
      UNION ALL
      SELECT (epoch_us(ts) - epoch_us(ts) % 300000000 - 300000000) AS window_start_us, event_type, value FROM events
    )
    SELECT window_start_us, event_type, COUNT(*) AS n, ${sqlSum("value")} AS total_value
    FROM assigned GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Session windows with a 30-minute inactivity gap, per user.
    * Spark: `session_window`; oracle: classic gaps-and-islands
    * (lag + running flag sum). Session end = last event + gap.
    * Boundary semantics (verified empirically): Spark MERGES an event
    * that lands exactly `gap` after the previous one (start == prev
    * session end is inclusive), so the oracle opens a new session only
    * when the lag is STRICTLY greater than the gap. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start_us"))

  def sessionsSql: String = s"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts, event_id, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events, ${sqlSum("value")} AS total_value
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start_us"""

  /** Late-data dedup by key within a watermark horizon, batch analog:
    * keep the earliest event per (user_id, event_type, minute bucket) —
    * the `dropDuplicates`-with-watermark shape. */
  def dedupWithinWatermark(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("minute_us", unix_micros(col("ts")) - unix_micros(col("ts")) % 60000000L)
      .groupBy(col("user_id"), col("event_type"), col("minute_us"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("user_id"), col("event_type"), col("minute_us"))

  def dedupWithinWatermarkSql: String = """
    SELECT user_id, event_type,
           (epoch_us(ts) - epoch_us(ts) % 60000000) AS minute_us,
           MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
    FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Interval (stream-stream) join, batch analog: every click a user
    * makes within 30 minutes AFTER a view — the attribution shape
    * whose streaming form is watermark-bounded state on BOTH sides
    * ([[StreamingRunner.runStreamStreamJoin]] runs this identical
    * condition under two readStreams; StreamingSpec proves row
    * equality). Inclusive bounds on both ends, matching Spark's
    * `BETWEEN`-style range condition. Scale shape: an equi-join on
    * user_id carries the range predicate as a post-join filter — the
    * shuffle keys on the user, never on time, and the state bound in
    * the streaming form is the watermark horizon. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def side(kind: String, a: String) = ev.filter(col("event_type") === kind)
      .select(col("user_id").as(s"${a}_user"), col("event_id").as(s"${a}_id"),
        col("ts").as(s"${a}_ts"))
    side("view", "v").join(side("click", "c"),
        col("v_user") === col("c_user") && col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("v_id"), col("c_id"),
        unix_micros(col("v_ts")).as("view_us"),
        unix_micros(col("c_ts")).as("click_us"))
      .orderBy(col("user_id"), col("v_id"), col("c_id"))
  }

  def intervalJoinSql: String = """
    SELECT v.user_id AS user_id, v.event_id AS v_id, c.event_id AS c_id,
           epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
    FROM events v JOIN events c
      ON v.event_type = 'view' AND c.event_type = 'click'
     AND v.user_id = c.user_id
     AND epoch_us(c.ts) >= epoch_us(v.ts)
     AND epoch_us(c.ts) <= epoch_us(v.ts) + 1800000000
    ORDER BY user_id, v_id, c_id"""
}
