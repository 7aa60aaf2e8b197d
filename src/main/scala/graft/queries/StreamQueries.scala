package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-time windowing inventory over `events` — the batch twins of the
  * Structured Streaming operators (B1's incremental segments,
  * `ingester/annotations_indexer.py:842-861`, generalized to tumbling /
  * sliding / session windows). The same operators run under `readStream`
  * in `graft.streaming.StreamingPipeline`; StreamingSpec drives them with
  * MemoryStream and checks against these batch results.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q60 — tumbling 1-hour event-time windows per event type. Epoch-aligned
    * (Spark `window()` and DuckDB `time_bucket` agree on origin), emitted as
    * formatted strings for the oracle hash.
    */
  def q60_tumbling_window: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
              col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** q61 — sliding windows (1 hour, sliding 30 min): each event lands in two
    * windows; expressed with `window()` in Spark and the union of the two
    * shifted bucket assignments in DuckDB.
    */
  def q61_sliding_window: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
              col("n"), col("sum_value"))
      .orderBy("win_start")
  }

  /** q62 — session windows per user (30-minute inactivity gap), computed with
    * the lag/cumulative-sum idiom so the DuckDB oracle can mirror it exactly;
    * `session_window()` runs in the streaming twin (StreamingSpec).
    */
  def q62_session_window: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
           max("n_events").as("max_session_events"),
           sum("n_events").cast("long").as("n_events"))
      .orderBy("user_id")
  }

  val all: Map[String, Q] = Map(
    "q60_tumbling_window" -> q60_tumbling_window,
    "q61_sliding_window" -> q61_sliding_window,
    "q62_session_window" -> q62_session_window)

  val oracle: Map[String, String] = Map(
    "q60_tumbling_window" -> """
      SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, count(1) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q61_sliding_window" -> """
      WITH assigned AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes')
                 + INTERVAL '30 minutes' AS win_start, value FROM events)
      SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
             count(1) AS n, round(sum(value), 2) AS sum_value
      FROM assigned GROUP BY 1 ORDER BY 1""",
    "q62_session_window" -> """
      WITH lagged AS (
        SELECT user_id, event_id, ts,
               lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                      OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END AS new_session
        FROM lagged),
      sessions AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged),
      per_session AS (
        SELECT user_id, session_id, count(1) AS n_events
        FROM sessions GROUP BY 1, 2)
      SELECT user_id, count(1) AS n_sessions,
             max(n_events) AS max_session_events,
             CAST(sum(n_events) AS BIGINT) AS n_events
      FROM per_session GROUP BY 1 ORDER BY 1""")
}
