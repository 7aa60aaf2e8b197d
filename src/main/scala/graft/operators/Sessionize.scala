package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event log: split each user's event sequence
  * at inactivity gaps > `gapMs`, the classical lag + running-sum-of-breaks
  * assignment. The batch twin of the streaming `session_window` query (q62):
  * same grouping semantics, but with per-session ordinals available.
  *
  * Scale: both windows share one partitioning (the user key) — Catalyst plans
  * a single shuffle + sort and evaluates lag and the running sum in the same
  * Window stage. Tie-break on `idCol` keeps the ordering total, so session
  * ids are stable under retries.
  */
object Sessionize {

  def assign(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, gapMs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ms", lag(unix_millis(col(tsCol)), 1).over(order))
      .withColumn("__brk",
        when(col("__prev_ms").isNull ||
          unix_millis(col(tsCol)) - col("__prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .drop("__prev_ms", "__brk")
  }

  /** Per-session rollup: event count and duration per (user, session). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapMs: Long): DataFrame =
    assign(events, userCol, tsCol, idCol, gapMs)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_millis(col(tsCol))) - min(unix_millis(col(tsCol)))).as("dur_ms"))
}
