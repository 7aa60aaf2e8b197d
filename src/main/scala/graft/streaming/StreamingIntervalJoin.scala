package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join — the streaming face of
  * [[graft.operators.Sessionize.binnedIntervalJoin]] (q136's attribution
  * shape: per probe event, the build events of the same key within the
  * trailing window).
  *
  * Deliberately the NATIVE Structured Streaming stream-stream join, not a
  * hand-rolled `transformWithState`: when the engine is handed (a) both
  * sides watermarked on their event-time columns and (b) a time-RANGE
  * predicate between those columns, it derives per-side state watermarks
  * and EVICTS buffered rows that can no longer match — state is bounded by
  * (watermark delay + window) × arrival rate per side, not by stream
  * length. That eviction contract is exactly what a hand-rolled join would
  * have to re-prove; here it is the engine's, and the spec asserts it from
  * `StreamingQueryProgress.stateOperators` (buffered-row counts stay flat
  * across batches once the watermark advances).
  *
  * Scale shape: the join is hash-partitioned on the equi-key (same shuffle
  * as the batch form's (key, bin) join); the range predicate prunes within
  * the key's buffered rows. Inner matches stream out as soon as both sides
  * arrive; `left_outer` additionally emits the null-extended miss row — but
  * only once the probe-side watermark passes `probe.ts + window`, when "no
  * match" is final (the batch twin's anti-join miss row, made incremental).
  *
  * Late build rows beyond the watermark are dropped by eviction —
  * admission-is-final, the batch twin is the reconciliation path (the
  * StreamingResample convention).
  */
case class IntervalEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)

object StreamingIntervalJoin {

  /** Probe events joined to same-key build events with
    * `build.ts ∈ [probe.ts − windowMs, probe.ts]`.
    *
    * `probe`/`build` are STREAMING DataFrames; output columns:
    * probe's `idCol`, `keyCol`, `__p_ts`, and the matched `__b_ts`
    * (null on a `left_outer` miss). Both watermark delays bound state:
    * build rows older than `probe-watermark − window` and probe rows whose
    * window is fully past the build watermark can never match and are
    * evicted.
    */
  def attribute(
      probe: DataFrame, build: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      windowMs: Long,
      watermarkDelay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(windowMs > 0, s"need windowMs > 0, got $windowMs")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val p = probe
      .select(col(idCol), col(keyCol), col(tsCol).as("__p_ts"))
      .withWatermark("__p_ts", watermarkDelay)
    val b = build
      .select(col(keyCol).as("__b_key"), col(tsCol).as("__b_ts"))
      .withWatermark("__b_ts", watermarkDelay)
    // the BETWEEN must stay on the raw event-time columns: Spark derives
    // the state-eviction watermarks by analyzing interval arithmetic on
    // watermarked attributes — rewriting through unix_micros() would
    // keep the join correct but defeat eviction (unbounded state)
    p.join(b,
      col(keyCol) === col("__b_key") &&
        col("__b_ts") >= col("__p_ts") - expr(s"INTERVAL $windowMs MILLISECOND") &&
        col("__b_ts") <= col("__p_ts"),
      joinType)
      .drop("__b_key")
  }
}
