package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped count/sum aggregates: apply a
  * CDC delta to a materialized view WITHOUT rescanning the base table —
  * the classic IVM contract, and the step the reference's re-ingest-
  * everything posture lacks entirely (its per-key mget,
  * `ingester/es_common.py:254-271`, decides processed-or-not; nothing
  * maintains a derived aggregate).
  *
  * Two primitives:
  *  - [[signedDelta]]: the row-level change stream as SIGNED rows — an
  *    insert is (+1, new payload), a delete (−1, old payload), an update
  *    the −/+ pair (which also handles rows MOVING between groups: the
  *    −1 lands in the old group, the +1 in the new). The
  *    [[ChangeCapture.snapshotDiff]] full-outer + null-safe struct
  *    compare, kept with payloads.
  *  - [[refreshCountSum]]: group the signed rows (delta-sized), full-outer
  *    merge into the materialized view, drop groups whose count reaches
  *    zero. Work is |delta| + |view| — NEVER |base|; at 100 TB the base
  *    is petabytes while view and delta are orders smaller, and
  *    changed-groups-only materialization composes with the K5 upsert
  *    sink ([[graft.sources.Sinks.upsert]]).
  *
  * Exactness contract: counts are longs; sums must be DECIMAL in the
  * view (the caller aggregates `cast(x as decimal(p, s))`) — decimal
  * addition is associative, so view + delta equals the full recompute
  * EXACTLY, which is what q192's result-invariance oracle asserts. A
  * double sum would drift by accumulation order and the refreshed view
  * would diverge from a rescan by ulps per refresh cycle.
  */
object IncrementalView {

  /** Signed row-level delta between two keyed snapshots: payload columns
    * + `__w` (±1). Updates emit both the old (−1) and new (+1) payload.
    */
  def signedDelta(before: DataFrame, after: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    val payload = after.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "signedDelta needs at least one non-key column")
    val b = before.select(
      (keyCols.map(col) :+ struct(payload.map(col): _*).as("__b")): _*)
    val a = after.select(
      (keyCols.map(col) :+ struct(payload.map(col): _*).as("__a")): _*)
    b.join(a, keyCols, "full_outer")
      .filter(!(col("__a") <=> col("__b")))
      .select((keyCols.map(col) :+ explode(array(
        struct(col("__b").as("p"), lit(-1L).as("w")),
        struct(col("__a").as("p"), lit(1L).as("w")))).as("__e")): _*)
      .filter(col("__e.p").isNotNull)
      .select((keyCols.map(col) ++
        payload.map(c => col(s"__e.p.$c").as(c)) :+
        col("__e.w").as("__w")): _*)
  }

  /** Refresh a (count, sum) view with a [[signedDelta]] stream. `matAgg`
    * carries `groupCols` + `cntCol` (long) + `totalCol` (decimal);
    * `delta` carries `groupCols` + `valueCol` + `__w`. Vanished groups
    * (count 0) drop; groups born in the delta appear.
    */
  def refreshCountSum(matAgg: DataFrame, delta: DataFrame,
                      groupCols: Seq[String], valueCol: String,
                      cntCol: String, totalCol: String): DataFrame = {
    val totalType = matAgg.schema(totalCol).dataType
    val dp = delta
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__dc"),
        sum(col(valueCol) * col("__w")).as("__dt"))
    matAgg.join(dp, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as(cntCol) :+
        (coalesce(col(totalCol), lit(0).cast(totalType)) +
          coalesce(col("__dt"), lit(0).cast(totalType)))
          .cast(totalType).as(totalCol)): _*)
      .filter(col(cntCol) > 0)
  }
}
