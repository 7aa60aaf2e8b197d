package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted smoothed point ([[StreamingEwma.smooth]]). */
case class EwmaPoint(key: String, id: Long, n_points: Long,
    ewma: Double, breach: Boolean, n_breaches: Long)

/** Streaming EWMA control chart — the online form of
  * [[graft.operators.TimeSeries.ewma]], the [[StreamingCusum]] convention
  * applied to the smoothing recursion:
  *
  *   ewma ← α·x + (1−α)·ewma   (init: first value),
  *   breach ⇔ |x − ewma_before| > threshold.
  *
  * State per key is (ewma, n, breaches) — the EWMA carried UNROUNDED
  * across micro-batches (rounding is an emission contract, not a state
  * transition), so a million monitored series cost ~24 MB of store and the
  * shuffle moves only each batch's arrivals. Where the batch twin collects
  * a key's whole history into one fold, this is the SAME fold applied
  * incrementally: in-order delivery is bit-identical
  * (StreamingEwmaSpec pins final rows ≡ the batch summary). Rows fold in
  * (ts, id) order within each micro-batch; cross-batch order is arrival
  * order — late events fold late, the batch twin is the reconciliation
  * path. NoTimeout: a control chart has no natural expiry.
  */
object StreamingEwma {

  def smooth(
      events: Dataset[CusumEvent],
      alpha: Double,
      threshold: Double): Dataset[EwmaPoint] = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(threshold > 0, s"need threshold > 0, got $threshold")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CusumEvent],
         state: GroupState[(Double, Long, Long)]) =>
          var (e, n, b) = state.getOption.getOrElse((0.0, 0L, 0L))
          val out = rows.toSeq.sortBy(r => (Emit.micros(r.ts), r.id)).map { r =>
            val breach = n > 0L && math.abs(r.value - e) > threshold
            e = if (n == 0L) r.value else alpha * r.value + (1 - alpha) * e
            n += 1
            if (breach) b += 1
            EwmaPoint(key, r.id, n, Emit.r6(e), breach, b)
          }
          state.update((e, n, b))
          out.iterator
      }
  }
}
