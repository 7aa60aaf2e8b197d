package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input point of a monitored series. */
case class CusumEvent(key: String, ts: java.sql.Timestamp, id: Long, value: Double)

/** One emitted score row ([[StreamingCusum.scores]]). */
case class CusumPoint(key: String, id: Long, z: Double,
    cusum_pos: Double, cusum_neg: Double, alarm: Boolean)

/** Streaming CUSUM — the online form of [[graft.operators.TimeSeries.cusum]]
  * as a stateful Structured Streaming operator.
  *
  * The reference mean/σ are FIXED parameters (classic online CUSUM monitors
  * against a known in-control distribution; estimating them from the
  * monitored stream itself is the batch operator's offline job), so the
  * per-key state is exactly two doubles: the positive and negative sums of
  * Page's recursion, carried UNROUNDED across micro-batches (rounding is an
  * emission contract, not a state transition — re-feeding rounded state
  * into the recursion would drift from the batch twin). That makes state
  * KB-per-key-independent: a million monitored series cost ~16 MB of store,
  * and `flatMapGroupsWithState` shuffles only each batch's arrivals, never
  * history.
  *
  * Event order: rows are folded in (ts, id) order WITHIN each micro-batch;
  * cross-batch order is the arrival order, the standard stateful-streaming
  * posture (a late event lands in a later batch and folds late —
  * StreamingCusumSpec pins in-order slices ≡ the batch twin
  * [[graft.operators.TimeSeries.cusumWithParams]]). NoTimeout: a CUSUM
  * monitor has no natural expiry; callers retire keys by dropping them
  * upstream.
  */
object StreamingCusum {

  def scores(
      events: Dataset[CusumEvent],
      mu: Double,
      sd: Double,
      slack: Double = 0.5,
      threshold: Double = 4.0): Dataset[CusumPoint] = {
    require(sd > 0, s"sd must be positive: $sd")
    import events.sparkSession.implicits._
    def r2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CusumEvent], state: GroupState[(Double, Double)]) =>
          var (sp, sn) = state.getOption.getOrElse((0.0, 0.0))
          val out = rows.toSeq.sortBy(e => (Emit.micros(e.ts), e.id)).map { e =>
            val z = Emit.r6((e.value - mu) / sd)
            sp = math.max(0.0, sp + (z - slack))
            sn = math.max(0.0, sn - (z + slack))
            val (p2, n2) = (r2(sp), r2(sn))
            CusumPoint(key, e.id, z, p2, n2, p2 > threshold || n2 > threshold)
          }
          state.update((sp, sn))
          out.iterator
      }
  }
}
