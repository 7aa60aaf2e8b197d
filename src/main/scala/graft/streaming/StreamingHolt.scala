package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted Holt state ([[StreamingHolt.smooth]]). */
case class HoltPoint(key: String, id: Long, n_points: Long,
    level: Double, trend: Double, forecast: Double, sse: Double)

/** Streaming Holt linear-trend smoothing — the online form of
  * [[graft.operators.TimeSeries.holt]], the [[StreamingEwma]] convention
  * with the two-state recurrence:
  *
  *   l ← α·x + (1−α)·(l + b);  b ← β·(l_new − l_old) + (1−β)·b
  *   (init: l = first value, b = 0); sse += (x − (l + b)_before)².
  *
  * State per key is (l, b, sse, n) carried UNROUNDED across micro-batches
  * (rounding is an emission contract, not a state transition) — four
  * words, so a million monitored series stay ~32 MB of store. The SAME
  * fold as the batch twin applied incrementally: in-order delivery is
  * bit-identical (EwmaSpec pins final rows ≡ the batch summary). Rows
  * fold in (ts, id) order within each micro-batch; late events fold late,
  * the batch twin is the reconciliation path. NoTimeout — a monitor has
  * no natural expiry.
  */
object StreamingHolt {

  def smooth(
      events: Dataset[CusumEvent],
      alpha: Double,
      beta: Double): Dataset[HoltPoint] = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta > 0 && beta <= 1, s"need 0 < beta <= 1, got $beta")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CusumEvent],
         state: GroupState[(Double, Double, Double, Long)]) =>
          var (l, b, s, n) = state.getOption.getOrElse((0.0, 0.0, 0.0, 0L))
          val out = rows.toSeq.sortBy(r => (Emit.micros(r.ts), r.id)).map { r =>
            if (n == 0L) { l = r.value } else {
              val e = r.value - (l + b)
              s += e * e
              val lNew = alpha * r.value + (1 - alpha) * (l + b)
              b = beta * (lNew - l) + (1 - beta) * b
              l = lNew
            }
            n += 1
            HoltPoint(key, r.id, n, Emit.r6(l), Emit.r6(b), Emit.r6(l + b), Emit.r6(s))
          }
          state.update((l, b, s, n))
          out.iterator
      }
  }
}
