package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a resampled series (same input shape as CUSUM's). */
case class ResampleEvent(key: String, ts: java.sql.Timestamp, id: Long, value: Double)

/** One emitted dense-grid row ([[StreamingResample.fillOnArrival]]). */
case class ResamplePoint(key: String, bucket: Long, value: Double, is_gap: Boolean)

/** Streaming gap-fill — the online form of
  * [[graft.operators.TimeSeries.resampleLocf]]: on each arrival, emit the
  * observation's bucket plus every EMPTY bucket since the key's previous
  * observation, carrying the previous value (fill-on-arrival — gaps
  * materialize when the series resumes, not on a timer, so the operator
  * needs no watermark and no event-time timers; a series that never
  * resumes emits no trailing gaps, exactly like the batch operator's
  * per-key [min, max] grid).
  *
  * State per key = (bucket, value) of the newest observation — two words,
  * independent of history length. Within a micro-batch rows fold in
  * (ts, id) order; the (ts, id)-max row wins a bucket, mirroring the batch
  * `max_by` contract, and an in-order stream replays the batch result
  * row-for-row (StreamingResampleSpec pins slices ≡
  * [[graft.operators.TimeSeries.resampleLocf]]). Out-of-order arrivals
  * whose bucket ≤ the settled bucket are DROPPED (admission is final — the
  * streaming-dedup posture); the batch operator is the reconciliation
  * path.
  */
object StreamingResample {

  def fillOnArrival(
      events: Dataset[ResampleEvent],
      bucketSeconds: Long): Dataset[ResamplePoint] = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ResampleEvent], state: GroupState[(Long, Double)]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[ResamplePoint]
          // floorDiv twice: getTime/1000 truncates TOWARD ZERO, which for
          // pre-1970 sub-second timestamps lands one bucket high of the
          // batch twin's floor(unix_timestamp); buckets fold in key order,
          // each bucket's (ts, id)-max row winning via maxBy below
          val byBucket = rows.toSeq
            .groupBy(e => Math.floorDiv(
              Math.floorDiv(e.ts.getTime, 1000L), bucketSeconds) * bucketSeconds)
            .toSeq.sortBy(_._1)
          byBucket.foreach { case (bucket, es) =>
            val obs = es.maxBy(e => (e.ts.getTime, e.id)).value
            last match {
              case Some((lb, lv)) if bucket <= lb => // late arrival: settled, drop
              case Some((lb, lv)) =>
                ((lb + bucketSeconds) until bucket by bucketSeconds).foreach { g =>
                  out += ResamplePoint(key, g, lv, is_gap = true)
                }
                out += ResamplePoint(key, bucket, obs, is_gap = false)
                last = Some((bucket, obs))
              case None =>
                out += ResamplePoint(key, bucket, obs, is_gap = false)
                last = Some((bucket, obs))
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
