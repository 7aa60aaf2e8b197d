package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** One event of a user's activity stream (the `events` table's funnel
  * projection).
  */
case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

/** A user's current funnel chain ([[StreamingFunnel.stages]]): earliest
  * stage-completion times under the strict ordering rule, or None for
  * stages not (yet) reached. `n_seen` counts events folded so far — a
  * monotone per-user sequence number consumers use to pick the LATEST
  * emission (memory/file sinks are append logs, not keyed stores).
  */
case class FunnelStages(user_id: Long, t1: Option[Timestamp],
    t2: Option[Timestamp], t3: Option[Timestamp], n_seen: Long)

/** One first-time (user, day-offset) activity hit
  * ([[StreamingFunnel.retentionHits]]): emitted exactly once per user and
  * offset, so `count(*)` per (cohort_day, day_offset) downstream IS the
  * retention triangle's distinct-active count. `cohort_day` is an ISO
  * string (UTC) — a Date column would re-interpret through the JVM
  * default zone on the executor, silently shifting cohorts.
  */
case class RetentionHit(user_id: Long, cohort_day: String, day_offset: Int)

/** Streaming twins of the batch funnel (q137) and cohort retention (q138)
  * on the Spark 4 `transformWithState` API — the StreamingCusum
  * convention: FIXED-SPEC state per key, in-order delivery ≡ the batch
  * operator (StreamingSpec pins both on the events fixture, including
  * cross-slice replay).
  *
  *   - [[stages]]: per-user state = three stage micros + an event count —
  *     32 bytes however long the log runs. The batch form's chained
  *     min-aggregations become one left-fold: in event-time order the
  *     first qualifying event per stage IS the minimum, and the strict
  *     `>` chain gate is checked against the already-settled previous
  *     stage. A replayed or duplicate event folds into a no-op (the
  *     stage is already set), so the final state is replay-idempotent.
  *   - [[retentionHits]]: per-user state = cohort epoch-day + a 7-bit
  *     seen-offset mask (the offset cap makes the mask, and therefore
  *     the state, constant-size). First event fixes the cohort (in-order
  *     ⇒ it is the min the batch form takes); each later event emits its
  *     (cohort, offset) hit AT MOST ONCE — the changelog whose count
  *     aggregation reproduces q138's countDistinct without ever holding
  *     a distinct-user set anywhere.
  *
  * Scale shape: state stores hold O(users) fixed-width entries; each
  * micro-batch shuffles only its own arrivals, keyed by user — never
  * history, never a log-wide window. The q138 base-day/cohort-window
  * trim is a GLOBAL property of the log and deliberately stays
  * downstream of the changelog (a per-key processor cannot know the
  * global minimum; the consumer applies it to the aggregated triangle).
  */
object StreamingFunnel {

  /** (t1, t2, t3, n_seen) in micros; MinValue = unset. */
  private[streaming] case class StageTimes(t1: Long, t2: Long, t3: Long, n: Long)


  private class StageProcessor(s1: String, s2: String, s3: String)
      extends StatefulProcessor[Long, FunnelEvent, FunnelStages] {
    @transient private var st: ValueState[StageTimes] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StageTimes]("stages", Encoders.product[StageTimes],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelStages] = {
      val unset = Long.MinValue
      var cur = if (st.exists()) st.get() else StageTimes(unset, unset, unset, 0L)
      rows.toSeq.sortBy(e => Emit.micros(e.ts)).foreach { e =>
        val t = Emit.micros(e.ts)
        if (e.event_type == s1 && cur.t1 == unset) cur = cur.copy(t1 = t)
        else if (e.event_type == s2 && cur.t1 != unset && t > cur.t1 && cur.t2 == unset)
          cur = cur.copy(t2 = t)
        else if (e.event_type == s3 && cur.t2 != unset && t > cur.t2 && cur.t3 == unset)
          cur = cur.copy(t3 = t)
        cur = cur.copy(n = cur.n + 1)
      }
      st.update(cur)
      def opt(v: Long): Option[Timestamp] =
        if (v == unset) None else Some {
          val ts = new Timestamp(v / 1000); ts.setNanos((v % 1000000).toInt * 1000); ts
        }
      Iterator(FunnelStages(key, opt(cur.t1), opt(cur.t2), opt(cur.t3), cur.n))
    }
  }

  /** Per-user funnel chains, one [[FunnelStages]] emission per user per
    * micro-batch with arrivals (latest `n_seen` wins downstream).
    */
  def stages(events: Dataset[FunnelEvent],
      s1: String = "signup", s2: String = "click",
      s3: String = "purchase"): Dataset[FunnelStages] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new StageProcessor(s1, s2, s3),
        TimeMode.None(), OutputMode.Append())
  }

  /** (cohort epoch-day, 7-bit offset mask); Int.MinValue = unset (a real
    * epoch day can be negative — 1969-12-31 is −1 — so small sentinels
    * collide).
    */
  private[streaming] case class CohortMask(day: Int, mask: Int)
  private val UnsetDay = Int.MinValue

  private class RetentionProcessor(maxOffset: Int)
      extends StatefulProcessor[Long, FunnelEvent, RetentionHit] {
    @transient private var st: ValueState[CohortMask] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CohortMask]("cohort", Encoders.product[CohortMask],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    private def epochDay(t: Timestamp): Int =
      java.time.Instant.ofEpochMilli(t.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay.toInt
    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[RetentionHit] = {
      var cur = if (st.exists()) st.get() else CohortMask(UnsetDay, 0)
      val out = Seq.newBuilder[RetentionHit]
      rows.toSeq.sortBy(e => Emit.micros(e.ts)).foreach { e =>
        val d = epochDay(e.ts)
        if (cur.day == UnsetDay) cur = CohortMask(d, 0)
        val off = d - cur.day
        if (off >= 0 && off <= maxOffset && (cur.mask & (1 << off)) == 0) {
          cur = cur.copy(mask = cur.mask | (1 << off))
          out += RetentionHit(key,
            java.time.LocalDate.ofEpochDay(cur.day.toLong).toString, off)
        }
      }
      st.update(cur)
      out.result().iterator
    }
  }

  /** First-time (user, cohort, day-offset) hits, offsets capped at
    * `maxOffset` days since the user's first event.
    */
  def retentionHits(events: Dataset[FunnelEvent],
      maxOffset: Int = 6): Dataset[RetentionHit] = {
    require(maxOffset >= 0 && maxOffset <= 30, s"mask-backed offsets: $maxOffset")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor(maxOffset),
        TimeMode.None(), OutputMode.Append())
  }
}
