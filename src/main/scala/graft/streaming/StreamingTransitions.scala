package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One categorical event for the transition monitor. */
case class CatEvent(key: String, ts: Timestamp, id: Long, category: String)

/** One emitted within-session transition. */
case class TransitionHop(key: String, id: Long, from_type: String, to_type: String)

/** One emitted within-session trigram path. */
case class TrigramHop(key: String, id: Long, t1: String, t2: String, t3: String)

/** Streaming within-session transitions — the online face of
  * [[graft.operators.Sessionize.transitionMatrix]]: per key, carry the
  * LAST event (timestamp + category, two words of state) and emit a
  * (from, to) hop whenever the next arrival lands within `gapMs` — the
  * same break rule, so a session boundary never fabricates a hop. The
  * emitted hop stream feeds any downstream count (a streaming groupBy or
  * the batch matrix); counts over in-order delivery equal the batch
  * matrix's `n` exactly (spec-pinned). Rows fold in (ts, id) order within
  * a micro-batch; late events hop against whatever state stands — the
  * batch twin is the reconciliation path. NoTimeout: a transition monitor
  * has no natural expiry.
  */
object StreamingTransitions {

  def hops(events: Dataset[CatEvent], gapMs: Long): Dataset[TransitionHop] = {
    require(gapMs > 0, s"need gapMs > 0, got $gapMs")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CatEvent],
         state: GroupState[(Long, String)]) =>
          var last = state.getOption
          val out = rows.toSeq.sortBy(r => (Emit.micros(r.ts), r.id)).flatMap { r =>
            val ms = r.ts.getTime
            val hop = last.collect {
              case (pms, pty) if ms - pms <= gapMs =>
                TransitionHop(key, r.id, pty, r.category)
            }
            last = Some((ms, r.category))
            hop
          }
          state.update(last.get)
          out.iterator
      }
  }

  /** Streaming trigram paths — the online face of
    * [[graft.operators.Sessionize.sessionTrigrams]]: per key the last
    * TWO events (four words of state) and a (t₁, t₂, t₃) emission when
    * BOTH hops land within `gapMs` — the q236 double-gap rule applied
    * incrementally, so a session boundary never fabricates a path.
    * A gap-breaking arrival still becomes the new "last" (it can start
    * the next path); counts over in-order delivery equal the batch
    * trigram counts exactly (spec-pinned).
    */
  def trigrams(events: Dataset[CatEvent], gapMs: Long): Dataset[TrigramHop] = {
    require(gapMs > 0, s"need gapMs > 0, got $gapMs")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CatEvent],
         state: GroupState[((Long, String), (Long, String))]) =>
          // state = (second-to-last, last); sentinel ms = Long.MinValue
          val none = (Long.MinValue, "")
          var (p2, p1) = state.getOption.getOrElse((none, none))
          val out = rows.toSeq.sortBy(r => (Emit.micros(r.ts), r.id)).flatMap { r =>
            val ms = r.ts.getTime
            val hop =
              if (p2._1 != Long.MinValue && p1._1 != Long.MinValue &&
                  ms - p1._1 <= gapMs && p1._1 - p2._1 <= gapMs)
                Some(TrigramHop(key, r.id, p2._2, p1._2, r.category))
              else None
            p2 = p1
            p1 = (ms, r.category)
            hop
          }
          state.update((p2, p1))
          out.iterator
      }
  }
}
