package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One categorical event for the transition monitor. */
case class CatEvent(key: String, ts: Timestamp, id: Long, category: String)

/** One emitted within-session transition. */
case class TransitionHop(key: String, id: Long, from_type: String, to_type: String)

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
}
