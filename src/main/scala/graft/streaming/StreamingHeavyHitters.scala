package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** One token observation of a grouped stream; `seq` orders arrivals
  * within a micro-batch (MG is fold-order-dependent, so the order must
  * be explicit for the result to be well-defined).
  */
case class TokenEvent(group: String, seq: Long, token: String)

/** One live Misra–Gries counter ([[StreamingHeavyHitters.sketch]]):
  * `count_lb` is a LOWER bound on the token's true frequency among the
  * group's first `n_processed` events, under-counting by at most
  * n/(k+1); consumers pick the rows with the highest `n_processed` per
  * group for the current sketch.
  */
case class HeavyHitterRow(group: String, token: String, count_lb: Long, n_processed: Long)

/** Streaming Misra–Gries heavy hitters — the online face of the batch
  * `MgHeavyHitters` aggregate (q135) as a `transformWithState` operator:
  * per-group state is AT MOST k counters (the classic MG invariant), so
  * a million monitored groups cost megabytes however long the stream
  * runs, and each micro-batch shuffles only its own arrivals.
  *
  * The fold is [[graft.functions.MgBuffer.add]] — the SAME update the
  * batch aggregate runs — applied in `seq` order within each batch, so
  * the streamed sketch after in-order delivery is BIT-IDENTICAL to a
  * single-threaded MG fold over the whole sequence (spec-pinned; the
  * batch aggregate itself merges partition summaries in partition order
  * and is a different, equally valid summary of the same stream — both
  * obey the N/(k+1) bound, which is the actual contract). Every true
  * heavy hitter (freq > n/(k+1)) is guaranteed present with
  * count_lb ∈ [freq − n/(k+1), freq].
  *
  * Delivery semantics: state advances once per processed micro-batch
  * under the engine's checkpointed exactly-once contract (a batch
  * re-run after failure resumes FROM THE PRIOR STATE VERSION, not on
  * top of its own effects). Unlike the funnel/retention twins, the MG
  * fold is not idempotent against a source that REDELIVERS the same
  * rows as new data — counts inflate; feed it from a replay-tracking
  * source, which is what Structured Streaming sources are.
  */
object StreamingHeavyHitters {

  private[streaming] case class MgState(counts: Map[String, Long], n: Long)

  private class MgProcessor(k: Int)
      extends StatefulProcessor[String, TokenEvent, HeavyHitterRow] {
    @transient private var st: ValueState[MgState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MgState]("mg", Encoders.product[MgState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[TokenEvent],
        timerValues: TimerValues): Iterator[HeavyHitterRow] = {
      val prev = if (st.exists()) st.get() else MgState(Map.empty, 0L)
      val buf = new graft.functions.MgBuffer(k)
      prev.counts.foreach { case (t, c) => buf.counts.update(t, c) }
      var n = prev.n
      rows.toSeq.sortBy(_.seq).foreach { e => buf.add(e.token); n += 1 }
      st.update(MgState(buf.counts.toMap, n))
      val total = n
      buf.counts.iterator.map { case (t, c) => HeavyHitterRow(key, t, c, total) }
    }
  }

  /** Per-group live MG sketch: each micro-batch with arrivals re-emits
    * the group's current counters tagged with `n_processed`.
    */
  def sketch(tokens: Dataset[TokenEvent], k: Int = 16): Dataset[HeavyHitterRow] = {
    require(k >= 1, s"need k >= 1: $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.groupByKey(_.group)
      .transformWithState(new MgProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
