package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed value of a monitored numeric column (`group` names the
  * monitored slice — a column, a source, a model route).
  */
case class PsiEvent(group: String, value: Double)

/** One per-bin snapshot row emitted after each micro-batch that touched
  * the group ([[StreamingPsi.monitor]]); `psi_term` sums to the group's
  * current PSI.
  */
case class PsiBinRow(group: String, batch_n: Long, bin: Long, n_cur: Long,
    cur_frac: Double, psi_term: Double)

/** Streaming PSI monitor — the online face of
  * [[graft.operators.Checks.populationStability]], completing the drift
  * family's streaming side (CUSUM → [[StreamingCusum]], EWMA →
  * [[StreamingEwma]], PSI → here).
  *
  * The reference profile is FIXED (the [[StreamingCusum]] convention:
  * boundaries from `Checks.referenceBins` + the reference fractions,
  * both computed offline by the batch gate and passed in as parameters),
  * so per-group state is exactly the `bins` current-snapshot counters —
  * KBs for thousands of monitored slices, shuffling only each batch's
  * arrivals. After every micro-batch that touched a group it re-emits the
  * group's full per-bin snapshot (bins rows, stamped with a running
  * emission counter so consumers can select the latest), each row carrying
  * the SAME ε-smoothed rounded `psi_term` the batch gate computes — the
  * identical IEEE expression order, so a drained in-order stream's final
  * snapshot is bit-identical to the batch result (StreamingPsiSpec).
  *
  * A value exactly ON a boundary bins LOW (strict `>` against each
  * boundary) — the batch contract.
  */
object StreamingPsi {

  def monitor(
      events: Dataset[PsiEvent],
      bounds: Seq[Double],
      refFracs: Seq[Double],
      epsilon: Double = 1e-6): Dataset[PsiBinRow] = {
    require(bounds == bounds.sorted, s"bounds must ascend: $bounds")
    require(refFracs.length == bounds.length + 1,
      s"need ${bounds.length + 1} reference fractions, got ${refFracs.length}")
    require(epsilon > 0, s"need epsilon > 0: $epsilon")
    import events.sparkSession.implicits._
    val bins = refFracs.length
    events.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[PsiEvent],
         state: GroupState[(Seq[Long], Long)]) =>
          val (cnt0, emitted) = state.getOption.getOrElse((Seq.fill(bins)(0L), 0L))
          val counts = cnt0.toArray
          rows.foreach { e =>
            var b = 0
            while (b < bounds.length && e.value > bounds(b)) b += 1
            counts(b) += 1
          }
          state.update((counts.toSeq, emitted + 1))
          val total = counts.sum
          (0 until bins).iterator.map { b =>
            // the batch gate's exact expression grouping: smooth FIRST,
            // difference and ratio on the smoothed values
            val qf = counts(b).toDouble / total.toDouble
            val p = refFracs(b) + epsilon
            val q = qf + epsilon
            PsiBinRow(group, emitted + 1, b.toLong, counts(b),
              Emit.r6(qf), Emit.r6((p - q) * math.log(p / q)))
          }
      }
  }
}
