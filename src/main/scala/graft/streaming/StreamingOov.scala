package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tokenized document on a monitored route. */
case class OovDoc(route: String, tokens: Seq[String])

/** One cumulative coverage snapshot per micro-batch that touched the
  * route ([[StreamingOov.monitor]]).
  */
case class OovRow(route: String, batch_n: Long, total_tokens: Long,
    oov_tokens: Long, oov_token_share: Double)

/** Streaming OOV monitor — the online face of q255's tokenizer-coverage
  * audit, on the fixed-reference convention ([[StreamingPsi]]): the
  * reference vocabulary is computed offline by the batch gate and passed
  * in as a parameter, so per-route state is exactly TWO counters
  * (total and out-of-vocabulary token mass) no matter how long the
  * stream runs. A rising OOV share is the earliest cheap signal that a
  * route's content drifted away from the tokenizer's training corpus —
  * it fires before perplexity is even computable.
  *
  * After every micro-batch that touched a route it re-emits the route's
  * cumulative snapshot (stamped with the emission counter so consumers
  * select the latest); counters are exact integers, the share one
  * rounded division — a drained in-order stream's final row equals the
  * batch computation over the same rows (KmvSpec-style twin pin in
  * StreamingOovSpec).
  */
object StreamingOov {

  def monitor(docs: Dataset[OovDoc], refVocab: Set[String]): Dataset[OovRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.route)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (route: String, rows: Iterator[OovDoc],
         state: GroupState[(Long, Long, Long)]) =>
          var (total, oov, emitted) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { d =>
            d.tokens.foreach { t =>
              total += 1
              if (!refVocab.contains(t)) oov += 1
            }
          }
          state.update((total, oov, emitted + 1))
          val share =
            if (total == 0) 0.0 else Emit.r6(oov.toDouble / total.toDouble)
          Iterator.single(OovRow(route, emitted + 1, total, oov, share))
      }
  }
}
