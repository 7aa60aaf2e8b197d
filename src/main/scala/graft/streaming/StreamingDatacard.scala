package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalAgg
import graft.sources.Sinks

/** Continuously-maintained corpus data card: the streaming face of
  * [[IncrementalAgg]].
  *
  * Each micro-batch is reduced to its KB-sized per-source partial state
  * (counters + HLL vocabulary sketch) and appended as its own batch-store
  * partition ([[Sinks.appendBatchPartition]] — a replayed batchId
  * overwrites its own partition with identical deterministic content, so
  * the card can never double-count). The current card is resolved on read
  * by merging the live partials; because partial rows are MERGEABLE, the
  * store compaction cadence composes for free — a compacted union of
  * partial rows is itself a valid partial set, no special merge logic.
  * At 100 TB this is the monitoring loop's cost model: O(batch) work per
  * trigger + a KB-sized merge on read, with corpus history never
  * rescanned (the reference re-reads everything for any statistic —
  * `ingester/__main__.py` has no cross-batch state at all).
  */
object StreamingDatacard {

  /** Drain `docs` with AvailableNow, appending one partial partition per
    * micro-batch; compaction every `compactEvery` batches bounds file
    * count without touching the current (replayable) partition.
    */
  def start(
      docs: DataFrame,
      storePath: String,
      checkpointDir: String,
      lgK: Int = 12,
      compactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Sinks.compactBatchStore(spark, storePath, upToBatch = batchId)
        Sinks.appendBatchPartition(
          spark, IncrementalAgg.datacardPartials(batch, lgK), storePath, batchId)
      }
      .start()

  /** The card as of the last committed batch (None before any commit). */
  def card(spark: SparkSession, storePath: String): Option[DataFrame] =
    Sinks.readBatchStore(spark, storePath)
      .map(p => IncrementalAgg.finalizeCard(IncrementalAgg.mergePartials(Seq(p))))
}
