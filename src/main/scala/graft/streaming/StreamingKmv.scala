package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Kmv
import graft.sources.Sinks

/** Continuously-maintained distinct-count sketch: the streaming face of
  * [[Kmv]], on the [[StreamingDatacard]] partials contract.
  *
  * Each micro-batch reduces to its k smallest distinct finalized hashes
  * (a ≤k-row partial — KBs) appended as its own batch-store partition; a
  * replayed batchId overwrites its own partition with identical
  * deterministic content, so replays can never distort the sketch. The
  * current estimate is resolved on read by union→distinct→k-smallest —
  * valid because every GLOBAL k-minimum survives its own batch's cut, so
  * the merged sketch is bit-identical to the batch sketch over the same
  * rows (KmvSpec pins it), and store compaction composes for free (a
  * union of partials is a partial). O(batch) work per trigger, KB merge
  * on read, history never rescanned.
  *
  * The resolved `n_hashes` counts SKETCH-RESIDENT hashes (≤ Σ per-batch
  * k), not the corpus's full distinct-hash count — the one column whose
  * meaning narrows in the streaming face (a stream cannot afford the
  * exact audit column either; run [[Kmv.kmvDistinct]] offline for that).
  */
object StreamingKmv {

  def start(
      df: DataFrame,
      keyCol: String,
      storePath: String,
      checkpointDir: String,
      k: Int = 256,
      compactEvery: Int = 16): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Sinks.compactBatchStore(spark, storePath, upToBatch = batchId)
        Sinks.appendBatchPartition(
          spark, Kmv.partial(batch, keyCol, k), storePath, batchId)
      }
      .start()

  /** The estimate as of the last committed batch (None before any). */
  def estimate(spark: SparkSession, storePath: String, k: Int = 256): Option[DataFrame] =
    Sinks.readBatchStore(spark, storePath)
      .map(p => Kmv.estimateFromHashes(p.select("h"), k))
}
