package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.QuantileSketch
import graft.sources.Sinks

/** Continuously-maintained quantile sketch: the streaming face of
  * [[QuantileSketch]], on the [[StreamingDatacard]] partials contract.
  *
  * Each micro-batch reduces to its decimal-mantissa bucket counts (a
  * ≤ ~1.7k-row partial — KBs) appended as its own batch-store
  * partition; a replayed batchId overwrites its own partition with
  * identical deterministic content, so replays can never distort the
  * sketch. The current quantiles are resolved on read by
  * merge-by-count-addition → cumulative → rank pick. Fixed boundaries
  * make the streaming face STRICTLY exact: the merged sketch — and
  * therefore every estimate — is bit-identical to the one-shot batch
  * sketch over the same rows (QuantileSketchSpec pins it; unlike
  * [[StreamingKmv]], no column narrows its meaning). Store compaction
  * composes for free: a union of bucket partials is a bucket partial.
  * O(batch) work per trigger, KB merge on read, history never
  * rescanned.
  */
object StreamingQuantile {

  def start(
      df: DataFrame,
      valueCol: String,
      storePath: String,
      checkpointDir: String,
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
          spark, QuantileSketch.sketch(batch, valueCol), storePath, batchId)
      }
      .start()

  /** Quantiles as of the last committed batch (None before any). */
  def estimate(
      spark: SparkSession, storePath: String,
      percentiles: Seq[Int] = Seq(50, 90, 99)): Option[DataFrame] =
    Sinks.readBatchStore(spark, storePath)
      .map(p => QuantileSketch.estimate(QuantileSketch.merge(p), percentiles))
}
