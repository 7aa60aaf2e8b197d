package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Stage}
import graft.sources.Sinks

/** Continuously-maintained component snapshot: the streaming face of
  * [[Dedup.componentSnapshot]], on the [[StreamingKmv]] batch-store
  * partials contract — the 100 TB dedup-maintenance loop as a running
  * job instead of a nightly rebuild.
  *
  * Each micro-batch carries NEW PAIRS (id_a, id_b — from an upstream
  * candidate+verify pass, e.g. [[StreamingDedup]]'s batch×history
  * compare). Per trigger: the prior snapshot is reconstructed from
  * partitions STRICTLY BELOW this batchId, grown through
  * [[Dedup.updateComponentSnapshot]]'s incremental-CC path (work is
  * (labels + batch pairs)-sized — history never re-shingles), and only
  * the DELTA (new or re-labeled memberships) is appended as this
  * batch's own partition. Reconstructing the prior from `< batchId`
  * partitions is what makes replay idempotent: a re-delivered batchId
  * sees the identical prior state, derives the identical delta, and
  * overwrites its own partition with identical content — the store can
  * never double-apply a batch.
  *
  * Compaction composes because reconstruction keys on the row-resident
  * `snap_batch` column, not the partition directory: merged partitions
  * reconstruct identically ([[Dedup.readComponentSnapshot]]).
  *
  * `docs` is the static document dimension (id + carried size column);
  * growth-only contract as the batch operator: memberships are never
  * removed, components only merge.
  */
object StreamingComponents {

  def start(
      pairs: DataFrame,
      docs: DataFrame,
      storePath: String,
      checkpointDir: String,
      compactEvery: Int = 16): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Sinks.compactBatchStore(spark, storePath, upToBatch = batchId)
        // prior = the snapshot as of the last batch BELOW this id —
        // never this batch's own (possibly half-written) partition
        val prior =
          if (batchId == 0) None
          else Dedup.readComponentSnapshot(spark, storePath, batchId - 1)
            .map(Stage.snapshotDF)
        val grown = prior match {
          case None => Dedup.componentSnapshot(batch, docs)
          case Some(p) => Dedup.updateComponentSnapshot(p, batch, docs)
        }
        Dedup.writeComponentSnapshot(spark,
          Dedup.snapshotDelta(prior, grown), storePath, batchId)
      }
      .start()

  /** The snapshot as of the last COMMITTED batch (None before any).
    * Crash-consistent without a drain requirement:
    * [[Dedup.readComponentSnapshot]] reads only commit-marked
    * partitions (`_graft_committed`, committer-config-independent), so
    * a torn mid-crash delta (internally inconsistent
    * for a LWW store — some members of a merge relabeled, others not,
    * unlike a KMV partial where any subset is still a valid partial)
    * is invisible; the read falls back to the previous committed
    * version until the replayed batch rewrites the partition.
    */
  def current(spark: SparkSession, storePath: String): Option[DataFrame] =
    Dedup.readComponentSnapshot(spark, storePath)
}
