package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Stage}
import graft.sources.Sinks

/** Incremental SEMANTIC dedup admission — the embedding twin of
  * [[StreamingDedup]]: each micro-batch is SemDeDup'd within itself
  * ([[Dedup.semanticDedup]]) and its survivors compared against everything
  * previously admitted, cell by cell; only new survivors extend the store.
  * The online form of q97, for a pipeline that embeds documents as they
  * arrive and must never admit something semantically equivalent to what
  * it already holds.
  *
  * Dataflow per batch: centroids are a broadcast literal (assignment
  * map-side, identical to the batch form); the history comparison joins
  * batch survivors to the store ON THE CELL KEY, so a batch never meets
  * more history than its own cells hold, and history×history is never
  * recomputed. State = admitted (vec_id, centroid_id, embedding) rows,
  * [[Sinks.upsert]]-keyed by vec_id — idempotent under micro-batch replay;
  * at cluster scale the store is a mergeable table bucketed by
  * `centroid_id` so this join never shuffles history.
  *
  * The store side of each cell is capped at `maxStorePerCell`
  * (deterministic lowest-id prefix — the admission-time analogue of
  * [[Dedup.jaccardBetween]]'s posting cap): a cell that accumulates more
  * admitted vectors than the cap compares new arrivals against the cap
  * prefix only — bounded work per batch at documented partial recall,
  * surfaced via an `observe` metric per the no-silent-caps convention.
  */
object StreamingSemanticDedup {

  /** Admit one batch of (vec_id, embedding[, …]) rows: returns the
    * surviving rows (with their `centroid_id`) and upserts them into the
    * store at `storePath`.
    */
  def admitBatch(
      spark: SparkSession,
      batch: DataFrame,
      cents: Array[(Long, Seq[Double])],
      storePath: String,
      threshold: Double = 0.35,
      maxBucketSize: Int = 1000,
      maxStorePerCell: Int = 10000): DataFrame = {
    val flagged = Dedup.semanticDedup(batch, cents, threshold, maxBucketSize)
    val within = flagged.filter(!col("is_dup")).drop("is_dup")
      // feeds the history comparison AND the survivor anti-join AND the
      // store update — snapshot so assignment + within-batch pairing run once
      .transform(Stage.snapshotDF)
    val survivors = readStore(spark, storePath) match {
      case Some(store) =>
        val w = Window.partitionBy("centroid_id").orderBy("vec_id")
        val over = col("__rn") > maxStorePerCell
        val capped = store.withColumn("__rn", row_number().over(w))
          .observe("graft.semStoreCap",
            sum(when(over, lit(1)).otherwise(lit(0))).as("uncompared_rows"))
          .filter(!over)
          .select(col("vec_id").as("__old_id"), col("centroid_id"),
            Similarity.toDoubleArray(col("embedding")).as("__vo"))
        val drops = within
          .select(col("vec_id"), col("centroid_id"),
            Similarity.toDoubleArray(col("embedding")).as("__vn"))
          .join(capped, Seq("centroid_id"))
          // self-pair guard (same as jaccardBetween's): an identical-id
          // replay compares only against OTHER history and is re-admitted
          // idempotently
          .filter(col("vec_id") =!= col("__old_id") &&
            Similarity.cosine(col("__vn"), col("__vo")) >= threshold)
          .select("vec_id").distinct()
        within.join(drops, Seq("vec_id"), "left_anti")
      case None => within
    }
    val out = survivors.transform(Stage.snapshotDF)
    Sinks.upsert(spark,
      out.select(col("vec_id"), col("centroid_id"), col("embedding")),
      storePath, "vec_id")
    out
  }

  /** ONLY path absence means "no history yet" — any other failure must
    * propagate (admission decisions are final; a silently-empty store
    * would permanently admit duplicates).
    */
  private def readStore(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None else Some(spark.read.parquet(path))
  }
}
