package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest provenance: per-file manifests from the scan's own hidden
  * `_metadata` columns (`file_name`, `row_index` — Spark's constant/
  * generated metadata attributes, produced by the parquet reader itself,
  * not read from disk).
  *
  * The reference records per-batch provenance by stamping each emitted
  * record with its source index and ingest timestamp
  * (`ingester/annotations_indexer.py:214-230` meta fields); the engine-side
  * equivalent a 100 TB ingest actually needs is a MANIFEST: for every
  * physical input file, how many rows it contributed, the key range it
  * covers, and whether the reader's row numbering is intact — the audit
  * artifact that makes a later "which file did this bad row come from"
  * question a lookup instead of a rescan.
  *
  * Scale shape: the only work is one column-pruned scan per table reading
  * the KEY column alone (`ReadSchema` shows a single physical column —
  * `file_name`/`row_index` are attached by the reader at no I/O cost), a
  * partial aggregation that collapses map-side to one row per file, and a
  * final shuffle of |files| rows — thousands of rows for a 100 TB table,
  * never data-sized. Contiguity is checked per file as
  * `min(row_index) = 0 ∧ max(row_index) = n − 1` (row_index is unique
  * within a file by construction, so the range test is exact).
  */
object Provenance {

  /** One manifest row per (table, physical file): row count, key range,
    * and row-index integrity. `tables` maps table name → key column.
    */
  /** The manifest as a LAZY plan — caller must hold the nanos conf (see
    * [[ingestManifest]], which scopes it); exposed separately so the
    * PlanSpec one-column-per-table pin can inspect the scan shape that
    * the public operator's eager snapshot otherwise hides.
    */
  private[graft] def manifestPlan(
      spark: SparkSession, dir: String,
      tables: Seq[(String, String)]): DataFrame =
    tables.map { case (t, keyCol) =>
      spark.read.parquet(s"$dir/$t.parquet")
        .select(
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("__ri"),
          col(keyCol).cast("long").as("__k"))
        .groupBy("file_name")
        .agg(
          count(lit(1)).as("n_rows"),
          min("__k").as("key_min"),
          max("__k").as("key_max"),
          (min("__ri") === lit(0L) &&
            max("__ri") === count(lit(1)) - lit(1L)).as("row_index_ok"))
        .select(lit(t).as("table_name"), col("file_name"), col("n_rows"),
          col("key_min"), col("key_max"), col("row_index_ok"))
    }.reduce(_ unionByName _)
      .orderBy("table_name", "file_name")

  def ingestManifest(
      spark: SparkSession, dir: String,
      tables: Seq[(String, String)]): DataFrame = {
    // pre-round-10 generators shipped events.ts as TIMESTAMP(NANOS); the
    // legacy conf lets schema conversion accept it (see Tables.events) —
    // the column itself is pruned away here, only the key is read. The
    // conf is SCOPED: the manifest (file-count-sized) is materialized
    // eagerly inside the saved/restored window, so the operator does not
    // permanently change parquet timestamp decoding for the session
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try Stage.snapshotDF(manifestPlan(spark, dir, tables))
    finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
