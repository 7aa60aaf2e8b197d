package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Remaining inventory: multimodal plumbing and sketch aggregates. */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q70 — multimodal feature extraction (rows-only: the stub decoder is
    * deterministic but not SQL-expressible; MultimodalSpec covers it):
    * binary payloads → per-partition decode → per-modality stats.
    */
  def q70_multimodal: Q = (s, dir) => {
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder()).toDF()
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
           sum("n_bytes").as("total_bytes"),
           max("width").as("max_width"),
           max("duration_ms").as("max_duration_ms"))
      .orderBy("modality")
  }

  /** q71 — HLL sketch cardinalities (rows-only: approx values are
    * engine-specific; exact twins are oracle-checked in q09). The 100 TB
    * dedup-stats operator: one pass, bounded memory, no exact-distinct
    * shuffle explosion.
    */
  def q71_approx_distinct: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        approx_count_distinct("l_suppkey").as("approx_supps"),
        approx_count_distinct("l_orderkey").as("approx_orders"))
  }

  val all: Map[String, Q] = Map(
    "q70_multimodal" -> q70_multimodal,
    "q71_approx_distinct" -> q71_approx_distinct)

  val oracle: Map[String, String] = Map()
}
