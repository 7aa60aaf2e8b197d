package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.PipelineConfig
import graft.sources.Sinks

/** B1 — the reference's top-level run loop (`index_range`,
  * `ingester/annotations_indexer.py:842-861`): advance through
  * `[dateStart, dateEnd)` in `intervalDays` steps, process each segment as a
  * bounded job, write to the configured sink mode.
  *
  * Differences from the reference, by design:
  *  - segments are half-open `[segStart, segEnd)` — each document processed
  *    exactly once (the reference's inclusive ends double-read boundary
  *    days);
  *  - the per-segment document set is a pushed-down partition-prunable
  *    filter, not a driver-materialized id list
  *    (`ingester/es_common.py:290-292` collects every id to the driver —
  *    at 100 TB that is the first thing to break);
  *  - parallelism is data partitioning, not a 128-thread pool.
  */
object BatchRunner {

  /** Half-open date segments covering [start, end). */
  def segments(start: LocalDate, end: LocalDate, intervalDays: Int): Seq[(LocalDate, LocalDate)] =
    Iterator.iterate(start)(_.plusDays(intervalDays.toLong))
      .takeWhile(_.isBefore(end))
      .map { s =>
        val e = s.plusDays(intervalDays.toLong)
        (s, if (e.isAfter(end)) end else e)
      }
      .toSeq

  /** One segment's pipeline: scan (date-pruned) → F1 → [F2 anti-join] →
    * annotate → ann ids → flat/nested projection. Returns the
    * ready-to-write records.
    */
  def processSegment(
      spark: SparkSession,
      cfg: PipelineConfig,
      tagger: NlpService.Tagger,
      seg: Option[(LocalDate, LocalDate)]): DataFrame = {
    var docs = spark.read.parquet(cfg.sourcePath)
    seg.foreach { case (s, e) =>
      docs = docs.filter(
        col(cfg.dateField) >= lit(s.toString) && col(cfg.dateField) < lit(e.toString))
    }
    docs = docs.filter(
      col(cfg.textField).isNotNull && length(col(cfg.textField)) >= cfg.minTextLen)
    if (cfg.checkAlreadyProcessed) {
      val sink =
        try Some(spark.read.parquet(cfg.sinkPath))
        catch { case _: Exception => None }
      sink.foreach { sk =>
        docs = AnnotationPipeline.filterAlreadyProcessed(
          docs, sk, cfg.docIdField, s"`meta.${cfg.docIdField}`")
      }
    }
    val anns = AnnotationPipeline.withAnnId(
      NlpService.annotateAndExplode(spark, docs
        .withColumnRenamed(cfg.docIdField, "doc_id")
        .withColumnRenamed(cfg.textField, "text"), tagger)
        .withColumnRenamed("detected_name", "term")
        .withColumnRenamed("start", "ann_start")
        .withColumnRenamed("end", "ann_end"))
    val annFields = Seq("id", "cui", "term", "ann_start", "ann_end", "source_value", "acc")
      .filter(anns.columns.contains) :+ "ann_id"
    if (cfg.useNestedObjects)
      AnnotationPipeline.projectNested(anns, Seq("doc_id"), annFields)
    else
      AnnotationPipeline.projectFlat(anns, Seq("doc_id"), annFields)
  }

  /** The full run: segment loop → per-segment upsert (or single append when
    * no date range is configured).
    */
  def run(spark: SparkSession, cfg: PipelineConfig, tagger: NlpService.Tagger): Unit = {
    val segs: Seq[Option[(LocalDate, LocalDate)]] = (cfg.dateStart, cfg.dateEnd) match {
      case (Some(s), Some(e)) =>
        segments(LocalDate.parse(s), LocalDate.parse(e), cfg.intervalDays).map(Some(_))
      case _ => Seq(None)
    }
    segs.zipWithIndex.foreach { case (seg, i) =>
      val out = processSegment(spark, cfg, tagger, seg)
      cfg.splitIndexByField match {
        case Some(f) =>
          // overwrite only on the first segment — later segments append, so
          // the loop accumulates instead of truncating the sink each pass
          val mode = if (i == 0) org.apache.spark.sql.SaveMode.Overwrite
                     else org.apache.spark.sql.SaveMode.Append
          Sinks.writePartitioned(out, cfg.sinkPath, f, mode)
        case None => Sinks.upsert(spark, out, cfg.sinkPath, "_id")
      }
    }
  }
}
