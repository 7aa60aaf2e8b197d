package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{AnnotationPipeline, NlpService}

/** The reference's entry point as ONE runnable streaming job: the
  * composition `/root/reference/ingester/__main__.py:128` builds from its
  * config (source indexer → NLP service → annotations indexer → sink
  * indexer, driven by `index_range`) re-expressed as a single Structured
  * Streaming pipeline:
  *
  *   file source (S1/S2, the date-segment loop B1 as micro-batches)
  *   → F1 short-text filter
  *   → F2 already-processed gate (`dropDuplicatesWithinWatermark` — bounded
  *     state instead of one sink RPC per document)
  *   → U1 pooled-tagger annotate via `mapPartitions` (B4 per-doc isolation)
  *   → X1 flat one-record-per-annotation explode
  *   → P1/P2 `meta.`/`nlp.` projection with the composite `_id` key
  *   → K5 idempotent upsert sink (`Trigger.AvailableNow` = drain-and-stop,
  *     the catch-up semantics of the reference's `index_range`).
  *
  * `Trigger.AvailableNow` makes one invocation process the current backlog
  * and exit — re-running later picks up new files only (checkpointed file
  * log), which is exactly the reference's repeated-batch operating mode.
  */
object DriveStreaming {

  /** The document row carried INTO the typed annotate stage: doc identity,
    * text, and the persist-fields the projection keeps. Meta fields ride
    * along through `mapPartitions` because the batch path's alternative —
    * window-based `withAnnId` then a join back to the source — is not
    * streaming-expressible (window functions are unsupported on streams),
    * and the tagger already assigns the per-doc running annotation id (P4).
    */
  case class SrcDoc(doc_id: Long, text: String, lang: String, source: String)

  /** One flat annotation record (X1 output shape). */
  case class FlatAnn(
      doc_id: Long, lang: String, source: String,
      ann_id: Long, cui: String, detected_name: String, source_value: String,
      acc: Double, ann_start: Long, ann_end: Long)

  /** Persist-fields (`meta.`) and annotation fields (`nlp.`) of the driven
    * pipeline — the equivalent of the reference mapping's
    * `persist-fields` / annotation field list.
    */
  val PersistFields: Seq[String] = Seq("doc_id", "lang", "source")
  val AnnFields: Seq[String] =
    Seq("ann_id", "cui", "detected_name", "source_value", "acc", "ann_start", "ann_end")

  /** The full streaming transform: F1 → F2 → U1 → X1 → P1/P2. Input must
    * carry `doc_id`, `text`, the meta fields, and `eventTimeCol` (the
    * reference's batch date field). Output: `_id` + `meta.*` + `nlp.*`,
    * ready for [[StreamingPipeline.startUpsertSink]].
    */
  def annotationStream(
      docs: DataFrame,
      tagger: NlpService.Tagger,
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deduped = AnnotationPipeline.filterValidText(docs)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("doc_id")
    val typed = deduped
      .select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .as[SrcDoc]
    // U1: one tagger instance per partition (the pooled-client shape of
    // NlpService.annotate); B4: a throwing document contributes no records
    // instead of failing the batch.
    val flat = typed.mapPartitions { it =>
      it.flatMap { d =>
        val anns =
          try tagger.annotate(NlpService.Doc(d.doc_id, d.text))
          catch { case _: Exception => Seq.empty[NlpService.Annotation] }
        anns.map(a => FlatAnn(d.doc_id, d.lang, d.source,
          a.id, a.cui, a.detected_name, a.source_value, a.acc, a.start, a.end))
      }
    }.toDF()
    AnnotationPipeline.projectFlat(flat, PersistFields, AnnFields)
  }

  /** Start the composed job over a parquet path. Returns the running query
    * (AvailableNow: it stops itself once the backlog drains).
    */
  def start(
      spark: SparkSession,
      docsPath: String,
      sinkPath: String,
      checkpointDir: String,
      tagger: NlpService.Tagger,
      eventTimeCol: String = "ts"): StreamingQuery = {
    val schema = spark.read.parquet(docsPath).schema
    // the file stream source only accepts directories/globs — a concrete
    // file path (TESTDATA ships documents.parquet as one file) streams as
    // its parent directory filtered to that one file
    val f = new java.io.File(docsPath)
    val source0 =
      if (f.isFile)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", f.getName).parquet(f.getParent)
      else StreamingPipeline.docStream(spark, docsPath, schema)
    // TESTDATA documents carry no date column; a deterministic per-doc
    // timestamp stands in for the reference's batch date field when the
    // source lacks one. Offset by one day: a row whose event time equals
    // the initial watermark (epoch 0) is treated as expired by
    // dropDuplicatesWithinWatermark and silently dropped (bit doc_id=0).
    val source =
      if (source0.columns.contains(eventTimeCol)) source0
      else source0.withColumn(eventTimeCol,
        timestamp_millis(col("doc_id") + lit(86400000L)))
    val annotated = annotationStream(source,
      tagger, eventTimeCol)
    StreamingPipeline.startUpsertSink(annotated, sinkPath, "_id", checkpointDir)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val sink = args.lift(1).getOrElse(
      Files.createTempDirectory("graft-stream-sink").toString + "/annotations")
    val ckpt = args.lift(2).getOrElse(
      Files.createTempDirectory("graft-stream-ckpt").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = start(spark, s"$srcDir/documents.parquet", sink, ckpt,
      new NlpService.MockTagger(AnnotationPipeline.DefaultTerms))
    q.awaitTermination()
    val n = spark.read.parquet(sink).count()
    println(s"[drive-streaming] $n annotation records in $sink (checkpoint $ckpt)")
    spark.stop()
  }
}
