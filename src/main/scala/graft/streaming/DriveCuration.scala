package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{AnnotationPipeline, NlpService, TextAnalysis, IncrementalAgg}
import graft.sources.{EsRest, Sinks}

/** The curation north star as ONE streaming job: a documents stream runs
  * quality gate → near-dup admission → datacard partials → annotate →
  * scripted ES upsert under a SINGLE checkpoint, so "build the training
  * corpus continuously" is one `start()` call instead of three separately
  * checkpointed pipelines racing each other.
  *
  * Per micro-batch (one `foreachBatch` body, driver-side; the heavy work
  * fans out through the operators it composes):
  *
  *  1. **Gate** — q95's quality contract (token count ≥ `minTokens` ∧
  *     stopword ratio ≤ `maxStopwordRatio`), stateless map-side work.
  *  2. **Admission** — [[StreamingDedup.admitBatch]]: within-batch +
  *     batch-vs-history near-dup dedup against the append-only shingle
  *     store at `storePath`, batchId-keyed partitions (replay overwrites
  *     its own partition with identical content).
  *  3. **Datacard** — [[IncrementalAgg.datacardPartials]] of the batch's
  *     SURVIVORS appended to `cardPath` under the same batchId; the card
  *     is resolved on read by merging partials (associative/commutative,
  *     so batch boundaries never change it).
  *  4. **Sink** — survivors annotated (U1 pooled tagger, B4 per-doc error
  *     isolation) and committed via [[EsRest.bulkUpsertAnnotations]] — the
  *     reference's K5 scripted upsert — when an [[EsRest.EsConf]] is
  *     given, else the parquet K5 face ([[Sinks.upsert]]).
  *
  * Replay safety is the composition of each stage's own idempotence, all
  * keyed by the ONE checkpoint's batchId: a replayed batch re-derives the
  * same survivors (history excludes the current batchId), overwrites the
  * same store partitions, and the ES script replaces the annotations array
  * wholesale — so at-least-once delivery converges to the same three end
  * states (admission store, card store, index). This is the streaming
  * equivalence of the q95 batch composition: same gate, same dedup
  * survivor policy (greedy keep-lowest-id, exact on clique-shaped
  * clusters), same accounting — pinned in DriveCurationSpec.
  *
  * At 100 TB the shape holds stage by stage: the gate is map-side, the
  * admission store grows O(corpus) but each batch touches O(batch)
  * postings + one bucket-local index join, the card is KB-sized partials,
  * and the sink posts per-partition NDJSON chunks — no driver
  * materialization anywhere (`admitBatch` and the stores move data
  * executor-side; this body only sequences them).
  */
object DriveCuration {

  /** One micro-batch of the curation composition. Public so specs (and a
    * recovery path) can drive the exact foreachBatch body directly —
    * Spark calls it with the SAME batchId on replay. Returns (survivors
    * admitted, docs failed at the sink).
    *
    * `countSurvivors = false` skips the survivor count (returns −1 in its
    * place): the count is a snapshot re-read, not a recompute, but it is
    * still one whole extra job per trigger — exactly the stage-dispatch
    * constant the ConstantProfile attribution table prices — paid for a
    * return value the streaming driver drops. [[start]] passes false;
    * direct callers that want the number keep the default.
    */
  def curateBatch(
      spark: SparkSession,
      batch: DataFrame,
      storePath: String,
      cardPath: String,
      sink: CurationSink,
      tagger: NlpService.Tagger,
      batchId: Long,
      minTokens: Long = 40L,
      maxStopwordRatio: Double = 0.08,
      shingleK: Int = 3,
      threshold: Double = 0.6,
      lgK: Int = 12,
      countSurvivors: Boolean = true): (Long, Long) = {
    // 1. gate — stateless, so it needs no replay story of its own
    val gated = TextAnalysis.qualityMetrics(batch)
      .filter(col("n_tokens") >= minTokens && col("stopword_ratio") <= maxStopwordRatio)
      .select(batch.columns.map(c => col(s"`$c`")): _*)
    // 2. admission — survivors feed the card AND the sink; admitBatch
    // already snapshots its output, so the whole gate→admission pipeline
    // executes once, not once per consumer
    val survivors = StreamingDedup.admitBatch(
      spark, gated, "doc_id", "text", storePath, batchId,
      shingleK = shingleK, threshold = threshold)
    // 3. datacard partials under the same batchId key
    Sinks.appendBatchPartition(
      spark, IncrementalAgg.datacardPartials(survivors, lgK), cardPath, batchId)
    // 4. annotate + upsert. A doc with zero annotations still upserts (the
    // curated corpus IS the index content, annotations ride along) and a
    // throwing doc contributes an empty array instead of failing the batch
    import spark.implicits._
    val annotated = survivors
      .select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .as[DriveStreaming.SrcDoc]
      .mapPartitions { it =>
        it.map { d =>
          val anns =
            try tagger.annotate(NlpService.Doc(d.doc_id, d.text)).map(_.cui)
            catch { case _: Exception => Seq.empty[String] }
          (d.doc_id, d.lang, d.source, anns)
        }
      }
      .toDF("doc_id", "lang", "source", "annotations")
    val failed = sink.upsert(spark, annotated, batchId)
    // survivors is snapshotted — counting it re-reads the snapshot, not
    // the admission pipeline (and annotated is row-for-row survivors)
    (if (countSurvivors) survivors.count() else -1L, failed)
  }

  /** Where the curated, annotated survivors land. The ES face is the
    * north-star wiring; the parquet face keeps the composition runnable
    * (and its end state comparable) where no cluster exists.
    */
  sealed trait CurationSink {
    def upsert(spark: SparkSession, annotated: DataFrame, batchId: Long): Long
  }

  /** K5 scripted bulk upsert over the live REST protocol. */
  final case class EsSink(conf: EsRest.EsConf, index: String) extends CurationSink {
    def upsert(spark: SparkSession, annotated: DataFrame, batchId: Long): Long =
      EsRest.bulkUpsertAnnotations(annotated, conf, index, "doc_id", "annotations")
  }

  /** Parquet K5 face — same replace-wholesale upsert semantics. */
  final case class ParquetSink(path: String) extends CurationSink {
    def upsert(spark: SparkSession, annotated: DataFrame, batchId: Long): Long = {
      Sinks.upsert(spark, annotated, path, "doc_id"); 0L
    }
  }

  /** Start the composed job: ONE writeStream, ONE checkpoint, all three
    * states advanced per trigger. AvailableNow drains the backlog and
    * stops — the reference's repeated-catch-up operating mode.
    */
  def start(
      docs: DataFrame,
      storePath: String,
      cardPath: String,
      sink: CurationSink,
      checkpointDir: String,
      tagger: NlpService.Tagger,
      trigger: Trigger = Trigger.AvailableNow(),
      minTokens: Long = 40L,
      maxStopwordRatio: Double = 0.08,
      shingleK: Int = 3,
      threshold: Double = 0.6,
      compactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // compact BEFORE this batch reads history: partitions < batchId
        // are committed (Structured Streaming replays at most the current)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          Sinks.compactBatchStore(spark, storePath, upToBatch = batchId)
          Sinks.compactBatchStore(spark, cardPath, upToBatch = batchId)
        }
        // countSurvivors = false: the stream drops the return value, so
        // the per-trigger count job would be pure dispatch constant
        curateBatch(spark, batch, storePath, cardPath, sink, tagger, batchId,
          minTokens, maxStopwordRatio, shingleK, threshold,
          countSurvivors = false)
        ()
      }
      .start()

  /** The card as of the last committed batch (None before any commit). */
  def card(spark: SparkSession, cardPath: String): Option[DataFrame] =
    Sinks.readBatchStore(spark, cardPath)
      .map(p => IncrementalAgg.finalizeCard(IncrementalAgg.mergePartials(Seq(p))))

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val work = Files.createTempDirectory("graft-curation").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsPath = s"$srcDir/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    val f = new java.io.File(docsPath)
    val source =
      if (f.isFile)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", f.getName).parquet(f.getParent)
      else spark.readStream.schema(schema).parquet(docsPath)
    val q = start(source, s"$work/store", s"$work/card",
      ParquetSink(s"$work/curated"), s"$work/ckpt",
      new NlpService.MockTagger(AnnotationPipeline.DefaultTerms),
      // sf0.001 documents are short — gate on a small floor so the main
      // demonstrably admits rows at smoke scale
      minTokens = 5L, maxStopwordRatio = 1.0)
    q.awaitTermination()
    val curated = spark.read.parquet(s"$work/curated").count()
    val cardRows = card(spark, s"$work/card").map(_.count()).getOrElse(0L)
    println(s"[drive-curation] $curated curated docs, $cardRows card rows in $work")
    spark.stop()
  }
}
