package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.AnnotationPipeline
import graft.sources.Sinks

/** Structured-Streaming form of the ingestion pipeline (the north-star
  * approach, BASELINE.json): the reference's hand-rolled date-segment loop
  * (B1, `ingester/annotations_indexer.py:842-861`) becomes micro-batches
  * with checkpointed state, and its re-query-the-sink dedup (F2) becomes
  * `dropDuplicatesWithinWatermark` — bounded state, no sink round-trips.
  *
  * The reference's inclusive segment boundaries double-process boundary-date
  * documents (`ingester/es_common.py:316-319`); event-time windows here are
  * half-open `[start, end)`, so every document is assigned exactly once.
  */
object StreamingPipeline {

  /** Streaming source over a parquet directory (file source — each new file
    * is a micro-batch input; `Trigger.AvailableNow` drains the backlog and
    * stops, the catch-up semantics of the reference's `index_range`).
    */
  def docStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The annotate pipeline on a stream: F1 filter → watermark + streaming
    * dedup on doc_id (F2's replacement) → dictionary annotate → flat records.
    * `eventTimeCol` must be a timestamp column for the watermark.
    */
  def annotateStream(
      docs: DataFrame,
      eventTimeCol: String,
      watermark: String = "1 hour",
      terms: Seq[String] = AnnotationPipeline.DefaultTerms): DataFrame = {
    val filtered = AnnotationPipeline.filterValidText(docs)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("doc_id")
    AnnotationPipeline.annotateDictionary(filtered, terms)
  }

  /** Stream–static enrichment: join each micro-batch against a STATIC
    * dimension relation — the stateless streaming-join form (no watermark,
    * no state store; contrast the stream-stream interval join, which buffers
    * both sides). Semantics worth pinning: Spark re-plans the static side
    * EVERY micro-batch, so a parquet-backed dimension picks up new files
    * between batches — refresh-on-read for slowly-changing dims, and the
    * reason the static side should be broadcast-sized or bucketed (a
    * shuffling static side re-shuffles per batch). The P1/P3 enrichment
    * shape (`ingester/annotations_indexer.py:169-190`, meta fields carried
    * onto every annotation) as a stream.
    */
  def enrichStream(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** K5 upsert sink for a stream: foreachBatch read-merge-overwrite keyed by
    * the composite annotation key. Exactly-once under retries: the merge is
    * idempotent (same keys → same survivors), so a replayed batch converges.
    */
  def startUpsertSink(
      annotated: DataFrame,
      path: String,
      keyCol: String,
      checkpoint: String): StreamingQuery =
    annotated.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsert(batch.sparkSession, batch, path, keyCol)
      }
      .start()

  /** Windowed event aggregation with watermarked late-data handling — the
    * streaming twin of StreamQueries.q60 (the reference's late-data story is
    * "reprocess at next check", `ingester/nlp_service.py:91`; here late rows
    * within the watermark merge into their window, and older ones drop).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Session windows per user (30-min gap) — the streaming form of
    * StreamQueries.q62.
    */
  def sessionCounts(
      events: DataFrame,
      tsCol: String = "ts",
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-stream interval join: annotations arriving on one stream joined
    * to their documents on another, matched per doc within a bounded
    * event-time interval. Watermarks on BOTH sides + the interval condition
    * bound the join state (Spark evicts rows older than watermark +
    * interval) — unbounded-state stream joins don't survive at 100 TB/day.
    * Columns: docs(doc_id, ts), anns(a_doc_id, a_ts, term).
    */
  def docAnnotationJoin(
      docs: DataFrame,
      anns: DataFrame,
      watermark: String = "1 hour",
      maxDelay: String = "30 minutes"): DataFrame =
    docs.withWatermark("ts", watermark)
      .join(
        anns.withWatermark("a_ts", watermark),
        expr(s"doc_id = a_doc_id AND a_ts BETWEEN ts AND ts + interval $maxDelay"))

  /** First-seen gate on the Spark 4 `transformWithState` API (the
    * successor to flatMapGroupsWithState: named state variables, TTL,
    * timers): emits a document only the FIRST micro-batch its id appears —
    * the reference's already-processed check (F2) as an explicit
    * state-store gate. `TTLConfig` bounds state lifetime at 100 TB/day
    * (an id unseen for the TTL is forgotten and would re-emit, which is the
    * reference's own "reprocess at next check" posture).
    */
  class FirstSeenGate(ttl: java.time.Duration)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String), (Long, String)] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      val cfg = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
      seen = getHandle.getValueState[Boolean](
        "seen", org.apache.spark.sql.Encoders.scalaBoolean, cfg)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[(Long, String)] = {
      if (seen.exists()) Iterator.empty
      else { seen.update(true); rows.take(1) }
    }
  }

  def firstSeen(docs: org.apache.spark.sql.Dataset[(Long, String)],
      ttl: java.time.Duration = null): org.apache.spark.sql.Dataset[(Long, String)] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = docs.sparkSession
    import spark.implicits._
    // TTL state requires processing-time semantics: Spark rejects a
    // TTLConfig under TimeMode.None at query start
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    docs.groupByKey(_._1)
      .transformWithState(new FirstSeenGate(ttl), mode, OutputMode.Append())
  }

  /** Custom keyed state via flatMapGroupsWithState: per-document annotation
    * accumulator that emits a running total each micro-batch — the pattern
    * for state Spark's built-in windows can't express (the reference keeps
    * this state in the SINK and re-queries it per doc,
    * `ingester/annotations_indexer.py:80-101`; here it lives in the state
    * store, checkpointed, no sink round-trips).
    */
  case class DocCount(doc_id: Long, total: Long)

  def runningAnnotationCounts(
      anns: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.sql.Dataset[DocCount] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = anns.sparkSession
    import spark.implicits._
    anns.groupByKey(_._1)
      .flatMapGroupsWithState[Long, DocCount](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (docId: Long, batch: Iterator[(Long, String)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + batch.size
          state.update(total)
          Iterator(DocCount(docId, total))
      }
  }
}
