package graft.streaming

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.EsRest

/** Structured Streaming → Elasticsearch: the north-star sentence as ONE
  * running job. Each micro-batch routes through [[EsRest.bulkUpsertAnnotations]]
  * — the reference's K5 scripted upsert (`ingester/annotations_indexer.py:148-165`
  * decides insert-vs-update per document; here one bulk `update`+`upsert` item
  * per row, `es_common.py:193-210` failed-item accounting) — so the live REST
  * protocol layer, not a parquet stand-in, is what the stream commits to.
  *
  * Delivery semantics, spelled out because a sink that talks to an external
  * store cannot ride Spark's transactional sinks:
  *
  *  - **Effect idempotence.** The painless script REPLACES the stored
  *    annotations array wholesale and the `upsert` document inserts absent
  *    ids, so re-applying a micro-batch converges to the same index state —
  *    at-least-once delivery upgrades to effectively-exactly-once, the same
  *    argument [[StreamingPipeline.startUpsertSink]] makes for the parquet
  *    K5 face.
  *  - **Accounting idempotence.** Spark replays a micro-batch (same
  *    `batchId`) when a failure lands between sink completion and checkpoint
  *    commit. Failed-doc counts are therefore keyed BY batchId and a replay
  *    OVERWRITES its batch's entry instead of adding a second one —
  *    `failedTotal` never double-counts a replayed batch. The map lives in
  *    the driver (foreachBatch bodies run driver-side; the per-partition
  *    bulk POSTs inside [[EsRest]] are what fan out), and like the
  *    reference's failed-docs log it is OBSERVABILITY state, not delivery
  *    state. By default a driver restart zeroes the counters (the
  *    checkpoint still guarantees every batch lands); pass
  *    `accountingDir = Some(s"$checkpoint/graft_failed_docs")` to make the
  *    accounting DURABLE — per-batch counts + the running total persist
  *    across restarts, the reference's on-disk failed-docs log.
  *  - **Backpressure.** 429/503 inside a batch back off and retry inside
  *    [[EsRest.requestRetrying]]; a chunk that never clears counts its docs
  *    failed and the STREAM KEEPS RUNNING (B4 count-and-continue), surfacing
  *    the loss in [[failedByBatchId]] rather than killing the query.
  *
  * At 100 TB/day the shape holds: the driver sees only batch metadata, every
  * partition posts its own `chunkSize`-doc NDJSON bodies, and state is the
  * ES index itself — no Spark-side state store grows with the corpus,
  * and the driver-side accounting map is bounded in BATCH count too
  * (`retainBatches` window + running total; a perpetual sub-second-trigger
  * stream would otherwise leak one map entry per trigger forever).
  */
class EsUpsertSink(
    conf: EsRest.EsConf,
    index: String,
    idCol: String,
    annCol: String,
    retainBatches: Int = EsUpsertSink.DefaultRetainBatches,
    accountingDir: Option[String] = None) {

  require(retainBatches > 0, s"need retainBatches > 0, got $retainBatches")

  // Bounded per-batch window + a running total adjusted on (over)write:
  // an unbounded batchId → count map would grow one entry per trigger
  // forever on a perpetual stream (millions of boxed pairs per week at
  // sub-second triggers). Eviction is safe for the replay-overwrite
  // contract because Spark only ever replays the NEWEST batch of a
  // checkpoint lineage (the one whose commit is missing) — a batchId can
  // never reappear after `retainBatches` newer ones have committed.
  // Plain TreeMap under ONE lock, not concurrent structures: the
  // put + total-adjust + evict sequence must be atomic (two queries
  // sharing a sink could otherwise drift `failedTotal` away from any
  // consistent batch view), and TreeMap.size() is O(1) where a skip
  // list's is an O(window) traversal per trigger. The bulk POST itself
  // stays OUTSIDE the lock.
  private[this] val lock = new Object
  private[this] val failed = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
  private[this] var totalFailed = 0L // guarded by lock

  // DURABLE accounting (the reference's persisted failed-docs log,
  // `es_common.py:198-210`, which survives process death — the in-memory
  // map does not): with `accountingDir` set (recommended:
  // `<checkpoint>/graft_failed_docs`, a shared FS on a real cluster), each
  // trigger writes one tiny `batch=<id>.json` carrying that batch's count
  // AND the post-batch running total — overwrite by batchId, the same
  // replay-idempotence argument as the memory window — and construction
  // seeds the window + total from whatever is on disk, so a restarted
  // driver resumes its counts instead of zeroing them. Window eviction
  // deletes the evicted batch's file (best-effort; the load caps at
  // `retainBatches` newest files regardless). All writes go through the
  // Hadoop FS API, driver-side, one small create per trigger.
  private[this] val mapper = new ObjectMapper()
  accountingDir.foreach(loadPersisted)

  private def hadoopFs(dir: String) = {
    val hc = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    new Path(dir).getFileSystem(hc)
  }

  private def loadPersisted(dir: String): Unit = {
    val fs = hadoopFs(dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).toSeq
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=") && n.endsWith(".json"))
          n.stripPrefix("batch=").stripSuffix(".json").toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
    if (entries.isEmpty) return
    lock.synchronized {
      entries.takeRight(retainBatches).foreach { case (id, p) =>
        val in = fs.open(p)
        val tree =
          try mapper.readTree(in)
          finally in.close()
        failed.put(id, tree.path("failed").asLong())
        if (id == entries.last._1) totalFailed = tree.path("cumTotal").asLong()
      }
    }
  }

  /** Must be called with `lock` held (reads totalFailed). */
  private def persist(dir: String, batchId: Long, n: Long, evicted: Seq[Long]): Unit = {
    val fs = hadoopFs(dir)
    fs.mkdirs(new Path(dir))
    val out = fs.create(new Path(dir, s"batch=$batchId.json"), true)
    try out.write(
      s"""{"failed":$n,"cumTotal":$totalFailed}""".getBytes("UTF-8"))
    finally out.close()
    evicted.foreach { id =>
      try fs.delete(new Path(dir, s"batch=$id.json"), false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Failed-item counts for the most recent `retainBatches` batches
    * (batchId → failures), replay-stable inside the window.
    */
  def failedByBatchId: Map[Long, Long] = lock.synchronized {
    failed.asScala.map { case (k, v) => (k.longValue, v.longValue) }.toMap
  }

  /** Total failed docs across ALL triggers seen by this sink instance —
    * replayed batches count once (the reference's end-of-run
    * `docs_failed` total, `es_common.py:208-210`). Unlike
    * [[failedByBatchId]] this survives window eviction.
    */
  def failedTotal: Long = lock.synchronized(totalFailed)

  /** The foreachBatch body: one scripted-bulk-upsert pass for this
    * micro-batch. Public so a recovery path can be driven directly in
    * tests — Spark calls it with the SAME batchId on replay.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val n = EsRest.bulkUpsertAnnotations(batch, conf, index, idCol, annCol)
    lock.synchronized {
      // a batchId BELOW the window with no entry of its own means a new
      // checkpoint lineage (stop → start() against a fresh checkpoint
      // restarts ids at 0): reset the window, or the new lineage's low
      // ids would be inserted-then-instantly-evicted and a legitimate
      // replay of them would double-count the total. Equal-id collisions
      // ACROSS lineages remain indistinguishable from replays (as before
      // this window existed) — the overwrite keeps the total sane.
      if (!failed.isEmpty && batchId < failed.firstKey && !failed.containsKey(batchId))
        failed.clear()
      val prev = failed.put(batchId, n)
      totalFailed += n - (if (prev == null) 0L else prev.longValue)
      val evicted = Seq.newBuilder[Long]
      while (failed.size() > retainBatches)
        evicted += failed.pollFirstEntry().getKey.longValue
      accountingDir.foreach(persist(_, batchId, n, evicted.result()))
    }
  }

  /** Start the stream: annotated rows → per-trigger scripted ES upsert.
    * `annotated` must carry `idCol` and an array-typed `annCol`; extra
    * columns ride in the upsert document (the reference indexes the full
    * meta projection alongside the annotations array).
    */
  def start(
      annotated: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    annotated.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()
}

object EsUpsertSink {
  /** Default per-batch accounting window — far beyond any replay depth
    * (Spark replays only the newest uncommitted batch) while keeping the
    * map a bounded few hundred KB on a perpetual stream.
    */
  val DefaultRetainBatches: Int = 10000
}
