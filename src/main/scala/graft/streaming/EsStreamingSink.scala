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
  *    commit. Failed-doc counts are therefore keyed by (lineage epoch,
  *    batchId) — the epoch bumps when the checkpoint's stable query id
  *    changes, so equal batchIds from a deleted-and-recreated checkpoint
  *    don't conflate — and a replay
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

  // Lineage accounting: a fresh checkpoint restarts batchIds at 0, so a
  // bare batchId is ambiguous across checkpoint lineages. The durable key
  // is therefore (epoch, batchId): `epoch` increments on every detected
  // lineage change — either the batchId heuristic below (direct-driven
  // sinks) or, exactly, the checkpoint's own stable query id
  // (`<checkpoint>/metadata` `"id"`), which [[start]] resolves at the
  // first trigger and feeds through [[ensureLineage]]. Same checkpoint ⇒
  // same id ⇒ replays keep overwriting; deleted-and-recreated checkpoint
  // ⇒ new id ⇒ new epoch, so equal batchIds across lineages stop
  // conflating and the running total accumulates across the boundary.
  private[this] var epoch = 0L          // guarded by lock
  private[this] var lineageTag: Option[String] = None // guarded by lock

  // DURABLE accounting (the reference's persisted failed-docs log,
  // `es_common.py:198-210`, which survives process death — the in-memory
  // map does not): with `accountingDir` set (recommended:
  // `<checkpoint>/graft_failed_docs`, a shared FS on a real cluster), each
  // trigger writes one tiny `epoch=<e>.batch=<id>.json` carrying that
  // batch's count, the post-batch running total, and the lineage tag —
  // overwrite by (epoch, batchId), the same replay-idempotence argument
  // as the memory window — and construction seeds the window + total from
  // whatever is on disk, so a restarted driver resumes its counts instead
  // of zeroing them. Writes are ATOMIC (temp create + rename, the
  // `Sinks.replaceWith` pattern): a driver crash mid-write can never
  // leave a truncated newest file, and the loader additionally SKIPS any
  // unparseable file (falling back to the next-newest parseable one for
  // the total) so a torn file from a pre-atomic writer, or a non-atomic
  // FS, degrades one batch of observability instead of wedging every
  // restart. Window eviction deletes the evicted batch's file
  // (best-effort; the load caps at `retainBatches` newest files of the
  // newest epoch regardless). All writes go through the Hadoop FS API,
  // driver-side, one small create+rename per trigger.
  private[this] val mapper = new ObjectMapper()
  accountingDir.foreach(loadPersisted)

  private def hadoopFs(dir: String) = {
    val hc = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    new Path(dir).getFileSystem(hc)
  }

  /** `epoch=<e>.batch=<id>.json` → (e, id); legacy `batch=<id>.json`
    * (pre-epoch format) reads as epoch 0 so an upgraded sink resumes an
    * old directory's totals.
    */
  private def parseName(n: String): Option[(Long, Long)] =
    if (!n.endsWith(".json")) None
    else {
      val stem = n.stripSuffix(".json")
      if (stem.startsWith("epoch=")) stem.stripPrefix("epoch=").split("\\.batch=") match {
        case Array(e, b) => for (el <- e.toLongOption; bl <- b.toLongOption) yield (el, bl)
        case _ => None
      }
      else if (stem.startsWith("batch=")) stem.stripPrefix("batch=").toLongOption.map((0L, _))
      else None
    }

  private def fileName(ep: Long, batchId: Long): String = s"epoch=$ep.batch=$batchId.json"

  private def loadPersisted(dir: String): Unit = {
    val fs = hadoopFs(dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).toSeq
      .flatMap(st => parseName(st.getPath.getName).map { case (e, b) => (e, b, st.getPath) })
      .sortBy { case (e, b, _) => (e, b) }
    if (entries.isEmpty) return
    // newest epoch wins: stale higher-batchId files from an OLD lineage
    // must not outvote the new lineage's low ids (ADVICE r16). Torn or
    // foreign files are skipped, not thrown on; if the whole newest
    // epoch is unreadable, fall back to the newest epoch that isn't.
    val parsedAll = entries.flatMap { case (e, b, p) =>
      try {
        val in = fs.open(p)
        val tree = try mapper.readTree(in) finally in.close()
        if (tree.path("failed").isMissingNode || tree.path("cumTotal").isMissingNode) None
        else Some((e, b, tree))
      } catch { case scala.util.control.NonFatal(_) => None } // torn file: skip, not wedge
    }
    if (parsedAll.isEmpty) return
    val maxEpoch = parsedAll.map(_._1).max
    val parsed = parsedAll.filter(_._1 == maxEpoch)
    lock.synchronized {
      epoch = maxEpoch
      parsed.takeRight(retainBatches).foreach { case (_, b, tree) =>
        failed.put(b, tree.path("failed").asLong())
      }
      val newest = parsed.last._3
      totalFailed = newest.path("cumTotal").asLong()
      val tag = newest.path("lineage").asText("")
      if (tag.nonEmpty) lineageTag = Some(tag)
    }
  }

  /** Must be called with `lock` held (reads epoch, totalFailed,
    * lineageTag). Atomic: create under a dot-temp name, rename into
    * place — a crash mid-write leaves at worst an ignorable temp file,
    * never a truncated `epoch=…batch=….json`.
    */
  private def persist(dir: String, batchId: Long, n: Long, evicted: Seq[Long]): Unit = {
    val fs = hadoopFs(dir)
    fs.mkdirs(new Path(dir))
    val finalPath = new Path(dir, fileName(epoch, batchId))
    val tmpPath = new Path(dir, s".tmp.${fileName(epoch, batchId)}")
    val tag = lineageTag.map(t => s""","lineage":"$t"""").getOrElse("")
    val out = fs.create(tmpPath, true)
    try out.write(
      s"""{"failed":$n,"cumTotal":$totalFailed,"epoch":$epoch$tag}""".getBytes("UTF-8"))
    finally out.close()
    // replay overwrite: HDFS rename won't clobber, so drop the old
    // version first — the loader's parse-tolerant fallback covers the
    // microscopic delete→rename window
    if (fs.exists(finalPath)) fs.delete(finalPath, false)
    if (!fs.rename(tmpPath, finalPath))
      throw new java.io.IOException(s"rename $tmpPath -> $finalPath failed")
    evicted.foreach { id =>
      try fs.delete(new Path(dir, fileName(epoch, id)), false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Best-effort GC of persisted files from epochs other than the current
    * one. Called AFTER the new epoch's first file is on disk, so a crash
    * at any point leaves a directory whose max-epoch files carry a
    * correct running total (old epoch's if nothing new persisted yet,
    * new epoch's otherwise) — never an empty directory that would zero a
    * resumed total.
    */
  private def dropOtherEpochs(dir: String, keep: Long): Unit = {
    val fs = hadoopFs(dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      parseName(st.getPath.getName) match {
        case Some((e, _)) if e != keep =>
          try fs.delete(st.getPath, false)
          catch { case scala.util.control.NonFatal(_) => () }
        case _ => ()
      }
    }
  }

  /** Declare the lineage this sink is serving (idempotent). [[start]]
    * calls this with the checkpoint's stable query id at the first
    * trigger; a changed tag — the checkpoint was deleted and recreated —
    * opens a new accounting epoch: the per-batch window resets (its
    * batchIds belong to the dead lineage), the running total carries
    * across, and subsequent equal batchIds no longer collide with the old
    * lineage's files. Exposed for tests and for callers driving
    * [[processBatch]] directly with their own lineage notion.
    */
  def ensureLineage(tag: String): Unit = lock.synchronized {
    if (lineageTag.exists(_ != tag)) { epoch += 1; failed.clear(); gcPending = true }
    lineageTag = Some(tag)
  }

  // set on an epoch bump; the NEXT processBatch GCs old-epoch files only
  // after its own (new-epoch) file is safely on disk, so a crash in
  // between never leaves an empty accounting dir that would zero the
  // resumed total
  private[this] var gcPending = false // guarded by lock

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

  /** Ordinal of the current accounting lineage (0-based; bumps when
    * [[ensureLineage]] sees a new checkpoint id or the batchId heuristic
    * fires). The durable key is (epoch, batchId), so equal batchIds from
    * different checkpoint lineages occupy DISTINCT files.
    */
  def lineageEpoch: Long = lock.synchronized(epoch)

  /** The foreachBatch body: one scripted-bulk-upsert pass for this
    * micro-batch. Public so a recovery path can be driven directly in
    * tests — Spark calls it with the SAME batchId on replay.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val n = EsRest.bulkUpsertAnnotations(batch, conf, index, idCol, annCol)
    val gcDir = lock.synchronized {
      // a batchId BELOW the window with no entry of its own means a new
      // checkpoint lineage (stop → start() against a fresh checkpoint
      // restarts ids at 0): open a new epoch, or the new lineage's low
      // ids would be inserted-then-instantly-evicted and a legitimate
      // replay of them would double-count the total. This heuristic
      // cannot see an equal-id collision (both lineages at batch 0) —
      // [[ensureLineage]], fed the checkpoint's stable query id by
      // [[start]], detects that case exactly.
      if (!failed.isEmpty && batchId < failed.firstKey && !failed.containsKey(batchId)) {
        epoch += 1; failed.clear(); gcPending = true
      }
      val prev = failed.put(batchId, n)
      totalFailed += n - (if (prev == null) 0L else prev.longValue)
      val evicted = Seq.newBuilder[Long]
      while (failed.size() > retainBatches)
        evicted += failed.pollFirstEntry().getKey.longValue
      accountingDir.foreach(persist(_, batchId, n, evicted.result()))
      if (gcPending && accountingDir.isDefined) {
        gcPending = false; accountingDir.map((_, epoch))
      } else None
    }
    gcDir.foreach { case (dir, keep) => dropOtherEpochs(dir, keep) }
  }

  /** Start the stream: annotated rows → per-trigger scripted ES upsert.
    * `annotated` must carry `idCol` and an array-typed `annCol`; extra
    * columns ride in the upsert document (the reference indexes the full
    * meta projection alongside the annotations array).
    */
  def start(
      annotated: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // resolved lazily at the FIRST trigger (the metadata file exists by
    // then; at start() time a brand-new checkpoint hasn't written it yet)
    var lineageResolved = false
    annotated.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!lineageResolved) {
          checkpointQueryId(checkpoint).foreach(ensureLineage)
          lineageResolved = true
        }
        processBatch(batch, batchId)
      }
      .start()
  }

  /** The checkpoint's stable query id (`<checkpoint>/metadata` `"id"`):
    * constant across restarts of the same checkpoint, fresh when the
    * checkpoint is deleted and recreated — exactly a lineage identity.
    */
  private def checkpointQueryId(checkpoint: String): Option[String] =
    try {
      val fs = hadoopFs(checkpoint)
      val p = new Path(checkpoint, "metadata")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val tree = try mapper.readTree(in) finally in.close()
        Option(tree.path("id").asText(null)).filter(_.nonEmpty)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

object EsUpsertSink {
  /** Default per-batch accounting window — far beyond any replay depth
    * (Spark replays only the newest uncommitted batch) while keeping the
    * map a bounded few hundred KB on a perpetual stream.
    */
  val DefaultRetainBatches: Int = 10000
}
