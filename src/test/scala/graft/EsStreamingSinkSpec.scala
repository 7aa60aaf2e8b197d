package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.EsRest
import graft.sources.EsRest.EsConf
import graft.streaming.EsUpsertSink

/** The north-star sentence as one RUNNING job: Structured Streaming →
  * [[EsUpsertSink]] → the live [[EsRest]] protocol → [[EsStub]]. Three
  * contracts, each the streaming face of a batch-proven EsStubSpec test:
  *
  *  1. exactly-once under batchId replay — the checkpoint's commit marker
  *     for a finished batch is DELETED and the query restarted, which is
  *     precisely the crash window Spark re-runs a batch for; the replayed
  *     batch converges (script idempotence) and its failures count once
  *     (accounting keyed by batchId);
  *  2. mid-stream 429 backoff clears without failed docs (B3);
  *  3. per-item failures accumulate across TRIGGERS, siblings land (B4 /
  *     `es_common.py:198-210` failed-docs accounting).
  */
class EsStreamingSinkSpec extends SparkSuite {
  import spark.implicits._
  import EsStub.withStub

  private def tempDir(tag: String): Path =
    Files.createTempDirectory(s"graft-es-stream-$tag")

  private def rm(p: Path): Unit =
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)

  test("north star: writeStream -> EsRest scripted upsert is exactly-once under batchId replay") {
    withStub { stub =>
      val ckpt = tempDir("replay")
      try {
        val conf = EsConf(stub.url, retryBackoffMs = 5)
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations")
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Seq[String])]
        val stream = mem.toDF.toDF("doc_id", "annotations")

        mem.addData((1L, Seq("join", "merge")), (2L, Seq("scan")))
        val q1 = sink.start(stream, ckpt.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        q1.processAllAvailable(); q1.stop()
        assert(EsRest.count(conf, "anns") == 2L)
        assert(stub.indices("anns")._2("1").path("annotations").toString == """["join","merge"]""")
        assert(sink.failedByBatchId == Map(0L -> 0L))
        val updatesAfterFirstRun =
          stub.bulkBodies.asScala.count(_.contains("\"update\""))

        // crash window: batch 0 ran but its commit never landed — Spark
        // re-runs batch 0 with the SAME batchId on restart
        Files.delete(ckpt.resolve("commits").resolve("0"))
        // the local-FS checkpoint manager writes a Hadoop .crc sidecar per
        // commit file; a torn commit loses both
        Files.deleteIfExists(ckpt.resolve("commits").resolve(".0.crc"))
        val q2 = sink.start(stream, ckpt.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        q2.processAllAvailable()

        // the batch really was re-sent over the wire...
        assert(stub.bulkBodies.asScala.count(_.contains("\"update\"")) > updatesAfterFirstRun,
          "restart after a torn commit must re-run the batch")
        // ...and converged: same index state, same single accounting entry
        assert(EsRest.count(conf, "anns") == 2L)
        assert(stub.indices("anns")._2("1").path("annotations").toString == """["join","merge"]""")
        assert(sink.failedByBatchId == Map(0L -> 0L),
          s"replay must overwrite, not append: ${sink.failedByBatchId}")

        // the stream keeps going: a later trigger script-updates doc 1 in place
        mem.addData((1L, Seq("rescan")))
        q2.processAllAvailable(); q2.stop()
        assert(stub.indices("anns")._2("1").path("annotations").toString == """["rescan"]""")
        assert(EsRest.count(conf, "anns") == 2L)
        assert(sink.failedByBatchId == Map(0L -> 0L, 1L -> 0L))
      } finally rm(ckpt)
    }
  }

  test("B3 streaming: mid-stream 429 backoff clears inside the trigger, zero failed docs") {
    withStub { stub =>
      val ckpt = tempDir("backoff")
      try {
        val conf = EsConf(stub.url, retryBackoffMs = 5)
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations")
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Seq[String])]
        val q = sink.start(mem.toDF.toDF("doc_id", "annotations"), ckpt.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

        mem.addData((1L, Seq("a")))
        q.processAllAvailable()
        val attemptsBefore = stub.bulkAttempts.get

        // backpressure arrives BETWEEN triggers: the next micro-batch's
        // first two bulk POSTs answer 429, the third lands
        stub.bulk429Remaining.set(2)
        mem.addData((2L, Seq("b")), (3L, Seq("c")))
        q.processAllAvailable(); q.stop()

        assert(sink.failedTotal == 0L, "a cleared 429 must cost zero failed docs")
        assert(EsRest.count(conf, "anns") == 3L)
        assert(stub.bulkAttempts.get == attemptsBefore + 3,
          s"expected 2 rejected + 1 accepted attempt in trigger 2, saw ${stub.bulkAttempts.get - attemptsBefore}")
      } finally rm(ckpt)
    }
  }

  test("B4 streaming: per-item failures accumulate across triggers, siblings land") {
    withStub { stub =>
      val ckpt = tempDir("failed")
      try {
        stub.rejectIds.add("3"); stub.rejectIds.add("7")
        val conf = EsConf(stub.url, retryBackoffMs = 5)
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations")
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Seq[String])]
        val q = sink.start(mem.toDF.toDF("doc_id", "annotations"), ckpt.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

        mem.addData((1L, Seq("a")), (3L, Seq("rejected")))
        q.processAllAvailable()
        assert(sink.failedByBatchId == Map(0L -> 1L))

        mem.addData((7L, Seq("rejected")), (8L, Seq("b")))
        q.processAllAvailable(); q.stop()

        // the running total is the reference's end-of-run docs_failed
        assert(sink.failedByBatchId == Map(0L -> 1L, 1L -> 1L))
        assert(sink.failedTotal == 2L)
        // accepted siblings landed despite the rejects in both triggers
        assert(EsRest.count(conf, "anns") == 2L)
        assert(stub.indices("anns")._2.keySet == Set("1", "8"))
      } finally rm(ckpt)
    }
  }

  test("accounting window is bounded: eviction keeps the total, replay-in-window still overwrites") {
    withStub { stub =>
      Seq("1", "2", "3", "4").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
        retainBatches = 2)
      implicit val sqlCtx = spark.sqlContext
      def batchOf(id: Long) =
        Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
      sink.processBatch(batchOf(1L), 0L)
      sink.processBatch(batchOf(2L), 1L)
      sink.processBatch(batchOf(3L), 2L)
      // batch 0 evicted from the window, never from the total
      assert(sink.failedByBatchId == Map(1L -> 1L, 2L -> 1L))
      assert(sink.failedTotal == 3L)
      // a replay of the NEWEST batch (the only batch Spark ever replays)
      // overwrites in place: total stays single-counted
      sink.processBatch(batchOf(3L), 2L)
      assert(sink.failedByBatchId == Map(1L -> 1L, 2L -> 1L))
      assert(sink.failedTotal == 3L)
      // NEW LINEAGE (fresh checkpoint restarts ids at 0): the window
      // resets so the low id is tracked — and its replay still counts
      // once instead of being evicted-then-double-counted
      sink.processBatch(batchOf(4L), 0L)
      assert(sink.failedByBatchId == Map(0L -> 1L))
      assert(sink.failedTotal == 4L)
      sink.processBatch(batchOf(4L), 0L) // replay of the new lineage's batch 0
      assert(sink.failedByBatchId == Map(0L -> 1L))
      assert(sink.failedTotal == 4L)
    }
  }

  test("durable accounting: a restarted sink resumes counts; post-restart replay single-counts") {
    withStub { stub =>
      Seq("1", "2", "3").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("acct")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          retainBatches = 2, accountingDir = Some(dir.toString))
        a.processBatch(batchOf(1L), 0L)
        a.processBatch(batchOf(2L), 1L)
        a.processBatch(batchOf(3L), 2L) // evicts batch 0 (and its file)
        assert(a.failedTotal == 3L)
        // driver restart: a NEW instance on the same dir resumes instead
        // of zeroing (the reference's persisted failed-docs log)
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          retainBatches = 2, accountingDir = Some(dir.toString))
        assert(b.failedTotal == 3L, "restart must not zero the running total")
        assert(b.failedByBatchId == Map(1L -> 1L, 2L -> 1L),
          s"window must reload (evicted batch 0 stays evicted): ${b.failedByBatchId}")
        // the crash that CAUSED the restart replays the newest batch —
        // still exactly-once in the accounting
        b.processBatch(batchOf(3L), 2L)
        assert(b.failedTotal == 3L)
        // and new work keeps accumulating durably
        b.processBatch(batchOf(2L), 3L)
        val c = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          retainBatches = 2, accountingDir = Some(dir.toString))
        assert(c.failedTotal == 4L && c.failedByBatchId == Map(2L -> 1L, 3L -> 1L))
      } finally rm(dir)
    }
  }

  test("durable accounting survives a torn newest file: load skips it and seeds from the previous one") {
    withStub { stub =>
      Seq("1", "2").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("torn")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        a.processBatch(batchOf(1L), 0L)
        a.processBatch(batchOf(2L), 1L)
        assert(a.failedTotal == 2L)
        // the crash scenario the atomic rename prevents, simulated for a
        // non-atomic FS: the NEWEST file is truncated to zero bytes —
        // load must neither throw (wedged restarts) nor zero the total
        Files.write(dir.resolve("epoch=0.batch=2.json"), Array.emptyByteArray)
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(b.failedTotal == 2L,
          "a torn newest file must fall back to the previous parseable one")
        assert(b.failedByBatchId == Map(0L -> 1L, 1L -> 1L))
        // garbage files are likewise skipped, not thrown on
        Files.write(dir.resolve("epoch=0.batch=3.json"),
          "{not json".getBytes("UTF-8"))
        val c = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(c.failedTotal == 2L)
      } finally rm(dir)
    }
  }

  test("lineage epochs: equal batchIds across checkpoint lineages get distinct durable keys, totals carry over") {
    withStub { stub =>
      Seq("1", "2", "3").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("lineage")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        a.ensureLineage("ckpt-uuid-A")
        a.processBatch(batchOf(1L), 0L)
        a.processBatch(batchOf(2L), 1L)
        assert(a.lineageEpoch == 0L && a.failedTotal == 2L)

        // checkpoint deleted and recreated: new query id, SAME batchId 0 —
        // the heuristic (batchId < window min) cannot see this collision;
        // the lineage tag can
        a.ensureLineage("ckpt-uuid-B")
        assert(a.lineageEpoch == 1L)
        assert(a.failedByBatchId.isEmpty, "old lineage's window must reset")
        a.processBatch(batchOf(3L), 0L)
        // batch 0 of lineage B is NEW work, not a replay of lineage A's
        // batch 0: the total accumulates across the boundary
        assert(a.failedTotal == 3L,
          s"totals must carry across the lineage boundary: ${a.failedTotal}")
        assert(a.failedByBatchId == Map(0L -> 1L))
        // distinct durable keys: the new lineage's file is epoch-qualified;
        // the old lineage's files are RETAINED (it may be a live co-tenant
        // — see the interleave test; whole epochs age out past
        // retainEpochs, pinned below) and its window stays readable by tag
        val names = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSet
        assert(names.contains("epoch=1.batch=0.json"), s"saw $names")
        assert(names.contains("epoch=0.batch=0.json") &&
          names.contains("epoch=0.batch=1.json"),
          s"a superseded-but-maybe-live lineage's files must be retained: $names")
        assert(a.failedByBatchId("ckpt-uuid-A") == Map(0L -> 1L, 1L -> 1L))

        // a restarted driver resumes the NEW lineage's state
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(b.lineageEpoch == 1L && b.failedTotal == 3L &&
          b.failedByBatchId == Map(0L -> 1L))
        // replay of lineage B's batch 0 against the restarted sink still
        // single-counts (same-lineage tag is a no-op)
        b.ensureLineage("ckpt-uuid-B")
        b.processBatch(batchOf(3L), 0L)
        assert(b.failedTotal == 3L)
      } finally rm(dir)
    }
  }

  test("start() feeds the checkpoint query id into the lineage: delete-checkpoint-restart opens a new epoch") {
    withStub { stub =>
      stub.rejectIds.add("9")
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val ckpt1 = tempDir("lin-ck1"); val ckpt2 = tempDir("lin-ck2")
      val dir = tempDir("lin-acct")
      try {
        implicit val sqlCtx = spark.sqlContext
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        val mem1 = MemoryStream[(Long, Seq[String])]
        mem1.addData((1L, Seq("a")), (9L, Seq("rejected")))
        val q1 = sink.start(mem1.toDF.toDF("doc_id", "annotations"), ckpt1.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        q1.processAllAvailable(); q1.stop()
        assert(sink.lineageEpoch == 0L && sink.failedTotal == 1L)

        // "delete the checkpoint and restart" — a fresh checkpoint dir has
        // a fresh query id; its batch 0 must not conflate with ckpt1's
        val mem2 = MemoryStream[(Long, Seq[String])]
        mem2.addData((9L, Seq("rejected")))
        val q2 = sink.start(mem2.toDF.toDF("doc_id", "annotations"), ckpt2.toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        q2.processAllAvailable(); q2.stop()
        assert(sink.lineageEpoch == 1L,
          s"a new checkpoint id must open a new epoch: ${sink.lineageEpoch}")
        assert(sink.failedTotal == 2L,
          s"batch 0 of each lineage counts once each: ${sink.failedTotal}")
        assert(sink.failedByBatchId == Map(0L -> 1L))
      } finally { rm(ckpt1); rm(ckpt2); rm(dir) }
    }
  }

  test("two checkpoints interleaving through one sink keep two usable windows (VERDICT r17 #3)") {
    withStub { stub =>
      (1 to 9).foreach(i => stub.rejectIds.add(i.toString))
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("interleave")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        // triggers arrive interleaved, each declaring its own lineage —
        // the r17 ping-pong would bump the epoch and clear the window on
        // EVERY switch; tag-keyed epochs must instead accumulate both
        sink.processBatch(batchOf(1L), 0L, Some("ckpt-A"))
        sink.processBatch(batchOf(2L), 0L, Some("ckpt-B"))
        sink.processBatch(batchOf(3L), 1L, Some("ckpt-A"))
        sink.processBatch(batchOf(4L), 1L, Some("ckpt-B"))
        sink.processBatch(batchOf(5L), 2L, Some("ckpt-A"))
        assert(sink.failedByBatchId("ckpt-A") == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
          s"A's window: ${sink.failedByBatchId("ckpt-A")}")
        assert(sink.failedByBatchId("ckpt-B") == Map(0L -> 1L, 1L -> 1L),
          s"B's window: ${sink.failedByBatchId("ckpt-B")}")
        assert(sink.failedTotal == 5L)
        // a replay on either lineage still single-counts
        sink.processBatch(batchOf(4L), 1L, Some("ckpt-B"))
        assert(sink.failedTotal == 5L)
        assert(sink.failedByBatchId("ckpt-B") == Map(0L -> 1L, 1L -> 1L))
        // the no-arg view tracks the most recent trigger's lineage
        assert(sink.failedByBatchId == Map(0L -> 1L, 1L -> 1L))
        // A writes once more AFTER B's replay: the chronologically newest
        // file now lives in the LOWER epoch
        sink.processBatch(batchOf(6L), 3L, Some("ckpt-A"))
        assert(sink.failedTotal == 6L)

        // restart: BOTH windows reload, and the resumed total is the
        // chronologically newest write (seq order) — (epoch, batchId)
        // order would wrongly pick B's epoch-1 file (cumTotal 5) over A's
        // later epoch-0 write (cumTotal 6)
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(b.failedTotal == 6L,
          s"resumed total must follow seq order, not epoch order: ${b.failedTotal}")
        assert(b.failedByBatchId("ckpt-A") ==
          Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
        assert(b.failedByBatchId("ckpt-B") == Map(0L -> 1L, 1L -> 1L))
        // both lineages keep accumulating after the restart
        b.processBatch(batchOf(7L), 2L, Some("ckpt-B"))
        assert(b.failedTotal == 7L)
        assert(b.failedByBatchId("ckpt-B") == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
      } finally rm(dir)
    }
  }

  test("a crash between temp-write and rename leaves the previous total readable (atomic persist)") {
    withStub { stub =>
      Seq("1", "2").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("crash")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        a.processBatch(batchOf(1L), 0L)
        a.processBatch(batchOf(2L), 1L)
        // the kill-inside-the-window state: a replay overwrite of batch 1
        // died after writing the temp but before the rename — the final
        // file still carries the pre-crash content, the temp must be
        // ignored (the rename-OVERWRITE path never deletes the final
        // first, so no state with a MISSING batch file exists)
        Files.write(dir.resolve(".tmp.epoch=0.batch=1.json"),
          """{"failed":99,"cumTotal":999,"epoch":0,"seq":99}""".getBytes("UTF-8"))
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(b.failedTotal == 2L,
          "a leftover temp file must not contaminate the resumed total")
        assert(b.failedByBatchId == Map(0L -> 1L, 1L -> 1L))
        // and the interrupted replay, re-run, converges
        b.processBatch(batchOf(2L), 1L)
        assert(b.failedTotal == 2L)
      } finally rm(dir)
    }
  }

  test("legacy batch=<id>.json files migrate to epoch-qualified names once at load (ADVICE r17)") {
    withStub { stub =>
      Seq("1", "2").foreach(stub.rejectIds.add)
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("legacy")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        // a pre-epoch directory: one lone legacy file, plus one batch
        // that ALSO has an epoch-qualified duplicate (the replay/evict
        // gap the old code could leave — the qualified file is newer)
        Files.write(dir.resolve("batch=0.json"),
          """{"failed":1,"cumTotal":1}""".getBytes("UTF-8"))
        Files.write(dir.resolve("batch=1.json"),
          """{"failed":5,"cumTotal":9}""".getBytes("UTF-8"))
        Files.write(dir.resolve("epoch=0.batch=1.json"),
          """{"failed":1,"cumTotal":2,"epoch":0}""".getBytes("UTF-8"))
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          retainBatches = 2, accountingDir = Some(dir.toString))
        // the qualified duplicate wins; the stale legacy twin is deleted,
        // the lone legacy file is renamed in place
        assert(a.failedTotal == 2L, s"duplicate resolution: ${a.failedTotal}")
        assert(a.failedByBatchId == Map(0L -> 1L, 1L -> 1L))
        // drop the local-FS ChecksumFileSystem's hidden .crc sidecars —
        // an FS artifact, not accounting state
        val names = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet
        assert(names == Set("epoch=0.batch=0.json", "epoch=0.batch=1.json"),
          s"migration must leave exactly one name per (epoch, batch): $names")
        // post-migration eviction has exactly one name to manage: a new
        // batch evicts batch 0's (migrated) file, no orphan twin remains
        a.processBatch(batchOf(1L), 2L)
        val after = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet
        assert(after == Set("epoch=0.batch=1.json", "epoch=0.batch=2.json"),
          s"eviction after migration: $after")
      } finally rm(dir)
    }
  }

  test("epochs age out past retainEpochs: windows and files stay bounded under restart churn") {
    withStub { stub =>
      (1 to 9).foreach(i => stub.rejectIds.add(i.toString))
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("aging")
      try {
        implicit val sqlCtx = spark.sqlContext
        def batchOf(id: Long) =
          Seq((id, Seq("rejected"))).toDF("doc_id", "annotations")
        val sink = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString), retainEpochs = 2)
        (1 to 5).foreach { i =>
          sink.ensureLineage(s"ckpt-$i")
          sink.processBatch(batchOf(i.toLong), 0L)
        }
        // five lineages, retention two: only the two newest epochs keep
        // files; the total still counts every lineage's batch
        assert(sink.failedTotal == 5L)
        val names = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet // ignore local-FS .crc sidecars
        assert(names == Set("epoch=3.batch=0.json", "epoch=4.batch=0.json"),
          s"aged-out epochs must drop their files: $names")
        assert(sink.failedByBatchId("ckpt-5") == Map(0L -> 1L))
        assert(sink.failedByBatchId("ckpt-1").isEmpty,
          "an aged-out lineage reads as empty, not stale")
        // a restart resumes from the surviving epochs
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString), retainEpochs = 2)
        assert(b.failedTotal == 5L && b.failedByBatchId("ckpt-5") == Map(0L -> 1L))
      } finally rm(dir)
    }
  }

  test("a lineage tag with JSON metacharacters survives the persist round-trip (ADVICE r17)") {
    withStub { stub =>
      stub.rejectIds.add("1")
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val dir = tempDir("quoting")
      try {
        implicit val sqlCtx = spark.sqlContext
        val evil = """lineage "with" \backslashes\ and "quotes""""
        val a = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        a.ensureLineage(evil)
        a.processBatch(Seq((1L, Seq("rejected"))).toDF("doc_id", "annotations"), 0L)
        assert(a.failedTotal == 1L)
        // the old string-interpolated JSON made this file unparseable and
        // the tolerant loader silently zeroed the resumed total
        val b = new EsUpsertSink(conf, "anns", "doc_id", "annotations",
          accountingDir = Some(dir.toString))
        assert(b.failedTotal == 1L,
          "a metacharacter tag must not produce an unparseable epoch")
        assert(b.failedByBatchId(evil) == Map(0L -> 1L))
      } finally rm(dir)
    }
  }
}
