package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{Connectors, EsRest}
import graft.sources.EsRest.EsConf

/** The live ES connector path, executed: [[EsStub]] — an in-JVM HTTP stub
  * speaking the five endpoint families the reference's client uses (ping,
  * index exists/create/drop, _bulk, _count, sliced _search + scroll) —
  * driven through [[EsRest]]'s distributed bulk/upsert/read operators.
  * Asserts the REQUEST SHAPES the reference protocol mandates — bulk
  * chunking at `chunkSize` (`es_common.py:98`), the K5 painless
  * script-update body (`annotations_indexer.py:155-163`) — not just the
  * round-tripped rows. The same stub under a RUNNING Structured Streaming
  * job: [[EsStreamingSinkSpec]].
  */
class EsStubSpec extends SparkSuite {
  import spark.implicits._
  import EsStub.withStub

  // ---- the specs --------------------------------------------------------

  test("S6/S7: ping, liveness probe, index lifecycle with a reference mapping (K7/K8)") {
    withStub { stub =>
      val conf = EsConf(stub.url)
      assert(EsRest.ping(conf), "ping must succeed against a live endpoint")
      assert(Connectors.checkUrlsAvailable(Seq(stub.url)), "S7 probe over the same wire")
      assert(!EsRest.indexExists(conf, "medical_annotations"))
      EsRest.createIndex(conf, "medical_annotations",
        graft.schemas.Schemas.esMappingJson(graft.schemas.Schemas.gateAnnotation))
      assert(EsRest.indexExists(conf, "medical_annotations"))
      // the stored mapping is the schema module's, trailing-space quirks intact
      assert(stub.indices("medical_annotations")._1.contains("\"orgType \""))
      assert(EsRest.dropIndex(conf, "medical_annotations"))
      assert(!EsRest.indexExists(conf, "medical_annotations"))
    }
  }

  test("K1-K3: distributed bulk index chunks at chunkSize and round-trips rows") {
    withStub { stub =>
      val conf = EsConf(stub.url, chunkSize = 10,
        user = Some("ingester"), pass = Some("secret"))
      val docs = (0 until 25).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      val failed = EsRest.bulkIndex(docs.coalesce(1), conf, "docs", "doc_id")
      assert(failed == 0L)
      assert(EsRest.count(conf, "docs") == 25L)
      // the reference's 10k chunking contract, scaled down: 25 docs at
      // chunk 10 → exactly [10, 10, 5]
      assert(stub.bulkChunkSizes.asScala.toSeq.sorted == Seq(5, 10, 10),
        s"got ${stub.bulkChunkSizes.asScala.toSeq}")
      // basic auth rode every request
      assert(stub.authHeaders.asScala.forall(_.startsWith("Basic ")))
      // spot-check a round-tripped source document
      val (code, body) = EsRest.request(conf, "GET", "/docs/_doc/7")
      assert(code == 200 && body.contains("\"text\":\"text 7\""))
    }
  }

  test("B4: per-item bulk failures are counted, not fatal (reference failed-docs accounting)") {
    withStub { stub =>
      stub.rejectIds.add("3"); stub.rejectIds.add("7")
      val conf = EsConf(stub.url, chunkSize = 4)
      val docs = (0 until 10).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      // the job completes; the two rejected items surface in the count
      val failed = EsRest.bulkIndex(docs.coalesce(1), conf, "docs", "doc_id")
      assert(failed == 2L, s"expected 2 failed items, got $failed")
      assert(EsRest.count(conf, "docs") == 8L, "accepted docs land despite sibling failures")
      // a NULL id cannot address a document: counted failed, siblings land
      val withNull = Seq[(java.lang.Long, String)]((100L, "ok"), (null, "no id"))
        .toDF("doc_id", "text")
      assert(EsRest.bulkIndex(withNull, conf, "docs", "doc_id") == 1L)
      assert(EsRest.count(conf, "docs") == 9L)
    }
  }

  test("B3: bulk 429 backpressure is retried with backoff until it clears (no failed docs)") {
    withStub { stub =>
      stub.bulk429Remaining.set(2) // first two attempts rejected, third lands
      val conf = EsConf(stub.url, chunkSize = 50, retryBackoffMs = 5)
      val docs = (0 until 20).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      val failed = EsRest.bulkIndex(docs.coalesce(1), conf, "docs", "doc_id")
      assert(failed == 0L, "a cleared 429 must cost zero failed docs")
      assert(EsRest.count(conf, "docs") == 20L)
      assert(stub.bulkAttempts.get == 3,
        s"expected 2 rejected + 1 accepted attempt, saw ${stub.bulkAttempts.get}")
    }
  }

  test("B3/B4: a chunk still 429ing after max retries counts ALL its docs failed and the job continues") {
    withStub { stub =>
      stub.bulk429Remaining.set(Int.MaxValue) // never clears
      val conf = EsConf(stub.url, chunkSize = 4, maxRetries = 2, retryBackoffMs = 5)
      val docs = (0 until 10).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      // reference counts-and-continues (es_common.py:198-210): no exception,
      // every doc of every chunk surfaces in the failed count
      val failed = EsRest.bulkIndex(docs.coalesce(1), conf, "docs", "doc_id")
      assert(failed == 10L, s"expected all 10 docs failed, got $failed")
      // 3 chunks × (1 + 2 retries) attempts
      assert(stub.bulkAttempts.get == 9, s"attempts: ${stub.bulkAttempts.get}")
      // backpressure clears → the SAME writer call succeeds (idempotent replay)
      stub.bulk429Remaining.set(0)
      assert(EsRest.bulkIndex(docs.coalesce(1), conf, "docs", "doc_id") == 0L)
      assert(EsRest.count(conf, "docs") == 10L)
    }
  }

  test("scroll expiry mid-read fails the slice descriptively instead of truncating silently") {
    withStub { stub =>
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val docs = (0 until 12).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
      EsRest.bulkIndex(docs, conf, "corpus", "doc_id")
      stub.expireScrolls = true // every continuation now 404s
      val e = intercept[org.apache.spark.SparkException] {
        // pageSize 5 forces a continuation after the first page
        EsRest.readSliced(spark, conf, "corpus", slices = 1, pageSize = 5).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null && m.contains("scroll context expired")),
        s"expected the expired-scroll diagnosis in: ${messages(e)}")
    }
  }

  test("scroll keep-alive propagates and bounds a stalled consumer (fake-clock expiry)") {
    withStub { stub =>
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val docs = (0 until 12).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
      EsRest.bulkIndex(docs, conf, "corpus", "doc_id")
      // the readSliced keep-alive parameter reaches the wire
      assert(EsRest.readSliced(spark, conf, "corpus", slices = 1, pageSize = 20,
        scrollKeepAlive = "2m").count() == 12L)
      assert(stub.lastKeepAliveMs.get == 120000L, s"got ${stub.lastKeepAliveMs.get}")
      // protocol level: a 1m context dies across a 61s page gap; a 5m one
      // survives the same stall (the keep-alive bounds the GAP, refreshed
      // per request — exactly ES semantics)
      def openScroll(ka: String): String = {
        val (code, body) = EsRest.request(conf, "POST",
          s"/corpus/_search?scroll=$ka", Some("""{"size":5,"query":{"match_all":{}}}"""))
        assert(code == 200, body)
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(body).path("_scroll_id").asText()
      }
      def continue(sid: String, ka: String): Int =
        EsRest.request(conf, "POST", "/_search/scroll",
          Some(s"""{"scroll":"$ka","scroll_id":"$sid"}"""))._1
      val short = openScroll("1m")
      val long = openScroll("5m")
      stub.clockMs.addAndGet(61000L) // the consumer stalls 61 s
      assert(continue(short, "1m") == 404,
        "a 1m keep-alive must not survive a 61s stall")
      assert(continue(long, "5m") == 200,
        "a 5m keep-alive must survive the same stall")
      // the surviving context's deadline REFRESHED: another 61s stall is
      // still inside its window
      stub.clockMs.addAndGet(61000L)
      assert(continue(long, "5m") == 200)
    }
  }

  test("K5: scripted annotations upsert sends the reference painless body; update and insert both land") {
    withStub { stub =>
      val conf = EsConf(stub.url)
      // seed doc 1 with old annotations via plain index
      val seed = Seq((1L, Seq("old"))).toDF("doc_id", "annotations")
      EsRest.bulkIndex(seed, conf, "anns", "doc_id")
      // upsert: doc 1 exists (script update replaces the array), doc 2 is
      // new (upsert document inserts)
      val batch = Seq((1L, Seq("join", "merge")), (2L, Seq("scan")))
        .toDF("doc_id", "annotations")
      assert(EsRest.bulkUpsertAnnotations(batch, conf, "anns", "doc_id", "annotations") == 0L)
      val docs = stub.indices("anns")._2
      assert(docs("1").path("annotations").toString == """["join","merge"]""")
      assert(docs("2").path("annotations").toString == """["scan"]""")
      // the wire shape IS the reference's: update op + painless script with
      // params.annotations (annotations_indexer.py:155-163)
      val upsertBodies = stub.bulkBodies.asScala.filter(_.contains("\"update\"")).toSeq
      assert(upsertBodies.nonEmpty && upsertBodies.forall(_.contains(
        """"script":{"lang":"painless","source":"ctx._source.annotations = new ArrayList(); ctx._source.annotations = params.annotations"""")),
        s"script body drifted from the reference shape:\n${upsertBodies.headOption.getOrElse("")}")
      assert(upsertBodies.exists(_.contains(""""params":{"annotations":["join","merge"]}""")))
    }
  }

  test("end-to-end over the live protocol: ES read -> annotate -> scripted ES upsert (the reference's whole dataflow)") {
    withStub { stub =>
      val conf = EsConf(stub.url, chunkSize = 10)
      // source index: the reference's document store
      val src = (0 until 30).map(i =>
        (i.toLong, s"doc $i mentions a join and a merge")).toDF("doc_id", "text")
      EsRest.bulkIndex(src, conf, "docs_src", "doc_id")
      // read distributed (2 slices), parse _source columnar — S1/S2 + P1
      val docs = EsRest.readSliced(spark, conf, "docs_src", slices = 2, pageSize = 7)
        .select(from_json($"_source",
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING")).as("d"))
        .select("d.doc_id", "d.text")
      // annotate (U1, deterministic mock service) and collapse to the
      // nested per-doc annotations array the K5 sink expects
      val anns = graft.operators.NlpService.annotateAndExplode(
          spark, docs, new graft.operators.NlpService.MockTagger(Seq("join", "merge")))
        .groupBy("doc_id")
        .agg(sort_array(collect_list($"detected_name")).as("annotations"))
      // write back via the scripted bulk upsert — K5 over the wire
      assert(EsRest.bulkUpsertAnnotations(anns, conf, "docs_anns", "doc_id", "annotations") == 0L)
      assert(EsRest.count(conf, "docs_anns") == 30L)
      val doc7 = stub.indices("docs_anns")._2("7")
      assert(doc7.path("annotations").toString == """["join","merge"]""",
        s"got ${doc7.toString}")
      // replay the sink stage (micro-batch retry): scripted upsert converges
      assert(EsRest.bulkUpsertAnnotations(anns, conf, "docs_anns", "doc_id", "annotations") == 0L)
      assert(EsRest.count(conf, "docs_anns") == 30L)
      assert(stub.indices("docs_anns")._2("7").path("annotations").toString == """["join","merge"]""")
    }
  }

  test("S1/S2: sliced scroll read returns every document exactly once, paging each slice") {
    withStub { stub =>
      val conf = EsConf(stub.url)
      val docs = (0 until 57).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
      EsRest.bulkIndex(docs, conf, "corpus", "doc_id")
      assert(EsRest.count(conf, "corpus") == 57L)
      // 3 slices × pageSize 5 → every slice pages through the scroll API
      val got = EsRest.readSliced(spark, conf, "corpus", slices = 3, pageSize = 5)
        .select("_id").as[String].collect().toSeq
      assert(got.size == 57, s"expected 57 rows, got ${got.size}")
      assert(got.distinct.size == 57, "sliced reads must not duplicate documents")
      // every slice cleared its server-side scroll context on exhaustion
      assert(stub.scrolls.isEmpty,
        s"scroll contexts must be released, ${stub.scrolls.size} left")
      // _source parses back columnar
      val parsed = EsRest.readSliced(spark, conf, "corpus", slices = 2, pageSize = 50)
        .select(from_json($"_source", org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING")).as("d"))
        .select("d.doc_id").as[Long].collect().toSet
      assert(parsed == (0L until 57L).toSet)
    }
  }

  test("stalled consumer past the keep-alive: task retry restarts the slice on a FRESH scroll, scan stays complete") {
    withStub { stub =>
      val conf = EsConf(stub.url, retryBackoffMs = 5)
      val docs = (0 until 12).map(i => (i.toLong, s"body $i")).toDF("doc_id", "text")
      EsRest.bulkIndex(docs, conf, "corpus", "doc_id")

      // a downstream consumer stalls 61 s (fake clock) after the first
      // page of a 1m-keep-alive scroll — page 2's continuation finds the
      // server-side context expired (404). The failure surface the
      // operator promises: the task FAILS descriptively (never a silent
      // partial scan), Spark's task retry re-runs the slice's partition
      // closure, and the retry opens a FRESH initial search — recovering
      // the full slice. local[4, 2] gives the scheduler one retry.
      EsStubSpec.stallClock = stub.clockMs
      EsStubSpec.stallsDone.set(0)
      EsStubSpec.attempts.set(0)
      val scrollsBefore = stub.scrolls.size

      val df = EsRest.readSliced(spark, conf, "corpus",
        slices = 1, pageSize = 5, scrollKeepAlive = "1m")
      val stalled = df.as[(String, String)].mapPartitions { it =>
        EsStubSpec.attempts.incrementAndGet()
        it.zipWithIndex.map { case (row, i) =>
          // after consuming page 1's last row, before page 2 is pulled:
          // the keep-alive bounds the PAGE GAP, and this gap exceeds it
          if (i == 4 && EsStubSpec.stallsDone.compareAndSet(0, 1))
            EsStubSpec.stallClock.addAndGet(61000L)
          row
        }
      }
      val got = stalled.collect().map(_._1).toSeq

      assert(EsStubSpec.stallsDone.get == 1, "the stall must have fired")
      assert(EsStubSpec.attempts.get == 2,
        s"expected attempt 1 to fail on the expired context and attempt 2 to recover, saw ${EsStubSpec.attempts.get} attempt(s)")
      // complete and exactly-once: the failed attempt's partial page
      // contributed nothing to the job's output
      assert(got.size == 12 && got.distinct.size == 12,
        s"task retry must yield the complete slice exactly once, got ${got.size} rows")
      // the recovery opened a fresh search context and released it on
      // exhaustion; the expired one was reaped by its 404
      assert(stub.scrolls.size == scrollsBefore,
        s"no leaked scroll contexts after recovery: ${stub.scrolls.keySet}")
    }
  }
}

/** Executor-side hooks for the stalled-scroll test (local mode shares the
  * JVM, so task closures reach the stub's fake clock through these
  * statics instead of serializing the stub).
  */
object EsStubSpec {
  @volatile var stallClock: java.util.concurrent.atomic.AtomicLong = _
  val stallsDone = new java.util.concurrent.atomic.AtomicInteger(0)
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}
