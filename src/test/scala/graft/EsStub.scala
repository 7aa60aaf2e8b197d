package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.EsRest

/** In-JVM single-node "cluster" stub speaking the endpoint families the
  * reference's elasticsearch-py client uses (ping, index lifecycle, _bulk,
  * _count, sliced _search + scroll) — shared by [[EsStubSpec]] (batch
  * protocol layer) and [[EsStreamingSinkSpec]] (the same wire under a
  * running Structured Streaming job). Failure injection knobs:
  * `rejectIds` (per-item 400s), `bulk429Remaining` (next-N-bulks
  * backpressure), `expireScrolls` (mid-read context loss).
  */
class EsStub {
  val mapper = new ObjectMapper()
  // index -> (mapping json, docs: id -> source)
  val indices = TrieMap.empty[String, (String, TrieMap[String, JsonNode])]
  val bulkChunkSizes = new ConcurrentLinkedQueue[Int]()
  val bulkBodies = new ConcurrentLinkedQueue[String]()
  val authHeaders = new ConcurrentLinkedQueue[String]()
  // ids the stub refuses to index (per-item error, not HTTP failure) —
  // drives the failed-item accounting test
  val rejectIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // failure injection: next N _bulk POSTs answer 429 (backpressure);
  // when set, every scroll continuation answers 404 (expired context)
  val bulk429Remaining = new java.util.concurrent.atomic.AtomicInteger(0)
  val bulkAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var expireScrolls = false
  val scrolls = TrieMap.empty[String, EsStub.ScrollCtx]
  private val scrollSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  // Fake clock for scroll keep-alive (tests advance it — no real sleeps).
  // The stub honors `scroll=<keepalive>` like ES: the initial search and
  // every continuation refresh the context's deadline to now + keepAlive;
  // a continuation after the deadline answers 404 — so a consumer that
  // stalls between page pulls longer than its requested window fails
  // exactly as it would against a real cluster.
  val clockMs = new java.util.concurrent.atomic.AtomicLong(0L)
  // last keep-alive the initial search requested (the propagation probe)
  val lastKeepAliveMs = new java.util.concurrent.atomic.AtomicLong(-1L)

  private def parseKeepAliveMs(s: String): Long = s.trim match {
    case ka if ka.endsWith("ms") => ka.dropRight(2).toLong
    case ka if ka.endsWith("h")  => ka.dropRight(1).toLong * 3600000L
    case ka if ka.endsWith("m")  => ka.dropRight(1).toLong * 60000L
    case ka if ka.endsWith("s")  => ka.dropRight(1).toLong * 1000L
    case ka => ka.toLong
  }

  val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()
  def url = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    // HEAD must not carry a body; -1 means no body follows
    if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { ex.getResponseBody.write(bytes) }
    }
    ex.close()
  }

  private def sliceDocs(index: String, sliceId: Int, maxSlices: Int): Seq[(String, JsonNode)] =
    indices(index)._2.toSeq.sortBy(_._1)
      .filter { case (id, _) =>
        maxSlices <= 1 || math.floorMod(id.hashCode, maxSlices) == sliceId }

  private def handle(ex: HttpExchange): Unit = try {
    Option(ex.getRequestHeaders.getFirst("Authorization")).foreach(authHeaders.add)
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path.stripPrefix("/").split("/").filter(_.nonEmpty).toList) match {
      case ("GET", Nil) =>
        respond(ex, 200, """{"name":"stub","cluster_name":"graft","version":{"number":"8.0.0"}}""")
      case ("HEAD", idx :: Nil) =>
        respond(ex, if (indices.contains(idx)) 200 else 404)
      case ("PUT", idx :: Nil) =>
        indices.putIfAbsent(idx, (body, TrieMap.empty))
        respond(ex, 200, """{"acknowledged":true}""")
      case ("DELETE", idx :: Nil) =>
        respond(ex, if (indices.remove(idx).isDefined) 200 else 404,
          """{"acknowledged":true}""")
      case ("GET", idx :: "_count" :: Nil) =>
        respond(ex, 200, s"""{"count":${indices.get(idx).map(_._2.size).getOrElse(0)}}""")
      case ("GET", idx :: "_doc" :: id :: Nil) =>
        indices.get(idx).flatMap(_._2.get(id)) match {
          case Some(src) => respond(ex, 200,
            s"""{"_index":"$idx","_id":"$id","found":true,"_source":$src}""")
          case None => respond(ex, 404, s"""{"found":false}""")
        }
      case ("POST", "_bulk" :: Nil) if {
        bulkAttempts.incrementAndGet()
        bulk429Remaining.getAndUpdate(n => math.max(n - 1, 0)) > 0
      } =>
        respond(ex, 429,
          """{"error":{"type":"es_rejected_execution_exception"},"status":429}""")
      case ("POST", "_bulk" :: Nil) =>
        val lines = body.split("\n").filter(_.nonEmpty)
        bulkChunkSizes.add(lines.length / 2)
        bulkBodies.add(body)
        val items = new scala.collection.mutable.ArrayBuffer[String]()
        lines.grouped(2).foreach { case Array(action, payload) =>
          val a = mapper.readTree(action)
          if (a.has("index")) {
            val idx = a.path("index").path("_index").asText()
            val id = a.path("index").path("_id").asText()
            if (rejectIds.contains(id))
              items += s"""{"index":{"_id":"$id","status":400,"error":{"type":"stub_rejected"}}}"""
            else {
              indices.getOrElseUpdate(idx, ("{}", TrieMap.empty))
                ._2.put(id, mapper.readTree(payload))
              items += s"""{"index":{"_id":"$id","status":201}}"""
            }
          } else if (a.has("update")) {
            val idx = a.path("update").path("_index").asText()
            val id = a.path("update").path("_id").asText()
            if (rejectIds.contains(id))
              items += s"""{"update":{"_id":"$id","status":400,"error":{"type":"stub_rejected"}}}"""
            else {
              val docs = indices.getOrElseUpdate(idx, ("{}", TrieMap.empty))._2
              val p = mapper.readTree(payload)
              docs.get(id) match {
                case Some(existing) =>
                  // execute the documented painless script semantics:
                  // replace the annotations array with params.annotations
                  val src = p.path("script").path("source").asText()
                  require(src == EsRest.AnnotationsScript, s"unexpected script: $src")
                  val updated = existing.deepCopy[ObjectNode]()
                  updated.set("annotations",
                    p.path("script").path("params").path("annotations"))
                  docs.put(id, updated)
                case None =>
                  docs.put(id, p.path("upsert"))
              }
              items += s"""{"update":{"_id":"$id","status":200}}"""
            }
          }
        }
        val anyErr = items.exists(_.contains("\"error\""))
        respond(ex, 200,
          s"""{"errors":$anyErr,"items":${items.mkString("[", ",", "]")}}""")
      case ("POST", idx :: "_search" :: Nil) =>
        val q = mapper.readTree(if (body.isEmpty) "{}" else body)
        val sliceId = q.path("slice").path("id").asInt(0)
        val maxSlices = q.path("slice").path("max").asInt(1)
        val size = q.path("size").asInt(10)
        val keepAlive = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst {
            case kv if kv.startsWith("scroll=") =>
              parseKeepAliveMs(kv.stripPrefix("scroll="))
          }.getOrElse(60000L)
        lastKeepAliveMs.set(keepAlive)
        val all = sliceDocs(idx, sliceId, maxSlices)
        val page = all.take(size)
        val sid = s"scroll-${scrollSeq.incrementAndGet()}"
        scrolls.put(sid, EsStub.ScrollCtx(idx, sliceId, maxSlices, size,
          page.length, keepAlive, clockMs.get + keepAlive))
        respond(ex, 200, searchResponse(sid, page, all.size))
      case ("DELETE", "_search" :: "scroll" :: Nil) =>
        val sid = mapper.readTree(body).path("scroll_id").asText()
        respond(ex, if (scrolls.remove(sid).isDefined) 200 else 404,
          """{"succeeded":true}""")
      case ("POST", "_search" :: "scroll" :: Nil) if expireScrolls =>
        respond(ex, 404, """{"error":"search context expired"}""")
      case ("POST", "_search" :: "scroll" :: Nil) =>
        val req = mapper.readTree(body)
        val sid = req.path("scroll_id").asText()
        scrolls.get(sid) match {
          case Some(ctx) if clockMs.get > ctx.deadlineMs =>
            scrolls.remove(sid)
            respond(ex, 404, """{"error":"search context expired"}""")
          case Some(ctx) =>
            val all = sliceDocs(ctx.index, ctx.sliceId, ctx.maxSlices)
            val page = all.slice(ctx.offset, ctx.offset + ctx.pageSize)
            val ka = Option(req.path("scroll").asText(null))
              .map(parseKeepAliveMs).getOrElse(ctx.keepAliveMs)
            scrolls.put(sid, ctx.copy(offset = ctx.offset + page.length,
              keepAliveMs = ka, deadlineMs = clockMs.get + ka))
            respond(ex, 200, searchResponse(sid, page, all.size))
          case None => respond(ex, 404, """{"error":"no such scroll"}""")
        }
      case _ => respond(ex, 400, s"""{"error":"unhandled $method $path"}""")
    }
  } catch {
    case e: Exception => respond(ex, 500, s"""{"error":${graft.functions.JsonUtil.quote(e.toString)}}""")
  }

  private def searchResponse(sid: String, page: Seq[(String, JsonNode)], total: Int): String = {
    val hits = page.map { case (id, src) =>
      s"""{"_id":"$id","_source":$src}"""
    }.mkString("[", ",", "]")
    s"""{"_scroll_id":"$sid","hits":{"total":{"value":$total},"hits":$hits}}"""
  }
}

object EsStub {
  /** Server-side scroll context: paging cursor + keep-alive deadline
    * against the stub's fake clock.
    */
  case class ScrollCtx(
      index: String, sliceId: Int, maxSlices: Int, pageSize: Int,
      offset: Int, keepAliveMs: Long, deadlineMs: Long)

  def withStub(f: EsStub => Unit): Unit = {
    val stub = new EsStub
    try f(stub) finally stub.stop()
  }
}
