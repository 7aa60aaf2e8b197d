package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.operators.NlpService
import graft.operators.NlpService.{Annotation, Doc}

/** Integration test of the production HTTP path (U1): a real local HTTP
  * server, pooled client, retry-on-non-200, error-column isolation —
  * everything except the actual NLP model.
  */
object HttpTaggerSpec {
  /** Top-level so the tagger closure doesn't capture the (non-serializable)
    * suite instance. Fixture server returns "term:start:end" lines.
    */
  def parse(body: String): Seq[Annotation] =
    body.linesIterator.filter(_.nonEmpty).zipWithIndex.map { case (l, i) =>
      val Array(t, s, e) = l.split(":")
      Annotation(i.toLong, s"TERM:$t", t, t, 1.0, s.toLong, e.toLong)
    }.toSeq
}

class HttpTaggerSpec extends SparkSuite {
  import spark.implicits._
  import HttpTaggerSpec.parse

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/annotate", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/annotate")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("HTTP tagger POSTs documents and parses annotations end to end") {
    withServer(ex => respond(ex, 200, "join:0:4\nmerge:5:10")) { url =>
      val tagger = new NlpService.HttpTagger(url, maxRetries = 1, parse = parse)
      val docs = Seq(Doc(1L, "join merge here"), Doc(2L, "more text")).toDS()
      val out = NlpService.annotate(docs, tagger).collect().sortBy(_.doc_id)
      assert(out.forall(_.error == null))
      assert(out(0).annotations.map(_.detected_name) == Seq("join", "merge"))
    }
  }

  test("retry on non-200: first attempt 500, second 200 (B3 retry semantics)") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() % 2 == 1) respond(ex, 500, "boom")
      else respond(ex, 200, "scan:1:5")
    } { url =>
      val tagger = new NlpService.HttpTagger(url, maxRetries = 1, parse = parse)
      val out = NlpService.annotate(Seq(Doc(7L, "scan me")).toDS(), tagger).collect()
      assert(out.head.error == null)
      assert(out.head.annotations.map(_.detected_name) == Seq("scan"))
      assert(calls.get() == 2)
    }
  }

  test("exhausted retries become an error row, not a task failure (B4)") {
    withServer(ex => respond(ex, 503, "down")) { url =>
      val tagger = new NlpService.HttpTagger(url, maxRetries = 2, parse = parse)
      val out = NlpService.annotate(
        Seq(Doc(1L, "text one"), Doc(2L, "text two")).toDS(), tagger).collect()
      assert(out.length == 2)
      assert(out.forall(_.error != null))
      assert(out.forall(_.annotations.isEmpty))
    }
  }
}
