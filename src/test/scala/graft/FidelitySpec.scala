package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AnnotationPipeline, NlpService}
import graft.sources.{Connectors, Sinks}

/** The last §2.1 fidelity line-items: S7 probe, P7 coercion, D2 fan-out,
  * K7 DDL, K8 drop, U2 preset.
  */
class FidelitySpec extends SparkSuite {
  import spark.implicits._

  test("S7: liveness probe passes for a live endpoint, fails for a dead one") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("ok".getBytes(StandardCharsets.UTF_8))
      ex.close()
    })
    server.start()
    val live = s"http://127.0.0.1:${server.getAddress.getPort}/"
    try {
      assert(Connectors.checkUrlsAvailable(Seq(live), timeoutSec = 5))
      assert(!Connectors.checkUrlsAvailable(
        Seq(live, "http://127.0.0.1:1/nope"), timeoutSec = 1))
    } finally server.stop(0)
  }

  test("P7: result-as-JSON-string coerces identically to result-as-object") {
    val asObject = NlpFixtures.medcatJson
    val obj = NlpService.parseMedcatResponses(
        Seq((1L, asObject)).toDF("doc_id", "raw"), "doc_id", "raw")
      .select("cui").as[String].collect().sorted
    // string-encoded variant: the result OBJECT re-encoded as a JSON STRING
    val resultJson = spark.range(1).select(
      get_json_object(lit(asObject), "$.result").as("r")).as[String].head()
    val quoted = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(resultJson)
    val viaString = NlpService.parseMedcatResponses(
        Seq((1L, s"""{"result": $quoted}""")).toDF("doc_id", "raw"), "doc_id", "raw")
      .select("cui").as[String].collect().sorted
    assert(obj.nonEmpty && viaString.toSeq == obj.toSeq)
  }

  test("D2: multi-endpoint fan-out unions annotation streams with endpoint tags") {
    val docs = Seq((1L, "join and merge here")).toDF("doc_id", "text")
    val t1 = new NlpService.MockTagger(Seq("join"))
    val t2 = new NlpService.MockTagger(Seq("merge"))
    val out = NlpService.annotateMultiEndpoint(spark, docs, Seq("ep1" -> t1, "ep2" -> t2))
    val rows = out.select("endpoint", "detected_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set("ep1" -> "join", "ep2" -> "merge"))
  }

  test("K7: schema enforcement casts compatible columns and rejects missing ones") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val ok = Sinks.ensureSchema(Seq((1, "2.5")).toDF("id", "score"), schema)
    assert(ok.schema.map(_.dataType) == Seq(LongType, DoubleType))
    assert(ok.head().getDouble(1) == 2.5)
    val err = intercept[IllegalArgumentException] {
      Sinks.ensureSchema(Seq(1).toDF("id"), schema)
    }
    assert(err.getMessage.contains("score"))
  }

  test("K8: drop removes the sink; re-upsert recreates it") {
    val dir = java.nio.file.Files.createTempDirectory("k8").toString + "/sink"
    Sinks.upsert(spark, Seq(("a", 1)).toDF("k", "v"), dir, "k")
    assert(spark.read.parquet(dir).count() == 1)
    assert(Sinks.drop(spark, dir))
    Sinks.upsert(spark, Seq(("b", 2)).toDF("k", "v"), dir, "k")
    assert(spark.read.parquet(dir).as[(String, Int)].collect().toSeq == Seq(("b", 2)))
  }

  test("U2: BioYodie preset rides in the request body's application_params") {
    assert(NlpService.BioYodieParams == Map("annotationSets" -> "Bio:*"))
  }
}
