package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Connectors

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedAggregate: counts match plain groupBy on a skewed key") {
    // 90% of rows share one key — the K4 hot-partition shape
    val skewed = spark.range(0, 10000)
      .select(when($"id" % 10 === 0, concat(lit("cold"), $"id" % 7))
        .otherwise(lit("hot")).as("k"))
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAggregate(
      skewed, Seq("k"), count(lit(1)).as("pn"), sum("pn").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("hot") == 9000L)
  }

  test("saltedJoin: result matches plain join on a hot fact key") {
    val fact = spark.range(0, 5000)
      .select((when($"id" % 5 === 0, $"id" % 20).otherwise(lit(3L))).as("fk"),
        $"id".as("v"))
    val dim = spark.range(0, 20).select($"id".as("dk"), concat(lit("d"), $"id").as("name"))
    val plain = fact.join(dim, $"fk" === $"dk")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("ES connector option map mirrors the reference's connector config (S6)") {
    val opts = Connectors.esOptions(
      Seq("https://es1:9200", "https://es2:9200"),
      httpAuthUser = Some("u"), httpAuthPass = Some("p"))
    assert(opts("es.nodes") == "https://es1:9200,https://es2:9200")
    assert(opts("es.net.ssl") == "true")
    assert(opts("es.net.http.auth.user") == "u")
    assert(opts("es.batch.size.entries") == "10000") // BULK_CHUNK_SIZE
    assert(opts("es.http.timeout") == "30s")         // BULK_REQUEST_TIMEOUT_S
    val apiKeyOpts = Connectors.esOptions(Seq("http://es:9200"), apiKey = Some("abc"))
    assert(apiKeyOpts("es.net.http.header.Authorization") == "ApiKey abc")
    assert(apiKeyOpts("es.net.ssl") == "false")
  }

  test("Connectors.read falls back to parquet for filesystem paths") {
    val df = Connectors.read(spark, s"$sfDir/nation.parquet")
    assert(df.count() == 25)
  }

  test("P6 ingest timestamping: one batch-level HH:mm:ss value for all rows") {
    val stamped = graft.operators.AnnotationPipeline.withIngestTime(
      Tables.documents(spark, sfDir).limit(100))
    val times = stamped.select("ingest_time").distinct().as[String].collect()
    assert(times.length == 1)
    assert(times.head.matches("\\d{2}:\\d{2}:\\d{2}"))
  }
}
