package graft

import graft.operators.NlpService

/** The response-normalization operators (MedCAT unwrap + GATE P4) as
  * first-class dataflow, on FIXTURES.md B2/B3-shaped payloads.
  */
class NlpParseSpec extends SparkSuite {
  import spark.implicits._

  private val medcat = NlpFixtures.medcatJson
  private val gate = NlpFixtures.gateJson

  test("parseMedcatResponses: map-keyed entities → flat enriched rows") {
    val df = Seq((42L, medcat)).toDF("doc_id", "raw")
    val out = NlpService.parseMedcatResponses(df, "doc_id", "raw")
      .orderBy("entity_idx").collect()
    assert(out.length == 2)
    val first = out(0)
    assert(first.getAs[Long]("doc_id") == 42L)
    assert(first.getAs[String]("cui") == "C0008031")
    assert(first.getAs[String]("resp_timestamp") == "2020-03-15T12:00:00")
    assert(first.getMap[String, String](first.fieldIndex("medcat_info"))("model") == "medcat-1.x")
  }

  test("parseMedcatResponses: F4 shape guard drops malformed payloads") {
    val df = Seq((1L, medcat), (2L, """{"result": null}"""), (3L, "not json"))
      .toDF("doc_id", "raw")
    val out = NlpService.parseMedcatResponses(df, "doc_id", "raw")
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("spark.read.json loads NLP fixture files with the declared schema (JSON source)") {
    val dir = java.nio.file.Files.createTempDirectory("nlpjson").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/responses.json"),
      medcat.replaceAll("\n", " ") + "\n")
    val df = spark.read.schema(graft.schemas.Schemas.medcatResponse).json(dir)
    assert(df.count() == 1)
    val keys = df.select(org.apache.spark.sql.functions.map_keys(
      org.apache.spark.sql.functions.col("result.annotations.entities")).as("k"))
      .as[Seq[String]].head()
    assert(keys.sorted == Seq("0", "1"))
  }

  test("parseGateResponses: P4 normalization — type, running id, source_value") {
    val df = Seq((7L, gate)).toDF("doc_id", "raw")
    val out = NlpService.parseGateResponses(df, "doc_id", "raw")
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(0L, 1L))
    val byType = out.map(r => r.getAs[String]("type") -> r).toMap
    assert(byType("Person").getAs[String]("source_value") == "John Smith")
    assert(byType("Title").getAs[String]("source_value") == "Dr.")
    assert(byType("Person").getAs[Long]("start") == 0L)
    assert(byType("Title").getAs[Long]("end") == 26L)
  }
}
