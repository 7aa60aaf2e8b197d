package graft

import org.apache.spark.sql.functions._

import graft.schemas.Schemas

/** Parse the reference-shaped NLP response fixtures (FIXTURES.md B2/B3)
  * with the declared schemas and unwrap them the way the reference does
  * (`annotations_indexer.py:266-285`).
  */
class SchemasSpec extends SparkSuite {
  import spark.implicits._

  import NlpFixtures.{medcatJson, gateJson}

  test("MedCAT response parses: entities is a MAP keyed by stringified index (B2)") {
    val df = Seq(medcatJson).toDF("raw")
      .select(from_json($"raw", Schemas.medcatResponse).as("r"))
    val exploded = df.select(
      $"r.result.timestamp".as("ts"),
      $"r.medcat_info".getItem("model").as("model"),
      explode(map_entries($"r.result.annotations.entities")).as("e"))
      .select($"ts", $"model", $"e.key", $"e.value.*")
    val rows = exploded.orderBy($"key").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("cui") == "C0008031")
    assert(rows(0).getAs[Long]("start") == 22L)
    val metaAnns = rows(0).getMap[String, org.apache.spark.sql.Row](rows(0).fieldIndex("meta_anns"))
    assert(metaAnns("Status").getAs[String]("value") == "Affirmed")
    assert(rows(1).getAs[String]("pretty_name") == "Dyspnea")
    assert(rows.forall(_.getAs[String]("model") == "medcat-1.x"))
  }

  test("GATE response parses and normalizes: P4 type/id/source_value enrichment (B3)") {
    val parsed = Seq(gateJson).toDF("raw")
      .select(from_json($"raw", Schemas.gateResponse).as("r"))
      .select($"r.text", explode(map_entries($"r.entities")).as("te"))
      .select($"text", $"te.key".as("type"), posexplode($"te.value").as(Seq("pos", "ent")))
      .select($"text", $"type", $"ent.*")
      .withColumn("start", element_at($"indices", 1).cast("long"))
      .withColumn("end", element_at($"indices", 2).cast("long"))
      .withColumn("source_value",
        expr("substring(text, cast(start as int) + 1, cast(end - start as int))"))
    val byType = parsed.collect().map(r => r.getAs[String]("type") -> r).toMap
    assert(byType("Person").getAs[String]("source_value") == "John Smith")
    assert(byType("Title").getAs[String]("source_value") == "Dr.")
    assert(byType("Person").getAs[Long]("start") == 0L)
    assert(byType("Title").getAs[Boolean]("matchedWithLonger"))
  }

  test("flat sink schema carries the dotted meta./nlp. namespaces (B4)") {
    val s = Schemas.flatSinkSchema(
      Seq("_id" -> org.apache.spark.sql.types.StringType),
      Seq("cui" -> org.apache.spark.sql.types.StringType))
    assert(s.fieldNames.toSeq == Seq("_id", "meta._id", "nlp.cui"))
  }

  test("gate annotation schema keeps the reference's trailing-space field quirks") {
    assert(Schemas.gateAnnotation.fieldNames.contains("orgType "))
    assert(Schemas.gateAnnotation.fieldNames.contains("rule "))
  }
}
