package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

class JsonlSpec extends SparkSuite {
  import spark.implicits._

  test("jsonl round-trip preserves hostile payloads exactly (quotes, newlines, tabs, unicode, nulls)") {
    val rows = Seq(
      (1L, "plain text", "a"),
      (2L, "embedded \"quotes\" and \\backslashes\\", "b"),
      (3L, "line\nbreak and\ttab and \r carriage", "c"),
      (4L, "unicode: café — 中文 😀", "d"),
      (5L, null, "e"), // null text survives as null, not the string "null"
      (6L, "{\"looks\":\"like json\"}", "f"))
      .toDF("doc_id", "text", "source")
    val path = Files.createTempDirectory("graft_jsonl_spec").toString
    Sinks.writeJsonl(rows, path)
    val back = Sinks.readJsonl(spark, path, rows.schema)
    assert(back.count() == 6)
    val diff = rows.join(back, Seq("doc_id"), "full_outer")
      .filter(!(rows("text") <=> back("text")) || !(rows("source") <=> back("source")))
    assert(diff.count() == 0, "round-trip altered a payload")
    // projection pruning: a doc_id-only read parses no text field
    assert(Sinks.readJsonl(spark, path, rows.schema).select("doc_id")
      .queryExecution.executedPlan.toString.contains("doc_id"))
  }
}
