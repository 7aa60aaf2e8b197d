package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NlpService

/** Manual driver: multi-endpoint annotation fan-out (D2) and MedCAT
  * response parsing with P7 string coercion, through the public API.
  */
object DriveNlp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Seq((1L, "stream join merge"), (2L, "hash scan sort")).toDF("doc_id", "text")
    NlpService.annotateMultiEndpoint(spark, docs, Seq(
      "primary" -> new NlpService.MockTagger(Seq("join", "hash")),
      "secondary" -> new NlpService.MockTagger(Seq("merge", "sort"))))
      .select("doc_id", "endpoint", "detected_name", "start", "end")
      .orderBy("doc_id", "endpoint").show(false)
    val medcat =
      """{"result": {"annotations": {"entities": {"0": {"id": 0, "cui": "C42",
        |"detected_name": "x", "pretty_name": "X", "source_value": "x", "tuis": "T",
        |"types": "T", "acc": 1.0, "context_similarity": 1.0, "start": 0, "end": 1,
        |"meta_anns": {}}}}, "timestamp": "t"}}""".stripMargin.replace("\n", " ")
    NlpService.parseMedcatResponses(
      Seq((9L, medcat)).toDF("doc_id", "raw"), "doc_id", "raw")
      .select("doc_id", "entity_idx", "cui", "resp_timestamp").show(false)
    spark.stop()
  }
}
