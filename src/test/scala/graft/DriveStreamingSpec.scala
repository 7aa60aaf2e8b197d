package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{AnnotationPipeline, NlpService}
import graft.streaming.DriveStreaming

/** End-to-end assertion for the composed streaming entry point: the sink
  * contents must equal the BATCH pipeline over the same documents and
  * tagger (source → filter → annotate → explode → project is semantics, not
  * execution mode), and a second drain over an already-consumed source must
  * change nothing (checkpointed file log + idempotent upsert).
  */
class DriveStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("DriveStreaming sink equals the batch pipeline; re-run is a no-op") {
    val srcDir = Files.createTempDirectory("drive-src").toString
    val sink = Files.createTempDirectory("drive-sink").toString + "/annotations"
    val ckpt = Files.createTempDirectory("drive-ckpt").toString
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source")
      .limit(200)
    // two files → the file source sees (at least) two inputs
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$srcDir/even")
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.parquet(s"$srcDir/odd")
    val glob = s"$srcDir/*"
    val tagger = new NlpService.MockTagger(AnnotationPipeline.DefaultTerms)

    val q = DriveStreaming.start(spark, glob, sink, ckpt, tagger)
    q.awaitTermination()
    val streamed = spark.read.parquet(sink)
    assert(streamed.columns.contains("_id"))
    assert(streamed.columns.count(_.startsWith("meta.")) == 3)
    assert(streamed.columns.count(_.startsWith("nlp.")) == 7)

    // batch twin: same docs, same tagger, same projection
    val filtered = AnnotationPipeline.filterValidText(
      spark.read.parquet(glob).select($"doc_id", $"text", $"lang", $"source"))
    val flat = NlpService.annotateAndExplode(spark, filtered, tagger)
      .join(filtered.select($"doc_id", $"lang", $"source"), Seq("doc_id"))
      .select($"doc_id", $"lang", $"source", $"id".as("ann_id"), $"cui",
        $"detected_name", $"source_value", $"acc",
        $"start".as("ann_start"), $"end".as("ann_end"))
    val batch = AnnotationPipeline.projectFlat(
      flat, DriveStreaming.PersistFields, DriveStreaming.AnnFields)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(df.columns.sorted.map(c => col(s"`$c`").cast("string")): _*)
        .collect().map(_.toSeq).toSet
    val (ks, kb) = (key(streamed), key(batch))
    assert(ks == kb,
      s"streamed sink must equal batch pipeline; stream-only=${(ks -- kb).take(5)} batch-only=${(kb -- ks).take(5)}")
    assert(streamed.count() > 0)

    // drain again with the SAME checkpoint: no new files → no new records
    val q2 = DriveStreaming.start(spark, glob, sink, ckpt, tagger)
    q2.awaitTermination()
    assert(key(spark.read.parquet(sink)) == key(batch), "re-drain must be a no-op")
  }
}
