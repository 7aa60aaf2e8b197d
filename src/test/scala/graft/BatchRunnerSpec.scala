package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.operators.{AnnotationPipeline, BatchRunner, NlpService}

class BatchRunnerSpec extends SparkSuite {
  import spark.implicits._

  private val tagger = new NlpService.MockTagger(AnnotationPipeline.DefaultTerms)

  test("segments are half-open, clamped, and cover [start, end) without overlap (B1 fix)") {
    val segs = BatchRunner.segments(
      LocalDate.parse("1999-01-01"), LocalDate.parse("1999-03-15"), 30)
    assert(segs.head == (LocalDate.parse("1999-01-01"), LocalDate.parse("1999-01-31")))
    assert(segs.last._2 == LocalDate.parse("1999-03-15")) // clamped
    segs.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 == s2) // adjacent, no overlap
      case _ =>
    }
  }

  test("full run over a dated corpus: every doc processed exactly once across segments") {
    val srcDir = Files.createTempDirectory("src").toString + "/docs"
    val sinkDir = Files.createTempDirectory("sink").toString + "/out"
    // 90 days of docs, one per day, each containing a taggable term
    val docs = (0 until 90).map { i =>
      (i.toLong, s"daily report $i with join and merge inside",
        LocalDate.parse("2020-01-01").plusDays(i.toLong).toString)
    }.toDF("doc_id", "text", "dct")
    docs.write.mode("overwrite").parquet(srcDir)

    val cfg = PipelineConfig(
      sourcePath = srcDir, sinkPath = sinkDir,
      dateStart = Some("2020-01-01"), dateEnd = Some("2020-03-31"),
      intervalDays = 30)
    BatchRunner.run(spark, cfg, tagger)

    val out = spark.read.parquet(sinkDir)
    // 90 docs × 2 annotations (join, merge), each exactly once
    assert(out.count() == 180)
    assert(out.select("_id").distinct().count() == 180)
    val perDoc = out.groupBy("`meta.doc_id`").agg(count(lit(1)).as("n"))
    assert(perDoc.filter($"n" =!= 2).count() == 0)
  }

  test("multi-segment run with split-by-field keeps ALL segments (no overwrite loss)") {
    val srcDir = Files.createTempDirectory("src3").toString + "/docs"
    val sinkDir = Files.createTempDirectory("sink3").toString + "/out"
    // 3 segments of 30 days, one doc per segment boundary month
    (0 until 90 by 10).map { i =>
      (i.toLong, s"doc $i with join inside", s"src${i % 2}",
        LocalDate.parse("2020-01-01").plusDays(i.toLong).toString)
    }.toDF("doc_id", "text", "source", "dct")
      .write.mode("overwrite").parquet(srcDir)
    val cfg = PipelineConfig(
      sourcePath = srcDir, sinkPath = sinkDir,
      dateStart = Some("2020-01-01"), dateEnd = Some("2020-03-31"),
      intervalDays = 30, persistFields = Seq("doc_id"),
      splitIndexByField = Some("nlp.id")) // partition by an always-present column
    BatchRunner.run(spark, cfg, tagger)
    // every one of the 9 docs has exactly one 'join' annotation; docs from
    // segment 1 (January) must survive the segment 2 and 3 writes
    val out = spark.read.parquet(sinkDir)
    assert(out.select("`meta.doc_id`").distinct().count() == 9)
  }

  test("re-run is idempotent (upsert converges) and already-processed check skips work") {
    val srcDir = Files.createTempDirectory("src2").toString + "/docs"
    val sinkDir = Files.createTempDirectory("sink2").toString + "/out"
    (0 until 10).map(i => (i.toLong, s"text $i has a window here", "2020-01-05"))
      .toDF("doc_id", "text", "dct")
      .write.mode("overwrite").parquet(srcDir)
    val cfg = PipelineConfig(
      sourcePath = srcDir, sinkPath = sinkDir, checkAlreadyProcessed = true)
    BatchRunner.run(spark, cfg, tagger)
    val first = spark.read.parquet(sinkDir).collect().map(_.toSeq).toSet
    BatchRunner.run(spark, cfg, tagger)
    val second = spark.read.parquet(sinkDir).collect().map(_.toSeq).toSet
    assert(first == second)
    assert(first.size == 10) // one 'window' annotation per doc
  }
}
