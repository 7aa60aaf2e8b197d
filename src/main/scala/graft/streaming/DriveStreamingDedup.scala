package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity
import graft.sources.Sinks

/** Throughput driver for the two incremental admission operators
  * ([[StreamingDedup]] text near-dup, [[StreamingSemanticDedup]] embedding
  * SemDeDup): feeds the driver `documents`/`embeddings` tables through N
  * sequential micro-batches against a fresh store and reports, per batch,
  * admission seconds / rows in / survivors / store size — the per-batch
  * cost CURVE as history grows, which a single end-to-end number hides.
  * (Correctness — replay idempotence, cap semantics — is the specs' job;
  * this main exists because those operators were never measured.)
  *
  * Batch assignment is `id % nBatches`, so batch contents are
  * deterministic and disjoint. Stores live in per-run temp dirs.
  * Output: one JSON line per operator family plus a combined docs/s
  * figure, BENCH_NOTES-ready.
  */
object DriveStreamingDedup {

  private case class BatchStat(
      batch: Int, rowsIn: Long, survivors: Long, storeRows: Long, sec: Double)

  private def r3(v: Double): Double =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def jstats(stats: Seq[BatchStat]): String =
    stats.map(s =>
      s"""{"batch":${s.batch},"rows_in":${s.rowsIn},"survivors":${s.survivors},"store_rows":${s.storeRows},"sec":${r3(s.sec)}}""")
      .mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt.max(2)
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "8").toInt
    // SPARK_GRAFT_CONTAIN_T > 0 enables the containment admission pass
    // (batch×history subsumption) alongside the Jaccard comparison — the
    // throughput knob for measuring what the extra directed pass costs
    val containT = sys.env.getOrElse("SPARK_GRAFT_CONTAIN_T", "0").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // text near-dup admission over documents
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    val textStore = java.nio.file.Files
      .createTempDirectory("graft_adm_text").toString + "/store"
    val textStats = (0 until nBatches).map { i =>
      val batch = docs.filter(col("doc_id") % nBatches === i)
      val rowsIn = batch.count()
      // the timed region includes store MAINTENANCE (the compaction
      // cadence), so the curve is the honest total cost per batch
      val t0 = System.nanoTime()
      if (compactEvery > 0 && i > 0 && i % compactEvery == 0)
        Sinks.compactBatchStore(spark, textStore, upToBatch = i.toLong)
      val survivors = StreamingDedup
        .admitBatch(spark, batch, "doc_id", "text", textStore, batchId = i.toLong,
          containThreshold = containT).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // store rows = shingle postings (the real state size), not documents
      val storeRows = Sinks.readBatchStore(spark, textStore).map(_.count()).getOrElse(0L)
      BatchStat(i, rowsIn, survivors, storeRows, sec)
    }
    val totalDocs = textStats.map(_.rowsIn).sum
    val totalSec = textStats.map(_.sec).sum
    println(
      s"""{"metric":"streaming_text_admission","docs":$totalDocs,"batches":$nBatches,"total_sec":${r3(totalSec)},"docs_per_sec":${r3(totalDocs / totalSec)},"curve":${jstats(textStats)}}""")

    // semantic admission over embeddings
    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    val cents = Similarity.centroids(emb, 16)
    val semStore = java.nio.file.Files
      .createTempDirectory("graft_adm_sem").toString + "/store"
    val semStats = (0 until nBatches).map { i =>
      val batch = emb.filter(col("vec_id") % nBatches === i)
      val rowsIn = batch.count()
      val t0 = System.nanoTime()
      if (compactEvery > 0 && i > 0 && i % compactEvery == 0)
        Sinks.compactBatchStore(spark, semStore, upToBatch = i.toLong)
      val survivors = StreamingSemanticDedup
        .admitBatch(spark, batch, cents, semStore, batchId = i.toLong).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val storeRows = Sinks.readBatchStore(spark, semStore).map(_.count()).getOrElse(0L)
      BatchStat(i, rowsIn, survivors, storeRows, sec)
    }
    val totalVecs = semStats.map(_.rowsIn).sum
    val semSec = semStats.map(_.sec).sum
    println(
      s"""{"metric":"streaming_semantic_admission","vecs":$totalVecs,"batches":$nBatches,"total_sec":${r3(semSec)},"vecs_per_sec":${r3(totalVecs / semSec)},"curve":${jstats(semStats)}}""")
    spark.stop()
  }
}
