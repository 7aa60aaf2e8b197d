package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  // distinct base texts (shingle sets disjoint enough to never cross the
  // 0.6 threshold against each other) and near-dup mutations (one word
  // swapped in ~30 words → Jaccard well above 0.6)
  private val baseA = ("alpha " + (1 to 30).map(i => s"a$i").mkString(" "))
  private val baseB = ("bravo " + (1 to 30).map(i => s"b$i").mkString(" "))
  private val baseC = ("carol " + (1 to 30).map(i => s"c$i").mkString(" "))
  private def mutate(t: String) = t.replace(" 17 ", " z ").replaceFirst("a7", "zz")

  test("jaccardBetween finds cross-relation dups, caps old postings, skips same id") {
    val newSh = Dedup.shingleIndex(
      Seq((10L, mutate(baseA)), (11L, baseC)).toDF("doc_id", "text"), "doc_id", "text", 3)
    val oldSh = Dedup.shingleIndex(
      Seq((1L, baseA), (2L, baseB), (10L, mutate(baseA))).toDF("doc_id", "text"), "doc_id", "text", 3)
    val pairs = Dedup.jaccardBetween(newSh, oldSh, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 matches history doc 1 (near-dup) but NOT itself (id 10 in store);
    // 11 (carol) matches nothing
    assert(pairs == Set((10L, 1L)), s"got $pairs")
    // a tiny posting cap of 1 keeps only the lowest-id posting per shingle —
    // doc 1 still wins every shared shingle, so the pair survives the cap
    val capped = Dedup.jaccardBetween(newSh, oldSh, 0.6, maxPostings = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 1L)), s"got $capped")
  }

  test("streaming admission dedups within batch and against history; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("sd-store").toString + "/store"
    val sink = Files.createTempDirectory("sd-sink").toString + "/survivors"
    val ckpt = Files.createTempDirectory("sd-ckpt").toString
    val mem = MemoryStream[(Long, String)]

    def drain(): Unit = {
      val q = StreamingDedup.start(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store, sink, ckpt)
      q.awaitTermination()
    }

    // batch 1: A, B, and a near-dup of A (within-batch drop of the higher id)
    mem.addData((1L, baseA), (2L, baseB), (3L, mutate(baseA)))
    drain()
    val after1 = spark.read.parquet(sink).select("doc_id").as[Long].collect().sorted
    assert(after1.toSeq == Seq(1L, 2L), s"batch 1 survivors: ${after1.toSeq}")

    // batch 2: near-dup of B (cross-history drop) + genuinely new C
    mem.addData((4L, mutate(baseB).replace("b3 ", "q ")), (5L, baseC))
    drain()
    val after2 = spark.read.parquet(sink).select("doc_id").as[Long].collect().sorted
    assert(after2.toSeq == Seq(1L, 2L, 5L), s"batch 2 survivors: ${after2.toSeq}")

    // the store holds exactly the survivors' shingle postings
    val storeIds = spark.read.parquet(store).select("__id").distinct().as[Long].collect().sorted
    assert(storeIds.toSeq == Seq(1L, 2L, 5L))

    // replaying an already-admitted doc in a later batch: dropped as a dup
    // of history (id differs), while an identical-id replay is ignored by
    // the self-pair guard and simply re-admitted idempotently
    mem.addData((6L, baseC), (5L, baseC))
    drain()
    val after3 = spark.read.parquet(sink).select("doc_id").as[Long].collect().sorted
    assert(after3.toSeq == Seq(1L, 2L, 5L), s"replay survivors: ${after3.toSeq}")
  }
}
