package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingSemanticDedup

/** Incremental semantic-dedup admission: within-batch SemDeDup, then
  * batch-vs-history per cell, store extended by survivors only, idempotent
  * under replay.
  */
class StreamingSemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  // two orthogonal centroids: cell 10 ≈ x-axis, cell 20 ≈ y-axis
  private val cents = Array(
    (10L, Seq(1.0, 0.0, 0.0, 0.0)),
    (20L, Seq(0.0, 1.0, 0.0, 0.0)))

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("admits within-batch survivors, drops cross-history semantic dups, replays idempotently") {
    val store = Files.createTempDirectory("graft_sem_store").toString + "/store"

    // batch 1: a≈b in cell 10 (b drops within batch); d alone in cell 20
    val b1 = emb(
      1L -> Seq(1.0f, 0.01f, 0f, 0f),
      2L -> Seq(1.0f, 0.02f, 0f, 0f),
      7L -> Seq(0f, 1.0f, 0f, 0f))
    val out1 = StreamingSemanticDedup
      .admitBatch(spark, b1, cents, store, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(out1 == Set(1L, 7L), "within-batch: greater id of the near-pair drops")

    // batch 2: c ≈ batch-1's survivor (cross-history drop); e is a new
    // direction in cell 20 far from d (admitted)
    val b2 = emb(
      3L -> Seq(1.0f, 0.03f, 0f, 0f),
      8L -> Seq(0.1f, 1.0f, 3.0f, 0f))
    val out2 = StreamingSemanticDedup
      .admitBatch(spark, b2, cents, store, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(out2 == Set(8L), "history: vec 3 is semantically already admitted")

    // replay batch 2 (micro-batch retry): same decision, store unchanged
    val replay = StreamingSemanticDedup
      .admitBatch(spark, b2, cents, store, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(replay == Set(8L), "replay must reproduce the admission decision")
    val stored = spark.read.parquet(store)
    assert(stored.select("vec_id").as[Long].collect().toSet == Set(1L, 7L, 8L))
    assert(stored.count() == 3L, "upsert keyed by vec_id: no duplicate store rows")
  }

  test("store-side cell cap bounds the history comparison and is observable") {
    val store = Files.createTempDirectory("graft_sem_cap").toString + "/store"
    // 5 vectors fanning 0°..31° off the x-axis (adjacent gap ≈8.5°,
    // cos ≈ 0.99): all assign to cell 10, none is a θ=0.999 near-dup of
    // another, so all 5 are admitted
    val b1 = emb((0 until 5).map { i =>
      (i.toLong, Seq(1.0f, 0.15f * i, 0f, 0f))
    }: _*)
    assert(StreamingSemanticDedup
      .admitBatch(spark, b1, cents, store, threshold = 0.999).count() == 5L)

    // a new vector identical to the HIGHEST stored id: with the store cell
    // capped to 2 (lowest-id prefix), vec 4 is outside the compared prefix,
    // so the new arrival is admitted — bounded work, documented recall loss
    val b2 = emb(100L -> Seq(1.0f, 0.6f, 0f, 0f))
    val out = StreamingSemanticDedup.admitBatch(
      spark, b2, cents, store, threshold = 0.999, maxStorePerCell = 2)
    assert(out.count() == 1L, "cap excluded the twin from the comparison")
    // and the same arrival against the FULL store is dropped
    val out2 = StreamingSemanticDedup.admitBatch(
      spark, emb(101L -> Seq(1.0f, 0.6f, 0f, 0f)), cents, store,
      threshold = 0.999)
    assert(out2.count() == 0L, "uncapped comparison catches the twin")
  }
}
