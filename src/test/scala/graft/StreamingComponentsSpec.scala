package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class StreamingComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("stream-maintained snapshot ≡ one-shot batch snapshot; re-drain is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("cc-store").toString + "/cc"
    val ckpt = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (7L, 70L), (8L, 80L),
      (10L, 100L), (11L, 110L)).toDF("doc_id", "n_chars")
    val mem = MemoryStream[(Long, Long)]
    def drain(): Unit = {
      val q = graft.streaming.StreamingComponents.start(
        mem.toDF().toDF("id_a", "id_b"), docs, store, ckpt)
      q.awaitTermination()
    }
    assert(graft.streaming.StreamingComponents.current(spark, store).isEmpty)
    // batch 0: {1,2,3} and {7,8}; batch 1: bridge 3-7 (cross-batch
    // merge) + brand-new {10,11} — the growth path must relabel 7,8
    mem.addData((1L, 2L), (2L, 3L), (7L, 8L)); drain()
    val mid = graft.streaming.StreamingComponents.current(spark, store).get
      .as[(Long, Long, Long)].collect().toSet
    assert(mid.map(r => r._2 -> r._1).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    mem.addData((3L, 7L), (10L, 11L)); drain()
    val streamed = graft.streaming.StreamingComponents.current(spark, store).get
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = Dedup.componentSnapshot(
      Seq((1L, 2L), (2L, 3L), (7L, 8L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b"),
      docs).as[(Long, Long, Long)].collect().toSet
    assert(streamed == oneShot, s"streamed $streamed vs one-shot $oneShot")
    // the growth batch's partition holds ONLY the delta, not a full
    // snapshot rewrite: 7,8 relabeled + 10,11 new = 4 rows
    val b1 = spark.read.parquet(s"$store/batch=1")
    assert(b1.count() == 4, "batch 1 must be delta-sized")
    // draining with no new data must not disturb the store
    drain()
    val again = graft.streaming.StreamingComponents.current(spark, store).get
      .as[(Long, Long, Long)].collect().toSet
    assert(again == streamed)
  }
}
