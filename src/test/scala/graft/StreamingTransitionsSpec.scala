package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Sessionize
import graft.streaming.{CatEvent, StreamingTransitions}

/** Pins [[graft.streaming.StreamingTransitions]] against
  * [[graft.operators.Sessionize.transitionMatrix]]: in-order micro-batch
  * replay's hop counts equal the batch matrix exactly, including a hop
  * whose two events straddle a batch boundary (the state carry) and a
  * session gap that must NOT hop.
  */
class StreamingTransitionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // user 7: a→b, b→a, then a gap > 1h (no hop), then a→b again;
  // user 8: single event — never hops
  private val events = Seq(
    CatEvent("7", ts(0), 1L, "a"), CatEvent("7", ts(1), 2L, "b"),
    CatEvent("7", ts(2), 3L, "a"),
    CatEvent("7", Timestamp.valueOf("2024-01-01 02:00:00"), 4L, "a"),
    CatEvent("7", Timestamp.valueOf("2024-01-01 02:01:00"), 5L, "b"),
    CatEvent("8", ts(0), 6L, "a"))

  test("streamed hops across batch boundaries ≡ the batch transition matrix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CatEvent]
    val q = StreamingTransitions.hops(mem.toDS(), gapMs = 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("hops").start()
    // slice size 2 puts the (2,3) hop's endpoints in DIFFERENT batches
    events.sortBy(_.id).grouped(2).foreach { s =>
      mem.addData(s: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("hops")
      .as[(String, Long, String, String)].collect()
    assert(streamed.map(_._2).sorted.toSeq == Seq(2L, 3L, 5L),
      s"hop ids: ${streamed.toSeq} — the 2h gap and the single-event key must not hop")
    val streamCounts = streamed.groupBy(h => (h._3, h._4)).view.mapValues(_.length.toLong).toMap
    val batch = Sessionize.transitionMatrix(
        events.map(e => (e.key, e.ts, e.id, e.category))
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", gapMs = 3600 * 1000)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamCounts == batch, s"stream $streamCounts vs batch $batch")
  }

  test("streamed trigrams across batch boundaries ≡ the batch trigram counts; gaps break both hops") {
    implicit val sqlCtx = spark.sqlContext
    // user 7's a→b→a closes a trigram at id 3; the 2h gap kills both the
    // (b,a,·) and (a,·,·) paths through id 4; a fresh a→b after the gap
    // has only ONE in-gap hop so no trigram; a third event at 02:02
    // completes the post-gap path
    val evs = events :+ CatEvent("7", Timestamp.valueOf("2024-01-01 02:02:00"), 7L, "c")
    val mem = MemoryStream[CatEvent]
    val q = StreamingTransitions.trigrams(mem.toDS(), gapMs = 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("tri").start()
    // slice size 2 splits every trigram's endpoints across batches
    evs.sortBy(_.id).grouped(2).foreach { s =>
      mem.addData(s: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("tri")
      .as[(String, Long, String, String, String)].collect()
    assert(streamed.map(_._2).sorted.toSeq == Seq(3L, 7L),
      s"trigram ids: ${streamed.toSeq}")
    val streamCounts = streamed.groupBy(h => (h._3, h._4, h._5))
      .view.mapValues(_.length.toLong).toMap
    val batch = Sessionize.sessionTrigrams(
        evs.map(e => (e.key, e.ts, e.id, e.category))
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type",
        gapMs = 3600 * 1000, topN = 100)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(streamCounts == batch, s"stream $streamCounts vs batch $batch")
  }
}
