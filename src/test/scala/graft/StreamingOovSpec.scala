package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{OovDoc, StreamingOov}

/** Pins [[graft.streaming.StreamingOov]]: the cumulative counters over
  * in-order micro-batches equal the one-shot computation, routes never
  * mix, and the share uses exact integer counters.
  */
class StreamingOovSpec extends SparkSuite {
  import spark.implicits._

  test("cumulative OOV counters across batches ≡ one-shot; routes isolated; empty batch emits 0") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Set("a", "b", "c")
    val mem = MemoryStream[OovDoc]
    val q = StreamingOov.monitor(mem.toDS(), ref)
      .writeStream.outputMode("append").format("memory").queryName("oov").start()
    // route r1: 6 tokens, 2 OOV; route r2: 2 tokens, 2 OOV — split so
    // r1's documents land in DIFFERENT batches (state carry)
    mem.addData(OovDoc("r1", Seq("a", "b", "x")), OovDoc("r2", Seq("z", "w")))
    q.processAllAvailable()
    mem.addData(OovDoc("r1", Seq("c", "a", "y")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("oov")
      .as[(String, Long, Long, Long, Double)].collect()
    // latest snapshot per route = max batch_n
    val latest = rows.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).toMap
    assert(latest("r1") == (("r1", 2L, 6L, 2L, 0.333333)), s"got ${latest("r1")}")
    assert(latest("r2") == (("r2", 1L, 2L, 2L, 1.0)), s"got ${latest("r2")}")
    // the first r1 snapshot shows the mid-stream state, not the final
    val first = rows.filter(r => r._1 == "r1" && r._2 == 1L).head
    assert(first == (("r1", 1L, 3L, 1L, 0.333333)), s"got $first")
  }
}
