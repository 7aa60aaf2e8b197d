package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TimeSeries
import graft.streaming.{ResampleEvent, StreamingResample}

class StreamingResampleSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // key a: minutes 0, 1 (tie on ts broken by id), 4 — gaps at 2, 3;
  // key b: minutes 2, 3 — contiguous. A batch boundary lands inside a's gap.
  private val events = Seq(
    ResampleEvent("a", ts(0), 1L, 10.0),
    ResampleEvent("a", ts(1), 2L, 20.0),
    ResampleEvent("a", ts(1), 3L, 25.0),
    ResampleEvent("b", ts(2), 4L, 99.0),
    ResampleEvent("a", ts(4), 5L, 40.0),
    ResampleEvent("b", ts(3), 6L, 98.0))

  test("fill-on-arrival across micro-batches ≡ the batch LOCF resample; late rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ResampleEvent]
    val q = StreamingResample.fillOnArrival(mem.toDS(), bucketSeconds = 60L)
      .writeStream.outputMode("append").format("memory").queryName("rs").start()
    // slices keep each bucket's rows within one micro-batch (the in-order
    // contract); the boundary still lands inside a's gap
    events.grouped(3).foreach { slice => mem.addData(slice: _*); q.processAllAvailable() }
    // a late replay for an already-settled bucket must change nothing
    mem.addData(ResampleEvent("a", ts(1), 99L, 77.0)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("rs")
      .as[(String, Long, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val batch = TimeSeries.resampleLocf(
        events.toDF("key", "ts", "id", "value"), "key", "ts", "id", "value", 60L)
      .as[(String, Long, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(streamed == batch, s"streamed $streamed\nbatch $batch")
    // the hand shape itself: a has 5 buckets with 2 flagged gaps carrying 25.0
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(streamed(("a", base + 120)) == ((25.0, true)))
    assert(streamed(("a", base + 180)) == ((25.0, true)))
    assert(streamed(("a", base + 240)) == ((40.0, false)))
    assert(streamed(("b", base + 180)) == ((98.0, false)))
  }
}
