package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.streaming.{CusumEvent, StreamingEwma}

/** Pins [[graft.operators.TimeSeries.ewma]] and its streaming twin
  * [[graft.streaming.StreamingEwma]]: hand-computed recurrence, the
  * no-breach-on-first-point contract, pre-update breach semantics,
  * single-point keys, equal-ts tie-break by id — and the twin: in-order
  * micro-batch replay's final rows ≡ the batch summary bit-for-bit.
  */
class EwmaSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // key a: 10 → 20 (d=10 breach) → 2 (d=|2−12.5|=10.5 breach) → 12.2
  //   (d=|12.2−9.875|=2.325 breach) → EWMA = 0.25·12.2+0.75·9.875 = 10.45625
  // key b: one point (no fold, no breach); key c: equal-ts tie by id
  private val rows = Seq(
    ("a", ts(0), 1L, 10.0), ("a", ts(1), 2L, 20.0),
    ("a", ts(2), 3L, 2.0), ("a", ts(3), 4L, 12.2),
    ("b", ts(0), 5L, 42.0),
    ("c", ts(0), 7L, 1.0), ("c", ts(0), 6L, 5.0)) // id 6 first → init 5.0

  private def batch() = TimeSeries.ewma(
    rows.toDF("key", "ts", "id", "value"), "key", "ts", "id", "value",
    alpha = 0.25, threshold = 2.0)
    .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap

  test("hand-computed fold: pre-update breach semantics, first point exempt, tie by id") {
    val m = batch()
    assert(m("a") == (("a", 4L, 10.45625, 3L)), s"got ${m("a")}")
    assert(m("b") == (("b", 1L, 42.0, 0L)), "single point: init only, no breach")
    // c: init 5.0 (id 6), then x=1.0: d=4 > 2 breach; EWMA = 0.25+3.75 = 4.0
    assert(m("c") == (("c", 2L, 4.0, 1L)), s"got ${m("c")}")
  }

  // key a, all-dyadic inputs so every recurrence value is EXACT in double:
  //   init l=10 b=0 s=0
  //   x=20:    e=10        s=100                l=12.5          b=0.3125
  //   x=2:     e=−10.8125  s=216.91015625       l=10.109375     b=−0.025390625
  //   x=12.25: e=2.166015625 s=221.601779937744140625
  //            l=10.62548828125 b=0.04229736328125 forecast=10.66778564453125
  test("holt: exact dyadic hand-fold; trend init 0; single point; tie by id") {
    val hrows = Seq(
      ("a", ts(0), 1L, 10.0), ("a", ts(1), 2L, 20.0),
      ("a", ts(2), 3L, 2.0), ("a", ts(3), 4L, 12.25),
      ("b", ts(0), 5L, 42.0),
      ("c", ts(0), 7L, 1.0), ("c", ts(0), 6L, 5.0))
    val m = TimeSeries.holt(hrows.toDF("key", "ts", "id", "value"),
        "key", "ts", "id", "value", alpha = 0.25, beta = 0.125)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m("a") == (("a", 4L, 10.625488, 0.042297, 10.667786, 221.60178)),
      s"got ${m("a")}")
    assert(m("b") == (("b", 1L, 42.0, 0.0, 42.0, 0.0)),
      "single point: level = the point, zero trend and SSE")
    // c: init 5.0 (id 6 orders first at the equal ts); x=1 → l=4, b=−0.125
    assert(m("c") == (("c", 2L, 4.0, -0.125, 3.875, 16.0)), s"got ${m("c")}")
  }

  test("holt: on a clean linear ramp the trend state converges to the slope") {
    val ramp = (0 until 40).map(t => ("r", ts(t), t.toLong, 5.0 + 3.0 * t))
    val r = TimeSeries.holt(ramp.toDF("key", "ts", "id", "value"),
        "key", "ts", "id", "value", alpha = 0.25, beta = 0.125)
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(math.abs(r._4 - 3.0) < 0.05, s"trend must approach the slope 3: $r")
    // one-step forecast of the NEXT point (t=40 → 125) is near-exact
    assert(math.abs(r._5 - 125.0) < 0.5, s"forecast must track the ramp: $r")
  }

  test("streaming Holt twin: in-order micro-batches, final rows ≡ batch summary bit-for-bit") {
    import graft.streaming.StreamingHolt
    implicit val sqlCtx = spark.sqlContext
    val hrows = Seq(
      ("a", ts(0), 1L, 10.0), ("a", ts(1), 2L, 20.0),
      ("a", ts(2), 3L, 2.0), ("a", ts(3), 4L, 12.25),
      ("b", ts(0), 5L, 42.0),
      ("c", ts(0), 7L, 1.0), ("c", ts(0), 6L, 5.0))
    val mem = MemoryStream[CusumEvent]
    val q = StreamingHolt.smooth(mem.toDS(), alpha = 0.25, beta = 0.125)
      .writeStream.outputMode("append").format("memory").queryName("holt").start()
    // slice boundary lands mid-series for a (after two points)
    val evs = hrows.sortBy(r => (r._2.getTime, r._3))
      .map(r => CusumEvent(r._1, r._2, r._3, r._4))
    evs.grouped(3).foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    q.stop()
    val finals = spark.table("holt")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
      .groupBy(_._1).map { case (k, xs) =>
        val last = xs.maxBy(_._3)
        k -> ((k, last._3, last._4, last._5, last._6, last._7))
      }
    val batch = TimeSeries.holt(hrows.toDF("key", "ts", "id", "value"),
        "key", "ts", "id", "value", alpha = 0.25, beta = 0.125)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(finals == batch, s"stream $finals\nbatch $batch")
  }

  test("streaming twin: in-order micro-batches, final rows ≡ batch summary; state carries unrounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CusumEvent]
    val q = StreamingEwma.smooth(mem.toDS(), alpha = 0.25, threshold = 2.0)
      .writeStream.outputMode("append").format("memory").queryName("ewma").start()
    // slice boundary lands mid-series for a (after two points)
    val evs = rows.sortBy(r => (r._2.getTime, r._3))
      .map(r => CusumEvent(r._1, r._2, r._3, r._4))
    evs.grouped(3).foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("ewma")
      .as[(String, Long, Long, Double, Boolean, Long)].collect()
    val finals = streamed.groupBy(_._1).map { case (k, xs) =>
      val last = xs.maxBy(_._3)
      k -> ((k, last._3, last._4, last._6))
    }
    val b = batch()
    assert(finals == b.map { case (k, r) => k -> ((r._1, r._2, r._3, r._4)) },
      s"stream $finals\nbatch $b")
    // per-point trail for a: breaches flagged at the 2nd, 3rd, 4th points
    val aTrail = streamed.filter(_._1 == "a").sortBy(_._3)
    assert(aTrail.map(_._5).toSeq == Seq(false, true, true, true))
  }
}
