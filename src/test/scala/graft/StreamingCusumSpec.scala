package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TimeSeries
import graft.streaming.{CusumEvent, StreamingCusum}

class StreamingCusumSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // two series against the same reference N(0, 1): "a" holds baseline then
  // shifts to +3, "b" stays in-control throughout
  private val pointsA = Seq(0.3, -0.2, 0.1, -0.4, 0.2, 0.0, -0.1, 0.3) ++ Seq.fill(6)(3.0)
  private val pointsB = Seq(0.1, -0.1, 0.2, -0.3, 0.0, 0.1, -0.2, 0.2, 0.1, -0.1, 0.0, 0.1, -0.2, 0.1)
  private val events: Seq[CusumEvent] =
    (pointsA.zipWithIndex.map { case (v, i) => CusumEvent("a", ts(i), i.toLong, v) } ++
      pointsB.zipWithIndex.map { case (v, i) => CusumEvent("b", ts(i), 100L + i, v) })
      .sortBy(_.id)

  test("streamed scores across 3 micro-batches ≡ the batch fixed-param twin; state carries between batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CusumEvent]
    val q = StreamingCusum.scores(mem.toDS(), mu = 0.0, sd = 1.0)
      .writeStream.outputMode("append").format("memory").queryName("sc").start()
    // slices are in event order per key: state must carry the recursion
    // across the batch boundaries for the scores to match the batch twin
    events.grouped(10).foreach { slice =>
      mem.addData(slice: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sc").as[(String, Long, Double, Double, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    val batch = TimeSeries.cusumWithParams(
        events.toDF("key", "ts", "id", "value"),
        "key", "ts", "id", "value", mu = 0.0, sd = 1.0)
      .select("key", "id", "z", "cusum_pos", "cusum_neg", "alarm")
      .as[(String, Long, Double, Double, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (z, p, n, a)) =>
      val (bz, bp, bn, ba) = batch(k)
      assert(math.abs(z - bz) < 1e-9, s"z at $k")
      assert(math.abs(p - bp) < 1e-9, s"pos at $k: $p vs $bp")
      assert(math.abs(n - bn) < 1e-9, s"neg at $k: $n vs $bn")
      assert(a == ba, s"alarm at $k")
    }
    // the shifted series alarms, the in-control one never does
    assert(streamed.collect { case ((k, _), v) if k == "a" => v._4 }.exists(identity))
    assert(streamed.collect { case ((k, _), v) if k == "b" => v._4 }.forall(!_))
  }
}
