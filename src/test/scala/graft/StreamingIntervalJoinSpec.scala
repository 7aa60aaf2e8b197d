package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.streaming.{IntervalEvent, StreamingIntervalJoin}

/** Pins [[graft.streaming.StreamingIntervalJoin]]: the native stream-stream
  * join's inner matches equal the batch binned interval join's matched
  * subset (boundary-inclusive both ends), `left_outer` emits the miss row
  * once no-match is final, eviction provably removes buffered state, and
  * the events-fixture twin replays q136's matched pairs micro-batch by
  * micro-batch.
  */
class StreamingIntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (event_id, matched ts-as-millis) — Timestamp lacks an implicit Ordering. */
  private def canon(xs: Seq[(Long, Option[Timestamp])]): Seq[(Long, Option[Long])] =
    xs.map { case (id, o) => (id, o.map(_.getTime)) }.sorted

  // window = 10 min. u1: clicks at both inclusive boundaries (p.ts − w and
  // p.ts) plus one 1 s outside each end; u2: a click from ANOTHER user at a
  // matching time (key isolation); u3: a purchase with no click at all.
  private val purchases = Seq(
    IntervalEvent(100L, 1L, ts("2024-01-01 10:00:00")),
    IntervalEvent(200L, 3L, ts("2024-01-01 10:00:00")))
  private val clicks = Seq(
    IntervalEvent(1L, 1L, ts("2024-01-01 09:50:00")), // == p.ts − w: in
    IntervalEvent(2L, 1L, ts("2024-01-01 09:49:59")), // 1 s early: out
    IntervalEvent(3L, 1L, ts("2024-01-01 10:00:00")), // == p.ts: in
    IntervalEvent(4L, 1L, ts("2024-01-01 10:00:01")), // 1 s late: out
    IntervalEvent(5L, 2L, ts("2024-01-01 09:55:00"))) // other user: out

  private def runStream(
      ps: Seq[Seq[IntervalEvent]], cs: Seq[Seq[IntervalEvent]],
      joinType: String, name: String): (Seq[(Long, Option[Timestamp])], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[IntervalEvent]
    val cm = MemoryStream[IntervalEvent]
    val joined = StreamingIntervalJoin.attribute(
      pm.toDF(), cm.toDF(), "user_id", "ts", "event_id",
      windowMs = 600000L, watermarkDelay = "5 minutes", joinType = joinType)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    ps.zipAll(cs, Seq.empty[IntervalEvent], Seq.empty[IntervalEvent])
      .foreach { case (p, c) =>
        if (p.nonEmpty) pm.addData(p: _*)
        if (c.nonEmpty) cm.addData(c: _*)
        q.processAllAvailable()
      }
    val stateRows = q.lastProgress.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L)
    q.stop()
    val out = spark.table(name)
      .select(col("event_id"), col("__b_ts"))
      .as[(Long, Option[Timestamp])].collect().toSeq
    (out, stateRows)
  }

  test("inner matches ≡ batch binned interval join, boundary-inclusive; key-isolated") {
    val (got, _) = runStream(Seq(purchases), Seq(clicks), "inner", "ssj_inner")
    val batch = Sessionize.binnedIntervalJoin(
        purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("event_id", "user_id", "ts").drop("event_id"),
        "user_id", "ts", "event_id", 600000L)
      .filter(col("__b_ts").isNotNull)
      .select(col("event_id"), col("__b_ts"))
      .as[(Long, Option[Timestamp])].collect().toSeq
    assert(canon(got) == canon(batch), s"stream $got\nbatch $batch")
    // the hand shape: u1 keeps exactly the two boundary clicks; u3 nothing
    assert(canon(got) == canon(Seq(
      100L -> Some(ts("2024-01-01 09:50:00")),
      100L -> Some(ts("2024-01-01 10:00:00")))))
  }

  test("left_outer emits the null miss row only after no-match is final; state is evicted") {
    // batch 2's far-future rows advance both watermarks past p.ts + w,
    // making u3's no-match final AND evicting batch-1 state
    val flush = IntervalEvent(999L, 9L, ts("2024-01-02 12:00:00"))
    val (got, stateRows) = runStream(
      Seq(purchases, Seq(flush)), Seq(clicks, Seq(flush.copy(event_id = 998L))),
      "left_outer", "ssj_outer")
    val misses = got.filter(_._2.isEmpty).map(_._1)
    assert(misses == Seq(200L),
      s"exactly the clickless purchase must null-extend: $got")
    assert(got.count(_._1 == 100L) == 2, "matched probe must NOT null-extend")
    // eviction: far fewer buffered rows than the 9 fed events remain
    assert(stateRows < 4, s"state must be evicted, still buffering $stateRows")
  }

  test("events-fixture twin: 3-slice replay ≡ the batch matched pairs (q136's operator shape)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[IntervalEvent].collect().sortBy(_.ts.getTime)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[IntervalEvent].collect().sortBy(_.ts.getTime)
    def slices(xs: Array[IntervalEvent]) = {
      val k = math.max(1, (xs.length + 2) / 3)
      xs.grouped(k).map(_.toSeq).toSeq
    }
    val (got, _) = runStream(slices(p), slices(c), "inner", "ssj_twin")
    val batch = Sessionize.binnedIntervalJoin(
        p.toSeq.toDF("event_id", "user_id", "ts"),
        c.toSeq.toDF("event_id", "user_id", "ts").drop("event_id"),
        "user_id", "ts", "event_id", 600000L)
      .filter(col("__b_ts").isNotNull)
      .select(col("event_id"), col("__b_ts"))
      .as[(Long, Option[Timestamp])].collect().toSeq
    assert(got.nonEmpty, "fixture twin must exercise at least one match")
    assert(canon(got) == canon(batch),
      s"stream ${got.size} rows vs batch ${batch.size}")
  }
}
