package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{FunnelEvent, StreamingFunnel}

/** The streaming faces of q137 (ordered funnel) and q138 (cohort
  * retention) on the REAL events fixture: in-order slices ≡ the batch
  * operators, and replaying a whole slice (duplicate delivery) is a
  * state-level no-op — the StreamingCusum convention.
  */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  // the full sf0.001 event log in event-time order (in-order delivery);
  // ties broken by event_id so slicing is deterministic
  private lazy val ordered: Seq[FunnelEvent] =
    Tables.events(spark, sfDir)
      .orderBy(col("ts"), col("event_id"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent].collect().toSeq

  test("streamed funnel stages across slices ≡ batch q137 chain; slice replay is a no-op") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stages(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sfun").start()
    val slices = ordered.grouped(ordered.size / 3 + 1).toSeq
    slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    // duplicate delivery of a full slice: all stage folds must be no-ops
    mem.addData(slices(1): _*); q.processAllAvailable()
    q.stop()

    // latest emission per user = the one with the highest fold count
    val streamed = spark.table("sfun")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_seen").desc)))
      .filter(col("__rk") === 1)
      .select("user_id", "t1", "t2", "t3")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3))))).toMap

    // the q137 chain, inlined on the same fixture
    val ev = Tables.events(spark, sfDir)
    def stage(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"), col("ts"))
    val s1 = stage("signup").groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stage("click").join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = stage("purchase").join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val batch = s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3))))).toMap

    assert(batch.nonEmpty && batch.exists(_._2._3.isDefined),
      "fixture must complete the funnel for someone")
    // streamed covers every user with ANY event; restrict to signup users
    batch.foreach { case (u, chain) =>
      assert(streamed(u) == chain, s"user $u: ${streamed(u)} vs $chain")
    }
    // users who never signed up must have an empty chain
    streamed.filterNot(kv => batch.contains(kv._1)).values.foreach { chain =>
      assert(chain == ((None, None, None)), s"non-signup user grew a chain: $chain")
    }
  }}

  test("aggregated streamed chains reproduce q137's funnel row exactly") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stages(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sfun2").start()
    ordered.grouped(400).foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    q.stop()
    val last = spark.table("sfun2")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_seen").desc)))
      .filter(col("__rk") === 1)
    val got = last.agg(
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_clicked"),
        count(col("t3")).as("n_purchased"),
        round(avg((unix_micros(col("t3")) - unix_micros(col("t1"))).cast("double")), 4)
          .as("avg_funnel_us"))
      .collect().head
    val want = SparkEntry.queries("q137_funnel")(spark, sfDir).collect().head
    assert(got == want, s"streamed funnel row $got vs batch $want")
  }}

  test("streamed retention hits ≡ batch q138 triangle after the global trim; replay-idempotent") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.retentionHits(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sret").start()
    val slices = ordered.grouped(ordered.size / 4 + 1).toSeq
    slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    mem.addData(slices(2): _*); q.processAllAvailable() // duplicate delivery
    q.stop()

    val hits = spark.table("sret")
    // each (user, offset) may be emitted at most once — replay included
    assert(hits.groupBy("user_id", "day_offset").count().filter(col("count") > 1).count() == 0,
      "a retention hit must be exactly-once per (user, offset)")
    // the q138 global trim lives downstream of the changelog: cohorts
    // within 4 days of the earliest cohort (a property of the whole log)
    val triangle = hits
      .crossJoin(broadcast(hits.agg(min("cohort_day").as("__base"))))
      .filter(col("cohort_day") <= date_add(to_date(col("__base")), 4).cast("string"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2))).toSet
    val batch = SparkEntry.queries("q138_cohort_retention")(spark, sfDir)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_active"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(triangle == batch, s"triangle mismatch:\nstream $triangle\nbatch $batch")
  }}

  test("retention cohort anchors on a pre-1970 first event (epoch day −1 is a real day, not the sentinel)") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.retentionHits(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sret69").start()
    // first event 1969-12-31T12:00Z (epoch day −1), then activity on the
    // next two days — the cohort must anchor ONCE and offsets count from it
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val day = 86400000L
    mem.addData(
      FunnelEvent(7L, "view", ts(-day / 2)),
      FunnelEvent(7L, "view", ts(day / 2)))
    q.processAllAvailable()
    mem.addData(FunnelEvent(7L, "view", ts(day + day / 2)))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sret69")
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(hits == Set(("1969-12-31", 0), ("1969-12-31", 1), ("1969-12-31", 2)),
      s"cohort must stay anchored at 1969-12-31: $hits")
  }}
}
