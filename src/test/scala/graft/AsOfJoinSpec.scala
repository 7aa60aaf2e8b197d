package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics on hand-built cases: at-or-before matching,
  * tie-breaks, tolerance bounds, and no-match nulls.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (7L, t("2024-01-01 10:00:00"), 100L), // right rows at 9:00 and 10:00 → 10:00 wins (at-or-before)
    (7L, t("2024-01-01 08:00:00"), 101L), // only right row ≤ 8:00 is 7:00
    (8L, t("2024-01-01 10:00:00"), 102L), // no right rows for user 8 → null
    (9L, t("2024-01-01 23:00:00"), 103L)  // right at 01:00 → lag 22h, excluded by 2h tolerance
  ).toDF("user_id", "ts", "event_id")

  private lazy val right = Seq(
    (7L, t("2024-01-01 07:00:00"), 1L),
    (7L, t("2024-01-01 09:00:00"), 2L),
    (7L, t("2024-01-01 10:00:00"), 3L), // equal to left ts → visible
    (7L, t("2024-01-01 10:00:00"), 4L), // tie: greatest id wins
    (7L, t("2024-01-01 11:00:00"), 5L), // after → never visible
    (9L, t("2024-01-01 01:00:00"), 6L)
  ).toDF("user_id", "ts", "event_id")

  private def run(tol: Option[Long]) =
    AsOfJoin.join(left, right, "user_id", "ts", "ts", "event_id", tol)
      .select("event_id", "asof_right_id", "asof_lag_ms")
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("unbounded: at-or-before match with greatest-id tie-break") {
    val out = run(None)
    assert(out(100L) == ((Some(4L), Some(0L))))          // tied 10:00 rows → id 4
    assert(out(101L) == ((Some(1L), Some(3600000L))))    // 7:00, 1 h lag
    assert(out(102L) == ((None, None)))                  // no right rows
    assert(out(103L) == ((Some(6L), Some(22L * 3600000)))) // 22 h lag
  }

  test("tolerance bounds the lag") {
    val out = run(Some(2L * 3600000))
    assert(out(100L) == ((Some(4L), Some(0L))))
    assert(out(101L) == ((Some(1L), Some(3600000L))))
    assert(out(103L) == ((None, None)))                  // 22 h > 2 h
  }

  test("forward: at-or-after match with smallest-id tie-break and tolerance") {
    val out = AsOfJoin.joinForward(left, right, "user_id", "ts", "ts", "event_id", None)
      .select("event_id", "asof_right_id", "asof_lead_ms")
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(100L) == ((Some(3L), Some(0L))))          // tied 10:00 rows → SMALLEST id 3
    assert(out(101L) == ((Some(2L), Some(3600000L))))    // next right after 8:00 is 9:00
    assert(out(102L) == ((None, None)))
    assert(out(103L) == ((None, None)))                  // nothing after 23:00
    val tol = AsOfJoin.joinForward(left, right, "user_id", "ts", "ts", "event_id",
        Some(30L * 60000))
      .select("event_id", "asof_right_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tol(101L) == None, "9:00 is 1 h ahead — outside the 30 min tolerance")
    assert(tol(100L) == Some(3L))
  }

  test("nearest: closest |lag| wins, equal distances resolve backward") {
    val l2 = Seq(
      (7L, t("2024-01-01 09:30:00"), 200L), // 9:00 (30m back) vs 10:00 (30m fwd) → TIE → backward id 2
      (7L, t("2024-01-01 09:40:00"), 201L), // 10:00 is 20m fwd, 9:00 is 40m back → forward, ids 3/4 → smallest 3
      (7L, t("2024-01-01 06:00:00"), 202L), // only forward candidates; nearest = 7:00 id 1
      (8L, t("2024-01-01 06:00:00"), 203L)  // no rows → null
    ).toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.joinNearest(l2, right, "user_id", "ts", "ts", "event_id", None)
      .select("event_id", "asof_right_id", "asof_signed_lag_ms")
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(200L) == ((Some(2L), Some(30L * 60000))), s"tie must resolve backward: $out")
    assert(out(201L) == ((Some(3L), Some(-20L * 60000))), s"forward pick: $out")
    assert(out(202L) == ((Some(1L), Some(-3600000L))))
    assert(out(203L) == ((None, None)))
    // tolerance excludes both directions
    val tol = AsOfJoin.joinNearest(l2, right, "user_id", "ts", "ts", "event_id",
        Some(10L * 60000))
      .select("event_id", "asof_right_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tol(201L) == None && tol(202L) == None)
  }

  test("nearest: two traversals still shuffle ONCE (one exchange, two sorts)") {
    val df = AsOfJoin.joinNearest(left, right, "user_id", "ts", "ts", "event_id", None)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange, plan:\n$plan")
  }

  test("binnedIntervalJoin: trailing-window matches exact, bin boundaries inclusive, misses null") {
    import graft.operators.Sessionize
    val probe = Seq(
      (7L, t("2024-01-01 10:00:00"), 100L), // clicks at 9:00(=t-1h, inclusive), 9:30, 10:00 → 3
      (7L, t("2024-01-01 08:00:00"), 101L), // click at 7:00 exactly t-1h → 1
      (8L, t("2024-01-01 10:00:00"), 102L), // user with no clicks → 0
      (9L, t("2024-01-01 23:00:00"), 103L)  // click 22h earlier → 0
    ).toDF("user_id", "ts", "event_id")
    val build = Seq(
      (7L, t("2024-01-01 07:00:00")),
      (7L, t("2024-01-01 09:00:00")),
      (7L, t("2024-01-01 09:30:00")),
      (7L, t("2024-01-01 10:00:00")), // equal to probe ts → inclusive
      (7L, t("2024-01-01 10:00:01")), // after → never visible
      (9L, t("2024-01-01 01:00:00"))
    ).toDF("user_id", "ts")
    val out = Sessionize.binnedIntervalJoin(probe, build, "user_id", "ts", "event_id", 3600000L)
      .groupBy("event_id").agg(count(col("__b_ts")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 3L, 101L -> 1L, 102L -> 0L, 103L -> 0L), s"got $out")
    // true LEFT semantics row for row: matched probes emit ONLY match rows
    // (no phantom null from the other candidate bin), misses exactly one
    // null row each — count(*) per id must equal max(count(__b_ts), 1)
    val rows = Sessionize.binnedIntervalJoin(probe, build, "user_id", "ts", "event_id", 3600000L)
      .collect().map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.sql.Timestamp]("__b_ts"))))
    val perId = rows.groupBy(_._1).view.mapValues(_.toSeq).toMap
    assert(perId(100L).size == 3 && perId(100L).forall(_._2.nonEmpty), "phantom null on matched probe")
    assert(perId(101L) == Seq((101L, Some(t("2024-01-01 07:00:00")))))
    assert(perId(102L) == Seq((102L, None)) && perId(103L) == Seq((103L, None)))
    val pairs = rows.filter(_._2.nonEmpty)
    assert(pairs.length == pairs.distinct.length, "bin expansion duplicated a match")
  }

  test("binnedIntervalJoin plans as an equi-join, never a nested-loop range join") {
    import graft.operators.Sessionize
    val probe = Seq((7L, t("2024-01-01 10:00:00"), 100L)).toDF("user_id", "ts", "event_id")
    val build = Seq((7L, t("2024-01-01 09:30:00"))).toDF("user_id", "ts")
    val p = Sessionize.binnedIntervalJoin(probe, build, "user_id", "ts", "event_id", 3600000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("one shuffle: both windows share a single sort (one Window stage)") {
    val df = AsOfJoin.join(left, right, "user_id", "ts", "ts", "event_id", None)
    df.collect()
    // AQE stringification repeats the tree under "== Initial Plan ==" —
    // count nodes in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Window ".r.findAllIn(plan).size == 1, s"expected one Window stage:\n$plan")
    // exactly one Exchange below the window (the union shuffles once on key)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange, plan:\n$plan")
  }
}
