package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Association

/** Pins [[graft.operators.Association.pairRulesGuarded]]'s contract: the
  * under-budget fast path is bit-identical to the open form, the
  * over-budget degrade derives a cap whose residual pair volume really
  * fits the budget (pair stats restricted to cold baskets, denominators
  * exact over all baskets), and the degrade is observable on the
  * `graft.basketGuard` metric channel.
  */
class AssociationSpec extends SparkSuite {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[(Long, Long, Long, Double, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("under-budget guarded output is bit-identical to pairRules on the sf corpus") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val open = sortedRows(Association.pairRules(li, "l_orderkey", "l_partkey"))
    val guarded = sortedRows(Association.pairRulesGuarded(li, "l_orderkey", "l_partkey"))
    assert(open.nonEmpty, "fixture must produce rules")
    assert(guarded == open, "under-budget guarded path must be the exact open form")
  }

  test("under-budget path ignores hotBasketCap (budget, not size, picks the regime)") {
    // one 10-item basket, volume 45 <= budget 100 → open form even though
    // k far exceeds hotBasketCap
    val b = (1 to 10).map(i => (1L, i.toLong)).toDF("bk", "it")
    val open = sortedRows(Association.pairRules(b, "bk", "it", minSupport = 1L))
    val guarded = sortedRows(Association.pairRulesGuarded(b, "bk", "it",
      minSupport = 1L, pairBudget = 100L, hotBasketCap = 3))
    assert(open.size == 45 && guarded == open)
  }

  test("forced guard: pairs from cold baskets only, denominators exact over all baskets") {
    // hot basket 100 holds items 1..6 (15 pairs); cold 2-item baskets hold
    // the rest (4 pairs). budget 10 → cap lands on k=2 (cum 4 <= 10 < 19).
    val rows =
      (1 to 6).map(i => (100L, i.toLong)) ++
        Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 3L), (3L, 4L), (4L, 1L), (4L, 3L))
    val df = rows.toDF("bk", "it")
    val got = Association.pairRulesGuarded(df, "bk", "it",
      minSupport = 1L, pairBudget = 10L, hotBasketCap = 6)
    val rs = sortedRows(got)
    // supports over ALL baskets: s(1)=4 s(2)=3 s(3)=3 s(4)=2; n=5
    val expect = Seq(
      (1L, 2L, 2L, 2.0 * 5 / (4 * 3), 2.0 / 4),
      (1L, 3L, 1L, 1.0 * 5 / (4 * 3), 1.0 / 4),
      (3L, 4L, 1L, 1.0 * 5 / (3 * 2), 1.0 / 3))
    assert(rs == expect, s"got $rs")
    // nothing co-occurring only in the hot basket may appear
    assert(!rs.exists(t => t._1 >= 5L || t._2 >= 5L), "hot-only pairs must be excised")
  }

  /** The basketGuard observe rides the cold-projection snapshot barrier's
    * QueryExecution (the split must materialize before both self-join
    * sides read it), so the assertion channel is the session-level
    * [[graft.tools.CapMetricsListener]] — the same channel BenchSkew
    * reports, and the fleet-wide one the no-silent-caps convention is for.
    */
  private def guardMetrics(run: => Unit): Map[String, Long] = {
    val listener = graft.tools.CapMetricsListener.register(spark)
    try {
      run
      // listener callbacks arrive asynchronously on the bus thread — poll
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!listener.snapshot.keys.exists(_.startsWith("graft.basketGuard")) &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      listener.snapshot.filter(_._1.startsWith("graft.basketGuard"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("forced guard fires the basketGuard observe metric with exact excision accounting") {
    val rows = (1 to 6).map(i => (100L, i.toLong)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
    val df = rows.toDF("bk", "it")
    val m = guardMetrics {
      Association.pairRulesGuarded(df, "bk", "it",
        minSupport = 1L, pairBudget = 5L, hotBasketCap = 6).collect()
    }
    assert(m.get("graft.basketGuard:hot_baskets").contains(1L), s"one 6-item hot basket: $m")
    assert(m.get("graft.basketGuard:skipped_pairs").contains(15L), s"6*5/2 excised pairs: $m")
  }

  test("many medium baskets: the derived cap bounds residual volume, never runs the open join") {
    // the r12-advice scenario: 10 baskets of 5 items (volume 10 each, 100
    // total), every k <= hotBasketCap. A fixed-cap excision would remove
    // nothing and run all 100 pairs; the derived cap must shrink until the
    // residual fits the budget — here to 1, excising everything.
    val rows = for (b <- 1 to 10; i <- 1 to 5) yield (b.toLong, (b * 10 + i).toLong)
    val df = rows.toDF("bk", "it")
    val m = guardMetrics {
      val got = Association.pairRulesGuarded(df, "bk", "it",
        minSupport = 1L, pairBudget = 30L, hotBasketCap = 256)
      val rs = got.collect()
      assert(rs.isEmpty, s"no basket fits a 30-pair budget at k=5: ${rs.toSeq}")
    }
    assert(m.get("graft.basketGuard:hot_baskets").contains(10L), s"$m")
    assert(m.get("graft.basketGuard:skipped_pairs").contains(100L), s"$m")
  }

  test("mixed sizes: cap admits the largest prefix of the histogram that fits the budget") {
    // 4 baskets of 2 (vol 4) + 2 of 4 (vol 12): budget 10 → cap 2 (4 <= 10 < 16)
    val rows =
      (1 to 4).flatMap(b => Seq((b.toLong, b * 10L + 1), (b.toLong, b * 10L + 2))) ++
        (5 to 6).flatMap(b => (1 to 4).map(i => (b.toLong, b * 10L + i)))
    val df = rows.toDF("bk", "it")
    val got = Association.pairRulesGuarded(df, "bk", "it",
      minSupport = 1L, pairBudget = 10L, hotBasketCap = 256)
    // exactly the four 2-item baskets' pairs survive — residual 4 <= budget
    assert(got.count() == 4L)
  }
}
