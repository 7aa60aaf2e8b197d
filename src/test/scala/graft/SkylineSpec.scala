package graft

import graft.operators.Skyline

/** Pins [[graft.operators.Skyline]]: result ≡ brute-force dominance on a
  * hand fixture with ties on each axis and full duplicates, shard
  * invariance (1 vs 32 shards — the decomposition must not change the
  * answer), and the frontier property on real data.
  */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  // (id, price to MINIMIZE, size to MAXIMIZE)
  private val pts = Seq(
    (1L, 10.0, 5L),  // frontier
    (2L, 10.0, 5L),  // full duplicate of 1 — both survive
    (3L, 12.0, 5L),  // dominated within size 5 (price)
    (4L, 8.0, 4L),   // frontier (cheaper, smaller)
    (5L, 10.0, 4L),  // dominated by 1 (same price, bigger size exists)
    (6L, 20.0, 9L),  // frontier (biggest)
    (7L, 20.0, 8L),  // dominated by 6 (same price, size 9 > 8)
    (8L, 7.0, 1L),   // frontier (cheapest)
    (9L, 7.5, 1L))   // dominated by 8

  private def brute(xs: Seq[(Long, Double, Long)]): Set[Long] =
    xs.filter { a =>
      !xs.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.map(_._1).toSet

  test("hand fixture ≡ brute-force dominance; duplicates and per-axis ties handled") {
    val df = pts.toDF("id", "price", "size")
    val got = Skyline.skyline2D(df, "price", "size", "id")
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts), s"got $got expected ${brute(pts)}")
    assert(got == Set(1L, 2L, 4L, 6L, 8L))
  }

  test("shard invariance: 1 shard ≡ 32 shards ≡ brute force on real parts") {
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .select("p_partkey", "p_retailprice", "p_size")
    val one = Skyline.skyline2D(df, "p_retailprice", "p_size", "p_partkey", shards = 1)
      .select("p_partkey").as[Long].collect().toSet
    val many = Skyline.skyline2D(df, "p_retailprice", "p_size", "p_partkey", shards = 32)
      .select("p_partkey").as[Long].collect().toSet
    val all = df.as[(Long, Double, Int)].collect().toSeq
      .map(t => (t._1, t._2, t._3.toLong))
    assert(one == many)
    assert(one == brute(all))
    assert(one.nonEmpty)
  }

  test("fractional maxCol: dominators farther than 1.0 on the max axis still prune (regression)") {
    // A=(1.0, 5.9) dominates B=(2.0, 5.5); a value-offset RANGE frame
    // (|Δ| <= 1.0 lookback) would miss A from B's frame and leak B
    val df = Seq((1L, 1.0, 5.9), (2L, 2.0, 5.5), (3L, 0.5, 0.1))
      .toDF("id", "price", "score")
    val got = Skyline.skyline2D(df, "price", "score", "id")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L), s"B must be dominated by A: $got")
  }
}
