package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank semantics pinned against an independent driver-side mirror
  * (plain Scala Maps, same per-layer rounding contract).
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Driver mirror of [[Graph.pageRank]]: same formula, same per-layer
    * round-to-9, but computed with scala.collection loops.
    */
  private def mirror(
      edges: Seq[(Long, Long, Double)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = edges.map { case (s, t, w) => ((s, t), w / outw(s)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outw.contains).map(pr).sum
      pr = nodes.map { v =>
        val con = p.collect { case ((s, t), pp) if t == v => pr(s) * pp }.sum
        v -> r9((1.0 - d) / n + d * (con + dangling / n))
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("uniform ring: every node ranks exactly 1/N") {
    val ring = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 1L, 1.0))
    val got = run(ring, 5)
    assert(got.size == 4)
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9, got))
  }

  test("star with dangling leaves matches the driver mirror and conserves mass") {
    // hub 0 points to 3 leaves; leaves are dangling (no out-edges)
    val star = Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (0L, 3L, 1.0))
    for (iters <- Seq(1, 4)) {
      val got = run(star, iters)
      val want = mirror(star, iters)
      assert(got.keySet == want.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, s"node $k iters $iters") }
      // dangling redistribution keeps total mass at 1 (± rounding)
      assert(math.abs(got.values.sum - 1.0) < 1e-6, s"mass leak at iters=$iters: ${got.values.sum}")
    }
    // the heavier edge (w=2) must rank node 2 above nodes 1 and 3
    val r = run(star, 4)
    assert(r(2L) > r(1L) && r(2L) > r(3L))
  }

  test("weighted digraph with cycles matches the driver mirror") {
    val g = Seq(
      (1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0), (3L, 1L, 1.0),
      (3L, 4L, 1.0), (4L, 4L, 2.0), (4L, 1L, 1.0), (5L, 1L, 7.0))
    val got = run(g, 4)
    val want = mirror(g, 4)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, s"node $k") }
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("triangleCounts: K4 corners in 3 each; dups/directions/self-loops canonicalized away") {
    import spark.implicits._
    val edges = Seq(
      // K4 on 1-4, with one duplicate, one reversed, one self-loop
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 2L), (3L, 3L),
      // pendant edge: no triangle
      (5L, 6L))
      .toDF("s", "d")
    val got = graft.operators.Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("shortestHops: path graph distances; hop cap truncates; unreachable absent") {
    import spark.implicits._
    // path 0-1-2-3-4 (mixed directions — BFS must symmetrize) + island 8-9
    val edges = Seq((0L, 1L), (2L, 1L), (2L, 3L), (4L, 3L), (8L, 9L)).toDF("s", "d")
    val full = graft.operators.Graph.shortestHops(edges, "s", "d", source = 0L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(full == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4), s"got $full")
    val capped = graft.operators.Graph.shortestHops(edges, "s", "d", source = 0L, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(0L -> 0, 1L -> 1, 2L -> 2), s"got $capped")
  }

  test("allPairsHops: symmetric path distances per source; components stay separate") {
    import spark.implicits._
    // path 0-1-2, island 8-9
    val edges = Seq((0L, 1L), (1L, 2L), (8L, 9L)).toDF("s", "d")
    val got = graft.operators.Graph.allPairsHops(edges, "s", "d", maxHops = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = Map(
      (0L, 0L) -> 0, (0L, 1L) -> 1, (0L, 2L) -> 2,
      (1L, 0L) -> 1, (1L, 1L) -> 0, (1L, 2L) -> 1,
      (2L, 0L) -> 2, (2L, 1L) -> 1, (2L, 2L) -> 0,
      (8L, 8L) -> 0, (8L, 9L) -> 1, (9L, 8L) -> 1, (9L, 9L) -> 0)
    assert(got == want, s"got $got")
  }

  test("hyperBallCloseness ≡ exact closeness from allPairsHops (sparse-mode HLL is exact)") {
    import spark.implicits._
    // path 0-1-2-3 (distinct closeness per position), triangle 5-6-7,
    // island pair 8-9 — multi-component, multi-diameter
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L),
      (5L, 6L), (6L, 7L), (5L, 7L), (8L, 9L)).toDF("s", "d")
    val exact = graft.operators.Graph.allPairsHops(edges, "s", "d", maxHops = 6)
      .groupBy("src")
      .agg(count(lit(1)).as("n_reached"), sum("hops").as("total_hops"),
        round((count(lit(1)) - lit(1)).cast("double") / sum("hops"), 6).as("closeness"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val hll = graft.operators.Graph.hyperBallCloseness(edges, "s", "d", maxHops = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(hll == exact, s"sketch path must be exact here:\nhll  $hll\nexact $exact")
    // spot-pin one value so both paths can't be wrong together: node 1
    // reaches 0,2 at 1 hop and 3 at 2 → (4, 4, 0.75)
    assert(hll(1L) == ((4L, 4L, 0.75)))
  }

  test("hits: hand-iterated star values; pure sources/sinks separate; deterministic") {
    import spark.implicits._
    // 1,2,3 → 10 and 1 → 20, unit weights, 2 iterations:
    //   it1: a = (10:1, 20:1/3); h = (1:1, 2:.75, 3:.75)
    //   it2: a_raw = (10:2.5, 20:1) → a = (10:1, 20:.4)
    //        h_raw = (1:1.4, 2:1, 3:1) → h = (1:1, 2:1/1.4, 3:1/1.4)
    val edges = Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 1L), (1L, 20L, 1L))
      .toDF("src", "dst", "w")
    def run() = graft.operators.Graph.hits(edges, "src", "dst", "w", iterations = 2)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val got = run()
    assert(got(10L) == ((1.0, 0.0)), s"sink is the top authority, zero hub: ${got(10L)}")
    assert(got(20L) == ((0.4, 0.0)), s"got ${got(20L)}")
    assert(got(1L) == ((0.0, 1.0)), s"the double-pointer is the top hub: ${got(1L)}")
    assert(got(2L) == ((0.0, 0.714285714)) && got(3L) == got(2L), s"got ${got(2L)}")
    assert(run() == got, "must be deterministic run to run")
  }

  test("harmonicCentrality: hand values; disconnection ranks sanely where closeness inverts") {
    import spark.implicits._
    // 5-path 0-1-2-3-4 plus island pair 8-9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("s", "d")
    val got = graft.operators.Graph.harmonicCentrality(edges, "s", "d", maxHops = 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // node 2 (path center): 1/1+1/1+1/2+1/2 = 3; node 0: 1+1/2+1/3+1/4 = 2.083333
    // node 1: 1+1+1/2+1/3 = 2.833333; island nodes: exactly 1
    assert(got(2L) == ((4L, 3.0)), s"center ${got(2L)}")
    assert(got(0L) == ((4L, 2.083333)), s"end ${got(0L)}")
    assert(got(1L) == ((4L, 2.833333)), s"near-end ${got(1L)}")
    assert(got(8L) == ((1L, 1.0)) && got(9L) == ((1L, 1.0)))
    // the property harmonic exists for: closeness scores the island pair
    // (1/1 = 1.0) ABOVE the 5-path center ((5−1)/6 ≈ 0.67); harmonic
    // keeps the well-connected center on top
    assert(got(2L)._2 > got(8L)._2, "center must outrank the island under harmonic")
  }

  test("eccentricity from allPairsHops: path ends 3, center 2; island pair 1 each") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("s", "d")
    val got = graft.operators.Graph.allPairsHops(edges, "s", "d", maxHops = 6)
      .groupBy("src").agg(count(lit(1)).as("n"), max("hops").as("ecc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(0L) == ((4L, 3)) && got(3L) == ((4L, 3)), s"path ends: $got")
    assert(got(1L) == ((4L, 2)) && got(2L) == ((4L, 2)), s"inner: $got")
    assert(got(8L) == ((2L, 1)) && got(9L) == ((2L, 1)), s"island: $got")
  }

  test("triangleEstimateDoulion: estimate ≡ denom³ × sampled-graph exact; denom→1-like recovery on K6") {
    import spark.implicits._
    // K6: 20 triangles exactly; the deterministic coin keeps a fixed
    // edge subset, and the estimate must equal 8 × the triangles of that
    // EXACT sampled subgraph (replayed driver-side)
    val edges = (for { i <- 0L to 5L; j <- (i + 1) to 5L } yield (i, j)).toSeq
    val got = graft.operators.Graph.triangleEstimateDoulion(
        edges.toDF("s", "d"), "s", "d", denom = 2)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(got._1 == 15L && got._3 == 20L, s"K6 baseline: $got")
    val keptEdges = edges.filter { case (a, b) =>
      ((a * 1315423911L + b) % 1000000007L) % 2 == 0
    }.toSet
    assert(got._2 == keptEdges.size.toLong, s"coin replay: $got vs $keptEdges")
    val sampledTri = (for {
      x <- 0L to 5L; y <- (x + 1) to 5L; z <- (y + 1) to 5L
      if keptEdges((x, y)) && keptEdges((y, z)) && keptEdges((x, z))
    } yield 1).size.toLong
    assert(got._4 == sampledTri && got._5 == sampledTri * 8,
      s"estimate must be 8× the sampled subgraph's exact count: $got")
  }

  test("clusteringCoefficients: K4 all 1, K4+pendant hand values, degree-1 null") {
    import spark.implicits._
    // K4 on 0-3 plus pendant 9 hanging off node 0
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val got = graft.operators.Graph.clusteringCoefficients(
        (k4 :+ ((0L, 9L))).toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    // nodes 1-3: deg 3, 3 triangles, cc = 3/3 = 1
    (1L to 3L).foreach(i => assert(got(i) == ((i, 3L, 3L, Some(1.0))), s"$i: ${got(i)}"))
    // node 0: deg 4 (pendant), still 3 triangles → 3/6 = 0.5
    assert(got(0L) == ((0L, 4L, 3L, Some(0.5))), s"hub: ${got(0L)}")
    // pendant: degree 1 → undefined, not zero
    assert(got(9L) == ((9L, 1L, 0L, None)), s"pendant: ${got(9L)}")
  }

  test("assortativity: star exactly −1, path −0.5, regular ring undefined (null)") {
    import spark.implicits._
    def r(edges: Seq[(Long, Long)]): (Long, Long, Option[Double]) =
      graft.operators.Graph.assortativity(edges.toDF("s", "d"), "s", "d")
        .as[(Long, Long, Option[Double])].head()
    // K1,3 hub-and-spoke: perfect disassortativity
    assert(r(Seq((0L, 1L), (0L, 2L), (0L, 3L))) == ((4L, 6L, Some(-1.0))))
    // path of 4: hand closed form gives −0.5
    assert(r(Seq((0L, 1L), (1L, 2L), (2L, 3L))) == ((4L, 6L, Some(-0.5))))
    // 4-ring: every degree 2 — zero variance, coefficient undefined
    assert(r(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) == ((4L, 8L, None)))
  }

  test("kCore: chained peeling strips the tail; extra iterations are no-ops") {
    import spark.implicits._
    // K4 on 1-4, with a pendant chain 4-5-6: the 2-core must peel 6 THEN 5
    // (two sequential rounds), leaving exactly the K4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("s", "d")
    val core6 = graft.operators.Graph.kCore(edges, "s", "d", k = 2, iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core6 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core6")
    val core9 = graft.operators.Graph.kCore(edges, "s", "d", k = 2, iterations = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core9 == core6, "converged core must be iteration-count invariant")
    // k above the max degree empties the core
    assert(graft.operators.Graph.kCore(edges, "s", "d", k = 4, iterations = 6).count() == 0)
  }

  test("labelPropagation: two bridged cliques resolve to two min-label communities") {
    import spark.implicits._
    // K3 on 1-3, K3 on 7-9, one bridge 3-7. Hand-traced through 3
    // synchronous min-tie rounds: the left clique settles on label 1; the
    // right clique settles on label 3 (the bridge leaks 3 into node 7 in
    // round 1 and the min tie-breaks keep it) — two distinct communities
    // split exactly at the bridge.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L),
      (3L, 7L)).toDF("s", "d")
    val got = graft.operators.Graph.labelPropagation(edges, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 7L, 8L, 9L))
    assert(Set(1L, 2L, 3L).map(got) == Set(1L), s"left clique: $got")
    assert(Set(7L, 8L, 9L).map(got) == Set(3L), s"right clique: $got")
  }

  test("Association.pairRules: exact support/lift/confidence on a hand basket set") {
    import spark.implicits._
    val baskets = Seq(
      (10L, "x"), (10L, "y"), (10L, "z"), (10L, "x"), // dup item in basket collapses
      (20L, "x"), (20L, "y"),
      (30L, "x"))
      .toDF("bk", "it")
    val rules = graft.operators.Association.pairRules(baskets, "bk", "it", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // only (x, y) reaches support 2: lift = 2·3/(3·2) = 1, conf = 2/3
    assert(rules.keySet == Set(("x", "y")), s"got ${rules.keySet}")
    val (s, lift, conf) = rules(("x", "y"))
    assert(s == 2L && lift == 1.0 && math.abs(conf - 2.0 / 3.0) < 1e-12)
  }

  test("personalizedPageRank: all-nodes seed set IS global PageRank; seed-restricted mass stays on the seed's reachable set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // weighted digraph with a dangling node (4) and an isolated pair 5→6
    val edges = Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 1L), (1L, 3L, 1L),
      (3L, 4L, 1L), (5L, 6L, 1L)).toDF("src", "dst", "w")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Double)].collect().toMap
    val nodes = (0L to 6L)
    val global = ranks(Graph.pageRank(edges, "src", "dst", "w", iterations = 3))
    val allSeeds = ranks(Graph.personalizedPageRank(
      edges, "src", "dst", "w", seeds = nodes, iterations = 3))
    assert(allSeeds == global,
      s"S = V must reduce to global PageRank\nppr $allSeeds\npr $global")
    // seeding only node 5: mass can only reach {5, 6}; everything else 0
    val p5 = ranks(Graph.personalizedPageRank(
      edges, "src", "dst", "w", seeds = Seq(5L), iterations = 3))
    assert(nodes.filterNot(Set(5L, 6L)).forall(n => p5(n) == 0.0),
      s"unreachable nodes must score 0: $p5")
    assert(p5(5L) > 0.0 && p5(6L) > 0.0)
    // mass conservation within per-layer rounding
    assert(math.abs(p5.values.sum - 1.0) < 1e-6, s"mass leaked: ${p5.values.sum}")
  }

  private def lpRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.as[(Long, Long, Long, Double)].collect().toSet

  test("stronglyConnected: cycles group, direction matters, min-label ids and sizes") {
    // 3-cycle {1,2,3} → tail 4 → 2-cycle {5,6}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 5L))
      .toDF("src", "dst")
    val got = Graph.stronglyConnected(g, "src", "dst")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      4L -> ((4L, 1L)), 5L -> ((5L, 2L)), 6L -> ((5L, 2L)))
    assert(got == want, s"got $got")
    // a one-way path has no cycles: every node its own singleton SCC —
    // the undirected-components answer (one blob) would be wrong here
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val singletons = Graph.stronglyConnected(path, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(singletons == Set((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)), s"$singletons")
  }

  test("stronglyConnected: early exit fires after convergence without changing output; maxHops cap semantics unchanged") {
    // 2-cycle: reach settles at hop 1 (hop-2 frontier is empty), so the
    // r18 early-exit loop stops rounds before the hop cap — output must be
    // the same mutual pair the fixed-6-round loop produced
    val two = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val gotTwo = Graph.stronglyConnected(two, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotTwo == Set((1L, 1L, 2L), (2L, 1L, 2L)), s"$gotTwo")
    // 4-cycle at maxHops=2: the frontier grows through EVERY permitted
    // round (never empty), so the early exit must NOT fire and the cap
    // must still truncate reach — mutual pairs are exactly the
    // distance-2 diagonals, the documented maxHops approximation
    val four = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val gotFour = Graph.stronglyConnected(four, "src", "dst", maxHops = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotFour == Set((1L, 1L, 2L), (3L, 1L, 2L), (2L, 2L, 2L), (4L, 2L, 2L)),
      s"$gotFour")
  }

  test("stronglyConnected: delta layers dedup reconvergent paths (a node reachable at two hop depths appears once)") {
    // 1→2, 2→3, 1→3: from 1, node 3 is reached at hop 1 (direct) AND would
    // re-arrive at hop 2 via 2→3 — the r19 delta-layer anti-join must drop
    // the re-arrival so reach holds one row per (src, node); no cycles ⇒
    // all singleton SCCs. A duplicated reach row would double-count the
    // mutual join and corrupt scc_size.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.stronglyConnected(g, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)), s"$got")
  }

  test("linkPrediction: hand-computed overlap scores on a path-plus-spur graph") {
    // 1-2-3-4 path with spur 2-5; adjacency is undirected
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)).toDF("src", "dst")
    val got = lpRows(Graph.linkPrediction(edges, "src", "dst"))
    // degrees: 1→1, 2→3, 3→2, 4→1, 5→1; every non-adjacent pair shares
    // exactly one neighbor; jaccard = 1/(da+db−1)
    val want = Set(
      (1L, 3L, 1L, 0.5),       // via 2; 1/(1+2−1)
      (1L, 5L, 1L, 1.0),       // via 2; 1/(1+1−1)
      (3L, 5L, 1L, 0.5),       // via 2; 1/(2+1−1)
      (2L, 4L, 1L, 0.333333))  // via 3; 1/(3+1−1) rounded 6
    assert(got == want, s"got $got")
  }

  test("linkPrediction: hub wedge excision fires the wedgeGuard metric; denominators stay full-graph") {
    // star: hub 100 — {1..5}, plus true edge (1,2). hubCap=4 excises the
    // hub (deg 5) as a wedge CENTER; the surviving centers only generate
    // already-adjacent pairs, so the result is empty. (Degrees — the
    // Jaccard DENOMINATORS — stay full-graph; a surviving pair's
    // common-neighbor NUMERATOR counts cold centers only, per contract.)
    val edges = ((1 to 5).map(i => (100L, i.toLong)) :+ (1L, 2L)).toDF("src", "dst")
    val listener = graft.tools.CapMetricsListener.register(spark)
    try {
      val got = lpRows(Graph.linkPrediction(edges, "src", "dst", hubCap = 4))
      assert(got.isEmpty, s"hub-mediated pairs must be excised: $got")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!listener.snapshot.keys.exists(_.startsWith("graft.wedgeGuard")) &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = listener.snapshot.filter(_._1.startsWith("graft.wedgeGuard"))
      assert(m.get("graft.wedgeGuard:hot_nodes").contains(1L), s"$m")
      assert(m.get("graft.wedgeGuard:skipped_wedges").contains(10L), s"5*4/2: $m")
    } finally spark.listenerManager.unregister(listener)
    // with the cap above the hub degree the wedges come back: all 9
    // non-adjacent pairs of {1..5} share the hub ((1,2) is an edge)
    val open = lpRows(Graph.linkPrediction(edges, "src", "dst", hubCap = 10))
    assert(open.size == 9, s"got ${open.size}: $open")
    assert(open.contains((3L, 4L, 1L, 1.0)) && open.contains((1L, 3L, 1L, 0.5)), s"$open")
  }
}
