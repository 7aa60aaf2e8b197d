package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins [[graft.operators.Similarity.dbscan]] against an INDEPENDENT naive
  * DBSCAN (exact pairwise cosines + union-find, computed driver-side in
  * this spec) on a one-bucket planted fixture — on one bucket the blocked
  * form IS global DBSCAN, so the equality is exact. The fixture interpolates
  * between LofSpec's search-engineered in-bucket base/outlier pair: the LSH
  * bucket region is an intersection of half-spaces (convex), so every convex
  * combination of two same-bucket points provably shares their bucket.
  * Geometry (numerically verified offline, rounded-cosine margins ≥ 1e-4):
  * two 3-point dense clusters at t ∈ {0,.03,.06} and {.50,.53,.56}, a
  * border at t=.12 (one core neighbor), a mutually-close non-core pair at
  * t ∈ {.30,.33} (noise WITH neighbors), an isolated point at t=.205.
  */
class DbscanSpec extends SparkSuite {
  import spark.implicits._

  private val MinSim = 0.9995
  private val MinPts = 2

  private val base = Array(3.0, -1.0, 1.0, 2.0, 2.0, 3.0, 2.0, 2.0, 1.0, 2.0, -1.0, 2.0, -2.0, -1.0, 3.0, 2.0, 1.0, 2.0, 1.0, -2.0, 3.0, -2.0, 3.0, 2.0, -1.0, -2.0, 3.0, -1.0, -2.0, -2.0, 2.0, -1.0, 2.0, 3.0, -1.0, 1.0, 1.0, 2.0, -1.0, 2.0, 2.0, 1.0, -2.0, 3.0, 2.0, 2.0, -1.0, -1.0, -2.0, 1.0, 2.0, -1.0, -1.0, 1.0, -2.0, 3.0, 3.0, 2.0, 1.0, 2.0, -1.0, -2.0, -2.0, 2.0)
  private val outl = Array(2.863, -1.624, 2.113, 1.289, 0.998, 1.925, 2.119, 2.469, 1.924, 2.722, -1.468, 1.098, -2.347, -0.304, 4.349, 0.881, 1.636, 1.75, -0.487, -2.006, 4.125, -2.59, 3.817, 1.585, -1.017, -1.695, 3.866, 0.022, -2.64, -2.724, 0.501, -0.145, 1.087, 2.668, -2.138, 2.333, 1.873, 3.422, -1.681, 3.45, 2.478, 0.884, -2.864, 3.905, 2.426, 2.778, -1.223, 0.203, -2.732, 0.058, 0.97, -1.205, 0.053, -0.02, -2.364, 2.905, 3.107, 1.568, 2.423, 1.914, -1.719, -1.084, -1.827, 2.612)

  private def interp(t: Double): Array[Float] =
    base.indices.map(i => ((1 - t) * base(i) + t * outl(i)).toFloat).toArray

  // (vec_id, t): clusters A {10,11,12} / B {20,21,22}, border 13,
  // noise pair {30,31}, isolated 32
  private val points: Seq[(Long, Double)] = Seq(
    10L -> 0.00, 11L -> 0.03, 12L -> 0.06, 13L -> 0.12,
    32L -> 0.205, 30L -> 0.30, 31L -> 0.33,
    20L -> 0.50, 21L -> 0.53, 22L -> 0.56)

  private def fixture =
    points.map { case (id, t) => (id, 0, interp(t)) }
      .toDF("vec_id", "label", "embedding")

  /** Sequential cosine on the float32-cast vectors (the operator's own
    * IEEE order) rounded HALF_UP to 4 — the pair predicate replicated.
    */
  private def roundedCos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Naive DBSCAN: exact pair set, degree gate, union-find components over
    * core–core edges, border = min cluster among core neighbors.
    */
  private def naive(): Map[Long, (String, Option[Long], Long)] = {
    val vecs = points.map { case (id, t) => id -> interp(t) }.toMap
    val ids = points.map(_._1)
    val nbrs: Map[Long, Seq[Long]] = ids.map { a =>
      a -> ids.filter(b => b != a && roundedCos(vecs(a), vecs(b)) >= MinSim)
    }.toMap
    val core = ids.filter(a => nbrs(a).size >= MinPts).toSet
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map { a =>
      val deg = nbrs(a).size.toLong
      if (core(a)) a -> (("core", Some(find(a)), deg))
      else {
        val coreNbrs = nbrs(a).filter(core)
        if (coreNbrs.nonEmpty) a -> (("border", Some(coreNbrs.map(find).min), deg))
        else a -> (("noise", None, deg))
      }
    }.toMap
  }

  private def run() =
    Similarity.dbscan(fixture, numPlanes = 8, dim = 64,
        minSim = MinSim, minPts = MinPts)
      .select(col("vec_id"), col("role"), col("cluster"), col("n_eps"))
      .as[(Long, String, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("blocked dbscan on a one-bucket fixture equals naive DBSCAN; roles planted") {
    val buckets = Similarity.lshBucketsDeterministic(fixture, 8, 64)
      .select("lsh_bucket").distinct().count()
    assert(buckets == 1L, s"fixture must land in ONE bucket, got $buckets")

    val got = run()
    assert(got == naive(), s"blocked must equal naive DBSCAN: $got vs ${naive()}")

    // the planted structure itself: two clusters, all three roles, the
    // noise-with-neighbors case distinguished from isolated noise
    assert(got.filter(_._2._1 == "core").keySet == Set(10L, 11L, 12L, 20L, 21L, 22L))
    assert(got(13L) == (("border", Some(10L), 1L)), s"border attaches to cluster A: ${got(13L)}")
    assert(got(30L) == (("noise", None, 1L)) && got(31L) == (("noise", None, 1L)),
      "mutually-close non-core pair is noise WITH a neighbor")
    assert(got(32L) == (("noise", None, 0L)), "isolated point is zero-degree noise")
    assert(got.collect { case (_, ("core", Some(c), _)) => c }.toSet == Set(10L, 20L),
      "two components labeled by their min member")

    assert(run() == got, "must be deterministic run to run")
  }

  test("over-cap buckets drop from the universe (not noise)") {
    val out = Similarity.dbscan(fixture, numPlanes = 8, dim = 64,
      minSim = MinSim, minPts = MinPts, maxBucketSize = 1)
    assert(out.count() == 0L,
      "cap=1 drops the whole one-bucket fixture from the population")
  }
}
