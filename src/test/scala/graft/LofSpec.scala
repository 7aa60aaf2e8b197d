package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins [[graft.operators.Similarity.lofScores]]: a planted angular
  * outlier inside a tight same-bucket cluster scores LOF ≫ 1 while the
  * cluster members stay ≈ 1, neighborhoods have the declared size, and
  * the chain is deterministic across runs. (The numeric chain itself —
  * reach/lrd/LOF arithmetic — is oracle-checked end-to-end by q194.)
  */
class LofSpec extends SparkSuite {
  import spark.implicits._

  // search-found offline against the FIXED q103 hyperplanes: base has
  // plane-dot margin 61, so the ±0.5 cluster wobbles (max plane shift 3)
  // provably stay in its bucket; the outlier shares the bucket but sits
  // at cosine 0.928 to the cluster (d ≈ 0.07 vs intra-cluster ≈ 0.001)
  private val LofBase = Array(3.0f, -1.0f, 1.0f, 2.0f, 2.0f, 3.0f, 2.0f, 2.0f, 1.0f, 2.0f, -1.0f, 2.0f, -2.0f, -1.0f, 3.0f, 2.0f, 1.0f, 2.0f, 1.0f, -2.0f, 3.0f, -2.0f, 3.0f, 2.0f, -1.0f, -2.0f, 3.0f, -1.0f, -2.0f, -2.0f, 2.0f, -1.0f, 2.0f, 3.0f, -1.0f, 1.0f, 1.0f, 2.0f, -1.0f, 2.0f, 2.0f, 1.0f, -2.0f, 3.0f, 2.0f, 2.0f, -1.0f, -1.0f, -2.0f, 1.0f, 2.0f, -1.0f, -1.0f, 1.0f, -2.0f, 3.0f, 3.0f, 2.0f, 1.0f, 2.0f, -1.0f, -2.0f, -2.0f, 2.0f)
  private val LofOutlier = Array(2.863f, -1.624f, 2.113f, 1.289f, 0.998f, 1.925f, 2.119f, 2.469f, 1.924f, 2.722f, -1.468f, 1.098f, -2.347f, -0.304f, 4.349f, 0.881f, 1.636f, 1.75f, -0.487f, -2.006f, 4.125f, -2.59f, 3.817f, 1.585f, -1.017f, -1.695f, 3.866f, 0.022f, -2.64f, -2.724f, 0.501f, -0.145f, 1.087f, 2.668f, -2.138f, 2.333f, 1.873f, 3.422f, -1.681f, 3.45f, 2.478f, 0.884f, -2.864f, 3.905f, 2.426f, 2.778f, -1.223f, 0.203f, -2.732f, 0.058f, 0.97f, -1.205f, 0.053f, -0.02f, -2.364f, 2.905f, 3.107f, 1.568f, 2.423f, 1.914f, -1.719f, -1.084f, -1.827f, 2.612f)

  private def fixture = {
    val cluster = (0 until 6).map { i =>
      (i.toLong, 0, LofBase.zipWithIndex.map { case (x, j) =>
        if (j == i) x + 0.5f else x
      })
    }
    (cluster :+ ((99L, 0, LofOutlier)))
      .toDF("vec_id", "label", "embedding")
  }

  test("planted angular outlier scores LOF >> 1; cluster members ~ 1; deterministic") {
    // precondition: the engineered fixture must share one LSH bucket —
    // fails loudly if the plane constants or the fixture ever drift
    val buckets = Similarity.lshBucketsDeterministic(fixture, 8, 64)
      .select("lsh_bucket").distinct().count()
    assert(buckets == 1L, s"fixture must land in ONE bucket, got $buckets")

    def run() = Similarity.lofScores(fixture, numPlanes = 8, dim = 64, k = 3)
      .select(col("anchor"), col("n_nn"), col("__lof_raw"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val m = run()
    assert(m.size == 7 && m.values.forall(_._2 == 3L),
      s"all 7 points score over full k=3 neighborhoods: $m")
    assert(m(99L)._3 > 5.0, s"outlier must stand out: ${m(99L)}")
    val clusterMax = (0L until 6L).map(m(_)._3).max
    assert(clusterMax < 1.5, s"cluster members must stay near 1: $m")
    assert(run() == m, "chain must be deterministic run to run")
  }
}
