package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmv

/** KMV distinct sketch pinned against a driver-side mirror of the exact
  * hash + order-statistic definition, plus the estimator's contract
  * cases (exact under k, union invariance, error inside the 1/√k band).
  */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  private val P = graft.functions.StringKernels.PolyHashMod

  private def mirrorHash(s: String): Long =
    (graft.functions.StringKernels.polyHash(UTF8String.fromString(s)) *
      961748927L + 12345L) % P

  private def run(keys: Seq[Long], k: Int) =
    Kmv.kmvDistinct(keys.toDF("key"), "key", k)
      .as[(Long, Long, Long, Long, Long, Double)].head()

  test("under k distinct hashes the sketch IS the exact count") {
    val (nKept, _, nHashes, est, exact, err) = run(Seq(1L, 2L, 3L, 2L, 1L), 256)
    assert((nKept, nHashes, est, exact, err) == ((3L, 3L, 3L, 3L, 0.0)))
  }

  test("sketch mode matches the driver mirror of the k-th order statistic exactly") {
    val keys = (1L to 5000L)
    val hs = keys.map(x => mirrorHash(x.toString)).distinct.sorted
    val k = 64
    val wantKth = hs(k - 1)
    val wantEst = (k - 1).toLong * P / wantKth
    val (nKept, kth, nHashes, est, exact, err) = run(keys, k)
    assert(nKept == k && kth == wantKth && nHashes == hs.size, s"$kth vs $wantKth")
    assert(est == wantEst, s"est $est vs $wantEst")
    assert(exact == 5000L)
    // inside a loose multiple of the 1/√k relative-error band
    assert(err < 3.0 / math.sqrt(k), s"rel_error $err")
  }

  test("duplicating the input leaves the sketch untouched (union invariance)") {
    val keys = (1L to 2000L)
    val once = run(keys, 32)
    val twice = run(keys ++ keys, 32)
    assert(once == twice, s"$once vs $twice")
  }
}
