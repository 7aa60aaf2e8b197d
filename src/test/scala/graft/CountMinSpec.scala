package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Pins [[graft.operators.CountMin]]: the overestimate guarantee on EVERY
  * key (not just the audited top-k), exact recovery when a key collides
  * nowhere, sketch mergeability by plain sum (the partials algebra), and
  * the foreign-key floor.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val W = 8 // tiny width forces real collisions

  private def countsOf(pairs: (String, Long)*) =
    pairs.toSeq.toDF("k", "n")

  test("estimate >= exact for every key under forced collisions; min over rows is tight somewhere") {
    val counts = countsOf(
      ("alpha", 5L), ("beta", 3L), ("gamma", 7L), ("delta", 2L),
      ("epsilon", 11L), ("zeta", 1L), ("eta", 4L), ("theta", 6L))
    val cms = CountMin.sketch(counts, "k", "n", W)
    val est = CountMin.estimate(cms, counts, "k", W)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 8)
    est.foreach { case (k, exact, e) =>
      assert(e >= exact, s"CMS must never undercount: $k est $e < exact $exact")
    }
    // total counter mass per row equals the stream total (nothing dropped)
    val rowMass = cms.groupBy("r").agg(sum("n").as("m"))
      .collect().map(_.getLong(1)).toSeq
    assert(rowMass == Seq.fill(4)(39L), s"per-row mass must be Σcounts: $rowMass")
  }

  test("merge by sum: sketch(A) ⊎ sketch(B) ≡ sketch(A ∪ B)") {
    val a = countsOf(("alpha", 5L), ("beta", 3L), ("gamma", 7L))
    val b = countsOf(("beta", 2L), ("delta", 4L))
    val merged = CountMin.sketch(a, "k", "n", W)
      .unionByName(CountMin.sketch(b, "k", "n", W))
      .groupBy("r", "col").agg(sum("n").as("n"))
    val whole = CountMin.sketch(
      a.unionByName(b).groupBy("k").agg(sum("n").as("n")), "k", "n", W)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == w, s"merged $m\nwhole $w")
  }

  test("a key absent from the build stream estimates >= 0 (floor, never negative)") {
    val cms = CountMin.sketch(countsOf(("alpha", 5L)), "k", "n", W)
    val est = CountMin.estimate(cms, Seq(("nosuch", 0L)).toDF("k", "n"), "k", W)
      .collect().map(r => r.getLong(2))
    assert(est.length == 1 && est.head >= 0L)
  }

  test("joinSizeEstimate: collision-free sketches give the exact inner product; collisions only overestimate") {
    def jse(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
            w: Int): Long = {
      CountMin.joinSizeEstimate(
        CountMin.sketch(a, "k", "n", w), CountMin.sketch(b, "k", "n", w))
        .collect().head.getDecimal(0).longValueExact()
    }
    // Σ_k cntA·cntB over the shared keys: 2·5 (alpha) + 3·7 (beta) = 31;
    // gamma/delta are one-sided and contribute nothing
    val a = countsOf(("alpha", 2L), ("beta", 3L), ("gamma", 11L))
    val b = countsOf(("alpha", 5L), ("beta", 7L), ("delta", 13L))
    assert(jse(a, b, 65536) == 31L)
    // self-join size = Σ cnt² = 4 + 9 + 121 = 134
    assert(jse(a, a, 65536) == 134L)
    // width 1 collapses every key into one counter: the estimate is the
    // full cross term ‖a‖₁·‖b‖₁ — the documented overestimate extreme
    assert(jse(a, b, 1) == 16L * 25L)
    // fully disjoint key sets: every row's inner product is 0 and the
    // depth-min must SEE those empty rows — 0, never null or inflated
    val c = countsOf(("zeta", 4L), ("eta", 6L))
    assert(jse(a, c, 65536) == 0L)
  }
}
