package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.operators.Checks._

/** Data-quality constraint engine: exact metrics on hand-built violations,
  * vacuous-truth edges, and the single-aggregate evaluation shape.
  */
class ChecksSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dirty = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(1L), Some(20.0), "b"),   // duplicate key
    (Some(2L), None, "a"),         // null value
    (Some(3L), Some(999.0), "zz"), // out of range + out of domain
    (None, Some(30.0), "b")        // null key
  ).toDF("k", "v", "cat")

  private lazy val ref = Seq(1L, 2L).toDF("rk")

  test("metrics are exact fractions and verdicts follow the thresholds") {
    val rep = Checks.run(dirty, Seq(
      Complete("k"),                       // 4/5 non-null
      Unique("k"),                         // 3 distinct / 4 values
      InRange("v", 0.0, 100.0),            // 3 of 4 non-null in range
      Satisfies("cat_domain", col("cat").isin("a", "b")), // 4/5
      SubsetOf("k", ref, "rk")))           // key 3 violates
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("complete:k") == ((0.8, false)))
    assert(rep("unique:k") == ((0.75, false)))
    assert(rep("range:v") == ((0.75, false)))
    assert(rep("satisfies:cat_domain") == ((0.8, false)))
    assert(rep("subset:k") == ((0.75, false)))
  }

  test("relaxed thresholds flip verdicts without changing metrics") {
    val rep = Checks.run(dirty, Seq(
      Complete("k", minRatio = 0.8),
      InRange("v", 0.0, 100.0, minRatio = 0.7),
      Satisfies("cat_domain", col("cat").isin("a", "b"), minRatio = 0.5)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("complete:k") == ((0.8, true)))
    assert(rep("range:v") == ((0.75, true)))
    assert(rep("satisfies:cat_domain") == ((0.8, true)))
  }

  test("clean data passes everything; empty slices are vacuously true") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val rep = Checks.run(clean, Seq(Complete("k"), Unique("k"), InRange("v", 0.0, 10.0)))
      .collect()
    assert(rep.forall(_.getBoolean(2)), rep.mkString(","))
    val empty = clean.filter(col("k") < 0)
    val rep2 = Checks.run(empty, Seq(Unique("k"), InRange("v", 0.0, 10.0)))
      .collect()
    assert(rep2.forall(r => r.getBoolean(2) && r.getDouble(1) == 1.0))
  }

  test("all row-level checks share ONE aggregate over one scan") {
    val df = Checks.run(Tables.orders(spark, sfDir), Seq(
      Complete("o_custkey"), Unique("o_orderkey"),
      InRange("o_totalprice", 0.0, 200000.0),
      Satisfies("sd", col("o_orderstatus").isin("O", "F", "P"))))
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"row-level checks must fuse into one scan, saw $scans")
  }

  test("q159: the declared report at sfDir — range check fails, the rest pass") {
    val rep = SparkEntry.queries("q159_quality_checks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep.size == 5)
    assert(!rep("range:o_totalprice"), "the tight range gate must FAIL (measured, not assumed)")
    assert(rep.filterNot(_._1 == "range:o_totalprice").values.forall(identity))
  }

  test("populationStability: identical snapshots are exactly zero; a shift is flagged; boundary values bin low") {
    import spark.implicits._
    val ref = (0 to 100).map(_.toDouble).toDF("v")
    val same = graft.operators.Checks.populationStability(ref, ref, "v", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // 0..100 with quartile cuts at 25/50/75 (exact data values): a value
    // ON a boundary bins LOW, so bin 0 holds 0..25 = 26 members
    assert(same.map(t => t._1 -> t._2).toMap == Map(0L -> 26L, 1L -> 25L, 2L -> 25L, 3L -> 25L),
      s"got ${same.toSeq}")
    assert(same.forall(t => t._2 == t._3 && t._4 == 0.0),
      s"self-PSI must be exactly zero per bin: ${same.toSeq}")
    // shifted population: most mass leaves the low bins → PSI over the
    // 0.25 'significant shift' reading
    val cur = (61 to 160).map(_.toDouble).toDF("v")
    val psi = graft.operators.Checks.populationStability(ref, cur, "v", bins = 4)
      .agg(org.apache.spark.sql.functions.sum("psi_term")).head().getDouble(0)
    assert(psi > 0.25, s"a 60-point shift must flag: $psi")
  }

  test("benford: hand digit census, sub-1 exclusion, power-of-ten boundaries, zero-digit χ² term") {
    import spark.implicits._
    // digits: 1.5→1, 19→1, 123→1, 2→2, 2.7→2; 0.5 excluded (< 1)
    val df = Seq(1.5, 19.0, 123.0, 2.0, 2.7, 0.5).toDF("v")
    val got = graft.operators.Checks.benford(df, "v")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == (1L to 9L).toSet, "one row per digit, always")
    assert(got(1L)._2 == 3L && got(2L)._2 == 2L &&
      (3L to 9L).forall(got(_)._2 == 0L), s"census: $got")
    // an unobserved digit's χ² term is exactly n·p (here n = 5)
    val p9 = math.log10(1.0 + 1.0 / 9)
    val exp9 = BigDecimal(5 * p9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(9L)._4 == exp9, s"zero-obs χ² term: ${got(9L)}")

    // the extraction path the operator exists to keep exact: powers of ten
    val pow = Seq(1.0, 10.0, 100.0, 1000.0, 1e6).toDF("v")
    val d1 = graft.operators.Checks.benford(pow, "v")
      .filter($"digit" === 1).as[(Long, Long, Double, Double)].head()
    assert(d1._2 == 5L, s"every power of ten has first digit 1: $d1")
  }

  test("mutualInformation: independent columns score exactly 0; identity scores ln 2 split") {
    import spark.implicits._
    val indep = (for { x <- Seq("a", "b"); y <- Seq("c", "d"); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val gotI = graft.operators.Checks.mutualInformation(indep, "x", "y")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(gotI.length == 4 && gotI.forall(_._6 == 0.0),
      s"uniform independent cells have zero MI terms: ${gotI.toSeq}")
    // x determines y: two cells, each (1/2)·ln((n/2·n)/(n/2·n/2)) = ln(2)/2
    val dep = (for { x <- Seq("a", "b"); _ <- 1 to 6 } yield (x, x)).toDF("x", "y")
    val gotD = graft.operators.Checks.mutualInformation(dep, "x", "y")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val half = BigDecimal(0.5 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gotD.length == 2 && gotD.forall(_._6 == half),
      s"identity columns: each cell carries ln(2)/2: ${gotD.toSeq}")
  }

  test("functionalDependency: holding FD, minimal-repair counts, null det/dep handling") {
    import spark.implicits._
    def fd(rows: Seq[(String, String)]) =
      graft.operators.Checks.functionalDependency(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long, Boolean)].head()
    // a→b holds: every determinant has one dependent
    assert(fd(Seq(("x", "1"), ("x", "1"), ("y", "2"))) == ((2L, 0L, 0L, 3L, true)))
    // x maps to {1×3, 2×1}: majority 3, one violating group, 1 repair row
    assert(fd(Seq(("x", "1"), ("x", "1"), ("x", "1"), ("x", "2"), ("y", "2")))
      == ((2L, 1L, 1L, 5L, false)))
    // null determinant is a group; null dependent is a value
    assert(fd(Seq((null, "1"), (null, "1"), ("x", null), ("x", null)))
      == ((2L, 0L, 0L, 4L, true)))
    assert(fd(Seq((null, "1"), (null, "2"))) == ((1L, 1L, 1L, 2L, false)))
    // empty input: vacuously holding, REAL booleans — never null
    assert(fd(Seq.empty) == ((0L, 0L, 0L, 0L, true)))
  }

  test("ksDrift: hand CDF gap; self-KS zero; disjoint samples hit 1 and flag") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double], parts: Int = 32) =
      graft.operators.Checks.ksDrift(a.toDF("v"), b.toDF("v"), "v", parts)
        .as[(Long, Long, Double, Double, Double, Boolean)].head()
    // a=[1,2,3] b=[2,3,4,4]: F_a=[1/3,2/3,1,1] F_b=[0,1/4,1/2,1] →
    // gaps [.333,.417,.5,0]; max .5 at value 3; crit=1.358·√(7/12)=1.03719
    val h = ks(Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0, 4.0, 4.0))
    assert(h == ((3L, 4L, 0.5, 3.0, 1.03719, false)), s"got $h")
    val self = ks(Seq(1.0, 2.0, 2.0, 5.0), Seq(1.0, 2.0, 2.0, 5.0))
    assert(self._3 == 0.0 && !self._6, s"self-KS must be zero: $self")
    val disj = ks((1 to 50).map(_.toDouble), (101 to 150).map(_.toDouble))
    assert(disj._3 == 1.0 && disj._6, s"disjoint samples: $disj")
    // nulls are outside the distribution: totals and CDFs unchanged
    val withNull = graft.operators.Checks.ksDrift(
      Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v"),
      Seq(Some(2.0), Some(3.0), Some(4.0), Some(4.0), None).toDF("v"), "v")
      .as[(Long, Long, Double, Double, Double, Boolean)].head()
    assert(withNull == ((3L, 4L, 0.5, 3.0, 1.03719, false)),
      s"null rows must not shift the CDFs: $withNull")
  }

  test("ksDriftByGroup: per-group ≡ global on each slice; one-sided groups null out") {
    import spark.implicits._
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 5.0), ("g2", 6.0),
      ("only_a", 9.0)).toDF("g", "v")
    val b = Seq(("g1", 2.0), ("g1", 3.0), ("g1", 4.0), ("g1", 4.0), ("g2", 5.0),
      ("only_b", 1.0)).toDF("g", "v")
    val got = graft.operators.Checks.ksDriftByGroup(a, b, "g", "v")
      .as[(String, Long, Long, Option[Double], Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    // g1 is the ChecksSpec hand case: KS 0.5 at 3, crit 1.03719
    assert(got("g1") == (("g1", 3L, 4L, Some(0.5), Some(3.0), Some(1.03719), Some(false))),
      s"g1 must equal the global hand case on its slice: ${got("g1")}")
    // g2 per-slice vs the global ksDrift on the same slice
    val global = graft.operators.Checks.ksDrift(
        a.filter($"g" === "g2").select("v"), b.filter($"g" === "g2").select("v"), "v")
      .as[(Long, Long, Double, Double, Double, Boolean)].head()
    assert(got("g2") == (("g2", global._1, global._2, Some(global._3),
      Some(global._4), Some(global._5), Some(global._6))),
      s"per-group must equal global-on-slice: ${got("g2")} vs $global")
    assert(got("only_a")._4.isEmpty && got("only_a")._7.isEmpty &&
      got("only_b")._4.isEmpty, "one-sided groups carry null scores/verdicts")

    // a null group key is a REAL slice: present on both sides, it gets
    // one row with a computed KS, not two phantom one-sided halves
    val an = Seq((null.asInstanceOf[String], 1.0), (null.asInstanceOf[String], 2.0),
      ("g1", 5.0)).toDF("g", "v")
    val bn = Seq((null.asInstanceOf[String], 2.0), (null.asInstanceOf[String], 3.0),
      ("g1", 5.0)).toDF("g", "v")
    val rows = graft.operators.Checks.ksDriftByGroup(an, bn, "g", "v")
      .as[(Option[String], Long, Long, Option[Double], Option[Double], Option[Double], Option[Boolean])]
      .collect().filter(_._1.isEmpty)
    assert(rows.length == 1 && rows.head._2 == 2L && rows.head._3 == 2L &&
      rows.head._4.contains(0.5),
      s"the null slice must surface once with its CDF gap: ${rows.toSeq}")
  }

  test("ksDrift: invariant to the range-partition count (distributed scan ≡ one partition)") {
    import spark.implicits._
    val a = (1 to 500).map(i => (i * 7 % 97).toDouble)
    val b = (1 to 400).map(i => (i * 11 % 89).toDouble + 3.0)
    val runs = Seq(1, 2, 32).map { p =>
      graft.operators.Checks.ksDrift(a.toDF("v"), b.toDF("v"), "v", p)
        .as[(Long, Long, Double, Double, Double, Boolean)].head()
    }
    assert(runs.distinct.size == 1,
      s"offset reconstruction must make the partition count invisible: $runs")
  }

  test("uncertaintyCoefficient: determinism 1, independence 0, constant-y null") {
    import spark.implicits._
    def u(rows: Seq[(String, String)]): (Long, Long, Double, Double, Option[Double]) =
      graft.operators.Checks.uncertaintyCoefficient(
        rows.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Double, Double, Option[Double])].head()
    // x determines y exactly → U = 1 (quantized MI and H(y) coincide cell
    // for cell, so the ratio is EXACTLY 1.0, not 0.999…)
    val det = u(Seq(("s1", "en"), ("s1", "en"), ("s2", "de"), ("s2", "de")))
    assert(det._5.contains(1.0) && det._2 == 2L, s"got $det")
    // independent uniform 2×2 → every MI cell is ln 1 = 0 → U = 0
    val ind = u(Seq(("s1", "en"), ("s1", "de"), ("s2", "en"), ("s2", "de")))
    assert(ind._3 == 0.0 && ind._5.contains(0.0), s"got $ind")
    // constant y: H(y) = 0 → U undefined (null), never 0/0
    val const = u(Seq(("s1", "en"), ("s2", "en")))
    assert(const._4 == 0.0 && const._5.isEmpty, s"got $const")
  }

  test("chiSquareHomogeneity: perfect separation, exact-proportion zero, dof-0 null verdict") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) =
      graft.operators.Checks.chiSquareHomogeneity(rows.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Long, Long, Double, Option[Double], Option[Boolean])].head()
    // perfectly separated 2×2 with 50/50 margins: χ² = n = 100, dof 1
    val sep = Seq.fill(50)(("s1", "en")) ++ Seq.fill(50)(("s2", "de"))
    val a = run(sep)
    assert(a == ((100L, 2L, 2L, 1L, 100.0, Some(3.841), Some(false))), s"got $a")
    // identical mixes: every o equals its e exactly → χ² = 0, homogeneous
    val mix = Seq.fill(30)(("s1", "en")) ++ Seq.fill(10)(("s1", "de")) ++
      Seq.fill(60)(("s2", "en")) ++ Seq.fill(20)(("s2", "de"))
    val b = run(mix)
    assert(b == ((120L, 2L, 2L, 1L, 0.0, Some(3.841), Some(true))), s"got $b")
    // one source: dof 0 — nothing to test, verdict null not vacuous-true
    val c = run(Seq.fill(10)(("s1", "en")) ++ Seq.fill(5)(("s1", "de")))
    assert((c._4, c._5, c._7) == ((0L, 0.0, None)), s"got $c")
  }

  test("proportionTest: hand pooled z, symmetric sign flip, zero-variance pools null") {
    import spark.implicits._
    def run(a: Seq[Boolean], b: Seq[Boolean]) =
      graft.operators.Checks.proportionTest(
        a.toDF("ok"), b.toDF("ok"), "ok")
        .as[(Long, Long, Long, Long, Double, Double, Option[Double], Boolean)].head()
    val a = Seq.fill(8)(true) ++ Seq.fill(2)(false)
    val b = Seq.fill(2)(true) ++ Seq.fill(8)(false)
    val r = run(a, b)
    // p̂ = 0.5 pooled: z = 0.6/√(0.25·0.2) = 2.683282, significant
    assert((r._1, r._2, r._3, r._4, r._5, r._6) == ((10L, 8L, 10L, 2L, 0.8, 0.2)))
    assert(math.abs(r._7.get - 2.683282) < 1e-6 && r._8, s"got $r")
    // swapping sides flips the sign, same magnitude and verdict
    val s = run(b, a)
    assert(math.abs(s._7.get + r._7.get) < 1e-9 && s._8, s"got $s")
    // all-failure and all-success pools have zero variance → null, false
    assert(run(Seq(false, false), Seq(false))._7.isEmpty)
    assert(!run(Seq(true, true), Seq(true))._8)
  }

  test("calibrationTable: hand bins, top-edge clamp, out-of-range rows excluded") {
    import spark.implicits._
    val rows = Seq((0.05, false), (0.15, true), (0.95, true), (1.0, true),
      (0.95, false), (1.5, true)) // 1.5 is not a probability — no bin
      .toDF("pred", "label")
    val got = graft.operators.Checks.calibrationTable(rows, "pred", "label")
      .as[(Long, Long, Double, Double, Double)].collect().toList
    val want = List(
      (0L, 1L, 0.05, 0.0, 0.0025),
      (1L, 1L, 0.15, 1.0, 0.7225),
      (9L, 3L, 0.966667, 0.666667, 0.301667)) // p=1.0 clamps into bin 9
    assert(got == want, s"got $got")
  }

  test("exactPercentiles: rank rule by hand, ties, single-value keys") {
    import spark.implicits._
    val rows = ((1L to 10L).map(("a", _)) ++ Seq.fill(3)(("b", 7L)) ++
      Seq(("c", 1L), ("c", 1L), ("c", 1L), ("c", 9L))).toDF("k", "v")
    val got = graft.operators.Checks.exactPercentiles(rows, "k", "v")
      .as[(String, Long, Long, Long, Long)].collect().toList
    // a: ranks ⌈5⌉/⌈9⌉/⌈9.9⌉ → 5, 9, 10; b: all 7; c: p50 hits the tie
    // block (rank 2 → 1), p90 rank ⌈3.6⌉ = 4 → 9
    val want = List(("a", 10L, 5L, 9L, 10L), ("b", 3L, 7L, 7L, 7L),
      ("c", 4L, 1L, 9L, 9L))
    assert(got == want, s"got $got")
  }

  test("hillTailIndex: hand log-excess, tie-crossing cut, degenerate tail null, under-m+1 empty") {
    import spark.implicits._
    def hill(vs: Seq[Long], m: Int) =
      graft.operators.Checks.hillTailIndex(
        vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id"),
        "v", "id", m)
        .as[(Int, Long, Option[Double], Option[Double])].collect().toList
    // top3 of {100, 100, 10, 3}: threshold 10, mean excess = ln 10
    val h = hill(Seq(100L, 100L, 10L, 3L), 2)
    assert(h.size == 1 && h.head._1 == 2 && h.head._2 == 10L)
    assert(math.abs(h.head._3.get - math.log(10.0)) < 1e-6, s"got $h")
    assert(math.abs(h.head._4.get - 1.0 / math.log(10.0)) < 1e-6, s"got $h")
    // all-equal tail: zero excess, α undefined (null, not ∞)
    assert(hill(Seq(7L, 7L, 7L), 2) == List((2, 7L, Some(0.0), None)))
    // not enough positive values for a threshold → no row
    assert(hill(Seq(5L, 4L), 2).isEmpty)
    assert(hill(Seq(5L, 4L, 0L), 2).isEmpty, "zeros are outside the tail domain")
  }

  test("giniConcentration: equality 0, max concentration (n−1)/n, hand values, tie grouping, partition invariance") {
    import spark.implicits._
    def gini(vs: Seq[Long], parts: Int = 32): (Long, Long, Option[Double]) =
      graft.operators.Checks.giniConcentration(vs.toDF("v"), "v", parts)
        .as[(Long, Long, Option[Double])].head()
    assert(gini(Seq(5L, 5L, 5L, 5L)) == ((4L, 20L, Some(0.0))))
    // one doc holds everything: G = (n−1)/n
    assert(gini(Seq(0L, 0L, 0L, 12L)) == ((4L, 12L, Some(0.75))))
    // 1,2,3,4 by hand: (2·30 − 5·10)/(4·10) = 0.25
    assert(gini(Seq(1L, 2L, 3L, 4L)) == ((4L, 10L, Some(0.25))))
    // ties share the grouped prefix: 1,1,4 → (2·15 − 4·6)/(3·6) = 1/3
    assert(gini(Seq(1L, 1L, 4L)) == ((3L, 6L, Some(0.333333))))
    // all-zero total → null, not 0/0
    assert(gini(Seq(0L, 0L)) == ((2L, 0L, None)))
    // the distributed prefix must not see the partitioner
    val vs = (1L to 500L) ++ Seq.fill(100)(7L)
    val runs = Seq(1, 2, 32).map(p => gini(vs, p))
    assert(runs.distinct.size == 1, s"partition count leaked: $runs")
  }
}
