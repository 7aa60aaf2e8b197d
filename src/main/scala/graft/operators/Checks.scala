package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated against a table in as
  * few passes as the constraint mix allows — the validation gate a 100 TB
  * ingest runs before data is admitted downstream.
  *
  * The reference validates per document inside the NLP loop (shape guards
  * in `ingester/nlp_service.py`, null/short-text skips) and has no
  * table-level contract at all; a corpus pipeline needs the set-level
  * form: completeness, uniqueness, ranges, referential integrity, each as
  * a measured METRIC (fraction satisfied) with a pass/fail verdict, not a
  * per-row exception.
  *
  * Evaluation shape:
  *  - every ROW-level check (completeness, range, predicate) compiles to
  *    one `sum(when(...))` term in a single aggregate — one scan total no
  *    matter how many checks ride on it;
  *  - uniqueness adds its `count_distinct` to the SAME aggregate (one
  *    extra shuffle from the distinct expand, still the one scan);
  *  - referential integrity is a left-anti probe of the (deduplicated)
  *    reference keys — broadcastable whenever the reference dimension is.
  *
  * The report is one tiny DataFrame `(check_name, metric, passed)` — ordered,
  * deterministic, oracle-checkable.
  */
object Checks {

  sealed trait Check { def name: String }
  /** Fraction of rows with a non-null value ≥ `minRatio`. */
  final case class Complete(col: String, minRatio: Double = 1.0) extends Check {
    def name = s"complete:$col"
  }
  /** Distinct NON-NULL values = non-null rows — null rows are outside the
    * gate (pair with [[Complete]] to also forbid nulls on a key column).
    */
  final case class Unique(col: String) extends Check { def name = s"unique:$col" }
  /** Fraction of non-null values inside [lo, hi] ≥ `minRatio`. */
  final case class InRange(col: String, lo: Double, hi: Double, minRatio: Double = 1.0)
      extends Check {
    def name = s"range:$col"
  }
  /** Fraction of rows satisfying an arbitrary boolean column ≥ `minRatio`. */
  final case class Satisfies(label: String, predicate: Column, minRatio: Double = 1.0)
      extends Check {
    def name = s"satisfies:$label"
  }
  /** Every non-null value of `col` appears in `ref(refCol)`. */
  final case class SubsetOf(col: String, ref: DataFrame, refCol: String) extends Check {
    def name = s"subset:$col"
  }

  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run needs at least one declared check")
    // try_divide: an empty table / all-null column divides by zero, which
    // under ANSI mode (Spark 4 default) would throw — null here means
    // "nothing to check" and coalesces to a vacuous pass below
    val rowChecks = checks.collect {
      case c: Complete  => c.name ->
        (try_divide(count(col(c.col)).cast("double"), count(lit(1))), c.minRatio)
      case c: InRange   =>
        c.name -> (try_divide(sum(when(col(c.col).isNull, 0L)
          .when(col(c.col) >= c.lo && col(c.col) <= c.hi, 1L).otherwise(0L))
          .cast("double"), count(col(c.col))), c.minRatio)
      case c: Satisfies => c.name -> (try_divide(sum(when(c.predicate, 1L).otherwise(0L))
          .cast("double"), count(lit(1))), c.minRatio)
      case c: Unique    => c.name -> (try_divide(countDistinct(col(c.col)).cast("double"),
          count(col(c.col))), 1.0)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val aggReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val aggs = rowChecks.zipWithIndex.map { case ((_, (m, _)), i) => m.as(s"c$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowChecks.zipWithIndex.map { case ((n, (_, thr)), i) =>
          // an empty/all-null slice yields a 0/0 null metric — vacuously true
          val m = coalesce(col(s"c$i"), lit(1.0))
          struct(lit(n).as("check_name"), round(m, 6).as("metric"),
            (m >= thr - 1e-9).as("passed"))
        }
        Some(one.select(explode(array(rows: _*)).as("r")).select("r.*"))
      }
    val refReports = checks.collect { case c: SubsetOf =>
      val viol = df.select(col(c.col)).filter(col(c.col).isNotNull)
        .join(c.ref.select(col(c.refCol).as(c.col)).distinct(), Seq(c.col), "left_anti")
        .count()
      val total = df.filter(col(c.col).isNotNull).count()
      val metric = if (total == 0) 1.0 else (total - viol).toDouble / total
      Seq((c.name, BigDecimal(metric).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, viol == 0L)).toDF("check_name", "metric", "passed")
    }
    (aggReport.toSeq ++ refReports)
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  /** The reference snapshot's `bins − 1` equal-population boundaries:
    * exact continuous quantiles, 6-decimal-rounded under the shared
    * DuckDB-round replica — absorbs any 1-ulp interpolation-association
    * difference between the two engines' exact-percentile kernels. Public
    * so the streaming monitor ([[graft.streaming.StreamingPsi]]) bins
    * against the SAME boundaries the batch gate used.
    */
  def referenceBins(ref: DataFrame, valueCol: String, bins: Int): Seq[Double] = {
    val ps = (1 until bins).map(i => i.toDouble / bins)
    ref
      .agg(expr(s"percentile(cast($valueCol as double), array(${ps.map(p => s"${p}D").mkString(", ")}))"))
      .head().getSeq[Double](0).map(Similarity.duckRound6)
  }

  /** Population Stability Index of a numeric column between a REFERENCE
    * snapshot and a CURRENT one — the classic release-gate drift stat
    * completing the monitor family (tokens → [[Corpus.tokenDistributionDrift]],
    * embeddings → [[Similarity.embeddingDrift]], numeric columns → here):
    *
    *   PSI = Σ_b (p'_b − q'_b) · ln(p'_b / q'_b),
    *   p' = ref_frac + ε, q' = cur_frac + ε
    *
    * over `bins` equal-population bins cut at the REFERENCE's exact
    * continuous quantiles (computed once, entering both plans as driver
    * double literals — the centroid/codebook convention, so the oracle
    * interpolates identical boundaries). The ε-smoothing (declared, part
    * of the definition) keeps bins the current snapshot vacated finite —
    * an empty bin is precisely the drift signal PSI exists to flag, and
    * the standard reading (< 0.1 stable, > 0.25 shifted) assumes the
    * smoothed form. A value exactly ON a boundary bins LOW (strict `>`
    * against each boundary) in both engines.
    *
    * Emits ONE ROW PER BIN (`psi_term` sums to the index — a rollup the
    * caller can do; per-bin terms localize WHERE the mass moved, which
    * the scalar alone cannot). Scale shape: one exact-quantile pass over
    * the reference, one binning aggregation per snapshot (map-side
    * literal comparisons → `bins` groups), one broadcast totals join.
    */
  def populationStability(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need bins >= 2: $bins")
    require(epsilon > 0, s"need epsilon > 0: $epsilon")
    val bounds = referenceBins(ref, valueCol, bins)
    val v = col(valueCol).cast("double")
    val binC = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .reduce(_ + _).cast("long").as("bin")
    def binned(df: DataFrame, nCol: String): DataFrame =
      df.select(binC).groupBy("bin").agg(count(lit(1)).as(nCol))
    // the joined bin relation feeds BOTH the totals aggregate and the
    // final projection — snapshot it, or each consumer re-executes the
    // two corpus-sized binning aggregations (the tokenDistributionDrift
    // convention)
    val joined = Stage.snapshotDF(binned(ref, "n_ref")
      .join(binned(cur, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur")))
    val totals = joined.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val pf = col("n_ref").cast("double") / col("__tr").cast("double")
    val qf = col("n_cur").cast("double") / col("__tc").cast("double")
    val p = pf + lit(epsilon)
    val q = qf + lit(epsilon)
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(pf, 6).as("ref_frac"),
        round(qf, 6).as("cur_frac"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy("bin")
  }

  /** Benford first-digit conformance audit (Newcomb 1881, Benford 1938) —
    * the forensic data-quality check for "naturally grown" numeric
    * columns (amounts, populations, trade volumes): the first significant
    * digit of organic multi-scale data follows p(d) = log₁₀(1 + 1/d), and
    * fabricated / truncated / default-filled values don't. Emits one row
    * per digit with the observed count, the Benford probability, and the
    * χ² contribution (Σ = the test statistic; per-digit terms localize
    * WHICH digit is inflated — the per-bin convention of
    * [[populationStability]]).
    *
    * Values < 1 are outside the audit (their leading digit lives in the
    * fraction — filter, don't guess). The first digit is the first
    * character of floor(x) as a BIGINT string — integer-to-string is
    * byte-identical across engines, where a log₁₀/pow extraction risks
    * libm last-ulp disagreement exactly at powers of ten. The
    * nine Benford probabilities enter both plans as driver double
    * literals (the centroid/codebook convention). One corpus-sized
    * aggregation into nine groups; everything after is nine-row algebra.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = broadcast(
      (1 to 9).map(d => (d.toLong, math.log10(1.0 + 1.0 / d)))
        .toDF("digit", "benford_p"))
    val obs = Stage.snapshotDF(df
      .filter(col(valueCol).cast("double") >= 1.0)
      .select(substring(floor(col(valueCol).cast("double")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs")))
    val n = obs.agg(sum("n_obs").as("__n"))
    val expN = col("__n").cast("double") * col("benford_p")
    expected.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("benford_p"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("n_obs"),
        (round(col("benford_p"), 6) + lit(0.0)).as("benford_p"),
        (round((col("n_obs").cast("double") - expN) *
          (col("n_obs").cast("double") - expN) / expN, 6) + lit(0.0))
          .as("chi2_term"))
  }

  /** Pointwise and total mutual information between two categorical
    * columns — the column-association audit ("does `source` determine
    * `lang`?" — a leakage/stratification question every mixing plan
    * should ask before treating dimensions as independent):
    *
    *   mi_term(x,y) = (n_xy/N) · ln( (n_xy·N) / (n_x·n_y) ),  MI = Σ terms
    *
    * One corpus-sized (x, y) count; marginals and N fold off that
    * snapshot (cell-table-sized), so the corpus is read once. Every
    * ratio is a division/product of exact-integer doubles — identical
    * IEEE operands cross-engine (the q199 PMI contract; this is PMI's
    * occurrence-weighted expectation). Emits one row per observed cell.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = Stage.snapshotDF(
      df.select(col(xCol).as("x"), col(yCol).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("n_xy")))
    val mx = joint.groupBy("x").agg(sum("n_xy").as("n_x"))
    val my = joint.groupBy("y").agg(sum("n_xy").as("n_y"))
    val tot = joint.agg(sum("n_xy").as("__n"))
    val d = (c: String) => col(c).cast("double")
    joint.join(mx, Seq("x")).join(my, Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x").as(xCol), col("y").as(yCol),
        col("n_xy"), col("n_x"), col("n_y"),
        (round((d("n_xy") / d("__n")) *
          log((d("n_xy") * d("__n")) / (d("n_x") * d("n_y"))), 6) + lit(0.0))
          .as("mi_term"))
  }

  /** [[ksDrift]] per group — drift monitored PER SLICE (source, priority,
    * region), which is how a production gate actually runs: an aggregate
    * KS can stay flat while one slice's distribution walks away. Same
    * exact-integer CDF algebra; here the cumulative scans are ordinary
    * GROUP-keyed windows (each group's distinct values ride its own
    * partition — the per-key shape of cusum/resample), so no range-scan
    * machinery is needed; a single giant group is exactly the global
    * [[ksDrift]] case, which exists for it. One row per group present in
    * either side.
    */
  def ksDriftByGroup(
      a: DataFrame, b: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val sel = (df: DataFrame) => df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("value"))
      .filter(col("value").isNotNull)
    val ca = sel(a).groupBy("g", "value").agg(count(lit(1)).as("ca"))
    val cb = sel(b).groupBy("g", "value").agg(count(lit(1)).as("cb"))
      .withColumnsRenamed(Map("g" -> "__g2", "value" -> "__v2"))
    // null-SAFE group matching: a null slice is a real slice (the
    // functionalDependency convention) — a plain equi-join would split it
    // into phantom one-sided halves and hide its drift entirely
    val pooled = Stage.snapshotDF(
      ca.join(cb, col("g") <=> col("__g2") && col("value") === col("__v2"),
          "full_outer")
        .select(coalesce(col("g"), col("__g2")).as("g"),
          coalesce(col("value"), col("__v2")).as("value"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("value")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = pooled.groupBy("g")
      .agg(sum("ca").as("__na"), sum("cb").as("__nb"))
    val crit = lit(1.358) * sqrt((col("__na") + col("__nb")).cast("double") /
      (col("__na").cast("double") * col("__nb").cast("double")))
    val both = col("__na") > 0 && col("__nb") > 0
    val byD = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("__d").desc, col("value").asc)
    pooled
      .withColumn("__fa", sum("ca").over(w))
      .withColumn("__fb", sum("cb").over(w))
      .join(broadcast(totals.withColumnRenamed("g", "__gt")),
        col("g") <=> col("__gt"))
      // a group present on ONE side only has no comparison sample: KS is
      // undefined there (null scores, null verdict) — its appearance/
      // disappearance is its own signal, not a CDF gap
      .withColumn("__d", when(both,
        abs(col("__fa").cast("double") / col("__na") -
            col("__fb").cast("double") / col("__nb"))))
      .withColumn("__rn", row_number().over(byD))
      .filter(col("__rn") === 1)
      .select(col("g").as(groupCol), col("__na").as("n_a"), col("__nb").as("n_b"),
        (round(col("__d"), 6) + lit(0.0)).as("ks"),
        when(both, col("value")).as("ks_at_value"),
        (round(when(both, crit), 6) + lit(0.0)).as("crit_95"),
        (col("__d") > crit).as("drifted"))
  }

  /** Functional-dependency violation census — "does `detCol` determine
    * `depCol`?", the schema-inference / deduplication-key question
    * [[mutualInformation]] answers softly and this answers exactly: per
    * determinant group the majority dependent value is the repair target
    * (Fan's CFD framing), so `violations = group size − majority count`
    * is the minimum number of rows that must change for the FD to hold.
    * Emits one row: group/violation counts and the verdict.
    *
    * Cost: one (det, dep) corpus aggregation, then group-sized algebra —
    * all exact integers, no rounding contract. Null determinants form
    * their own group; null dependents are a value (an FD over nullable
    * columns is still checkable).
    */
  def functionalDependency(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val groups = df
      .groupBy(col(detCol).as("__a"), col(depCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("__a")
      .agg(sum("__n").as("__tot"), max("__n").as("__maj"))
    // coalesce: over zero groups the sums are null — an empty relation
    // holds every FD vacuously, and a consumer gating on fd_holds must
    // get a real boolean, not null
    groups.agg(
      count(lit(1)).as("n_groups"),
      coalesce(sum(when(col("__tot") > col("__maj"), 1L).otherwise(0L)), lit(0L))
        .as("n_violating_groups"),
      coalesce(sum(col("__tot") - col("__maj")), lit(0L)).as("n_violating_rows"),
      coalesce(sum("__tot"), lit(0L)).as("n_rows"))
      .select(col("n_groups"), col("n_violating_groups"),
        col("n_violating_rows"), col("n_rows"),
        (col("n_violating_rows") === 0L).as("fd_holds"))
  }

    /** χ²₀.₉₅ critical values for dof 1..30 — driver literals (the Benford
    * probability convention) shared verbatim by the operator plan and
    * the oracle's CASE table.
    */
  val Chi2Crit95: Seq[Double] = Seq(
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507, 16.919,
    18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296, 27.587,
    28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415, 37.652,
    38.885, 40.113, 41.337, 42.557, 43.773)

  /** χ² test of homogeneity over a 2-column contingency table: is the
    * distribution of `yCol` the same across `xCol` slices —
    *
    *   χ² = Σ_cells (o − e)²/e,  e = rowTot·colTot/n
    *
    * — the table-level significance gate completing the association
    * quartet on a column pair ([[mutualInformation]] raw nats,
    * [[uncertaintyCoefficient]] normalized, [[functionalDependency]]
    * exact violations, and THIS: "is the difference beyond sampling
    * noise"). Per-cell terms evaluate as (o·n − r·c)²/(n·r·c) — the
    * cross term exact in DECIMAL(38,0) before ONE double square/division
    * — and are quantized to 1e-9 integers before the global sum (the
    * q235 posture). dof = (n_x−1)(n_y−1); the 95% verdict reads the
    * [[Chi2Crit95]] literal table, null beyond dof 30 or at dof 0
    * (a 1×m table has nothing to test).
    *
    * NOTE: cells with o = 0 still contribute e (the homogeneity
    * definition needs the full r×c grid) — absent cells are
    * reconstructed from the margins, never silently skipped.
    */
  def chiSquareHomogeneity(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val joint = Stage.snapshotDF(
      df.select(col(xCol).as("x"), col(yCol).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
        .groupBy("x", "y").agg(count(lit(1)).as("o")))
    val mx = Stage.snapshotDF(joint.groupBy("x").agg(sum("o").as("r")))
    val my = Stage.snapshotDF(joint.groupBy("y").agg(sum("o").as("c")))
    val tot = Stage.snapshotDF(joint.agg(sum("o").cast("long").as("n")))
    // the FULL grid: absent cells enter with o = 0
    val grid = mx.crossJoin(my)
      .join(joint, Seq("x", "y"), "left")
      .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(tot))
    val d = (col("o").cast(dec) * col("n").cast(dec) -
      col("r").cast(dec) * col("c").cast(dec)).cast("double")
    val term = d * d /
      (col("n").cast("double") * col("r").cast("double") * col("c").cast("double"))
    val sums = grid.agg(
      sum(floor(term * lit(1e9) + lit(0.5)).cast("long")).as("__q"),
      max("n").as("n_rows"))
    val dims = mx.agg(count(lit(1)).as("n_x"))
      .crossJoin(broadcast(my.agg(count(lit(1)).as("n_y"))))
    val dof = (col("n_x") - 1) * (col("n_y") - 1)
    val chi2 = col("__q").cast("double") / lit(1e9)
    val crit = Chi2Crit95.zipWithIndex
      .foldLeft(lit(null).cast("double")) { case (acc, (v, i)) =>
        when(dof === (i + 1), lit(v)).otherwise(acc)
      }
    sums.crossJoin(broadcast(dims))
      .select(col("n_rows"), col("n_x"), col("n_y"), dof.as("dof"),
        (round(chi2, 4) + lit(0.0)).as("chi2"),
        crit.as("crit_95"),
        when(dof >= 1 && dof <= Chi2Crit95.size, round(chi2, 4) <= crit)
          .as("homogeneous_95"))
  }

  /** Two-sample proportion z-test (pooled): is the success rate of slice
    * A different from slice B beyond what sampling noise explains —
    * the A/B gate behind "did the new filter change the en-share" /
    * "is conversion different for this cohort".
    *
    *   z = (p̂₁ − p̂₂) / √( p̂(1−p̂)(1/n₁ + 1/n₂) ),  p̂ pooled
    *
    * All four counts are exact integers from one aggregate per side;
    * the statistic is ONE declared double expression over identically
    * cast operands (engine-stable), with the two-sided 95% verdict at
    * 1.96. Degenerate pools (p̂ ∈ {0,1} — zero variance) emit null z
    * and a false verdict, never ±∞.
    */
  def proportionTest(
      a: DataFrame, b: DataFrame, successCol: String): DataFrame = {
    def side(df: DataFrame, n: String, x: String) = df.agg(
      count(lit(1)).as(n),
      sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L)).as(x))
    val d = (c: String) => col(c).cast("double")
    val pp = (d("__x1") + d("__x2")) / (d("__n1") + d("__n2"))
    val z = (d("__x1") / d("__n1") - d("__x2") / d("__n2")) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / d("__n1") + lit(1.0) / d("__n2")))
    side(a, "__n1", "__x1").crossJoin(broadcast(side(b, "__n2", "__x2")))
      .select(col("__n1").as("n_a"), col("__x1").as("x_a"),
        col("__n2").as("n_b"), col("__x2").as("x_b"),
        (round(d("__x1") / d("__n1"), 6) + lit(0.0)).as("p_a"),
        (round(d("__x2") / d("__n2"), 6) + lit(0.0)).as("p_b"),
        when(col("__x1") + col("__x2") > 0 &&
          col("__x1") + col("__x2") < col("__n1") + col("__n2"),
          round(z, 6) + lit(0.0)).as("z"),
        coalesce(when(col("__x1") + col("__x2") > 0 &&
          col("__x1") + col("__x2") < col("__n1") + col("__n2"),
          abs(z) > 1.96), lit(false)).as("significant_95"))
  }

  /** Calibration (reliability) table for a [0,1] score against a binary
    * label: fixed-width bins, per-bin mean prediction vs positive rate
    * and the per-bin Brier contribution — the audit run before a
    * heuristic quality score (or a filter model's output) is trusted as
    * a probability in a sampling/mixing plan. Fixed-width binning
    * (floor(p·bins), top edge clamped) — quantile bins would make bin
    * EDGES data-dependent and the table unstable across snapshots.
    *
    * Determinism: per-row terms (p, (p−y)²) are quantized to exact 1e-9
    * integers before their bin sums (the q148 posture), so per-bin means
    * are exact-integer ratios; rows with null/out-of-range p are
    * excluded (a score that isn't a probability has no bin).
    */
  def calibrationTable(
      df: DataFrame, predCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val base = df.select(col(predCol).cast("double").as("__p"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .filter(col("__p").isNotNull && col("__p") >= 0.0 && col("__p") <= 1.0)
    def q(e: org.apache.spark.sql.Column) =
      floor(e * lit(1e9) + lit(0.5)).cast("long")
    val err = col("__p") - col("__y").cast("double")
    base
      .groupBy(least(floor(col("__p") * bins), lit(bins - 1).cast("double"))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n_rows"), sum("__y").as("__pos"),
        sum(q(col("__p"))).as("__sp"), sum(q(err * err)).as("__sb"))
      .select(col("bin"), col("n_rows"),
        (round(col("__sp").cast("double") / lit(1e9) /
          col("n_rows").cast("double"), 6) + lit(0.0)).as("mean_pred"),
        (round(col("__pos").cast("double") /
          col("n_rows").cast("double"), 6) + lit(0.0)).as("pos_rate"),
        (round(col("__sb").cast("double") / lit(1e9) /
          col("n_rows").cast("double"), 6) + lit(0.0)).as("bin_brier"))
      .orderBy("bin")
  }

  /** EXACT per-group percentiles of an integer column — the
    * deterministic alternative to `approx_percentile` when the gate is
    * contractual (SLA p99, release-blocking medians) and a sketch's
    * ±ε is an argument waiting to happen. Lower-percentile convention:
    * P_p = the smallest value whose cumulative count reaches
    * ⌈p·n/100⌉ (exact integer rank, no interpolation — a value that
    * EXISTS in the data, cross-engine stable).
    *
    * Shape: per-(key, value) pre-aggregation (one corpus shuffle — the
    * same price as any exact distinct), then group-keyed cumulative
    * windows over the per-key DISTINCT-value relation (value-bounded,
    * not row-bounded) and one min-per-rank aggregate. Never a global
    * sort, never a single-partition window.
    */
  def exactPercentiles(
      df: DataFrame, keyCol: String, valueCol: String,
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tw = org.apache.spark.sql.expressions.Window.partitionBy("__k")
    val counts = df
      .select(col(keyCol).as("__k"), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(tw))
    val picks = percentiles.map { p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col("__v"))).as(s"p$p")
    }
    counts.groupBy(col("__k").as(keyCol))
      .agg(max("__n").as("n_rows"), picks: _*)
      .orderBy(keyCol)
  }

  /** WEIGHTED [[exactPercentiles]]: P_p = the smallest value whose
    * cumulative WEIGHT reaches ⌈p·W/100⌉ of the total mass W — the
    * exact twin of [[QuantileSketch.sketchWeighted]]'s rank convention
    * ("below which value does p% of the token/byte mass live").
    * Identical shape: per-(key, value) weight pre-aggregation, then
    * group-keyed cumulative windows over the per-key DISTINCT-value
    * relation and one min-per-rank aggregate. Null/negative weights are
    * outside the mass by contract; `total_weight` reports the TOTAL
    * MASS, not the row count. The rank comparison runs in
    * DECIMAL(38,0): mass is summed tokens/bytes, so Long arithmetic
    * on `cum·100` would wrap once total mass passes ~9.2e16 — real
    * headroom at a fleet-wide 100 TB merge. The cum/total sums
    * themselves stay Long, so the operator's total-mass ceiling is
    * Long.MaxValue ~9.2e18 (the [[QuantileSketch.sketchWeighted]]
    * contract ceiling, ~5 orders past a 100 TB census).
    */
  def exactPercentilesWeighted(
      df: DataFrame, keyCol: String, valueCol: String, weightCol: String,
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tw = org.apache.spark.sql.expressions.Window.partitionBy("__k")
    val counts = df
      .select(col(keyCol).as("__k"), col(valueCol).cast("long").as("__v"),
        col(weightCol).cast("long").as("__wt"))
      .filter(col("__v").isNotNull && col("__wt").isNotNull && col("__wt") >= 0)
      .groupBy("__k", "__v").agg(sum("__wt").as("__c"))
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(tw))
    val picks = percentiles.map { p =>
      min(when(col("__cum").cast("decimal(38,0)") * 100 >=
        col("__n").cast("decimal(38,0)") * p, col("__v"))).as(s"p$p")
    }
    counts.groupBy(col("__k").as(keyCol))
      .agg(max("__n").as("total_weight"), picks: _*)
      .orderBy(keyCol)
  }

  /** Theil's uncertainty coefficient U(y|x) = MI(x;y) / H(y) — the
    * NORMALIZED "how much does knowing x reduce uncertainty about y"
    * (0 = independent, 1 = x determines y), the scale-free companion of
    * [[mutualInformation]]'s raw nats and the soft face of
    * [[functionalDependency]]'s exact violation counts. One joint-count
    * aggregation (shared cells feed MI numerator and both entropies);
    * every per-cell term quantized to an exact 1e-9 integer before its
    * sum, the final ratio ONE double division of two exact-integer-backed
    * quantities. H(y) = 0 (constant y) → null, not 0/0.
    */
  def uncertaintyCoefficient(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = Stage.snapshotDF(
      df.select(col(xCol).as("x"), col(yCol).as("y"))
        .filter(col("x").isNotNull && col("y").isNotNull)
        .groupBy("x", "y").agg(count(lit(1)).as("n_xy")))
    val mx = joint.groupBy("x").agg(sum("n_xy").as("n_x"))
    val my = Stage.snapshotDF(joint.groupBy("y").agg(sum("n_xy").as("n_y")))
    val tot = Stage.snapshotDF(joint.agg(sum("n_xy").as("__n")))
    val d = (c: String) => col(c).cast("double")
    def q(e: org.apache.spark.sql.Column) =
      floor(e * lit(1e9) + lit(0.5)).cast("long")
    val miQ = joint.join(mx, Seq("x")).join(my, Seq("y"))
      .crossJoin(broadcast(tot))
      .agg(sum(q((d("n_xy") / d("__n")) *
        log((d("n_xy") * d("__n")) / (d("n_x") * d("n_y"))))).as("__mi"))
    val hyQ = my.crossJoin(broadcast(tot))
      .agg(sum(q((d("n_y") / d("__n")) * -log(d("n_y") / d("__n")))).as("__hy"),
        count(lit(1)).as("n_y_classes"))
    miQ.crossJoin(broadcast(hyQ)).crossJoin(broadcast(tot))
      .select(col("__n").as("n_rows"), col("n_y_classes"),
        (round(col("__mi").cast("double") / lit(1e9), 6) + lit(0.0)).as("mi_nats"),
        (round(col("__hy").cast("double") / lit(1e9), 6) + lit(0.0)).as("h_y_nats"),
        when(col("__hy") > 0,
          round(col("__mi").cast("double") / col("__hy").cast("double"), 6)
            + lit(0.0)).as("uncertainty_coef"))
  }

  /** Hill tail-index estimator (Hill 1975) over the m largest values of
    * a positive integer column:
    *
    *   1/α̂ = (1/m) Σ_{i=1..m} ln(x₍ᵢ₎ / x₍ₘ₊₁₎)
    *
    * — "how heavy is the tail" (α < 2: infinite variance; doc-length
    * and host-size tails routinely sit there), the number that decides
    * whether mean-based capacity math is even meaningful. The m+1 top
    * order statistics come from ONE TakeOrdered (value desc, id asc —
    * a deterministic cut through ties); each ln is quantized to an
    * exact 1e-9 integer before the sum (driver-sized relation, but the
    * combine-order posture is uniform repo-wide), threshold subtraction
    * exact, one closing division pair. Requires > m positive values —
    * fewer emits NO row (there is no defined threshold), never a lie;
    * a degenerate tail (all m values equal to the threshold) emits the
    * row with a null α rather than ∞.
    */
  def hillTailIndex(
      df: DataFrame, valueCol: String, idCol: String, m: Int = 50): DataFrame = {
    require(m >= 1, s"need m >= 1, got $m")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").desc, col("__id").asc)
    val top = Stage.snapshotDF(df
      .select(col(valueCol).cast("long").as("__v"), col(idCol).as("__id"))
      .filter(col("__v") > 0)
      .orderBy(col("__v").desc, col("__id").asc).limit(m + 1)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__lq",
        floor(log(col("__v").cast("double")) * lit(1e9) + lit(0.5)).cast("long")))
    val thr = top.filter(col("__rn") === m + 1)
      .select(col("__v").as("threshold"), col("__lq").as("__lthr"))
    top.filter(col("__rn") <= m)
      .agg(count(lit(1)).as("__mm"), sum("__lq").as("__s"))
      .crossJoin(broadcast(thr))
      .select(lit(m).as("m"), col("threshold"),
        when(col("__mm") === m,
          round((col("__s") - lit(m.toLong) * col("__lthr")).cast("double") /
            (lit(m.toDouble) * lit(1e9)), 6) + lit(0.0)).as("mean_ln_excess"),
        when(col("__mm") === m && col("__s") > lit(m.toLong) * col("__lthr"),
          round(lit(m.toDouble) * lit(1e9) /
            (col("__s") - lit(m.toLong) * col("__lthr")).cast("double"), 6)
            + lit(0.0)).as("alpha"))
  }

  /** Gini concentration of a non-negative integer column — the
    * inequality one-number ("how concentrated is corpus volume on few
    * documents / sources / hosts") behind mixing and crawl-budget
    * decisions. Grouped-value closed form on the ascending order: with
    * per-value counts c and EXCLUSIVE prefix counts P,
    *
    *   2T = Σ_v v·(2·c·P + c·(c+1)),  G = (2T − (n+1)·Σx) / (n·Σx)
    *
    * — every term an exact DECIMAL(38,0) integer (the doubled form
    * avoids even ONE interior division), one rounded double division at
    * the end. The global exclusive prefix is the [[ksDrift]] distributed
    * scan: per-value pre-aggregation (one corpus shuffle), range
    * partition, LOCAL window prefix + broadcast prefix-of-partition-
    * totals offsets — never a single-partition corpus window, invariant
    * to where range boundaries land (equal values pre-merge, they cannot
    * split). Zero-spread columns (all values equal) emit 0.0; G is the
    * population form (denominator n, not n−1).
    */
  def giniConcentration(
      df: DataFrame, valueCol: String, rangePartitions: Int = 32): DataFrame = {
    val dec = "decimal(38,0)"
    val cnt = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val pooled = Stage.snapshotDF(cnt
      .repartitionByRange(rangePartitions, col("v"))
      .withColumn("__pid", spark_partition_id()))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offW = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = pooled.groupBy("__pid").agg(sum("c").as("__tc"))
      .select(col("__pid"), coalesce(sum("__tc").over(offW), lit(0L)).as("__oc"))
    val vD = col("v").cast(dec)
    val cD = col("c").cast(dec)
    val pD = (coalesce(col("__lp"), lit(0L)) + col("__oc")).cast(dec)
    val terms = pooled
      .withColumn("__lp", sum("c").over(localW))
      .join(broadcast(offsets), Seq("__pid"))
      .agg(
        sum(vD * (lit(2) * cD * pD + cD * (cD + lit(1)))).as("__t2"),
        sum(col("c")).cast(dec).as("__n"),
        sum(vD * cD).as("__sx"))
    terms.select(
      col("__n").cast("long").as("n_rows"),
      col("__sx").cast("long").as("total"),
      when(col("__sx") > 0,
        round((col("__t2") - (col("__n") + lit(1)) * col("__sx")).cast("double") /
          (col("__n") * col("__sx")).cast("double"), 6) + lit(0.0))
        .as("gini"))
  }

/** Exact two-sample Kolmogorov–Smirnov drift statistic — the bin-free
    * member of the drift family ([[populationStability]] commits to bins
    * up front and is blind to shifts INSIDE a bin; JS/centroid drift are
    * categorical/embedding-space):
    *
    *   KS = max_v |F_a(v) − F_b(v)|
    *
    * over the pooled observed values, with the classic two-sample 95%
    * critical value 1.358·√((n_a+n_b)/(n_a·n_b)) and a verdict. Also
    * emits the SMALLEST value attaining the max — where the
    * distributions pull apart.
    *
    * The global CDF needs a total order, but NOT a single partition: per
    * side, values pre-aggregate to (value, count) — one corpus-sized
    * shuffle each — then the pooled distinct-value relation is
    * range-partitioned and each partition computes a LOCAL prefix sum;
    * the global prefix is local + the broadcast prefix-of-partition-
    * totals offset (the textbook distributed scan). The result is
    * invariant to where the range boundaries land (equal values never
    * split across ranges), so the sampled partitioner cannot perturb it;
    * all counts are exact integers, each CDF value ONE division of exact
    * integers, |diff| comparisons exact.
    */
  def ksDrift(
      a: DataFrame, b: DataFrame, valueCol: String,
      rangePartitions: Int = 32): DataFrame = {
    // nulls (and null-casting values) are outside the distribution by
    // contract: a null key never equi-joins, so it would survive the
    // full-outer pool as TWO phantom rows inflating n_a/n_b, ordered
    // differently by each engine's null placement
    val v = col(valueCol).cast("double").as("value")
    val ca = a.select(v).filter(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("ca"))
    val cb = b.select(v).filter(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cb"))
    val pooled = Stage.snapshotDF(
      ca.join(cb, Seq("value"), "full_outer").na.fill(0L, Seq("ca", "cb"))
        .repartitionByRange(rangePartitions, col("value"))
        .withColumn("__pid", spark_partition_id()))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("value")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val offW = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // the offset relation is ≤ rangePartitions rows — its single-partition
    // window is bounded by construction
    val offsets = pooled.groupBy("__pid")
      .agg(sum("ca").as("__ta"), sum("cb").as("__tb"))
      .select(col("__pid"),
        coalesce(sum("__ta").over(offW), lit(0L)).as("__oa"),
        coalesce(sum("__tb").over(offW), lit(0L)).as("__ob"))
    val totals = pooled.agg(sum("ca").as("__na"), sum("cb").as("__nb"))
    val diffs = pooled
      .withColumn("__la", sum("ca").over(localW))
      .withColumn("__lb", sum("cb").over(localW))
      .join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(totals))
      .select(col("value"), col("__na"), col("__nb"),
        abs((col("__la") + col("__oa")).cast("double") / col("__na") -
            (col("__lb") + col("__ob")).cast("double") / col("__nb")).as("__d"))
    diffs
      .orderBy(col("__d").desc, col("value").asc).limit(1)
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        (round(col("__d"), 6) + lit(0.0)).as("ks"),
        col("value").as("ks_at_value"),
        (round(lit(1.358) * sqrt((col("__na") + col("__nb")).cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double"))), 6)
          + lit(0.0)).as("crit_95"),
        // n_a·n_b multiplies as doubles — the long product overflows
        // exactly at the corpus sizes this gate is for
        (col("__d") > lit(1.358) * sqrt((col("__na") + col("__nb")).cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")))).as("drifted"))
  }
}
