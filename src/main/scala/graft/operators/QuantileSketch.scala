package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch with a fully SQL-replayable definition —
  * the deterministic sibling the q151 `approx_percentile` audit lacks
  * (GK sketch internals are not replayable in an oracle), extending the
  * round-13 KMV-beside-HLL pattern to quantiles.
  *
  * Bucketization is DECIMAL-MANTISSA: a positive integer value v lands
  * in the bucket spanned by its first two decimal digits —
  * lo = m·10^(d−2), hi = (m+1)·10^(d−2) − 1 where d = digit count and
  * m = leading two digits (single-digit values get exact singleton
  * buckets). Everything is STRING-INTEGER arithmetic (digit count,
  * substring, zero-padding rebuild) — no logs, no doubles, so DuckDB
  * replays the sketch bit-for-bit and the driver gate can hash-check
  * it. Relative bucket width is ≤ 1/m ≤ 10% (m ≥ 10), i.e. every
  * quantile estimate carries a ≤ 10% relative bound by construction —
  * log-scale accuracy like a t-digest, but with FIXED boundaries, which
  * is exactly what makes the sketch mergeable: partials from any
  * sharding agree on bucket identity and merge by count addition
  * (proven shard ≡ whole in QuantileSketchSpec).
  *
  * Scale shape: the sketch is ONE distributed count aggregation
  * (partial+final, map-side combined); the bucket relation is ≤ 90
  * buckets per digit count (≤ ~1.7k rows for the full long range), so
  * [[estimate]]'s cumulative window is bounded by construction — see
  * the PLANS.md global-window table. At 100 TB the sketch is the only
  * thing that moves: 1.7k (bucket, count) rows per shard/day merge into
  * the fleet-wide quantile store; the reference re-reads everything
  * (`ingester/es_common.py:273-330`) and has no sketch surface at all.
  *
  * Contract: values must be non-negative integers (quantize doubles
  * first — the q145 integer-cents/1e-6 conventions); negative values
  * are rejected by filter, matching the oracle's WHERE.
  */
object QuantileSketch {

  /** Per-bucket partials (groupCols…, bucket_lo, bucket_hi, cnt) of a
    * non-negative integer column, optionally keyed — one sketch per
    * group in a single aggregation pass. Bucket identity is exact
    * string-integer arithmetic, identical in Spark and DuckDB.
    */
  def sketch(df: DataFrame, valueCol: String,
             groupCols: Seq[String] = Seq.empty): DataFrame =
    sketchAgg(df, valueCol, groupCols, count(lit(1)))

  /** WEIGHTED bucket partials: `cnt` is the summed weight mass per
    * bucket instead of the row count, so [[estimate]]/[[estimateByGroup]]
    * resolve WEIGHTED quantiles — "the value below which p% of the
    * MASS lives" (token-weighted doc-length percentiles, byte-weighted
    * latency bands). Same buckets, same merge algebra (weights add like
    * counts), same rank convention with `n` = total mass. Rows with
    * null/negative weight are outside the mass by contract (mirrored in
    * the oracle's WHERE); zero-weight rows contribute nothing either
    * way. Contract ceiling: TOTAL mass must stay below Long.MaxValue
    * (~9.2×10¹⁸) — the per-bucket and cumulative sums run in Long
    * (LongType output is also what the no-DecimalType final-schema pin
    * requires of `n_rows`); the DECIMAL(38,0) rank comparison in
    * [[estimate]]/[[estimateByGroup]] removes only the ×100 factor's
    * earlier wrap at ~9.2×10¹⁶. Still ~5 orders of magnitude past a
    * 100 TB token/byte census (~10¹⁴), but it is a ceiling.
    */
  def sketchWeighted(df: DataFrame, valueCol: String, weightCol: String,
                     groupCols: Seq[String] = Seq.empty): DataFrame = {
    val pre = df
      .filter(col(weightCol).isNotNull && col(weightCol).cast("long") >= 0)
      .withColumn("__w", col(weightCol).cast("long"))
    sketchAgg(pre, valueCol, groupCols, sum(col("__w")))
  }

  /** Shared bucketization core: project (groups…, __w?, __v), derive
    * lo/hi by the digit-count + leading-two-digit string rebuild, and
    * aggregate `cntAgg` per (group, bucket). The 19-digit mantissa-92
    * bucket's rebuilt upper bound ("93" + 17 zeros) exceeds
    * Long.MaxValue — clamp it there rather than let a non-ANSI cast
    * null the bucket (and the oracle's CAST error); the bucket
    * legitimately ends at the domain ceiling.
    */
  private def sketchAgg(df: DataFrame, valueCol: String,
                        groupCols: Seq[String],
                        cntAgg: Column): DataFrame = {
    val v = col(valueCol).cast("long")
    val keep = df.columns.filter(_ == "__w").toSeq
    val base = df.select((groupCols.map(col) ++ keep.map(col) :+ v.as("__v")): _*)
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .withColumn("__s", col("__v").cast("string"))
      .withColumn("__d", length(col("__s")))
    val lo = when(col("__d") === 1, col("__v"))
      .otherwise(concat(substring(col("__s"), 1, 2),
        repeat(lit("0"), col("__d") - 2)).cast("long"))
    val hi = when(col("__d") === 1, col("__v"))
      .when(col("__d") === 19 && substring(col("__s"), 1, 2) === "92",
        lit(Long.MaxValue))
      .otherwise(concat(
        (substring(col("__s"), 1, 2).cast("long") + 1).cast("string"),
        repeat(lit("0"), col("__d") - 2)).cast("long") - 1)
    base.select((groupCols.map(col) ++ keep.map(col)
        :+ lo.as("bucket_lo") :+ hi.as("bucket_hi")): _*)
      .groupBy((groupCols :+ "bucket_lo" :+ "bucket_hi").map(col): _*)
      .agg(cntAgg.as("cnt"))
  }

  /** Merge sketch partials (any union of [[sketch]] outputs with the
    * same group columns): fixed boundaries make this plain count
    * addition per (group, bucket).
    */
  def merge(parts: DataFrame, groupCols: Seq[String] = Seq.empty): DataFrame =
    parts.groupBy((groupCols :+ "bucket_lo" :+ "bucket_hi").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a (possibly merged) sketch. Lower-
    * percentile convention shared with [[Checks.exactPercentiles]]:
    * the FIRST bucket whose cumulative count reaches rank
    * ⌈p·n/100⌉ — the pure-integer comparison `cum·100 ≥ n·p`, no
    * division anywhere. One row per requested percentile:
    * (pct, n_rows, est_lo, est_hi); the true quantile is guaranteed
    * inside [est_lo, est_hi].
    *
    * The cumulative window is partition-less BUT bucket-bounded
    * (≤ 90 buckets per digit count — the PLANS.md global-window
    * contract), never data-sized.
    */
  def estimate(sk: DataFrame, percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val w = Window.orderBy("bucket_lo")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = Stage.snapshotDF(sk
      .withColumn("__cum", sum("cnt").over(w)))
    val n = cum.agg(sum("cnt").as("__n"))
    val ps = percentiles.map(p => struct(lit(p).as("p")))
    val pRows = cum.sparkSession.range(1)
      .select(explode(array(ps: _*)).as("__p"))
      .select(col("__p.p").as("pct"))
    // the rank comparison runs in DECIMAL(38,0): with sketchWeighted
    // partials, cnt is summed MASS (tokens/bytes), and Long `cum·100`
    // would silently wrap past a total mass of ~9.2e16 — a real
    // ceiling for the fleet-wide 100 TB merge this sketch exists for.
    // (The cum/__n sums themselves stay Long, so the operator's true
    // total-mass ceiling is Long.MaxValue ~9.2e18 — see sketchWeighted.)
    pRows.crossJoin(broadcast(n))
      .join(cum, col("__cum").cast("decimal(38,0)") * 100 >=
        col("__n").cast("decimal(38,0)") * col("pct"))
      .groupBy("pct")
      .agg(max("__n").as("n_rows"),
        min(struct(col("bucket_lo"), col("bucket_hi"))).as("__b"))
      .select(col("pct"), col("n_rows"),
        col("__b.bucket_lo").as("est_lo"), col("__b.bucket_hi").as("est_hi"))
      .orderBy("pct")
  }

  /** Per-group quantile estimates from a keyed sketch ([[sketch]] with
    * `groupCols`) — the [[Checks.exactPercentiles]] wide shape
    * (`p50_lo/p50_hi/…`), same rank convention. Every window is
    * GROUP-partitioned over the per-group bucket relation (≤ ~1.7k rows
    * per group): fully distributed, no global window at all — the shape
    * that serves a million groups as readily as five.
    */
  def estimateByGroup(
      sk: DataFrame, groupCols: Seq[String],
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(groupCols.nonEmpty, "estimateByGroup needs group columns")
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("bucket_lo")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tw = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("__cum", sum("cnt").over(w))
      .withColumn("__n", sum("cnt").over(tw))
    val picks = percentiles.map { p =>
      // DECIMAL(38,0) for the same mass-overflow headroom as [[estimate]]
      min(when(col("__cum").cast("decimal(38,0)") * 100 >=
        col("__n").cast("decimal(38,0)") * p,
        struct(col("bucket_lo"), col("bucket_hi")))).as(s"__b$p")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max("__n").as("n_rows"), picks: _*)
      .select((groupCols.map(col) :+ col("n_rows")) ++
        percentiles.flatMap(p => Seq(
          col(s"__b$p.bucket_lo").as(s"p${p}_lo"),
          col(s"__b$p.bucket_hi").as(s"p${p}_hi"))): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Trailing-window quantiles from per-day bucket partials — the
    * quantile face of [[Kmv.trailingKmv]]'s window algebra: each day
    * reduces ONCE to its ≤ ~1.7k-row bucket counts, each partial row
    * fans to the ≤ W observation days it serves (census-day reporting),
    * and fixed boundaries make the per-window merge plain count
    * addition — so the windowed estimate is EXACTLY the estimate of the
    * union bag (no clipping argument even needed, unlike KMV). Per-day
    * state is bucket-count-sized; the exact windowed quantile would
    * haul the full value relation through every window. Output: one
    * row per census day in the [[estimateByGroup]] wide shape.
    * `weightCol` selects the weighted face (windowed × weighted — the
    * last cell of the sketch matrix): per-day [[sketchWeighted]]
    * partials, ranks over MASS, identical window algebra.
    *
    * This operator is ALREADY the production (partials-only) posture —
    * the [[Kmv.trailingKmv]] `audit = false` equivalent: past the one
    * per-day sketch reduction, nothing data-sized moves (PlanSpec pins
    * it). The exact ×W audit lives OUTSIDE, as the q261 gate
    * composition joins it on — drop the join, keep the operator, and
    * the 100 TB plan is this function unchanged.
    *
    * `groupCols` selects the KEYED trailing face (per-tenant rolling
    * p99s — the canonical fleet observability query): per-(key, day)
    * partials, per-key census days (a key reports on ITS OWN active
    * days — quiet keys emit nothing rather than stale rows), and every
    * window downstream is (key, obs_day)-partitioned over bucket-count
    * relations, so a million keys distribute exactly like one.
    */
  def trailingByDay(
      df: DataFrame, valueCol: String, tsCol: String,
      windowDays: Int = 7,
      percentiles: Seq[Int] = Seq(50, 90, 99),
      weightCol: Option[String] = None,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    // weighted face (the windowed × weighted matrix cell): per-day
    // partials carry summed MASS instead of row counts — the merge
    // algebra is unchanged (mass adds like counts), so the whole
    // window path below is shared verbatim
    val dayDf = df.withColumn("day", to_date(col(tsCol)))
      .filter(col("day").isNotNull)
    val daySk = Stage.snapshotDF(weightCol match {
      case Some(w) => sketchWeighted(dayDf, valueCol, w, groupCols :+ "day")
      case None => sketch(dayDf, valueCol, groupCols :+ "day")
    })
    val census = daySk.select((groupCols :+ "day").map(col): _*).distinct()
      .withColumnRenamed("day", "obs_day")
    val merged = daySk
      .select((groupCols.map(col) :+ col("day") :+ col("bucket_lo")
        :+ col("bucket_hi") :+ col("cnt")
        :+ explode(sequence(lit(0), lit(windowDays - 1))).as("__i")): _*)
      .select((groupCols.map(col) :+ expr("date_add(day, __i)").as("obs_day")
        :+ col("bucket_lo") :+ col("bucket_hi") :+ col("cnt")): _*)
      .join(census, groupCols :+ "obs_day")
      .groupBy((groupCols :+ "obs_day" :+ "bucket_lo" :+ "bucket_hi").map(col): _*)
      .agg(sum("cnt").as("cnt"))
    estimateByGroup(merged, groupCols :+ "obs_day", percentiles)
  }
}
