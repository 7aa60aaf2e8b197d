package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over event streams: fixed-interval resampling with
  * gap-fill, and sequential changepoint detection.
  *
  * The reference ingests by timestamp interval but leaves the series ragged
  * (one doc per source row — `ingester/es_common.py` range queries); a
  * training pipeline consuming event telemetry needs the opposite: a dense,
  * regular grid (for windowed features / drift monitors) and an alarm signal
  * when a series shifts. Both operators here cost one key-shuffle over
  * series-sized data and never touch the corpus twice.
  */
object TimeSeries {

  /** Fixed-interval resample with last-observation-carried-forward gap-fill.
    *
    * Buckets `tsCol` into `bucketSeconds`-wide intervals (bucket key =
    * floor(epoch/step)·step, a BIGINT — deliberately not a timestamp, so the
    * result schema is tz-free and cross-engine stable), keeps the LAST
    * observation per (key, bucket) — "last" defined by (ts, id) order, with
    * `idCol` breaking equal-timestamp ties deterministically — then explodes
    * each key's [min, max] bucket range into a dense grid and carries the
    * previous observed value into empty buckets. Emitted `is_gap` marks
    * filled rows.
    *
    * Cost shape: ONE event-volume shuffle — the partial-aggregated
    * (key, bucket) last-observation pick (`max_by` over a (ts, id) struct,
    * a small per-group state combined map-side). Everything after is
    * bucket-grid-sized: the per-key min/max fold, the grid⋈observations
    * equi-join, and the key-partitioned LOCF window each move at most
    * keys × span/step rows, independent of event volume, so a 100× event
    * scale-up changes only the first aggregate's input. No driver state,
    * no collect.
    */
  def resampleLocf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val step = lit(bucketSeconds)
    // obs feeds TWO consumers (the grid bounds and the grid join) —
    // snapshot it or the event-volume scan + aggregate execute twice
    // (PlanSpec q166 pins zero rescans)
    val obs = Stage.snapshotDF(events
      .select(col(keyCol).as("key"),
        (floor(unix_timestamp(col(tsCol)) / step) * step).as("bucket"),
        col(tsCol).as("__ts"), col(idCol).as("__id"), col(valCol).as("__v"))
      .groupBy("key", "bucket")
      .agg(max_by(col("__v"), struct(col("__ts"), col("__id"))).as("obs_value")))
    val grid = obs
      .groupBy("key")
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col("key"), explode(sequence(col("__lo"), col("__hi"), step)).as("bucket"))
    val locf = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        last(col("obs_value"), ignoreNulls = true).over(locf).as("value"),
        col("obs_value").isNull.as("is_gap"))
  }

  /** Two-sided CUSUM changepoint scores (Page 1954) per series.
    *
    * Standardizes `valCol` against the per-key mean/stddev, then runs the
    * classic recursions
    * {{{
    *   s⁺_t = max(0, s⁺_{t-1} + (z_t − slack))
    *   s⁻_t = max(0, s⁻_{t-1} − (z_t + slack))
    * }}}
    * and flags `alarm` when either side exceeds `threshold`. The max(0, ·)
    * recursion is NOT a window primitive, but it has a closed prefix form —
    * `s⁺_t = S_t − min(0, min_{j≤t} S_j)` where `S` is the running sum of
    * `(z − slack)` — so the whole operator is two stacked window passes over
    * ONE (key)-keyed sort: running sums, then running mins of those sums.
    * No recursion, no driver loop, no second shuffle.
    *
    * Determinism contract (the q141 per-layer rounding convention): the
    * per-key mean/stddev are whole-partition sums whose float summation
    * order is engine-specific, so both are rounded to 6 decimals BEFORE
    * standardizing; z is rounded to 6 likewise. Past that point every
    * number is produced by the window's fixed (ts, id) order, and the
    * emitted scores round to 2 — the q19 running-double-sum precision
    * contract (expanding-frame sums are tree-associated in some engines,
    * so sub-cent agreement is the proven cross-engine bar). A constant
    * series (stddev 0) yields null z/scores by design.
    *
    * Output: (key, id-ordered series columns, z, cusum_pos, cusum_neg,
    * alarm).
    */
  def cusum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      slack: Double = 0.5,
      threshold: Double = 4.0): DataFrame = {
    val byKey = Window.partitionBy("key")
    val stats = events
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(valCol).cast("double").as("__v"))
      .withColumn("__mu", round(avg("__v").over(byKey), 6))
      .withColumn("__sd", round(stddev_pop("__v").over(byKey), 6))
      // guarded: under Spark 4's ANSI default a bare /0.0 THROWS — the
      // when() short-circuits so a constant series yields null z (matching
      // DuckDB's null on double division by zero), per the doc contract
      .withColumn("z",
        when(col("__sd") > 0, round((col("__v") - col("__mu")) / col("__sd"), 6)))
    cusumFromZ(stats, slack, threshold)
  }

  /** [[cusum]] with FIXED reference mean/σ instead of per-key whole-series
    * estimates — the online form (the reference distribution is known up
    * front), and the batch twin the streaming operator
    * ([[graft.streaming.StreamingCusum]]) is spec-checked against: both
    * standardize against the same literals, so batch-over-history and
    * stream-over-arrivals produce the same scores.
    */
  def cusumWithParams(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      mu: Double,
      sd: Double,
      slack: Double = 0.5,
      threshold: Double = 4.0): DataFrame = {
    require(sd > 0, s"sd must be positive: $sd")
    val stats = events
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(valCol).cast("double").as("__v"))
      .withColumn("z", round((col("__v") - lit(mu)) / lit(sd), 6))
    cusumFromZ(stats, slack, threshold)
  }

  /** Shared window tail: z → running sums → running mins → rounded scores.
    * Expects (key, __ts, __id, z).
    */
  /** Per-key exponentially-weighted moving average with breach counting —
    * the EWMA control chart (the third member of the sequential-monitor
    * family: CUSUM drift [[cusum]], spike detection, and here smoothing +
    * deviation alarms):
    *
    *   ewma_1 = x_1;  ewma_t = α·x_t + (1−α)·ewma_{t−1}
    *
    * a breach is `|x_t − ewma_{t−1}| > threshold` (the point judged
    * against the PRE-update smoothed level). Emits per key: point count,
    * final EWMA (6-rounded), breach count.
    *
    * The fold is a per-key LEFT-TO-RIGHT `aggregate` over the (ts, id)-
    * sorted value sequence — init = first value, fold from the second —
    * element-for-element the recurrence's own order, which is also
    * exactly DuckDB's `list_reduce` contract, so the oracle replays the
    * identical IEEE operation sequence (the [[Similarity.cosSeq]]
    * determinism convention; a window-sum formulation would leave the
    * float combine order to the shuffle).
    *
    * Scale shape: one key-shuffle collecting each key's own sequence,
    * then a codegen'd higher-order fold per row — per-KEY memory, never
    * per-corpus; fine while a key's history fits an executor (events
    * fixture: hundreds/user). For unbounded histories the streaming twin
    * ([[graft.streaming.StreamingEwma]]) carries the same fold as two
    * words of state per key, incremental and infinite.
    */
  def ewma(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double, threshold: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(threshold > 0, s"need threshold > 0, got $threshold")
    val seq0 = array_sort(collect_list(struct(
      col(tsCol).as("t"), col(idCol).as("i"),
      col(valCol).cast("double").as("v"))))
    // acc/element share one shape (e = running ewma | value, b = breaches)
    // so the fold is list_reduce-replayable in the oracle
    val folded = expr(
      s"""aggregate(
            slice(transform(__seq, x -> struct(x.v AS e, 0L AS b)), 2, size(__seq) - 1),
            struct(element_at(__seq, 1).v AS e, 0L AS b),
            (acc, x) -> struct(
              ${alpha}D * x.e + ${1 - alpha}D * acc.e AS e,
              acc.b + if(abs(x.e - acc.e) > ${threshold}D, 1L, 0L) AS b))""")
    events
      .groupBy(col(keyCol))
      .agg(seq0.as("__seq"))
      .select(col(keyCol), size(col("__seq")).cast("long").as("n_points"),
        folded.as("__f"))
      .select(col(keyCol), col("n_points"),
        (round(col("__f.e"), 6) + lit(0.0)).as("ewma"),
        col("__f.b").as("n_breaches"))
  }

  /** Holt's linear-trend double exponential smoothing (Holt 1957) — the
    * two-state extension of [[ewma]] for series that DRIFT: level and
    * trend smoothed jointly, so the one-step forecast follows a ramp
    * instead of lagging it (single-EWMA's systematic bias on trending
    * series):
    *
    *   l_1 = x_1, b_1 = 0
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * Emits per key: point count, final level and trend, the one-step
    * forecast l+b, and the in-sample sum of squared one-step errors
    * (e_t = x_t − (l_{t−1}+b_{t−1})) — the fit-quality number that says
    * whether the trend model earned its second state over plain EWMA.
    *
    * Same fold contract and cost shape as [[ewma]]: one key-shuffle
    * collecting each key's (ts, id)-sorted sequence, then a codegen'd
    * left fold — per-KEY memory. `b_t` re-derives `l_t` with the
    * IDENTICAL sub-expression (same parenthesization both engines), the
    * determinism anchor the recursive-CTE oracle replays row by row.
    * Callers pass α/β with exact binary representations (0.25, 0.125)
    * so the literals are the same double cross-engine.
    */
  def holt(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta > 0 && beta <= 1, s"need 0 < beta <= 1, got $beta")
    val seq0 = array_sort(collect_list(struct(
      col(tsCol).as("t"), col(idCol).as("i"),
      col(valCol).cast("double").as("v"))))
    val lNew = s"${alpha}D * x + ${1 - alpha}D * (acc.l + acc.b)"
    val folded = expr(
      s"""aggregate(
            slice(transform(__seq, e -> e.v), 2, size(__seq) - 1),
            struct(element_at(__seq, 1).v AS l, 0D AS b, 0D AS s),
            (acc, x) -> struct(
              $lNew AS l,
              ${beta}D * (($lNew) - acc.l) + ${1 - beta}D * acc.b AS b,
              acc.s + (x - (acc.l + acc.b)) * (x - (acc.l + acc.b)) AS s))""")
    events
      .groupBy(col(keyCol))
      .agg(seq0.as("__seq"))
      .select(col(keyCol), size(col("__seq")).cast("long").as("n_points"),
        folded.as("__f"))
      .select(col(keyCol), col("n_points"),
        (round(col("__f.l"), 6) + lit(0.0)).as("level"),
        (round(col("__f.b"), 6) + lit(0.0)).as("trend"),
        (round(col("__f.l") + col("__f.b"), 6) + lit(0.0)).as("forecast"),
        (round(col("__f.s"), 6) + lit(0.0)).as("sse"))
  }

  /** Per-key ordinary-least-squares trend fit — y = a + b·(t − t₀) over
    * each key's series with t₀ the key's FIRST observation (so the
    * intercept is "fitted value at series start", a translation every
    * closed-form term survives exactly):
    *
    *   b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),  r² = (n·Σxy − ΣxΣy)² / (den_x·den_y)
    *
    * The monitor-family member for TREND (CUSUM detects level shifts,
    * EWMA/Holt smooth; this one answers "how fast is it moving and how
    * linear is it" in one pass).
    *
    * Exactness contract: x = whole SECONDS since the key's first point
    * (exact integer floor division of micros — identical both engines),
    * y folded to integer micros (the q148 convention); every sum and
    * every closed-form product/difference is the shared [[ExactCorr]]
    * DECIMAL(38,0) algebra — EXACT integers, immune to both the
    * shuffle's float combine order and the catastrophic cancellation
    * that kills naive nΣx²−(Σx)² on raw epoch x. Headroom ([[ExactCorr]]
    * contract): seconds-scaled x keeps the largest term n²·max(x,y6)²
    * under 10³⁸ up to ~10⁹ points per key over ~30-year spans — micros-x
    * would overflow (silent nulls / oracle error) near 10⁶ points. Only
    * the final divisions run in double, on identically-cast exact
    * operands; the raw slope is y-micros per second, emitted per day via
    * the exact-literal ·86400/10⁶ pair. The oracle replays the same
    * algebra in HUGEINT.
    *
    * One key-shuffle: the recentring window min and the sum aggregate
    * ride the same hash partitioning (AQE reuses the exchange).
    * Degenerate keys: zero x-variance (single point / one timestamp) →
    * null slope/intercept/r²; zero y-variance → slope 0 with null r².
    */
  def linearFit(
      events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val byKey = Window.partitionBy("__k")
    val base = events
      .select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__us"),
        floor(col(valCol).cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("__y"))
      .withColumn("__xr",
        expr("(__us - min(__us) OVER (PARTITION BY __k)) div 1000000"))
    val terms = ExactCorr.aggs(col("__xr").cast(ExactCorr.dec),
      col("__y").cast(ExactCorr.dec))
    val g = base.groupBy(col("__k")).agg(terms.head, terms.tail: _*)
    val (num, denX, denY) = (ExactCorr.num, ExactCorr.denX, ExactCorr.denY)
    val b = num / denX
    g.select(col("__k").as(keyCol), col("__m").cast("long").as("n_points"),
      when(col("__sxx") > 0 && denX > 0,
        round(b * lit(86400.0) / lit(1e6), 9) + lit(0.0)).as("slope_per_day"),
      when(col("__sxx") > 0 && denX > 0,
        round((col("__sy").cast("double") - b * col("__sx").cast("double")) /
          col("__m").cast("double") / lit(1e6), 6) + lit(0.0)).as("intercept"),
      when(col("__sxx") > 0 && denX > 0 && denY > 0,
        round((num / denX) * (num / denY), 6) + lit(0.0)).as("r2"))
  }

  /** Kaplan–Meier survival estimate (Kaplan & Meier 1958) over per-key
    * lifetimes with right censoring — the churn/retention curve q138's
    * fixed-offset cohort grid cannot express (KM uses every censored
    * lifetime's partial information instead of dropping incomplete
    * cohorts):
    *
    *   S(t) = Π_{tⱼ ≤ t} (1 − dⱼ/nⱼ)
    *
    * Lifetime = whole days between a key's first and last event (exact
    * integer micros division). A key CHURNS if its last event is more
    * than `horizonDays` before the observation cutoff (the global max
    * timestamp); otherwise it is right-censored at its observed
    * lifetime. One row per distinct lifetime day: at-risk count, churn
    * and censor counts, and the survival estimate after that day.
    *
    * Determinism: every count is exact; at-risk is a DESC integer
    * running sum (exact in any association); the survival product folds
    * SEQUENTIALLY in day order over the collected census — the census is
    * distinct-days-sized (≤ the observation span), the operator's
    * documented state bound, replayed row-by-row by the recursive-CTE
    * oracle (the q189 convention). Each factor (1 − d/n) is a division
    * of exact-integer doubles; survival rounds to 6 at emission.
    *
    * Cost: one key-shuffle (per-key min/max), a broadcast cutoff, a
    * days-sized census + fold. Censor-only days keep S flat but shrink
    * the risk set — the standard KM reading.
    */
  def kaplanMeier(
      events: DataFrame, keyCol: String, tsCol: String,
      horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"need horizonDays >= 0, got $horizonDays")
    val dayUs = 86400000000L
    val perKey = Stage.snapshotDF(events
      .groupBy(col(keyCol).as("__k"))
      .agg(min(unix_micros(col(tsCol))).as("__f"),
        max(unix_micros(col(tsCol))).as("__l")))
    val cutoff = perKey.agg(max("__l").as("__cut"))
    val census = perKey.crossJoin(broadcast(cutoff))
      .select(expr(s"(__l - __f) div $dayUs").as("day"),
        (col("__l") < col("__cut") - lit(horizonDays.toLong * dayUs)).as("__churned"))
      .groupBy("day")
      .agg(sum(when(col("__churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__churned"), 0L).otherwise(1L)).as("c"))
    // at-risk at day t = everyone whose lifetime reached t — a DESC
    // integer running sum over the days-sized census (bounded relation,
    // the q191 survivor-band contract)
    val atRisk = org.apache.spark.sql.expressions.Window.orderBy(col("day").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val seq0 = census
      .withColumn("n", sum(col("d") + col("c")).over(atRisk))
      .agg(sort_array(collect_list(struct(
        col("day").as("t"), col("n"), col("d"), col("c")))).as("__seq"))
    seq0
      .select(explode(expr(
        """aggregate(__seq,
             struct(1.0D AS s, cast(array() AS array<struct<t:bigint,n:bigint,d:bigint,c:bigint,s:double>>) AS out),
             (acc, x) -> struct(
               acc.s * (1.0D - cast(x.d AS double) / cast(x.n AS double)) AS s,
               concat(acc.out, array(struct(x.t AS t, x.n AS n, x.d AS d, x.c AS c,
                 acc.s * (1.0D - cast(x.d AS double) / cast(x.n AS double)) AS s))) AS out),
             acc -> acc.out)""")).as("r"))
      .select(col("r.t").as("day"), col("r.n").as("n_at_risk"),
        col("r.d").as("n_churned"), col("r.c").as("n_censored"),
        (round(col("r.s"), 6) + lit(0.0)).as("survival"))
  }

  /** Time-weighted linear interpolation of a series at arbitrary probe
    * instants — the as-of family's missing member (q22 latest-per-key,
    * q79/q149 nearest/backward/forward pick a NEIGHBOR; this blends the
    * two surrounding ones):
    *
    *   v(t) = v_prev + (v_next − v_prev) · (t − t_prev) / (t_next − t_prev)
    *
    * Strict interpolation: a probe before the key's first observation or
    * after its last yields null (no extrapolation — fabricating values
    * outside the observed range is a modeling decision, not a join). A
    * probe exactly ON an observation returns that observation via an
    * explicit t = t_prev branch — exact even when the observation is the
    * key's LAST point and no next neighbor exists; same-instant
    * observations all order before the probe, ties among them by `idCol`,
    * so "the" observation is deterministic.
    *
    * Shape: ONE key-shuffle — union probes into the series, tag them, and
    * resolve each probe's surrounding pair with two IGNORE-NULLS window
    * passes (last non-null before, first non-null after) over one
    * (ts, tag, id) sort — the resampleLocf cost model, no join at all.
    */
  def interpolateAt(
      series: DataFrame, probes: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame = {
    val pts = series.select(col(keyCol).as("__k"),
      col(tsCol).as("__ts"), col(idCol).as("__id"),
      col(valCol).cast("double").as("__v"), lit(0).as("__probe"))
    val prb = probes.select(col(keyCol).as("__k"),
      col(tsCol).as("__ts"), col(idCol).as("__id"),
      lit(null).cast("double").as("__v"), lit(1).as("__probe"))
    val order = Seq(col("__ts"), col("__probe"), col("__id"))
    val wPrev = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = unix_micros(col("__ts"))
    val tsd = when(col("__v").isNotNull, us).cast("double")
    pts.unionByName(prb)
      .withColumn("__vp", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__tp", last(tsd, ignoreNulls = true).over(wPrev))
      .withColumn("__vn", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__tn", first(tsd, ignoreNulls = true).over(wNext))
      .filter(col("__probe") === 1)
      .select(col("__k").as(keyCol), col("__id").as(idCol),
        col("__ts").as(tsCol),
        when(col("__vp").isNotNull && col("__tp") === us.cast("double"),
          col("__vp")) // exactly ON an observation — exact even at series end
          .when(col("__vp").isNotNull && col("__vn").isNotNull,
            col("__vp") + (col("__vn") - col("__vp")) *
              ((us.cast("double") - col("__tp")) / (col("__tn") - col("__tp"))))
          .as("interp"))
  }

  private def cusumFromZ(stats: DataFrame, slack: Double, threshold: Double): DataFrame = {
    val ordered = Window.partitionBy("key").orderBy("__ts", "__id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = stats
      .withColumn("__sp", sum(col("z") - lit(slack)).over(ordered))
      .withColumn("__sn", sum(-col("z") - lit(slack)).over(ordered))
    sums
      .withColumn("cusum_pos",
        round(col("__sp") - least(lit(0.0), min("__sp").over(ordered)), 2) + lit(0.0))
      .withColumn("cusum_neg",
        round(col("__sn") - least(lit(0.0), min("__sn").over(ordered)), 2) + lit(0.0))
      .withColumn("alarm",
        col("cusum_pos") > threshold || col("cusum_neg") > threshold)
      .select(col("key"), col("__ts").as("ts"), col("__id").as("id"),
        col("z"), col("cusum_pos"), col("cusum_neg"), col("alarm"))
  }

  /** Fano factor (index of dispersion) per key over fixed-interval event
    * counts: F = Var/Mean of the per-bucket counts — the burstiness
    * one-number (a Poisson arrival process scores ≈1; schedulers and
    * bots score ≪1, flash crowds ≫1), read before trusting a rate-based
    * capacity or sampling plan.
    *
    * Exactness: over the m buckets of the GLOBAL observed span (silent
    * buckets count as zeros — they are real observations of nothing),
    *   F = (m·Σc² − (Σc)²) / (m·Σc)
    * — exact integer sums in DECIMAL(38,0) (zeros contribute nothing to
    * either Σ, so only observed buckets are rows), one rounded double
    * division. One corpus aggregation to (key, bucket) counts; the span
    * is a 1-row broadcast scalar. Keys with zero events in span cannot
    * appear (no rows); a key with events but zero variance scores 0.
    */
  def fanoFactor(
      events: DataFrame, keyCol: String, tsCol: String,
      bucketMicros: Long = 3600000000L): DataFrame = {
    require(bucketMicros > 0, s"need bucketMicros > 0, got $bucketMicros")
    val dec = "decimal(38,0)"
    // a null timestamp would form a phantom bucket the span's max-min
    // never sees — outside the series by contract (the acf rule)
    val base = Stage.snapshotDF(events.select(col(keyCol).as("__k"),
      expr(s"unix_micros(`$tsCol`) div ${bucketMicros}L").as("__t"))
      .filter(col("__t").isNotNull))
    val span = base.agg((max("__t") - min("__t") + lit(1L)).as("__m"))
    val perBucket = base.groupBy("__k", "__t").agg(count(lit(1)).as("__c"))
    val cD = col("__c").cast(dec)
    perBucket.groupBy(col("__k"))
      .agg(sum(cD).as("__sc"), sum(cD * cD).as("__sc2"),
        count(lit(1)).as("n_active_buckets"))
      .crossJoin(broadcast(span))
      .select(col("__k").as(keyCol),
        col("__m").as("m_buckets"),
        col("__sc").cast("long").as("n_events"),
        col("n_active_buckets"),
        (round((col("__m").cast(dec) * col("__sc2") - col("__sc") * col("__sc"))
          .cast("double") /
          (col("__m").cast(dec) * col("__sc")).cast("double"), 6) + lit(0.0))
          .as("fano"))
  }

  /** Theil–Sen robust trend (Theil 1950, Sen 1968): per key the MEDIAN of
    * pairwise slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j — the trend
    * estimator with a 29% breakdown point where [[linearFit]]'s OLS is
    * dragged by a single corrupted batch. Axes are the q203 contract
    * (whole seconds since the key's first point, integer-micros y).
    *
    * The pair stage is quadratic per key, so it is CAPPED by a
    * deterministic rank-stride sample: points ordered by (x, y), every
    * ⌈k/maxPoints⌉-th kept — at most ~maxPoints²/2 pairs per key
    * regardless of key size, and the sample is a pure function of the
    * ordered series (a DEFINED approximation the oracle replays
    * verbatim, the q179 cap posture — under `maxPoints` points the
    * operator IS the exact full-pair median). Median selection orders by
    * the IEEE-division slope with an exact-integer (dy, dx, x, y)
    * tiebreak — identical doubles and identical total order both
    * engines; lower median at rank ⌊(n+1)/2⌋. Same-x pairs carry no
    * slope information and are excluded (the standard estimator);
    * keys with no valid pair emit a null slope, not a dropped row.
    */
  def theilSen(
      events: DataFrame, keyCol: String, tsCol: String, valCol: String,
      maxPoints: Int = 64): DataFrame = {
    require(maxPoints >= 2, s"need maxPoints >= 2, got $maxPoints")
    val byKey = Window.partitionBy("__k")
    val base = events
      .select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__us"),
        floor(col(valCol).cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("__y"))
      .filter(col("__us").isNotNull && col("__y").isNotNull)
      .withColumn("__xr",
        expr("(__us - min(__us) OVER (PARTITION BY __k)) div 1000000"))
      .select("__k", "__xr", "__y")
    val sampled = Stage.snapshotDF(base
      .withColumn("__rn", row_number().over(byKey.orderBy("__xr", "__y")))
      .withColumn("__cnt", count(lit(1)).over(byKey))
      .withColumn("__st", expr(s"(__cnt + ${maxPoints - 1}) div $maxPoints"))
      .filter((col("__rn") - 1) % col("__st") === 0)
      .select("__k", "__xr", "__y"))
    val np = sampled.groupBy(col("__k")).agg(count(lit(1)).as("n_points"))
    val pairs = sampled.as("a").join(sampled.as("b"),
        col("a.__k") === col("b.__k") && col("a.__xr") < col("b.__xr"))
      .select(col("a.__k").as("__k"),
        ((col("b.__y") - col("a.__y")).cast("double") /
          (col("b.__xr") - col("a.__xr")).cast("double")).as("__s"),
        (col("b.__y") - col("a.__y")).as("__dy"),
        (col("b.__xr") - col("a.__xr")).as("__dx"),
        col("a.__xr").as("__xa"), col("a.__y").as("__ya"))
    val med = pairs
      .withColumn("__pn", count(lit(1)).over(byKey))
      .withColumn("__pr", row_number().over(byKey.orderBy(
        col("__s"), col("__dy"), col("__dx"), col("__xa"), col("__ya"))))
      .filter(col("__pr") === expr("(__pn + 1) div 2"))
      .select(col("__k"), col("__s"), col("__pn").as("n_pairs"))
    np.join(med, Seq("__k"), "left")
      .select(col("__k").as(keyCol), col("n_points"), col("n_pairs"),
        (round(col("__s") * lit(86400.0) / lit(1e6), 6) + lit(0.0))
          .as("slope_per_day"))
  }

  /** Seasonal profile by classical decomposition (the 2×m centered
    * moving average of Kendall & Stuart): over a pre-aggregated integer
    * series on an integer instant axis, the per-phase (instant mod
    * `period`) mean deviation from the centered trend — "how much does
    * hour-18 run above trend" — the load-shaping/seasonality table read
    * before picking resample strides or staffing a scrape schedule.
    *
    * Exactness: for even m the 2×m MA at t has the exact integer
    * numerator N_t = x_{t−m/2} + 2·Σ_{t−m/2+1..t+m/2−1} x + x_{t+m/2}
    * over denominator 2m, so the additive deviation is the exact
    * rational (2m·x_t − N_t)/2m and the per-phase mean is
    * Σ(2m·x_t − N_t) / (2m·n_phase) — ALL integer arithmetic until one
    * final rounded double division, immune to combine order. RANGE
    * window frames on the instant give missing-instants-count-as-zero
    * semantics (a quiet hour is a zero, not a frame misalignment); edge
    * instants without a full ±m/2 window are excluded (partial-window
    * trend is biased, the no-silent-approximation stance).
    *
    * Scale shape: the caller aggregates the corpus to the series; the
    * three RANGE windows and the phase aggregation run on the
    * series-sized relation (one unpartitioned window over the aggregate
    * — the q177 plan contract, instants-bounded by the observation span,
    * never corpus-sized). Deviations are evaluated at OBSERVED instants:
    * an absent instant contributes zero to every trend window it spans
    * but no deviation row of its own — densify upstream if phase means
    * must count silent periods.
    */
  def seasonalProfile(
      series: DataFrame, instantCol: String, valCol: String,
      period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0, s"need even period >= 2, got $period")
    val h = period / 2
    val w = Window.orderBy("__t")
    // the series fans out to the window chain AND the span aggregate —
    // snapshot so the caller's corpus-sized groupBy executes once
    val s = Stage.snapshotDF(series.select(
      col(instantCol).cast("long").as("__t"),
      col(valCol).cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull))
    val span = s.agg(min("__t").as("__lo"), max("__t").as("__hi"))
    val inner = sum("__x").over(w.rangeBetween(-(h - 1), h - 1))
    val lo = sum("__x").over(w.rangeBetween(-h, -h))
    val hi = sum("__x").over(w.rangeBetween(h, h))
    s.withColumn("__n",
        coalesce(lo, lit(0L)) + lit(2L) * coalesce(inner, lit(0L)) +
          coalesce(hi, lit(0L)))
      .crossJoin(broadcast(span))
      .filter(col("__t") - h >= col("__lo") && col("__t") + h <= col("__hi"))
      .groupBy(pmod(col("__t"), lit(period.toLong)).as("phase"))
      .agg(count(lit(1)).as("n_points"),
        sum(lit(2L * period) * col("__x") - col("__n")).as("__dev"))
      .select(col("phase"), col("n_points"),
        (round(col("__dev").cast("double") /
          (lit(2.0 * period) * col("n_points").cast("double")), 6) + lit(0.0))
          .as("seasonal"))
      .orderBy("phase")
  }

  /** Autocorrelation function over a pre-aggregated integer series: for
    * each lag k ∈ [1, maxLag], the Pearson correlation between the
    * series and its calendar-shifted self (pairs (xₜ, xₜ₊ₖ) wherever
    * BOTH instants exist — gaps pair nothing, they don't realign the
    * series) — the seasonality/persistence diagnostic run before anyone
    * trusts a lag-based feature or picks a resample stride.
    *
    * Scale shape: the caller aggregates the corpus to the series (one
    * corpus-sized groupBy); everything here touches only series-sized
    * relations — one explode to maxLag lag keys, one (instant+k = instant)
    * equi-join, one [[ExactCorr]] aggregation per lag. The correlation
    * terms are the shared DECIMAL(38,0) exact algebra (the q203
    * contract: immune to shuffle combine order and to the catastrophic
    * cancellation in naive nΣx² − (Σx)²); only the final division and
    * the IEEE-correctly-rounded sqrt run in double, identically both
    * engines. Degenerate lags (under 2 pairs, or zero variance on either
    * leg — a constant series) emit null, not 1.0/NaN.
    *
    * `series` must carry an integer `instantCol` (epoch day, hour index —
    * any unit where "+k" means "k steps later") and an integer-scaled
    * `valCol` (the ExactCorr headroom contract: n²·max² < 10³⁸).
    */
  def acf(
      series: DataFrame, instantCol: String, valCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    // a null instant pairs nothing, but a null VALUE would skew the
    // ExactCorr m-vs-sums balance — both are outside the series by
    // contract
    val s = Stage.snapshotDF(series.select(
      col(instantCol).cast("long").as("__t"),
      col(valCol).cast(ExactCorr.dec).as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull))
    val lagged = s.withColumn("lag",
      explode(array((1 to maxLag).map(k => lit(k)): _*)))
    val pairs = lagged.as("a").join(s.as("b"),
        col("a.__t") + col("a.lag") === col("b.__t"))
      .select(col("a.lag"), col("a.__x").as("__xa"), col("b.__x").as("__xb"))
    val terms = ExactCorr.aggs(col("__xa"), col("__xb"))
    val g = pairs.groupBy(col("lag")).agg(terms.head, terms.tail: _*)
    val (num, denX, denY) = (ExactCorr.num, ExactCorr.denX, ExactCorr.denY)
    g.select(col("lag"), col("__m").cast("long").as("n_pairs"),
      when(col("__m") >= 2 && denX > 0 && denY > 0,
        round(num / sqrt(denX * denY), 6) + lit(0.0)).as("acf"))
      .orderBy("lag")
  }
}
