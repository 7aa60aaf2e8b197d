package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Sessionize}

/** Third relational batch: reshaping (pivot/unpivot), statistical
  * aggregates, argmax selection, histogram bucketing, and edit distance.
  *
  * Skewness/kurtosis oracles are written as explicit central-moment
  * formulas: Spark implements the population definitions (m3/m2^1.5,
  * m4/m2²−3) while DuckDB's builtins apply sample corrections — the oracle
  * must encode Spark's definition, not call DuckDB's builtin.
  */
object RelationalQueries3 {

  type Q = (SparkSession, String) => DataFrame

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q39 — pivot: events reshaped wide, one count column per event type per
    * day. The pivot values are DECLARED (not discovered) — at 100 TB the
    * two-pass "collect distinct values first" pivot is a full extra scan.
    */
  def q39_pivot: Q = (s, dir) => {
    val wide = Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
    wide.orderBy("day")
  }

  /** q67 — unpivot/melt: lineitem measures to long form, aggregated per
    * (returnflag, metric). Spark's `unpivot` is a zero-shuffle row expansion.
    */
  def q67_unpivot: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n"),
           round(sum("val"), 2).as("sum_val"),
           round(avg("val"), 4).as("avg_val"))
      .orderBy("l_returnflag", "metric")
  }

  /** q68 — statistical aggregates: correlation, covariance (sample +
    * population), stddev, and population skewness/kurtosis of lineitem
    * measures per return flag. All single-pass partial-aggregable — the
    * 100 TB shape is one hash aggregate, no second scan.
    */
  def q68_stats: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covs_qp"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covp_qp"),
        round(stddev_samp("l_quantity"), 4).as("sds_qty"),
        round(stddev_pop("l_quantity"), 4).as("sdp_qty"),
        // + 0.0 collapses IEEE negative zero: a tiny negative skewness rounds
        // to -0.0 in one engine and 0.0 in the other, breaking the hash
        (round(skewness(col("l_quantity")), 4) + 0.0).as("skew_qty"),
        (round(kurtosis(col("l_quantity")), 4) + 0.0).as("kurt_qty"))
      .orderBy("l_returnflag")
  }

  /** q69 — argmax selection: per nation, the supplier with the highest
    * account balance via max_by/arg_max. The ordering key is a zero-padded
    * `balance|suppkey` string — lexicographic order equals (balance,
    * suppkey) order after offsetting the balance positive, so the key stays
    * total and balance-monotone at ANY supplier count (a scaled-sum numeric
    * key breaks once the key range reaches the balance granularity × scale).
    */
  def q69_argmax: Q = (s, dir) => {
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    // s_acctbal >= -999.99 in TPC-H; +100000 keeps the padded string positive
    val ordKey = format_string("%015.2f|%012d", col("s_acctbal") + 100000, col("s_suppkey"))
    sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        max_by(col("s_name"), ordKey).as("top_supplier"),
        round(max("s_acctbal"), 2).as("top_bal"),
        min_by(col("s_name"), ordKey).as("bottom_supplier"))
      .orderBy("n_name")
  }

  /** q72 — fixed-width histogram of order totals: 10 equal buckets between
    * the observed min/max (computed in the same job as a broadcast 1-row
    * aggregate; DuckDB 1.0 has no width_bucket so both sides use the
    * explicit formula).
    */
  def q72_histogram: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val bounds = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(floor((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")) * 10), lit(9.0))
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("bucket")
  }

  /** q73 — edit distance: Levenshtein between part name and type
    * strings, aggregated per brand (identical unit-cost dynamic program in
    * both engines).
    */
  def q73_levenshtein: Q = (s, dir) => {
    Tables.part(s, dir)
      .withColumn("d", levenshtein(col("p_name"), col("p_type")))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
           round(avg("d"), 4).as("avg_dist"),
           min("d").cast("long").as("min_dist"),
           max("d").cast("long").as("max_dist"))
      .orderBy("p_brand")
  }

  /** q74 — Jaro-Winkler fuzzy similarity (native `JaroWinkler` codegen
    * Expression — Spark has no builtin; semantics pinned to the oracle
    * engine's, see StringKernels). Same rollup shape as q73 so the two
    * string-distance kernels are directly comparable.
    */
  def q74_jaro_winkler: Q = (s, dir) => {
    Tables.part(s, dir)
      .withColumn("jw", graft.functions.StringFunctions.jaroWinkler(col("p_name"), col("p_type")))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
           round(avg("jw"), 4).as("avg_jw"),
           round(min("jw"), 4).as("min_jw"),
           round(max("jw"), 4).as("max_jw"))
      .orderBy("p_brand")
  }

  /** q75 — top-k per group via the native `TopKAgg`
    * TypedImperativeAggregate: each map task reduces to ≤ k pairs per group
    * BEFORE the shuffle (partial aggregation), unlike the window
    * row_number() form (q07) which shuffles and sorts every row. Same
    * result, 100 TB-viable wire cost. Oracle = the window formulation.
    */
  def q75_topk_agg: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(graft.functions.TopKFunctions.topK(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
              col("t.payload").as("o_orderkey"),
              round(col("t.ord"), 2).as("o_totalprice"))
      .orderBy("o_orderpriority", "rnk")
  }

  /** q79 — as-of join (pandas merge_asof / DuckDB ASOF JOIN shape, an
    * operator Spark lacks): click→purchase attribution — for each purchase
    * event, the most recent click by the same user at-or-before it, within
    * 24 h. Composed as union-tag + one (key, time)-sorted running window
    * (AsOfJoin.join) — sort-merge-join cost, no quadratic range join.
    */
  def q79_asof_join: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    AsOfJoin.join(
        left = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id"),
        right = ev.filter(col("event_type") === "click").select("user_id", "ts", "event_id"),
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        rightIdCol = "event_id", toleranceMs = Some(86400000L))
      .select(col("event_id"), col("asof_right_id"), col("asof_lag_ms"))
      .orderBy("event_id")
  }

  /** q149 — NEAREST as-of join ([[AsOfJoin.joinNearest]], pandas
    * merge_asof direction='nearest'): per purchase, the click by the same
    * user closest in time (either direction) within 6 h, ties resolved
    * backward. Both traversals (backward carry + forward carry) run over
    * ONE unioned, key-partitioned relation — two sorts, a single exchange
    * (AsOfJoinSpec pins it) — and the pick is a map-side comparison; the
    * oracle is the naive |Δt| argmin over the quadratic BETWEEN join with
    * the same tie chain, cross-engine proof of the traversal composition.
    */
  def q149_asof_nearest: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    AsOfJoin.joinNearest(
        left = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id"),
        right = ev.filter(col("event_type") === "click").select("user_id", "ts", "event_id"),
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        rightIdCol = "event_id", toleranceMs = Some(21600000L))
      .select(col("event_id"), col("asof_right_id"), col("asof_signed_lag_ms"))
      .orderBy("event_id")
  }

  /** q136 — time-BINNED interval join ([[Sessionize.binnedIntervalJoin]]):
    * per purchase, the COUNT of same-user clicks in the trailing hour —
    * q79's as-of picks the single latest antecedent, this keeps the whole
    * trailing window. The binned form turns the range join into an
    * equi-join on (user, time-bin) with a 2-bin probe expansion (the q93
    * multi-probe trick on the time axis): hash-shuffle cost, where the
    * naive `BETWEEN` formulation is a BroadcastNestedLoopJoin that
    * enumerates every same-user pair at 100 TB. The oracle IS that naive
    * BETWEEN form — cross-engine proof the binning is exactness-preserving.
    */
  def q136_interval_join: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    Sessionize.binnedIntervalJoin(
        probe = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        build = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id", windowMs = 3600000L)
      .groupBy("event_id")
      .agg(count(col("__b_ts")).as("n_clicks"))
      .orderBy("event_id")
  }

  /** q137 — ordered funnel (signup → click → purchase): per user the
    * earliest stage-completion chain with strict temporal ordering (each
    * stage's earliest event AFTER the previous stage's completion), rolled
    * up to stage conversion counts and the mean signup→purchase latency of
    * completers. Three stage-filtered min-aggregations chained by
    * broadcast-friendly user-key joins — each stage shuffles only its own
    * event-type slice keyed by user, never a window over the whole log, so
    * the funnel costs three type-pruned scans at 100 TB (event_type is the
    * natural partition column there). The strict `>` makes a click before
    * the signup not count — order matters, which is what distinguishes a
    * funnel from three independent counts.
    */
  def q137_funnel: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    def stage(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"), col("ts"))
    val s1 = stage("signup").groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stage("click").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = stage("purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_clicked"),
        count(col("t3")).as("n_purchased"),
        round(avg((unix_micros(col("t3")) - unix_micros(col("t1"))).cast("double")), 4)
          .as("avg_funnel_us"))
  }

  /** q138 — cohort retention: users grouped by the DAY of their first
    * event (the cohort), tracked by distinct-active-user counts at each
    * day offset since joining — the classic retention triangle. One
    * min-aggregation per user (the cohort assignment) joined back to the
    * log on the user key, then one (cohort, offset) count-distinct; at
    * 100 TB the cohort relation is |users| rows (broadcast- or
    * bucket-joinable) and nothing windows over the whole log. Offsets
    * are capped to the first week and cohorts to the first 5 days
    * RELATIVE to the log's own earliest cohort (a broadcast scalar —
    * never a hard-coded date, the regeneration-brittleness class that
    * broke the events suite in round 10), keeping the retention triangle
    * bounded regardless of log span.
    */
  def q138_cohort_retention: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    // snapshot: the per-user min-aggregation feeds the base scalar AND the
    // cohort filter (the fan-out rule) — without the barrier the events
    // scan + shuffle compiles into the plan twice
    val cohortAll = ev.groupBy("user_id")
      .agg(to_date(min("ts")).as("cohort_day"))
      .transform(graft.operators.Stage.snapshotDF)
    val base = cohortAll.agg(min("cohort_day").as("base_day"))
    val cohort = cohortAll.crossJoin(broadcast(base))
      .filter(col("cohort_day") <= date_add(col("base_day"), 4))
      .drop("base_day")
    ev.join(cohort, "user_id")
      .withColumn("day_offset",
        datediff(to_date(col("ts")), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 6)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q139 — DAU/WAU stickiness: per day, the distinct active users that
    * day over the distinct actives of the trailing 7 days. Sliding
    * DISTINCT counts don't compose from per-day partials, so the trailing
    * window is computed by exploding each (user, day) activity row into
    * the ≤ 7 observation days it contributes to — a BOUNDED ×7 map-side
    * expansion into one (day)-keyed distinct aggregation, the q136
    * bin-expansion trick on the time axis — never a 7-day window over the
    * raw log (which cannot dedup users) nor a per-day self-join fan-out.
    * Days are only reported where the log has activity (the DAU side).
    */
  def q139_stickiness: Q = (s, dir) => {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .transform(graft.operators.Stage.snapshotDF) // feeds DAU and WAU
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** q142 — time-decayed activity weights: per user, Σ exp(−age/τ) over
    * their events with τ = 7 days, anchored at the log's own max timestamp
    * (a broadcast scalar — never a wall-clock `now()`, which would be both
    * non-deterministic and the regeneration-brittle class of r10). The
    * exponential-decay sum is the recency-weighted sampling weight a
    * training-mix pipeline uses to tilt toward fresh data — and unlike a
    * sliding window it needs NO window machinery: decay against a fixed
    * anchor is one map-side `exp` into an ordinary per-user hash
    * aggregation, partial-aggregable, shuffling one row per user. Age is
    * computed in exact integer microseconds before the single double
    * division, so both engines exponentiate the same doubles.
    */
  def q142_time_decay: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val anchor = ev.agg(max(unix_micros(col("ts"))).as("ref_us"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("w",
        exp(-((col("ref_us") - unix_micros(col("ts"))).cast("double") / lit(6.048e11))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           round(sum("w"), 4).as("decay_weight"),
           max(to_date(col("ts"))).as("last_day"))
      .orderBy("user_id")
  }

  /** q145 — per-group z-score outlier gate over event values: per
    * event_type, the count and share of events beyond 3σ and the maximum
    * |z|. The two-pass shape (tiny per-group moment aggregate, broadcast
    * back, map-side z) is the 100 TB form — never a window over the log.
    * Values are quantized to exact integer cents BEFORE the moment sums
    * (explicit floor-half-up, the q58 convention): the sums become exact
    * integers, so μ, σ, and every per-row z are bit-identical across
    * engines and across ANY summation order — a gate that flags different
    * rows run-to-run is not a gate. (At 100 TB the cents·cents sums
    * approach 2⁵³: shard the moment aggregation per day/partition and sum
    * the exact partials, same contract.)
    */
  /** q174 — robust MAD outlier gate, the heavy-tail-safe complement to
    * q145's z-score (one wild value inflates mean AND σ, masking its own
    * outlierness; median/MAD don't budge). Values quantize to exact cents
    * (the q145/q58 convention) so median interpolation — the average of
    * two ≤ 2^53 integers, exact in double — is bit-identical cross-engine
    * and the 4.4478·MAD (= 3σ-equivalent · 1.4826) boundary can't flip on
    * a ulp. Two key-sized aggregates + two broadcast joins; the event
    * relation streams through twice, never shuffles on anything but the
    * 5-key type column.
    */
  def q174_mad_outliers: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v2"))
      .transform(graft.operators.Stage.snapshotDF) // feeds med, dev, AND flags
    val med = ev.groupBy("event_type")
      .agg(percentile(col("v2"), lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v2") - col("med")).as("d"))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("d"), lit(0.5)).as("mad"))
    ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("v2") - col("med")) > lit(4.4478) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first(col("med")) / 100, 6).as("median"),
        round(first(col("mad")) / 100, 6).as("mad"))
      .orderBy("event_type")
  }

  def q145_zscore_outliers: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v6"))
    val st = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("v6").cast("double").as("s1"),
      sum(col("v6") * col("v6")).cast("double").as("sq"))
    ev.join(broadcast(st), "event_type")
      .withColumn("mu", col("s1") / col("n"))
      .withColumn("sigma",
        sqrt((col("sq") - col("s1") * col("s1") / col("n")) / (col("n") - 1)))
      .withColumn("z", abs((col("v6") - col("mu")) / col("sigma")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("z") > 3.0, 1L).otherwise(0L)).as("n_outliers"),
           round(sum(when(col("z") > 3.0, 1L).otherwise(0L)).cast("double")
                 / count(lit(1)), 6).as("outlier_share"),
           round(max("z"), 4).as("max_abs_z"))
      .orderBy("event_type")
  }

  /** q147 — event-rate spike detection: per (event_type, day), today's
    * count against the mean DAILY count of the 7 PRECEDING days, flagging
    * ratios above 2× — the operational anomaly gate over an ingest log.
    * The trailing baseline reuses q139's bounded-expansion trick: each
    * (type, day, n) row contributes its count to the ≤ 7 following
    * observation days via one map-side ×7 explode into a keyed SUM — counts
    * (unlike q139's DISTINCT users) sum associatively, so the whole
    * baseline is exact integer arithmetic, no log-wide window, no per-day
    * self-join. Days with no 7-day history (the log's first day per type)
    * are reported with a null baseline and never flagged.
    */
  def q147_spike_detection: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.operators.Stage.snapshotDF) // feeds obs AND baseline
    val base = daily
      .select(col("event_type"), col("n"),
        explode(sequence(date_add(col("day"), 1), date_add(col("day"), 7))).as("day"))
      .groupBy("event_type", "day")
      .agg(sum("n").as("base_n"), count(lit(1)).as("base_days"))
    daily.join(base, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("n"),
        round(col("base_n").cast("double") / col("base_days"), 4).as("trailing_avg"),
        round(col("n") * col("base_days").cast("double") / col("base_n"), 4).as("ratio"),
        (col("n") * col("base_days") > col("base_n") * 2).as("spike"))
      .orderBy("event_type", "day")
  }

  /** q152 — session path mining: the top-10 three-step event-type paths
    * users take WITHIN a session (q57's 12 h-gap sessions) — the
    * navigation-pattern summary behind funnel design. The path window
    * partitions by USER (not (user, session)) and guards session
    * boundaries by also leading session_id: session_id is monotone in the
    * (ts, event_id) order, so the path window shares the sessionization
    * windows' exact partitioning AND sort — Catalyst evaluates lag,
    * running-sum, and the three leads in ONE shuffle + one sort, where a
    * (user, session)-keyed window would add a second exchange for
    * nothing.
    */
  def q152_session_paths: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sess = graft.operators.Sessionize.assign(
      Tables.events(s, dir).select("user_id", "event_id", "ts", "event_type"),
      "user_id", "ts", "event_id", 43200000L)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    sess
      .withColumn("e1", lead(col("event_type"), 1).over(w))
      .withColumn("e2", lead(col("event_type"), 2).over(w))
      .withColumn("s1", lead(col("session_id"), 1).over(w))
      .withColumn("s2", lead(col("session_id"), 2).over(w))
      .filter(col("s1") === col("session_id") && col("s2") === col("session_id"))
      .select(concat_ws(">", col("event_type"), col("e1"), col("e2")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(10)
  }

  /** q156 — SCD type-2 fold ([[graft.operators.Scd.fold]]): the event log
    * treated as a change stream of each user's current `event_type`, folded
    * into validity intervals `[valid_from, valid_to)`; summarized per
    * attribute value (interval counts, open rows, closed-interval
    * milliseconds) so the result stays aggregate-sized at any SF while the
    * fold itself runs over the full log. Change-point filter and
    * interval-closing `lead` share one (user, (ts, id)) window — one
    * shuffle. The incremental contract (`merge(fold(prefix), suffix) ≡
    * fold(log)`) is pinned in IncrementalSpec; the reference's type-1
    * overwrite sink (`ingester/es_common.py` index/update) loses exactly
    * the history this keeps.
    */
  def q156_scd2: Q = (s, dir) => {
    val dim = graft.operators.Scd.fold(
      Tables.events(s, dir).select("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
    graft.operators.Scd.summary(dim, "event_type", unix_millis)
  }

  /** q87 — distribution window functions (percent_rank, cume_dist):
    * per-priority price percentile positions, completing the rank family
    * of q28. Same single (partition, order) sort serves both functions.
    */
  def q87_percent_rank: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("pr", round(percent_rank().over(w), 4))
      .withColumn("cd", round(cume_dist().over(w), 4))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("pr"), col("cd"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** q177 — equi-depth histogram via `ntile`: decile buckets of order
    * value per priority (unique (price, key) sort → deterministic bucket
    * assignment in both engines), summarized to per-bucket count/bounds —
    * the equal-POPULATION complement to q72's fixed-width histogram, and
    * the missing member of the ranking-window family (rank/percent_rank/
    * cume_dist live in q28/q87). One exchange: the ntile window and the
    * bucket aggregate share the priority key.
    */
  def q177_ntile_equidepth: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      // cast: Spark ntile yields INT, DuckDB's BIGINT — align for the
      // schema-sensitive compare
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("o_orderpriority", "decile")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"))
      .orderBy("o_orderpriority", "decile")
  }

  val all: Map[String, Q] = Map(
    "q39_pivot" -> q39_pivot,
    "q177_ntile_equidepth" -> q177_ntile_equidepth,
    "q74_jaro_winkler" -> q74_jaro_winkler,
    "q75_topk_agg" -> q75_topk_agg,
    "q79_asof_join" -> q79_asof_join,
    "q136_interval_join" -> q136_interval_join,
    "q137_funnel" -> q137_funnel,
    "q138_cohort_retention" -> q138_cohort_retention,
    "q139_stickiness" -> q139_stickiness,
    "q142_time_decay" -> q142_time_decay,
    "q145_zscore_outliers" -> q145_zscore_outliers,
    "q147_spike_detection" -> q147_spike_detection,
    "q149_asof_nearest" -> q149_asof_nearest,
    "q174_mad_outliers" -> q174_mad_outliers,
    "q152_session_paths" -> q152_session_paths,
    "q156_scd2" -> q156_scd2,
    "q87_percent_rank" -> q87_percent_rank,
    "q67_unpivot" -> q67_unpivot,
    "q68_stats" -> q68_stats,
    "q69_argmax" -> q69_argmax,
    "q72_histogram" -> q72_histogram,
    "q73_levenshtein" -> q73_levenshtein)

  val oracle: Map[String, String] = Map(
    "q156_scd2" -> """
      WITH o AS (SELECT user_id, ts, event_id, event_type,
                        lag(event_type) OVER w AS prev,
                        row_number() OVER w AS rn
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      c AS (SELECT user_id, ts, event_id, event_type FROM o
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      d AS (SELECT event_type, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS valid_to
            FROM c)
      SELECT event_type, count(1) AS n_intervals,
             CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_open,
             CAST(sum(CASE WHEN valid_to IS NOT NULL
                           THEN epoch_ms(valid_to) - epoch_ms(valid_from) END)
               AS BIGINT) AS closed_ms
      FROM d GROUP BY 1 ORDER BY 1""",
    "q152_session_paths" -> """
      WITH o AS (SELECT user_id, event_id, ts, event_type,
                        lag(epoch_ms(ts)) OVER w AS prev
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      b AS (SELECT *, CASE WHEN prev IS NULL OR epoch_ms(ts) - prev > 43200000
                           THEN 1 ELSE 0 END AS brk FROM o),
      s AS (SELECT user_id, event_id, ts, event_type,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM b),
      p AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2
                   || '>' || lead(event_type, 2) OVER w2 AS path,
                   sid, lead(sid, 1) OVER w2 AS s1, lead(sid, 2) OVER w2 AS s2
            FROM s
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT path, count(1) AS n FROM p
      WHERE s1 = sid AND s2 = sid
      GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 10""",
    "q149_asof_nearest" -> """
      WITH p AS (SELECT user_id, epoch_ms(ts) AS t, event_id FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_ms(ts) AS rt, event_id AS rid FROM events
            WHERE event_type = 'click'),
      cand AS (SELECT p.event_id, c.rid, p.t, c.rt
               FROM p JOIN c ON p.user_id = c.user_id
                AND abs(p.t - c.rt) <= 21600000),
      r AS (SELECT event_id, rid, t - rt AS slag,
                   row_number() OVER (PARTITION BY event_id ORDER BY
                     abs(t - rt),
                     CASE WHEN rt <= t THEN 0 ELSE 1 END,
                     CASE WHEN rt <= t THEN -rid ELSE rid END) AS rn
            FROM cand)
      SELECT p.event_id, r.rid AS asof_right_id, r.slag AS asof_signed_lag_ms
      FROM p LEFT JOIN r ON p.event_id = r.event_id AND r.rn = 1
      ORDER BY p.event_id""",
    "q177_ntile_equidepth" -> """
      SELECT o_orderpriority, decile, count(1) AS n,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM (SELECT o_orderpriority, o_totalprice,
                   ntile(10) OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
            FROM orders) t
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q174_mad_outliers" -> """
      WITH ev AS (SELECT event_type,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
                  FROM events),
      med AS (SELECT event_type, quantile_cont(v2, 0.5) AS med FROM ev GROUP BY 1),
      mad AS (SELECT e.event_type, quantile_cont(abs(e.v2 - m.med), 0.5) AS mad
              FROM ev e JOIN med m USING (event_type) GROUP BY 1)
      SELECT e.event_type, count(1) AS n_events,
             CAST(sum(CASE WHEN abs(e.v2 - m.med) > CAST(4.4478 AS DOUBLE) * d.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             round(any_value(m.med) / 100, 6) AS median,
             round(any_value(d.mad) / 100, 6) AS mad
      FROM ev e JOIN med m USING (event_type) JOIN mad d USING (event_type)
      GROUP BY 1 ORDER BY 1""",
    "q147_spike_detection" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(1) AS n
                     FROM events GROUP BY 1, 2),
      base AS (SELECT o.event_type, o.day,
                      sum(d.n) AS base_n, count(1) AS base_days
               FROM daily o JOIN daily d
                 ON d.event_type = o.event_type
                AND d.day BETWEEN o.day - 7 AND o.day - 1
               GROUP BY 1, 2)
      SELECT dl.event_type, dl.day, dl.n,
             round(CAST(b.base_n AS DOUBLE) / b.base_days, 4) AS trailing_avg,
             round(dl.n * CAST(b.base_days AS DOUBLE) / b.base_n, 4) AS ratio,
             dl.n * b.base_days > b.base_n * 2 AS spike
      FROM daily dl LEFT JOIN base b USING (event_type, day)
      ORDER BY 1, 2""",
    "q145_zscore_outliers" -> """
      WITH ev AS (SELECT event_type,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v6 FROM events),
      st AS (SELECT event_type, count(1) AS n,
                    CAST(sum(v6) AS DOUBLE) AS s1,
                    CAST(sum(v6 * v6) AS DOUBLE) AS sq
             FROM ev GROUP BY 1),
      z AS (SELECT ev.event_type,
                   abs((ev.v6 - st.s1 / st.n)
                       / sqrt((st.sq - st.s1 * st.s1 / st.n) / (st.n - 1))) AS z
            FROM ev JOIN st USING (event_type))
      SELECT event_type, count(1) AS n_events,
             CAST(sum(CASE WHEN z > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             round(CAST(sum(CASE WHEN z > 3.0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(1), 6) AS outlier_share,
             round(max(z), 4) AS max_abs_z
      FROM z GROUP BY 1 ORDER BY 1""",
    "q142_time_decay" -> """
      WITH a AS (SELECT max(epoch_us(ts)) AS ref_us FROM events)
      SELECT user_id, count(1) AS n_events,
             round(sum(exp(-(CAST(a.ref_us - epoch_us(ts) AS DOUBLE)
                             / 604800000000.0))), 4) AS decay_weight,
             max(CAST(ts AS DATE)) AS last_day
      FROM events CROSS JOIN a
      GROUP BY 1 ORDER BY 1""",
    "q139_stickiness" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
      wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
              FROM dau d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
              GROUP BY 1)
      SELECT d.day, d.dau, w.wau, round(d.dau * 1.0 / w.wau, 4) AS stickiness
      FROM dau d JOIN wau w USING (day) ORDER BY 1""",
    "q138_cohort_retention" -> """
      WITH c AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
                 FROM events GROUP BY 1),
      b AS (SELECT min(cohort_day) AS base_day FROM c),
      cc AS (SELECT c.user_id, c.cohort_day FROM c, b
             WHERE c.cohort_day <= b.base_day + 4)
      SELECT cc.cohort_day,
             datediff('day', cc.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
             count(DISTINCT e.user_id) AS n_active
      FROM events e JOIN cc ON e.user_id = cc.user_id
      WHERE datediff('day', cc.cohort_day, CAST(e.ts AS DATE)) <= 6
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q137_funnel" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT count(s1.t1) AS n_signup,
             count(s2.t2) AS n_clicked,
             count(s3.t3) AS n_purchased,
             round(avg(epoch_us(s3.t3) - epoch_us(s1.t1)), 4) AS avg_funnel_us
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""",
    "q136_interval_join" -> """
      WITH p AS (SELECT event_id, user_id, ts AS p_ts FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
      SELECT p.event_id, count(c.c_ts) AS n_clicks
      FROM p LEFT JOIN c
        ON p.user_id = c.user_id
       AND c.c_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts
      GROUP BY 1 ORDER BY 1""",
    "q87_percent_rank" -> """
      SELECT o_orderpriority, o_orderkey,
             round(percent_rank() OVER w, 4) AS pr,
             round(cume_dist() OVER w, 4) AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice ASC, o_orderkey ASC)
      QUALIFY o_orderkey % 100 = 0
      ORDER BY o_orderpriority, o_orderkey""",
    "q79_asof_join" -> """
      WITH l AS (SELECT user_id AS k, epoch_ms(ts) AS t, 1 AS side,
                        CAST(NULL AS BIGINT) AS rid, CAST(NULL AS BIGINT) AS rt, event_id
                 FROM events WHERE event_type = 'purchase'),
      r AS (SELECT user_id AS k, epoch_ms(ts) AS t, 0 AS side,
                   event_id AS rid, epoch_ms(ts) AS rt, CAST(NULL AS BIGINT) AS event_id
            FROM events WHERE event_type = 'click'),
      u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
      c AS (SELECT *,
              last_value(rid IGNORE NULLS) OVER w AS arid,
              last_value(rt IGNORE NULLS) OVER w AS art
            FROM u
            WINDOW w AS (PARTITION BY k ORDER BY t, side, rid NULLS LAST
                         ROWS UNBOUNDED PRECEDING))
      SELECT event_id,
             CASE WHEN art IS NOT NULL AND t - art <= 86400000 THEN arid END AS asof_right_id,
             CASE WHEN art IS NOT NULL AND t - art <= 86400000 THEN t - art END AS asof_lag_ms
      FROM c WHERE side = 1 ORDER BY event_id""",
    "q75_topk_agg" -> """
      SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
             round(o_totalprice, 2) AS o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
            FROM orders)
      WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",
    "q74_jaro_winkler" -> """
      SELECT p_brand, count(1) AS n,
             round(avg(jaro_winkler_similarity(p_name, p_type)), 4) AS avg_jw,
             round(min(jaro_winkler_similarity(p_name, p_type)), 4) AS min_jw,
             round(max(jaro_winkler_similarity(p_name, p_type)), 4) AS max_jw
      FROM part GROUP BY 1 ORDER BY 1""",
    "q39_pivot" -> """
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(1) FILTER (event_type = 'click') AS click,
             count(1) FILTER (event_type = 'error') AS error,
             count(1) FILTER (event_type = 'purchase') AS purchase,
             count(1) FILTER (event_type = 'signup') AS signup,
             count(1) FILTER (event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY 1""",
    "q67_unpivot" -> """
      WITH m AS (
        SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      SELECT l_returnflag, metric, count(1) AS n,
             round(sum(val), 2) AS sum_val, round(avg(val), 4) AS avg_val
      FROM m GROUP BY 1, 2 ORDER BY 1, 2""",
    "q68_stats" -> """
      WITH mu AS (
        SELECT l_returnflag, avg(l_quantity) AS mq FROM lineitem GROUP BY 1),
      mom AS (
        SELECT l.l_returnflag,
               avg((l_quantity - mq) * (l_quantity - mq)) AS m2,
               avg((l_quantity - mq) * (l_quantity - mq) * (l_quantity - mq)) AS m3,
               avg((l_quantity - mq) * (l_quantity - mq) * (l_quantity - mq) * (l_quantity - mq)) AS m4
        FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        GROUP BY 1)
      SELECT b.l_returnflag,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             round(covar_samp(l_quantity, l_extendedprice), 2) AS covs_qp,
             round(covar_pop(l_quantity, l_extendedprice), 2) AS covp_qp,
             round(stddev_samp(l_quantity), 4) AS sds_qty,
             round(stddev_pop(l_quantity), 4) AS sdp_qty,
             round(any_value(m3) / pow(any_value(m2), 1.5), 4) + 0.0 AS skew_qty,
             round(any_value(m4) / pow(any_value(m2), 2) - 3.0, 4) + 0.0 AS kurt_qty
      FROM lineitem b JOIN mom ON b.l_returnflag = mom.l_returnflag
      GROUP BY 1 ORDER BY 1""",
    "q69_argmax" -> """
      SELECT n_name,
             arg_max(s_name, printf('%015.2f|%012d', s_acctbal + 100000, s_suppkey)) AS top_supplier,
             round(max(s_acctbal), 2) AS top_bal,
             arg_min(s_name, printf('%015.2f|%012d', s_acctbal + 100000, s_suppkey)) AS bottom_supplier
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",
    "q72_histogram" -> """
      WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
      SELECT CAST(least(floor((o_totalprice - lo) / (hi - lo) * 10), 9.0) AS BIGINT) AS bucket,
             count(1) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders CROSS JOIN b
      GROUP BY 1 ORDER BY 1""",
    "q73_levenshtein" -> """
      SELECT p_brand, count(1) AS n,
             round(avg(levenshtein(p_name, p_type)), 4) AS avg_dist,
             CAST(min(levenshtein(p_name, p_type)) AS BIGINT) AS min_dist,
             CAST(max(levenshtein(p_name, p_type)) AS BIGINT) AS max_dist
      FROM part GROUP BY 1 ORDER BY 1""")
}
