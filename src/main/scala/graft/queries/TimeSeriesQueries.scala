package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TimeSeries

/** Time-series reshaping surface ([[graft.operators.TimeSeries]]): dense
  * resampling with gap-fill and sequential changepoint detection over the
  * events stream — the "make a ragged event log a regular signal" step a
  * telemetry-driven training pipeline runs before windowed featurization.
  */
object TimeSeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q166 — hourly LOCF resample ([[TimeSeries.resampleLocf]]) of the event
    * `value` per event_type: last observation per (type, hour), dense
    * per-type hour grid, previous value carried into empty buckets,
    * `is_gap` marking the filled rows. Bucket keys stay BIGINT epoch
    * seconds end-to-end — no timestamp re-materialization, so the result
    * schema is tz-free on both engines. `value` passes through untouched
    * (no arithmetic → no rounding contract).
    */
  def q166_gapfill_locf: Q = (s, dir) => {
    TimeSeries.resampleLocf(Tables.events(s, dir),
        keyCol = "event_type", tsCol = "ts", idCol = "event_id",
        valCol = "value", bucketSeconds = 3600L)
      .select(col("key").as("event_type"), col("bucket"), col("value"), col("is_gap"))
      .orderBy("event_type", "bucket")
  }

  /** q169 — two-sided CUSUM changepoint scores ([[TimeSeries.cusum]]) per
    * event_type over the (ts, event_id)-ordered value series, slack 0.5σ,
    * alarm at 4σ. The oracle replays the same prefix-sum-minus-running-min
    * closed form; mean/σ/z round to 6 before the order-fixed window pass
    * and the scores round to 2 (the q19 running-double-sum precision bar).
    */
  def q169_cusum: Q = (s, dir) => {
    TimeSeries.cusum(Tables.events(s, dir),
        keyCol = "event_type", tsCol = "ts", idCol = "event_id",
        valCol = "value", slack = 0.5, threshold = 4.0)
      .select(col("key").as("event_type"), col("id").as("event_id"),
        col("z"), col("cusum_pos"), col("cusum_neg"), col("alarm"))
      .orderBy("event_type", "event_id")
  }

  /** q189 — per-user EWMA control chart ([[TimeSeries.ewma]]): smoothing
    * recursion over each user's (ts, event_id)-ordered value series,
    * α = 0.25, breach when a point deviates from the pre-update smoothed
    * level by > 1.5. The oracle replays the identical left fold with
    * DuckDB `list_reduce` (init = first element, fold from the second —
    * the same IEEE operation sequence), so the final EWMA matches
    * bit-for-bit before the 6-rounding. Streaming twin:
    * [[graft.streaming.StreamingEwma]] (same fold, two words of state).
    */
  def q189_ewma: Q = (s, dir) => {
    TimeSeries.ewma(Tables.events(s, dir),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        valCol = "value", alpha = 0.25, threshold = 1.5)
      .orderBy("user_id")
  }

  /** q193 — time-weighted interpolation ([[TimeSeries.interpolateAt]]):
    * per user, each purchase instant's linearly-interpolated click value
    * from the two surrounding clicks — the as-of blend q149's
    * nearest-neighbor pick cannot express. Strict (null outside the
    * observed range), exact on an observation instant, one key-shuffle
    * union-window, no join.
    */
  def q193_time_interp: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    TimeSeries.interpolateAt(
        series = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id", "value"),
        probes = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id"),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        valCol = "value")
      .select(col("event_id"), col("user_id"),
        (round(col("interp"), 6) + lit(0.0)).as("interp"))
      .orderBy("event_id")
  }

  /** q198 — Holt linear-trend smoothing ([[TimeSeries.holt]]) per user
    * over the (ts, event_id)-ordered value series, α = 0.25, β = 0.125
    * (exact binary literals — the cross-engine double contract): final
    * level/trend, one-step forecast, and in-sample SSE. The two-state
    * sibling of q189's EWMA; the oracle replays the identical recurrence
    * (including the duplicated l_t sub-expression inside b_t) as a
    * recursive CTE advancing every key one step per iteration.
    */
  def q198_holt_trend: Q = (s, dir) => {
    TimeSeries.holt(Tables.events(s, dir),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        valCol = "value", alpha = 0.25, beta = 0.125)
      .orderBy("user_id")
  }

  /** q203 — per-key OLS trend fit ([[TimeSeries.linearFit]]): slope per
    * day, intercept at series start, and r² of each event type's value
    * series. Every closed-form term is exact DECIMAL(38,0) integer
    * algebra on seconds-x/micros-y axes (the oracle replays it in HUGEINT);
    * only the two final divisions run in double.
    */
  def q203_linear_fit: Q = (s, dir) => {
    TimeSeries.linearFit(Tables.events(s, dir),
        keyCol = "event_type", tsCol = "ts", valCol = "value")
      .orderBy("event_type")
  }

  /** q213 — Kaplan–Meier user survival ([[TimeSeries.kaplanMeier]]):
    * per lifetime-day the risk set, churn/censor counts, and S(t) — a
    * user churns when quiet for > 14 days before the global cutoff,
    * otherwise right-censored. The oracle replays the sequential
    * survival product as a recursive CTE over the day census.
    */
  def q213_kaplan_meier: Q = (s, dir) => {
    TimeSeries.kaplanMeier(Tables.events(s, dir),
        keyCol = "user_id", tsCol = "ts", horizonDays = 14)
      .orderBy("day")
  }

  /** q222 — autocorrelation function ([[TimeSeries.acf]]) of daily order
    * revenue at lags 1–7 days: the weekly-seasonality/persistence
    * diagnostic over the exact-cents daily series. One corpus-sized
    * groupBy builds the series; the lag pairing and the exact
    * DECIMAL(38,0) correlation algebra run on the days-sized relation
    * only. Calendar lags: a missing day pairs nothing — it does not
    * realign the series.
    */
  def q222_acf: Q = (s, dir) => {
    val daily = Tables.orders(s, dir)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).as("day"))
      .agg(sum((col("o_totalprice") * lit(100)).cast("long")).as("cents"))
    TimeSeries.acf(daily, "day", "cents", maxLag = 7)
  }

  /** q226 — hour-of-day seasonal profile ([[TimeSeries.seasonalProfile]]):
    * per-phase mean deviation of hourly event counts from the 2×24
    * centered moving-average trend — exact integer numerators end to
    * end, one rounded division per phase. The trend windows are RANGE
    * frames on the hour index (quiet hours count as zero); edge hours
    * without a full ±12 window are excluded.
    */
  def q226_seasonal: Q = (s, dir) => {
    val hourly = Tables.events(s, dir)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    TimeSeries.seasonalProfile(hourly, "hour", "cnt", period = 24)
  }

  /** q227 — Theil–Sen robust slope ([[TimeSeries.theilSen]]) per event
    * type: the median-of-pairwise-slopes trend beside q203's OLS — the
    * robust/classical pair on the same seconds/micros axes. The
    * quadratic pair stage is capped at 64 rank-stride points per key (a
    * defined approximation the oracle replays; exact under 64 points);
    * median selection on the IEEE slope with an exact-integer tiebreak.
    */
  def q227_theil_sen: Q = (s, dir) => {
    TimeSeries.theilSen(Tables.events(s, dir),
        keyCol = "event_type", tsCol = "ts", valCol = "value", maxPoints = 64)
      .orderBy("event_type")
  }

  /** q233 — burstiness census ([[TimeSeries.fanoFactor]]): per event
    * type the Fano factor of hourly arrival counts over the global
    * observed span (silent hours are zeros) — Poisson ≈ 1, schedulers
    * ≪ 1, flash crowds ≫ 1. Exact DECIMAL sums, one rounded division.
    */
  def q233_fano: Q = (s, dir) => {
    TimeSeries.fanoFactor(Tables.events(s, dir),
        keyCol = "event_type", tsCol = "ts")
      .orderBy("event_type")
  }

  /** q250 — daily new-vs-returning census: per day the active users,
    * the NEW users (first-seen that day — one min-per-user aggregate, no
    * window), and returning = active − new; the growth/retention
    * headline every product log answers first. Two user-keyed
    * aggregations, one broadcast-size day join, all-integer output.
    */
  def q250_new_vs_returning: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val active = ev.distinct()
      .groupBy("day").agg(count(lit(1)).as("active_users"))
    val fresh = ev.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    active.join(fresh, Seq("day"), "left")
      .select(col("day"), col("active_users"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        (col("active_users") - coalesce(col("new_users"), lit(0L)))
          .as("returning_users"))
      .orderBy("day")
  }

  /** q251 — signup→purchase time-to-convert percentiles: per user the
    * first signup and the first LATER purchase (conversions only), the
    * whole-hour delay, then EXACT p50/p90/p99 of the delay via
    * [[graft.operators.Checks.exactPercentiles]] — funnel latency as a
    * contractual number, not a sketch. Two min-aggregates on the user
    * key; the percentile machinery runs on the conversions-sized
    * relation.
    */
  def q251_time_to_convert: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    def firstOf(t: String, as: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as(as))
    val delays = firstOf("signup", "__s")
      .join(firstOf("purchase", "__p"), "user_id")
      .filter(col("__p") > col("__s"))
      .select(lit("all").as("cohort"),
        expr("(__p - __s) div 3600000000").as("hours"))
    graft.operators.Checks.exactPercentiles(delays, "cohort", "hours",
      Seq(50, 90, 99))
  }

  val all: Map[String, Q] = Map(
    "q222_acf" -> q222_acf,
    "q250_new_vs_returning" -> q250_new_vs_returning,
    "q251_time_to_convert" -> q251_time_to_convert,
    "q226_seasonal" -> q226_seasonal,
    "q227_theil_sen" -> q227_theil_sen,
    "q233_fano" -> q233_fano,
    "q166_gapfill_locf" -> q166_gapfill_locf,
    "q213_kaplan_meier" -> q213_kaplan_meier,
    "q203_linear_fit" -> q203_linear_fit,
    "q198_holt_trend" -> q198_holt_trend,
    "q169_cusum" -> q169_cusum,
    "q189_ewma" -> q189_ewma,
    "q193_time_interp" -> q193_time_interp)

  val oracle: Map[String, String] = Map(
    // first-seen via one min-per-user aggregate; integer day buckets
    "q250_new_vs_returning" -> """
      WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                  FROM events),
      act AS (SELECT day, CAST(count(1) AS BIGINT) AS active_users
              FROM (SELECT DISTINCT user_id, day FROM ev) GROUP BY 1),
      fr AS (SELECT day, CAST(count(1) AS BIGINT) AS new_users FROM
               (SELECT user_id, min(day) AS day FROM ev GROUP BY 1)
             GROUP BY 1)
      SELECT act.day, active_users,
             coalesce(new_users, 0) AS new_users,
             active_users - coalesce(new_users, 0) AS returning_users
      FROM act LEFT JOIN fr USING (day)
      ORDER BY 1""",
    // two first-event aggregates, conversions only, exact rank rule on
    // the whole-hour delays
    "q251_time_to_convert" -> """
      WITH s AS (SELECT user_id, min(epoch_us(ts)) AS su FROM events
                 WHERE event_type = 'signup' GROUP BY 1),
      p AS (SELECT user_id, min(epoch_us(ts)) AS pu FROM events
            WHERE event_type = 'purchase' GROUP BY 1),
      d AS (SELECT 'all' AS cohort, (pu - su) // 3600000000 AS h
            FROM s JOIN p USING (user_id) WHERE pu > su),
      c AS (SELECT cohort, h, CAST(count(1) AS BIGINT) AS c FROM d GROUP BY 1, 2),
      w AS (SELECT cohort, h,
                   sum(c) OVER (PARTITION BY cohort ORDER BY h
                     ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER (PARTITION BY cohort) AS n
            FROM c)
      SELECT cohort, CAST(max(n) AS BIGINT) AS n_rows,
             CAST(min(CASE WHEN cum * 100 >= n * 50 THEN h END) AS BIGINT) AS p50,
             CAST(min(CASE WHEN cum * 100 >= n * 90 THEN h END) AS BIGINT) AS p90,
             CAST(min(CASE WHEN cum * 100 >= n * 99 THEN h END) AS BIGINT) AS p99
      FROM w GROUP BY 1""",
    // exact integer (m·Σc² − Σc²)/(m·Σc) over the global hour span;
    // silent hours enter only through m
    "q233_fano" -> """
      WITH b AS (SELECT event_type AS k, epoch_us(ts) // 3600000000 AS t
                 FROM events),
      sp AS (SELECT max(t) - min(t) + 1 AS m FROM b),
      c AS (SELECT k, t, CAST(count(1) AS HUGEINT) AS c FROM b GROUP BY 1, 2),
      g AS (SELECT k, sum(c) AS sc, sum(c * c) AS sc2,
                   CAST(count(1) AS BIGINT) AS n_active_buckets
            FROM c GROUP BY 1)
      SELECT k AS event_type, CAST(m AS BIGINT) AS m_buckets,
             CAST(sc AS BIGINT) AS n_events, n_active_buckets,
             round(CAST(m * sc2 - sc * sc AS DOUBLE) /
               CAST(m * sc AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS fano
      FROM g CROSS JOIN sp ORDER BY 1""",
    // rank-stride sample and lower-median pick replayed verbatim; the
    // slope ORDER BY uses the IEEE-division double with exact-integer
    // tiebreaks, identical both engines
    "q227_theil_sen" -> """
      WITH b AS (
        SELECT event_type AS k, epoch_us(ts) AS us,
               CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS y
        FROM events),
      r AS (SELECT k, (us - min(us) OVER (PARTITION BY k)) // 1000000 AS xr, y
            FROM b),
      w AS (SELECT k, xr, y,
                   row_number() OVER (PARTITION BY k ORDER BY xr, y) AS rn,
                   count(1) OVER (PARTITION BY k) AS cnt
            FROM r),
      s AS MATERIALIZED (
        SELECT k, xr, y FROM w WHERE (rn - 1) % ((cnt + 63) // 64) = 0),
      np AS (SELECT k, CAST(count(1) AS BIGINT) AS n_points FROM s GROUP BY 1),
      p AS (SELECT a.k AS k,
                   CAST(b2.y - a.y AS DOUBLE) / CAST(b2.xr - a.xr AS DOUBLE) AS sl,
                   b2.y - a.y AS dy, b2.xr - a.xr AS dx,
                   a.xr AS xa, a.y AS ya
            FROM s a JOIN s b2 ON a.k = b2.k AND a.xr < b2.xr),
      m AS (SELECT k, sl,
                   row_number() OVER (PARTITION BY k
                     ORDER BY sl, dy, dx, xa, ya) AS pr,
                   count(1) OVER (PARTITION BY k) AS pn
            FROM p),
      med AS (SELECT k, sl, CAST(pn AS BIGINT) AS n_pairs
              FROM m WHERE pr = (pn + 1) // 2)
      SELECT np.k AS event_type, np.n_points, med.n_pairs,
             round(med.sl * CAST(86400 AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS slope_per_day
      FROM np LEFT JOIN med USING (k)
      ORDER BY 1""",
    // exact integer 2×24-MA numerators via RANGE frames (absent hours
    // are zeros, not misalignments); one rounded division per phase
    "q226_seasonal" -> """
      WITH hourly AS MATERIALIZED (
        SELECT epoch_us(ts) // 3600000000 AS t, CAST(count(1) AS BIGINT) AS x
        FROM events GROUP BY 1),
      sp AS (SELECT min(t) AS lo, max(t) AS hi FROM hourly),
      tr AS (SELECT t, x,
               coalesce(sum(x) OVER (ORDER BY t
                 RANGE BETWEEN 12 PRECEDING AND 12 PRECEDING), 0)
               + 2 * coalesce(sum(x) OVER (ORDER BY t
                 RANGE BETWEEN 11 PRECEDING AND 11 FOLLOWING), 0)
               + coalesce(sum(x) OVER (ORDER BY t
                 RANGE BETWEEN 12 FOLLOWING AND 12 FOLLOWING), 0) AS n
             FROM hourly),
      d AS (SELECT t % 24 AS phase, 48 * x - n AS dev
            FROM tr CROSS JOIN sp WHERE t - 12 >= lo AND t + 12 <= hi)
      SELECT CAST(phase AS BIGINT) AS phase,
             CAST(count(1) AS BIGINT) AS n_points,
             round(CAST(sum(dev) AS DOUBLE) / (48.0 * count(1)), 6)
               + CAST(0 AS DOUBLE) AS seasonal
      FROM d GROUP BY 1 ORDER BY 1""",
    // the q203 HUGEINT replay of the ExactCorr algebra; calendar-lag
    // pairing (a.t + lag = b.t), sqrt/division in double at the end only
    "q222_acf" -> """
      WITH daily AS MATERIALIZED (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS t,
               CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS HUGEINT) AS x
        FROM orders GROUP BY 1),
      l AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
      p AS (SELECT l.lag AS lag, a.x AS xa, b.x AS xb
            FROM daily a CROSS JOIN l
            JOIN daily b ON a.t + l.lag = b.t),
      g AS (SELECT lag, CAST(count(1) AS HUGEINT) AS m,
                   sum(xa) AS sx, sum(xb) AS sy, sum(xa * xb) AS sxy,
                   sum(xa * xa) AS sxx, sum(xb * xb) AS syy
            FROM p GROUP BY 1),
      t AS (SELECT lag, m,
                   CAST(m * sxy - sx * sy AS DOUBLE) AS num,
                   CAST(m * sxx - sx * sx AS DOUBLE) AS den_x,
                   CAST(m * syy - sy * sy AS DOUBLE) AS den_y
            FROM g)
      SELECT CAST(lag AS INTEGER) AS lag, CAST(m AS BIGINT) AS n_pairs,
             CASE WHEN m >= 2 AND den_x > 0 AND den_y > 0 THEN
               round(num / sqrt(den_x * den_y), 6) + CAST(0 AS DOUBLE)
             END AS acf
      FROM t ORDER BY 1""",
    // exact integer lifetimes/counts; DESC-sum risk set; the survival
    // product replayed row-by-row (q189 recursive-walk convention)
    "q213_kaplan_meier" -> """
      WITH RECURSIVE pu AS (
        SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
        FROM events GROUP BY 1),
      cut AS (SELECT max(l) AS m FROM pu),
      life AS (SELECT (l - f) // 86400000000 AS day,
                      l < m - CAST(14 AS BIGINT) * 86400000000 AS churned
               FROM pu, cut),
      census AS (SELECT day,
                        CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
                        CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS c
                 FROM life GROUP BY 1),
      ar AS (SELECT day, d, c,
                    CAST(sum(d + c) OVER (ORDER BY day DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
                    row_number() OVER (ORDER BY day ASC) AS rn
             FROM census),
      walk(rn, day, n, d, c, s) AS (
        SELECT rn, day, n, d, c,
               CAST(1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
        FROM ar WHERE rn = 1
        UNION ALL
        SELECT a.rn, a.day, a.n, a.d, a.c,
               w.s * (CAST(1 AS DOUBLE) - CAST(a.d AS DOUBLE) / CAST(a.n AS DOUBLE))
        FROM walk w JOIN ar a ON a.rn = w.rn + 1)
      SELECT day, n AS n_at_risk, d AS n_churned, c AS n_censored,
             round(s, 6) + CAST(0 AS DOUBLE) AS survival
      FROM walk ORDER BY day""",
    // the identical integer algebra in HUGEINT: micros axes, recentred x,
    // exact n·Σxy − ΣxΣy / n·Σx² − (Σx)² terms, double only at the final
    // divisions (same parenthesization: b·86400, (Σy − b·Σx)/n/1e6,
    // (num/denX)·(num/denY))
    "q203_linear_fit" -> """
      WITH b AS (
        SELECT event_type AS k, epoch_us(ts) AS x,
               CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS y
        FROM events),
      r AS (SELECT k, (x - min(x) OVER (PARTITION BY k)) // 1000000 AS xr, y FROM b),
      g AS (SELECT k, CAST(count(1) AS HUGEINT) AS n,
                   sum(CAST(xr AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(xr AS HUGEINT) * xr) AS sxx,
                   sum(CAST(xr AS HUGEINT) * y) AS sxy,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM r GROUP BY 1),
      t AS (SELECT k, n, sx, sy, sxx,
                   CAST(n * sxy - sx * sy AS DOUBLE) AS num,
                   CAST(n * sxx - sx * sx AS DOUBLE) AS den_x,
                   CAST(n * syy - sy * sy AS DOUBLE) AS den_y
            FROM g)
      SELECT k AS event_type, CAST(n AS BIGINT) AS n_points,
             CASE WHEN sxx > 0 AND den_x > 0 THEN
               round(num / den_x * CAST(86400 AS DOUBLE)
                 / CAST(1000000 AS DOUBLE), 9) + CAST(0 AS DOUBLE)
             END AS slope_per_day,
             CASE WHEN sxx > 0 AND den_x > 0 THEN
               round((CAST(sy AS DOUBLE) - num / den_x * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE)
             END AS intercept,
             CASE WHEN sxx > 0 AND den_x > 0 AND den_y > 0 THEN
               round((num / den_x) * (num / den_y), 6) + CAST(0 AS DOUBLE)
             END AS r2
      FROM t ORDER BY 1""",
    "q166_gapfill_locf" -> """
      WITH obs AS (
        SELECT event_type AS key,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
               value,
               row_number() OVER (
                 PARTITION BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      o1 AS (SELECT key, bucket, value AS obs_value FROM obs WHERE rn = 1),
      grid AS (SELECT key, unnest(generate_series(lo, hi, CAST(3600 AS BIGINT))) AS bucket
               FROM (SELECT key, min(bucket) AS lo, max(bucket) AS hi
                     FROM o1 GROUP BY 1) b)
      SELECT g.key AS event_type, g.bucket,
             last_value(o.obs_value IGNORE NULLS) OVER (
               PARTITION BY g.key ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
             o.obs_value IS NULL AS is_gap
      FROM grid g LEFT JOIN o1 o ON g.key = o.key AND g.bucket = o.bucket
      ORDER BY 1, 2""",
    // identical union-window derivation with the same (ts, probe, id)
    // tie order and the same parenthesization of the blend
    "q193_time_interp" -> """
      WITH u AS (
        SELECT user_id AS k, ts, event_id AS id, CAST(value AS DOUBLE) AS v,
               0 AS probe
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, NULL, 1
        FROM events WHERE event_type = 'purchase'),
      w AS (
        SELECT k, ts, id, probe,
          last_value(v IGNORE NULLS) OVER wp AS vp,
          last_value(CASE WHEN v IS NOT NULL
                          THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
            OVER wp AS tp,
          first_value(v IGNORE NULLS) OVER wn AS vn,
          first_value(CASE WHEN v IS NOT NULL
                           THEN CAST(epoch_us(ts) AS DOUBLE) END IGNORE NULLS)
            OVER wn AS tn
        FROM u
        WINDOW wp AS (PARTITION BY k ORDER BY ts, probe, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY k ORDER BY ts, probe, id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT id AS event_id, k AS user_id,
             round(CASE WHEN vp IS NOT NULL
                          AND tp = CAST(epoch_us(ts) AS DOUBLE) THEN vp
                        WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
                          vp + (vn - vp) *
                          ((CAST(epoch_us(ts) AS DOUBLE) - tp) / (tn - tp))
                   END, 6) + CAST(0 AS DOUBLE) AS interp
      FROM w WHERE probe = 1 ORDER BY 1""",
    // the same left fold, replayed ROW BY ROW as a recursive CTE — the
    // breadth-first recursion advances every key one (ts, id)-ordered
    // step per iteration, exactly the recurrence's own IEEE order.
    // Deliberately NOT list_reduce: DuckDB 1.0's vectorized list_reduce
    // mis-evaluates cross-field reads in struct accumulators on longer
    // lists (the breach test against acc.e sees the ALREADY-UPDATED e —
    // off by one whenever only the pre-update deviation clears the
    // threshold; single-step folds evaluate pre-update, so the bug is
    // length-dependent)
    // the q189 recursive-CTE convention with the two-state Holt walk;
    // b's update re-derives l_t with the IDENTICAL parenthesization the
    // Spark fold uses, so every intermediate double matches bit-for-bit
    "q198_holt_trend" -> """
      WITH RECURSIVE pts AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      npts AS (SELECT user_id, max(rn) AS m FROM pts GROUP BY 1),
      walk(user_id, rn, l, b, s) AS (
        SELECT user_id, 1, v, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
        FROM pts WHERE rn = 1
        UNION ALL
        SELECT p.user_id, w.rn + 1,
               CAST(0.25 AS DOUBLE) * p.v
                 + CAST(0.75 AS DOUBLE) * (w.l + w.b),
               CAST(0.125 AS DOUBLE) * ((CAST(0.25 AS DOUBLE) * p.v
                 + CAST(0.75 AS DOUBLE) * (w.l + w.b)) - w.l)
                 + CAST(0.875 AS DOUBLE) * w.b,
               w.s + (p.v - (w.l + w.b)) * (p.v - (w.l + w.b))
        FROM walk w JOIN pts p
          ON p.user_id = w.user_id AND p.rn = w.rn + 1)
      SELECT w.user_id, CAST(n.m AS BIGINT) AS n_points,
             round(w.l, 6) + CAST(0 AS DOUBLE) AS level,
             round(w.b, 6) + CAST(0 AS DOUBLE) AS trend,
             round(w.l + w.b, 6) + CAST(0 AS DOUBLE) AS forecast,
             round(w.s, 6) + CAST(0 AS DOUBLE) AS sse
      FROM walk w JOIN npts n ON w.user_id = n.user_id AND w.rn = n.m
      ORDER BY w.user_id""",
    "q189_ewma" -> """
      WITH RECURSIVE pts AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      npts AS (SELECT user_id, max(rn) AS m FROM pts GROUP BY 1),
      walk(user_id, rn, e, b) AS (
        SELECT user_id, 1, v, CAST(0 AS BIGINT) FROM pts WHERE rn = 1
        UNION ALL
        SELECT p.user_id, w.rn + 1,
               CAST(0.25 AS DOUBLE) * p.v + CAST(0.75 AS DOUBLE) * w.e,
               w.b + CASE WHEN abs(p.v - w.e) > CAST(1.5 AS DOUBLE)
                          THEN 1 ELSE 0 END
        FROM walk w JOIN pts p
          ON p.user_id = w.user_id AND p.rn = w.rn + 1)
      SELECT w.user_id, CAST(n.m AS BIGINT) AS n_points,
             round(w.e, 6) + CAST(0 AS DOUBLE) AS ewma,
             CAST(w.b AS BIGINT) AS n_breaches
      FROM walk w JOIN npts n ON w.user_id = n.user_id AND w.rn = n.m
      ORDER BY w.user_id""",
    "q169_cusum" -> """
      WITH s AS (
        SELECT event_type AS key, ts, event_id AS id, value,
               round(avg(value) OVER (PARTITION BY event_type), 6) AS mu,
               round(stddev_pop(value) OVER (PARTITION BY event_type), 6) AS sd
        FROM events),
      z AS (SELECT key, ts, id, round((value - mu) / sd, 6) AS z FROM s),
      su AS (SELECT key, ts, id, z,
               sum(z - CAST(0.5 AS DOUBLE)) OVER w AS sp,
               sum(-z - CAST(0.5 AS DOUBLE)) OVER w AS sn
             FROM z
             WINDOW w AS (PARTITION BY key ORDER BY ts, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      c AS (SELECT key, id, z,
              round(sp - least(CAST(0 AS DOUBLE), min(sp) OVER w2), 2) + CAST(0 AS DOUBLE) AS cusum_pos,
              round(sn - least(CAST(0 AS DOUBLE), min(sn) OVER w2), 2) + CAST(0 AS DOUBLE) AS cusum_neg
            FROM su
            WINDOW w2 AS (PARTITION BY key ORDER BY ts, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT key AS event_type, id AS event_id, z, cusum_pos, cusum_neg,
             (cusum_pos > CAST(4 AS DOUBLE) OR cusum_neg > CAST(4 AS DOUBLE)) AS alarm
      FROM c ORDER BY event_type, event_id""")
}
