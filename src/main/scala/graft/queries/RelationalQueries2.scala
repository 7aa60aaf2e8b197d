package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational batch: map-typed columns (X1's canonical generator
  * input), exact math functions, LIKE/regexp predicates, correlated
  * aggregates, CASE/NULL handling, ordered string aggregation.
  *
  * Math functions are restricted to IEEE-exact ops (sqrt/abs/ceil/floor/mod)
  * — ln/exp/pow go through libm and can differ in the last ulp between
  * engines, which a hash compare would amplify.
  */
object RelationalQueries2 {

  type Q = (SparkSession, String) => DataFrame

  /** q18 — X1 canonical: a map column (entity-index → value, the reference's
    * `entities` shape, `ingester/nlp_service.py:106`) exploded into
    * per-entry rows via map_entries.
    */
  def q18_map_explode: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("m", map(
        lit("type"), col("event_type"),
        lit("k"), get_json_object(col("props"), "$.k")))
      .select(explode(map_entries(col("m"))).as("e"))
      .select(col("e.key").as("mkey"), col("e.value").as("mval"))
      .groupBy("mkey")
      .agg(count(lit(1)).as("n"), countDistinct("mval").as("n_distinct"))
      .orderBy("mkey")
  }

  /** q23 — exact math functions over lineitem. */
  def q23_math_funcs: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(sum(sqrt(col("l_quantity"))), 2).as("sum_sqrt_qty"),
        round(sum(abs(col("l_discount") - 0.05)), 4).as("sum_abs_disc"),
        sum(ceil(col("l_tax") * 100)).cast("long").as("sum_ceil_tax"),
        sum(floor(col("l_quantity"))).cast("long").as("sum_floor_qty"),
        sum(col("l_orderkey") % 7).cast("long").as("sum_mod7"),
        round(max(greatest(col("l_discount"), col("l_tax"))), 4).as("max_rate"))
      .orderBy("l_returnflag")
  }

  /** q24 — LIKE and regexp predicates pushed over part. */
  def q24_like_regexp: Q = (s, dir) => {
    Tables.part(s, dir)
      .filter(col("p_name").like("%ol%") && col("p_type").rlike("^(ECONOMY|PROMO|S)"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 4).as("avg_price"))
      .orderBy("p_brand")
  }

  /** q25 — correlated aggregate (TPC-H Q17 shape): lineitems under half
    * their part's average quantity. The correlated subquery decorrelates to
    * an aggregate + join — written directly in that shape so the plan is
    * explicit.
    */
  def q25_correlated_agg: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(avg("l_quantity").as("avg_qty"))
    l.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"),
           count(lit(1)).as("n_rows"))
  }

  /** q26 — CASE / NULL handling: banded totals with nullif/coalesce. */
  def q26_case_null: Q = (s, dir) => {
    Tables.orders(s, dir)
      .withColumn("band",
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low"))
      .withColumn("status_or_na", coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NA")))
      .groupBy("band", "status_or_na")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("band", "status_or_na")
  }

  /** q27 — ordered string aggregation (deterministic listagg). */
  def q27_string_agg: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
        countDistinct("o_orderstatus").as("n_statuses"))
      .orderBy("o_orderpriority")
  }

  /** q28 — rank-family window functions (rank/dense_rank/lead/ntile) with a
    * total order so ties and frames hash deterministically.
    */
  def q28_rank_funcs: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1, -1L).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .filter(col("rnk") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"),
              col("rnk").cast("long").as("rnk"), col("drnk").cast("long").as("drnk"),
              col("next_key"), col("quartile").cast("long").as("quartile"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** q35 — exact continuous percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`: linear interpolation on the sorted values). The
    * approximate twin (`percentile_approx`, the 100 TB path) is spec-checked
    * against these exact values in QueriesSpec.
    */
  def q35_percentile: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
      .orderBy("l_returnflag")
  }

  /** q36 — NULL semantics: count(col) vs count(*), aggregates skipping
    * nulls, null-keyed grouping (nulls form their own group in both
    * engines).
    */
  def q36_null_handling: Q = (s, dir) => {
    Tables.orders(s, dir)
      .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("P")))
      .groupBy("maybe_status")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("maybe_status")).as("n_nonnull"),
        round(sum(when(col("maybe_status").isNull, col("o_totalprice"))), 2).as("null_sum"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .select(coalesce(col("maybe_status"), lit("<null>")).as("maybe_status"),
        col("n_rows"), col("n_nonnull"),
        coalesce(col("null_sum"), lit(0.0)).as("null_sum"), col("avg_price"))
      .orderBy("maybe_status")
  }

  /** q37 — RANGE window frame: per-user rolling 1-hour sum over event TIME
    * (value-based frame, not row count) — the event-time analog of a
    * sliding window expressed as a window frame.
    */
  def q37_range_frame: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, 0L)
    Tables.events(s, dir)
      .withColumn("rolling_1h", round(sum("value").over(w), 2))
      .filter(col("user_id") < 3)
      .select(col("user_id"), col("event_id"), col("rolling_1h"))
      .orderBy("user_id", "event_id")
  }

  /** q38 — bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) alongside the
    * distinct variants of q12.
    */
  def q38_setops_all: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val hi = o.filter(col("o_totalprice") > 150000).select("o_custkey")
    val ur = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val mk = (name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    mk("except_all", hi.exceptAll(ur))
      .unionAll(mk("intersect_all", hi.intersectAll(ur)))
      .orderBy("op")
  }

  val all: Map[String, Q] = Map(
    "q28_rank_funcs" -> q28_rank_funcs,
    "q35_percentile" -> q35_percentile,
    "q36_null_handling" -> q36_null_handling,
    "q37_range_frame" -> q37_range_frame,
    "q38_setops_all" -> q38_setops_all,
    "q18_map_explode" -> q18_map_explode,
    "q23_math_funcs" -> q23_math_funcs,
    "q24_like_regexp" -> q24_like_regexp,
    "q25_correlated_agg" -> q25_correlated_agg,
    "q26_case_null" -> q26_case_null,
    "q27_string_agg" -> q27_string_agg)

  val oracle: Map[String, String] = Map(
    "q37_range_frame" -> """
      SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                                    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 2)
               AS rolling_1h
      FROM events
      QUALIFY user_id < 3
      ORDER BY user_id, event_id""",
    "q38_setops_all" -> """
      WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
           ur AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT 'except_all' AS op, count(1) AS n
        FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM ur)
      UNION ALL
      SELECT 'intersect_all' AS op, count(1) AS n
        FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM ur)
      ORDER BY op""",
    "q35_percentile" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q36_null_handling" -> """
      SELECT coalesce(maybe_status, '<null>') AS maybe_status,
             count(1) AS n_rows,
             count(maybe_status) AS n_nonnull,
             coalesce(round(sum(CASE WHEN maybe_status IS NULL
                                     THEN o_totalprice END), 2), 0.0) AS null_sum,
             round(avg(o_totalprice), 4) AS avg_price
      FROM (SELECT nullif(o_orderstatus, 'P') AS maybe_status, o_totalprice FROM orders)
      GROUP BY maybe_status ORDER BY 1""",
    "q28_rank_funcs" -> """
      SELECT o_orderpriority, o_orderkey,
             CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
             next_key, CAST(quartile AS BIGINT) AS quartile
      FROM (SELECT o_orderpriority, o_orderkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
                   ntile(4) OVER w AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC))
      WHERE rnk <= 5 ORDER BY o_orderpriority, rnk, o_orderkey""",
    "q18_map_explode" -> """
      SELECT mkey, count(1) AS n, count(DISTINCT mval) AS n_distinct
      FROM (SELECT unnest(map_entries(
                     MAP {'type': event_type, 'k': json_extract_string(props, '$.k')}),
                   recursive := true) FROM events) t(mkey, mval)
      GROUP BY 1 ORDER BY 1""",
    "q23_math_funcs" -> """
      SELECT l_returnflag,
             round(sum(sqrt(l_quantity)), 2) AS sum_sqrt_qty,
             round(sum(abs(l_discount - 0.05)), 4) AS sum_abs_disc,
             CAST(sum(ceil(l_tax * 100)) AS BIGINT) AS sum_ceil_tax,
             CAST(sum(floor(l_quantity)) AS BIGINT) AS sum_floor_qty,
             CAST(sum(l_orderkey % 7) AS BIGINT) AS sum_mod7,
             round(max(greatest(l_discount, l_tax)), 4) AS max_rate
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q24_like_regexp" -> """
      SELECT p_brand, count(1) AS n, round(avg(p_retailprice), 4) AS avg_price
      FROM part
      WHERE p_name LIKE '%ol%' AND regexp_matches(p_type, '^(ECONOMY|PROMO|S)')
      GROUP BY 1 ORDER BY 1""",
    "q25_correlated_agg" -> """
      WITH a AS (SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
                 FROM lineitem GROUP BY 1)
      SELECT round(sum(l_extendedprice), 2) AS sum_price, count(1) AS n_rows
      FROM lineitem JOIN a ON l_partkey = ap_partkey
      WHERE l_quantity < avg_qty * 0.5""",
    "q26_case_null" -> """
      SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS band,
             coalesce(nullif(o_orderstatus, 'P'), 'NA') AS status_or_na,
             count(1) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q27_string_agg" -> """
      SELECT o_orderpriority,
             string_agg(s, ',' ORDER BY s) AS statuses,
             count(s) AS n_statuses
      FROM (SELECT DISTINCT o_orderpriority, o_orderstatus AS s FROM orders)
      GROUP BY 1 ORDER BY 1""")
}
