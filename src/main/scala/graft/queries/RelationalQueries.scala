package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextFunctions

/** The relational operator surface (SURVEY.md §2.2): scans, filters, joins
  * (broadcast / SMJ / semi / anti / theta), aggregations (partial+final,
  * distinct, rollup/cube/grouping-sets), windows, sorts/top-k, set ops,
  * scalar/date/JSON/array functions — each as an oracle-checkable query over
  * the driver test tables.
  *
  * Determinism contract (shared with the DuckDB oracle in
  * `SparkEntry.oracleSql`): every query ends in a total ORDER BY; float
  * aggregates are rounded; dates/timestamps are emitted as formatted strings;
  * integer sums are cast to BIGINT on the oracle side (DuckDB sums to
  * HUGEINT).
  *
  * Scale notes are inline per query — each one names the plan shape expected
  * at 100 TB (broadcast vs shuffle, pushdown, partial aggregation).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q00 — bench calibration canary: a fixed, trivial count(*) over
    * lineitem whose cross-round min-seconds ratio estimates the bench
    * ENVIRONMENT factor (machine/thermal/driver noise), so a broad
    * ~1.1–1.3× inflation on untouched queries (the BENCH_r14-vs-r13
    * signature) can be separated from a real code regression. Sorts
    * first in the registry, so it also absorbs a slice of first-pass
    * classloading — which is why Bench's min-over-passes protocol (not
    * this row's pass-1 sample) is the number to normalize by. The plan
    * is the cheapest one Spark has: parquet footer row-count aggregate,
    * no column decode at all.
    */
  def q00_canary: Q = (s, dir) =>
    Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))

  /** q01 — TPC-H Q1-shaped hash aggregate. Catalyst plans partial+final
    * HashAggregate (map-side combine), so the shuffle carries one row per
    * (flag,status) per partition — scale-independent.
    */
  def q01_agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02 — TPC-H Q6-shaped filter+scan: all predicates push into the parquet
    * reader (verify: PushedFilters in explain), single-row global aggregate.
    */
  def q02_filter_pushdown: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  /** q03 — star-schema broadcast join: region(5) and nation(25) rows are tiny
    * dims → Catalyst broadcasts both (autoBroadcastJoinThreshold); customer
    * never shuffles.
    */
  def q03_join_broadcast: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("r_name")
  }

  /** q04 — big⋈big equi-join (orders⋈lineitem): shuffle both sides on the
    * join key, sort-merge or shuffled-hash per AQE; aggregation reuses the
    * join's partitioning on l_orderkey (no extra shuffle for the groupBy on
    * the same key — here we group by priority so one reduce shuffle follows).
    */
  def q04_join_smj: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        countDistinct("o_orderkey").as("n_orders"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** q05 — left-semi join (EXISTS): orders that have at least one high-value
    * lineitem; the semi-join stops probing at first match and never
    * duplicates rows.
    */
  def q05_semi_join: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 3000)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** q06 — left-anti join (NOT EXISTS): customers with no finished ('F')
    * orders — the scalable form of the reference's per-doc already-processed
    * RPC check (F2, `ingester/annotations_indexer.py:80-101`).
    */
  def q06_anti_join: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val n = broadcast(Tables.nation(s, dir))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("n_name")
  }

  /** q07 — top-k per group via row_number window: one shuffle on the
    * partition key, rank filter applied before any further stage.
    */
  def q07_topk_window: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn").cast("int").as("rn"),
              col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** q08 — global top-k (TakeOrderedAndProject): Spark computes per-partition
    * top-10 then merges on the driver — no full sort at scale.
    */
  def q08_sort_limit: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"),
              round(col("l_extendedprice"), 2).as("l_extendedprice"))
  }

  /** q09 — distinct aggregates (expand + two-phase distinct count). */
  def q09_distinct: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        countDistinct("l_returnflag", "l_linestatus").as("n_flag_status"))
  }

  /** q10 — ROLLUP hierarchy totals; NULL group markers coalesced to 'ALL'
    * so the oracle hash is stable.
    */
  def q10_rollup: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q11 — CUBE over two dims. */
  def q11_cube: Q = (s, dir) => {
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** q12 — set operations: UNION / INTERSECT / EXCEPT cardinalities over
    * customer-key sets from two order segments.
    */
  def q12_setops: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val hi = o.filter(col("o_totalprice") > 150000).select("o_custkey")
    val ur = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val mk = (name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    mk("except", hi.except(ur))
      .unionAll(mk("intersect", hi.intersect(ur)))
      .unionAll(mk("union", hi.union(ur).distinct()))
      .orderBy("op")
  }

  /** q13 — theta/range join (B1 date-segment assignment,
    * `ingester/annotations_indexer.py:842-861`): orders joined to generated
    * 30-day segments on `seg_start <= o_orderdate < seg_end` — half-open
    * windows, fixing the reference's inclusive-boundary double-read. The
    * segment side is tiny and broadcast, so the non-equi join is a broadcast
    * nested-loop over a handful of rows, not a cartesian blowup.
    */
  def q13_range_join: Q = (s, dir) => {
    val segs = s.range(0, 40).select(
      col("id").cast("int").as("seg_id"),
      expr("date_add(to_date('1992-01-01'), cast(id * 30 as int))").as("seg_start"),
      expr("date_add(to_date('1992-01-01'), cast((id + 1) * 30 as int))").as("seg_end"))
    val o = Tables.orders(s, dir).withColumn("o_date", to_date(col("o_orderdate")))
    o.join(broadcast(segs), col("o_date") >= col("seg_start") && col("o_date") < col("seg_end"))
      .groupBy("seg_id")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("seg_id")
  }

  /** q14 — P5 index-name normalization as a scalar pipeline
    * (`ingester/es_common.py:116-131`) applied to part types.
    */
  def q14_string_norm: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(TextFunctions.normalizeIndexName(col("p_type")).as("norm_type"))
      .groupBy("norm_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("norm_type")
  }

  /** q15 — date/time functions: month bucketing + date arithmetic (B1's
    * segment math via built-in date functions).
    */
  def q15_datetime: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("due_date"),
        col("o_totalprice"))
      .groupBy("ym")
      .agg(count(lit(1)).as("n"),
           round(sum("o_totalprice"), 2).as("sum_price"),
           max("due_date").as("max_due"))
      .orderBy("ym")
  }

  /** q16 — JSON extraction on `events.props` (the reference's NLP responses
    * are nested JSON; P7 `ingester/nlp_service.py:102-103`).
    */
  def q16_json: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("long").as("k"),
              col("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum("k").as("sum_k"),
           round(avg("value"), 4).as("avg_value"))
      .orderBy("event_type")
  }

  /** q17 — explode/flatten (X1's generator shape,
    * `ingester/annotations_indexer.py:202`): token frequency via explode of
    * the whitespace tokenization.
    */
  def q17_explode_tokens: Q = (s, dir) => {
    Tables.documents(s, dir)
      // explode_outer: keeps InferFiltersFromGenerate from re-tokenizing each
      // row inside an inferred `size(tokens(text)) > 0` filter (see
      // Dedup.minhashSignatures); null rows from empty arrays filtered cheaply
      .select(explode_outer(TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)
  }

  /** q19 — running windows: per-user running sum and lag over event time
    * (P4's running-id made deterministic; SURVEY §2.2 windows).
    */
  def q19_window_running: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("running_value", round(sum("value").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"), col("running_value"),
              coalesce(col("prev_type"), lit("none")).as("prev_type"))
      .orderBy("user_id", "event_id")
  }

  /** q20 — S5 count surface: row counts of every table in one result. */
  def q20_count: Q = (s, dir) => {
    val names = Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings")
    names.map { t =>
      Tables.table(s, dir, t).agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n"))
    }.reduce(_ unionAll _).orderBy("tbl")
  }

  /** q21 — grouping sets via SQL (Spark's GROUPING SETS) over events. */
  def q21_grouping_sets: Q = (s, dir) => {
    Tables.events(s, dir).createOrReplaceTempView("events_gs")
    s.sql("""
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(CAST(user_id AS STRING), 'ALL') AS user_id,
             count(1) AS n, round(sum(value), 2) AS sum_value
      FROM events_gs
      GROUP BY GROUPING SETS ((event_type), (user_id))
      ORDER BY event_type, user_id
    """)
  }

  /** q22 — as-of-style latest event per user: window + filter (SURVEY §2.2
    * "as-of style latest-annotation-per-doc").
    */
  def q22_asof_latest: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("user_id")
  }

  val all: Map[String, Q] = Map(
    "q00_canary" -> q00_canary,
    "q01_agg" -> q01_agg,
    "q02_filter_pushdown" -> q02_filter_pushdown,
    "q03_join_broadcast" -> q03_join_broadcast,
    "q04_join_smj" -> q04_join_smj,
    "q05_semi_join" -> q05_semi_join,
    "q06_anti_join" -> q06_anti_join,
    "q07_topk_window" -> q07_topk_window,
    "q08_sort_limit" -> q08_sort_limit,
    "q09_distinct" -> q09_distinct,
    "q10_rollup" -> q10_rollup,
    "q11_cube" -> q11_cube,
    "q12_setops" -> q12_setops,
    "q13_range_join" -> q13_range_join,
    "q14_string_norm" -> q14_string_norm,
    "q15_datetime" -> q15_datetime,
    "q16_json" -> q16_json,
    "q17_explode_tokens" -> q17_explode_tokens,
    "q19_window_running" -> q19_window_running,
    "q20_count" -> q20_count,
    "q21_grouping_sets" -> q21_grouping_sets,
    "q22_asof_latest" -> q22_asof_latest)

  /** DuckDB-oracle SQL, column-name and value aligned with the queries above. */
  val oracle: Map[String, String] = Map(
    "q00_canary" -> "SELECT CAST(count(1) AS BIGINT) AS n_rows FROM lineitem",
    "q01_agg" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             count(1) AS count_order
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_filter_pushdown" -> """
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             count(1) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q03_join_broadcast" -> """
      SELECT r_name, count(1) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY 1""",
    "q04_join_smj" -> """
      SELECT o_orderpriority,
             count(DISTINCT o_orderkey) AS n_orders,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY 1""",
    "q05_semi_join" -> """
      SELECT o_orderstatus, count(1) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_extendedprice > 3000)
      GROUP BY 1 ORDER BY 1""",
    "q06_anti_join" -> """
      SELECT n_name, count(1) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      GROUP BY 1 ORDER BY 1""",
    "q07_topk_window" -> """
      SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
             round(o_totalprice, 2) AS o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
      WHERE rn <= 3 ORDER BY o_orderpriority, rn""",
    "q08_sort_limit" -> """
      SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""",
    "q09_distinct" -> """
      SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
      FROM lineitem""",
    "q10_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
             coalesce(l_linestatus, 'ALL') AS l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty, count(1) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY 1, 2""",
    "q11_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
             coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
             count(1) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY 1, 2""",
    "q12_setops" -> """
      WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
           ur AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT 'except' AS op, count(1) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM ur)
      UNION ALL
      SELECT 'intersect' AS op, count(1) AS n FROM (SELECT * FROM hi INTERSECT SELECT * FROM ur)
      UNION ALL
      SELECT 'union' AS op, count(1) AS n
      FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM hi UNION ALL SELECT * FROM ur))
      ORDER BY op""",
    "q13_range_join" -> """
      WITH segs AS (
        SELECT CAST(i AS INT) AS seg_id,
               DATE '1992-01-01' + CAST(i * 30 AS INT) AS seg_start,
               DATE '1992-01-01' + CAST((i + 1) * 30 AS INT) AS seg_end
        FROM range(0, 40) t(i))
      SELECT seg_id, count(1) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      FROM orders JOIN segs
        ON CAST(o_orderdate AS DATE) >= seg_start AND CAST(o_orderdate AS DATE) < seg_end
      GROUP BY 1 ORDER BY 1""",
    "q14_string_norm" -> """
      SELECT regexp_replace(regexp_replace(
               regexp_replace(lower(p_type), '[#\\/*?"<>|\s]', '_', 'g'),
               '^[._+-]+', ''), '[._+-]+$', '') AS norm_type,
             count(1) AS n
      FROM part GROUP BY 1 ORDER BY 1""",
    "q15_datetime" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             count(1) AS n,
             round(sum(o_totalprice), 2) AS sum_price,
             max(strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')) AS max_due
      FROM orders GROUP BY 1 ORDER BY 1""",
    "q16_json" -> """
      SELECT event_type, count(1) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             round(avg(value), 4) AS avg_value
      FROM events GROUP BY 1 ORDER BY 1""",
    "q17_explode_tokens" -> """
      SELECT token, count(1) AS n
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS token
            FROM documents)
      GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20""",
    "q19_window_running" -> """
      SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value,
             coalesce(lag(event_type, 1) OVER (PARTITION BY user_id
                                               ORDER BY ts ASC, event_id ASC), 'none')
               AS prev_type
      FROM events
      QUALIFY user_id < 5
      ORDER BY user_id, event_id""",
    "q20_count" -> """
      SELECT tbl, n FROM (
        SELECT 'region' AS tbl, count(1) AS n FROM region UNION ALL
        SELECT 'nation', count(1) FROM nation UNION ALL
        SELECT 'customer', count(1) FROM customer UNION ALL
        SELECT 'supplier', count(1) FROM supplier UNION ALL
        SELECT 'part', count(1) FROM part UNION ALL
        SELECT 'orders', count(1) FROM orders UNION ALL
        SELECT 'lineitem', count(1) FROM lineitem UNION ALL
        SELECT 'events', count(1) FROM events UNION ALL
        SELECT 'documents', count(1) FROM documents UNION ALL
        SELECT 'embeddings', count(1) FROM embeddings)
      ORDER BY tbl""",
    "q21_grouping_sets" -> """
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(CAST(user_id AS VARCHAR), 'ALL') AS user_id,
             count(1) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY GROUPING SETS ((event_type), (user_id))
      ORDER BY event_type, user_id""",
    "q22_asof_latest" -> """
      SELECT user_id, event_type AS last_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id""")
}
