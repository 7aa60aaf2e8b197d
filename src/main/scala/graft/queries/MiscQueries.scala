package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Graph, Multimodal, Skew}
import graft.sources.Sinks

/** Remaining inventory: multimodal plumbing, sketch aggregates, and the
  * skew-mitigation operators (SURVEY §7.4's 100 TB posture) surfaced as
  * oracle-checked queries — salting is an internal rewrite, so the results
  * must be bit-identical to the unsalted forms the oracles encode.
  */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q70 — multimodal feature extraction: binary payloads → per-partition
    * decode → per-modality stats. Fully oracle-checked: the stub decoder's
    * checksum is a wrapping-64-bit polynomial byte fold, reproduced in SQL
    * as a HUGEINT fold mod 2^64 re-signed to two's complement. The test
    * payloads are UTF-8 of pure-ASCII text, so byte values ≡ codepoints
    * (verified at all 3 SFs: octet_length(encode(text)) = length(text) for
    * every row); the `(?s)` regex flag keeps the char walk newline-proof.
    * MultimodalSpec covers the Dataset-level plumbing (partition counts,
    * schema, decoder-per-partition).
    */
  def q70_multimodal: Q = (s, dir) => {
    val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder()).toDF()
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
           sum("n_bytes").as("total_bytes"),
           max("width").as("max_width"),
           max("duration_ms").as("max_duration_ms"))
      .orderBy("modality")
  }

  /** q257 — mergeable quantile sketch audit
    * ([[graft.operators.QuantileSketch]]): the decimal-mantissa bucket
    * sketch over order prices in integer cents (the q145 quantization
    * convention) — per percentile, the [est_lo, est_hi] bucket of the
    * FIRST bucket whose cumulative count reaches ⌈p·n/100⌉ (the
    * [[graft.operators.Checks.exactPercentiles]] rank convention),
    * audited against the exact order statistic and the containment
    * contract est_lo ≤ exact ≤ est_hi. The deterministic sibling of
    * q151's GK audit (the q228-beside-q71 pattern on the quantile
    * path): bucketization, cumulative, estimate, and exact are all
    * pure string/integer arithmetic — every column hash-checked.
    */
  def q257_quantile_sketch: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch, Stage}
    val cents = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0)
    val sk = Stage.snapshotDF(QuantileSketch.sketch(cents, "v"))
    val est = QuantileSketch.estimate(sk, Seq(50, 90, 99))
    val ex = Checks.exactPercentiles(cents.withColumn("__g", lit(1)), "__g", "v")
      .selectExpr("stack(3, 50, p50, 90, p90, 99, p99) AS (pct, exact_value)")
    est.join(broadcast(ex), Seq("pct"))
      .select(col("pct").cast("long").as("pct"), col("n_rows"),
        col("est_lo"), col("est_hi"), col("exact_value"),
        (col("est_lo") <= col("exact_value") &&
          col("exact_value") <= col("est_hi")).as("within_bound"))
      .orderBy("pct")
  }

  /** q258 — per-group quantile sketch audit
    * ([[graft.operators.QuantileSketch.estimateByGroup]]): one keyed
    * sketch pass over order prices in cents grouped by order priority,
    * per-group p50/p90/p99 bucket bounds beside the per-group EXACT
    * order statistics ([[graft.operators.Checks.exactPercentiles]],
    * q240's operator) and the containment flags. Unlike q257's global
    * form, every window here is GROUP-partitioned over the per-group
    * bucket relation — no global window at all, the shape that serves a
    * million groups; the audit proves the keyed sketch honors the same
    * rank convention as the exact operator, group by group.
    */
  def q258_group_quantile_sketch: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch}
    val cents = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
      .filter(col("prio").isNotNull && col("v").isNotNull && col("v") >= 0)
    val est = QuantileSketch.estimateByGroup(
      QuantileSketch.sketch(cents, "v", Seq("prio")), Seq("prio"))
    val ex = Checks.exactPercentiles(cents, "prio", "v")
      .select(col("prio"), col("p50").as("p50_exact"),
        col("p90").as("p90_exact"), col("p99").as("p99_exact"))
    est.join(ex, Seq("prio"))
      .select(col("prio"), col("n_rows"),
        col("p50_lo"), col("p50_hi"), col("p50_exact"),
        (col("p50_lo") <= col("p50_exact") &&
          col("p50_exact") <= col("p50_hi")).as("p50_ok"),
        col("p90_lo"), col("p90_hi"), col("p90_exact"),
        (col("p90_lo") <= col("p90_exact") &&
          col("p90_exact") <= col("p90_hi")).as("p90_ok"),
        col("p99_lo"), col("p99_hi"), col("p99_exact"),
        (col("p99_lo") <= col("p99_exact") &&
          col("p99_exact") <= col("p99_hi")).as("p99_ok"))
      .orderBy("prio")
  }

  /** q262 — token-mass-weighted quantiles
    * ([[graft.operators.QuantileSketch.sketchWeighted]] +
    * [[graft.operators.Checks.exactPercentilesWeighted]]): "below what
    * document LENGTH does p% of the corpus's TOKEN MASS live" — the
    * budget question a row-count percentile gets wrong (one 100k-token
    * doc outweighs a thousand stubs). Bucket counts carry summed token
    * weight instead of row counts; same rank convention over mass,
    * exact weighted order statistics + containment flags as the audit.
    * ONE tokenize pass (the snapshot feeds sketch AND exact);
    * everything downstream is bucket-/value-bounded.
    */
  def q262_weighted_quantiles: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch, Stage}
    val base = Stage.snapshotDF(
      graft.operators.Dedup.spread(Tables.documents(s, dir))
        .select(col("n_chars").cast("long").as("v"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("w"))
        .filter(col("v").isNotNull && col("v") >= 0 &&
          col("w").isNotNull && col("w") >= 0))
    val est = QuantileSketch.estimate(
      QuantileSketch.sketchWeighted(base, "v", "w"), Seq(50, 90, 99))
    val ex = Checks.exactPercentilesWeighted(
      base.withColumn("__g", lit(1)), "__g", "v", "w")
      .selectExpr("stack(3, 50, p50, 90, p90, 99, p99) AS (pct, exact_value)")
    est.join(broadcast(ex), Seq("pct"))
      .select(col("pct").cast("long").as("pct"),
        col("n_rows").as("total_weight"),
        col("est_lo"), col("est_hi"), col("exact_value"),
        (col("est_lo") <= col("exact_value") &&
          col("exact_value") <= col("est_hi")).as("within_bound"))
      .orderBy("pct")
  }

  /** q265 — KEYED trailing-window quantiles
    * ([[graft.operators.QuantileSketch.trailingByDay]] with group
    * columns): per-EVENT-TYPE 7-day rolling p50/p90/p99 of event value
    * — the per-tenant rolling-percentile shape that IS fleet
    * observability at 100 TB (a million tenants distribute exactly
    * like q261's one global key: per-(key, day) bucket partials,
    * per-key census days, every window (key, obs_day)-partitioned).
    * Audited per (key, day) against the exact trailing order
    * statistics over the ×7-expanded relation with containment flags;
    * every column hash-checked.
    */
  def q265_keyed_trailing_quantiles: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch}
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0)
    val est = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 7,
      groupCols = Seq("event_type"))
    val days = ev.select(col("event_type"), to_date(col("ts")).as("day"), col("v"))
      .filter(col("day").isNotNull)
      .transform(graft.operators.Stage.snapshotDF)
    val census = days.select("event_type", "day").distinct()
      .withColumnRenamed("day", "obs_day")
    def key(et: Column, d: Column): Column =
      concat_ws("|", et, d.cast("string"))
    val expanded = days
      .select(col("event_type"), col("day"), col("v"),
        explode(sequence(lit(0), lit(6))).as("__i"))
      .select(col("event_type"), expr("date_add(day, __i)").as("obs_day"), col("v"))
      .join(census, Seq("event_type", "obs_day"))
      .select(key(col("event_type"), col("obs_day")).as("__key"), col("v"))
    val ex = Checks.exactPercentiles(expanded, "__key", "v")
      .select(col("__key"), col("p50").as("p50_exact"),
        col("p90").as("p90_exact"), col("p99").as("p99_exact"))
    est.withColumn("__key", key(col("event_type"), col("obs_day")))
      .join(ex, Seq("__key")).drop("__key")
      .select(col("event_type"), col("obs_day"), col("n_rows"),
        col("p50_lo"), col("p50_hi"), col("p50_exact"),
        (col("p50_lo") <= col("p50_exact") &&
          col("p50_exact") <= col("p50_hi")).as("p50_ok"),
        col("p90_lo"), col("p90_hi"), col("p90_exact"),
        (col("p90_lo") <= col("p90_exact") &&
          col("p90_exact") <= col("p90_hi")).as("p90_ok"),
        col("p99_lo"), col("p99_hi"), col("p99_exact"),
        (col("p99_lo") <= col("p99_exact") &&
          col("p99_exact") <= col("p99_hi")).as("p99_ok"))
      .orderBy("event_type", "obs_day")
  }

  /** q264 — trailing-window WEIGHTED quantiles
    * ([[graft.operators.QuantileSketch.trailingByDay]] with a weight
    * column): 7-day rolling payload-byte-mass quantiles of event value
    * — "below what event value does p% of the trailing week's payload
    * byte mass live", the storage-budget twin of q261's row-count
    * bands and the LAST cell of the sketch matrix (windowed ×
    * weighted). Per-day [[graft.operators.QuantileSketch
    * .sketchWeighted]] partials (mass adds like counts, so q260's
    * window algebra is shared verbatim); audited per day against the
    * exact weighted trailing order statistics over the ×7-expanded
    * relation with containment flags; every column hash-checked.
    */
  def q264_trailing_weighted_quantiles: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch}
    val ev = Tables.events(s, dir)
      .select(col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"),
        octet_length(col("props")).cast("long").as("w"))
      .filter(col("v").isNotNull && col("v") >= 0 && col("w").isNotNull)
    val est = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 7,
      percentiles = Seq(50, 90, 99), weightCol = Some("w"))
    val days = ev.select(to_date(col("ts")).as("day"), col("v"), col("w"))
      .filter(col("day").isNotNull)
      .transform(graft.operators.Stage.snapshotDF)
    val census = days.select("day").distinct()
      .withColumnRenamed("day", "obs_day")
    val expanded = days
      .select(col("day"), col("v"), col("w"),
        explode(sequence(lit(0), lit(6))).as("__i"))
      .select(expr("date_add(day, __i)").as("obs_day"), col("v"), col("w"))
      .join(census, "obs_day")
    val ex = Checks.exactPercentilesWeighted(expanded, "obs_day", "v", "w")
      .select(col("obs_day"), col("p50").as("p50_exact"),
        col("p90").as("p90_exact"), col("p99").as("p99_exact"))
    est.join(ex, Seq("obs_day"))
      .select(col("obs_day"), col("n_rows").as("total_weight"),
        col("p50_lo"), col("p50_hi"), col("p50_exact"),
        (col("p50_lo") <= col("p50_exact") &&
          col("p50_exact") <= col("p50_hi")).as("p50_ok"),
        col("p90_lo"), col("p90_hi"), col("p90_exact"),
        (col("p90_lo") <= col("p90_exact") &&
          col("p90_exact") <= col("p90_hi")).as("p90_ok"),
        col("p99_lo"), col("p99_hi"), col("p99_exact"),
        (col("p99_lo") <= col("p99_exact") &&
          col("p99_exact") <= col("p99_hi")).as("p99_ok"))
      .orderBy("obs_day")
  }

  /** q261 — trailing-window quantiles
    * ([[graft.operators.QuantileSketch.trailingByDay]]): 7-day rolling
    * p50/p90/p99 of event values (integer cents) from per-day bucket
    * partials — q260's window algebra on the quantile path, where fixed
    * boundaries make the per-window merge plain count addition and the
    * windowed estimate is EXACTLY the union bag's estimate. Audited
    * per day against the exact trailing order statistics
    * ([[graft.operators.Checks.exactPercentiles]] over the ×7-expanded
    * relation) with containment flags; every column hash-checked.
    */
  def q261_trailing_quantiles: Q = (s, dir) => {
    import graft.operators.{Checks, QuantileSketch}
    val ev = Tables.events(s, dir)
      .select(col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0)
    val est = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 7)
    val days = ev.select(to_date(col("ts")).as("day"), col("v"))
      .filter(col("day").isNotNull)
      .transform(graft.operators.Stage.snapshotDF)
    val census = days.select("day").distinct()
      .withColumnRenamed("day", "obs_day")
    val expanded = days
      .select(col("day"), col("v"),
        explode(sequence(lit(0), lit(6))).as("__i"))
      .select(expr("date_add(day, __i)").as("obs_day"), col("v"))
      .join(census, "obs_day")
    val ex = Checks.exactPercentiles(expanded, "obs_day", "v")
      .select(col("obs_day"), col("p50").as("p50_exact"),
        col("p90").as("p90_exact"), col("p99").as("p99_exact"))
    est.join(ex, Seq("obs_day"))
      .select(col("obs_day"), col("n_rows"),
        col("p50_lo"), col("p50_hi"), col("p50_exact"),
        (col("p50_lo") <= col("p50_exact") &&
          col("p50_exact") <= col("p50_hi")).as("p50_ok"),
        col("p90_lo"), col("p90_hi"), col("p90_exact"),
        (col("p90_lo") <= col("p90_exact") &&
          col("p90_exact") <= col("p90_hi")).as("p90_ok"),
        col("p99_lo"), col("p99_hi"), col("p99_exact"),
        (col("p99_lo") <= col("p99_exact") &&
          col("p99_exact") <= col("p99_hi")).as("p99_ok"))
      .orderBy("obs_day")
  }

  /** q266 — KEYED trailing-window KMV
    * ([[graft.operators.Kmv.trailingKmv]] with group columns): 7-day
    * rolling distinct USERS per event type — per-tenant rolling WAU,
    * q260's window algebra with the key threaded through partials,
    * census, and re-cut (per-(key, day) k-cut partials, PER-KEY census
    * days, every window key-partitioned — a million tenants distribute
    * like one). Exact per-(key, day) trailing distinct rides as the
    * audit; estimate, k-th hash, and error all hash-checked per key.
    */
  def q266_keyed_trailing_kmv: Q = (s, dir) =>
    graft.operators.Kmv.trailingKmv(
      Tables.events(s, dir), "user_id", "ts", k = 64, windowDays = 7,
      groupCols = Seq("event_type"))

  /** q260 — trailing-window KMV ([[graft.operators.Kmv.trailingKmv]]):
    * 7-day rolling distinct-user estimates over the event log from
    * per-day k = 64 hash partials — the sketch-algebra answer to q139's
    * WAU problem: the ×7 window expansion multiplies ≤ 64-row partials
    * instead of the whole (user, day) relation, per-day state is k
    * longs, and the merged per-window k-cut is provably the true k-cut
    * of the union (every global k-minimum survives its own day's cut).
    * Exact trailing distinct rides as the audit column; estimate,
    * k-th hash, and error all hash-checked per day.
    */
  def q260_trailing_kmv: Q = (s, dir) =>
    graft.operators.Kmv.trailingKmv(
      Tables.events(s, dir), "user_id", "ts", k = 64, windowDays = 7)

  /** q259 — per-group KMV distinct sketch audit
    * ([[graft.operators.Kmv.kmvDistinctByGroup]]): distinct ORDERS per
    * return flag sketched at k = 256 — the keyed face of q228 (the q258
    * keyed-sketch shape on the cardinality path): one (group, hash)
    * distinct + a GROUP-partitioned row_number ≤ k cut, estimate /
    * k-th hash / exact / error all hash-checked per group. Orderkeys
    * split across flags, so the three sketches genuinely differ
    * (~2–7% measured error, inside the 1/√k band; l_partkey was
    * probed and rejected — its short sequential digit strings land a
    * 3σ-unlucky k-th order statistic at this k).
    */
  def q259_group_kmv: Q = (s, dir) =>
    graft.operators.Kmv.kmvDistinctByGroup(
      Tables.lineitem(s, dir), "l_returnflag", "l_orderkey", k = 256)

  /** q228 — KMV distinct sketch audit ([[graft.operators.Kmv.kmvDistinct]]):
    * k = 256 minimum polynomial-hash values over `l_orderkey`, the
    * ⌊(k−1)·p/h₍ₖ₎⌋ estimate beside the exact distinct count and the
    * relative error — the ORACLE-CHECKABLE distinct sketch (q71's HLL is
    * rows-only because xxhash64 can't be replayed; the polynomial hash
    * can, so every column here is hash-checked, estimate included).
    */
  def q228_kmv_distinct: Q = (s, dir) =>
    graft.operators.Kmv.kmvDistinct(Tables.lineitem(s, dir), "l_orderkey", k = 256)

  /** q71 — HLL sketch cardinalities (rows-only: approx values are
    * engine-specific; exact twins are oracle-checked in q09). The 100 TB
    * dedup-stats operator: one pass, bounded memory, no exact-distinct
    * shuffle explosion.
    */
  def q71_approx_distinct: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        approx_count_distinct("l_suppkey").as("approx_supps"),
        approx_count_distinct("l_orderkey").as("approx_orders"))
  }

  /** q151 — approx-quantile audit (rows-only, the q71 sketch convention;
    * exact twin q36): Spark's `approx_percentile` (Greenwald–Khanna,
    * accuracy 1000) against the exact `percentile` at p50/p90/p99 over
    * order prices, scored by TRUE rank error — count(v ≤ approx)/n vs p,
    * the audit that verifies the sketch honors its ≤ 1/accuracy rank
    * contract as ONE relational result (q111/q120/q125's audit pattern on
    * the quantile path). The sketch is the 100 TB order-statistics plan:
    * bounded-memory partials merged associatively, vs the exact form's
    * per-group full sort. Sketch results are merge-order-dependent →
    * rows-only check; the bound itself is spec-asserted.
    */
  def q151_quantile_audit: Q = (s, dir) => {
    val li = Tables.orders(s, dir).select(col("o_totalprice").as("v"))
    val ps = Seq(0.5, 0.9, 0.99)
    val agg = li.agg(
      expr("approx_percentile(v, array(0.5D, 0.9D, 0.99D), 1000)").as("ap"),
      expr("percentile(v, array(0.5D, 0.9D, 0.99D))").as("ex"),
      count(lit(1)).as("n"))
    // snapshot: `rows` feeds BOTH the rank census and the final join — a
    // second evaluation would re-run the merge-order-dependent GK sketch
    // (possibly yielding a different approx_v than the one the rank was
    // measured against) and a second full-sort exact-percentile scan
    val rows = graft.operators.Stage.snapshotDF(agg
      .select(posexplode(arrays_zip(col("ap"), col("ex"))).as(Seq("i", "z")), col("n"))
      .select(col("i").cast("long").as("idx"), col("z.ap").as("approx_v"),
        col("z.ex").as("exact_v"), col("n"))
      .withColumn("p", element_at(array(ps.map(lit): _*), col("idx").cast("int") + 1)))
    val ranks = li.crossJoin(broadcast(rows.select(col("idx"), col("approx_v"))))
      .groupBy("idx")
      .agg(sum(when(col("v") <= col("approx_v"), 1L).otherwise(0L)).as("rank_le"))
    rows.join(ranks, "idx")
      .select(col("p"),
        round(col("approx_v"), 2).as("approx_v"),
        round(col("exact_v"), 2).as("exact_v"),
        round(abs(col("rank_le").cast("double") / col("n") - col("p")), 6).as("rank_err"),
        (abs(col("rank_le").cast("double") / col("n") - col("p")) <= 0.001 + 1e-9)
          .as("within_bound"))
      .orderBy("p")
  }

  /** q76 — two-phase salted aggregation over a hot grouping key: the salt
    * spreads each key across 16 reducers for the partial phase; the merge
    * phase recombines. Result ≡ plain GROUP BY (the oracle).
    */
  def q76_salted_agg: Q = (s, dir) => {
    Skew.saltedAggregate(
        Tables.events(s, dir).select("event_type", "value"),
        keys = Seq("event_type"),
        partial = sum("value").as("part_sum"),
        merge = sum("part_sum").as("sum_value"))
      .select(col("event_type"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  /** q77 — salted equi-join (hot fact key, dim too big to broadcast at
    * scale): fact rows spread over 16 salt buckets, dim replicated per salt.
    * Result ≡ the plain join (the oracle). The broadcast hint is DISABLED on
    * the dim side here so the exercised path is the shuffled salted join.
    */
  def q77_salted_join: Q = (s, dir) => {
    val fact = Tables.events(s, dir).select("user_id", "value")
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment")).hint("shuffle_hash")
    Skew.saltedJoin(fact, dim, "user_id", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** q98 — range-clustered layout → pruned scan, end-to-end: lineitem is
    * rewritten once via [[Sinks.writeRangeClustered]] (8 files with
    * disjoint `l_shipdate` ranges, rows sorted inside each), then a
    * 3-month range predicate reads it back and aggregates per month. The
    * result is layout-invariant (≡ the same aggregate off the raw table —
    * the oracle), but the SCAN is not: tight per-file/row-group min-max
    * stats let the parquet reader skip ~96% of the data (3 months of 7
    * years), where the raw write-order layout matches every row group.
    * LayoutPruningSpec asserts the skip via scan metrics; at 100 TB this
    * layout turns every time-ranged read (B1's date segments) from a full
    * scan into a file-pruned one. The rewrite happens once per (JVM,
    * sfDir) into a fresh per-process temp directory — repeated bench
    * passes measure the read path, while a new JVM always re-clusters
    * from the current input (no stale cross-process cache, no two
    * processes racing an Overwrite on a shared path).
    */
  private val rcCache = scala.collection.mutable.Map.empty[String, String]

  // the clustered copies live for the JVM only — delete them on exit so
  // repeated bench/verify JVMs don't accumulate lineitem copies in /tmp
  sys.addShutdownHook {
    rcCache.synchronized(rcCache.values.toList).foreach { dir =>
      scala.util.Try {
        val root = java.nio.file.Paths.get(dir)
        java.nio.file.Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  def q98_clustered_scan: Q = (s, dir) => {
    val cols = Seq("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
    val path = rcCache.synchronized {
      rcCache.getOrElseUpdate(dir, {
        val p = graft.operators.Stage.scratchDir(s, "graft_rc_demo")
        Sinks.writeRangeClustered(
          Tables.lineitem(s, dir).select(cols.map(col): _*)
            // NTZ → LTZ: Spark never converts NTZ filters to parquet
            // predicates, so an NTZ cluster key defeats the row-group
            // skipping this query demonstrates (see writeRangeClustered)
            .withColumn("l_shipdate", col("l_shipdate").cast("timestamp")),
          p, "l_shipdate", numFiles = 8)
        p
      })
    }
    s.read.parquet(path)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("n_items"),
           round(sum("l_quantity"), 2).as("sum_qty"),
           round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("ship_month")
  }

  /** q157 — bloom-indexed point lookup ([[Sinks.writeBloomIndexed]]):
    * lineitem in WRITE ORDER (no clustering — every file spans the full
    * key range, min/max can't skip anything) but with per-row-group
    * parquet bloom filters on the high-cardinality `l_orderkey`; the
    * point probe (equality, or a small IN — Spark rewrites it under the
    * parquet pushdown threshold as an OR of equalities, which the bloom
    * visitor composes over) skips every true-negative row group. This is
    * the lookup path clustering can't serve: q98/q153 buy their skips by
    * sorting, which one layout can only give to one or two dimensions —
    * blooms attach to ANY column at write cost only. Oracle is the same
    * lookup off the raw table (the index must be result-invariant); the
    * skip itself is measured in LayoutPruningSpec.
    */
  def q157_bloom_lookup: Q = (s, dir) => {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val path = rcCache.synchronized {
      rcCache.getOrElseUpdate("bl:" + dir, {
        val p = graft.operators.Stage.scratchDir(s, "graft_bl_demo")
        Sinks.writeBloomIndexed(
          Tables.lineitem(s, dir).select(cols.map(col): _*),
          p, Seq("l_orderkey" -> 200000L), numFiles = 8)
        p
      })
    }
    s.read.parquet(path)
      .filter(col("l_orderkey").isin(10L, 1234L))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
           round(sum("l_quantity"), 2).as("sum_qty"),
           round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("l_orderkey")
  }

  /** q159 — data-quality constraint report ([[graft.operators.Checks]]):
    * five declared constraints over `orders` — completeness, key
    * uniqueness, a price range (deliberately tight: it FAILS with metric
    * ≈ 0.4, proving metrics are measured, not assumed), a value-domain
    * predicate, and referential integrity against `customer` — evaluated
    * as ONE aggregate scan for all row-level checks plus one broadcast
    * anti-probe for the reference check. The admission gate a 100 TB
    * ingest runs before data goes downstream; the reference has only
    * per-row NLP shape guards (`ingester/nlp_service.py`), no table-level
    * contract.
    */
  def q159_quality_checks: Q = (s, dir) => {
    import graft.operators.Checks
    Checks.run(Tables.orders(s, dir), Seq(
      Checks.Complete("o_custkey"),
      Checks.Unique("o_orderkey"),
      Checks.InRange("o_totalprice", 0.0, 200000.0),
      Checks.Satisfies("status_domain", col("o_orderstatus").isin("O", "F", "P")),
      Checks.SubsetOf("o_custkey", Tables.customer(s, dir), "c_custkey")))
  }

  /** q187 — ingest provenance manifest ([[graft.operators.Provenance]]):
    * one row per (table, physical parquet file) across all ten driver
    * tables — row count, key range, and a per-file `row_index` integrity
    * bit, all derived from the scan's hidden `_metadata` columns (reader-
    * generated, zero extra I/O; `ReadSchema` stays one physical column
    * per table). The "which file did this row come from" audit artifact
    * a 100 TB ingest keeps so later questions are |files|-sized lookups,
    * not rescans.
    */
  def q187_ingest_manifest: Q = (s, dir) =>
    graft.operators.Provenance.ingestManifest(s, dir, Seq(
      "customer" -> "c_custkey", "documents" -> "doc_id",
      "embeddings" -> "vec_id", "events" -> "event_id",
      "lineitem" -> "l_orderkey", "nation" -> "n_nationkey",
      "orders" -> "o_orderkey", "part" -> "p_partkey",
      "region" -> "r_regionkey", "supplier" -> "s_suppkey"))

  /** q191 — Pareto skyline ([[graft.operators.Skyline]]): the parts no
    * other part beats on both axes — cheaper-or-equal retail price AND
    * larger-or-equal size, at least one strict. Linear two-window
    * formulation (never the O(n²) dominance join), sharded local skyline
    * → one survivor-band global pass.
    */
  def q191_skyline: Q = (s, dir) =>
    graft.operators.Skyline.skyline2D(
        Tables.part(s, dir).select("p_partkey", "p_size", "p_retailprice"),
        minCol = "p_retailprice", maxCol = "p_size", idCol = "p_partkey")
      .orderBy(col("p_size").desc, col("p_partkey").asc)

  /** q192 — incremental view maintenance
    * ([[graft.operators.IncrementalView]]): the per-customer
    * (count, Σ price) view materialized over release v1 is refreshed to
    * v2 by applying ONLY the signed CDC delta (the q155 snapshot
    * derivations: −old/+new pairs from the full-outer struct compare) —
    * never rescanning the base. Prices are quantized to INTEGER CENTS
    * (`floor(x*100 + 0.5)`, the q145/q174 convention) BEFORE any
    * aggregation, so the whole refresh runs in exact decimal-integer
    * arithmetic — no double→decimal value-level cast is in the
    * contract, whose tie-rounding (half-up vs half-even) drifts across
    * engines/releases. The oracle is the strongest one possible: the
    * full recompute over v2, which the delta-applied view must equal
    * row for row; the final `sum_cents` stays a BIGINT — the r14
    * adjudication pinned DECIMAL final columns as the one output type
    * the gate hasher canonicalizes engine-dependently (q192/q230 were
    * the only DECIMAL-output queries in the registry and the only two
    * hash-fails, two rounds running), so no query ships DecimalType in
    * its final schema (pinned registry-wide by QueriesSpec).
    */
  def q192_ivm_refresh: Q = (s, dir) => {
    import graft.operators.IncrementalView
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    def cents(c: Column): Column =
      floor(c * 100 + lit(0.5)).cast("decimal(18,0)")
    val v1 = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .withColumn("cents", cents(col("o_totalprice"))).drop("o_totalprice")
    val v2 = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
      .withColumn("cents", cents(
        when(pmod(col("o_orderkey"), lit(53)) === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))).drop("o_totalprice")
    val mat = v1.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
    val delta = IncrementalView.signedDelta(v1, v2, Seq("o_orderkey"))
    IncrementalView.refreshCountSum(mat, delta,
        Seq("o_custkey"), "cents", "n_orders", "sum_cents")
      .select(col("o_custkey"), col("n_orders"),
        col("sum_cents").cast("long").as("sum_cents"))
      .orderBy("o_custkey")
  }

  /** q186 — PSI release gate ([[graft.operators.Checks.populationStability]]):
    * order-price population stability between two releases — reference
    * drops every 97th order, current drops every 89th and re-prices every
    * 13th by ×1.25 (double arithmetic, mirrored exactly) — over 10
    * equal-population bins cut at the reference's exact deciles (driver
    * double literals, rounded to 6 under the shared DuckDB-round replica
    * so both engines bin identical boundaries). One row per bin: counts,
    * fractions, and the smoothed PSI term (Σ = the index; per-bin terms
    * localize WHERE the mass moved). The numeric-column member of the
    * drift-monitor family (q184 tokens, q185 embeddings).
    */
  def q186_psi_drift: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val ref = o.filter(col("o_orderkey") % 97 =!= 0)
    val cur = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0,
          col("o_totalprice").cast("double") * lit(1.25))
          .otherwise(col("o_totalprice").cast("double")))
    graft.operators.Checks.populationStability(ref, cur, "o_totalprice", bins = 10)
  }

    /** q252 — semi-structured props extraction: `get_json_object` pulls
    * the numeric `k` out of the events' JSON props column (the
    * schema-on-read path every telemetry pipeline walks), then the
    * exact-percentile rank rule summarizes it per event type — JSON
    * parsing surfaced as an ORACLE-CHECKED relational query, not just
    * the NLP pipeline's spec-tested `from_json` internals. Rows whose
    * props lack `k` have no value and no bin (the q240 null contract).
    */
  def q252_props_extract: Q = (s, dir) => {
    val k = Tables.events(s, dir).select(col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    graft.operators.Checks.exactPercentiles(k, "event_type", "k", Seq(50, 90, 99))
  }

  /** q244 — two-sample proportion z-test
    * ([[graft.operators.Checks.proportionTest]]): is the finished-order
    * share of URGENT orders different from LOW-priority orders beyond
    * sampling noise — the A/B-gate statistic on exact integer counts,
    * one declared double expression, 1.96 two-sided verdict.
    */
  def q244_proportion_test: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .withColumn("__done", col("o_orderstatus") === "F")
    graft.operators.Checks.proportionTest(
      o.filter(col("o_orderpriority") === "1-URGENT"),
      o.filter(col("o_orderpriority") === "5-LOW"),
      "__done")
  }

  /** q240 — exact per-group percentiles
    * ([[graft.operators.Checks.exactPercentiles]]): p50/p90/p99 of order
    * value in cents per priority, the contractual-gate twin of q151's
    * sketch quantiles (which stay rows-only — engine-specific sketch).
    * Lower-percentile convention (smallest value reaching ⌈p·n/100⌉ —
    * a value that EXISTS), group-keyed cumulative windows over the
    * per-key distinct-value relation, all-integer output.
    */
  def q240_exact_percentiles: Q = (s, dir) =>
    graft.operators.Checks.exactPercentiles(
      Tables.orders(s, dir)
        .withColumn("cents", (col("o_totalprice") * 100).cast("long")),
      "o_orderpriority", "cents", Seq(50, 90, 99))

  /** q234 — Hill tail index ([[graft.operators.Checks.hillTailIndex]])
    * of document lengths: α̂ over the 50 largest docs — is the length
    * tail heavy enough (α < 2) that mean-based packing/capacity math
    * lies? One TakeOrdered cut (value desc, id asc through ties),
    * 1e-9-quantized log excesses, exact threshold subtraction.
    */
  def q234_hill_tail: Q = (s, dir) =>
    graft.operators.Checks.hillTailIndex(
      Tables.documents(s, dir), "n_chars", "doc_id", m = 50)

  /** q235 — Markov entropy rate ([[graft.operators.Sessionize.entropyRate]])
    * of session event transitions (q207's gap rule verbatim): how
    * predictable is the next event, in nats — bot loops ≈ 0, uniform
    * wandering ≈ ln(n_states). Per-cell 1e-9-quantized terms summed
    * exactly, one closing division.
    */
  def q235_entropy_rate: Q = (s, dir) =>
    graft.operators.Sessionize.entropyRate(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type", gapMs = 12L * 3600 * 1000)

  /** q231 — Gini concentration
    * ([[graft.operators.Checks.giniConcentration]]) of corpus volume
    * over document lengths: how unequal is the char mass across docs —
    * the inequality one-number behind crawl-budget and mixing calls.
    * Exact doubled-form integer algebra over the grouped-value order;
    * the exclusive prefix is the q202 distributed scan (range-partitioned
    * local windows + broadcast offsets), never a single-partition corpus
    * window.
    */
  def q231_gini: Q = (s, dir) =>
    graft.operators.Checks.giniConcentration(
      Tables.documents(s, dir), "n_chars")

/** q202 — exact two-sample KS drift ([[graft.operators.Checks.ksDrift]])
    * between the q186 release pair: the bin-free drift statistic (PSI is
    * blind to shifts inside a bin), with the 95% critical value and the
    * smallest price where the CDFs pull apart the most. The global CDF
    * runs as a DISTRIBUTED prefix sum — range-partitioned local scans +
    * a broadcast partition-offset reconstruction — never a
    * single-partition window over the value relation.
    */
  def q202_ks_drift: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val ref = o.filter(col("o_orderkey") % 97 =!= 0)
    val cur = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0,
          col("o_totalprice").cast("double") * lit(1.25))
          .otherwise(col("o_totalprice").cast("double")))
    graft.operators.Checks.ksDrift(ref, cur, "o_totalprice")
  }

  /** q205 — Benford first-digit audit ([[graft.operators.Checks.benford]])
    * of order totals: per digit the observed count, the Benford
    * probability log₁₀(1+1/d) (driver double literals, interpolated
    * verbatim into the oracle), and the χ² contribution. TPC-H prices are
    * uniform-ish, NOT Benford — the audit flagging real data is the
    * point; the cross-engine contract is the arithmetic, not conformance.
    */
  def q205_benford: Q = (s, dir) => {
    graft.operators.Checks.benford(Tables.orders(s, dir), "o_totalprice")
      .orderBy("digit")
  }

  /** q206 — mutual information between `lang` and `source`
    * ([[graft.operators.Checks.mutualInformation]]): per-cell PMI terms
    * weighted by occurrence (Σ = the MI) — the column-association audit
    * run before a mixing plan treats the two dimensions as independent
    * strata. One corpus aggregation; cell-table algebra after.
    */
  def q206_mutual_info: Q = (s, dir) => {
    graft.operators.Checks.mutualInformation(
        Tables.documents(s, dir), "lang", "source")
      .orderBy("lang", "source")
  }

  /** q209 — functional-dependency census
    * ([[graft.operators.Checks.functionalDependency]]): does `source`
    * determine `lang` in the documents table — exact violation counts
    * (minimum rows to repair, the CFD framing) where q206's MI scores the
    * association softly. All-integer output, no rounding contract.
    */
  def q209_fd_census: Q = (s, dir) => {
    graft.operators.Checks.functionalDependency(
      Tables.documents(s, dir), "source", "lang")
  }

  /** q219 — Doulion triangle estimate audit
    * ([[graft.operators.Graph.triangleEstimateDoulion]]): hash-sparsified
    * (p = 1/2) triangle count scaled by 8 vs the exact count on the
    * strong trade graph — one audit row pricing the sparsification the
    * way q111/q120 price LSH/PQ recall. The deterministic edge coin is
    * replayed verbatim by the oracle.
    */
  def q219_triangle_estimate: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.triangleEstimateDoulion(strongTradeEdges(s, dir), "src", "dst", denom = 2)
  }

  /** q218 — local clustering coefficients
    * ([[graft.operators.Graph.clusteringCoefficients]]) on the strong
    * trade graph: per nation, degree, triangle count, and
    * triangles/(deg choose 2) — the cohesion normalization q165's raw
    * counts can't give; degree-1 nodes null (undefined, not "open").
    */
  def q218_clustering: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.clusteringCoefficients(strongTradeEdges(s, dir), "src", "dst")
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("degree"), col("n_triangles"), col("clustering"))
      .orderBy("n_name")
  }

  /** q229 — strongly connected components
    * ([[graft.operators.Graph.stronglyConnected]]) of the DIRECTED
    * strong trade graph (supplier nation → customer nation): which
    * nation groups trade strongly both ways — the cycle structure q80's
    * undirected components erase. Mutual-reachability join over the
    * hop-capped directed closure; |V|² contract per the allPairsHops
    * convention, graph-sized relations only.
    */
  def q229_scc: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.stronglyConnected(strongTradeEdges(s, dir), "src", "dst")
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("scc_id"), col("scc_size"))
      .orderBy("n_name")
  }

  /** q221 — link prediction ([[graft.operators.Graph.linkPrediction]]) on
    * the strong trade graph: non-adjacent nation pairs ranked by shared
    * strong-trade neighbors (common-neighbor count + Jaccard overlap) —
    * "which trade link appears next". Wedge enumeration through the
    * shared neighbor (Σ deg², never |V|²), full-graph-exact Jaccard
    * denominators; the hub cap (10k) excises nothing at any driver SF,
    * and the oracle replays the same cap filter so the defined
    * approximation — not just this corpus's behavior — is what's checked.
    */
  def q221_link_prediction: Q = (s, dir) => {
    import graft.operators.Graph
    val names = Tables.nation(s, dir).select("n_nationkey", "n_name")
    Graph.linkPrediction(strongTradeEdges(s, dir), "src", "dst")
      .join(broadcast(names.select(col("n_nationkey").as("node_a"),
        col("n_name").as("name_a"))), "node_a")
      .join(broadcast(names.select(col("n_nationkey").as("node_b"),
        col("n_name").as("name_b"))), "node_b")
      .select(col("name_a"), col("name_b"), col("common_neighbors"), col("jaccard"))
      .orderBy(col("common_neighbors").desc, col("name_a"), col("name_b"))
  }

  /** q217 — per-slice KS drift ([[graft.operators.Checks.ksDriftByGroup]]):
    * the q202 release pair monitored per order priority — the production
    * gate shape (an aggregate KS can stay flat while one slice walks
    * away). Group-keyed cumulative windows; same exact CDF algebra.
    */
  def q217_ks_by_group: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val ref = o.filter(col("o_orderkey") % 97 =!= 0)
    val cur = o.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0,
          col("o_totalprice").cast("double") * lit(1.25))
          .otherwise(col("o_totalprice").cast("double")))
    graft.operators.Checks.ksDriftByGroup(ref, cur, "o_orderpriority", "o_totalprice")
      .orderBy("o_orderpriority")
  }

  /** q164 — market-basket pair rules ([[graft.operators.Association]]):
    * top-20 co-ordered part pairs by lift (support ≥ 2) over the
    * lineitem order-baskets. One distinct (basket, item) projection, one
    * basket-keyed self-join (Σ basket² pair volume — basket sizes, not
    * the catalog, bound the blow-up), exact integer support counts; lift
    * and confidence are single declared double expressions over those
    * integers — engine-stable with no rounding contract.
    *
    * Routed through the GUARDED form: the driver corpora sit far under
    * the 20M-pair budget at every SF (sf0.1 predicts 1.2M), so this IS
    * the exact open computation (AssociationSpec pins the bit-identity) —
    * but at 100× one bot-cart basket trips the budget and the derived cap
    * excises it instead of detonating the stage. q179 oracle-checks the
    * degrade itself with a forced budget.
    */
  def q164_market_basket: Q = (s, dir) => {
    graft.operators.Association.pairRulesGuarded(
      Tables.lineitem(s, dir), "l_orderkey", "l_partkey", minSupport = 2L,
      pairBudget = 20000000L, hotBasketCap = 4096)
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
      .limit(20)
      .select(col("item_a"), col("item_b"), col("pair_support"),
        round(col("lift"), 4).as("lift"),
        round(col("conf_a_to_b"), 4).as("conf_a_to_b"))
  }

  /** q179 — GUARDED market-basket rules
    * ([[graft.operators.Association.pairRulesGuarded]]), guard FORCED at
    * sf ≥ 0.01 (`pairBudget = 25000` is below the corpus's predicted
    * Σ k·(k−1)/2 there) so the degrade path executes under oracle check:
    * the guard derives `cap` = the largest basket size whose cumulative
    * histogram volume fits the budget (sf0.01 → 3, sf0.1 → 2), excises
    * bigger baskets from the pair stage, and keeps item supports and the
    * basket universe exact over ALL baskets. At sf0.001 the corpus is
    * under budget and the query IS the open form — both regimes are
    * covered across the three SFs.
    *
    * ORACLE NOTE (the q108/q130 convention): guarded mode is a DEFINED
    * approximation — `cap` is a pure function of the size histogram and
    * the budget, so the oracle re-derives it with one cumulative-sum
    * window and replays the same restricted pair stage. AssociationSpec
    * separately pins the under-budget form bit-identical to [[q164]]'s
    * open operator and the forced degrade's exact-denominator semantics.
    */
  def q179_basket_guarded: Q = (s, dir) => {
    graft.operators.Association.pairRulesGuarded(
      Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
      minSupport = 1L, pairBudget = 25000L, hotBasketCap = 8)
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
      .limit(20)
      .select(col("item_a"), col("item_b"), col("pair_support"),
        round(col("lift"), 4).as("lift"),
        round(col("conf_a_to_b"), 4).as("conf_a_to_b"))
  }

  /** q165 — triangle participation ([[Graph.triangleCounts]]) on the
    * strong-trade-link nation graph: q141's edge derivation (the
    * corpus-sized step), thresholded to above-average weight, then the
    * node-iterator triangle join on the graph-sized relation only. The
    * cohesion complement to q141's centrality and q80's components.
    */
  def q165_triangles: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.triangleCounts(strongTradeEdges(s, dir), "src", "dst")
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("n_triangles"))
      .orderBy(col("n_triangles").desc, col("n_name").asc)
  }

  /** Shared edge derivation for the graph-analytics trio q165/q167/q168:
    * the above-average-weight nation trade graph. The 4-way join +
    * aggregation is the corpus-sized step; everything downstream touches
    * only the ≤ |nations|² edge relation.
    */
  private def strongTradeEdges(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stage
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val edges = Stage.snapshotDF(li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w")))
    edges
      .crossJoin(broadcast(edges.agg(avg("w").as("__aw"))))
      .filter(col("w") > col("__aw"))
      .select("src", "dst")
  }

  /** The matching oracle CTE prefix (edges/aw/fe = the strong graph,
    * sym = symmetrized self-loop-free directed pairs).
    */
  private val strongTradeSql = """
      edges AS (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(1) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      aw AS (SELECT avg(w) AS aw FROM edges),
      fe AS (SELECT src, dst FROM edges, aw WHERE w > aw),
      sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM fe WHERE src <> dst
              UNION
              SELECT dst, src FROM fe WHERE src <> dst)"""

  /** q167 — single-source BFS hops ([[Graph.shortestHops]]) over the strong
    * trade graph: the reachability/radius complement to q141's centrality
    * and q165's cohesion. The source is the SMALLEST node carrying a
    * non-self strong edge — a 1-row driver scalar (the pageRank node-count
    * convention) that keeps the query meaningful at every SF instead of
    * pinning a nation that may be isolated at small scales. Frontier levels
    * are fixed at 6 (≥ the graph's diameter); the oracle runs the same
    * traversal as a recursive CTE with the identical hop cap and seed.
    */
  def q167_bfs_hops: Q = (s, dir) => {
    import graft.operators.Graph
    val edges = strongTradeEdges(s, dir)
    val srcRow = edges.filter(col("src") =!= col("dst"))
      .agg(least(min("src"), min("dst")).cast("long")).head
    // a graph with no non-self strong edge has no BFS to run — mirror the
    // oracle, whose NULL seed joins away to an empty result
    if (srcRow.isNullAt(0))
      Tables.nation(s, dir).select(col("n_name"), lit(0).as("hops")).limit(0)
    else
      Graph.shortestHops(edges, "src", "dst", srcRow.getLong(0), maxHops = 6)
        .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
        .select(col("n_name"), col("hops"))
        .orderBy("n_name")
  }

  /** q168 — label-propagation communities ([[Graph.labelPropagation]]) on
    * the strong trade graph, 3 synchronous rounds, most-frequent-neighbor
    * label with min-label ties. The oracle unrolls the 3 rounds as CTE
    * layers (the q141/q162 iterative-mirror convention) — count/max/min are
    * integer-exact, so no rounding contract is needed anywhere.
    */
  def q168_label_prop: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.labelPropagation(strongTradeEdges(s, dir), "src", "dst", iterations = 3)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("label").as("community"))
      .orderBy("n_name")
  }

  /** q171 — closeness centrality from all-pairs hops
    * ([[Graph.allPairsHops]], the multi-source Pregel BFS): per nation,
    * reached-set size, total hops, and (n_reached−1)/Σhops — the
    * distance-based centrality completing the graph family (importance
    * q141, cohesion q165, communities q168, reachability q167). Integer
    * counts/sums both sides; the one division is a single rounded double
    * expression. `total_hops` is CAST to BIGINT in the oracle (DuckDB
    * widens integer sums to HUGEINT — the q151 TYPEWARN class).
    */
  def q171_closeness: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.allPairsHops(strongTradeEdges(s, dir), "src", "dst", maxHops = 6)
      .groupBy("src")
      .agg(count(lit(1)).as("n_reached"),
        sum("hops").as("total_hops"),
        round((count(lit(1)) - lit(1)).cast("double") / sum("hops"), 6).as("closeness"))
      .join(broadcast(Tables.nation(s, dir)), col("src") === col("n_nationkey"))
      .select(col("n_name"), col("n_reached"), col("total_hops"), col("closeness"))
      .orderBy("n_name")
  }

  /** q200 — harmonic centrality ([[Graph.harmonicCentrality]]) on the
    * strong trade graph: Σ 1/d(u,v) per nation — q171's closeness twin
    * that survives disconnection (unreachable nodes contribute 0 instead
    * of silently rescaling the mean). Each 1/d sums as the exact integer
    * 60/d (lcm(1..6)-scaled), so the shuffle's float combine order cannot
    * matter; one closing division, rounded.
    */
  def q200_harmonic: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.harmonicCentrality(strongTradeEdges(s, dir), "src", "dst", maxHops = 6)
      .join(broadcast(Tables.nation(s, dir)), col("src") === col("n_nationkey"))
      .select(col("n_name"), col("n_reached"), col("harmonic"))
      .orderBy("n_name")
  }

  /** q211 — eccentricity census: per nation the reached-set size and
    * eccentricity (max hop distance over the reached set, within the
    * 6-hop contract) from the same multi-source BFS relation as
    * q171/q200 — the diameter/radius diagnostic (max/min of this column)
    * and the "how deep is the graph from HERE" complement to closeness's
    * average. Integer-only output, no rounding contract.
    */
  def q211_eccentricity: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.allPairsHops(strongTradeEdges(s, dir), "src", "dst", maxHops = 6)
      .groupBy("src")
      .agg(count(lit(1)).as("n_reached"),
        max("hops").cast("long").as("eccentricity"))
      .join(broadcast(Tables.nation(s, dir)), col("src") === col("n_nationkey"))
      .select(col("n_name"), col("n_reached"), col("eccentricity"))
      .orderBy("n_name")
  }

  /** q210 — degree assortativity ([[graft.operators.Graph.assortativity]])
    * of the strong trade graph: Pearson correlation of endpoint degrees
    * over the symmetrized edges — hubs-to-hubs vs hub-and-spoke in one
    * number. Exact DECIMAL integer algebra (the q203 contract); the one
    * division-by-√ runs on identically-cast exact operands.
    */
  def q210_assortativity: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.assortativity(strongTradeEdges(s, dir), "src", "dst")
  }

  /** q181 — HyperBall HLL closeness ([[Graph.hyperBallCloseness]]) on the
    * strong trade graph: the sketch-carried neighborhood function — one
    * HLL per node, one union pass per level — in place of q171's settled
    * ≤ |V|² pair relation. At this graph size every ball stays in the
    * sketch's exact sparse mode, so the ORACLE IS THE EXACT CLOSENESS SQL
    * (identical to q171's): the strongest possible audit of the sketch
    * path — estimate ≡ truth, hash-checked. At web scale the same plan
    * holds |V|·4 KB of state instead of |V|² rows and degrades to the
    * published ±1.6% HLL error; GraphSpec pins the ≡-exact property on
    * the multi-component hand graph too.
    */
  def q181_hll_closeness: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.hyperBallCloseness(strongTradeEdges(s, dir), "src", "dst", maxHops = 6)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("n_reached"), col("total_hops"), col("closeness"))
      .orderBy("n_name")
  }

  /** q175 — k-core membership ([[Graph.kCore]], k=3) of the strong trade
    * graph: nodes surviving iterated degree-3 peeling, with their in-core
    * degree — the density backbone the rest of the graph family
    * (triangles, communities) concentrates in. The oracle unrolls the 6
    * peel rounds as keep/restrict CTE layers and applies the same final
    * degree gate, so even a not-yet-converged state would agree
    * layer-for-layer.
    */
  def q175_kcore: Q = (s, dir) => {
    import graft.operators.Graph
    Graph.kCore(strongTradeEdges(s, dir), "src", "dst", k = 3, iterations = 6)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), col("core_degree"))
      .orderBy("n_name")
  }

  /** MATERIALIZED is load-bearing: DuckDB INLINES plain CTEs per
    * reference, and every peel layer references its predecessor three
    * times — un-materialized, the corpus-sized edge derivation would
    * re-expand ~3^iters times (measured: the sf0.01 oracle ran for
    * minutes; materialized it's instant).
    */
  private def kCoreOracle(k: Int, iters: Int): String = {
    val layers = (1 to iters).map { i =>
      s"""
      n$i AS MATERIALIZED (SELECT s FROM e${i - 1} GROUP BY s HAVING count(1) >= $k),
      e$i AS MATERIALIZED (SELECT e.s, e.d FROM e${i - 1} e
              JOIN n$i a ON e.s = a.s JOIN n$i b ON e.d = b.s)"""
    }.mkString(",")
    s"""
      WITH $strongTradeSql,
      e0 AS MATERIALIZED (SELECT s, d FROM sym),$layers
      SELECT n_name, count(1) AS core_degree
      FROM e$iters JOIN nation ON s = n_nationkey
      GROUP BY 1 HAVING count(1) >= $k ORDER BY 1"""
  }

  private def labelPropOracle(iters: Int): String = {
    val layers = (1 to iters).map { k =>
      s"""
      l$k AS (
        SELECT node, min(label) AS label FROM (
          SELECT sym.s AS node, l.label, count(1) AS c,
                 max(count(1)) OVER (PARTITION BY sym.s) AS mx
          FROM sym JOIN l${k - 1} l ON sym.d = l.node
          GROUP BY 1, 2) t
        WHERE c = mx GROUP BY 1)"""
    }.mkString(",")
    s"""
      WITH $strongTradeSql,
      nodes AS (SELECT DISTINCT s AS node FROM sym),
      l0 AS (SELECT node, node AS label FROM nodes),$layers
      SELECT n_name, label AS community
      FROM l$iters JOIN nation ON node = n_nationkey
      ORDER BY n_name"""
  }

  /** q150 — perceptual-hash near-dup pairs over the media corpus
    * ([[Multimodal.perceptualHashes]] → [[Multimodal.perceptualPairs]]):
    * Hamming ≤ 3 pairs via the 4×16-bit pigeonhole band join (Σ bucket²
    * comparison volume, never corpus²), verified with one codegen
    * `bit_count(xor)`. On this synthetic corpus every payload is text
    * bytes, so each record takes the deterministic byte-fold path
    * (`decoded = false`) and the WHOLE query is oracle-expressible via the
    * q70 HUGEINT fold — the REAL aHash path (decodable PNGs, resize
    * stability, inverted-image separation) is pinned in MultimodalSpec on
    * generated image fixtures.
    */
  def q150_perceptual_neardup: Q = (s, dir) => {
    // clone-planted media (every 100th doc re-uploaded): the true pair set
    // is NON-EMPTY at every SF — a near-dup check that matches on
    // emptiness proves nothing
    val media = Multimodal.mediaWithClones(s, Tables.documents(s, dir))
    val hashes = graft.operators.Stage.snapshotDF(
      Multimodal.perceptualHashes(media).toDF()) // decode once, both join sides read the snapshot
    Multimodal.perceptualPairs(hashes, maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** q180 — audio perceptual near-dup pairs
    * ([[Multimodal.audioSignatures]] → [[Multimodal.perceptualPairs]]):
    * the 8-segment RMS-envelope feature, thermometer-quantized to a
    * 64-bit signature whose Hamming distance is exactly the L1 distance
    * of the quantized loudness contours, then the same 4×16-bit
    * pigeonhole band join as q150 (Σ bucket², never corpus²). On the
    * synthetic corpus every audio payload takes the StubDecoder
    * fallback, whose feature vector is an affine transform of the q70
    * byte-fold checksum — so the WHOLE pipeline (fold → feature →
    * quantize → signature → band join) is oracle-expressible; the REAL
    * WAV path (PCM decode, envelope stability under amplitude
    * perturbation, contour separation) is pinned in MultimodalSpec on
    * generated WAV fixtures. Clone planting gives ≥ 2 true pairs at
    * every SF.
    */
  def q180_audio_neardup: Q = (s, dir) => {
    val media = Multimodal.mediaWithClones(s, Tables.documents(s, dir))
      .filter(col("modality") === "audio")
    val feats = Multimodal.extractFeatures(media, () => new Multimodal.ImageIODecoder())
    val sigs = graft.operators.Stage.snapshotDF(Multimodal.audioSignatures(feats))
    // closest-first, bounded: the synthetic fallback features are an
    // affine image of one checksum, so chance near-collisions scale with
    // pairs — the top slice (clones at Hamming 0 first) keeps the
    // artifact corpus-size-independent while still hashing pair identities
    Multimodal.perceptualPairs(sigs, maxHamming = 3)
      .orderBy(col("hamming").asc, col("id_a").asc, col("id_b").asc)
      .limit(50)
  }

  /** q183 — video perceptual near-dup pairs
    * ([[Multimodal.videoFrameHashes]] → [[Multimodal.videoPairs]]): two
    * videos match when ANY sampled frame pair lands within Hamming ≤ 3 —
    * per-frame aHash over [[Multimodal.sampleFrames]]' output, the
    * pigeonhole band join on the FRAME relation, then a fold to the
    * closest frame distance per video pair. On the synthetic corpus
    * every video payload takes the deterministic byte-slice frame
    * fallback and the byte-fold hash, so the whole pipeline — frame
    * count from the fake duration, slice offsets, HUGEINT fold, bands,
    * min-fold — is oracle-expressible; the REAL multi-frame path
    * (animated GIF / MJPEG-AVI with a perturbed re-encode pairing, a
    * different animation staying apart) is pinned in MultimodalSpec.
    */
  def q183_video_neardup: Q = (s, dir) => {
    val media = Multimodal.mediaWithClones(s, Tables.documents(s, dir))
    val fh = graft.operators.Stage.snapshotDF(
      Multimodal.videoFrameHashes(media, everyMs = 500L, maxFrames = 4))
    Multimodal.videoPairs(fh, maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** q141 — weighted PageRank ([[Graph.pageRank]]) over the nation trade
    * graph: edge src→dst = supplier-nation ships to customer-nation,
    * weighted by lineitem count. Deriving the edges is the corpus-sized
    * work (the TPC-H Q5 join pipeline collapsed to one aggregation); the 4
    * rank iterations then run on the graph-sized edge relation only —
    * PageRank's real 100 TB cost profile. Dangling mass is redistributed
    * uniformly (ranks keep summing to 1, spec-pinned); the oracle unrolls
    * the 4 iterations as CTE layers under the per-layer round(·, 9)
    * contract (the q126 loop convention).
    */
  def q141_pagerank: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graph.pageRank(edges, "src", "dst", "w", iterations = 4)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), round(col("pr"), 6).as("pagerank"))
      .orderBy("n_name")
  }

  /** q204 — HITS hubs/authorities ([[graft.operators.Graph.hits]]) on the
    * q141 weighted trade graph: per nation the dual link-analysis scores —
    * authority (pointed at by good hubs: customer-heavy) vs hub (points
    * at good authorities: supplier-heavy) — which PageRank's single
    * number conflates. L∞-normalized (combine-order-free max), per-layer
    * round(·, 9); the oracle unrolls the 4 double-layers exactly.
    */
  def q204_hits: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graph.hits(edges, "src", "dst", "w", iterations = 4)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"),
        (round(col("authority"), 6) + lit(0.0)).as("authority"),
        (round(col("hub"), 6) + lit(0.0)).as("hub"))
      .orderBy("n_name")
  }

  /** q195 — personalized PageRank ([[graft.operators.Graph.personalizedPageRank]]):
    * the q141 trade graph re-ranked by relevance to seed nations
    * {1, 7, 13} — reset and dangling mass flow to the seeds, so scores
    * answer "how strongly does trade flow lead back to THESE economies",
    * the query-dependent ranking the global q141 cannot express. Same
    * unrolled-layer oracle under the per-layer round(·, 9) contract.
    */
  def q195_ppr: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val edges = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graph.personalizedPageRank(edges, "src", "dst", "w",
        seeds = Seq(1L, 7L, 13L), iterations = 4)
      .join(broadcast(Tables.nation(s, dir)), col("node") === col("n_nationkey"))
      .select(col("n_name"), (round(col("pr"), 6) + lit(0.0)).as("ppr"))
      .orderBy("n_name")
  }

  /** The q141 oracle: edge CTEs + `iters` unrolled rank layers. Literals
    * are CAST to DOUBLE so both engines run the identical IEEE arithmetic
    * ((1 − 0.85) computed in double, never a decimal-typed 0.15).
    */
  private def pageRankOracle(iters: Int): String = {
    val layers = (1 to iters).map { k =>
      s"""
      r$k AS (
        SELECT n.node,
               round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                     + CAST(0.85 AS DOUBLE) *
                       (coalesce(c.con, CAST(0 AS DOUBLE)) + dg.dm / nn.n), 9) AS pr
        FROM nodes n
        LEFT JOIN (SELECT e.dst AS node, sum(r.pr * e.p) AS con
                   FROM r${k - 1} r JOIN enorm e ON r.node = e.src
                   GROUP BY 1) c ON n.node = c.node
        CROSS JOIN (SELECT coalesce(sum(pr), CAST(0 AS DOUBLE)) AS dm
                    FROM r${k - 1}
                    WHERE node NOT IN (SELECT src FROM outw)) dg
        CROSS JOIN nn)"""
    }.mkString(",")
    s"""
      WITH edges AS (
        SELECT s_nationkey AS src, c_nationkey AS dst,
               CAST(count(1) AS DOUBLE) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges
                   UNION ALL SELECT dst FROM edges)),
      nn AS (SELECT count(1) AS n FROM nodes),
      outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
      enorm AS (SELECT e.src, e.dst, e.w / o.ow AS p
                FROM edges e JOIN outw o USING (src)),
      r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
      $layers
      SELECT n_name, round(pr, 6) AS pagerank
      FROM r$iters JOIN nation ON node = n_nationkey
      ORDER BY n_name"""
  }

  /** The nine Benford probabilities as the SAME driver doubles the Spark
    * plan uses — shortest-roundtrip repr, so DuckDB parses back the
    * identical bit pattern.
    */
  private val benfordVals = (1 to 9)
    .map(d => s"($d, CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE))")
    .mkString(", ")

  /** The q204 oracle: the HITS double-layers unrolled — per iteration an
    * authority layer (in-edge weighted sum of the previous hubs, filled
    * 0, divided by the max, rounded 9) then a hub layer over the fresh
    * authorities; builds by loop so layers cannot drift.
    */
  private def hitsOracle(iters: Int): String = {
    val layers = (1 to iters).map { k =>
      s"""
      a${k}raw AS (SELECT e.dst AS node, sum(e.w * h.h) AS ar
                   FROM h${k - 1} h JOIN edges e ON h.node = e.src GROUP BY 1),
      a${k}f AS MATERIALIZED (SELECT n.node, coalesce(ar, CAST(0 AS DOUBLE)) AS ar
                 FROM nodes n LEFT JOIN a${k}raw USING (node)),
      a$k AS MATERIALIZED (SELECT node, CASE WHEN mx.m > 0 THEN round(ar / mx.m, 9)
                                ELSE CAST(0 AS DOUBLE) END AS a
              FROM a${k}f CROSS JOIN (SELECT max(ar) AS m FROM a${k}f) mx),
      h${k}raw AS (SELECT e.src AS node, sum(e.w * a.a) AS hr
                   FROM a$k a JOIN edges e ON a.node = e.dst GROUP BY 1),
      h${k}f AS MATERIALIZED (SELECT n.node, coalesce(hr, CAST(0 AS DOUBLE)) AS hr
                 FROM nodes n LEFT JOIN h${k}raw USING (node)),
      h$k AS MATERIALIZED (SELECT node, CASE WHEN mx.m > 0 THEN round(hr / mx.m, 9)
                                ELSE CAST(0 AS DOUBLE) END AS h
              FROM h${k}f CROSS JOIN (SELECT max(hr) AS m FROM h${k}f) mx)"""
    }.mkString(",")
    s"""
      WITH edges AS MATERIALIZED (
        SELECT s_nationkey AS src, c_nationkey AS dst,
               CAST(count(1) AS DOUBLE) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges
                   UNION ALL SELECT dst FROM edges)),
      h0 AS (SELECT node, CAST(1 AS DOUBLE) AS h FROM nodes),
      $layers
      SELECT n_name,
             round(a.a, 6) + CAST(0 AS DOUBLE) AS authority,
             round(h.h, 6) + CAST(0 AS DOUBLE) AS hub
      FROM a$iters a JOIN h$iters h USING (node)
      JOIN nation ON node = n_nationkey
      ORDER BY n_name"""
  }

  /** The q195 oracle: [[pageRankOracle]]'s layer structure with the reset
    * and dangling mass gated onto the seed set — the CASE mirrors the
    * Spark `when(isSeed, …)` exactly, divisions by the declared |S|.
    */
  private def pprOracle(iters: Int, seeds: Seq[Long]): String = {
    val inSeeds = seeds.mkString("(", ", ", ")")
    val ns = seeds.size
    val layers = (1 to iters).map { k =>
      s"""
      r$k AS (
        SELECT n.node,
               round(CASE WHEN n.node IN $inSeeds
                          THEN (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / $ns
                          ELSE CAST(0 AS DOUBLE) END
                     + CAST(0.85 AS DOUBLE) *
                       (coalesce(c.con, CAST(0 AS DOUBLE))
                        + CASE WHEN n.node IN $inSeeds THEN dg.dm / $ns
                               ELSE CAST(0 AS DOUBLE) END), 9) AS pr
        FROM nodes n
        LEFT JOIN (SELECT e.dst AS node, sum(r.pr * e.p) AS con
                   FROM r${k - 1} r JOIN enorm e ON r.node = e.src
                   GROUP BY 1) c ON n.node = c.node
        CROSS JOIN (SELECT coalesce(sum(pr), CAST(0 AS DOUBLE)) AS dm
                    FROM r${k - 1}
                    WHERE node NOT IN (SELECT src FROM outw)) dg)"""
    }.mkString(",")
    s"""
      WITH edges AS (
        SELECT s_nationkey AS src, c_nationkey AS dst,
               CAST(count(1) AS DOUBLE) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges
                   UNION ALL SELECT dst FROM edges)),
      outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
      enorm AS (SELECT e.src, e.dst, e.w / o.ow AS p
                FROM edges e JOIN outw o USING (src)),
      r0 AS (SELECT node,
               CASE WHEN node IN $inSeeds THEN CAST(1 AS DOUBLE) / $ns
                    ELSE CAST(0 AS DOUBLE) END AS pr
             FROM nodes),
      $layers
      SELECT n_name, round(pr, 6) + CAST(0 AS DOUBLE) AS ppr
      FROM r$iters JOIN nation ON node = n_nationkey
      ORDER BY n_name"""
  }

  /** q153 — z-order (Morton) layout → TWO-dimension row-group pruning
    * ([[Sinks.writeZOrdered]]): lineitem laid out by the interleaved
    * bit-planes of (shipdate, extendedprice), read back through a
    * predicate on BOTH dims. q98 proves 1-d range clustering prunes on
    * its one key; z-order is what a lakehouse compaction runs when TWO
    * query dimensions matter — either predicate skips row groups, at the
    * price of neither being perfectly contiguous. The oracle is the same
    * aggregate off the raw table (the layout must be result-invariant);
    * the pruning-cost gap vs a 1-d layout is measured in
    * LayoutPruningSpec, not here.
    */
  /** q172 — JSONL round-trip ([[Sinks.writeJsonl]]/[[Sinks.readJsonl]]):
    * documents → newline-delimited JSON → explicit-schema read → per-source
    * accounting INCLUDING a text-content checksum (sum of char lengths +
    * distinct docs), so any escaping loss in the round-trip breaks the
    * hash. Oracle = the same aggregate off the parquet table — the q153
    * result-invariance convention: the format must change NOTHING.
    */
  def q172_jsonl_roundtrip: Q = (s, dir) => {
    val path = rcCache.synchronized {
      rcCache.getOrElseUpdate("jsonl:" + dir, {
        val p = graft.operators.Stage.scratchDir(s, "graft_jsonl_demo")
        Sinks.writeJsonl(Tables.documents(s, dir), p)
        p
      })
    }
    Sinks.readJsonl(s, path, Tables.documents(s, dir).schema)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("doc_id").as("n_ids"),
        sum(length(col("text"))).as("sum_text_chars"),
        sum("n_chars").as("sum_n_chars"))
      .orderBy("source")
  }

  /** q241 — ORC round-trip: the second columnar interchange format
    * beside parquet (q153 layouts) and JSONL (q172) — write `documents`
    * as zlib ORC, read it back, and aggregate; the oracle computes the
    * same aggregate from the parquet source, so the check IS
    * content-preservation. Spark's built-in ORC source keeps predicate
    * pushdown and column pruning available on the read side (same
    * `FileScan orc PushedFilters` machinery as parquet).
    */
  def q241_orc_roundtrip: Q = (s, dir) => {
    val path = rcCache.synchronized {
      rcCache.getOrElseUpdate("orc:" + dir, {
        val p = graft.operators.Stage.scratchDir(s, "graft_orc_demo")
        Tables.documents(s, dir).write.mode("overwrite")
          .option("compression", "zlib").orc(p + "/docs")
        p
      })
    }
    s.read.orc(path + "/docs")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("doc_id").as("n_ids"),
        sum(length(col("text"))).as("sum_text_chars"),
        sum("n_chars").as("sum_n_chars"))
      .orderBy("lang")
  }

  def q153_zorder_scan: Q = (s, dir) => {
    val cols = Seq("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
    val path = rcCache.synchronized {
      rcCache.getOrElseUpdate("zo:" + dir, {
        val p = graft.operators.Stage.scratchDir(s, "graft_zo_demo")
        val src = Tables.lineitem(s, dir).select(cols.map(col): _*)
          .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
        Sinks.writeZOrdered(src, p,
          unix_micros(col("l_shipdate")).cast("double"),
          col("l_extendedprice"), numFiles = 16)
        p
      })
    }
    s.read.parquet(path)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-07-01").cast("timestamp") &&
              col("l_extendedprice") >= 20000 && col("l_extendedprice") < 30000)
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("n_items"),
           round(sum("l_quantity"), 2).as("sum_qty"),
           round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("ship_month")
  }

  /** q155 — snapshot CDC ([[graft.operators.ChangeCapture.snapshotDiff]]):
    * the set-wise diff of two keyed snapshots of `orders`. Versions are
    * derived deterministically: v1 is the table minus keys ≡ 0 (mod 97)
    * (those rows "arrive later" → inserts), v2 is the table with
    * totalprice bumped on keys ≡ 0 (mod 53) (updates) minus keys ≡ 0
    * (mod 89) (deletes). A key hit by both delete and update rules is a
    * delete (it's absent from v2); by insert and delete, absent from both
    * → no diff row. One full-outer join on the key, one null-safe struct
    * compare — vs the reference's per-key mget loop
    * (`ingester/es_common.py:254-271`).
    */
  def q155_snapshot_diff: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val v1 = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
    val v2 = o.filter(pmod(col("o_orderkey"), lit(89)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(53)) === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    graft.operators.ChangeCapture.snapshotDiff(v1, v2, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, Q] = Map(
    "q70_multimodal" -> q70_multimodal,
    "q155_snapshot_diff" -> q155_snapshot_diff,
    "q153_zorder_scan" -> q153_zorder_scan,
    "q157_bloom_lookup" -> q157_bloom_lookup,
    "q159_quality_checks" -> q159_quality_checks,
    "q186_psi_drift" -> q186_psi_drift,
    "q202_ks_drift" -> q202_ks_drift,
    "q231_gini" -> q231_gini,
    "q234_hill_tail" -> q234_hill_tail,
    "q240_exact_percentiles" -> q240_exact_percentiles,
    "q244_proportion_test" -> q244_proportion_test,
    "q252_props_extract" -> q252_props_extract,
    "q235_entropy_rate" -> q235_entropy_rate,
    "q217_ks_by_group" -> q217_ks_by_group,
    "q218_clustering" -> q218_clustering,
    "q219_triangle_estimate" -> q219_triangle_estimate,
    "q221_link_prediction" -> q221_link_prediction,
    "q229_scc" -> q229_scc,
    "q205_benford" -> q205_benford,
    "q209_fd_census" -> q209_fd_census,
    "q206_mutual_info" -> q206_mutual_info,
    "q187_ingest_manifest" -> q187_ingest_manifest,
    "q191_skyline" -> q191_skyline,
    "q192_ivm_refresh" -> q192_ivm_refresh,
    "q164_market_basket" -> q164_market_basket,
    "q179_basket_guarded" -> q179_basket_guarded,
    "q165_triangles" -> q165_triangles,
    "q167_bfs_hops" -> q167_bfs_hops,
    "q168_label_prop" -> q168_label_prop,
    "q171_closeness" -> q171_closeness,
    "q200_harmonic" -> q200_harmonic,
    "q210_assortativity" -> q210_assortativity,
    "q211_eccentricity" -> q211_eccentricity,
    "q181_hll_closeness" -> q181_hll_closeness,
    "q172_jsonl_roundtrip" -> q172_jsonl_roundtrip,
    "q241_orc_roundtrip" -> q241_orc_roundtrip,
    "q175_kcore" -> q175_kcore,
    "q141_pagerank" -> q141_pagerank,
    "q204_hits" -> q204_hits,
    "q195_ppr" -> q195_ppr,
    "q150_perceptual_neardup" -> q150_perceptual_neardup,
    "q180_audio_neardup" -> q180_audio_neardup,
    "q183_video_neardup" -> q183_video_neardup,
    "q151_quantile_audit" -> q151_quantile_audit,
    "q71_approx_distinct" -> q71_approx_distinct,
    "q228_kmv_distinct" -> q228_kmv_distinct,
    "q257_quantile_sketch" -> q257_quantile_sketch,
    "q258_group_quantile_sketch" -> q258_group_quantile_sketch,
    "q259_group_kmv" -> q259_group_kmv,
    "q260_trailing_kmv" -> q260_trailing_kmv,
    "q261_trailing_quantiles" -> q261_trailing_quantiles,
    "q262_weighted_quantiles" -> q262_weighted_quantiles,
    "q264_trailing_weighted_quantiles" -> q264_trailing_weighted_quantiles,
    "q265_keyed_trailing_quantiles" -> q265_keyed_trailing_quantiles,
    "q266_keyed_trailing_kmv" -> q266_keyed_trailing_kmv,
    "q76_salted_agg" -> q76_salted_agg,
    "q77_salted_join" -> q77_salted_join,
    "q98_clustered_scan" -> q98_clustered_scan)

  /** Exact recursive-CTE closeness over the strong trade graph — the
    * shared oracle of q171 (exact operator) and q181 (HLL sketch path,
    * exact in sparse mode at this scale).
    */
  private lazy val closenessExactSql = s"""
      WITH RECURSIVE $strongTradeSql,
      nodes AS (SELECT DISTINCT s AS node FROM sym),
      h(src, node, hops) AS (
        SELECT node, node, 0 FROM nodes
        UNION
        SELECT h.src, sym.d, h.hops + 1 FROM h JOIN sym ON sym.s = h.node
        WHERE h.hops < 6),
      d AS (SELECT src, node, min(hops) AS hops FROM h GROUP BY 1, 2)
      SELECT n_name, count(1) AS n_reached,
             CAST(sum(hops) AS BIGINT) AS total_hops,
             round(CAST(count(1) - 1 AS DOUBLE) / sum(hops), 6) AS closeness
      FROM d JOIN nation ON src = n_nationkey
      GROUP BY 1 ORDER BY 1"""

  val oracle: Map[String, String] = Map(
    "q141_pagerank" -> pageRankOracle(4),
    "q204_hits" -> hitsOracle(4),
    // first digit via floor→BIGINT→string (integer printing is
    // byte-identical cross-engine; log10/pow risks libm ulp at powers of
    // ten); (obs − n·p)²/(n·p) with the interpolated driver literals
    "q209_fd_census" -> """
      WITH cells AS (SELECT source, lang, count(1) AS n
                     FROM documents GROUP BY 1, 2),
      g AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot,
                   CAST(max(n) AS BIGINT) AS maj
            FROM cells GROUP BY 1)
      SELECT count(1) AS n_groups,
             CAST(sum(CASE WHEN tot > maj THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
             CAST(sum(tot - maj) AS BIGINT) AS n_violating_rows,
             CAST(sum(tot) AS BIGINT) AS n_rows,
             sum(tot - maj) = 0 AS fd_holds
      FROM g""",
    "q205_benford" -> s"""
      WITH expd(digit, p) AS (VALUES $benfordVals),
      v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
            WHERE CAST(o_totalprice AS DOUBLE) >= 1),
      obs AS (SELECT CAST(substring(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR), 1, 1)
                          AS BIGINT) AS digit,
                     count(1) AS n_obs
              FROM v GROUP BY 1),
      n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
      SELECT CAST(e.digit AS BIGINT) AS digit, coalesce(o.n_obs, 0) AS n_obs,
             round(e.p, 6) + CAST(0 AS DOUBLE) AS benford_p,
             round((CAST(coalesce(o.n_obs, 0) AS DOUBLE) - CAST(n.n AS DOUBLE) * e.p)
                 * (CAST(coalesce(o.n_obs, 0) AS DOUBLE) - CAST(n.n AS DOUBLE) * e.p)
                 / (CAST(n.n AS DOUBLE) * e.p), 6) + CAST(0 AS DOUBLE) AS chi2_term
      FROM expd e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN n
      ORDER BY e.digit""",
    // identical exact-integer-double ratio algebra and parenthesization:
    // (n_xy/N)·ln((n_xy·N)/(n_x·n_y))
    "q206_mutual_info" -> """
      WITH joint AS (SELECT lang, source, count(1) AS n_xy
                     FROM documents GROUP BY 1, 2),
      mx AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x FROM joint GROUP BY 1),
      my AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y FROM joint GROUP BY 1),
      t AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM joint)
      SELECT j.lang, j.source, j.n_xy, mx.n_x, my.n_y,
             round((CAST(j.n_xy AS DOUBLE) / CAST(t.n AS DOUBLE)) *
               ln((CAST(j.n_xy AS DOUBLE) * CAST(t.n AS DOUBLE)) /
                  (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE))), 6)
               + CAST(0 AS DOUBLE) AS mi_term
      FROM joint j
      JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN t
      ORDER BY j.lang, j.source""",
    "q195_ppr" -> pprOracle(4, Seq(1L, 7L, 13L)),
    "q155_snapshot_diff" -> """
      WITH v1 AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
                  FROM orders WHERE o_orderkey % 97 <> 0),
      v2 AS (SELECT o_orderkey, o_custkey,
                    CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1.0
                         ELSE o_totalprice END AS o_totalprice,
                    o_orderstatus
             FROM orders WHERE o_orderkey % 89 <> 0)
      SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                  WHEN v2.o_orderkey IS NULL THEN 'delete'
                  ELSE 'update' END AS change
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
      WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
         OR v1.o_totalprice <> v2.o_totalprice
         OR v1.o_custkey <> v2.o_custkey
         OR v1.o_orderstatus <> v2.o_orderstatus
      ORDER BY 1""",
    "q167_bfs_hops" -> s"""
      WITH RECURSIVE $strongTradeSql,
      h(node, hops) AS (
        SELECT (SELECT min(s) FROM sym), 0
        UNION
        SELECT sym.d, h.hops + 1 FROM h JOIN sym ON sym.s = h.node
        WHERE h.hops < 6)
      SELECT n_name, min(hops) AS hops
      FROM h JOIN nation ON node = n_nationkey
      GROUP BY 1 ORDER BY 1""",
    "q168_label_prop" -> labelPropOracle(3),
    "q175_kcore" -> kCoreOracle(3, 6),
    "q172_jsonl_roundtrip" -> """
      SELECT source, count(1) AS n_docs,
             count(DISTINCT doc_id) AS n_ids,
             CAST(sum(length(text)) AS BIGINT) AS sum_text_chars,
             CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
      FROM documents GROUP BY 1 ORDER BY 1""",
    // content preservation through the ORC round-trip: the oracle reads
    // the PARQUET source — agreement proves nothing was lost in flight
    "q241_orc_roundtrip" -> """
      SELECT lang, count(1) AS n_docs,
             count(DISTINCT doc_id) AS n_ids,
             CAST(sum(length(text)) AS BIGINT) AS sum_text_chars,
             CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q171_closeness" -> closenessExactSql,
    // the same recursive BFS relation; each 1/d summed as the exact
    // integer 60/d before ONE closing division (the operator's contract)
    // the shared sym graph; HUGEINT closed-form terms, one double √
    "q211_eccentricity" -> s"""
      WITH RECURSIVE $strongTradeSql,
      nodes AS (SELECT DISTINCT s AS node FROM sym),
      h(src, node, hops) AS (
        SELECT node, node, 0 FROM nodes
        UNION
        SELECT h.src, sym.d, h.hops + 1 FROM h JOIN sym ON sym.s = h.node
        WHERE h.hops < 6),
      d AS (SELECT src, node, min(hops) AS hops FROM h GROUP BY 1, 2)
      SELECT n_name, count(1) AS n_reached,
             CAST(max(hops) AS BIGINT) AS eccentricity
      FROM d JOIN nation ON src = n_nationkey
      GROUP BY 1 ORDER BY 1""",
    "q210_assortativity" -> s"""
      WITH $strongTradeSql,
      deg AS (SELECT s, CAST(count(1) AS BIGINT) AS deg FROM sym GROUP BY 1),
      xy AS (SELECT dx.deg AS x, dy.deg AS y
             FROM sym JOIN deg dx ON sym.s = dx.s
             JOIN deg dy ON sym.d = dy.s),
      g AS (SELECT CAST(count(1) AS HUGEINT) AS m,
                   sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM xy)
      SELECT (SELECT count(1) FROM deg) AS n_nodes,
             CAST(m AS BIGINT) AS n_directed_edges,
             CASE WHEN CAST(m * sxx - sx * sx AS DOUBLE) > 0
                   AND CAST(m * syy - sy * sy AS DOUBLE) > 0 THEN
               round(CAST(m * sxy - sx * sy AS DOUBLE) /
                 sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
                      CAST(m * syy - sy * sy AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
             END AS assortativity
      FROM g""",
    "q200_harmonic" -> s"""
      WITH RECURSIVE $strongTradeSql,
      nodes AS (SELECT DISTINCT s AS node FROM sym),
      h(src, node, hops) AS (
        SELECT node, node, 0 FROM nodes
        UNION
        SELECT h.src, sym.d, h.hops + 1 FROM h JOIN sym ON sym.s = h.node
        WHERE h.hops < 6),
      d AS (SELECT src, node, min(hops) AS hops FROM h GROUP BY 1, 2)
      SELECT n_name, count(1) AS n_reached,
             round(sum(CAST(60 AS DOUBLE) / hops) / CAST(60 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS harmonic
      FROM d JOIN nation ON src = n_nationkey
      WHERE hops >= 1
      GROUP BY 1 ORDER BY 1""",
    // the HyperBall sketch path is EXACT at this graph size (HLL sparse
    // mode) — the oracle is deliberately the same exact-closeness SQL
    "q181_hll_closeness" -> closenessExactSql,
    "q164_market_basket" -> """
      WITH op AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      n AS (SELECT count(DISTINCT bk) AS n FROM op),
      isup AS (SELECT it, count(1) AS s FROM op GROUP BY 1),
      ps AS (SELECT a.it AS item_a, b.it AS item_b, count(1) AS pair_support
             FROM op a JOIN op b ON a.bk = b.bk AND a.it < b.it
             GROUP BY 1, 2 HAVING count(1) >= 2),
      r AS (SELECT item_a, item_b, pair_support,
                   CAST(pair_support * n.n AS DOUBLE)
                     / CAST(sa.s * sb.s AS DOUBLE) AS lift,
                   CAST(pair_support AS DOUBLE) / CAST(sa.s AS DOUBLE) AS conf
            FROM ps, n
            JOIN isup sa ON sa.it = item_a
            JOIN isup sb ON sb.it = item_b)
      SELECT item_a, item_b, pair_support,
             round(lift, 4) AS lift, round(conf, 4) AS conf_a_to_b
      FROM (SELECT * FROM r ORDER BY lift DESC, item_a, item_b LIMIT 20) top
      ORDER BY lift DESC, item_a, item_b""",
    // result-invariance at its strongest: the oracle is the FULL
    // recompute over v2 — the delta-applied view must equal it exactly.
    // Integer-cents quantization (same IEEE product + floor as the
    // engine) BEFORE the sum; the final sum stays BIGINT cents end to
    // end — no DECIMAL in the output schema (the r14-pinned hash class)
    "q192_ivm_refresh" -> """
      WITH v2 AS (
        SELECT o_custkey,
               CAST(floor((CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END) * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 89 <> 0)
      SELECT o_custkey, count(1) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM v2 GROUP BY 1 ORDER BY 1""",
    // independent exact derivation: ONE global window (no shards, no
    // two-phase) — the strictly-higher-size running min + same-size min
    "q191_skyline" -> """
      WITH w AS (
        SELECT p_partkey, p_size, p_retailprice,
               min(p_retailprice) OVER (
                 ORDER BY p_size DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
               min(p_retailprice) OVER (PARTITION BY p_size) AS ms
        FROM part)
      SELECT p_partkey, p_size, p_retailprice
      FROM w
      WHERE (m1 IS NULL OR m1 > p_retailprice) AND p_retailprice = ms
      ORDER BY p_size DESC, p_partkey ASC""",
    // each driver table is one physical file named <table>.parquet; a
    // healthy reader numbers its rows 0..n-1, so the oracle pins
    // row_index_ok = true — a Spark row_index regression would mismatch
    "q187_ingest_manifest" -> Seq(
      ("customer", "c_custkey"), ("documents", "doc_id"),
      ("embeddings", "vec_id"), ("events", "event_id"),
      ("lineitem", "l_orderkey"), ("nation", "n_nationkey"),
      ("orders", "o_orderkey"), ("part", "p_partkey"),
      ("region", "r_regionkey"), ("supplier", "s_suppkey")).map {
        case (t, k) =>
          s"""SELECT '$t' AS table_name, '$t.parquet' AS file_name,
                 count(1) AS n_rows, CAST(min($k) AS BIGINT) AS key_min,
                 CAST(max($k) AS BIGINT) AS key_max, true AS row_index_ok
             FROM $t"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, file_name"),
    // the same canonical edges; the deterministic polynomial edge coin
    // (a·1315423911 + b) mod 1e9+7 mod 2, triangle joins on the
    // sparsified relation, estimate = count·8 vs the exact enumeration
    "q219_triangle_estimate" -> s"""
      WITH $strongTradeSql,
      ce AS (SELECT DISTINCT s AS a, d AS b FROM sym WHERE s < d),
      ex AS (SELECT CAST(count(1) AS BIGINT) AS exact_triangles
             FROM ce e1 JOIN ce e2 ON e1.b = e2.a
             JOIN ce e3 ON e1.a = e3.a AND e2.b = e3.b),
      sp AS (SELECT a, b FROM ce
             WHERE ((CAST(a AS BIGINT) * 1315423911 + b) % 1000000007) % 2 = 0),
      st AS (SELECT CAST(count(1) AS BIGINT) AS sampled_triangles
             FROM sp e1 JOIN sp e2 ON e1.b = e2.a
             JOIN sp e3 ON e1.a = e3.a AND e2.b = e3.b)
      SELECT (SELECT CAST(count(1) AS BIGINT) FROM ce) AS n_edges,
             (SELECT CAST(count(1) AS BIGINT) FROM sp) AS n_sampled_edges,
             ex.exact_triangles, st.sampled_triangles,
             st.sampled_triangles * 8 AS estimate,
             CASE WHEN ex.exact_triangles > 0 THEN
               round(abs(CAST(st.sampled_triangles * 8 AS DOUBLE)
                         - CAST(ex.exact_triangles AS DOUBLE))
                     / CAST(ex.exact_triangles AS DOUBLE), 6) + CAST(0 AS DOUBLE)
             END AS rel_error
      FROM ex CROSS JOIN st""",
    // canonical a<b edges off the shared sym graph; the q165 triangle
    // enumeration + degree counts, coefficient = tri/(deg·(deg−1)/2)
    // regex-extracted k (nullif guards empty matches) through the q240
    // rank rule — JSON reads hash-checked end to end
    "q252_props_extract" -> raw"""
      WITH d AS (SELECT event_type AS k0,
                        CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '')
                          AS BIGINT) AS v
                 FROM events),
      c AS (SELECT k0, v, CAST(count(1) AS BIGINT) AS c FROM d
            WHERE v IS NOT NULL GROUP BY 1, 2),
      w AS (SELECT k0, v,
                   sum(c) OVER (PARTITION BY k0 ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER (PARTITION BY k0) AS n
            FROM c)
      SELECT k0 AS event_type, CAST(max(n) AS BIGINT) AS n_rows,
             CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT) AS p50,
             CAST(min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS BIGINT) AS p90,
             CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT) AS p99
      FROM w GROUP BY 1 ORDER BY 1""",
    // exact counts per side; the pooled-z expression mirrored operand
    // for operand; zero-variance pool → null z, false verdict
    "q244_proportion_test" -> """
      WITH a AS (SELECT CAST(count(1) AS BIGINT) AS n1,
                        CAST(sum(CASE WHEN o_orderstatus = 'F'
                          THEN 1 ELSE 0 END) AS BIGINT) AS x1
                 FROM orders WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT CAST(count(1) AS BIGINT) AS n2,
                   CAST(sum(CASE WHEN o_orderstatus = 'F'
                     THEN 1 ELSE 0 END) AS BIGINT) AS x2
            FROM orders WHERE o_orderpriority = '5-LOW'),
      s AS (SELECT n1, x1, n2, x2,
                   (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) /
                     (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS pp
            FROM a CROSS JOIN b),
      z AS (SELECT *,
                   (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
                    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
                   sqrt(pp * (1.0 - pp) *
                     (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS zv
            FROM s)
      SELECT n1 AS n_a, x1 AS x_a, n2 AS n_b, x2 AS x_b,
             round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS p_a,
             round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS p_b,
             CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN
               round(zv, 6) + CAST(0 AS DOUBLE) END AS z,
             coalesce(CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN
               abs(zv) > 1.96 END, false) AS significant_95
      FROM z""",
    // per-key cumulative windows over the distinct-value relation; the
    // exact integer rank rule cum·100 ≥ n·p — no interpolation
    "q240_exact_percentiles" -> """
      WITH c AS (SELECT o_orderpriority AS k,
                        CAST(o_totalprice * 100 AS BIGINT) AS v,
                        CAST(count(1) AS BIGINT) AS c
                 FROM orders GROUP BY 1, 2),
      w AS (SELECT k, v,
                   sum(c) OVER (PARTITION BY k ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER (PARTITION BY k) AS n
            FROM c)
      SELECT k AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_rows,
             CAST(min(CASE WHEN cum * 100 >= n * 50 THEN v END) AS BIGINT) AS p50,
             CAST(min(CASE WHEN cum * 100 >= n * 90 THEN v END) AS BIGINT) AS p90,
             CAST(min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS BIGINT) AS p99
      FROM w GROUP BY 1 ORDER BY 1""",
    // top-(m+1) deterministic cut, 1e-9-quantized logs, exact threshold
    // subtraction — both estimates one rounded division each
    "q234_hill_tail" -> """
      WITH top AS MATERIALIZED (
        SELECT CAST(n_chars AS BIGINT) AS v, doc_id,
               row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn,
               CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000000 + 0.5)
                 AS BIGINT) AS lq
        FROM documents WHERE n_chars > 0
        ORDER BY n_chars DESC, doc_id ASC LIMIT 51),
      thr AS (SELECT v AS threshold, lq AS lthr FROM top WHERE rn = 51),
      s AS (SELECT CAST(count(1) AS BIGINT) AS mm, sum(lq) AS sl
            FROM top WHERE rn <= 50)
      SELECT 50 AS m, threshold,
             CASE WHEN mm = 50 THEN
               round(CAST(sl - 50 * lthr AS DOUBLE) / (50.0 * 1000000000), 6)
                 + CAST(0 AS DOUBLE) END AS mean_ln_excess,
             CASE WHEN mm = 50 AND sl > 50 * lthr THEN
               round(50.0 * 1000000000 / CAST(sl - 50 * lthr AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) END AS alpha
      FROM s CROSS JOIN thr""",
    // the q207 transition derivation verbatim, per-cell 1e-9 quantized
    // terms, exact sum, one closing division
    "q235_entropy_rate" -> """
      WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(epoch_ms(ts)) OVER w AS prev_ms,
               lag(event_type) OVER w AS prev_ty
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      tr AS (SELECT prev_ty AS from_type, event_type AS to_type,
                    CAST(count(1) AS BIGINT) AS n
             FROM o
             WHERE prev_ms IS NOT NULL AND epoch_ms(ts) - prev_ms <= 43200000
             GROUP BY 1, 2),
      rt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM tr GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(count(DISTINCT from_type) AS BIGINT) AS ns FROM tr),
      q AS (SELECT CAST(floor((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) *
                     -ln(CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)) *
                     1000000000 + 0.5) AS BIGINT) AS q, nn, ns
            FROM tr JOIN rt USING (from_type) CROSS JOIN t)
      SELECT nn AS n_transitions, ns AS n_states,
             round(CAST(sum(q) AS DOUBLE) / 1000000000, 6)
               + CAST(0 AS DOUBLE) AS entropy_nats
      FROM q GROUP BY 1, 2""",
    // grouped-value doubled closed form — zero interior divisions; the
    // oracle's global window replays the distributed exclusive prefix
    "q231_gini" -> """
      WITH c AS (SELECT CAST(n_chars AS BIGINT) AS v,
                        CAST(count(1) AS BIGINT) AS c
                 FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
                 GROUP BY 1),
      p AS (SELECT v, c,
                   coalesce(sum(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pr
            FROM c),
      s AS (SELECT sum(CAST(v AS HUGEINT) * (2 * CAST(c AS HUGEINT) * pr
                     + CAST(c AS HUGEINT) * (c + 1))) AS t2,
                   CAST(sum(c) AS HUGEINT) AS n,
                   sum(CAST(v AS HUGEINT) * c) AS sx
            FROM p)
      SELECT CAST(n AS BIGINT) AS n_rows, CAST(sx AS BIGINT) AS total,
             CASE WHEN sx > 0 THEN
               round(CAST(t2 - (n + 1) * sx AS DOUBLE) /
                 CAST(n * sx AS DOUBLE), 6) + CAST(0 AS DOUBLE)
             END AS gini
      FROM s""",
    // DIRECTED hop-capped closure (the q167 cap convention) both ways via
    // one self-join of the closure; scc id = min mutual partner
    "q229_scc" -> s"""
      WITH RECURSIVE $strongTradeSql,
      de AS MATERIALIZED (SELECT src AS s, dst AS d FROM fe WHERE src <> dst),
      nodes AS (SELECT DISTINCT node FROM
                  (SELECT s AS node FROM de UNION ALL SELECT d FROM de)),
      r(src, node, hops) AS (
        SELECT node, node, 0 FROM nodes
        UNION
        SELECT r.src, de.d, r.hops + 1 FROM r JOIN de ON de.s = r.node
        WHERE r.hops < 6),
      f AS MATERIALIZED (SELECT DISTINCT src, node FROM r),
      scc AS MATERIALIZED (
        SELECT a.src AS node, min(a.node) AS scc_id
        FROM f a JOIN f b ON a.src = b.node AND a.node = b.src
        GROUP BY 1),
      z AS (SELECT scc_id, CAST(count(1) AS BIGINT) AS scc_size
            FROM scc GROUP BY 1)
      SELECT n_name, scc_id, scc_size
      FROM scc JOIN z USING (scc_id)
      JOIN nation ON node = n_nationkey
      ORDER BY 1""",
    // the polynomial-hash fold replayed per key (the minhash-oracle
    // pattern), k smallest distinct hashes, EXACT integer-division
    // estimate — a sketch whose every output column hash-checks
    // bucket counts carry SUMMED TOKEN WEIGHT (the q119 whitespace-token
    // convention); cumulative/rank/exact all over mass — the q257 shape
    // with sum(w) where it had count(1); null-text docs drop on both
    // sides (engine: size(tokens(null)) = -1 < 0; oracle: len(NULL)
    // filtered)
    "q262_weighted_quantiles" -> raw"""
      WITH base AS MATERIALIZED (
        SELECT CAST(n_chars AS BIGINT) AS v,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS w
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars >= 0
          AND text IS NOT NULL
          AND len(list_filter(string_split_regex(text, '\s+'),
                x -> x <> '')) >= 0),
      b AS (SELECT v, w, CAST(v AS VARCHAR) AS s FROM base),
      sk AS (
        SELECT CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(sum(w) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2),
      cum AS (SELECT bucket_lo, bucket_hi,
                     sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER () AS n
              FROM sk),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT pct, CAST(max(n) AS BIGINT) AS total_weight,
                     min(bucket_lo) AS est_lo,
                     arg_min(bucket_hi, bucket_lo) AS est_hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1),
      exv AS (SELECT v, CAST(sum(w) AS BIGINT) AS c FROM base GROUP BY 1),
      exc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
              FROM exv),
      ex AS (SELECT pct, min(v) AS exact_value
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1)
      SELECT CAST(est.pct AS BIGINT) AS pct, est.total_weight, est.est_lo,
             est.est_hi, ex.exact_value,
             est.est_lo <= ex.exact_value AND ex.exact_value <= est.est_hi
               AS within_bound
      FROM est JOIN ex ON est.pct = ex.pct
      ORDER BY pct""",
    // the q261 trailing replay with event_type threaded through every
    // CTE: per-(key, day) bucket partials, per-key census, PARTITION BY
    // (key, obs_day) rank windows, exact trailing order statistics per
    // (key, obs_day) — the keyed windowed face
    "q265_keyed_trailing_quantiles" -> raw"""
      WITH cents AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND floor(value * 100 + 0.5) >= 0),
      census AS MATERIALIZED (
        SELECT DISTINCT event_type, day AS obs_day FROM cents),
      b AS (SELECT event_type, day, v, CAST(v AS VARCHAR) AS s FROM cents),
      dsk AS (
        SELECT event_type, day,
               CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(count(1) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2, 3, 4),
      m AS (SELECT dsk.event_type, day + t.i AS obs_day, bucket_lo, bucket_hi,
                   CAST(sum(cnt) AS BIGINT) AS cnt
            FROM dsk, (SELECT CAST(range AS INT) AS i FROM range(7)) t
            JOIN census c ON c.event_type = dsk.event_type
                         AND c.obs_day = day + t.i
            GROUP BY 1, 2, 3, 4),
      cum AS (SELECT event_type, obs_day, bucket_lo, bucket_hi,
                     sum(cnt) OVER (PARTITION BY event_type, obs_day
                       ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY event_type, obs_day) AS n
              FROM m),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT event_type, obs_day, pct,
                     CAST(max(n) AS BIGINT) AS n_rows,
                     min(bucket_lo) AS lo, arg_min(bucket_hi, bucket_lo) AS hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1, 2, 3),
      estw AS (SELECT event_type, obs_day, max(n_rows) AS n_rows,
                      max(CASE WHEN pct = 50 THEN lo END) AS p50_lo,
                      max(CASE WHEN pct = 50 THEN hi END) AS p50_hi,
                      max(CASE WHEN pct = 90 THEN lo END) AS p90_lo,
                      max(CASE WHEN pct = 90 THEN hi END) AS p90_hi,
                      max(CASE WHEN pct = 99 THEN lo END) AS p99_lo,
                      max(CASE WHEN pct = 99 THEN hi END) AS p99_hi
               FROM est GROUP BY 1, 2),
      exp AS (SELECT cents.event_type, day + t.i AS obs_day, v
              FROM cents, (SELECT CAST(range AS INT) AS i FROM range(7)) t
              JOIN census c ON c.event_type = cents.event_type
                           AND c.obs_day = day + t.i),
      exv AS (SELECT event_type, obs_day, v, CAST(count(1) AS BIGINT) AS c
              FROM exp GROUP BY 1, 2, 3),
      exc AS (SELECT event_type, obs_day, v,
                     sum(c) OVER (PARTITION BY event_type, obs_day
                       ORDER BY v) AS cum,
                     sum(c) OVER (PARTITION BY event_type, obs_day) AS n
              FROM exv),
      ex AS (SELECT event_type, obs_day, pct, min(v) AS exact_v
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1, 2, 3),
      exw AS (SELECT event_type, obs_day,
                     max(CASE WHEN pct = 50 THEN exact_v END) AS p50_exact,
                     max(CASE WHEN pct = 90 THEN exact_v END) AS p90_exact,
                     max(CASE WHEN pct = 99 THEN exact_v END) AS p99_exact
              FROM ex GROUP BY 1, 2)
      SELECT e.event_type, e.obs_day, e.n_rows,
             p50_lo, p50_hi, p50_exact,
             p50_lo <= p50_exact AND p50_exact <= p50_hi AS p50_ok,
             p90_lo, p90_hi, p90_exact,
             p90_lo <= p90_exact AND p90_exact <= p90_hi AS p90_ok,
             p99_lo, p99_hi, p99_exact,
             p99_lo <= p99_exact AND p99_exact <= p99_hi AS p99_ok
      FROM estw e JOIN exw x ON e.event_type = x.event_type
                            AND e.obs_day = x.obs_day
      ORDER BY e.event_type, e.obs_day""",
    // the q261 trailing replay with cnt = summed payload-byte MASS
    // (strlen ≡ Spark octet_length) on both the bucket partials and the
    // exact side — ranks over mass; DuckDB's HUGEINT window sums match
    // the engine's decimal(38,0) rank comparison
    "q264_trailing_weighted_quantiles" -> raw"""
      WITH cents AS MATERIALIZED (
        SELECT CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(strlen(props) AS BIGINT) AS w
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
          AND floor(value * 100 + 0.5) >= 0),
      census AS MATERIALIZED (SELECT DISTINCT day AS obs_day FROM cents),
      b AS (SELECT day, v, w, CAST(v AS VARCHAR) AS s FROM cents),
      dsk AS (
        SELECT day,
               CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(sum(w) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2, 3),
      m AS (SELECT day + t.i AS obs_day, bucket_lo, bucket_hi,
                   CAST(sum(cnt) AS BIGINT) AS cnt
            FROM dsk, (SELECT CAST(range AS INT) AS i FROM range(7)) t
            WHERE day + t.i IN (SELECT obs_day FROM census)
            GROUP BY 1, 2, 3),
      cum AS (SELECT obs_day, bucket_lo, bucket_hi,
                     sum(cnt) OVER (PARTITION BY obs_day ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY obs_day) AS n
              FROM m),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT obs_day, pct, CAST(max(n) AS BIGINT) AS total_weight,
                     min(bucket_lo) AS lo, arg_min(bucket_hi, bucket_lo) AS hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1, 2),
      estw AS (SELECT obs_day, max(total_weight) AS total_weight,
                      max(CASE WHEN pct = 50 THEN lo END) AS p50_lo,
                      max(CASE WHEN pct = 50 THEN hi END) AS p50_hi,
                      max(CASE WHEN pct = 90 THEN lo END) AS p90_lo,
                      max(CASE WHEN pct = 90 THEN hi END) AS p90_hi,
                      max(CASE WHEN pct = 99 THEN lo END) AS p99_lo,
                      max(CASE WHEN pct = 99 THEN hi END) AS p99_hi
               FROM est GROUP BY 1),
      exp AS (SELECT day + t.i AS obs_day, v, w
              FROM cents, (SELECT CAST(range AS INT) AS i FROM range(7)) t
              WHERE day + t.i IN (SELECT obs_day FROM census)),
      exv AS (SELECT obs_day, v, CAST(sum(w) AS BIGINT) AS c
              FROM exp GROUP BY 1, 2),
      exc AS (SELECT obs_day, v,
                     sum(c) OVER (PARTITION BY obs_day ORDER BY v) AS cum,
                     sum(c) OVER (PARTITION BY obs_day) AS n
              FROM exv),
      ex AS (SELECT obs_day, pct, min(v) AS exact_v
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1, 2),
      exw AS (SELECT obs_day,
                     max(CASE WHEN pct = 50 THEN exact_v END) AS p50_exact,
                     max(CASE WHEN pct = 90 THEN exact_v END) AS p90_exact,
                     max(CASE WHEN pct = 99 THEN exact_v END) AS p99_exact
              FROM ex GROUP BY 1)
      SELECT e.obs_day, e.total_weight,
             p50_lo, p50_hi, p50_exact,
             p50_lo <= p50_exact AND p50_exact <= p50_hi AS p50_ok,
             p90_lo, p90_hi, p90_exact,
             p90_lo <= p90_exact AND p90_exact <= p90_hi AS p90_ok,
             p99_lo, p99_hi, p99_exact,
             p99_lo <= p99_exact AND p99_exact <= p99_hi AS p99_ok
      FROM estw e JOIN exw x ON e.obs_day = x.obs_day
      ORDER BY e.obs_day""",
    // per-day decimal-mantissa bucket partials, x7 date expansion of the
    // PARTIALS with their counts, count-addition merge per (obs_day,
    // bucket), PARTITION BY obs_day rank windows, exact trailing order
    // statistics from the x7-expanded raw relation — the q258 keyed
    // shape over q260's window algebra
    "q261_trailing_quantiles" -> raw"""
      WITH cents AS MATERIALIZED (
        SELECT CAST(ts AS DATE) AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND floor(value * 100 + 0.5) >= 0),
      census AS MATERIALIZED (SELECT DISTINCT day AS obs_day FROM cents),
      b AS (SELECT day, v, CAST(v AS VARCHAR) AS s FROM cents),
      dsk AS (
        SELECT day,
               CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(count(1) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2, 3),
      m AS (SELECT day + t.i AS obs_day, bucket_lo, bucket_hi,
                   CAST(sum(cnt) AS BIGINT) AS cnt
            FROM dsk, (SELECT CAST(range AS INT) AS i FROM range(7)) t
            WHERE day + t.i IN (SELECT obs_day FROM census)
            GROUP BY 1, 2, 3),
      cum AS (SELECT obs_day, bucket_lo, bucket_hi,
                     sum(cnt) OVER (PARTITION BY obs_day ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY obs_day) AS n
              FROM m),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT obs_day, pct, CAST(max(n) AS BIGINT) AS n_rows,
                     min(bucket_lo) AS lo, arg_min(bucket_hi, bucket_lo) AS hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1, 2),
      estw AS (SELECT obs_day, max(n_rows) AS n_rows,
                      max(CASE WHEN pct = 50 THEN lo END) AS p50_lo,
                      max(CASE WHEN pct = 50 THEN hi END) AS p50_hi,
                      max(CASE WHEN pct = 90 THEN lo END) AS p90_lo,
                      max(CASE WHEN pct = 90 THEN hi END) AS p90_hi,
                      max(CASE WHEN pct = 99 THEN lo END) AS p99_lo,
                      max(CASE WHEN pct = 99 THEN hi END) AS p99_hi
               FROM est GROUP BY 1),
      exp AS (SELECT day + t.i AS obs_day, v
              FROM cents, (SELECT CAST(range AS INT) AS i FROM range(7)) t
              WHERE day + t.i IN (SELECT obs_day FROM census)),
      exv AS (SELECT obs_day, v, CAST(count(1) AS BIGINT) AS c
              FROM exp GROUP BY 1, 2),
      exc AS (SELECT obs_day, v,
                     sum(c) OVER (PARTITION BY obs_day ORDER BY v) AS cum,
                     sum(c) OVER (PARTITION BY obs_day) AS n
              FROM exv),
      ex AS (SELECT obs_day, pct, min(v) AS exact_v
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1, 2),
      exw AS (SELECT obs_day,
                     max(CASE WHEN pct = 50 THEN exact_v END) AS p50_exact,
                     max(CASE WHEN pct = 90 THEN exact_v END) AS p90_exact,
                     max(CASE WHEN pct = 99 THEN exact_v END) AS p99_exact
              FROM ex GROUP BY 1)
      SELECT e.obs_day, e.n_rows,
             p50_lo, p50_hi, p50_exact,
             p50_lo <= p50_exact AND p50_exact <= p50_hi AS p50_ok,
             p90_lo, p90_hi, p90_exact,
             p90_lo <= p90_exact AND p90_exact <= p90_hi AS p90_ok,
             p99_lo, p99_hi, p99_exact,
             p99_lo <= p99_exact AND p99_exact <= p99_hi AS p99_ok
      FROM estw e JOIN exw x ON e.obs_day = x.obs_day
      ORDER BY e.obs_day""",
    // per-day fold+finalizer partials, PARTITION BY day row_number cut,
    // the x7 window expansion on the <=k-row partials (range(7) + date
    // addition), per-window re-cut, guarded estimator, exact trailing
    // distinct from the same expansion on (user, day) — all per day
    // the q260 trailing replay with event_type threaded through every
    // CTE: per-(key, day) k-cut partials, per-key census, PARTITION BY
    // (key, day/obs_day) windows, exact per-(key, obs_day) audit
    "q266_keyed_trailing_kmv" -> raw"""
      WITH dh AS MATERIALIZED (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(CAST(user_id AS VARCHAR), '.'),
               c -> CAST(unicode(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007)
             * 961748927 + 12345) % 1000000007 AS h
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      census AS MATERIALIZED (
        SELECT DISTINCT event_type, day AS obs_day FROM dh),
      pr AS (SELECT event_type, day, h,
                    row_number() OVER (PARTITION BY event_type, day
                      ORDER BY h) AS rn
             FROM dh),
      m AS MATERIALIZED (
        SELECT DISTINCT p.event_type, day + t.i AS obs_day, h
        FROM (SELECT event_type, day, h FROM pr WHERE rn <= 64) p,
             (SELECT CAST(range AS INT) AS i FROM range(7)) t
        JOIN census c ON c.event_type = p.event_type
                     AND c.obs_day = day + t.i),
      res AS (SELECT event_type, obs_day, CAST(count(1) AS BIGINT) AS n_resident
              FROM m GROUP BY 1, 2),
      mr AS (SELECT event_type, obs_day, h,
                    row_number() OVER (PARTITION BY event_type, obs_day
                      ORDER BY h) AS rn
             FROM m),
      sk AS (SELECT event_type, obs_day, CAST(count(1) AS BIGINT) AS n_kept,
                    CAST(max(h) AS BIGINT) AS kth_hash
             FROM mr WHERE rn <= 64 GROUP BY 1, 2),
      ud AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      ex AS (SELECT e.event_type, e.obs_day,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_trailing
             FROM (SELECT ud.event_type, day + t.i AS obs_day, user_id
                   FROM ud, (SELECT CAST(range AS INT) AS i FROM range(7)) t
                   JOIN census c ON c.event_type = ud.event_type
                                AND c.obs_day = day + t.i) e
             GROUP BY 1, 2),
      e AS (SELECT sk.event_type, sk.obs_day, n_kept, kth_hash, n_resident,
                   CASE WHEN n_resident < 64 OR kth_hash <= 0 THEN n_resident
                        ELSE 63000000441 // kth_hash END AS estimate,
                   exact_trailing
            FROM sk JOIN res ON sk.event_type = res.event_type
                            AND sk.obs_day = res.obs_day
                    JOIN ex ON sk.event_type = ex.event_type
                           AND sk.obs_day = ex.obs_day)
      SELECT event_type, obs_day, n_kept, kth_hash, n_resident, estimate,
             exact_trailing,
             round(abs(CAST(estimate AS DOUBLE) - CAST(exact_trailing AS DOUBLE))
               / CAST(exact_trailing AS DOUBLE), 6) + CAST(0 AS DOUBLE)
               AS rel_error
      FROM e ORDER BY 1, 2""",
    "q260_trailing_kmv" -> raw"""
      WITH dh AS MATERIALIZED (
        SELECT DISTINCT CAST(ts AS DATE) AS day,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(CAST(user_id AS VARCHAR), '.'),
               c -> CAST(unicode(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007)
             * 961748927 + 12345) % 1000000007 AS h
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      census AS MATERIALIZED (SELECT DISTINCT day AS obs_day FROM dh),
      pr AS (SELECT day, h,
                    row_number() OVER (PARTITION BY day ORDER BY h) AS rn
             FROM dh),
      m AS MATERIALIZED (
        SELECT DISTINCT day + t.i AS obs_day, h
        FROM (SELECT day, h FROM pr WHERE rn <= 64) p,
             (SELECT CAST(range AS INT) AS i FROM range(7)) t
        WHERE day + t.i IN (SELECT obs_day FROM census)),
      res AS (SELECT obs_day, CAST(count(1) AS BIGINT) AS n_resident
              FROM m GROUP BY 1),
      mr AS (SELECT obs_day, h,
                    row_number() OVER (PARTITION BY obs_day ORDER BY h) AS rn
             FROM m),
      sk AS (SELECT obs_day, CAST(count(1) AS BIGINT) AS n_kept,
                    CAST(max(h) AS BIGINT) AS kth_hash
             FROM mr WHERE rn <= 64 GROUP BY 1),
      ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
             WHERE ts IS NOT NULL),
      ex AS (SELECT obs_day,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_trailing
             FROM (SELECT day + t.i AS obs_day, user_id
                   FROM ud, (SELECT CAST(range AS INT) AS i FROM range(7)) t) e
             WHERE obs_day IN (SELECT obs_day FROM census)
             GROUP BY 1),
      e AS (SELECT sk.obs_day, n_kept, kth_hash, n_resident,
                   CASE WHEN n_resident < 64 OR kth_hash <= 0 THEN n_resident
                        ELSE 63000000441 // kth_hash END AS estimate,
                   exact_trailing
            FROM sk JOIN res ON sk.obs_day = res.obs_day
                    JOIN ex ON sk.obs_day = ex.obs_day)
      SELECT obs_day, n_kept, kth_hash, n_resident, estimate, exact_trailing,
             round(abs(CAST(estimate AS DOUBLE) - CAST(exact_trailing AS DOUBLE))
               / CAST(exact_trailing AS DOUBLE), 6) + CAST(0 AS DOUBLE)
               AS rel_error
      FROM e ORDER BY 1""",
    // the q228 fold+finalizer replayed per group: (group, hash) distinct,
    // PARTITION BY row_number <= k cut, the same guarded integer-division
    // estimator and exact audit — every column hash-checked per group
    "q259_group_kmv" -> raw"""
      WITH hashed AS MATERIALIZED (
        SELECT DISTINCT l_returnflag AS g,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(CAST(l_orderkey AS VARCHAR), '.'),
               c -> CAST(unicode(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007)
             * 961748927 + 12345) % 1000000007 AS h
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL),
      st AS (SELECT g, CAST(count(1) AS BIGINT) AS n_hashes
             FROM hashed GROUP BY 1),
      rk AS (SELECT g, h,
                    row_number() OVER (PARTITION BY g ORDER BY h) AS rn
             FROM hashed),
      sk AS (SELECT g, CAST(count(1) AS BIGINT) AS n_kept,
                    CAST(max(h) AS BIGINT) AS kth_hash
             FROM rk WHERE rn <= 256 GROUP BY 1),
      ex AS (SELECT l_returnflag AS g,
                    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
             FROM lineitem GROUP BY 1),
      e AS (SELECT sk.g, n_kept, kth_hash, n_hashes,
                   CASE WHEN n_hashes < 256 OR kth_hash <= 0 THEN n_hashes
                        ELSE 255000001785 // kth_hash END AS estimate,
                   exact_distinct
            FROM sk JOIN st ON sk.g = st.g JOIN ex ON sk.g = ex.g)
      SELECT g AS l_returnflag, n_kept, kth_hash, n_hashes, estimate,
             exact_distinct,
             round(abs(CAST(estimate AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
               / CAST(exact_distinct AS DOUBLE), 6) + CAST(0 AS DOUBLE)
               AS rel_error
      FROM e ORDER BY 1""",
    // the keyed sketch replayed with PARTITION BY windows mirroring the
    // engine's group-partitioned shape; first qualifying bucket via
    // min(lo)/arg_min(hi) per (group, percentile); exact per-group order
    // statistics from the per-key distinct-value cumulative
    "q258_group_quantile_sketch" -> raw"""
      WITH cents AS MATERIALIZED (
        SELECT o_orderpriority AS prio,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
          AND floor(o_totalprice * 100 + 0.5) >= 0),
      b AS (SELECT prio, v, CAST(v AS VARCHAR) AS s FROM cents),
      sk AS (
        SELECT prio,
               CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(count(1) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2, 3),
      cum AS (SELECT prio, bucket_lo, bucket_hi,
                     sum(cnt) OVER (PARTITION BY prio ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY prio) AS n
              FROM sk),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT prio, pct, CAST(max(n) AS BIGINT) AS n_rows,
                     min(bucket_lo) AS lo, arg_min(bucket_hi, bucket_lo) AS hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1, 2),
      estw AS (SELECT prio, max(n_rows) AS n_rows,
                      max(CASE WHEN pct = 50 THEN lo END) AS p50_lo,
                      max(CASE WHEN pct = 50 THEN hi END) AS p50_hi,
                      max(CASE WHEN pct = 90 THEN lo END) AS p90_lo,
                      max(CASE WHEN pct = 90 THEN hi END) AS p90_hi,
                      max(CASE WHEN pct = 99 THEN lo END) AS p99_lo,
                      max(CASE WHEN pct = 99 THEN hi END) AS p99_hi
               FROM est GROUP BY 1),
      exv AS (SELECT prio, v, CAST(count(1) AS BIGINT) AS c
              FROM cents GROUP BY 1, 2),
      exc AS (SELECT prio, v,
                     sum(c) OVER (PARTITION BY prio ORDER BY v) AS cum,
                     sum(c) OVER (PARTITION BY prio) AS n
              FROM exv),
      ex AS (SELECT prio, pct, min(v) AS exact_v
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1, 2),
      exw AS (SELECT prio,
                     max(CASE WHEN pct = 50 THEN exact_v END) AS p50_exact,
                     max(CASE WHEN pct = 90 THEN exact_v END) AS p90_exact,
                     max(CASE WHEN pct = 99 THEN exact_v END) AS p99_exact
              FROM ex GROUP BY 1)
      SELECT e.prio, e.n_rows,
             p50_lo, p50_hi, p50_exact,
             p50_lo <= p50_exact AND p50_exact <= p50_hi AS p50_ok,
             p90_lo, p90_hi, p90_exact,
             p90_lo <= p90_exact AND p90_exact <= p90_hi AS p90_ok,
             p99_lo, p99_hi, p99_exact,
             p99_lo <= p99_exact AND p99_exact <= p99_hi AS p99_ok
      FROM estw e JOIN exw x ON e.prio = x.prio
      ORDER BY e.prio""",
    // the sketch replayed verbatim: decimal-mantissa buckets by string
    // slicing + zero-pad rebuild (pure integer/string ops), the
    // cum*100 >= n*p rank comparison (no division), arg_min for the
    // first qualifying bucket, exact order statistic from the
    // distinct-value cumulative — every column hash-checked
    "q257_quantile_sketch" -> raw"""
      WITH cents AS MATERIALIZED (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders
        WHERE o_totalprice IS NOT NULL
          AND floor(o_totalprice * 100 + 0.5) >= 0),
      b AS (SELECT v, CAST(v AS VARCHAR) AS s FROM cents),
      sk AS (
        SELECT CASE WHEN len(s) = 1 THEN v
                    ELSE CAST(concat(s[1:2], repeat('0', len(s) - 2)) AS BIGINT)
               END AS bucket_lo,
               CASE WHEN len(s) = 1 THEN v
                    WHEN len(s) = 19 AND s[1:2] = '92'
                      THEN 9223372036854775807
                    ELSE CAST(concat(CAST(CAST(s[1:2] AS BIGINT) + 1 AS VARCHAR),
                                     repeat('0', len(s) - 2)) AS BIGINT) - 1
               END AS bucket_hi,
               CAST(count(1) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2),
      cum AS (SELECT bucket_lo, bucket_hi,
                     sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER () AS n
              FROM sk),
      ps(pct) AS (VALUES (50), (90), (99)),
      est AS (SELECT pct, CAST(max(n) AS BIGINT) AS n_rows,
                     min(bucket_lo) AS est_lo,
                     arg_min(bucket_hi, bucket_lo) AS est_hi
              FROM ps JOIN cum ON cum * 100 >= n * pct
              GROUP BY 1),
      exv AS (SELECT v, CAST(count(1) AS BIGINT) AS c FROM cents GROUP BY 1),
      exc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
              FROM exv),
      ex AS (SELECT pct, min(v) AS exact_value
             FROM ps JOIN exc ON cum * 100 >= n * pct GROUP BY 1)
      SELECT CAST(est.pct AS BIGINT) AS pct, est.n_rows, est.est_lo,
             est.est_hi, ex.exact_value,
             est.est_lo <= ex.exact_value AND ex.exact_value <= est.est_hi
               AS within_bound
      FROM est JOIN ex ON est.pct = ex.pct
      ORDER BY pct""",
    "q228_kmv_distinct" -> raw"""
      WITH hashed AS MATERIALIZED (
        SELECT DISTINCT (list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(CAST(l_orderkey AS VARCHAR), '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007)
                 * 961748927 + 12345) % 1000000007 AS h
        FROM lineitem
        WHERE l_orderkey IS NOT NULL),
      st AS (SELECT CAST(count(1) AS BIGINT) AS n_hashes FROM hashed),
      kth AS (SELECT CAST(count(1) AS BIGINT) AS n_kept,
                     CAST(max(h) AS BIGINT) AS kth_hash
              FROM (SELECT h FROM hashed ORDER BY h LIMIT 256)),
      ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
             FROM lineitem),
      e AS (SELECT n_kept, kth_hash, n_hashes,
                   CASE WHEN n_hashes < 256 OR kth_hash <= 0 THEN n_hashes
                        ELSE 255000001785 // kth_hash END AS estimate,
                   exact_distinct
            FROM kth CROSS JOIN st CROSS JOIN ex)
      SELECT n_kept, kth_hash, n_hashes, estimate, exact_distinct,
             round(abs(CAST(estimate AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
               / CAST(exact_distinct AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS rel_error
      FROM e""",
    // replays the wedge-center enumeration INCLUDING the hub-cap filter
    // (excises nothing at driver SFs — the defined approximation, not
    // this corpus's accident, is what gets checked); Jaccard denominators
    // from the full-graph degrees, one correctly-rounded double division
    "q221_link_prediction" -> s"""
      WITH $strongTradeSql,
      deg AS MATERIALIZED (
        SELECT s AS node, CAST(count(1) AS BIGINT) AS degree
        FROM sym GROUP BY 1),
      adj AS MATERIALIZED (
        SELECT s AS u, d AS z FROM sym
        JOIN deg ON d = node WHERE degree <= 10000),
      cand AS (
        SELECT l.u AS node_a, r.u AS node_b,
               CAST(count(1) AS BIGINT) AS common_neighbors
        FROM adj l JOIN adj r ON l.z = r.z AND l.u < r.u
        GROUP BY 1, 2
        HAVING count(1) >= 1),
      ne AS (
        SELECT * FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM sym
                          WHERE s = c.node_a AND d = c.node_b))
      SELECT na.n_name AS name_a, nb.n_name AS name_b, c.common_neighbors,
             round(CAST(c.common_neighbors AS DOUBLE) /
                   (da.degree + db.degree - c.common_neighbors), 6) AS jaccard
      FROM ne c
      JOIN deg da ON c.node_a = da.node
      JOIN deg db ON c.node_b = db.node
      JOIN nation na ON c.node_a = na.n_nationkey
      JOIN nation nb ON c.node_b = nb.n_nationkey
      ORDER BY c.common_neighbors DESC, name_a, name_b""",
    "q218_clustering" -> s"""
      WITH $strongTradeSql,
      ce AS (SELECT DISTINCT s AS a, d AS b FROM sym WHERE s < d),
      deg AS (SELECT node, CAST(count(1) AS BIGINT) AS degree FROM
                (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
              GROUP BY 1),
      tri AS (
        SELECT node, CAST(count(1) AS BIGINT) AS n_triangles FROM (
          SELECT unnest([e1.a, e1.b, e2.b]) AS node
          FROM ce e1 JOIN ce e2 ON e1.b = e2.a
          JOIN ce e3 ON e1.a = e3.a AND e2.b = e3.b)
        GROUP BY 1)
      SELECT n_name, deg.degree,
             coalesce(tri.n_triangles, 0) AS n_triangles,
             CASE WHEN deg.degree >= 2 THEN
               round(CAST(coalesce(tri.n_triangles, 0) AS DOUBLE) /
                 CAST(deg.degree * (deg.degree - 1) // 2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE)
             END AS clustering
      FROM deg LEFT JOIN tri USING (node)
      JOIN nation ON node = n_nationkey
      ORDER BY n_name""",
    // the q202 chain per priority group: group-partitioned cumulative
    // windows, per-group argmax row, identical guards
    "q217_ks_by_group" -> """
      WITH refr AS (SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS value
                    FROM orders WHERE o_orderkey % 97 <> 0),
      curr AS (SELECT o_orderpriority AS g,
                      CASE WHEN o_orderkey % 13 = 0
                           THEN CAST(o_totalprice AS DOUBLE) * 1.25
                           ELSE CAST(o_totalprice AS DOUBLE) END AS value
               FROM orders WHERE o_orderkey % 89 <> 0),
      ca AS (SELECT g, value, count(1) AS ca FROM refr
             WHERE value IS NOT NULL GROUP BY 1, 2),
      cb AS (SELECT g, value, count(1) AS cb FROM curr
             WHERE value IS NOT NULL GROUP BY 1, 2),
      pooled AS (SELECT coalesce(ca.g, cb.g) AS g,
                        coalesce(ca.value, cb.value) AS value,
                        coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
                 FROM ca FULL OUTER JOIN cb
                   ON ca.g IS NOT DISTINCT FROM cb.g AND ca.value = cb.value),
      t AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM pooled GROUP BY 1),
      c AS (SELECT g, value,
                   sum(ca) OVER w AS fa, sum(cb) OVER w AS fb
            FROM pooled
            WINDOW w AS (PARTITION BY g ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      d AS (SELECT c.g, c.value, t.na, t.nb,
                   CASE WHEN t.na > 0 AND t.nb > 0 THEN
                     abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb)
                   END AS d
            FROM c JOIN t ON c.g IS NOT DISTINCT FROM t.g),
      top AS (SELECT *, row_number() OVER (PARTITION BY g
                          ORDER BY d DESC, value ASC) AS rn FROM d)
      SELECT g AS o_orderpriority, na AS n_a, nb AS n_b,
             round(d, 6) + CAST(0 AS DOUBLE) AS ks,
             CASE WHEN na > 0 AND nb > 0 THEN value END AS ks_at_value,
             round(CASE WHEN na > 0 AND nb > 0 THEN
               CAST(1.358 AS DOUBLE) * sqrt(CAST(na + nb AS DOUBLE) /
                 (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) END, 6)
               + CAST(0 AS DOUBLE) AS crit_95,
             d > CAST(1.358 AS DOUBLE) * sqrt(CAST(na + nb AS DOUBLE) /
                 (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS drifted
      FROM top WHERE rn = 1 ORDER BY 1""",
    // one cumulative window over the pooled distinct prices (the oracle
    // needs no distributed scan), identical CDF divisions and the
    // CAST(1.358 AS DOUBLE) critical-value expression
    "q202_ks_drift" -> """
      WITH refr AS (SELECT CAST(o_totalprice AS DOUBLE) AS value
                    FROM orders WHERE o_orderkey % 97 <> 0),
      curr AS (SELECT CASE WHEN o_orderkey % 13 = 0
                           THEN CAST(o_totalprice AS DOUBLE) * 1.25
                           ELSE CAST(o_totalprice AS DOUBLE) END AS value
               FROM orders WHERE o_orderkey % 89 <> 0),
      ca AS (SELECT value, count(1) AS ca FROM refr
             WHERE value IS NOT NULL GROUP BY 1),
      cb AS (SELECT value, count(1) AS cb FROM curr
             WHERE value IS NOT NULL GROUP BY 1),
      pooled AS (SELECT coalesce(ca.value, cb.value) AS value,
                        coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
                 FROM ca FULL OUTER JOIN cb ON ca.value = cb.value),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM pooled),
      c AS (SELECT value,
                   sum(ca) OVER (ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
                   sum(cb) OVER (ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
            FROM pooled),
      d AS (SELECT value,
                   abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb) AS d
            FROM c, t)
      SELECT t.na AS n_a, t.nb AS n_b,
             round(d.d, 6) + CAST(0 AS DOUBLE) AS ks,
             d.value AS ks_at_value,
             round(CAST(1.358 AS DOUBLE) *
               sqrt(CAST(na + nb AS DOUBLE) /
                    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
               + CAST(0 AS DOUBLE) AS crit_95,
             d.d > CAST(1.358 AS DOUBLE) *
               sqrt(CAST(na + nb AS DOUBLE) /
                    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS drifted
      FROM d, t ORDER BY d.d DESC, d.value ASC LIMIT 1""",
    // reference deciles via quantile_cont rounded to 6 (both engines bin
    // identical boundaries); the ε-smoothed PSI term mirrors Spark's
    // expression grouping exactly
    "q186_psi_drift" -> """
      WITH rv AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                  WHERE o_orderkey % 97 <> 0),
      cv AS (SELECT CASE WHEN o_orderkey % 13 = 0
                         THEN CAST(o_totalprice AS DOUBLE) * 1.25
                         ELSE CAST(o_totalprice AS DOUBLE) END AS v
             FROM orders WHERE o_orderkey % 89 <> 0),
      b AS (SELECT list_transform(
              quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
              x -> round(x, 6)) AS qs FROM rv),
      rb AS (SELECT len(list_filter(b.qs, q -> v > q)) AS bin, count(1) AS n_ref
             FROM rv, b GROUP BY 1),
      cb AS (SELECT len(list_filter(b.qs, q -> v > q)) AS bin, count(1) AS n_cur
             FROM cv, b GROUP BY 1),
      j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
                   coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
            FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
      t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
      SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
             round(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE), 6) AS ref_frac,
             round(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS cur_frac,
             round((CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE) + 1e-6
                    - (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE) + 1e-6))
                   * ln((CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE) + 1e-6)
                        / (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE) + 1e-6)), 6)
               AS psi_term
      FROM j, t ORDER BY 1""",
    // the guarded twin: cap re-derived from the size histogram with one
    // cumulative window (the defined-approximation contract in the
    // q179 scaladoc); denominators stay global
    "q179_basket_guarded" -> """
      WITH op AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      bs AS (SELECT bk, count(1) AS k FROM op GROUP BY 1),
      hist AS (SELECT k, count(1) AS c FROM bs GROUP BY 1),
      cum AS (SELECT k, sum(c * k * (k - 1) // 2) OVER (ORDER BY k) AS cv FROM hist),
      cap AS (SELECT CASE WHEN (SELECT max(cv) FROM cum) <= 25000
                          THEN (SELECT max(k) FROM hist)
                          ELSE coalesce((SELECT max(k) FROM cum
                                         WHERE cv <= 25000 AND k <= 8), 1)
                     END AS cap),
      cold AS (SELECT op.bk, op.it FROM op JOIN bs USING (bk), cap
               WHERE bs.k <= cap.cap),
      n AS (SELECT count(1) AS n FROM bs),
      isup AS (SELECT it, count(1) AS s FROM op GROUP BY 1),
      ps AS (SELECT a.it AS item_a, b.it AS item_b, count(1) AS pair_support
             FROM cold a JOIN cold b ON a.bk = b.bk AND a.it < b.it
             GROUP BY 1, 2 HAVING count(1) >= 1),
      r AS (SELECT item_a, item_b, pair_support,
                   CAST(pair_support * n.n AS DOUBLE)
                     / CAST(sa.s * sb.s AS DOUBLE) AS lift,
                   CAST(pair_support AS DOUBLE) / CAST(sa.s AS DOUBLE) AS conf
            FROM ps, n
            JOIN isup sa ON sa.it = item_a
            JOIN isup sb ON sb.it = item_b)
      SELECT item_a, item_b, pair_support,
             round(lift, 4) AS lift, round(conf, 4) AS conf_a_to_b
      FROM (SELECT * FROM r ORDER BY lift DESC, item_a, item_b LIMIT 20) top
      ORDER BY lift DESC, item_a, item_b""",
    "q165_triangles" -> """
      WITH edges AS (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(1) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      aw AS (SELECT avg(w) AS aw FROM edges),
      fe AS (SELECT src, dst FROM edges, aw WHERE w > aw),
      ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM fe WHERE least(src, dst) < greatest(src, dst)),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM ce e1
              JOIN ce e2 ON e1.b = e2.a
              JOIN ce e3 ON e1.a = e3.a AND e2.b = e3.b),
      nodes AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
      SELECT n_name, count(1) AS n_triangles
      FROM nodes JOIN nation ON node = n_nationkey
      GROUP BY 1 ORDER BY 2 DESC, 1""",
    "q159_quality_checks" -> """
      WITH r AS (
        SELECT 'complete:o_custkey' AS check_name,
               round(CAST(count(o_custkey) AS DOUBLE) / count(1), 6) AS metric,
               CAST(count(o_custkey) AS DOUBLE) / count(1) >= 1 - 0.000000001 AS passed
        FROM orders
        UNION ALL
        SELECT 'range:o_totalprice',
               round(CAST(sum(CASE WHEN o_totalprice IS NULL THEN 0
                                   WHEN o_totalprice BETWEEN 0 AND 200000 THEN 1
                                   ELSE 0 END) AS DOUBLE) / count(o_totalprice), 6),
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 0
                             WHEN o_totalprice BETWEEN 0 AND 200000 THEN 1
                             ELSE 0 END) AS DOUBLE) / count(o_totalprice)
                 >= 1 - 0.000000001
        FROM orders
        UNION ALL
        SELECT 'satisfies:status_domain',
               round(CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1
                                   ELSE 0 END) AS DOUBLE) / count(1), 6),
               CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1
                             ELSE 0 END) AS DOUBLE) / count(1) >= 1 - 0.000000001
        FROM orders
        UNION ALL
        SELECT 'subset:o_custkey',
               round(CAST(count(1) - sum(CASE WHEN c.c_custkey IS NULL THEN 1
                                              ELSE 0 END) AS DOUBLE) / count(1), 6),
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey
        WHERE o.o_custkey IS NOT NULL
        UNION ALL
        SELECT 'unique:o_orderkey',
               round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                 / count(o_orderkey), 6),
               CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(o_orderkey)
                 >= 1 - 0.000000001
        FROM orders)
      SELECT check_name, metric, passed FROM r ORDER BY check_name""",
    // over the RAW table — the bloom-indexed rewrite must be result-invariant
    "q157_bloom_lookup" -> """
      SELECT l_orderkey, count(1) AS n_items,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE l_orderkey IN (10, 1234)
      GROUP BY 1 ORDER BY 1""",
    // over the RAW table — the z-order rewrite must be result-invariant
    "q153_zorder_scan" -> """
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
             count(1) AS n_items,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
        AND l_extendedprice >= 20000 AND l_extendedprice < 30000
      GROUP BY 1 ORDER BY 1""",
    // the q70 wrapping-fold contract: hash in HUGEINT, bands by integer
    // division in the unsigned domain, re-sign only for the xor/bit_count
    "q150_perceptual_neardup" -> """
      WITH src AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 100 = 0),
      b0 AS (
        SELECT media_id,
               list_reduce(list_prepend(CAST(0 AS HUGEINT),
                 list_transform(regexp_extract_all(text, '(?s).'),
                   c -> CAST(unicode(c) AS HUGEINT))),
                 (a, x) -> (a * 31 + x) % 18446744073709551616) AS u
        FROM src),
      h AS (SELECT media_id, u,
                   CASE WHEN u >= 9223372036854775808
                        THEN CAST(u - 18446744073709551616 AS BIGINT)
                        ELSE CAST(u AS BIGINT) END AS ahash
            FROM b0),
      bands AS (
        SELECT media_id, ahash, d.band,
               CAST((u // d.dv) % 65536 AS BIGINT) AS bval
        FROM h, (VALUES (0, CAST(1 AS HUGEINT)),
                        (1, CAST(65536 AS HUGEINT)),
                        (2, CAST(4294967296 AS HUGEINT)),
                        (3, CAST(281474976710656 AS HUGEINT))) d(band, dv)),
      p AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id)
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
      ORDER BY id_a, id_b""",
    // the q70/q150 fold contract through the byte-slice frame fallback:
    // fake duration → frame count, (i·7) mod len slice offsets, HUGEINT
    // fold per slice, unsigned-domain bands, min-fold per video pair
    "q183_video_neardup" -> """
      WITH src AS (
        SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
        WHERE doc_id % 100 = 0 AND doc_id % 3 = 2),
      par AS (
        SELECT media_id, text, length(text) AS len,
               least(4, greatest(1, (1000 + length(text) % 9000) // 500)) AS n
        FROM src),
      fr AS (
        SELECT media_id, i.i AS frame_idx,
               substring(text, ((i.i * 7) % len) + 1,
                         least(16, len - ((i.i * 7) % len))) AS sl
        FROM par, (VALUES (0),(1),(2),(3)) i(i) WHERE i.i < n),
      b0 AS (
        SELECT media_id,
               list_reduce(list_prepend(CAST(0 AS HUGEINT),
                 list_transform(regexp_extract_all(sl, '(?s).'),
                   c -> CAST(unicode(c) AS HUGEINT))),
                 (a, x) -> (a * 31 + x) % 18446744073709551616) AS u
        FROM fr),
      h AS (SELECT media_id, u,
                   CASE WHEN u >= 9223372036854775808
                        THEN CAST(u - 18446744073709551616 AS BIGINT)
                        ELSE CAST(u AS BIGINT) END AS ahash
            FROM b0),
      bands AS (
        SELECT media_id, ahash, d.band,
               CAST((u // d.dv) % 65536 AS BIGINT) AS bval
        FROM h, (VALUES (0, CAST(1 AS HUGEINT)),
                        (1, CAST(65536 AS HUGEINT)),
                        (2, CAST(4294967296 AS HUGEINT)),
                        (3, CAST(281474976710656 AS HUGEINT))) d(band, dv)),
      p AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id)
      SELECT id_a, id_b, min(hamming) AS min_hamming
      FROM p WHERE hamming <= 3
      GROUP BY 1, 2 ORDER BY 1, 2""",
    // the q70/q150 fold contract extended through the StubDecoder feature
    // affine transform and the thermometer quantizer: float rounding is
    // mirrored by CAST(... AS REAL) before the double *8 (IEEE
    // round-nearest in both engines), and the signature is non-negative so
    // bands use plain integer division
    "q180_audio_neardup" -> """
      WITH src AS (
        SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
        WHERE doc_id % 100 = 0 AND doc_id % 3 = 1),
      f AS (
        SELECT media_id,
               list_reduce(list_prepend(CAST(0 AS HUGEINT),
                 list_transform(regexp_extract_all(text, '(?s).'),
                   c -> CAST(unicode(c) AS HUGEINT))),
                 (a, x) -> (a * 31 + x) % 18446744073709551616) AS u
        FROM src),
      sg AS (
        SELECT media_id, s.i AS seg,
               least(7, CAST(floor(CAST(CAST(CAST(
                 (((u + s.i * 2654435761) % 18446744073709551616) % 2147483648)
                 AS DOUBLE) / 2147483647 AS REAL) AS DOUBLE) * 8) AS BIGINT)) AS q
        FROM f, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) s(i)),
      h AS (
        SELECT media_id,
               CAST(sum(((CAST(1 AS BIGINT) << CAST(q AS INT)) - 1)
                        << (seg * 8)) AS BIGINT) AS ahash
        FROM sg GROUP BY 1),
      bands AS (
        SELECT media_id, ahash, d.band,
               (ahash // d.dv) % 65536 AS bval
        FROM h, (VALUES (0, CAST(1 AS BIGINT)),
                        (1, CAST(65536 AS BIGINT)),
                        (2, CAST(4294967296 AS BIGINT)),
                        (3, CAST(281474976710656 AS BIGINT))) d(band, dv)),
      p AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id)
      SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
      ORDER BY hamming, id_a, id_b LIMIT 50""",
    // over the RAW table: the clustered rewrite must be result-invariant
    "q98_clustered_scan" -> """
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
             count(1) AS n_items,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1 ORDER BY 1""",
    "q70_multimodal" -> """
      WITH b AS (
        SELECT doc_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
               length(text)::BIGINT AS n_bytes,
               list_reduce(list_prepend(CAST(0 AS HUGEINT),
                 list_transform(regexp_extract_all(text, '(?s).'),
                   c -> CAST(unicode(c) AS HUGEINT))),
                 (a, x) -> (a * 31 + x) % 18446744073709551616) AS u
        FROM documents),
      s AS (
        SELECT modality, n_bytes,
               CASE WHEN u >= 9223372036854775808
                    THEN u - 18446744073709551616 ELSE u END AS c
        FROM b),
      f AS (
        SELECT modality, n_bytes,
               CASE WHEN modality = 'image'
                    THEN (64 + abs(c) % 64)::INT ELSE 0 END AS width,
               CASE WHEN modality <> 'image'
                    THEN (1000 + abs(c) % 9000)::BIGINT ELSE 0 END AS duration_ms
        FROM s)
      SELECT modality, count(1) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             max(width) AS max_width, max(duration_ms) AS max_duration_ms
      FROM f GROUP BY 1 ORDER BY 1""",
    "q76_salted_agg" -> """
      SELECT event_type, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""",
    "q77_salted_join" -> """
      SELECT c_mktsegment, count(1) AS n_events, round(sum(value), 2) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1 ORDER BY 1""")
}
