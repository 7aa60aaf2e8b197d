package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event log: split each user's event sequence
  * at inactivity gaps > `gapMs`, the classical lag + running-sum-of-breaks
  * assignment. The batch twin of the streaming `session_window` query (q62):
  * same grouping semantics, but with per-session ordinals available.
  *
  * Scale: both windows share one partitioning (the user key) — Catalyst plans
  * a single shuffle + sort and evaluates lag and the running sum in the same
  * Window stage. Tie-break on `idCol` keeps the ordering total, so session
  * ids are stable under retries.
  */
object Sessionize {

  def assign(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, gapMs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ms", lag(unix_millis(col(tsCol)), 1).over(order))
      .withColumn("__brk",
        when(col("__prev_ms").isNull ||
          unix_millis(col(tsCol)) - col("__prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .drop("__prev_ms", "__brk")
  }

  /** The snapshotted within-session transition counts — shared by
    * [[transitionMatrix]] and [[entropyRate]] so the two can never
    * disagree on the gap rule.
    */
  private def transitions(events: DataFrame, userCol: String, tsCol: String,
                          idCol: String, typeCol: String, gapMs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__prev_ms", lag(unix_millis(col(tsCol)), 1).over(order))
      .withColumn("__prev_ty", lag(col(typeCol), 1).over(order))
      .filter(col("__prev_ms").isNotNull &&
        unix_millis(col(tsCol)) - col("__prev_ms") <= gapMs)
      .groupBy(col("__prev_ty").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .transform(Stage.snapshotDF) // feeds the row totals AND the output
  }

  /** First-order Markov transition matrix over within-session event
    * sequences: for every consecutive pair inside a session (same user,
    * inter-event gap ≤ `gapMs` — the [[assign]] break rule, so a session
    * boundary never fabricates a transition), the count and the
    * row-normalized probability p(to | from). The behavioral bigram model
    * behind next-event prediction, funnel diagnosis, and bot detection
    * (a scraper's transition rows are near-deterministic; a human's are
    * not).
    *
    * Cost shape: ONE user-key shuffle — the lag window rides the
    * [[assign]] sort — then a |types|²-bounded count and a broadcast-size
    * row-total join. Probabilities are exact-integer-double divisions
    * (round 6), counts exact; no float accumulation anywhere.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String, gapMs: Long): DataFrame = {
    val trans = transitions(events, userCol, tsCol, idCol, typeCol, gapMs)
    val rowTot = trans.groupBy("from_type").agg(sum("n").as("__rt"))
    trans.join(broadcast(rowTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (round(col("n").cast("double") / col("__rt").cast("double"), 6) + lit(0.0))
          .as("p"))
  }

  /** Top session event-type trigrams: consecutive (t₁→t₂→t₃) paths where
    * BOTH hops land within `gapMs` (the q57/q207 session-break rule —
    * a boundary can never fabricate a path) — the order-3 extension of
    * [[transitionMatrix]] that separates checkout funnels from pogo
    * loops a 2-gram matrix conflates. Two lag projections over ONE
    * user-key window exchange; counts exact; the k-cut orders by
    * (n desc, types asc) — all-integer-and-string, no rounding contract.
    */
  def sessionTrigrams(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, typeCol: String, gapMs: Long,
                      topN: Int = 20): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__ms", unix_millis(col(tsCol)))
      .withColumn("__p1_ms", lag(col("__ms"), 1).over(order))
      .withColumn("__p1_ty", lag(col(typeCol), 1).over(order))
      .withColumn("__p2_ms", lag(col("__ms"), 2).over(order))
      .withColumn("__p2_ty", lag(col(typeCol), 2).over(order))
      .filter(col("__p2_ms").isNotNull &&
        col("__ms") - col("__p1_ms") <= gapMs &&
        col("__p1_ms") - col("__p2_ms") <= gapMs)
      .groupBy(col("__p2_ty").as("t1"), col("__p1_ty").as("t2"),
        col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(topN)
  }

  /** Markov entropy rate of the session process (nats per transition):
    *
    *   H = Σ_s π(s) Σ_t p(s→t)(−ln p(s→t)) = Σ_{s,t} (n_st/N)(−ln(n_st/rt_s))
    *
    * with π the empirical from-state distribution — "how predictable is
    * the next event", the one-number sequence-complexity gate (a bot's
    * loop scores near 0; uniform wandering over T states scores ln T).
    * Each cell term is quantized to an exact 1e-9 integer (the q148
    * posture at nano precision) BEFORE the global sum, so the result is
    * combine-order-proof; one closing division and round. Transition
    * derivation is [[transitions]] — the q207 gap rule verbatim.
    */
  def entropyRate(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, gapMs: Long): DataFrame = {
    val trans = transitions(events, userCol, tsCol, idCol, typeCol, gapMs)
    val rowTot = trans.groupBy("from_type").agg(sum("n").as("__rt"))
    val tot = trans.agg(sum("n").as("__N"),
      count_distinct(col("from_type")).as("__S"))
    trans.join(broadcast(rowTot), Seq("from_type"))
      .crossJoin(broadcast(tot))
      .select(col("__N"), col("__S"),
        floor((col("n").cast("double") / col("__N").cast("double")) *
          -log(col("n").cast("double") / col("__rt").cast("double")) *
          lit(1e9) + lit(0.5)).cast("long").as("__q"))
      .groupBy(col("__N").as("n_transitions"), col("__S").as("n_states"))
      .agg((round(sum("__q").cast("double") / lit(1e9), 6) + lit(0.0))
        .as("entropy_nats"))
  }

  /** Per-session rollup: event count and duration per (user, session). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapMs: Long): DataFrame =
    assign(events, userCol, tsCol, idCol, gapMs)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_millis(col(tsCol))) - min(unix_millis(col(tsCol)))).as("dur_ms"))

  /** Time-BINNED interval join — the 100 TB form of "per probe event, the
    * build events of the same key within the trailing `windowMs`": bin both
    * sides at `windowMs` granularity, explode each probe row into its two
    * candidate bins (its own and the previous — a trailing window of length
    * `windowMs` can only reach build rows in those), EQUI-join on
    * (key, bin), and post-filter the exact interval. Catalyst plans a
    * hash-partitioned join keyed by (key, bin) — shuffle volume O(|probe|·2
    * + |build|), AQE-splittable on hot keys — where the naive formulation
    * (`p.key = b.key AND b.ts BETWEEN p.ts - w AND p.ts`) degrades to a
    * BroadcastNestedLoopJoin the moment neither side broadcasts: every
    * (key-match) pair is enumerated at 100 TB. Same candidate-bin trick as
    * multi-probe LSH (q93): bounded key expansion buys an equi-join shape.
    *
    * TRUE left-join semantics, row for row: a matched probe emits exactly
    * its match rows (exactly one candidate bin can carry any true match —
    * a build row has one bin — so matches are never duplicated), and a
    * probe with NO match in either bin emits ONE null-extended row. The
    * miss side is the probe anti-joined against the snapshotted match
    * relation on `idCol` (the probe's unique id) — the earlier left_outer
    * formulation leaked a phantom null row from a matched probe's OTHER
    * candidate bin, visible to any consumer beyond the
    * count(buildCol)-per-id aggregate. Returns probe columns + `__b_ts`
    * (matched build event time, null on miss).
    */
  def binnedIntervalJoin(probe: DataFrame, build: DataFrame,
                         keyCol: String, tsCol: String, idCol: String,
                         windowMs: Long): DataFrame = {
    require(windowMs > 0 && windowMs <= Long.MaxValue / 1000L,
      s"need 0 < windowMs <= ${Long.MaxValue / 1000L} (µs conversion must not overflow), got $windowMs")
    // compare at MICROsecond precision: event timestamps carry µs, and a
    // millisecond-truncated comparison would misclassify boundary pairs
    // that the full-precision oracle (BETWEEN on timestamps) gets right
    val windowUs = windowMs * 1000L
    val pm = unix_micros(col(tsCol))
    val p = probe
      .withColumn("__p_us", pm)
      .withColumn("__bin",
        explode(array(floor(pm / windowUs) - 1, floor(pm / windowUs))))
    val b = build.select(
      col(keyCol).as("__b_key"),
      col(tsCol).as("__b_ts"),
      unix_micros(col(tsCol)).as("__b_us"),
      floor(unix_micros(col(tsCol)) / windowUs).as("__bin"))
    val matched = Stage.snapshotDF(p.join(b,
        p(keyCol) === b("__b_key") && p("__bin") === b("__bin") &&
          col("__b_us") >= col("__p_us") - windowUs &&
          col("__b_us") <= col("__p_us"),
        "inner")
      .drop("__b_key", "__b_us", "__p_us", "__bin"))
    val missed = probe
      .join(matched.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .withColumn("__b_ts", lit(null).cast(build.schema(tsCol).dataType))
    matched.unionByName(missed.select(matched.columns.map(col): _*))
  }
}
