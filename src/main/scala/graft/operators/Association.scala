package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs: pairwise support /
  * confidence / lift from exact co-occurrence counts.
  *
  * Scale shape: one distinct projection of (basket, item), one self-join
  * keyed on the basket (pair volume Σ basket-size² — baskets, not the
  * catalog, bound the blow-up), one aggregation to pair supports, then a
  * broadcast-sized join against the per-item supports. Every statistic is
  * an exact integer ratio evaluated in one declared double expression, so
  * the result is engine-stable with no rounding contract.
  *
  * The Σ basket-size² term is unbounded on real data — one crawler
  * session with 10⁵ items detonates the pair stage on its own — so the
  * production surface is [[pairRulesGuarded]], which predicts the pair
  * volume first and excises hot baskets when it exceeds a budget (the
  * containment-guard convention, [[Dedup.containmentDropsGuarded]]).
  * [[pairRules]] is the open exact form: right when basket sizes are
  * known-bounded (TPC-H orders ≤ 7 items) and as the guarded form's
  * under-budget fast path.
  */
object Association {

  /** Pairwise rules `(item_a, item_b, pair_support, lift, conf_a_to_b)`
    * with `pair_support ≥ minSupport`, items canonicalized `a < b`.
    * UNGUARDED — Σ basket-size² pair volume; see [[pairRulesGuarded]].
    */
  def pairRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    val op = snapshotProjection(baskets, basketCol, itemCol)
    rulesFrom(op, op, minSupport)
  }

  /** GUARDED pairwise rules — same output contract as [[pairRules]], with
    * the pair stage's Σ basket-size² volume bounded up front:
    *
    *   1. PREDICT: per-basket distinct-item counts (one aggregation over
    *      the projection — linear) give the exact pair volume
    *      Σ k·(k−1)/2 as a one-row driver scalar.
    *   2. Under `pairBudget` → the exact open form, bit-identical to
    *      [[pairRules]] (spec-pinned).
    *   3. Over budget → baskets with more than `hotBasketCap` distinct
    *      items are EXCLUDED from the pair stage (the linear rule: a
    *      mega-basket — a crawler session, a bot cart — costs only its
    *      size to detect and contributes no pairs). Item supports and the
    *      basket universe `n` stay exact over ALL baskets, so `conf` and
    *      `lift` denominators are unchanged; `pair_support` becomes a
    *      documented UNDERCOUNT of the open form, restricted to
    *      co-occurrence within ≤ `hotBasketCap`-item baskets. The degrade
    *      is observable via the `graft.basketGuard` observe metric
    *      (`hot_baskets`, `skipped_pairs` = the pair volume excised) —
    *      the no-silent-caps convention.
    *
    * Defined-approximation semantics (the q108/q130 oracle convention):
    * over-budget output is exactly "pair statistics over the ≤ cap-item
    * baskets with exact global denominators" — reproducible by any engine
    * from the definition, not a best-effort truncation.
    */
  def pairRulesGuarded(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      pairBudget: Long = 1000000L,
      hotBasketCap: Int = 256): DataFrame = {
    require(pairBudget > 0, s"need pairBudget > 0, got $pairBudget")
    require(hotBasketCap > 1, s"need hotBasketCap > 1, got $hotBasketCap")
    val op = snapshotProjection(baskets, basketCol, itemCol)
    // feeds the volume estimate AND the hot/cold split
    val bs = Stage.snapshotDF(op.groupBy("__bk").agg(count(lit(1)).as("__k")))
    // k·(k−1)/2 in pure integer arithmetic (k·(k−1) is even; `/` on
    // Columns is double division, lossy past 2^53)
    val pairVol = shiftright(col("__k") * (col("__k") - lit(1L)), 1)
    val predicted = bs
      .agg(coalesce(sum(pairVol), lit(0L)).as("vol"))
      .head().getLong(0)
    if (predicted <= pairBudget) rulesFrom(op, op, minSupport)
    else {
      val obs = bs.observe(s"graft.basketGuard.${Dedup.capObsId.incrementAndGet()}",
        sum(when(col("__k") > hotBasketCap, 1L).otherwise(0L)).as("hot_baskets"),
        sum(when(col("__k") > hotBasketCap, pairVol).otherwise(0L))
          .as("skipped_pairs"))
      // cold projection feeds BOTH self-join sides — snapshot it (this
      // also fires the observe exactly once, at the barrier)
      val coldOp = Stage.snapshotDF(
        op.join(obs.filter(col("__k") <= hotBasketCap).select("__bk"), Seq("__bk")))
      rulesFrom(op, coldOp, minSupport)
    }
  }

  /** The snapshotted distinct (basket, item) projection — it fans out to
    * the universe count, the item supports, and both self-join sides, so
    * the corpus-sized distinct must not re-execute per consumer.
    */
  private def snapshotProjection(
      baskets: DataFrame, basketCol: String, itemCol: String): DataFrame =
    Stage.snapshotDF(
      baskets.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct())

  /** Rules with supports/universe from `op` (always the FULL projection —
    * exact denominators) and the pair stage over `pairOp` (full in the
    * open form, hot-baskets-excised in the guarded degrade). Both inputs
    * must be snapshotted: `op` feeds two consumers, `pairOp` both join
    * sides.
    */
  private def rulesFrom(
      op: DataFrame, pairOp: DataFrame, minSupport: Long): DataFrame = {
    val n = op.select("__bk").distinct().count()
    val itemSupp = Stage.snapshotDF(
      op.groupBy(col("__it")).agg(count(lit(1)).as("__s")))
    val pairSupp = pairOp.as("a").join(pairOp.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("item_a"), col("b.__it").as("item_b"))
      .agg(count(lit(1)).as("pair_support"))
      .filter(col("pair_support") >= minSupport)
    pairSupp
      .join(itemSupp.select(col("__it").as("item_a"), col("__s").as("__sa")), "item_a")
      .join(itemSupp.select(col("__it").as("item_b"), col("__s").as("__sb")), "item_b")
      .select(col("item_a"), col("item_b"), col("pair_support"),
        ((col("pair_support") * lit(n)).cast("double") /
          (col("__sa") * col("__sb")).cast("double")).as("lift"),
        (col("pair_support").cast("double") / col("__sa").cast("double"))
          .as("conf_a_to_b"))
  }
}
