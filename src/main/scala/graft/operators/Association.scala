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
  */
object Association {

  /** Pairwise rules `(item_a, item_b, pair_support, lift, conf_a_to_b)`
    * with `pair_support ≥ minSupport`, items canonicalized `a < b`.
    */
  def pairRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    // op feeds FOUR consumers (the universe count, the item supports, and
    // both self-join sides) — snapshot it or the corpus-sized distinct
    // re-executes per consumer; itemSupp likewise feeds both sides of the
    // support join
    val op = Stage.snapshotDF(
      baskets.select(col(basketCol).as("__bk"), col(itemCol).as("__it")).distinct())
    val n = op.select("__bk").distinct().count()
    val itemSupp = Stage.snapshotDF(
      op.groupBy(col("__it")).agg(count(lit(1)).as("__s")))
    val pairSupp = op.as("a").join(op.as("b"),
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
