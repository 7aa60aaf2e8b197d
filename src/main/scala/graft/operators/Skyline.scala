package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) over two conflicting objectives — keep every
  * row no other row beats on BOTH axes: `b` dominates `a` iff
  * `b.minCol ≤ a.minCol ∧ b.maxCol ≥ a.maxCol` with at least one strict.
  * The multi-objective shortlist operator (cheapest-per-capability,
  * best-quality-per-cost) that top-k by any single score cannot express.
  *
  * 2-D skylines admit a LINEAR window formulation instead of the naive
  * O(n²) dominance join: sort by `maxCol` descending and a row survives
  * iff (a) its `minCol` beats the running min over all STRICTLY higher
  * `maxCol` values (`RANGE … 1 PRECEDING` — equal-value peers excluded by
  * the frame, so ties never dominate each other through this window) and
  * (b) it attains the min of `minCol` within its own `maxCol` group
  * (equal-on-both-axes rows all survive — no strict part).
  *
  * Scale shape — the skyline-of-skylines decomposition: pass 1 runs that
  * filter WITHIN each of `shards` deterministic hash shards (each shard's
  * window sorts only its own partition; anything locally dominated is
  * globally dominated, so pruning is sound regardless of the sharding),
  * pass 2 re-runs the same filter once over the union of shard survivors —
  * a skyline-band-sized relation (one global-order window on a single
  * partition, the standard final-merge of distributed skyline algorithms;
  * the corpus-sized data never sees a global sort).
  */
object Skyline {

  /** The survive filter: one pass of the two-window linear skyline over
    * an optional shard partition.
    */
  private def prune(df: DataFrame, shard: Option[String],
                    minCol: String, maxCol: String): DataFrame = {
    val part: Seq[Column] = shard.map(c => col(c)).toSeq
    val wHigher = Window.partitionBy(part: _*)
      .orderBy(col(maxCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(part :+ col(maxCol): _*)
    df.withColumn("__m1", min(col(minCol)).over(wHigher))
      .withColumn("__ms", min(col(minCol)).over(wSame))
      .filter((col("__m1").isNull || col("__m1") > col(minCol)) &&
        col(minCol) === col("__ms"))
      .drop("__m1", "__ms")
  }

  /** Skyline minimizing `minCol` while maximizing `maxCol`. `idCol` (any
    * numeric key) drives the deterministic shard assignment; both
    * objective columns must be non-null numerics.
    */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String,
                idCol: String, shards: Int = 32): DataFrame = {
    require(shards > 0, s"need shards > 0, got $shards")
    val local = prune(
      df.withColumn("__shard", pmod(col(idCol), lit(shards))),
      Some("__shard"), minCol, maxCol).drop("__shard")
    prune(local, None, minCol, maxCol)
  }
}
