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
  * 2-D skylines admit a LINEAR formulation instead of the naive O(n²)
  * dominance join: aggregate to per-`maxCol`-group minima, sort the group
  * relation by `maxCol` descending, and a row survives iff (a) its
  * `minCol` beats the running min over all STRICTLY higher `maxCol`
  * groups (`ROWS … 1 PRECEDING` over the distinct-value relation — every
  * preceding row is a strictly greater value, exact for any numeric
  * axis) and (b) it attains the min of `minCol` within its own `maxCol`
  * group (equal-on-both-axes rows all survive — no strict part).
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

  /** The survive filter: one pass of the linear skyline over an optional
    * shard partition. "Strictly higher maxCol" is resolved on the
    * DISTINCT-maxCol group relation (one aggregate to per-group minima,
    * then `ROWS … 1 PRECEDING` over group rows — each preceding ROW is a
    * strictly greater value by construction), which is exact for ANY
    * numeric maxCol. A value-offset RANGE frame would only exclude values
    * within 1.0 of the current row — correct for integer axes, silently
    * wrong for fractional ones (a (min=2.0, max=5.5) row would never see
    * its (1.0, 5.9) dominator).
    */
  private def prune(df: DataFrame, shard: Option[String],
                    minCol: String, maxCol: String): DataFrame = {
    val part: Seq[Column] = shard.map(c => col(c)).toSeq
    val joinKeys = shard.toSeq :+ maxCol
    val gm = df.groupBy(joinKeys.map(col): _*).agg(min(col(minCol)).as("__gmin"))
    val wHigher = Window.partitionBy(part: _*)
      .orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val m1 = gm.withColumn("__m1", min(col("__gmin")).over(wHigher))
    df.join(m1, joinKeys)
      .filter((col("__m1").isNull || col("__m1") > col(minCol)) &&
        col(minCol) === col("__gmin"))
      .drop("__gmin", "__m1")
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
