package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (the 100 TB posture, SURVEY §7.4).
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); these helpers
  * cover the two shapes AQE does not:
  *
  *  - [[saltedAggregate]]: a groupBy where one key holds a large fraction of
  *    all rows (e.g. split-by-field routing when 90% of annotations are one
  *    type, K4). Two-phase: salt the key into `numSalts` subkeys, partial
  *    aggregate, then merge — the hot key's rows spread over `numSalts`
  *    reducers instead of one.
  *  - [[saltedJoin]]: fact⋈dim equi-join with a hot fact key and a dim too
  *    big to broadcast: salt the fact side, explode the dim side across all
  *    salt values.
  */
object Skew {

  /** Two-phase salted aggregation: `agg` must be decomposable
    * (count/sum/min/max — merged by `merge`). Example:
    * {{{
    *   saltedAggregate(df, Seq("k"), count(lit(1)).as("n"), sum("n").as("n"))
    * }}}
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      partial: Column,
      merge: Column,
      numSalts: Int = 16): DataFrame = {
    // salt must be DETERMINISTIC per row: partition-id/monotonic-id change
    // under stage retry, which re-buckets partial aggregates already fetched
    // by reducers (the SPARK-23207 shuffle-nondeterminism class of bug).
    // Hashing the full row content is stable across recomputation.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(c => col(s"`$c`")): _*), lit(numSalts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial)
      .groupBy(keys.map(col): _*)
      .agg(merge)
  }

  /** Salted equi-join: fact's hot keys spread across `numSalts` partitions,
    * dim replicated once per salt value. Join keys: `factKey` = `dimKey`.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      numSalts: Int = 16): DataFrame = {
    // Content-hash salt, same rationale as saltedAggregate: a
    // monotonically_increasing_id-based salt changes under stage retry
    // (SPARK-23207 class), re-bucketing rows between already-fetched and
    // recomputed map outputs. Identical rows sharing a salt is fine for a
    // join — the dim side is replicated across every salt value.
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(c => col(s"`$c`")): _*), lit(numSalts)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }
}
