package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch with a fully SQL-replayable definition —
  * the deterministic sibling the q151 `approx_percentile` audit lacks
  * (GK sketch internals are not replayable in an oracle), extending the
  * round-13 KMV-beside-HLL pattern to quantiles.
  *
  * Bucketization is DECIMAL-MANTISSA: a positive integer value v lands
  * in the bucket spanned by its first two decimal digits —
  * lo = m·10^(d−2), hi = (m+1)·10^(d−2) − 1 where d = digit count and
  * m = leading two digits (single-digit values get exact singleton
  * buckets). Everything is STRING-INTEGER arithmetic (digit count,
  * substring, zero-padding rebuild) — no logs, no doubles, so DuckDB
  * replays the sketch bit-for-bit and the driver gate can hash-check
  * it. Relative bucket width is ≤ 1/m ≤ 10% (m ≥ 10), i.e. every
  * quantile estimate carries a ≤ 10% relative bound by construction —
  * log-scale accuracy like a t-digest, but with FIXED boundaries, which
  * is exactly what makes the sketch mergeable: partials from any
  * sharding agree on bucket identity and merge by count addition
  * (proven shard ≡ whole in QuantileSketchSpec).
  *
  * Scale shape: the sketch is ONE distributed count aggregation
  * (partial+final, map-side combined); the bucket relation is ≤ 90
  * buckets per digit count (≤ ~1.7k rows for the full long range), so
  * [[estimate]]'s cumulative window is bounded by construction — see
  * the PLANS.md global-window table. At 100 TB the sketch is the only
  * thing that moves: 1.7k (bucket, count) rows per shard/day merge into
  * the fleet-wide quantile store; the reference re-reads everything
  * (`ingester/es_common.py:273-330`) and has no sketch surface at all.
  *
  * Contract: values must be non-negative integers (quantize doubles
  * first — the q145 integer-cents/1e-6 conventions); negative values
  * are rejected by filter, matching the oracle's WHERE.
  */
object QuantileSketch {

  /** Per-bucket partials (bucket_lo, bucket_hi, cnt) of a non-negative
    * integer column. Bucket identity is exact string-integer arithmetic,
    * identical in Spark and DuckDB.
    */
  def sketch(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val base = df.select(v.as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .withColumn("__s", col("__v").cast("string"))
      .withColumn("__d", length(col("__s")))
    val lo = when(col("__d") === 1, col("__v"))
      .otherwise(concat(substring(col("__s"), 1, 2),
        repeat(lit("0"), col("__d") - 2)).cast("long"))
    val hi = when(col("__d") === 1, col("__v"))
      .otherwise(concat(
        (substring(col("__s"), 1, 2).cast("long") + 1).cast("string"),
        repeat(lit("0"), col("__d") - 2)).cast("long") - 1)
    base.select(lo.as("bucket_lo"), hi.as("bucket_hi"))
      .groupBy("bucket_lo", "bucket_hi")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch partials (any union of [[sketch]] outputs): fixed
    * boundaries make this plain count addition per bucket.
    */
  def merge(parts: DataFrame): DataFrame =
    parts.groupBy("bucket_lo", "bucket_hi").agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a (possibly merged) sketch. Lower-
    * percentile convention shared with [[Checks.exactPercentiles]]:
    * the FIRST bucket whose cumulative count reaches rank
    * ⌈p·n/100⌉ — the pure-integer comparison `cum·100 ≥ n·p`, no
    * division anywhere. One row per requested percentile:
    * (pct, n_rows, est_lo, est_hi); the true quantile is guaranteed
    * inside [est_lo, est_hi].
    *
    * The cumulative window is partition-less BUT bucket-bounded
    * (≤ 90 buckets per digit count — the PLANS.md global-window
    * contract), never data-sized.
    */
  def estimate(sk: DataFrame, percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    val w = Window.orderBy("bucket_lo")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = Stage.snapshotDF(sk
      .withColumn("__cum", sum("cnt").over(w)))
    val n = cum.agg(sum("cnt").as("__n"))
    val ps = percentiles.map(p => struct(lit(p).as("p")))
    val pRows = cum.sparkSession.range(1)
      .select(explode(array(ps: _*)).as("__p"))
      .select(col("__p.p").as("pct"))
    pRows.crossJoin(broadcast(n))
      .join(cum, col("__cum") * 100 >= col("__n") * col("pct"))
      .groupBy("pct")
      .agg(max("__n").as("n_rows"),
        min(struct(col("bucket_lo"), col("bucket_hi"))).as("__b"))
      .select(col("pct"), col("n_rows"),
        col("__b.bucket_lo").as("est_lo"), col("__b.bucket_hi").as("est_hi"))
      .orderBy("pct")
  }
}
