package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan: Catalyst handles column pruning and
  * predicate pushdown (verified via `.explain` — `PushedFilters`/`ReadSchema`),
  * which replaces the reference's hand-coded `stored_fields: []` projection
  * and ES range queries (reference: `ingester/es_common.py:273-330`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** Schema-adaptive `events` loader. Generators have shipped `ts` both as
    * parquet TIMESTAMP(NANOS) — which Spark's reader rejects unless
    * `nanosAsLong` surfaces it as a long — and as plain `timestamp[us]`.
    * The legacy conf only affects NANOS columns, so it is safe to leave on;
    * after the scan we branch on the materialized dtype: a long means
    * nanos-as-long (truncate to micros, matching DuckDB); TIMESTAMP_NTZ is
    * normalized to TIMESTAMP (identical wall-clock under the UTC session tz
    * every entrypoint sets, and the type downstream `unix_millis` frames /
    * session windows require); TIMESTAMP passes through untouched.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
