package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The READ half of the range-clustered layout (q98): identical predicate,
  * identical result, but the clustered layout's tight per-file/row-group
  * min-max statistics let the parquet reader skip non-matching row groups,
  * while a write-order layout (every file spans the full key range) matches
  * every row group and emits the whole table into the downstream filter.
  * Asserted via the scan's own `numOutputRows` metric — the rows that
  * survived row-group pruning, BEFORE FilterExec. At 100 TB this gap is a
  * full scan vs a ~selectivity-proportional one.
  */
class LayoutPruningSpec extends SparkSuite {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet file scan in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered layout prunes row groups; write-order layout cannot") {
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_quantity")
      // LTZ: an NTZ cluster key defeats pruning (pinned by the next test)
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val base = Files.createTempDirectory("graft_prune").toString

    Sinks.writeRangeClustered(src, s"$base/clustered", "l_shipdate", numFiles = 8)
    // control: same rows, same file count, same micros encoding (via the
    // session conf — a writer .option is silently ignored, see Sinks) —
    // the only variable is the write-order (round-robin) layout
    val tsKey = "spark.sql.parquet.outputTimestampType"
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try src.repartition(8).write.parquet(s"$base/writeorder")
    finally spark.conf.unset(tsKey)

    def filtered(path: String): DataFrame =
      spark.read.parquet(path).filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))

    // the layout must never change the RESULT...
    val expected = filtered(s"$base/writeorder").count()
    assert(filtered(s"$base/clustered").count() == expected)
    assert(expected > 0, "predicate selects rows — the test is non-vacuous")

    // ...only the SCAN cost: the predicate reaches the scan in both cases,
    // but only the clustered layout's row-group stats can act on it
    val pruned = scanOutputRows(filtered(s"$base/clustered"))
    val full = scanOutputRows(filtered(s"$base/writeorder"))
    val total = src.count()
    assert(full == total,
      s"write-order layout should emit every row from the scan ($full vs $total)")
    assert(pruned >= expected, "pruning is row-group-granular, never lossy")
    assert(pruned <= total / 2,
      s"clustered scan should skip most row groups: emitted $pruned of $total")
  }

  test("z-order layout prunes on BOTH dimensions; 1-d clustering only on its own key") {
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val base = Files.createTempDirectory("graft_prune_zo").toString
    Sinks.writeRangeClustered(src, s"$base/rc", "l_shipdate", numFiles = 16)
    Sinks.writeZOrdered(src, s"$base/zo",
      unix_micros(col("l_shipdate")).cast("double"), col("l_extendedprice"), numFiles = 16)

    def priceBand(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_extendedprice") >= 20000 && col("l_extendedprice") < 30000)

    // layouts never change results
    val expected = priceBand(s"$base/rc").count()
    assert(priceBand(s"$base/zo").count() == expected)
    assert(expected > 0)
    val total = src.count()

    // a price predicate: the shipdate-clustered layout has every file
    // spanning the full price range → zero pruning; the z-layout clusters
    // the price bit-planes too → row groups skip
    val rcRows = scanOutputRows(priceBand(s"$base/rc"))
    val zoRows = scanOutputRows(priceBand(s"$base/zo"))
    assert(rcRows == total, s"1-d layout can't prune the other dim ($rcRows vs $total)")
    assert(zoRows >= expected, "pruning is row-group-granular, never lossy")
    assert(zoRows <= (total * 3) / 4,
      s"z-order should skip row groups on the second dim: emitted $zoRows of $total")

    // the 2-d predicate prunes under BOTH layouts; z-order keeps pruning
    def both(path: String): DataFrame =
      priceBand(path).filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
    assert(both(s"$base/zo").count() == both(s"$base/rc").count())
    assert(scanOutputRows(both(s"$base/zo")) < total)
  }

  test("bloom index skips row groups on a point lookup where write-order min/max cannot") {
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val base = Files.createTempDirectory("graft_prune_bloom").toString
    // same write-order (round-robin) layout both sides — min/max stats are
    // useless for a point probe in either; the bloom is the only variable
    Sinks.writeBloomIndexed(src, s"$base/bloom",
      Seq("l_orderkey" -> 200000L), numFiles = 8)
    src.repartition(8).write
      .option("parquet.enable.dictionary#l_orderkey", "false")
      .parquet(s"$base/plain")

    // key 10 has ≤2 lineitem rows at every SF — at most 2 of 8 row groups
    // are true positives, so a working bloom must skip most of the rest
    def lookup(path: String): DataFrame =
      spark.read.parquet(path).filter(col("l_orderkey") === 10L)

    val expected = lookup(s"$base/plain").count()
    assert(lookup(s"$base/bloom").count() == expected)
    assert(expected > 0, "probe key exists — the test is non-vacuous")
    val total = src.count()

    val plainRows = scanOutputRows(lookup(s"$base/plain"))
    val bloomRows = scanOutputRows(lookup(s"$base/bloom"))
    assert(plainRows == total,
      s"write-order min/max can't serve a point probe ($plainRows vs $total)")
    assert(bloomRows >= expected, "bloom pruning is row-group-granular, never lossy")
    assert(bloomRows <= total / 2,
      s"bloom should skip true-negative row groups: emitted $bloomRows of $total")

    // small IN lists consult the bloom too (Spark rewrites them below the
    // parquet pushdown threshold as an OR of equalities; the bloom visitor
    // composes over or) — a row group survives iff positive for ANY key,
    // so the probe reads the union of the per-key survivor sets, still a
    // skip whenever the union leaves true negatives
    val inRows = scanOutputRows(
      spark.read.parquet(s"$base/bloom").filter(col("l_orderkey").isin(10L, 1234L)))
    val eq1234 = scanOutputRows(
      spark.read.parquet(s"$base/bloom").filter(col("l_orderkey") === 1234L))
    assert(inRows <= eq1234 + bloomRows,
      s"IN survivor set is the union of the per-key sets ($inRows vs $eq1234 + $bloomRows)")
    assert(inRows < total, s"the 2-key IN must still skip true negatives ($inRows vs $total)")
  }

  test("pinned limitation: NTZ and INT96 cluster keys silently defeat row-group skipping") {
    val base = Files.createTempDirectory("graft_prune_ntz").toString
    def filtered(path: String): DataFrame =
      spark.read.parquet(path).filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))

    // the raw table reads as TIMESTAMP_NTZ (pyarrow file, inferTimestampNTZ)
    val srcNtz = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_quantity")
    assert(srcNtz.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    Sinks.writeRangeClustered(srcNtz, s"$base/ntz", "l_shipdate", numFiles = 8)

    val total = srcNtz.count()
    // Spark pushes the NTZ filter to the source but never converts it to a
    // parquet predicate, so the perfectly-clustered layout still reads 100%
    // of rows. If this assertion ever FAILS, Spark gained NTZ predicate
    // conversion — drop the LTZ casts in q98/writeRangeClustered callers.
    assert(scanOutputRows(filtered(s"$base/ntz")) == total,
      "NTZ row-group skipping appeared — revisit the LTZ-cast workaround")
  }
}
