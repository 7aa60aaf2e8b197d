package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Data-layout contract of the range-clustered writer: the property that
  * makes file/row-group skipping work at scan time is that files cover
  * DISJOINT ranges of the cluster key — asserted directly by reading every
  * output file alone and checking the [min, max] intervals don't overlap.
  */
class SinksLayoutSpec extends SparkSuite {

  test("writeRangeClustered produces files with pairwise-disjoint key ranges " +
      "and preserves every row") {
    val out = java.nio.file.Files.createTempDirectory("graft_rc").toString
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Sinks.writeRangeClustered(src, out, "l_orderkey", numFiles = 4)

    val back = spark.read.parquet(out)
    assert(back.count() == src.count(), "rows lost or duplicated by the rewrite")

    val files = back.inputFiles
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")
    val ranges = files.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      // an empty part-file would yield null aggs — surface it as the layout
      // failure it is, not an NPE in getLong
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"empty output file: $f")
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // strict <: RangePartitioner keeps equal keys in one partition, so a
    // shared boundary value would mean rows with one key straddle two files
    // — exactly the regression that breaks point-predicate file skipping
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"file ranges overlap or touch: ...$hi] vs [$lo2...")
    }
  }

  test("compact repacks a fragmented sink, preserves rows, can re-cluster") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/sink"
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    src.repartition(20).write.parquet(out)
    def files = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    val before = files
    assert(before == 20, s"fixture should be fragmented, got $before files")
    val rows = src.count()

    // target = total size → everything packs into one file
    val totalBytes = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Sinks.compact(spark, out, targetFileBytes = totalBytes)
    assert(n < before, s"compaction should reduce file count, got $n")
    assert(files == n)
    assert(spark.read.parquet(out).count() == rows, "compaction must not lose rows")

    // re-clustering compaction restores disjoint key ranges (the layout
    // the pruned-scan path needs) instead of round-robin packing; target
    // from the CURRENT compacted size (the first compaction shed the 20
    // files' footer overhead, so the old total would over-size the target)
    val compactedBytes = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    Sinks.compact(spark, out, targetFileBytes = math.max(1, compactedBytes / 4),
      clusterCol = Some("l_orderkey"))
    val back = spark.read.parquet(out)
    assert(back.count() == rows)
    val rrs = back.inputFiles.toSeq.map { f =>
      val r = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(rrs.length > 1, "clustered compaction should produce multiple files")
    rrs.zip(rrs.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"compacted files must keep disjoint ranges: $hi vs $lo2")
    }
  }

  test("compactPartitioned compacts each partition dir; flat compact refuses the root") {
    val out = java.nio.file.Files.createTempDirectory("graft_cpart").toString + "/sink"
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .repartition(6) // fragment each partition into several part files
    Sinks.writePartitioned(src, out, "l_returnflag")
    val rows = src.count()
    def partFiles(dir: java.io.File): Int =
      dir.listFiles.count(_.getName.endsWith(".parquet"))
    val partDirs = new java.io.File(out).listFiles.filter(_.getName.contains("="))
    assert(partDirs.nonEmpty && partDirs.forall(partFiles(_) > 1),
      "fixture should be fragmented per partition")

    // the flat form must refuse the partitioned root (pruning protection)…
    intercept[IllegalArgumentException](Sinks.compact(spark, out, Long.MaxValue))
    // …and the partitioned form compacts inside each partition directory
    val (nParts, nFiles) = Sinks.compactPartitioned(spark, out, Long.MaxValue)
    assert(nParts == partDirs.length)
    assert(nFiles == nParts, s"one file per partition at an unbounded target, got $nFiles")
    val back = spark.read.parquet(out)
    assert(back.count() == rows, "no rows lost")
    assert(back.select("__part").distinct().count() == nParts.toLong,
      "partition column must survive (pruning layout intact)")
    // the swap's temp dirs are dot-prefixed (hidden): nothing visible to
    // partition discovery may remain, or a crash would fabricate partitions
    assert(!new java.io.File(out).listFiles.exists(_.getName.contains("__tmp")),
      "swap temp dirs must not be discoverable partition names")
    // crash-safety: a leftover mid-swap temp dir is INVISIBLE to readers —
    // simulate a crash between tmp-write and rename and reread the root
    val crashTmp = new org.apache.hadoop.fs.Path(out, ".__part=zz__tmp")
    spark.read.parquet(partDirs.head.toString).write.parquet(crashTmp.toString)
    assert(spark.read.parquet(out).count() == rows,
      "a dot-prefixed crash leftover must not surface as a phantom partition")
    // and a re-run of maintenance neither compacts nor counts it
    assert(Sinks.compactPartitioned(spark, out, Long.MaxValue)._1 == nParts)

    // multi-level partitioning fails fast BEFORE any rewrite
    val nested = java.nio.file.Files.createTempDirectory("graft_cnest").toString + "/sink"
    src.limit(100).withColumn("c2", lit("x"))
      .write.partitionBy("l_returnflag", "c2").parquet(nested)
    val e = intercept[IllegalArgumentException](
      Sinks.compactPartitioned(spark, nested, Long.MaxValue))
    assert(e.getMessage.contains("single-level"))
  }

  test("compactPartitioned heals a crashed partition swap instead of orphaning it") {
    val out = java.nio.file.Files.createTempDirectory("graft_cheal").toString + "/sink"
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag").repartition(4)
    Sinks.writePartitioned(src, out, "l_returnflag")
    val rows = src.count()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate compact() dying between replaceWith's two renames: the
    // partition survives ONLY as the hidden .name__old aside copy
    val part = new java.io.File(out).listFiles.filter(_.getName.contains("=")).head
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(part.toString),
      new org.apache.hadoop.fs.Path(out, "." + part.getName + "__old")))
    assert(spark.read.parquet(out).count() < rows,
      "fixture: the crashed partition must be invisible to readers")
    // maintenance must restore it before compacting — not skip it forever
    Sinks.compactPartitioned(spark, out, Long.MaxValue)
    assert(spark.read.parquet(out).count() == rows,
      "crashed swap partition lost after maintenance")
  }

  test("compactPartitioned refuses a batch store whose side files it would strip") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_cbatch").toString + "/store"
    Sinks.appendBatchPartition(spark,
      Seq((1L, "a")).toDF("id", "v"), store, 0L)
    val e = intercept[IllegalArgumentException](
      Sinks.compactPartitioned(spark, store, Long.MaxValue))
    assert(e.getMessage.contains("compactBatchStore"), e.getMessage)
  }
}
