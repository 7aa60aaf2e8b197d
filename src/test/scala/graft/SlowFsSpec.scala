package graft

import org.apache.spark.sql.functions._

import graft.operators.Stage
import graft.sources.Sinks
import graft.tools.SlowFs

/** Pins for the object-store simulator behind the q263 FS re-pricing
  * ([[graft.tools.BenchSlowFs]]): the `slow://` filesystem must be a
  * VALUE-transparent wrapper — same rows through the batch-store round
  * trip, same scratch-dir contract — or the re-priced seconds measure a
  * different computation. Latency knobs are dialed to 1 ms here; the
  * pricing run uses the S3-ballpark defaults (25/50 ms).
  */
class SlowFsSpec extends SparkSuite {

  import spark.implicits._

  private def withSlowFs[A](body: String => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slow.impl", classOf[SlowFs].getName)
    // the FileSystem cache pins the conf captured at FIRST instantiation;
    // these specs re-dial the latency knobs between tests, so every
    // getFileSystem must see the current conf
    hc.setBoolean("fs.slow.impl.disable.cache", true)
    hc.setLong("fs.slow.latency.ms", 1L)
    hc.setLong("fs.slow.mutate.latency.ms", 1L)
    val root = java.nio.file.Files.createTempDirectory("graft-slowfs-spec")
    try body(s"slow://$root")
    finally Stage.deleteScratch(spark, s"slow://$root")
  }

  test("batch store through slow:// round-trips bit-identically to local") {
    withSlowFs { slowRoot =>
      val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      val delta = Seq((2L, "b2"), (4L, "d")).toDF("id", "v")
      val localRoot = java.nio.file.Files.createTempDirectory("graft-localfs-spec")
      def roundTrip(root: String): Set[(Long, String)] = {
        Sinks.appendBatchPartition(spark, rows, s"$root/store", 0L)
        Sinks.appendBatchPartition(spark, delta, s"$root/store", 1L)
        val got = Sinks.readBatchStore(spark, s"$root/store").get
        got.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      }
      val viaSlow = roundTrip(slowRoot)
      val viaLocal = roundTrip(localRoot.toString)
      assert(viaSlow == viaLocal)
      // the commit marker must exist on the slow store too — the pricing
      // run reads with the same requireCommitted gates as production
      val p = new org.apache.hadoop.fs.Path(s"$slowRoot/store/batch=1", Sinks.CommitMarker)
      assert(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
    }
  }

  test("Stage.scratchDir honors a slow:// scratch root and deleteScratch clears it") {
    withSlowFs { slowRoot =>
      spark.conf.set(Stage.ScratchConf, slowRoot)
      try {
        val dir = Stage.scratchDir(spark, "spec")
        // Hadoop Path.toString renders a no-authority URI as slow:/tmp/...
        assert(dir.startsWith("slow:/"), s"scratch dir not on slow://: $dir")
        Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/t")
        val back = spark.read.parquet(s"$dir/t").as[(Int, String)].collect()
        assert(back.toSeq == Seq((1, "x")))
        Stage.deleteScratch(spark, dir)
        val p = new org.apache.hadoop.fs.Path(dir)
        assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      } finally spark.conf.unset(Stage.ScratchConf)
    }
  }

  test("latency knobs really throttle: mutate ops pay the configured sleep") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slow.impl", classOf[SlowFs].getName)
    hc.setBoolean("fs.slow.impl.disable.cache", true)
    val root = java.nio.file.Files.createTempDirectory("graft-slowfs-lat")
    try {
      hc.setLong("fs.slow.mutate.latency.ms", 80L)
      hc.setLong("fs.slow.latency.ms", 0L)
      val fs = new org.apache.hadoop.fs.Path(s"slow://$root")
        .getFileSystem(hc)
      val t0 = System.nanoTime()
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"slow://$root/sub"))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(elapsedMs >= 80.0, s"mkdirs returned in ${elapsedMs}ms under an 80ms knob")
    } finally {
      hc.setLong("fs.slow.mutate.latency.ms", 50L)
      hc.setLong("fs.slow.latency.ms", 25L)
    }
  }
}
