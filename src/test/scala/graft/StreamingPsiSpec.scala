package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Checks
import graft.streaming.{PsiEvent, StreamingPsi}

/** Pins [[graft.streaming.StreamingPsi]] against the batch gate
  * [[graft.operators.Checks.populationStability]]: same boundaries
  * (Checks.referenceBins), same reference fractions, same ε-smoothed
  * rounded terms — a drained in-order stream's final snapshot is
  * bit-identical to the batch per-bin rows. Plus the monitor contract:
  * snapshots re-emit per batch, counters persist across batches, groups
  * are independent.
  */
class StreamingPsiSpec extends SparkSuite {
  import spark.implicits._

  test("final snapshot ≡ batch populationStability bit-for-bit; per-batch re-emission") {
    val ref = (0 to 100).map(_.toDouble).toDF("v")
    val curVals = (61 to 160).map(_.toDouble)
    val batch = Checks.populationStability(ref, curVals.toDF("v"), "v", bins = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(4), r.getDouble(5))))
      .toMap
    val bounds = Checks.referenceBins(ref, "v", 4)
    val nRef = Checks.populationStability(ref, ref, "v", bins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totalRef = nRef.values.sum
    val refFracs = (0 until 4).map(b => nRef(b.toLong).toDouble / totalRef.toDouble)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PsiEvent]
    val q = StreamingPsi.monitor(mem.toDS(), bounds, refFracs)
      .writeStream.outputMode("append").format("memory").queryName("psi").start()
    curVals.map(PsiEvent("prices", _)).grouped(40).foreach { s =>
      mem.addData(s: _*); q.processAllAvailable()
    }
    // an independent group must not disturb the monitored one
    mem.addData(PsiEvent("other", 1e9)); q.processAllAvailable()
    q.stop()

    val rows = spark.table("psi")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val prices = rows.filter(_._1 == "prices")
    // 100 values in 3 slices → 3 emissions × 4 bins
    assert(prices.map(_._2).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
    assert(prices.length == 12)
    val last = prices.filter(_._2 == 3L)
      .map(r => r._3 -> ((r._4, r._5, r._6))).toMap
    assert(last == batch, s"stream $last\nbatch $batch")
    // mid-stream snapshot is a valid PSI over the so-far counts: bin counts
    // at emission 2 must sum to 80 (two slices)
    assert(prices.filter(_._2 == 2L).map(_._4).sum == 80L)
    // the foreign group saw exactly one emission of its own
    assert(rows.count(_._1 == "other") == 4)
  }
}
