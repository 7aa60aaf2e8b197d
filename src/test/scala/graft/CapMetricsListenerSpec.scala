package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.tools.CapMetricsListener

/** The cap-observability contract end-to-end: a firing bucket cap is
  * visible through a session-level listener without touching the query.
  */
class CapMetricsListenerSpec extends SparkSuite {
  import spark.implicits._

  test("a firing cap surfaces in the session listener; totals accumulate and reset") {
    val listener = CapMetricsListener.register(spark)
    try {
      val vec = Array.fill(4)(1.0f)
      val rows = (0 until 10).map(i => (i.toLong, "hot", vec)) ++
        (100 until 103).map(i => (i.toLong, "cold", vec))
      val emb = rows.toDF("vec_id", "label", "embedding")
      Dedup.embeddingNearDups(emb, "label", 0.9, maxBucketSize = 5).collect()
      // listener callbacks arrive asynchronously on the bus thread — poll
      // (the bus-drain API is private[spark])
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (listener.snapshot.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)

      val snap = listener.snapshot
      val dropped = snap.collect {
        case (k, v) if k.startsWith("graft.capBuckets.") && k.endsWith(":dropped_rows") => v
      }.sum
      assert(dropped == 10L, s"hot-bucket rows must surface fleet-wide, got $snap")

      listener.reset()
      assert(listener.snapshot.isEmpty)
    } finally spark.listenerManager.unregister(listener)
  }
}
