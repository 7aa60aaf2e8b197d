package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.MgBuffer
import graft.streaming.{StreamingHeavyHitters, TokenEvent}

/** The streaming Misra–Gries sketch: in-order micro-batch slices are
  * bit-identical to a single-threaded MG fold over the same sequence,
  * the k-counter state invariant holds, and the N/(k+1) heavy-hitter
  * guarantee is honored against exact counts.
  */
class StreamingHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  // group "g": 400 "hot" + 600 tail tokens over 50 distinct values,
  // deterministically interleaved; group "h": pure uniform control
  private val events: Seq[TokenEvent] = {
    val g = (0 until 1000).map { i =>
      val tok = if (i % 5 < 2) "hot" else s"t${(i * 7919) % 50}"
      TokenEvent("g", i.toLong, tok)
    }
    val h = (0 until 300).map(i => TokenEvent("h", i.toLong, s"u${i % 30}"))
    (g ++ h).sortBy(_.seq)
  }

  test("streamed MG across slices ≡ single-threaded fold; k-invariant; heavy-hitter bound") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val k = 16
      val mem = MemoryStream[TokenEvent]
      val q = StreamingHeavyHitters.sketch(mem.toDS(), k)
        .writeStream.outputMode("append").format("memory").queryName("shh").start()
      events.grouped(450).foreach { s => mem.addData(s: _*); q.processAllAvailable() }
      q.stop()

      val out = spark.table("shh")
      // final sketch per group = the rows at the max n_processed
      def finalSketch(group: String): Map[String, Long] = {
        val rows = out.filter(col("group") === group)
        val nMax = rows.agg(max("n_processed")).head().getLong(0)
        rows.filter(col("n_processed") === nMax)
          .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      }
      val sketchG = finalSketch("g")
      assert(sketchG.size <= k, s"MG must hold at most k counters: $sketchG")

      // bit-identity with the single-threaded reference fold (same update
      // code path, same order — the definition of the streamed semantics)
      val ref = new MgBuffer(16)
      events.filter(_.group == "g").sortBy(_.seq).foreach(e => ref.add(e.token))
      assert(sketchG == ref.counts.toMap,
        s"stream must equal the in-order fold:\n$sketchG\nvs ${ref.counts.toMap}")

      // the MG contract vs exact counts: hot (freq 400 > 1000/17) must be
      // present, count in [freq - n/(k+1), freq]
      val exactHot = events.count(e => e.group == "g" && e.token == "hot").toLong
      val lb = sketchG.getOrElse("hot", 0L)
      assert(lb > 0, s"true heavy hitter must be retained: $sketchG")
      assert(lb <= exactHot && lb >= exactHot - 1000L / (k + 1),
        s"count_lb $lb outside [${exactHot - 1000L / (k + 1)}, $exactHot]")

      // groups are independent state: the control group never sees "hot"
      assert(!finalSketch("h").contains("hot"))
    }
  }
}
