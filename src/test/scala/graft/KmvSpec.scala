package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmv

/** KMV distinct sketch pinned against a driver-side mirror of the exact
  * hash + order-statistic definition, plus the estimator's contract
  * cases (exact under k, union invariance, error inside the 1/√k band).
  */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  private val P = graft.functions.StringKernels.PolyHashMod

  private def mirrorHash(s: String): Long =
    (graft.functions.StringKernels.polyHash(UTF8String.fromString(s)) *
      961748927L + 12345L) % P

  private def run(keys: Seq[Long], k: Int) =
    Kmv.kmvDistinct(keys.toDF("key"), "key", k)
      .as[(Long, Long, Long, Long, Long, Double)].head()

  test("under k distinct hashes the sketch IS the exact count") {
    val (nKept, _, nHashes, est, exact, err) = run(Seq(1L, 2L, 3L, 2L, 1L), 256)
    assert((nKept, nHashes, est, exact, err) == ((3L, 3L, 3L, 3L, 0.0)))
  }

  test("sketch mode matches the driver mirror of the k-th order statistic exactly") {
    val keys = (1L to 5000L)
    val hs = keys.map(x => mirrorHash(x.toString)).distinct.sorted
    val k = 64
    val wantKth = hs(k - 1)
    val wantEst = (k - 1).toLong * P / wantKth
    val (nKept, kth, nHashes, est, exact, err) = run(keys, k)
    assert(nKept == k && kth == wantKth && nHashes == hs.size, s"$kth vs $wantKth")
    assert(est == wantEst, s"est $est vs $wantEst")
    assert(exact == 5000L)
    // inside a loose multiple of the 1/√k relative-error band
    assert(err < 3.0 / math.sqrt(k), s"rel_error $err")
  }

  test("null keys are outside the domain: no sketch slot, no count, exact audit unchanged") {
    val withNull = (Seq[java.lang.Long](null) ++ (1L to 500L).map(Long.box))
      .toDF("key")
    val clean = (1L to 500L).toDF("key")
    val a = Kmv.kmvDistinct(withNull, "key", 64)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val b = Kmv.kmvDistinct(clean, "key", 64)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(a == b, s"null key leaked into the sketch: $a vs $b")
  }

  test("duplicating the input leaves the sketch untouched (union invariance)") {
    val keys = (1L to 2000L)
    val once = run(keys, 32)
    val twice = run(keys ++ keys, 32)
    assert(once == twice, s"$once vs $twice")
  }

  test("kmvDistinctByGroup agrees with the global sketch applied per group") {
    val rows = (1L to 6000L).map(i => (s"g${i % 3}", i / 3))
    val df = rows.toDF("g", "key")
    val k = 64
    val keyed = Kmv.kmvDistinctByGroup(df, "g", "key", k)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(keyed.keySet == Set("g0", "g1", "g2"))
    (0 until 3).foreach { gi =>
      val g = s"g$gi"
      val solo = Kmv.kmvDistinct(
        df.filter(col("g") === g).select("key"), "key", k)
        .as[(Long, Long, Long, Long, Long, Double)].head()
      val kd = keyed(g)
      assert((kd._2, kd._3, kd._4, kd._5, kd._6, kd._7) == solo,
        s"$g: keyed $kd vs solo $solo")
    }
  }

  test("trailingKmv: hand-computed trailing unions; exact mode under k; clipped merge = true k-cut") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // day1: users 1,2; day2: 2,3; day5: 4 — census days {1,2,5}
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(2)), (3L, ts(2)), (4L, ts(5)))
      .toDF("user_id", "ts")
    val got = Kmv.trailingKmv(ev, "user_id", "ts", k = 64, windowDays = 3)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1.toString -> r).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-02", "2024-01-05"))
    // trailing-3 windows: day1 ← {day1} = {1,2}; day2 ← {day1,day2} =
    // {1,2,3}; day5 ← {day5} only (days 3,4 are outside the census and
    // day2+2 < 5) = {4}
    assert(got("2024-01-01")._6 == 2L && got("2024-01-02")._6 == 3L &&
      got("2024-01-05")._6 == 1L)
    // under k the merged partials ARE the full hash sets: estimate exact
    got.values.foreach { r =>
      assert(r._5 == r._6 && r._7 == 0.0, s"exact-mode drift: $r")
    }
    // clipped days: k=2, 4 users on one day + 1 overlapping next day —
    // the merged 2-cut must equal the true 2 smallest of the union
    val ev2 = Seq((10L, ts(1)), (11L, ts(1)), (12L, ts(1)), (13L, ts(1)),
      (10L, ts(2))).toDF("user_id", "ts")
    val r2 = Kmv.trailingKmv(ev2, "user_id", "ts", k = 2, windowDays = 2)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1.toString -> r).toMap
    val hs = Seq(10L, 11L, 12L, 13L).map(u => mirrorHash(u.toString)).sorted
    assert(r2("2024-01-01")._3 == hs(1), "day1 kth must be 2nd smallest of all four")
    assert(r2("2024-01-02")._3 == hs(1),
      "day2 merges day1's 2-cut + day2's — kth must STILL be the true union 2nd smallest")
  }

  test("trailingKmv keyed: per-key trailing ≡ filtered-global, per-key census") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // key A active days 1,2; key B only day 5 — B must not report on
    // A's days, and each key's rows must equal the global trailing run
    // over that key's slice alone
    val ev = Seq(("A", 1L, ts(1)), ("A", 2L, ts(1)), ("A", 2L, ts(2)),
      ("A", 3L, ts(2)), ("B", 4L, ts(5)), ("B", 5L, ts(5)))
      .toDF("g", "user_id", "ts")
    val keyed = Kmv.trailingKmv(ev, "user_id", "ts", k = 64, windowDays = 3,
        groupCols = Seq("g"))
      .as[(String, java.sql.Date, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2.toString) -> r).toMap
    assert(keyed.keySet == Set(("A", "2024-01-01"), ("A", "2024-01-02"),
      ("B", "2024-01-05")), s"per-key census violated: ${keyed.keySet}")
    Seq("A", "B").foreach { key =>
      val solo = Kmv.trailingKmv(ev.filter(col("g") === key), "user_id", "ts",
          k = 64, windowDays = 3)
        .as[(java.sql.Date, Long, Long, Long, Long, Long, Double)]
        .collect().map(r => r._1.toString -> r).toMap
      solo.foreach { case (d, s) =>
        val g = keyed((key, d))
        assert((g._3, g._4, g._5, g._6, g._7, g._8) ==
          ((s._2, s._3, s._4, s._5, s._6, s._7)),
          s"key $key day $d: keyed $g vs solo $s")
      }
    }
  }

  test("trailingKmv audit=false: sketch columns identical to audit=true, audit columns gone") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(2)), (3L, ts(2)), (4L, ts(5)))
      .toDF("user_id", "ts")
    val full = Kmv.trailingKmv(ev, "user_id", "ts", k = 64, windowDays = 3)
    val lean = Kmv.trailingKmv(ev, "user_id", "ts", k = 64, windowDays = 3,
      audit = false)
    assert(lean.columns.toSeq ==
      Seq("obs_day", "n_kept", "kth_hash", "n_resident", "estimate"))
    val want = full.select("obs_day", "n_kept", "kth_hash", "n_resident", "estimate")
      .collect().map(_.toSeq).toSeq
    assert(lean.collect().map(_.toSeq).toSeq == want,
      "the production posture must not change a single sketch value")
  }

  test("StreamingKmv: merged micro-batch partials ≡ the one-shot batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("kmv-store").toString + "/kmv"
    val ckpt = java.nio.file.Files.createTempDirectory("kmv-ckpt").toString
    val k = 64
    val mem = MemoryStream[Long]
    def drain(): Unit = {
      val q = graft.streaming.StreamingKmv.start(
        mem.toDF().toDF("key"), "key", store, ckpt, k)
      q.awaitTermination()
    }
    assert(graft.streaming.StreamingKmv.estimate(spark, store, k).isEmpty)
    // three uneven batches with cross-batch duplicates
    mem.addData(1L to 1500L: _*); drain()
    mem.addData(1000L to 3200L: _*); drain()
    mem.addData(3000L to 5000L: _*); drain()
    val streamed = graft.streaming.StreamingKmv.estimate(spark, store, k).get
      .as[(Long, Long, Long, Long)].head()
    val batch = run(1L to 5000L, k)
    // (n_kept, kth_hash, estimate) must be bit-identical; n_hashes is
    // sketch-resident by contract, so it is compared against ≤ 3k
    assert((streamed._1, streamed._2, streamed._4) == ((batch._1, batch._2, batch._4)),
      s"stream $streamed vs batch $batch")
    assert(streamed._3 <= 3L * k, s"partials must stay k-bounded: $streamed")
  }
}
