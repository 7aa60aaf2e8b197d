package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** [[graft.operators.QuantileSketch]] contract: exact decimal-mantissa
  * bucketization, fixed-boundary mergeability (shard ≡ whole), the
  * exactPercentiles rank convention, and the containment bound the q257
  * audit rides on.
  */
class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  test("bucketization: hand-computed decimal-mantissa bounds") {
    val df = Seq(0L, 7L, 42L, 423L, 999L, 1000L, 1049L).toDF("v")
    val got = QuantileSketch.sketch(df, "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 0L, 1L),        // single-digit: exact singleton bucket
      (7L, 7L, 1L),
      (42L, 42L, 1L),      // two digits: mantissa IS the value — exact
      (420L, 429L, 1L),    // three digits: mantissa 42 → [420, 429]
      (990L, 999L, 1L),
      (1000L, 1099L, 2L)), // 1000 and 1049 share mantissa-10 bucket
      s"got $got")
    // domain ceiling: the 19-digit mantissa-92 bucket's rebuilt upper
    // bound overflows Long — it must clamp to Long.MaxValue, not null
    val top = QuantileSketch.sketch(Seq(Long.MaxValue).toDF("v"), "v")
      .as[(Long, Long, Long)].head()
    assert(top == ((9200000000000000000L, Long.MaxValue, 1L)), s"got $top")
  }

  test("merge of shard partials is bit-identical to the whole-data sketch") {
    val vals = (1L to 5000L).map(i => (i * 7919L) % 99991L)
    val whole = vals.toDF("v")
    val wholeSk = QuantileSketch.sketch(whole, "v")
    val shards = (0 until 3).map(r =>
      vals.zipWithIndex.filter(_._2 % 3 == r).map(_._1).toDF("v"))
    val merged = QuantileSketch.merge(
      shards.map(QuantileSketch.sketch(_, "v")).reduce(_ unionByName _))
    val a = wholeSk.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = merged.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "fixed boundaries must make shard merge exact")
    val estW = QuantileSketch.estimate(wholeSk).as[(Int, Long, Long, Long)]
      .collect().toSeq
    val estM = QuantileSketch.estimate(merged).as[(Int, Long, Long, Long)]
      .collect().toSeq
    assert(estW == estM)
  }

  test("estimates bracket the exact order statistic; relative width <= 1/m") {
    val vals = (1L to 3000L).map(i => ((i * 104729L) % 1000000L) + 1L)
    val df = vals.toDF("v")
    val est = QuantileSketch.estimate(QuantileSketch.sketch(df, "v"),
      Seq(50, 90, 99, 100)).as[(Int, Long, Long, Long)].collect()
    val sorted = vals.sorted
    est.foreach { case (p, n, lo, hi) =>
      assert(n == vals.size.toLong)
      // exactPercentiles convention: smallest value with cum*100 >= n*p
      val exact = sorted((((vals.size.toLong * p) + 99) / 100 - 1).toInt)
      assert(lo <= exact && exact <= hi, s"p$p: $exact outside [$lo, $hi]")
      // mantissa m >= 10 for multi-digit buckets → width <= lo/10
      if (lo >= 10) assert(hi - lo + 1 <= lo / 10 + 1,
        s"p$p: bucket [$lo, $hi] wider than the 1/m contract")
    }
  }

  test("estimateByGroup agrees with the global estimate applied per group") {
    val rows = (1L to 4000L).map(i => (s"g${i % 3}", ((i * 48271L) % 500000L) + 1L))
    val df = rows.toDF("g", "v")
    val keyed = QuantileSketch.estimateByGroup(
      QuantileSketch.sketch(df, "v", Seq("g")), Seq("g"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    (0 until 3).foreach { gi =>
      val g = s"g$gi"
      val solo = QuantileSketch.estimate(
        QuantileSketch.sketch(df.filter(col("g") === g), "v"))
        .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      val k = keyed(g)
      assert((k._2, k._3, k._4) == ((solo(50)._2, solo(50)._3, solo(50)._4)),
        s"$g p50: $k vs ${solo(50)}")
      assert((k._5, k._6) == ((solo(90)._3, solo(90)._4)), s"$g p90")
      assert((k._7, k._8) == ((solo(99)._3, solo(99)._4)), s"$g p99")
    }
  }

  test("StreamingQuantile: merged micro-batch partials ≡ the one-shot batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("qs-store").toString + "/qs"
    val ckpt = java.nio.file.Files.createTempDirectory("qs-ckpt").toString
    val mem = MemoryStream[Long]
    def drain(): Unit = {
      val q = graft.streaming.StreamingQuantile.start(
        mem.toDF().toDF("v"), "v", store, ckpt)
      q.awaitTermination()
    }
    assert(graft.streaming.StreamingQuantile.estimate(spark, store).isEmpty)
    // three uneven batches with cross-batch overlap — counts (unlike the
    // KMV distinct sketch) must ADD across batches, so the overlap is
    // counted twice, exactly as the one-shot sketch over the same bag
    mem.addData(1L to 1500L: _*); drain()
    mem.addData(1000L to 3200L: _*); drain()
    mem.addData(3000L to 5000L: _*); drain()
    val streamed = graft.streaming.StreamingQuantile.estimate(spark, store).get
      .as[(Int, Long, Long, Long)].collect().toSeq
    val bag = (1L to 1500L) ++ (1000L to 3200L) ++ (3000L to 5000L)
    val batch = QuantileSketch.estimate(
      QuantileSketch.sketch(bag.toDF("v"), "v"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(streamed == batch,
      s"fixed boundaries must make the streaming face exact: $streamed vs $batch")
  }

  test("trailingByDay equals the one-shot sketch of each window's bag (census gaps respected)") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 08:00:00")
    // census days {1, 2, 5}; window 3: day1←{d1}, day2←{d1,d2}, day5←{d5}
    val rows = Seq(
      (ts(1), 100L), (ts(1), 200L), (ts(2), 300L),
      (ts(5), 900L), (ts(5), 9000L))
    val ev = rows.toDF("ts", "v")
    val got = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 3)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1.toString -> r).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-02", "2024-01-05"))
    def oneShot(bag: Seq[Long]) = QuantileSketch.estimate(
      QuantileSketch.sketch(bag.toDF("v"), "v"))
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val windows = Map(
      "2024-01-01" -> Seq(100L, 200L),
      "2024-01-02" -> Seq(100L, 200L, 300L),
      "2024-01-05" -> Seq(900L, 9000L))
    windows.foreach { case (d, bag) =>
      val solo = oneShot(bag)
      val k = got(d)
      assert((k._2, k._3, k._4, k._5, k._6, k._7, k._8) ==
        ((bag.size.toLong, solo(50)._3, solo(50)._4, solo(90)._3, solo(90)._4,
          solo(99)._3, solo(99)._4)),
        s"$d: windowed $k vs one-shot of $bag")
    }
  }

  test("trailingByDay keyed: per-key trailing ≡ filtered-global trailing, per-key census") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 08:00:00")
    // key A active on days 1,2; key B only on day 5 — B must NOT report
    // on A's days (per-key census), and each key's rows must equal the
    // global trailing run over that key's slice alone
    val rows = Seq(
      ("A", ts(1), 100L), ("A", ts(1), 200L), ("A", ts(2), 300L),
      ("B", ts(5), 900L), ("B", ts(5), 9000L))
    val ev = rows.toDF("k", "ts", "v")
    val keyed = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 3,
        groupCols = Seq("k"))
      .as[(String, java.sql.Date, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2.toString) -> r).toMap
    assert(keyed.keySet == Set(("A", "2024-01-01"), ("A", "2024-01-02"),
      ("B", "2024-01-05")), s"per-key census violated: ${keyed.keySet}")
    Seq("A", "B").foreach { key =>
      val solo = QuantileSketch.trailingByDay(
        ev.filter(col("k") === key), "v", "ts", windowDays = 3)
        .as[(java.sql.Date, Long, Long, Long, Long, Long, Long, Long)]
        .collect().map(r => r._1.toString -> r).toMap
      solo.foreach { case (d, s) =>
        val g = keyed((key, d))
        assert((g._3, g._4, g._5, g._6, g._7, g._8, g._9) ==
          ((s._2, s._3, s._4, s._5, s._6, s._7, s._8)),
          s"key $key day $d: keyed $g vs solo $s")
      }
    }
  }

  test("trailingByDay weighted: window merge over MASS partials; heavy day dominates the window") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 08:00:00")
    // day1: five light rows at 100..104 (w=1 each); day2: one heavy row
    // at 9000 (w=95). Window 2: day1's median is light; day2's window
    // holds 95% of its mass at 9000 — the row-count face would say ~102
    val rows = (100L to 104L).map(v => (ts(1), v, 1L)) :+ ((ts(2), 9000L, 95L))
    val ev = rows.toDF("ts", "v", "w")
    val got = QuantileSketch.trailingByDay(ev, "v", "ts", windowDays = 2,
        weightCol = Some("w"))
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1.toString -> r).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-02"))
    val d1 = got("2024-01-01")
    assert(d1._2 == 5L && d1._3 == 100L, s"day1 must be light-only mass: $d1")
    val d2 = got("2024-01-02")
    assert(d2._2 == 100L, s"day2 window mass must be 5 + 95: $d2")
    assert(d2._3 == 9000L && d2._4 == 9099L,
      s"day2 weighted median bucket must hold 9000: $d2")
    // ≡ the one-shot weighted sketch of the window's bag
    val solo = QuantileSketch.estimate(
      QuantileSketch.sketchWeighted(rows.map(r => (r._2, r._3)).toDF("v", "w"),
        "v", "w"))
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert((d2._3, d2._4, d2._5, d2._6, d2._7, d2._8) ==
      ((solo(50)._3, solo(50)._4, solo(90)._3, solo(90)._4,
        solo(99)._3, solo(99)._4)),
      s"windowed $d2 vs one-shot $solo")
  }

  test("sketchWeighted: mass-rank quantiles — a heavy row moves the median the row count can't") {
    import graft.operators.Checks
    // values 100..104 each weight 1, plus value 9000 with weight 95:
    // row median is ~102, but 95% of the MASS lives at 9000
    val rows = (100L to 104L).map((_, 1L)) :+ (9000L, 95L)
    val df = rows.toDF("v", "w")
    val est = QuantileSketch.estimate(
      QuantileSketch.sketchWeighted(df, "v", "w"))
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(est(50)._2 == 100L, "n must be the total mass")
    assert(est(50)._3 == 9000L && est(50)._4 == 9099L,
      s"weighted median bucket must hold 9000, got ${est(50)}")
    val ex = Checks.exactPercentilesWeighted(
      df.withColumn("g", lit(1)), "g", "v", "w")
      .as[(Int, Long, Long, Long, Long)].head()
    assert(ex == ((1, 100L, 9000L, 9000L, 9000L)),
      s"weighted exact p50/p90/p99 must all be 9000: $ex")
    // zero-weight rows contribute nothing; negative/null weights drop
    val zw = Seq((5L, 0L), (7L, 3L), (9L, -1L)).toDF("v", "w")
    val sk = QuantileSketch.sketchWeighted(zw, "v", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(sk == Set((5L, 5L, 0L), (7L, 7L, 3L)), s"got $sk")
    // unweighted sketch == weighted sketch with all-ones weights
    val plain = QuantileSketch.sketch(df.select("v"), "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val ones = QuantileSketch.sketchWeighted(
      df.select(col("v"), lit(1L).as("w")), "v", "w")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(plain == ones)
  }

  test("negative values are rejected by filter; empty input gives no rows") {
    val df = Seq(-5L, 3L).toDF("v")
    val sk = QuantileSketch.sketch(df, "v").as[(Long, Long, Long)].collect()
    assert(sk.toSeq == Seq((3L, 3L, 1L)))
    assert(QuantileSketch.estimate(
      QuantileSketch.sketch(Seq.empty[Long].toDF("v"), "v")).count() == 0)
  }
}
