package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("resampleLocf: gaps filled with previous value, flagged; ties broken by id") {
    import spark.implicits._
    // key a: observations in minute-buckets 0, 1 (two rows — id tie-break), 4
    // → buckets 2 and 3 are gaps carrying bucket-1's winner.
    // key b: single observation → single-row grid, no gaps.
    val events = Seq(
      ("a", ts(0), 1L, 10.0),
      ("a", ts(1), 2L, 20.0),
      ("a", ts(1), 3L, 25.0), // same ts, higher id → wins bucket 1
      ("a", ts(4), 4L, 40.0),
      ("b", ts(2), 5L, 99.0))
      .toDF("k", "t", "id", "v")
    val got = TimeSeries.resampleLocf(events, "k", "t", "id", "v", bucketSeconds = 60L)
      .orderBy("key", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(got.toSeq == Seq(
      ("a", base, 10.0, false),
      ("a", base + 60, 25.0, false),
      ("a", base + 120, 25.0, true),
      ("a", base + 180, 25.0, true),
      ("a", base + 240, 40.0, false),
      ("b", base + 120, 99.0, false)))
  }

  test("cusum: a constant series yields null z/scores (ANSI divide guard), not a crash") {
    import spark.implicits._
    val events = (0 until 4).map(i => ("c", ts(i), i.toLong, 7.5)).toDF("k", "t", "id", "v")
    val rows = TimeSeries.cusum(events, "k", "t", "id", "v").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), "σ=0 must null out, per the doc contract")
    }
  }

  test("cusum: closed form ≡ the direct max(0, ·) recursion; alarm fires on the injected shift") {
    import spark.implicits._
    // 12 baseline points around 0, then 8 points shifted to +3: the
    // positive side must accumulate past threshold, the negative side stay 0.
    val vals = Seq(0.3, -0.2, 0.1, -0.4, 0.2, 0.0, -0.1, 0.3, -0.3, 0.1, -0.2, 0.2) ++
      Seq.fill(8)(3.0)
    val events = vals.zipWithIndex.map { case (v, i) => ("s", ts(i), i.toLong, v) }
      .toDF("k", "t", "id", "v")
    val got = TimeSeries.cusum(events, "k", "t", "id", "v", slack = 0.5, threshold = 4.0)
      .orderBy("id")
      .collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))

    // mirror the operator's rounding contract, then run the LITERAL recursion
    val mu = BigDecimal(vals.sum / vals.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = {
      val v = vals.map(x => (x - vals.sum / vals.size) * (x - vals.sum / vals.size)).sum / vals.size
      BigDecimal(math.sqrt(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val zs = vals.map(x => BigDecimal((x - mu) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    var sp = 0.0; var sn = 0.0
    val want = zs.map { z =>
      sp = math.max(0.0, sp + (z - 0.5)); sn = math.max(0.0, sn - (z + 0.5))
      (BigDecimal(sp).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(sn).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    got.zip(want).zipWithIndex.foreach { case (((_, gp, gn, alarm), (wp, wn)), i) =>
      assert(math.abs(gp - wp) < 1e-9, s"pos at $i: $gp vs $wp")
      assert(math.abs(gn - wn) < 1e-9, s"neg at $i: $gn vs $wn")
      assert(alarm == (wp > 4.0 || wn > 4.0), s"alarm at $i")
    }
    // the shift is what trips the positive side: no positive-side alarm in
    // the baseline, a latched alarm by the end of the shifted segment
    assert(got.take(12).forall(_._2 <= 4.0), "positive side quiet during baseline")
    assert(got.last._4, "alarm raised by the end of the shifted segment")
    val shifted = got.drop(12).map(_._2)
    assert(shifted.zip(shifted.tail).forall { case (a, b) => b >= a },
      "positive score non-decreasing across the shift")
  }

  test("linearFit: perfect line exact, hand 3-point fit, degenerate keys null out") {
    import spark.implicits._
    def tsd(day: Int, minute: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:$minute%02d:00")
    val rows = Seq(
      // perfect line y = 2 + 3·days → slope 3/day, intercept 2, r² = 1
      ("line", tsd(0), 2.0), ("line", tsd(1), 5.0), ("line", tsd(2), 8.0),
      // hand fit at 0/60/120 s, y = 1/2/1.5: b = 1/240 y/s → 360/day,
      // intercept 1.25, r² = 0.25 (all terms exact dyadic/decimal)
      ("hand", ts(0), 1.0), ("hand", ts(1), 2.0), ("hand", ts(2), 1.5),
      // degenerates: one point; two points at ONE instant; constant y
      ("single", ts(0), 7.0),
      ("onets", ts(0), 1.0), ("onets", ts(0), 9.0),
      ("flat", ts(0), 4.0), ("flat", ts(1), 4.0), ("flat", ts(2), 4.0))
      .toDF("key", "ts", "value")
    val got = TimeSeries.linearFit(rows, "key", "ts", "value")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("line") == (("line", 3L, Some(3.0), Some(2.0), Some(1.0))),
      s"perfect line: ${got("line")}")
    assert(got("hand") == (("hand", 3L, Some(360.0), Some(1.25), Some(0.25))),
      s"hand fit: ${got("hand")}")
    assert(got("single") == (("single", 1L, None, None, None)))
    assert(got("onets") == (("onets", 2L, None, None, None)),
      "zero x-variance must null out, not divide by zero")
    assert(got("flat") == (("flat", 3L, Some(0.0), Some(4.0), None)),
      s"constant y: zero slope, mean intercept, null r²: ${got("flat")}")
  }

  test("kaplanMeier: hand curve with censoring; risk set shrinks on censor-only days") {
    import spark.implicits._
    def td(day: Int, hour: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(day).atTime(hour, 0))
    // horizon 10; cutoff = day 30 (u_e). Lifetimes/fates:
    //   u_a 0d churn, u_b 2d churn, u_c 2d censored (last day 23 ≥ 20),
    //   u_d 5d churn, u_e 30d censored (the cutoff definer)
    // KM: day0 n=5 S=0.8; day2 n=4 (1 churn,1 censor) S=0.6;
    //     day5 n=2 S=0.3; day30 n=1 censor-only S=0.3
    val ev = Seq(
      ("a", td(0)), ("a", td(0, 1)),
      ("b", td(0)), ("b", td(2)),
      ("c", td(21)), ("c", td(23)),
      ("d", td(10)), ("d", td(15)),
      ("e", td(0)), ("e", td(30)))
      .toDF("user_id", "ts")
    val got = TimeSeries.kaplanMeier(ev, "user_id", "ts", horizonDays = 10)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 5L, 1L, 0L, 0.8),
      (2L, 4L, 1L, 1L, 0.6),
      (5L, 2L, 1L, 0L, 0.3),
      (30L, 1L, 0L, 1L, 0.3)), s"got $got")
  }

  test("interpolateAt: midpoint blend, on-point exactness, strict range, same-ts ties") {
    import spark.implicits._
    // key a: clicks v=10 @m0, v=30 @m10, v=30 @m10 dup-ts (id 3 wins prev),
    //        v=50 @m20; key b: single point (no interval to blend)
    val series = Seq(
      ("a", ts(0), 1L, 10.0),
      ("a", ts(10), 2L, 28.0),
      ("a", ts(10), 3L, 30.0), // same instant, higher id — THE observation
      ("a", ts(20), 4L, 50.0),
      ("b", ts(5), 5L, 7.0))
      .toDF("k", "t", "id", "v")
    val probes = Seq(
      ("a", ts(5), 100L),   // midpoint of 10 → 28? no: prev=10@m0, next=28@m10 (first in order) → 19.0
      ("a", ts(10), 101L),  // exactly ON the m10 pair → id-3 value 30.0
      ("a", ts(15), 102L),  // midpoint of 30@m10(id3 last) prev? prev=30, next=50 → 40.0
      ("a", ts(25), 103L),  // after last point → null
      ("b", ts(1), 104L),   // before b's only point → null
      ("b", ts(5), 105L))   // exactly on b's only point → 7.0
      .toDF("k", "t", "id")
    val got = TimeSeries.interpolateAt(series, probes, "k", "t", "id", "v")
      .select("id", "interp").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(19.0), s"got ${got(100L)}")
    assert(got(101L).contains(30.0), "on-instant probe must take the id-ordered LAST same-ts observation")
    assert(got(102L).contains(40.0))
    assert(got(103L).isEmpty && got(104L).isEmpty, "no extrapolation")
    assert(got(105L).contains(7.0))
  }

  test("fanoFactor: hand dispersion over the global span, silent buckets as zeros, constant rate 0") {
    import spark.implicits._
    def ts(hour: Long) = new Timestamp(hour * 3600 * 1000)
    // global span covers hours 0..3 (m = 4) because of key b's hour-3 event;
    // a: buckets (2, 0, 1, 0) → F = (4·5 − 9)/(4·3) = 11/12
    val ev = Seq(("a", ts(0)), ("a", ts(0)), ("a", ts(2)), ("b", ts(3)))
      .toDF("k", "t")
    val got = TimeSeries.fanoFactor(ev, "k", "t")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((4L, 3L, 2L, 0.916667)), s"got ${got("a")}")
    // b: (0,0,0,1) → F = (4·1 − 1)/(4·1) = 0.75
    assert(got("b") == ((4L, 1L, 1L, 0.75)), s"got ${got("b")}")
    // one event every hour: zero variance → exactly 0
    val flat = (0L to 3L).map(h => ("c", ts(h))).toDF("k", "t")
    val f = TimeSeries.fanoFactor(flat, "k", "t")
      .as[(String, Long, Long, Long, Double)].head()
    assert(f == (("c", 4L, 4L, 4L, 0.0)), s"got $f")
  }

  test("theilSen: median slope shrugs off the outlier OLS is dragged by; stride cap; degenerate keys") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000)
    // y = x except a wild outlier at x=3: 6 pair slopes sorted
    // 1,1,1,33.3,49.5,98 → lower median 1 unit/sec = 86400/day
    val pts = Seq(("a", ts(0), 0.0), ("a", ts(1), 1.0),
      ("a", ts(2), 2.0), ("a", ts(3), 100.0),
      ("b", ts(5), 7.0),                      // single point: no pair
      ("c", ts(9), 1.0), ("c", ts(9), 2.0))   // same-second pair: no slope info
      .toDF("k", "t", "v")
    val got = TimeSeries.theilSen(pts, "k", "t", "v")
      .as[(String, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((4L, Some(6L), Some(86400.0))), s"got ${got("a")}")
    assert(got("b") == ((1L, None, None)), s"got ${got("b")}")
    assert(got("c") == ((2L, None, None)), s"got ${got("c")}")
    // OLS on the same key is dragged far above the robust estimate
    val ols = TimeSeries.linearFit(pts.filter(col("k") === "a"), "k", "t", "v")
      .select("slope_per_day").as[Double].head()
    assert(ols > 86400.0 * 10, s"ols $ols")
    // maxPoints=2 keeps ranks 1 and 3 (x=0, x=2) → one pair, exact slope
    val capped = TimeSeries.theilSen(pts.filter(col("k") === "a"), "k", "t", "v",
      maxPoints = 2).as[(String, Long, Option[Long], Option[Double])].head()
    assert(capped == (("a", 2L, Some(1L), Some(86400.0))), s"got $capped")
  }

  test("seasonalProfile: hand 2×m deviations, gap-counts-as-zero trend, edge exclusion") {
    import spark.implicits._
    // period 2: deviation at t is (2x_t − x_{t−1} − x_{t+1})/4; the
    // alternating series 1,5,1,5,1,5 has ±2 around the flat trend
    val alt = Seq((0L, 1L), (1L, 5L), (2L, 1L), (3L, 5L), (4L, 1L), (5L, 5L))
      .toDF("t", "x")
    val got = TimeSeries.seasonalProfile(alt, "t", "x", period = 2)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((0L, 2L, -2.0), (1L, 2L, 2.0)), s"got $got")
    // missing t=3 contributes ZERO to t=2's trend window (dev = 1.0),
    // and t=4 is edge-excluded because t+1 exceeds the observed span
    val gapped = Seq((0L, 4L), (1L, 4L), (2L, 4L), (4L, 4L)).toDF("t", "x")
    val g = TimeSeries.seasonalProfile(gapped, "t", "x", period = 2)
      .as[(Long, Long, Double)].collect().toList
    assert(g == List((0L, 1L, 1.0), (1L, 1L, 0.0)), s"got $g")
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalProfile(alt, "t", "x", period = 3)
    }
  }

  test("acf: hand-computed lags, under-2-pair null, zero-pair lag absent, constant-series null") {
    import spark.implicits._
    // t = 0..3, x = 1,3,2,4 — lag1 Pearson = −0.5 by hand, lag2 = 1.0
    // (two ascending pairs), lag3 = single pair → null, lag4 = no pairs
    val s = Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 4L)).toDF("t", "x")
    val got = TimeSeries.acf(s, "t", "x", maxLag = 4)
      .as[(Int, Long, Option[Double])].collect().toList
    assert(got == List((1, 3L, Some(-0.5)), (2, 2L, Some(1.0)), (3, 1L, None)),
      s"got $got")
    // a calendar gap pairs nothing — it must not realign the series:
    // t = 0,1,3,4 has only (0,1) and (3,4) at lag 1
    val gapped = Seq((0L, 10L), (1L, 20L), (3L, 5L), (4L, 15L)).toDF("t", "x")
    val g1 = TimeSeries.acf(gapped, "t", "x", maxLag = 1)
      .as[(Int, Long, Option[Double])].collect().toList
    assert(g1 == List((1, 2L, Some(1.0))), s"got $g1")
    // constant series: zero variance on both legs → null, never NaN/1.0
    val const = Seq((0L, 7L), (1L, 7L), (2L, 7L)).toDF("t", "x")
    val c = TimeSeries.acf(const, "t", "x", maxLag = 2)
      .as[(Int, Long, Option[Double])].collect().toList
    assert(c == List((1, 2L, None), (2, 1L, None)), s"got $c")
  }
}
