package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Measurement protocol — built for a shared single JVM where GC/JIT
  * pressure from one query contaminates its neighbors (round-3 data showed
  * 2–5× run-to-run swings on UNTOUCHED queries with only 2 passes):
  *
  *   - `runs` (default 5, env SPARK_GRAFT_BENCH_RUNS) full INTERLEAVED
  *     passes over the whole suite in sorted query order — A/B/A/B, so a
  *     given query's samples are spread across the JVM's lifetime instead of
  *     back-to-back in one thermal/GC regime;
  *   - per-query time = MIN across all passes (the min is the least
  *     contaminated observation — a query cannot run faster than it is);
  *   - per-query `spread` = (max − min)/min over the WARM passes (pass 1 is
  *     excluded: it measures classloading + JIT + codegen compilation, not
  *     the query). Spread ≫ 0.2 means the number is noise-bound and
  *     round-over-round deltas smaller than the spread are not evidence.
  *
  * Output protocol — the driver stores only the LAST ~2000 characters of
  * stdout into BENCH_r{N}.json (rounds 1–4 proved this: the verbose line
  * overflowed the window, so the tail showed the trailing `spread` map and
  * the judge never saw the per-query mins or the total). Two lines:
  *
  *   1. a VERBOSE line (full query names, mins + spreads + failed passes) —
  *      also written to target/bench_full.json for post-hoc reading;
  *   2. the FINAL compact line, sized to fit the 2000-char tail window with
  *      sbt's trailer: `queries` keyed by the qNN prefix (the contract's own
  *      example uses short keys), 3-decimal seconds, and `noisy` listing only
  *      the queries whose warm spread exceeds 0.25 (the reader's cue that a
  *      round-over-round delta on that row is noise, without spending ~1.2 kB
  *      printing 93 near-zero spreads). `n_queries`/`canary`/`total_sec`
  *      repeat at the TAIL of the line: even when truncation eats the head
  *      (BENCH_r15's tail starts mid-`queries`, hiding `value` and the
  *      q00 canary), the normalization inputs stay visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(2)
    // Shuffle parallelism defaults to the core count — right for the
    // driver's sf0.1 contract run. The scale-curve audit overrides it
    // upward (SPARK_GRAFT_SHUFFLE_PARTITIONS): at ×100 data a fixed 32
    // partitions means 10× the per-partition bytes of the fitted decade,
    // and the resulting sort-spill/GC is a harness artifact a real
    // cluster (whose partition count tracks input size) never pays.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cap observability rides along: any graft.* observe metric fired during
    // the measured suite lands in the verbose line's "caps" map (zero-total
    // entries dropped — on the uniform corpus most caps never fire; the
    // skewed-corpus numbers live in graft.BenchSkew)
    val capListener = graft.tools.CapMetricsListener.register(spark)
    // SPARK_GRAFT_BENCH_ONLY=q42_jaccard_pairs,q90_jaccard_prefix → solo/subset
    // timing without suite interference (how the "solo" numbers in
    // BENCH_NOTES.md are produced); unset = the full declared inventory.
    // Unknown names are a hard error: silently dropping them (and falling
    // back to the FULL suite when every name is a typo) would burn ~45 s of
    // unrelated queries instead of failing fast.
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map { raw =>
        val reqs = raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = reqs.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
        reqs.sorted
      }
      .filter(_.nonEmpty)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // passes(p)(name) = seconds for query `name` in pass p
    val passes: Seq[Map[String, Double]] =
      (0 until runs).map(_ => names.map(n => n -> timeOne(n)).toMap)
    def samples(n: String): Seq[Double] = passes.map(_(n))
    // min over SUCCESSFUL samples: one transient pass failure (the exact
    // GC/contamination class this protocol tolerates) must not discard the
    // other passes' valid observations — -1 only when every pass failed.
    // Partial failure must stay VISIBLE, not just tolerated: the failures
    // map below records per-query failed-pass counts so an intermittently
    // crashing query can't masquerade as a clean one.
    val results = names.map { n =>
      val ok = samples(n).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val failures = names.map(n => n -> samples(n).count(_ < 0).toDouble)
      .filter(_._2 > 0)
    val spreads = names.map { n =>
      val warm = samples(n).drop(1).filter(_ >= 0)
      val sp =
        if (warm.size < 2 || warm.min <= 0) -1.0
        else (warm.max - warm.min) / warm.min
      n -> BigDecimal(sp).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def r3(v: Double): Double =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val failedJson =
      if (failures.isEmpty) "" else s""","failed_passes":${jmap(failures)}"""
    val sfNum = raw"sf([0-9.]+)/?$$".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("\"" + sfDir + "\"")
    val capTotals = capListener.snapshot.filter(_._2 != 0L).toSeq.sorted
    val capsJson =
      if (capTotals.isEmpty) ""
      else capTotals.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","caps":{""", ",", "}")
    val verbose =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},"sf":$sfNum,"runs":$runs,"spread":${jmap(spreads)}$failedJson$capsJson}"""
    println(verbose)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target", "bench_full.json"),
        (verbose + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort; stdout already has it
    // compact FINAL line — qNN keys, noisy-only spreads — sized to survive
    // the driver's tail truncation (see scaladoc)
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    val short = results.map { case (n, v) => shortKey(n) -> v }
    require(short.map(_._1).distinct.size == short.size,
      "qNN prefixes must be unique for the compact bench line")
    // top-20 cap: in a badly contended environment MOST spreads exceed the
    // threshold, and an unbounded noisy map would re-create the overflow this
    // line exists to avoid
    val noisy = spreads.filter { case (_, sp) => sp > 0.25 }
      .sortBy(-_._2).take(20)
      .map { case (n, sp) => shortKey(n) -> sp }
    val noisyJson = if (noisy.isEmpty) "" else s""","noisy":${jmap(noisy)}"""
    val failedShort =
      if (failures.isEmpty) ""
      else s""","failed_passes":${jmap(failures.map { case (n, c) => shortKey(n) -> c })}"""
    // canary + total + count TRAILING: the driver keeps only the LAST ~2000
    // chars of stdout, which truncates the HEAD of this line — BENCH_r15's
    // tail starts mid-`queries`, so `value` and q00 (sorts first) were
    // invisible and the canary convention couldn't normalize driver-vs-
    // driver reads. Keys placed after `noisy` survive any truncation that
    // leaves valid JSON visible at all.
    val canary = results.collectFirst { case ("q00_canary", v) => r3(v) }.getOrElse(-1.0)
    // canary SET median (r19, VERDICT r18 #2): one ~0.1 s canary drifts
    // 1.3–2× run-to-run, which cannot settle a ±20 % round-over-round
    // question. Five trivial queries of DIFFERENT shapes (scan probe,
    // distinct shuffle, filter scan, tokenize kernel, string-distance
    // expression), median of their per-query mins — a far stabler
    // environment normalizer. `cpus`/`master` also ride the line so the
    // driver's scaling probe can SEE the honored core contract instead of
    // inferring it from flat sub-second ratios.
    val canarySetNames = Seq("q00_canary", "q09_distinct", "q29_doc_filter",
      "q52_token_count", "q74_jaro_winkler")
    val canarySamples = canarySetNames
      .flatMap(n => results.collectFirst { case (`n`, v) if v >= 0 => v })
      .sorted
    val canary5 =
      if (canarySamples.isEmpty) -1.0 else r3(canarySamples(canarySamples.size / 2))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(short)},"sf":$sfNum,"runs":$runs$noisyJson$failedShort,"n_queries":${names.size},"cpus":$cpus,"master":"local[$cpus]","canary":$canary,"canary5":$canary5,"total_sec":$total}""")
    spark.stop()
  }
}
