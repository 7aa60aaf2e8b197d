package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q45_embed_neardup,q91_... → dump a subset for
    // local pre-flight (tools/check_oracle.py) without the ~90 other
    // queries; unset (the driver's mode) = everything. Unknown names are a
    // hard error, same rationale as Bench's SPARK_GRAFT_BENCH_ONLY. An
    // empty/whitespace value is treated as UNSET (mirrors Bench's
    // `.filter(_.nonEmpty)` fallback) — previously it yielded an empty
    // query set and Verify silently wrote nothing.
    val selected = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map { raw =>
        val reqs = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = reqs.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
        SparkEntry.queries.view.filterKeys(reqs).toMap
      }
      .filter(_.nonEmpty)
      .getOrElse(SparkEntry.queries)
    // Failed queries must be LOUD in the artifact: a broken query used to
    // print to stderr and vanish from CORRECTNESS as an absent key (r10: 14
    // events-backed queries disappeared silently). Now every failure writes
    // a per-query `<name>/_error.txt` marker plus a top-level `errors.json`
    // so the breakage is visible in the dump itself.
    // Every graft.* cap metric observed anywhere in the sweep accumulates
    // here → caps_fired.json: per-round evidence the guards fire on the
    // real data, not only inside hand-built specs.
    val caps = graft.tools.CapMetricsListener.register(spark)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // name → (rows, sorted-row SHA-256 of the dumped result) — the
    // machine-independent canonical digest (tools/digest_dump.py is the
    // Python twin) that makes a driver-vs-local hash mismatch diffable:
    // digests agree ⇒ the engine outputs are identical and the divergence
    // is in the compare environment; digests differ ⇒ the engine run
    // differs and the twin's --diff prints the first differing rows.
    val digests = scala.collection.mutable.LinkedHashMap.empty[String, (Long, String)]
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // digest read-back decodes under the java.time API: java.sql.Date
        // decode reflects into sun.util.calendar.ZoneInfo, which a bare
        // `java -cp` launch (no spark-class --add-opens) cannot access;
        // LocalDate/Instant need no module opens and CanonDigest renders
        // both representations to the same canonical string. Scoped so
        // the queries themselves run under the session default.
        //
        // The digest has its OWN catch: a digest-layer failure must not
        // mark a query whose parquet was written fine as failed — the
        // query simply gets no digests.json entry (visible as a gap),
        // and the cause goes to stderr.
        try {
          val j8 = "spark.sql.datetime.java8API.enabled"
          val j8prev = spark.conf.get(j8)
          spark.conf.set(j8, "true")
          try digests(name) =
            graft.tools.CanonDigest.digest(spark.read.parquet(s"$outDir/$name"))
          finally spark.conf.set(j8, j8prev)
        } catch { case e: Throwable =>
          System.err.println(
            s"[verify] $name digest failed (result parquet is intact): " +
              s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")
        }
      } catch { case e: Throwable =>
        // record the whole cause chain — wrapper codes like
        // EXPRESSION_DECODING_FAILED are useless without their root cause
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(5).map(t =>
            s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("")}")
          .mkString(" <- ")
        val msg = chain
        System.err.println(s"[verify] $name failed: $msg")
        e.printStackTrace()
        errors(name) = msg
        val qDir = Paths.get(s"$outDir/$name")
        Files.createDirectories(qDir)
        Files.writeString(qDir.resolve("_error.txt"), msg)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = graft.functions.JsonUtil.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val digJson = digests
      .map { case (k, (n, h)) => s"${q(k)}: {\"rows\": $n, \"sha256\": ${q(h)}}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/digests.json"), digJson)
    // The listener bus is async — flush before snapshotting so late
    // onSuccess callbacks from the last queries are counted.
    org.apache.spark.sql.GraftBridge.flushListenerBus(spark)
    val capJson = caps.snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/caps_fired.json"), capJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
