package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×K scale-up of a driver testdata directory — the
  * scale-curve audit's data generator (VERDICT r15 next-round #3).
  *
  * The driver SFs (0.001/0.01/0.1) give three distribution-matched decades;
  * this tool extends the curve one more decade by cloning `documents` and
  * `events` K× with remapped ids, in two modes that isolate the two things
  * a ×10 corpus can do to a dedup family:
  *
  *   - **uniq** (growth-exponent fitting): copy 0 is the original corpus
  *     byte-for-byte; copies 1..K-1 prefix every whitespace token with a
  *     per-copy tag (`c3x…`), so cross-copy shingle/token Jaccard is 0 and
  *     each copy reproduces the original near-dup structure internally.
  *     Pair graphs, posting lists, LSH buckets, and vocabularies all grow
  *     ~linearly in K — a bigger corpus of the SAME shape, which is what a
  *     growth exponent must be fitted on. Event copies remap `user_id`
  *     (10× keys, same per-key shape).
  *   - **dup** (adversarial density stress): copies are EXACT text clones
  *     under fresh doc_ids, so every document joins a K-clone near-dup
  *     cluster — per-bucket candidate pairs grow ~K² and the posting/bucket
  *     caps must be what bounds the pair graph. Event copies keep
  *     `user_id` (K× mass per key: the trailing-window stressor).
  *
  * All other tables are copied verbatim (the scan families they back are
  * not under audit here). Ids remap by `copy * 10^9` — far above any
  * driver-generated id at any SF, so clones never collide with originals.
  * No RNG anywhere: two runs produce bit-identical directories.
  */
object ScaleUp {

  /** Id offset per clone copy; driver ids are ≪ 10^9 at every SF. */
  val CopyIdOffset: Long = 1000000000L

  private def withCopies(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__copy", explode(sequence(lit(0), lit(factor - 1))))

  /** `documents` ×factor. uniq=true tags every token of copies ≥1 so the
    * clone is token-disjoint from every other copy (and recomputes
    * n_chars); uniq=false clones text verbatim (K-clone dup clusters).
    */
  def scaleDocuments(docs: DataFrame, factor: Int, uniq: Boolean): DataFrame = {
    val c = withCopies(docs, factor)
    val tagged =
      if (!uniq) c
      else c.withColumn(
        "text",
        when(col("__copy") === 0, col("text")).otherwise(
          // split on \s+ (the engine's own tokenizer boundary), not a
          // literal space: a tab/newline/double-space corpus would
          // otherwise leave post-whitespace tokens untagged and shared
          // across copies — breaking the token-disjointness invariant the
          // uniq growth fit rests on
          array_join(
            transform(
              split(col("text"), "\\s+"),
              w => concat(lit("c"), col("__copy").cast("string"), lit("x"), w)),
            " ")))
    tagged
      .withColumn("doc_id", col("doc_id") + col("__copy") * CopyIdOffset)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__copy")
  }

  /** `events` ×factor. uniq=true remaps user_id per copy (more keys, same
    * per-key distribution); uniq=false keeps user_id (K× mass per key).
    */
  def scaleEvents(events: DataFrame, factor: Int, uniq: Boolean): DataFrame = {
    val c = withCopies(events, factor)
    val keyed =
      if (uniq) c.withColumn("user_id", col("user_id") + col("__copy") * CopyIdOffset)
      else c
    keyed
      .withColumn("event_id", col("event_id") + col("__copy") * CopyIdOffset)
      .drop("__copy")
  }

  private def copyRecursive(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      // Files.list holds an open directory handle until closed — a deep
      // recursive copy would otherwise leak one fd per directory level
      val s = Files.list(src)
      try s.forEach(p => copyRecursive(p, dst.resolve(p.getFileName)))
      finally s.close()
    } else {
      Files.createDirectories(dst.getParent)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Build `outDir` as a full testdata directory: scaled documents/events,
    * every other table copied verbatim.
    */
  def build(spark: SparkSession, inDir: String, outDir: String, factor: Int,
      uniq: Boolean): Unit = {
    import java.nio.file.Paths
    val docs = graft.Tables.documents(spark, inDir)
    if (uniq) {
      // the per-copy tag must not pre-exist in the corpus, or copy 0's
      // untouched text shares tokens with a tagged copy and the uniq
      // invariant silently degrades into partial dup density — fail loudly
      val collisions =
        docs.filter(col("text").rlike("(^|\\s)c[0-9]+x")).count()
      require(collisions == 0L,
        s"$collisions document(s) already contain 'c<digit>x'-prefixed " +
        "tokens: the uniq tag would collide; pick a different corpus or tag")
    }
    val scaled = Map(
      "documents" -> scaleDocuments(docs, factor, uniq),
      "events" -> scaleEvents(graft.Tables.events(spark, inDir), factor, uniq))
    scaled.foreach { case (name, df) =>
      df.coalesce(4).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$name.parquet")
    }
    val in = Paths.get(inDir)
    val listing = java.nio.file.Files.list(in)
    try listing.forEach { p =>
      val name = p.getFileName.toString
      if (!scaled.keySet.exists(t => name == s"$t.parquet"))
        copyRecursive(p, Paths.get(outDir).resolve(name))
    } finally listing.close()
  }

  /** args: inDir outDir factor mode(uniq|dup) */
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS, mode) = args
    require(mode == "uniq" || mode == "dup", s"mode must be uniq|dup, got $mode")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, inDir, outDir, factorS.toInt, uniq = mode == "uniq")
    spark.stop()
  }
}
