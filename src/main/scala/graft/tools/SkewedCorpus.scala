package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Deterministic SKEWED test corpus — the adversarial twin of the uniform
  * driver testdata. Every 100 TB claim in the engine (bucket caps,
  * sub-block policy, posting caps, store caps, salting) is motivated by
  * skew, but the uniform `/root/testdata` corpus never fires a single cap
  * under measurement; this generator builds the corpus where they all do:
  *
  *   - ONE GIANT NEAR-DUP CLUSTER (`hotFrac` of documents share a 60-token
  *     base text with two per-doc trailing tokens → pairwise word-3-shingle
  *     Jaccard ≈ 0.93): every LSH band maps the whole cluster into one
  *     bucket (minhash bucket caps), every base shingle's posting list is
  *     the cluster size (jaccardBetween / PPJoin posting caps), and the
  *     exact pair count is ~(hotFrac·N)² (the quadratic blowup the caps
  *     exist to bound).
  *   - A BOILERPLATE-HEAVY SOURCE (`boilerFrac` share one 30-token template
  *     prefix): corpus-wide gram document frequency far above any
  *     `maxDfFraction`, the `boilerplateCoverage` signal.
  *   - ONE HOT GROUP/JOIN KEY (`source = "hotsrc"` for the near-dup AND
  *     boilerplate populations — ~70% of all rows): the salted-aggregation
  *     / salted-join stressor.
  *   - ONE DOMINANT LANGUAGE (90% `en`): per-language windows/quantiles
  *     get one partition holding 90% of the corpus.
  *   - COLD NEAR-DUP TWINS (band-9 backgrounds pair up at J ≈ 0.92, two
  *     docs per pair): the control population — posting lists and LSH
  *     buckets of size 2 that no cap may ever touch, so "cold results are
  *     bit-identical under the cap" is checked against non-empty sets.
  *   - ONE HOT SEMANTIC CELL (half of all embeddings within ~4° of axis 0,
  *     all with `label` 0, all in one sign-LSH bucket): the SemDeDup
  *     sub-block policy, the embedding-block drop policy, and the blocked
  *     k-NN join all see their degenerate block. `vec_id` 0–15 are exact
  *     unit axes, so [[graft.operators.Similarity.centroids]]' first-16
  *     seeding yields orthogonal cells with the hot mass in cell 0.
  *
  * All content is derived from splitmix64 of the row id — no RNG state, so
  * any two runs (and the spec's tiny fixture vs the bench's big one) agree
  * row for row at a shared id. Schemas match the driver tables exactly
  * (`documents`: doc_id, text, lang, source, n_chars; `embeddings`:
  * vec_id, embedding float[], label int).
  */
object SkewedCorpus {

  /** splitmix64 — deterministic per-(id, stream) pseudo-randomness. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val vocab: Array[String] = Array(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "batch", "window", "spark", "order", "data", "column", "join",
    "small", "line", "customer", "query", "filter", "the", "a", "sort",
    "merge", "shuffle", "stage", "task", "plan", "codegen", "broadcast",
    "skew", "salt", "bucket", "range", "index", "store", "stream", "state",
    "token", "shingle", "band", "probe", "cell", "vector", "cosine", "near",
    "exact", "cap", "block", "split", "drop", "keep", "admit", "gate",
    "chunk", "shard", "pack", "score", "rank", "tier", "card", "release")

  private def word(id: Long, j: Int): String =
    vocab((mix64(id * 1013L + j) & 0x7FFFFFFF).toInt % vocab.length)

  /** The shared 60-token base text of the giant near-dup cluster (stream
    * id −1, so it never collides with any per-doc stream).
    */
  private val hotBase: String =
    (0 until 60).map(j => word(-1L, j)).mkString(" ")

  /** The shared 30-token boilerplate template (stream id −2). */
  private val boilerTemplate: String =
    (0 until 30).map(j => word(-2L, j)).mkString(" ")

  private def lang(id: Long): String = {
    val m = (((mix64(id * 7177L) % 100) + 100) % 100).toInt
    if (m < 90) "en" else Array("de", "fr", "es", "zh").apply(m % 4)
  }

  /** Build the skewed `documents` table. Population by `doc_id` band:
    * id%10 ∈ [0,4) → near-dup cluster (40%), ∈ [4,7) → boilerplate (30%),
    * else background (30%) — EXCEPT band 9, whose docs come in COLD
    * NEAR-DUP TWIN PAIRS (id, id+10 with id%20==9): each pair shares a
    * 50-token base plus two unique trailers (3-shingle J ≈ 0.92). Twins
    * give every cap-invariance test a non-empty cold near-dup set to
    * compare (posting lists of length 2, LSH buckets of size 2 — nothing
    * a cap should ever touch); without them "cold pairs unaffected"
    * assertions compare two empty sets and prove nothing.
    */
  def documents(spark: SparkSession, nDocs: Int,
                hotFrac: Double = 0.4, boilerFrac: Double = 0.3): DataFrame = {
    require(hotFrac + boilerFrac < 1.0, "need a nonempty background population")
    val hotMod = math.round(hotFrac * 10).toInt
    val boilMod = hotMod + math.round(boilerFrac * 10).toInt
    import spark.implicits._
    val base = hotBase
    val template = boilerTemplate
    spark.range(nDocs).map { id =>
      val band = (id % 10).toInt
      val text =
        if (band < hotMod)
          // two unique trailing tokens: J(base+2, base+2') ≈ 57/61 ≈ 0.93
          s"$base u$id v${id % 13}"
        else if (band < boilMod)
          template + " " + (0 until 30).map(j => word(id * 31L + 7, j)).mkString(" ")
        else if (band == 9) {
          // cold twins: shared base drawn from the LOWER id of the pair
          val pairBase: Long = if (id % 20 == 19) id - 10 else id.toLong
          (0 until 50).map(j => word(pairBase * 31L + 13, j)).mkString(" ") +
            s" u$id v${id % 13}"
        } else
          (0 until (50 + (mix64(id) & 0x1F).toInt)).map(j => word(id, j)).mkString(" ")
      val source =
        if (band < boilMod) "hotsrc" else s"src${(id % 40).toInt}"
      (id, text, lang(id), source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Build the skewed `embeddings` table: `vec_id` 0–15 are exact unit
    * axes (centroid seeds); of the rest, every even id is the hot cluster
    * (≈4° cone around axis 0, label 0) and every odd id is background
    * (≈4° cone around axis 1+id%15, label 1+id%15).
    */
  def embeddings(spark: SparkSession, nVecs: Int, dim: Int = 64): DataFrame = {
    require(dim >= 32, s"need dim >= 32 for the axis layout, got $dim")
    require(nVecs > 16, s"need more than the 16 seed vectors, got $nVecs")
    import spark.implicits._
    spark.range(nVecs).map { id =>
      val v = new Array[Float](dim)
      if (id < 16) {
        v(id.toInt) = 1.0f
        (id, v.toSeq, id.toInt)
      } else if (id % 2 == 0) {
        v(0) = 1.0f
        // two small off-axis components ≤ 0.05 → cos to axis 0 ≥ 0.9975
        v(1 + (mix64(id * 3L) & 7L).toInt) = 0.03f + 0.01f * ((id % 3).toInt)
        v(9 + (mix64(id * 5L) & 7L).toInt) = 0.02f
        (id, v.toSeq, 0)
      } else {
        val axis = 1 + ((id % 15).toInt)
        v(axis) = 1.0f
        v(16 + (mix64(id * 11L) & 15L).toInt) = 0.03f + 0.01f * ((id % 4).toInt)
        (id, v.toSeq, axis)
      }
    }.toDF("vec_id", "embedding", "label")
  }

  /** Build the skewed (basket, item) stream — the market-basket stressor:
    * ONE MEGA-BASKET (basket_id 0 with `hotItems` distinct items — the
    * crawler session / bot cart whose k·(k−1)/2 ≈ hotItems²/2 pair volume
    * IS the reason [[graft.operators.Association.pairRulesGuarded]]
    * exists) plus ~nRows/4 small 4-item baskets drawn from a 50k-item
    * catalog (the benign population whose pairs a guard must not touch).
    * Items are disjoint between the two populations so excising the hot
    * basket provably leaves cold pair stats bit-stable.
    */
  def baskets(spark: SparkSession, nRows: Int, hotItems: Int = 4000): DataFrame = {
    require(nRows > hotItems, s"need small baskets too: $nRows vs $hotItems")
    import spark.implicits._
    spark.range(nRows).map { id =>
      if (id < hotItems) (0L, 1000000L + id) // hot: all-distinct items
      else (id / 4 + 1L, (mix64(id * 17L) & 0x7FFFFFFFL) % 50000L)
    }.toDF("basket_id", "item")
  }

  /** Write the tables as parquet under `dir` (driver-table layout).
    * `hotItems` sizes the mega-basket: the default keeps the OPEN pair
    * form affordable (~8M pairs) so BenchSkew can price both forms; the
    * 10× soak raises it to where only the guarded form survives.
    */
  def write(spark: SparkSession, dir: String, nDocs: Int, nVecs: Int,
            hotItems: Int = 4000): Unit = {
    documents(spark, nDocs).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    embeddings(spark, nVecs).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    baskets(spark, nDocs * 4, hotItems).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/baskets.parquet")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_skewdata")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "5000").toInt
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_SKEW_VECS", "4000").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, dir, nDocs, nVecs)
    println(s"[skewed-corpus] wrote $nDocs documents + $nVecs embeddings to $dir")
    spark.stop()
  }
}
