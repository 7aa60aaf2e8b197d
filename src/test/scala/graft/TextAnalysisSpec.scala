package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("tokens splits on whitespace runs and drops empties") {
    val got = Seq("  a  b\tc\nd ", "", "single").toDF("t")
      .select(TextFunctions.tokens($"t").as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b", "c", "d"), Seq(), Seq("single")))
  }

  test("shingles: k=2 over 4 tokens gives 3 distinct shingles") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 2).as("s"))
      .as[Seq[String]].head()
    assert(got.toSet == Set("a b", "b c", "c d"))
  }

  test("language id picks the lexicon with most hits, deterministic tie-break") {
    val docs = Seq(
      (1L, "the cat and the dog of a house"), // en-heavy
      (2L, "der hund und die katze"),          // de-heavy
      (3L, "zzz qqq www")                      // no hits → unknown
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "unknown")
  }

  test("quality metrics: known document computes exact ratios") {
    val docs = Seq((1L, "the quick fox.")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(docs).head()
    assert(m.getAs[Long]("n_tokens") == 3L)
    // tokens: the(3) quick(5) fox.(4) → mean 4.0
    assert(math.abs(m.getAs[Double]("mean_tok_len") - 4.0) < 1e-12)
    // one '.' out of 14 chars
    assert(math.abs(m.getAs[Double]("punct_ratio") - 1.0 / 14) < 1e-12)
    // 'the' is a stopword; 'fox.' has trailing punct so is not
    assert(math.abs(m.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
  }

  test("fingerprint: identical texts share fingerprints, different texts (almost) never do") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here entirely now")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("finalized fingerprint: dup texts share, differs from raw-polyhash pick") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here entirely now")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintFinalized(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    // the finalizer is a different permutation: the selected min shingle
    // must not be forced to agree with the raw polyhash's pick, and the
    // value itself is the finalized image of SOME shingle hash
    val raw = TextAnalysis.fingerprintDeterministic(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) != raw(1L), "finalized fingerprint must not equal the raw-polyhash min")
  }

  test("bpeish token count: letters/digits/symbols counted per run") {
    val got = Seq("abc de1 2,x").toDF("t")
      .select(TextFunctions.bpeishTokenCount($"t").as("n"))
      .as[Int].head()
    // abc | de | 1 | 2 | , | x
    assert(got == 6)
  }

  test("readability: hand counts; terminator floor; empty doc yields null score") {
    val docs = Seq(
      // 6 words; 2 sentences ("..." is ONE terminator run); 7 vowel groups:
      // the(e) cat(a) sat(a) here(e,e) down(o) now(o)
      (1L, "the cat sat here. down now..."),
      (2L, "no terminator at all"), // sentences floored to 1
      (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(got(1L)._1 == 6 && got(1L)._2 == 2 && got(1L)._3 == 7, s"doc1 ${got(1L)}")
    val expected1 = BigDecimal(206.835 - 1.015 * (6.0 / 2) - 84.6 * (7.0 / 6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._4.contains(expected1))
    assert(got(2L)._2 == 1, "terminator-free doc must floor sentences at 1")
    assert(got(3L) == ((0, 1, 0, None)), s"empty doc ${got(3L)}")
  }

  // --- winnowing (q197) ---

  private def polyHash(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Independent naive winnowing: per-window min of (hash ≪ 33 | pos). */
  private def naiveWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val enc = toks.sliding(k).map(_.mkString(" ")).zipWithIndex
      .map { case (g, i) => (polyHash(g) << 33) + i }.toArray
    (w - 1 until enc.length)
      .map(j => enc.slice(j - w + 1, j + 1).min)
      .toSet.map((e: Long) => (e >> 33, e % (1L << 33)))
  }

  test("winnowing equals the naive per-window-min selection (incl. repeated grams)") {
    // repeated 3-grams inside one window exercise the leftmost tie rule
    val t1 = "a b c a b c a b c d e f g h i j k l m n"
    val t2 = "x y z w v u t s r q p o n m l k j i h g f e d c b a"
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(got(1L) == naiveWinnow(t1, 3, 4), s"doc1: ${got(1L)}")
    assert(got(2L) == naiveWinnow(t2, 3, 4), s"doc2: ${got(2L)}")
  }

  test("winnowing guarantee: a shared ≥ w+k−1 token run yields a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 = w+k−1
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight nine ten"),
      (2L, s"uno dos tres cuatro cinco seis $shared siete ocho nueve diez"),
      (3L, "totally different text with no overlap at all whatsoever here today"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowOverlapPairs(docs, k = 3, w = 8,
        minShared = 1, maxDocsPerFingerprint = 50)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)), s"shared run must be caught: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"doc3 matches nothing: $pairs")
  }

  test("winnowOverlapBetween: cross-slice pairs only; union-population boilerplate cap") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val newD = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"prefix tokens here $shared and a tail of words now")) // new-new pair exists in self-join form
      .toDF("doc_id", "text")
    val oldD = Seq(
      (10L, s"uno dos tres $shared cuatro cinco seis siete"),
      (11L, "totally unrelated old content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowOverlapBetween(newD, oldD, 3, 8,
        minShared = 1, maxDocsPerFingerprint = 50)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(got.contains((1L, 10L)) && got.contains((2L, 10L)), s"got $got")
    assert(got.forall(p => Set(1L, 2L)(p._1) && Set(10L, 11L)(p._2)),
      s"only new×old pairs may emit: $got")
    // identical texts: EVERY selected fingerprint sits on all 3 docs
    // across sides → a union cap of 2 drops them whole even though each
    // side alone (2 and 1 docs) is under the cap
    val t = s"$shared lambda mu nu xi omicron pi rho sigma"
    val cloneNew = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val cloneOld = Seq((10L, t)).toDF("doc_id", "text")
    assert(TextAnalysis.winnowOverlapBetween(cloneNew, cloneOld, 3, 8, 1, 50)
      .count() == 2L, "sanity: uncapped finds both cross pairs")
    val capped = TextAnalysis.winnowOverlapBetween(cloneNew, cloneOld, 3, 8,
      minShared = 1, maxDocsPerFingerprint = 2)
    assert(capped.count() == 0L,
      "boilerplate is counted over the union population")

    // a doc present on BOTH sides (a re-crawl of standing content) never
    // pairs with itself and counts ONCE toward the cap
    val overlapNew = Seq((1L, t), (10L, t)).toDF("doc_id", "text")
    val both = TextAnalysis.winnowOverlapBetween(overlapNew, cloneOld, 3, 8,
        minShared = 1, maxDocsPerFingerprint = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(both == Set((1L, 10L)),
      s"no self-pair; 2 distinct docs stay under cap 2: $both")
  }

  test("winnowing: sub-window documents emit nothing; boilerplate cap drops hot fingerprints") {
    val tiny = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text") // 9 < w+k−1
    assert(TextAnalysis.winnowFingerprints(tiny, 3, 8).count() == 0L)

    val boiler = "same exact boilerplate text repeated on every single document here"
    val docs = (1L to 5L).map(i => (i, boiler)).toDF("doc_id", "text")
    val open = TextAnalysis.winnowOverlapPairs(docs, 3, 8, 1, maxDocsPerFingerprint = 50)
    assert(open.count() == 10L, "5 identical docs → all 10 pairs")
    val capped = TextAnalysis.winnowOverlapPairs(docs, 3, 8, 1, maxDocsPerFingerprint = 4)
    assert(capped.count() == 0L, "fingerprints on 5 > cap=4 docs drop whole")
  }
}
