package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Sessionize}

/** Hand-computed ground truth for the corpus-curation operators
  * (TF-IDF, BM25, repetition, entropy, redaction, contamination,
  * stratified sampling, packing, sessionization).
  */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b a c", "s1"),   // 4 tokens: a×2 b c
    (1L, "a b", "s1"),       // 2 tokens
    (2L, "c c c c", "s2"),   // 4 tokens, all c
    (3L, "d e f g", "s2")    // 4 unique tokens
  ).toDF("doc_id", "text", "source")

  test("tfidf matches hand computation") {
    val out = Corpus.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // term 'a': df=2, N=4 → idf=ln(2). doc0 tf=2/4, doc1 tf=1/2
    assert(math.abs(out((0L, "a")) - 0.5 * math.log(2)) < 1e-12)
    assert(math.abs(out((1L, "a")) - 0.5 * math.log(2)) < 1e-12)
    // term 'd': df=1 → idf=ln(4), tf=1/4
    assert(math.abs(out((3L, "d")) - 0.25 * math.log(4)) < 1e-12)
    // term 'c' in doc2: tf=1 (4/4), df=2 → ln 2
    assert(math.abs(out((2L, "c")) - math.log(2)) < 1e-12)
  }

  test("bm25 matches hand computation for a one-term query") {
    // query = {c}: df=2, N=4 → idf = ln(1 + 2.5/2.5) = ln 2; avgdl = 14/4
    val out = Corpus.bm25(docs, "doc_id", "text", Seq("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = 14.0 / 4
    def score(tf: Double, dlen: Double): Double =
      math.log(2) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl))
    assert(math.abs(out(0L) - score(1, 4)) < 1e-12)
    assert(math.abs(out(2L) - score(4, 4)) < 1e-12)
    assert(!out.contains(1L) && !out.contains(3L))
  }

  test("conjunctiveSearch keeps exactly the all-terms docs, scored identically to bm25") {
    val corpus = Seq(
      (1L, "alpha beta gamma extra words"),
      (2L, "alpha beta beta"),            // missing gamma → excluded
      (3L, "gamma beta alpha alpha"),
      (4L, "delta delta")                 // no query term
    ).toDF("doc_id", "text")
    val q = Seq("alpha", "beta", "gamma")
    val got = Corpus.conjunctiveSearch(corpus, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 3L))
    // on the matching docs the conjunctive score IS the bm25 bag score
    val bag = Corpus.bm25(corpus, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, s) => assert(math.abs(s - bag(id)) < 1e-12, s"doc $id") }
    // a single-term query degenerates to bm25's matching set
    val one = Corpus.conjunctiveSearch(corpus, "doc_id", "text", Seq("beta"))
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(1L, 2L, 3L))
  }

  test("per-source keyword extraction surfaces each source's distinctive term first") {
    // mirror of the q148 pipeline over a hand corpus: 'alpha' is unique to
    // src A, 'beta' to src B, 'noise' is everywhere (idf = 0 → weight 0)
    val corpus = Seq(
      (1L, "alpha alpha noise", "A"),
      (2L, "alpha noise noise", "A"),
      (3L, "beta noise noise", "B"),
      (4L, "beta beta noise", "B")).toDF("doc_id", "text", "source")
    val st = Corpus.tfidf(corpus, "doc_id", "text")
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("t6", floor(col("tfidf") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("source", "term").agg(sum("t6").as("s6"))
    val top = st.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("s6").desc, col("term").asc)))
      .filter(col("rank") === 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("A" -> "alpha", "B" -> "beta"))
    // the ubiquitous term carries zero weight (ln(N/df) = ln 1 = 0)
    val noise = st.filter(col("term") === "noise").collect().map(_.getLong(2))
    assert(noise.forall(_ == 0L))
  }

  test("tfidfCosinePairs: identical docs similar, disjoint docs absent") {
    val corpus = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),   // identical to 0 → sim 1.0
      (2L, "delta epsilon zeta"), // disjoint vocabulary
      (3L, "alpha beta other")    // partial overlap
    ).toDF("doc_id", "text")
    val out = Corpus.tfidfCosinePairs(corpus, "doc_id", "text", minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((0L, 1L)) - 1.0) < 1e-12)
    assert(!out.contains((0L, 2L)) && !out.contains((1L, 2L)) && !out.contains((2L, 3L)))
    assert(out((0L, 3L)) > 0.0 && out((0L, 3L)) < 1.0)
  }

  test("unigramSurprisal: hand computation; rare tokens score above common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common rare")).toDF("doc_id", "text")
    // model: p(common)=7/8, p(rare)=1/8
    val got = Corpus.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s1 = -math.log(7.0 / 8)
    val s2 = -(3 * math.log(7.0 / 8) + math.log(1.0 / 8)) / 4
    assert(math.abs(got(1L) - s1) < 1e-12, s"doc1 ${got(1L)} != $s1")
    assert(math.abs(got(2L) - s2) < 1e-12, s"doc2 ${got(2L)} != $s2")
    assert(got(2L) > got(1L), "rare-token doc must be more surprising")
  }

  test("repetitionRatio: all-same bigrams vs all-distinct") {
    val out = docs.select(col("doc_id"), Corpus.repetitionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) == 1.0 - 1.0 / 3.0) // bigrams: c c ×3 → 1 distinct of 3
    assert(out(3L) == 0.0)             // d e / e f / f g all distinct
    assert(out(1L) == 0.0)             // single bigram
  }

  test("tokenEntropy: uniform and degenerate distributions") {
    val out = Corpus.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(2L)) < 1e-12)                 // all same token → 0
    assert(math.abs(out(3L) - math.log(4)) < 1e-12)   // 4 uniform → ln 4
    // doc0: counts (2,1,1), L=4 → ln4 - (2 ln2)/4
    assert(math.abs(out(0L) - (math.log(4) - 2 * math.log(2) / 4)) < 1e-12)
  }

  test("redact replaces matches and counts them") {
    val (red, n) = Corpus.redact(col("text"), "\\bc\\b", "[X]")
    val out = docs.select(col("doc_id"), red.as("r"), n.as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) == (("a b a [X]", 1L)))
    assert(out(2L) == (("[X] [X] [X] [X]", 4L)))
    assert(out(3L) == (("d e f g", 0L)))
  }

  test("contamination flags only docs sharing a k-gram with the benchmark") {
    val corpus = Seq(
      (10L, "w x y z"),     // shares trigram "w x y" with benchmark
      (11L, "p q r s")      // clean
    ).toDF("doc_id", "text")
    val bench = Seq((0L, "w x y q")).toDF("doc_id", "text")
    val out = Corpus.contamination(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, 1L)))
  }

  test("stratifiedSample keeps ranks 1, 11, 21, ... per stratum") {
    val df = (0L until 40L).map(i => (i, if (i < 25) "a" else "b")).toDF("id", "s")
    val kept = Corpus.stratifiedSample(df, "s", "id", 10)
      .collect().map(r => r.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 10L, 20L, 25L, 35L))
  }

  test("packSequences bins by cumulative tokens within each shard") {
    val df = Seq(
      (0L, "t " * 6, "s"),  // 6 tokens, before=0  → bin 0
      (1L, "t " * 6, "s"),  // before=6  → bin 0
      (2L, "t " * 6, "s"),  // before=12 → bin 1
      (3L, "t " * 6, "z")   // separate shard, before=0 → bin 0
    ).toDF("doc_id", "text", "source")
    val out = Corpus.packSequences(df, "source", "doc_id", "text", budget = 10)
      .select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  test("chunkTokens: boundaries, overlap, short-doc and exact-fit cases") {
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (0L, words),                              // 12 tokens, window 5 stride 4 → chunks at 0,4,8 (last len 4... see below)
      (1L, "a b c"),                            // 3 tokens ≤ window → one whole chunk
      (2L, (1 to 5).map(i => s"x$i").mkString(" ")), // exactly window → one chunk
      (3L, (1 to 9).map(i => s"y$i").mkString(" "))  // 9 tokens → chunks [0,5) and [4,9): last is full
    ).toDF("doc_id", "text")
    val out = Corpus.chunkTokens(df, "doc_id", "text", window = 5, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 0: ceil((12-5)/4)=2 → last idx 2 → chunks start 0,4,8; chunk 2 has 4 tokens
    assert(out((0L, 0L)) == (5L, "w1 w2 w3 w4 w5"))
    assert(out((0L, 1L)) == (5L, "w5 w6 w7 w8 w9"))
    assert(out((0L, 2L)) == (4L, "w9 w10 w11 w12"))
    assert(out((1L, 0L)) == (3L, "a b c"))
    assert(out.keys.count(_._1 == 1L) == 1)
    assert(out((2L, 0L)) == (5L, "x1 x2 x3 x4 x5"))
    assert(out.keys.count(_._1 == 2L) == 1)
    assert(out((3L, 0L)) == (5L, "y1 y2 y3 y4 y5"))
    assert(out((3L, 1L)) == (5L, "y5 y6 y7 y8 y9"))
    assert(out.keys.count(_._1 == 3L) == 2)
    // every token of every doc appears in at least one chunk (coverage)
    assert(out.filter(_._1._1 == 0L).values.flatMap(_._2.split(" ")).toSet.size == 12)
  }

  test("shardShuffle: a reproducible permutation — every row once, " +
      "contiguous per-shard positions, identical across runs") {
    val ids = Tables.documents(spark, sfDir).select("doc_id")
    def run() = Corpus.shardShuffle(ids, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = run()
    assert(a.map(_._1).size == a.size && a.size == ids.count(), "a permutation: every doc once")
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size),
        s"shard $shard positions must be contiguous 1..n")
    }
    assert(a.map(_._2).size > 1, "hash actually spreads across shards")
    assert(run() == a, "no RNG anywhere: the permutation is retry-stable")
  }

  test("boilerplateCoverage flags corpus-frequent grams only") {
    val d = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y z"))
      .toDF("doc_id", "text")
    // k=2 grams: doc1 {a b, b c}, doc2 {a b, b d}, doc3 {x y, y z};
    // df("a b")=2 > 3*0.4 → the only boilerplate gram
    val out = Corpus.boilerplateCoverage(d, "doc_id", "text", k = 2, maxDfFraction = 0.4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_ratio"))))
      .toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("approxQuantileBuckets tracks rankBuckets (broadcast breakpoints vs exact terciles)") {
    val full = Tables.documents(spark, sfDir)
    val scored = Corpus.unigramSurprisal(full, "doc_id", "text")
      .join(full.select("doc_id", "lang"), Seq("doc_id"))
    def dist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lang", "bucket").count()
        .collect()
        .map(r => (r.getString(0), r.getAs[Number]("bucket").longValue()) -> r.getLong(2))
        .toMap
    val exact = dist(Corpus.rankBuckets(scored, "lang", "surprisal", "doc_id", 3))
    val approx = dist(Corpus.approxQuantileBuckets(scored, "lang", "surprisal", 3))
    assert(exact.values.sum == approx.values.sum, "no rows lost to bucketing")
    assert(exact.keys.map(_._2).toSet == Set(1L, 2L, 3L))
    // value-based assignment may move boundary ties between adjacent
    // buckets; the DISTRIBUTION must agree (±25% or 2 docs per cell)
    exact.foreach { case (k, ne) =>
      val na = approx.getOrElse(k, 0L)
      assert(math.abs(na - ne) <= math.max(2L, (ne * 0.25).toLong),
        s"bucket $k diverged: exact=$ne approx=$na")
    }
    // a null partition key is its own stratum (null-safe join), not dropped
    val withNull = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      (null, 5.0), (null, 6.0), (null, 7.0)).toDF("part", "score")
    assert(Corpus.approxQuantileBuckets(withNull, "part", "score", 3).count() == 6,
      "null-part rows must be bucketed, not silently dropped")
  }

  test("sessionize splits at gaps and rolls up sessions") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 7L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 7L), // > 1h gap
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 8L)
    ).toDF("event_id", "ts", "user_id")
    val out = Sessionize.sessions(ev, "user_id", "ts", "event_id", gapMs = 3600 * 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((7L, 1L)) == ((2L, 600000L)))
    assert(out((7L, 2L)) == ((1L, 0L)))
    assert(out((8L, 1L)) == ((1L, 0L)))
  }

  test("transitionMatrix: session-gap transitions only, exact counts, rows normalize to 1") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 7: a→b, b→a, then a >1h later (NOT a transition), then a→b
      (1L, t(0), 7L, "a"), (2L, t(1), 7L, "b"), (3L, t(2), 7L, "a"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 7L, "a"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 02:01:00"), 7L, "b"),
      // user 8: single event — no transitions; never crosses into user 7
      (6L, t(0), 8L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessionize.transitionMatrix(ev, "user_id", "ts", "event_id",
        "event_type", gapMs = 3600 * 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1.0)),   // both within-session a's go to b
      ("b", "a") -> ((1L, 1.0))),
      s"got $got")
  }

  test("entropyRate: deterministic loop 0, uniform 2-state ln 2, mixed hand value; shares q207's gap rule") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def rate(seq: Seq[(Long, java.sql.Timestamp, Long, String)]): (Long, Long, Double) =
      Sessionize.entropyRate(seq.toDF("event_id", "ts", "user_id", "event_type"),
          "user_id", "ts", "event_id", "event_type", gapMs = 3600 * 1000)
        .as[(Long, Long, Double)].head()
    // a→b→a→b…: every transition is certain → 0 nats
    val loop = (0 to 6).map(i =>
      (i.toLong, t(i), 1L, if (i % 2 == 0) "a" else "b"))
    assert(rate(loop) == ((6L, 2L, 0.0)), s"got ${rate(loop)}")
    // from 'a' the next state is b or c with equal counts; rows from b/c
    // return to a deterministically: H = π(a)·ln2 = (2/4)·ln2
    val mixed = Seq((1L, t(0), 1L, "a"), (2L, t(1), 1L, "b"), (3L, t(2), 1L, "a"),
      (4L, t(3), 1L, "c"), (5L, t(4), 1L, "a"))
    val (n, s, h) = rate(mixed)
    assert(n == 4L && s == 3L, s"got ($n, $s, $h)")
    assert(math.abs(h - 0.5 * math.log(2.0)) < 1e-6, s"got $h")
  }

  test("sessionTrigrams: both hops gap-checked — a session boundary never fabricates a path") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val ev = Seq(
      (1L, t(0), 1L, "a"), (2L, t(1), 1L, "b"), (3L, t(2), 1L, "c"),
      // >1h break: (b,c,d) fails the second hop, (c,d,e) fails the first
      (4L, t(200), 1L, "d"), (5L, t(201), 1L, "e"), (6L, t(202), 1L, "f"),
      // another user never mixes in
      (7L, t(0), 2L, "x"), (8L, t(1), 2L, "y"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessionize.sessionTrigrams(ev, "user_id", "ts", "event_id",
        "event_type", gapMs = 3600 * 1000, topN = 10)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", "c", 1L), ("d", "e", "f", 1L)), s"got $got")
  }

  test("duplicatedSpans: cross-doc spans, run lengths, within-doc repeats excluded") {
    // docs 10/11 share the verbatim 7-token span "p q r s t u v": with k=3
    // that is 5 consecutive duplicated windows (span = run + k − 1 = 7).
    // doc 12 repeats ITS OWN phrase twice but shares nothing cross-doc;
    // doc 13 is unique and too short for even one window at k=3... no,
    // give it 4 tokens → 2 windows, both unique.
    val d = Seq(
      (10L, "p q r s t u v x1 y1"),       // 9 tokens → 7 windows, 5 dup
      (11L, "z9 p q r s t u v w9"),       // 9 tokens → 7 windows, 5 dup
      (12L, "m n o k m n o k"),           // self-repeat only → 0 cross-doc
      (13L, "a9 b9 c9 d9")                // unique → 0 dup
    ).toDF("doc_id", "text")
    val out = Corpus.duplicatedSpans(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup"),
          r.getAs[Long]("longest_run"), r.getAs[Double]("dup_ratio")))).toMap
    assert(out(10L) == ((7L, 5L, 5L, 0.7143)))
    assert(out(11L) == ((7L, 5L, 5L, 0.7143)))
    // "m n o k" appears twice WITHIN doc 12 but in no other doc — the
    // cross-doc definition must not flag it
    assert(out(12L) == ((6L, 0L, 0L, 0.0)))
    assert(out(13L) == ((2L, 0L, 0L, 0.0)))
    // a doc shorter than k yields no windows and no row
    val tiny = Seq((20L, "a b")).toDF("doc_id", "text")
    assert(Corpus.duplicatedSpans(tiny, "doc_id", "text", k = 3).count() == 0)
  }

  test("removeDuplicatedSpans cuts the shared span from every carrier, keeps the rest") {
    // the duplicatedSpans fixture: docs 10/11 share the 7-token span
    // "p q r s t u v" (5 consecutive dup windows at k=3 → interval
    // [start, start+5+3−2] covers exactly the 7 shared tokens); doc 12
    // self-repeats (cross-doc definition must NOT cut it); doc 13 unique;
    // doc 20 shorter than k → no windows, text passes through normalized.
    val d = Seq(
      (10L, "p q r s t u v x1 y1"),
      (11L, "z9 p q r s t u v w9"),
      (12L, "m n o k m n o k"),
      (13L, "a9 b9 c9 d9"),
      (20L, "a  b")                       // double space: output normalizes
    ).toDF("doc_id", "text")
    val out = Corpus.removeDuplicatedSpans(d, "doc_id", "text", k = 3, minRun = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_removed")))).toMap
    assert(out(10L) == (("x1 y1", 9L, 7L)))
    assert(out(11L) == (("z9 w9", 9L, 7L)))
    assert(out(12L) == (("m n o k m n o k", 8L, 0L)))
    assert(out(13L) == (("a9 b9 c9 d9", 4L, 0L)))
    assert(out(20L) == (("a b", 2L, 0L)))
    assert(out.size == 5, "every input doc must appear in the rewrite")
    // minRun above the fixture's longest run (5): nothing qualifies, all kept
    val strict = Corpus.removeDuplicatedSpans(d, "doc_id", "text", k = 3, minRun = 6)
      .agg(sum("n_removed")).head().getLong(0)
    assert(strict == 0L, "runs below minRun must not be cut")
  }

  test("removeSelfRepeatedSpans keeps the first occurrence, cuts later copies, ignores cross-doc") {
    // doc 1 loops "m n o" three times at k=2: windows repeat from pos 2 on
    // → first "m n o" survives, the rest cut. doc 2 shares doc 3's text
    // verbatim but has no WITHIN-doc repeat → untouched (cross-doc is
    // q131's job). doc 4 unique, doc 5 shorter than k.
    val d = Seq(
      (1L, "m n o m n o m n o"),
      (2L, "p q r s t u v"),
      (3L, "p q r s t u v"),
      (4L, "a1 b1 c1 d1"),
      (5L, "x")
    ).toDF("doc_id", "text")
    val out = Corpus.removeSelfRepeatedSpans(d, "doc_id", "text", k = 2, minRun = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_removed")))).toMap
    // windows of doc 1: (0,mn)(1,no)(2,om)(3,mn)(4,no)(5,om)(6,mn)(7,no);
    // repeated positions 3..7 → run s=3 len=5 → tokens 3..8 cut
    assert(out(1L) == (("m n o", 9L, 6L)), s"got ${out(1L)}")
    assert(out(2L) == (("p q r s t u v", 7L, 0L)))
    assert(out(3L) == (("p q r s t u v", 7L, 0L)))
    assert(out(4L) == (("a1 b1 c1 d1", 4L, 0L)))
    assert(out(5L) == (("x", 1L, 0L)))
    assert(out.size == 5)
  }

  test("bpePairStats counts every pair occurrence weighted by word frequency") {
    import spark.implicits._
    // word counts: "ab"×3 (two in doc 1, one in doc 2), "abc"×1, "aaa"×1.
    // pairs: "ab" = 3 (from "ab") + 1 (from "abc") = 4; "bc" = 1;
    // "aa" = 2 from ONE "aaa" (each occurrence counts, not distinct).
    val d = Seq((1L, "ab ab aaa"), (2L, "abc ab")).toDF("doc_id", "text")
    val out = Corpus.bpePairStats(d, "text", topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ab" -> 4L, "aa" -> 2L, "bc" -> 1L), s"got $out")
    // single-char words contribute nothing; empty corpus yields no rows
    val single = Seq((3L, "x y z")).toDF("doc_id", "text")
    assert(Corpus.bpePairStats(single, "text", topN = 10).count() == 0)
  }

  test("dsirWeights matches an independent driver-side mirror and separates the target") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count().toInt
    val got = Corpus.dsirWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", numBuckets = 512, topN = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent mirror over collected rows
    val raw = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en", r.getString(2)))
    def grams(t: String): Seq[String] = {
      val tk = t.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ (if (tk.length >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    }
    def bucket(g: String): Long =
      graft.functions.StringKernels.polyHash(UTF8String.fromString(g)) % 512
    val counts = raw.flatMap { case (id, tgt, t) =>
      grams(t).map(g => ((id, tgt, bucket(g)), 1L))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sB = counts.groupBy(_._1._3).view.mapValues(_.values.sum).toMap
    val tB = counts.filter(_._1._2).groupBy(_._1._3).view.mapValues(_.values.sum).toMap
    val sTot = sB.values.sum; val tTot = tB.values.sum
    val mirror: Map[Long, (Long, Double)] =
      counts.toSeq.groupBy(_._1._1).map { case (id, rows) =>
        val w = rows.map { case ((_, _, b), c) =>
          c * math.log(((tB.getOrElse(b, 0L) + 1.0) * (sTot + 512)) /
                       ((sB(b) + 1.0) * (tTot + 512)))
        }.sum
        id -> ((rows.map(_._2).sum, w))
      }
    got.foreach { case (id, nf, w) =>
      val (mnf, mw) = mirror(id)
      assert(nf == mnf, s"doc $id n_feat $nf vs mirror $mnf")
      assert(math.abs(w - mw) < 1e-4, s"doc $id w $w vs mirror $mw")
    }
    // the whole point: target-language docs must score higher on average
    val byLang = raw.map { case (id, tgt, _) => id -> tgt }.toMap
    val (en, rest) = got.partition(r => byLang(r._1))
    val avg = (s: Array[(Long, Long, Double)]) => s.map(_._3).sum / s.length
    assert(avg(en) > avg(rest) + 0.5,
      s"target docs must separate: en=${avg(en)} rest=${avg(rest)}")
  }

  test("topNgramConcentration computes hand-checked shares and flags") {
    import spark.implicits._
    // doc 1: bigrams "a b"×3 "b a"×2 → top2 3/5 = 0.6; trigrams
    // "a b a"×2 "b a b"×2 → top3 2/4 = 0.5 → flagged.
    // doc 2: three distinct bigrams → top2 1/3; two distinct trigrams →
    // top3 0.5 (> 0.18 → flagged; occurrence-share is harsh on short docs
    // by construction). doc 3 has no bigrams → no row.
    val d = Seq((1L, "a b a b a b"), (2L, "x y z w"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Corpus.topNgramConcentration(d, "doc_id", "text", topN = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((5L, 0.6, 0.5, true)), s"doc1 ${out(1L)}")
    assert(out(2L) == ((3L, 0.3333, 0.5, true)), s"doc2 ${out(2L)}")
    assert(!out.contains(3L), "doc without bigrams must have no row")
  }

  test("sourceNgramNovelty counts distinct grams once and splits shared vs unique") {
    import spark.implicits._
    // s1 holds "a b c d e" (shared with s2) + "b c d e f" (unique); the
    // duplicate doc must not double-count grams. Both sources → 0.5.
    val d = Seq(
      ("s1", "a b c d e f"), ("s1", "a b c d e f"),
      ("s2", "a b c d e x")).toDF("source", "text")
    val out = Corpus.sourceNgramNovelty(d, "source", "text", k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("s1") == ((2L, 1L, 0.5)), s"s1 ${out("s1")}")
    assert(out("s2") == ((2L, 1L, 0.5)), s"s2 ${out("s2")}")
  }

  test("bigramInterpolatedCE matches hand-computed interpolated cross-entropies") {
    import spark.implicits._
    // uni: a=3 b=3 c=1, T=7; bigrams: (a,b)=3 (b,a)=1 (b,c)=1
    // p(a,b)=.75·(3/3)+.25·(3/7)=.857142857→ln=-.15415068
    // p(b,a)=.75·(1/3)+.25·(3/7)=.357142857→ln=-1.02961942
    // p(b,c)=.75·(1/3)+.25·(1/7)=.285714286→ln=-1.25276297
    // doc1: (2·.15415068+1.02961942)/3=.4460 (3 bigrams)
    // doc2: (.15415068+1.25276297)/2=.7035 (2 bigrams)
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Corpus.bigramInterpolatedCE(d, "doc_id", "text", topN = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 0.446)), s"doc1 ${out(1L)}")
    assert(out(2L) == ((2L, 0.7035)), s"doc2 ${out(2L)}")
    // the less-predictable doc must score the higher cross-entropy
    assert(out(2L)._2 > out(1L)._2)
    // docs with <2 tokens have no bigrams and no row
    val tiny = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(Corpus.bigramInterpolatedCE(tiny, "doc_id", "text", 10).count() == 0)
  }

  test("pmiCollocations: hand-computed PMI ranking; minCount floor; bound phrase beats frequent pair") {
    import spark.implicits._
    // uni: a=5 b=4 c=9, T=18; bigrams (N=15): (a,b)=3 (b,a)=2 (c,c)=5
    //   (a,c)=2 (c,b)=1 (b,c)=1 (c,a)=1
    // pmi(a,b)=ln((3/15)/((5/18)(4/18)))=ln(3.24)   =1.175573
    // pmi(b,a)=ln((2/15)/((4/18)(5/18)))=ln(2.16)   =0.770108
    // pmi(c,c)=ln((5/15)/((9/18)(9/18)))=ln(4/3)    =0.287682
    // pmi(a,c)=ln((2/15)/((5/18)(9/18)))=ln(0.96)   =-0.040822
    val d = Seq((1L, "a b a b a b"), (2L, "c c c c c c"), (3L, "a c b c a c"))
      .toDF("doc_id", "text")
    val got = Corpus.pmiCollocations(d, "text", minCount = 2, topN = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, 1.175573), ("b", "a", 2L, 0.770108),
      ("c", "c", 5L, 0.287682), ("a", "c", 2L, -0.040822)), s"got $got")
    // the cb=1 pairs (c,b)/(b,c)/(c,a) fall to the floor even though a
    // hapax pair would out-PMI everything — the rare-pair guard
    assert(!got.exists(_._3 < 2L))
    // the bound phrase (a,b) outranks the more FREQUENT (c,c)
    assert(got.head._1 == "a" && got.head._2 == "b")
    // null-text rows contribute 0 tokens to T (bare size(null) is −1
    // under non-ANSI semantics and would shrink T by 1 per null row,
    // shifting every pmi): results must be identical with nulls present
    val withNulls = d.unionByName(
      Seq((4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val gotNulls = Corpus.pmiCollocations(withNulls, "text", minCount = 2, topN = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(gotNulls == got, s"null-text docs skewed T: $gotNulls")
  }

  test("skipgramPpmi: hand-counted ±2 window pairs and PPMI; clip keeps scores non-negative") {
    import spark.implicits._
    // "a b c a", window 2 → 10 pairs; c(a,b)=2 c(b,a)=2 c(c,a)=2 c(a,c)=2
    // c(b,c)=1 c(c,b)=1; x-marginals a:4 b:3 c:3 = y-marginals (symmetric)
    // ppmi(a,b)=ln(2·10/(4·3))=ln(5/3)=0.510826; ppmi(b,c)=ln(10/9)=0.105361
    val d = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val got = Corpus.skipgramPpmi(d, "text", window = 2, minCount = 1, topN = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 6, s"got $got")
    assert(got(("a", "b")) == ((2L, 0.510826)) && got(("b", "a")) == ((2L, 0.510826)))
    assert(got(("a", "c")) == ((2L, 0.510826)) && got(("c", "a")) == ((2L, 0.510826)))
    assert(got(("b", "c")) == ((1L, 0.105361)) && got(("c", "b")) == ((1L, 0.105361)))
    // the positive clip on real data: no emitted score is ever negative
    val real = Corpus.skipgramPpmi(
        spark.read.parquet(s"$sfDir/documents.parquet"), "text", 3, 1, 500)
      .as[(String, String, Long, Double)].collect()
    assert(real.nonEmpty && real.forall(_._4 >= 0.0), "PPMI clips at zero")
  }

  test("neymanAllocation: σ-proportional seats, largest-remainder top-up, N_h cap, zero-signal") {
    import spark.implicits._
    // stratum a: 4 rows, values {0,10,0,10} → σ=5, w6=20e6
    // stratum b: 2 rows, {0,30} → σ=15, w6=30e6; c: 3 rows constant → σ=0
    // budget 7, t6=50e6: raw a=2.8, b=4.2, c=0 → base 2/4/0, left=1,
    // remainders .8 > .2 → a gets the seat; b capped at N_h=2!
    val df = Seq(("a", 0.0), ("a", 10.0), ("a", 0.0), ("a", 10.0),
      ("b", 0.0), ("b", 30.0),
      ("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("s", "v")
    val got = Corpus.neymanAllocation(df, "s", "v", budget = 7L)
      .as[(String, Long, Option[Double], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 4L, Some(5.0), 20000000L, 3L)), s"got ${got("a")}")
    assert(got("b") == (("b", 2L, Some(15.0), 30000000L, 2L)),
      s"raw 4.2 must cap at the stratum size 2: ${got("b")}")
    assert(got("c") == (("c", 3L, Some(0.0), 0L, 0L)),
      s"zero-variance stratum gets nothing: ${got("c")}")
    // all-constant corpus: zero total signal → zero allocations, no throw
    val flat = Seq(("x", 1.0), ("x", 1.0), ("y", 2.0)).toDF("s", "v")
    val z = Corpus.neymanAllocation(flat, "s", "v", 5L)
      .as[(String, Long, Option[Double], Long, Long)].collect()
    assert(z.forall(_._5 == 0L), s"no signal, no allocation: ${z.toSeq}")
  }

  test("rrfFuse: hand-computed fusion, absent items contribute 0, ranks pass through") {
    import spark.implicits._
    val r1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val r2 = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val got = Corpus.rrfFuse(Seq(r1, r2), "doc_id", kRrf = 60)
      .as[(Long, Option[Long], Option[Long], Double)].collect()
      .map(r => r._1 -> r).toMap
    // 1/61=0.016393..., 1/62=0.016129..., 1/63=0.015873...
    assert(got(1L) == ((1L, Some(1L), None, 0.016393)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, Some(2L), Some(1L), 0.032522)),
      s"consensus item must sum both lists: ${got(2L)}")
    assert(got(3L) == ((3L, Some(3L), None, 0.015873)))
    assert(got(4L) == ((4L, None, Some(2L), 0.016129)))
    // the item on BOTH lists outranks every single-list item, including
    // each list's #1 — the consensus property fusion exists for
    assert(got.values.maxBy(_._4)._1 == ((2L, Some(2L), Some(1L), 0.032522))._1)
  }

  test("maxCoverageSelect: greedy picks by marginal gain, ties to smaller id, exhausts early") {
    import spark.implicits._
    // doc 1 covers {a,b,c}; doc 2 covers {c,d} (gain 1 after doc 1); doc 3
    // covers {a,b} (gain 0 — never emitted); doc 4 ties doc 2 pre-selection
    // on raw size but loses the marginal race, then contributes {e}
    val dt = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "c"), // dup collapses
      (2L, "c"), (2L, "d"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "e"))
      .toDF("doc", "token")
    val got = Corpus.maxCoverageSelect(dt, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // rank 1: doc 1 (3 new). rank 2: tie doc 2 / doc 4 at gain 1 → doc 2.
    // rank 3: doc 4 ({e}). rank 4+: nothing has gain ≥ 1 → only 3 rows.
    assert(got == Seq((1, 1L, 3L), (2, 2L, 1L), (3, 4L, 1L)), s"got $got")
  }

  test("maxCoverageSelect: empty corpus yields an empty result with the declared schema (r19 collected-pick loop)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc", "token")
    val got = Corpus.maxCoverageSelect(empty, k = 3)
    assert(got.columns.toSeq == Seq("sel_rank", "doc", "gain"))
    assert(got.count() == 0L)
  }

  test("tokenDistributionDrift: hand-computed JS, disjoint supports hit ln 2, one-sided keys survive") {
    // key "s": A = {a:2, b:2} (p = ½,½), B = {a:3, b:1} (q = ¾,¼)
    //   JS = ½[½ln(½/0.625)+½ln(½/0.375)] + ½[¾ln(¾/0.625)+¼ln(¼/0.375)]
    // key "t": disjoint supports {x} vs {y} → JS = ln 2
    // key "u": present only in A → zero-total guard must not NaN the row
    val a = Seq(("s", "a a b b"), ("t", "x x"), ("u", "w w w")).toDF("src", "text")
    val b = Seq(("s", "a a a b"), ("t", "y y")).toDF("src", "text")
    val got = Corpus.tokenDistributionDrift(a, b, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4), r.getDouble(5)))).toMap
    def js2(p: Seq[Double], q: Seq[Double]): Double =
      p.zip(q).map { case (pi, qi) =>
        val m = (pi + qi) / 2
        (if (pi > 0) pi * math.log(pi / m) * 0.5 else 0.0) +
          (if (qi > 0) qi * math.log(qi / m) * 0.5 else 0.0)
      }.sum
    val (na, nb, js, tok, drift) = got("s")
    assert((na, nb) == ((4L, 4L)))
    assert(math.abs(js - r6(js2(Seq(0.5, 0.5), Seq(0.75, 0.25)))) < 1e-9, s"js $js")
    // both tokens drift by ¼ — the tie breaks to the LARGER token
    assert(tok == "b" && math.abs(drift - 0.25) < 1e-9)
    val (_, _, jsT, _, driftT) = got("t")
    assert(math.abs(jsT - r6(math.log(2.0))) < 1e-9, s"disjoint JS must be ln2: $jsT")
    assert(math.abs(driftT - 1.0) < 1e-9)
    val (nu, nbu, jsU, _, _) = got("u")
    assert(nu == 3L && nbu == 0L && !jsU.isNaN, s"one-sided key must stay finite: $jsU")
  }

  test("chiSquareTerms: hand 2×2 contingencies, zero-margin null, enrichment direction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // P = 2 'en' docs, Q = 2 others; 'the' appears in EVERY doc (c+d margin
    // zero → null χ², not ∞); 'cat' en-enriched, 'bird' de-enriched with
    // the SAME χ² (the statistic is direction-blind — the flag isn't)
    val docs = Seq(
      (1L, "the cat dog", "en"), (2L, "the cat fish", "en"),
      (3L, "the dog fish", "de"), (4L, "the cat bird", "de")).toDF("doc_id", "text", "lang")
    val got = graft.operators.Corpus
      .chiSquareTerms(docs, "doc_id", "text", col("lang") === "en", minDf = 1L, topN = 10)
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toList
    // by hand: cat df=3,a=2 → 4·(2·1−1·0)²/(3·1·2·2) = 1.3333 enriched;
    // bird df=1,a=0 → 4·(0·1−1·2)²/(1·3·2·2) = 1.3333 not; dog/fish 0
    val want = List(
      ("bird", 1L, 0L, Some(1.3333), false),
      ("cat", 3L, 2L, Some(1.3333), true),
      ("dog", 2L, 1L, Some(0.0), false),
      ("fish", 2L, 1L, Some(0.0), false),
      ("the", 4L, 2L, None, false))
    assert(got == want, s"got $got")
    // minDf floors rare terms out
    val floored = graft.operators.Corpus
      .chiSquareTerms(docs, "doc_id", "text", col("lang") === "en", minDf = 2L, topN = 10)
      .as[(String, Long, Long, Option[Double], Boolean)].collect().map(_._1).toSet
    assert(floored == Set("cat", "dog", "fish", "the"), s"got $floored")
  }

  test("zipfFit: exact 1/rank counts fit slope −1 with r² ≈ 1; flat counts give slope 0, null r²") {
    import spark.implicits._
    // counts 12, 6, 4, 3 = 12/rank → ln n = ln 12 − ln rank exactly
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val (n, slope, r2) = graft.operators.Corpus
      .zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(n == 4L)
    assert(math.abs(slope.get + 1.0) < 1e-3, s"slope $slope")
    assert(r2.get > 0.9999, s"r2 $r2")
    // a flat vocabulary has zero y-variance: slope 0, r² undefined
    val flat = graft.operators.Corpus
      .zipfFit(Seq((1L, "x y z x y z")).toDF("doc_id", "text"), "text")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(flat == ((3L, Some(0.0), None)), s"got $flat")
    // the distributed rank is partition-count-invariant: (n, tok) is a
    // unique order key, so range-boundary placement cannot perturb
    // rank = local row_number + broadcast offset
    val onePart = graft.operators.Corpus
      .zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text",
        rangePartitions = 1)
      .as[(Long, Option[Double], Option[Double])].head()
    val manyParts = graft.operators.Corpus
      .zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text",
        rangePartitions = 7)
      .as[(Long, Option[Double], Option[Double])].head()
    assert(onePart == ((n, slope, r2)) && manyParts == ((n, slope, r2)),
      s"rank must be partition-invariant: $onePart vs $manyParts vs ($n, $slope, $r2)")
  }

  test("rocchioPrf: expansion recovers a seed-miss document; expandM=0 reduces to plain BM25") {
    import spark.implicits._
    // doc 3 has no seed term but shares 'cherry' with the feedback set;
    // doc 4 is unrelated and must stay invisible to both passes
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "apple banana date"),
      (3L, "banana cherry egg"), (4L, "zebra yak xylophone")).toDF("doc_id", "text")
    val got = graft.operators.Corpus
      .rocchioPrf(docs, "doc_id", "text", Seq("apple"),
        feedbackK = 2, expandM = 2, topN = 10)
      .as[(Long, Double)].collect().toList
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), s"got $got")
    assert(got.forall(_._2 > 0.0), s"got $got")
    // no expansion → the ranking IS the first-pass BM25 cut
    val plain = graft.operators.Corpus
      .rocchioPrf(docs, "doc_id", "text", Seq("apple"),
        feedbackK = 2, expandM = 0, topN = 10)
      .as[(Long, Double)].collect().toList
    val base = graft.operators.Corpus.bm25(docs, "doc_id", "text", Seq("apple"))
      .select(col("doc_id"), (round(col("bm25"), 4) + lit(0.0)).as("s"))
      .orderBy(col("s").desc, col("doc_id")).as[(Long, Double)].collect().toList
    assert(plain == base, s"prf $plain vs bm25 $base")
  }

  test("textrankKeywords: symmetric 2-word graph splits mass evenly; the hub term ranks first") {
    import spark.implicits._
    // one alternating doc → single undirected edge (x, y): both 0.5
    val alt = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val even = graft.operators.Corpus
      .textrankKeywords(alt, "text", window = 1, minCount = 1, iterations = 5, topN = 10)
      .as[(String, Double)].collect().toMap
    assert(even == Map("x" -> 0.5, "y" -> 0.5), s"got $even")
    // h co-occurs with everything; a/b/c only with h → h must rank first
    // and total mass stays 1 (± the per-layer rounding)
    val hub = Seq((1L, "h a h b h c h a h b h c")).toDF("doc_id", "text")
    val ranked = graft.operators.Corpus
      .textrankKeywords(hub, "text", window = 1, minCount = 1, iterations = 4, topN = 10)
      .as[(String, Double)].collect().toList
    assert(ranked.head._1 == "h", s"got $ranked")
    assert(math.abs(ranked.map(_._2).sum - 1.0) < 1e-5, s"mass: $ranked")
    // the minCount floor prunes one-off co-occurrences out of the graph
    val floored = graft.operators.Corpus
      .textrankKeywords(Seq((1L, "p q r")).toDF("doc_id", "text"),
        "text", window = 1, minCount = 2, iterations = 2, topN = 10)
      .count()
    assert(floored == 0L, "all edges under the floor must vanish")
  }

  test("null-text guards: bm25 avgdl excludes nulls; packSequences/bigram CE treat null as 0 tokens") {
    import spark.implicits._
    // size(tokens(NULL)) is -1 in this config — each operator must not let
    // the sentinel leak into its corpus statistics
    val docs = Seq(
      (1L, Option("a a")), (2L, Option("a")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    // hand-computed with n_docs = 3 (nulls count) and avgdl = 1.5 (nulls
    // EXCLUDED, the oracle's avg(len) semantics) — an unguarded avg would
    // give (2 + 1 - 1)/3 = 0.667 and shift both scores
    val got = Corpus.bm25(docs, "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.590862) < 1e-5, s"d1: ${got(1L)}")
    assert(math.abs(got(2L) - 0.544215) < 1e-5, s"d2: ${got(2L)}")
    // packSequences: a null-text doc occupies 0 tokens — later docs' bins
    // must match the corpus without it (an unguarded -1 shifts the cumsum)
    val packDocs = Seq(
      (1L, Option("w w w")), (2L, Option.empty[String]), (3L, Option("w w w")))
      .toDF("doc_id", "text").withColumn("shard", lit("s"))
    val bins = Corpus.packSequences(packDocs, "shard", "doc_id", "text", budget = 6)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins(3L) == 0L, s"null doc shifted a bin boundary: $bins")
    // bigram CE: the token total must ignore null docs, so per-doc CE is
    // unchanged by appending one
    val ceDocs = Seq((1L, Option("x y x y")), (2L, Option("x x y y")))
      .toDF("doc_id", "text")
    val withNull = ceDocs.unionByName(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"))
    val ce = Corpus.bigramInterpolatedCE(ceDocs, "doc_id", "text", topN = 20)
      .select("doc_id", "ce")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ceN = Corpus.bigramInterpolatedCE(withNull, "doc_id", "text", topN = 20)
      .select("doc_id", "ce")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ce.forall { case (k, v) => math.abs(ceN(k) - v) < 1e-9 },
      s"null doc perturbed CE: $ce vs $ceN")
  }

  test("bpeLearn exhaustion: a 1-char-word corpus yields a short merge table, not a crash") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    // round 1 can merge nothing (every word is one symbol): the curve is
    // empty instead of head() crashing on the empty top-pair pick
    assert(Corpus.bpeMergeCurve(docs, "text", merges = 3).count() == 0)
    // and the encode faces survive too
    assert(Corpus.bpeTokensBySource(
      docs.withColumn("source", lit("s")), "source", "text", merges = 3)
      .collect().nonEmpty)
  }

  test("stratifiedSample requires rate >= 1 instead of silently dropping every row") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "src")
    intercept[IllegalArgumentException](
      Corpus.stratifiedSample(df, "src", "id", rate = 0))
  }
}
