package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Similarity}

/** Specs for the round-9 audit/curation additions: asymmetric containment
  * pairs (q123), Heaps-law vocabulary growth (q124), and the per-label
  * silhouette audit (q125).
  */
class AuditOpsSpec extends SparkSuite {

  import spark.implicits._

  test("containmentPairs: a doc fully inside another scores C=1.0 one way only") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      // doc 1's tokens are a prefix → every 3-shingle of doc 1 is in doc 2
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "z y x w v u t s")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", shingleK = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)          // 6 of doc 1's 6 shingles are in doc 2
    assert(!got.contains((2L, 1L)))       // 6/14 < 0.8 the other way
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containmentPairs equals the unpruned directed brute force (pruning is sound)") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val t = 0.8
    val sh = Dedup.shingleIndex(docs, "doc_id", "text", 3)
    val a = sh.select($"__id".as("id_src"), $"sz".as("sz_src"), $"shingle")
    val b = sh.select($"__id".as("id_dst"), $"shingle")
    val brute = a.join(b, Seq("shingle")).filter($"id_src" =!= $"id_dst")
      .groupBy("id_src", "id_dst")
      .agg(count(lit(1)).as("c"), max($"sz_src").as("sz_src"))
      .filter($"c".cast("double") / $"sz_src".cast("double") >= t)
      .select($"id_src", $"id_dst",
        round($"c".cast("double") / $"sz_src".cast("double"), 4).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = Dedup.containmentPairs(docs, "doc_id", "text", 3, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == brute)
    assert(brute.nonEmpty) // the fixture corpus must actually exercise the path
  }

  test("vocabGrowth: bucket totals and cumulative type accounting add up") {
    val docs = (0L until 10L).map { i =>
      // all docs share one phrase; each doc's trailing token mints exactly
      // one unique trigram → bucket 0 first-sees the 3 shared types + 5
      // unique, bucket 1 only its 5 unique
      (i, s"alpha beta gamma delta epsilon t$i")
    }.toDF("doc_id", "text")
    val rows = Corpus.vocabGrowth(docs, "doc_id", "text", k = 3, nBuckets = 2)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val totalGrams = docs.select(explode(graft.functions.TextFunctions.ngrams($"text", 3)))
      .count()
    val distinctGrams = docs.select(explode(graft.functions.TextFunctions.ngrams($"text", 3)))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalGrams)          // n_grams partitions occurrences
    assert(rows.last.getLong(4) == distinctGrams)             // cum_types ends at |vocab|
    assert(rows.map(_.getLong(2)).sum == distinctGrams)       // every type first-seen once
    assert(rows(0).getLong(3) == rows(0).getLong(1))          // cum starts at bucket 0
    assert(rows(1).getLong(2) > 0 && rows(1).getLong(2) < rows(0).getLong(2))
  }

  test("labelSilhouette: separated clusters score high, a planted misfit flips negative") {
    def vec(hot: Int, v: Float): Array[Float] = {
      val a = Array.fill(4)(0.01f); a(hot) = v; a
    }
    val emb = (
      (0L until 5L).map(i => (i, vec(0, 1.0f + 0.01f * i), 0)) ++
      (5L until 10L).map(i => (i, vec(1, 1.0f + 0.01f * i), 1)) :+
      ((10L, vec(1, 1.0f), 0)) // labeled 0, sits on cluster 1's axis
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelSilhouette(emb)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val (n0, sil0, misfit0) = got(0)
    val (n1, sil1, misfit1) = got(1)
    assert(n0 == 6 && n1 == 5)
    assert(misfit0 == 1 && misfit1 == 0) // only the planted vector is negative
    assert(sil1 > 0.9)                   // tight, far-apart clusters
    assert(sil0 > 0.5)                   // dragged down by the misfit but still positive
  }

  test("bpeMergeCurve reproduces hand-computed BPE merges (hug/pug corpus)") {
    // wc: hug 3, pug 2, hugs 1. Weighted pairs: u+g 6, h+u 4, p+u 2, g+s 1.
    // r1 merges (u,g) n=6 → tokens 2·3+2·2+3·1 = 13
    // r2 merges (h,ug) n=4 → tokens 1·3+2·2+2·1 = 9
    // r3 merges (p,ug) n=2 → tokens 1·3+1·2+2·1 = 7
    val docs = Seq((1L, "hug hug hug pug pug hugs")).toDF("doc_id", "text")
    val got = Corpus.bpeMergeCurve(docs, "text", merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "u+g", 6L, 13L),
      (2, "h+ug", 4L, 9L),
      (3, "p+ug", 2L, 7L)))
  }

  test("bpeEncode applies the learned merges per document (hand-computed)") {
    // same word frequencies as the curve test (hug 3, pug 2, hugs 1) →
    // same 3 merges; after them hug = 1 token, pug = 1, hugs = hug|s = 2
    val docs = Seq((1L, "hug hug pug"), (2L, "hugs pug hug")).toDF("doc_id", "text")
    val got = Corpus.bpeEncode(docs, "doc_id", "text", merges = 3, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // ordered by bpe_tokens desc: doc 2 (1+1+2 = 4), doc 1 (1+1+1 = 3)
    assert(got.toSeq == Seq(
      (2L, 3L, 10L, 4L, 2.5),
      (1L, 3L, 9L, 3L, 3.0)))
  }

  test("encode(merge-table) is idempotent: re-applying the learned merges to the final symbol table is a no-op") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val (symbols, curve) = Corpus.bpeLearn(docs, "text", merges = 4)
    val before = symbols.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    // the pass merges EVERY (x, y) adjacency (x ≠ y by the pick rule, so
    // marks can't overlap) — none survives to fire on a second pass
    val reapplied = curve.foldLeft(symbols) { case (rows, (_, pair, _, _)) =>
      val Array(x, y) = pair.split("\\+", 2)
      Corpus.bpeApply(rows, x, y)
    }
    val after = reapplied.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(after == before, "re-applying the merge table changed the encoding")
    // and the q267 census built on it is likewise stable
    val census = Corpus.bpeTokensBySource(
      Tables.documents(spark, sfDir), "source", "text", merges = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val census2 = Corpus.bpeTokensBySource(
      Tables.documents(spark, sfDir), "source", "text", merges = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(census == census2 && census.nonEmpty)
  }

  test("bpeEncode: fewer merges mean more tokens, never more than characters") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    def totals(m: Int): (Long, Long) = {
      val r = Corpus.bpeEncode(docs, "doc_id", "text", merges = m, topN = 1000)
        .agg(sum("bpe_tokens"), sum("char_tokens")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (bpe1, chars1) = totals(1)
    val (bpe4, chars4) = totals(4)
    assert(chars1 == chars4)      // character mass is merge-invariant
    assert(bpe4 < bpe1)           // more merges compress further
    assert(bpe1 < chars1)         // even one merge beats char tokenization
  }

  test("unimaxAllocation equals the iterative UniMax loop across regimes") {
    // A tiny enough to cap first, C big enough to soak the remainder
    val docs = Seq(
      (1L, "A", Seq.fill(100)("w").mkString(" ")),
      (2L, "B", Seq.fill(1000)("w").mkString(" ")),
      (3L, "C", Seq.fill(10000)("w").mkString(" "))).toDF("doc_id", "source", "text")
    def mirror(n: Map[String, Long], budget: Long, cap: Int): Map[String, Long] = {
      val caps = n.map { case (s, t) => s -> t * cap }
      var (b, rem, out) = (budget.toDouble, n.keySet, Map.empty[String, Long])
      while (rem.nonEmpty && rem.exists(s => caps(s) <= b / rem.size)) {
        val hit = rem.filter(s => caps(s) <= b / rem.size)
        out ++= hit.map(s => s -> caps(s)); b -= hit.map(caps).sum; rem --= hit
      }
      out ++ rem.map(s => s -> math.round(b / rem.size))
    }
    val n = Map("A" -> 100L, "B" -> 1000L, "C" -> 10000L)
    for (budget <- Seq(10000L, 3000L, 100000L)) { // mixed / A-only / all capped
      val got = Corpus.unimaxAllocation(docs, "source", "text", budget, epochCap = 4)
        .collect().map(r => (r.getString(0), r.getBoolean(3), r.getLong(4), r.getDouble(5)))
      val want = mirror(n, budget, 4)
      assert(got.map(r => r._1 -> r._3).toMap == want, s"budget $budget")
      assert(got.filter(_._2).forall(_._4 == 4.0), s"capped rows pin at 4 epochs")
    }
    // the mixed regime really is mixed: A and B capped, C at the water level
    val mixed = Corpus.unimaxAllocation(docs, "source", "text", 10000L, 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(mixed == Map("A" -> true, "B" -> true, "C" -> false))
  }

  test("unimaxAllocation conserves the budget up to per-source rounding") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"source", $"text")
    val caps = docs.groupBy("source")
      .agg(sum(size(graft.functions.TextFunctions.tokens($"text"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1) * 4).toMap
    // Σcaps − min lands in the mixed regime even on near-uniform sources
    // (Σ > B forces ≥1 uncapped; the missing min-cap pulls the level under
    // the larger caps while the smallest still fit)
    val budget = caps.values.sum - caps.values.min
    val rows = Corpus.unimaxAllocation(docs, "source", "text", budget, 4).collect()
    val alloc = rows.map(_.getLong(4)).sum
    assert(math.abs(alloc - budget) <= rows.length) // nearest-rounding slack
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("rqTopK: residual level corrects a known offset (hand-computed codes)") {
    // coarse seeds = ids 0,1; residual seed = id 2's residual (0,0.5,0,0)
    // against its nearest coarse centroid v0; codeword 0 = zero correction.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.5f, 0.0f, 0.0f), 1),
      (3L, Array(1.0f, 0.5f, 0.0f, 0.01f), 1)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq(1.0, 0.5, 0.0, 0.01)
    val got = Similarity.rqTopK(emb, numCoarse = 2, numResidual = 2, q, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // ids 2 and 3 share code (c0, cw1) → identical ADC ≈ 1e-4, tie to id 2;
    // ids 0/1 keep the zero codeword (their residuals are exactly zero) →
    // ADC = plain distance to their own centroid
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 0L, 1L))
    assert(got(0)._2 == got(1)._2 && got(0)._2 < 0.001)
    assert(math.abs(got(2)._2 - 0.2501) < 1e-9)
    assert(math.abs(got(3)._2 - 1.2501) < 1e-9)
  }

  test("labelSilhouette requires at least two clusters") {
    val emb = Seq((0L, Array(1.0f, 0.0f), 7), (1L, Array(0.9f, 0.1f), 7))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException](Similarity.labelSilhouette(emb))
    assert(e.getMessage.contains("2 clusters"))
  }
}
