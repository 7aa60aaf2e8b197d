package graft

import java.time.LocalDate

import scala.util.Random

import graft.functions.TextFunctions

/** Property-style tests (SURVEY.md §5.4) over seeded random samples:
  * normalization idempotence, shingle cardinality, B1 segment coverage with
  * half-open windows. (Plain seeded sampling — the scalatest/scalacheck
  * bridge artifact isn't on the offline classpath.)
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val rng = new Random(42)

  test("P5 normalization is idempotent on arbitrary strings") {
    val alphabet = "abcXYZ019#\\/*?\"<>| ._-+"
    val samples = Seq.fill(60)(
      (0 until rng.nextInt(20)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = samples.toDF("x")
    val once = df.select(TextFunctions.normalizeIndexName($"x").as("n"))
    val twice = once.select(TextFunctions.normalizeIndexName($"n").as("n"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("shingle count: distinct k-shingles of n tokens is in [1, n-k+1]") {
    val cases = Seq.fill(40) {
      val n = 1 + rng.nextInt(12)
      val k = 1 + rng.nextInt(4)
      (Seq.fill(n)(Seq("a", "b", "c", "d")(rng.nextInt(4))).mkString(" "), n, k)
    }
    cases.foreach { case (text, n, k) =>
      val got = Seq(text).toDF("t")
        .select(TextFunctions.shingles($"t", k).as("s")).as[Seq[String]].head()
      val expectMax = math.max(n - k + 1, 1)
      assert(got.nonEmpty && got.size <= expectMax,
        s"text='$text' k=$k → ${got.size} shingles, max $expectMax")
    }
  }

  test("guarded admission drops: property over random corpora (no-budget ≡ exact; forced ⊇ exact; min survives)") {
    import graft.operators.{Dedup, Stage}
    // random corpora with planted near-dup runs: a shared base phrase per
    // "family" (≈half the docs), plus fully random docs; thresholds swept
    // over the float-risky range
    (0 until 6).foreach { trial =>
      val t = Seq(0.5, 0.55, 0.6, 0.7)(trial % 4)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val nFam = 2 + rng.nextInt(3)
      val bases = Seq.fill(nFam)(
        Seq.fill(10 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      val docs = (0 until 24).map { id =>
        val text =
          if (id % 2 == 0) bases(id % nFam) + s" x$id y${id % 3}"
          else Seq.fill(8 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
        (id.toLong, text)
      }.toDF("doc_id", "text")
      val sh = Dedup.shingleIndex(docs, "doc_id", "text", 3)
        .transform(Stage.snapshotDF)
      val exact = Dedup.jaccardPairsPrefixFrom(sh, t)
        .select($"id_b").as[Long].collect().toSet
      val silent = Dedup.jaccardDropsGuarded(sh, t)
        .as[Long].collect().toSet
      assert(silent == exact,
        s"trial $trial t=$t: under-budget guard must be exact: $silent vs $exact")
      val forced = Dedup.jaccardDropsGuarded(sh, t, pairBudget = 1L, hotPostingCap = 3)
        .as[Long].collect().toSet
      assert(exact.subsetOf(forced),
        s"trial $trial t=$t: forced guard must never admit what exact rejects")
      assert(!forced.contains(0L),
        s"trial $trial t=$t: the global min id can never drop")
    }
  }

  test("containment guard: property over random corpora (no-budget ≡ exact; forced ⊇ exact; maximal survives)") {
    import graft.operators.{Dedup, Stage}
    // random corpora with planted containment: every even doc is a strict
    // PREFIX of its family base (subsumed at C = 1.0 inside the full-base
    // doc), odd docs random; thresholds swept over the float-risky range
    (0 until 6).foreach { trial =>
      val t = Seq(0.55, 0.7, 0.8, 0.9)(trial % 4)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val nFam = 2 + rng.nextInt(2)
      val bases = Seq.fill(nFam)(
        Seq.fill(16 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))))
      val docs = (0 until 20).map { id =>
        val fam = bases(id % nFam)
        val text =
          if (id < nFam) fam.mkString(" ") // the full-base containers
          else if (id % 2 == 0) fam.take(6 + rng.nextInt(6)).mkString(" ")
          else Seq.fill(8 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" ")
        (id.toLong, text)
      }.toDF("doc_id", "text")
      val sh = Dedup.shingleIndex(docs, "doc_id", "text", 3)
        .transform(Stage.snapshotDF)
      val exact = Dedup.containmentDrops(sh, t).as[Long].collect().toSet
      val silent = Dedup.containmentDropsGuarded(sh, t).as[Long].collect().toSet
      assert(silent == exact,
        s"trial $trial t=$t: under-budget guard must be exact: $silent vs $exact")
      val forced = Dedup.containmentDropsGuarded(sh, t, pairBudget = 1L, hotDfCap = 2)
        .as[Long].collect().toSet
      assert(exact.subsetOf(forced),
        s"trial $trial t=$t: forced guard must never admit what exact rejects")
      // the container-order maximal doc (max sz, min id on ties) never drops
      val maximal = sh.groupBy($"__id")
        .agg(org.apache.spark.sql.functions.max($"sz").as("sz"))
        .orderBy($"sz".desc, $"__id".asc).head().getLong(0)
      assert(!forced.contains(maximal) && !exact.contains(maximal),
        s"trial $trial t=$t: maximal doc $maximal must survive every mode")
    }
  }

  test("mergeAnnotationArrays is idempotent and order-insensitive (D1/X2)") {
    import graft.operators.AnnotationPipeline.mergeAnnotationArrays
    val samples = Seq.fill(30) {
      def arr() = Seq.fill(rng.nextInt(6))((rng.nextInt(4).toLong, s"t${rng.nextInt(4)}"))
      (arr(), arr())
    }
    val df = samples.toDF("a", "b")
    val ab = df.select(mergeAnnotationArrays($"a", $"b").as("m")).as[Seq[(Long, String)]].collect()
    val ba = df.select(mergeAnnotationArrays($"b", $"a").as("m")).as[Seq[(Long, String)]].collect()
    val again = df.select(
      mergeAnnotationArrays(mergeAnnotationArrays($"a", $"b"), $"b").as("m"))
      .as[Seq[(Long, String)]].collect()
    assert(ab.toSeq == ba.toSeq, "merge must be order-insensitive")
    assert(ab.toSeq == again.toSeq, "re-merging the same batch must be a no-op")
    ab.foreach(m => assert(m == m.distinct.sorted, "output sorted and distinct"))
  }

  /** B1 half-open segments: every date in [start, end) belongs to exactly one
    * segment (the reference's inclusive boundaries double-assign boundary
    * dates — `annotations_indexer.py:847-857`; this encodes the fix).
    */
  test("half-open date segments cover [start, end) exactly once") {
    Seq.fill(50)((1 + rng.nextInt(60), 1 + rng.nextInt(200))).foreach {
      case (interval, span) =>
        val start = LocalDate.of(2020, 1, 1)
        val end = start.plusDays(span.toLong)
        val segments = Iterator.iterate(start)(_.plusDays(interval.toLong))
          .takeWhile(_.isBefore(end))
          .map(s => (s, Seq(s.plusDays(interval.toLong), end).minBy(_.toEpochDay)))
          .toSeq
        (0 until span).foreach { d =>
          val day = start.plusDays(d.toLong)
          val owners = segments.count { case (s, e) => !day.isBefore(s) && day.isBefore(e) }
          assert(owners == 1, s"interval=$interval span=$span day=$day covered $owners times")
        }
        assert(segments.forall { case (s, e) => !s.isBefore(start) && !e.isAfter(end) })
    }
  }

  test("shardShuffle is a bijection with contiguous per-shard positions " +
      "for arbitrary id sets (incl. negatives, gaps, single shard)") {
    (1 to 8).foreach { trial =>
      val nShards = 1 + rng.nextInt(12)
      val ids = Seq.fill(5 + rng.nextInt(120))(rng.nextLong() % 100000L).distinct
      val out = graft.operators.Corpus
        .shardShuffle(ids.toDF("doc_id"), "doc_id", nShards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.map(_._1).toSet == ids.toSet, s"trial $trial: ids lost or invented")
      assert(out.forall { case (_, s, _) => s >= 0 && s < nShards },
        s"trial $trial: shard out of range")
      out.groupBy(_._2).foreach { case (s, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
          s"trial $trial shard $s: positions not contiguous")
      }
    }
  }

  test("chunkTokens covers every token exactly per the window/stride formula") {
    (1 to 12).foreach { trial =>
      val window = 2 + rng.nextInt(8)
      val stride = 1 + rng.nextInt(window)
      val nTok = 1 + rng.nextInt(40)
      val text = (0 until nTok).map(i => s"t$i").mkString(" ")
      val chunks = graft.operators.Corpus
        .chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          window, stride)
        .collect()
        .map(r => r.getLong(1) -> r.getString(3)).sortBy(_._1).map(_._2)
      val expectN = 1 + math.max(0,
        math.ceil((nTok - window).toDouble / stride).toInt)
      assert(chunks.length == expectN,
        s"trial $trial w=$window s=$stride n=$nTok: ${chunks.length} chunks, want $expectN")
      // chunk i starts at token i*stride and holds min(window, n - i*stride)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val from = i * stride
        val expect = (from until math.min(from + window, nTok)).map(i => s"t$i").mkString(" ")
        assert(c == expect, s"trial $trial chunk $i: '$c' != '$expect'")
      }
      // first tokens of consecutive chunks are stride apart ⇒ every token
      // index < nTok appears in at least one chunk
      assert(chunks.flatMap(_.split(" ")).toSet == (0 until nTok).map(i => s"t$i").toSet)
    }
  }

  test("graph ops: properties over random graphs (k-core degree bound, BFS = Floyd reference, LPA covers nodes)") {
    import graft.operators.Graph
    for (trial <- 1 to 5) {
      val r = new Random(300 + trial)
      val n = 4 + r.nextInt(8)
      val edges = (0 until n * 2).map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("s", "d")
        // adjacency for the driver-side reference
        val adj = (edges ++ edges.map(_.swap)).distinct
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        val nodes = adj.keySet

        // k-core: every member's in-core degree ≥ k, and the member set is
        // the fixpoint of driver-side peeling
        val k = 2
        val core = Graph.kCore(df, "s", "d", k, iterations = 12)
          .collect().map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
        var alive = nodes
        var changed = true
        while (changed) {
          val next = alive.filter(v => (adj(v) & alive).size >= k)
          changed = next != alive; alive = next
        }
        assert(core.keySet == alive, s"trial $trial core ${core.keySet} vs $alive")
        core.foreach { case (v, d) =>
          assert(d == (adj(v) & alive).size.toLong && d >= k, s"trial $trial degree of $v")
        }

        // BFS from the min node matches a driver Floyd-Warshall reference
        val src = nodes.min
        val got = Graph.shortestHops(df, "s", "d", src, maxHops = n)
          .collect().map(rr => rr.getLong(0) -> rr.getInt(1)).toMap
        var dist = Map(src -> 0)
        var frontier = Set(src)
        var h = 0
        while (frontier.nonEmpty && h < n) {
          h += 1
          frontier = frontier.flatMap(adj).diff(dist.keySet)
          dist ++= frontier.map(_ -> h)
        }
        assert(got == dist, s"trial $trial bfs $got vs $dist")

        // LPA: every node labeled, labels are node ids from its component
        val lpa = Graph.labelPropagation(df, "s", "d", iterations = 3)
          .collect().map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
        assert(lpa.keySet == nodes, s"trial $trial lpa coverage")
        assert(lpa.values.toSet.subsetOf(nodes), s"trial $trial lpa labels")
      }
    }
  }

  test("resampleLocf: property over random series (dense grid, no null after first obs, observed buckets exact)") {
    import java.sql.Timestamp
    for (trial <- 1 to 8) {
      val r = new Random(100 + trial)
      val n = 3 + r.nextInt(20)
      val rows = (0 until n).map { i =>
        ("k", new Timestamp(1700000000000L + r.nextInt(40) * 60000L), i.toLong,
          math.rint(r.nextDouble() * 100) / 10)
      }
      val got = graft.operators.TimeSeries
        .resampleLocf(rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v", 60L)
        .orderBy("bucket")
        .collect().map(rr => (rr.getLong(1), rr.getDouble(2), rr.getBoolean(3)))
      // dense: buckets are exactly the contiguous [min, max] minute range
      val buckets = got.map(_._1)
      assert(buckets.toSeq == (buckets.min to buckets.max by 60L).toSeq, s"trial $trial grid")
      // observed buckets carry the (ts, id)-max row's value; gaps carry the
      // most recent previous observation
      val byBucket = rows.groupBy(e => e._2.getTime / 60000 * 60)
        .map { case (b, es) => b -> es.maxBy(e => (e._2.getTime, e._3))._4 }
      var last = Double.NaN
      got.foreach { case (b, v, gap) =>
        byBucket.get(b) match {
          case Some(exp) => assert(!gap && v == exp, s"trial $trial bucket $b")
          case None      => assert(gap && v == last, s"trial $trial gap $b")
        }
        last = v
      }
    }
  }

  test("holt: property over random series (fold ≡ literal driver recursion)") {
    import java.sql.Timestamp
    for (trial <- 1 to 8) {
      val r = new Random(300 + trial)
      val n = 1 + r.nextInt(30)
      val vals = Seq.fill(n)(math.rint(r.nextGaussian() * 1000) / 1000 + 0.01 * r.nextInt(50))
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("k", new Timestamp(1700000000000L + i * 1000L), i.toLong, v)
      }
      val got = graft.operators.TimeSeries
        .holt(rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v",
          alpha = 0.25, beta = 0.125)
        .collect().map(rr => (rr.getLong(1), rr.getDouble(2), rr.getDouble(3),
          rr.getDouble(4), rr.getDouble(5))).head
      var l = vals.head; var b = 0.0; var s = 0.0
      vals.tail.foreach { x =>
        val e = x - (l + b); s += e * e
        val lNew = 0.25 * x + 0.75 * (l + b)
        b = 0.125 * (lNew - l) + 0.875 * b
        l = lNew
      }
      assert(got == ((n.toLong, r6(l), r6(b), r6(l + b), r6(s))),
        s"trial $trial: $got vs (${r6(l)}, ${r6(b)}, ${r6(l + b)}, ${r6(s)})")
    }
  }

  test("winnowing: property over random corpora (guarantee, density bound, selection ⊆ grams)") {
    import graft.operators.TextAnalysis
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 6) {
      val r = new Random(400 + trial)
      val k = 2 + r.nextInt(2); val w = 3 + r.nextInt(4)
      val shared = Seq.fill(w + k - 1)(words(r.nextInt(words.size))).mkString(" ")
      def randText(n: Int) = Seq.fill(n)(words(r.nextInt(words.size))).mkString(" ")
      val docs = Seq(
        (1L, s"${randText(5 + r.nextInt(10))} $shared ${randText(5)}"),
        (2L, s"${randText(3)} $shared ${randText(8 + r.nextInt(6))}"),
        (3L, randText(20 + r.nextInt(10))))
        .toDF("doc_id", "text")
      val sel = TextAnalysis.winnowFingerprints(docs, k, w)
        .as[(Long, Long, Long)].collect()
      // density: selections never exceed the complete-window count
      val grams = docs.as[(Long, String)].collect().map { case (id, t) =>
        id -> (t.split("\\s+").count(_.nonEmpty) - k + 1)
      }.toMap
      sel.groupBy(_._1).foreach { case (id, ss) =>
        val maxSel = math.max(grams(id) - w + 1, 0)
        assert(ss.length <= math.max(maxSel, 1) && ss.length <= grams(id),
          s"trial $trial doc $id: ${ss.length} selections, ${grams(id)} grams, w=$w")
      }
      // the winnowing guarantee: docs 1 and 2 share the planted run
      val f1 = sel.filter(_._1 == 1L).map(_._2).toSet
      val f2 = sel.filter(_._1 == 2L).map(_._2).toSet
      assert((f1 & f2).nonEmpty,
        s"trial $trial: shared ≥ w+k−1 run must select a common fingerprint")
    }
  }

  test("ksDrift: property over random samples (range, symmetry, zero iff same multiset)") {
    import graft.operators.Checks
    for (trial <- 1 to 6) {
      val r = new Random(500 + trial)
      val a = Seq.fill(20 + r.nextInt(60))(r.nextInt(15).toDouble)
      val b = Seq.fill(20 + r.nextInt(60))(r.nextInt(15).toDouble + r.nextInt(3))
      val ab = Checks.ksDrift(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Double, Double, Double, Boolean)].head()
      val ba = Checks.ksDrift(b.toDF("v"), a.toDF("v"), "v")
        .as[(Long, Long, Double, Double, Double, Boolean)].head()
      assert(ab._3 >= 0.0 && ab._3 <= 1.0, s"trial $trial: KS in [0,1]: $ab")
      assert(ab._3 == ba._3 && ab._4 == ba._4,
        s"trial $trial: KS is symmetric: $ab vs $ba")
      val self = Checks.ksDrift(a.toDF("v"), r.shuffle(a).toDF("v"), "v")
        .as[(Long, Long, Double, Double, Double, Boolean)].head()
      assert(self._3 == 0.0, s"trial $trial: same multiset ⇒ KS 0: $self")
    }
  }

  test("kaplanMeier: property over random lifetimes (S non-increasing in (0,1], risk set strict, census total)") {
    import java.sql.Timestamp
    for (trial <- 1 to 6) {
      val r = new Random(600 + trial)
      val nKeys = 5 + r.nextInt(20)
      val rows = (0 until nKeys).flatMap { i =>
        val start = r.nextInt(20).toLong
        val life = r.nextInt(25).toLong
        Seq((s"u$i", new Timestamp(1700000000000L + start * 86400000L)),
            (s"u$i", new Timestamp(1700000000000L + (start + life) * 86400000L)))
      }
      val got = graft.operators.TimeSeries
        .kaplanMeier(rows.toDF("k", "ts"), "k", "ts", horizonDays = 5)
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
      assert(got.map(g => g._3 + g._4).sum == nKeys,
        s"trial $trial: census must account every key once")
      got.sliding(2).foreach {
        case Array(p, c) =>
          assert(c._5 <= p._5 + 1e-12, s"trial $trial: S must not increase: $p → $c")
          assert(c._2 < p._2, s"trial $trial: risk set strictly shrinks: $p → $c")
        case _ =>
      }
      assert(got.forall(g => g._5 >= 0.0 && g._5 <= 1.0), s"trial $trial: S in [0,1]")
    }
  }

  test("cusum: property over random series (closed form ≡ literal recursion, scores non-negative)") {
    import java.sql.Timestamp
    for (trial <- 1 to 8) {
      val r = new Random(200 + trial)
      val n = 5 + r.nextInt(40)
      val vals = Seq.fill(n)(math.rint((r.nextGaussian() + (if (r.nextInt(4) == 0) 2.5 else 0)) * 1000) / 1000)
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("k", new Timestamp(1700000000000L + i * 1000L), i.toLong, v)
      }
      val got = graft.operators.TimeSeries
        .cusum(rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v", slack = 0.5, threshold = 3.0)
        .orderBy("id")
        .collect().map(rr => (rr.getDouble(3), rr.getDouble(4), rr.getDouble(5)))
      val mu = BigDecimal(vals.sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val vr = vals.map(x => (x - vals.sum / n) * (x - vals.sum / n)).sum / n
      val sd = BigDecimal(math.sqrt(vr)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      var sp = 0.0; var sn = 0.0
      got.zip(vals).zipWithIndex.foreach { case (((z, gp, gn), v), i) =>
        val wz = BigDecimal((v - mu) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(z == wz, s"trial $trial z at $i: $z vs $wz")
        sp = math.max(0.0, sp + (z - 0.5)); sn = math.max(0.0, sn - (z + 0.5))
        assert(math.abs(gp - sp) < 5e-3 + 1e-9 && gp >= 0.0, s"trial $trial pos at $i: $gp vs $sp")
        assert(math.abs(gn - sn) < 5e-3 + 1e-9 && gn >= 0.0, s"trial $trial neg at $i: $gn vs $sn")
      }
    }
  }

  test("gini is in [0, (n−1)/n], 0 iff equal, and invariant under value scaling") {
    for (trial <- 1 to 8) {
      val n = 3 + rng.nextInt(40)
      val vals = Seq.fill(n)(rng.nextInt(500).toLong + 1L)
      def g(vs: Seq[Long]): Double =
        graft.operators.Checks.giniConcentration(vs.toDF("v"), "v")
          .collect().head.getDouble(2)
      val gv = g(vals)
      assert(gv >= 0.0 && gv <= (n - 1).toDouble / n + 1e-9, s"trial $trial: $gv")
      assert(g(vals.map(_ * 7L)) == gv, s"trial $trial: scaling must not move Gini")
      if (vals.distinct.size == 1) assert(gv == 0.0)
    }
  }

  test("acf is invariant under affine value transforms (scale + shift)") {
    for (trial <- 1 to 5) {
      val n = 10 + rng.nextInt(30)
      val s = (0L until n.toLong).map(t => (t, rng.nextInt(1000).toLong))
      def a(vs: Seq[(Long, Long)]): Seq[(Int, Long, Option[Double])] =
        graft.operators.TimeSeries.acf(vs.toDF("t", "x"), "t", "x", maxLag = 3)
          .as[(Int, Long, Option[Double])].collect().toSeq
      val base = a(s)
      val affine = a(s.map { case (t, x) => (t, x * 3L + 17L) })
      assert(base == affine, s"trial $trial:\n$base\nvs\n$affine")
    }
  }

  test("theilSen slope is shift-invariant in y and exact on noiseless lines") {
    for (trial <- 1 to 5) {
      val slope = 1 + rng.nextInt(5) // units per second
      val n = 5 + rng.nextInt(20)
      def pts(shift: Long) = (0 until n).map(i =>
        ("k", new java.sql.Timestamp(i * 1000L), (slope.toDouble * i + shift)))
      def run(shift: Long): Double =
        graft.operators.TimeSeries.theilSen(pts(shift).toDF("k", "t", "v"), "k", "t", "v")
          .collect().head.getDouble(3)
      val got = run(0L)
      assert(got == slope * 86400.0, s"trial $trial: $got vs ${slope * 86400.0}")
      assert(run(1000L) == got, s"trial $trial: y-shift moved the slope")
    }
  }

  test("KMV estimate stays inside 5/√k of truth on random key sets; exact under k") {
    for (trial <- 1 to 4) {
      val d = 500 + rng.nextInt(4000)
      val keys = Seq.fill(d * 2)(rng.nextInt(d).toLong) // dups, ~d distinct
      val truth = keys.distinct.size
      val k = 128
      val row = graft.operators.Kmv.kmvDistinct(keys.toDF("key"), "key", k)
        .collect().head
      val est = row.getLong(3)
      assert(row.getLong(4) == truth)
      assert(math.abs(est - truth).toDouble / truth < 5.0 / math.sqrt(k),
        s"trial $trial: est $est vs $truth")
    }
    val few = (1L to 50L).toDF("key")
    val r = graft.operators.Kmv.kmvDistinct(few, "key", 128).collect().head
    assert(r.getLong(3) == 50L && r.getDouble(5) == 0.0)
  }

  test("exactPercentiles matches a driver-side sort on random multisets") {
    for (trial <- 1 to 6) {
      val n = 1 + rng.nextInt(200)
      val vals = Seq.fill(n)(rng.nextInt(50).toLong)
      val got = graft.operators.Checks.exactPercentiles(
        vals.map(("k", _)).toDF("k", "v"), "k", "v", Seq(50, 90, 99))
        .as[(String, Long, Long, Long, Long)].head()
      val sorted = vals.sorted
      def pick(p: Int) = sorted((p * n + 99) / 100 - 1)
      assert(got == (("k", n.toLong, pick(50), pick(90), pick(99))),
        s"trial $trial n=$n: $got vs ${(pick(50), pick(90), pick(99))}")
    }
  }
}
