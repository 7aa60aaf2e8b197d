package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitterFunctions, MgBuffer}
import graft.operators.Corpus

/** The Misra–Gries heavy-hitter stack: buffer-level guarantee under forced
  * eviction, merge-prune soundness, the sketch→recount operator exact
  * against brute force on random corpora (with partition counts swept so
  * the merge path really runs), and the SQL registration.
  */
class HeavyHitterSpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(2024)

  test("MgBuffer: superset guarantee and lower bounds under forced eviction") {
    // stream of 100 items over 10 distinct values, k=3 forces evictions
    val items = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 15).map(i => s"cold$i")
    val shuffled = rng.shuffle(items)
    val buf = new MgBuffer(3)
    shuffled.foreach(buf.add)
    val n = shuffled.size
    val truth = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // any item with true freq > N/(k+1) = 25 must be present
    truth.filter(_._2 > n / 4).keys.foreach { it =>
      assert(buf.counts.contains(it), s"guaranteed heavy hitter $it evicted")
    }
    // every retained count is a lower bound within N/(k+1) of the truth
    buf.counts.foreach { case (it, c) =>
      assert(c <= truth(it), s"$it: retained $c above true ${truth(it)}")
      assert(truth(it) - c <= n / 4, s"$it: undercount beyond the MG bound")
    }
  }

  test("MgBuffer merge: combined summary keeps the union guarantee, caps at k") {
    val a = new MgBuffer(4); val b = new MgBuffer(4)
    Seq.fill(40)("x").foreach(a.add); (0 until 10).map(i => s"a$i").foreach(a.add)
    Seq.fill(40)("x").foreach(b.add); (0 until 10).map(i => s"b$i").foreach(b.add)
    a.mergeFrom(b)
    assert(a.counts.size <= 4, s"merge must prune to k, got ${a.counts.size}")
    // x holds 80 of 100 union items, far above N/(k+1) = 20 → must survive
    assert(a.counts.contains("x"), "dominant item lost in merge-prune")
    assert(a.counts("x") <= 80L)
  }

  test("heavyHitters operator: exact vs brute force on random corpora, merges forced") {
    (0 until 4).foreach { trial =>
      val vocab = ('a' to 'p').map(_.toString)
      // zipfish corpus: token i drawn with weight ~ 1/(i+1)
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val total = weights.sum
      def draw(): String = {
        var r = rng.nextDouble() * total; var i = 0
        while (r > weights(i) && i < vocab.size - 1) { r -= weights(i); i += 1 }
        vocab(i)
      }
      val docs = (0 until 40).map { id =>
        (id.toLong, Seq.fill(20 + rng.nextInt(20))(draw()).mkString(" "))
      }.toDF("doc_id", "text").repartition(3 + trial) // sweep partitioning
      val k = 6
      val minShare = 0.2 // > 1/(k+1) ≈ 0.143
      val got = Corpus.heavyHitters(docs, "text", k, minShare)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val toks = docs.select(explode(split(col("text"), " ")).as("t"))
        .as[String].collect()
      val minCount = math.ceil(toks.size * minShare - 1e-9).toLong
      val expect = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).toSeq
        .sortBy { case (t, c) => (-c, t) }
      assert(got == expect, s"trial $trial: $got vs $expect")
      assert(got.nonEmpty, s"trial $trial: fixture must produce heavy hitters")
    }
  }

  test("minShare at or below 1/(k+1) is rejected (the guarantee boundary)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.heavyHitters(docs, "text", k = 9, minShare = 0.1)
    }
    Corpus.heavyHitters(docs, "text", k = 9, minShare = 0.11).collect() // just above: fine
  }

  test("graft_heavy_hitters is registered for SQL") {
    GraftExtensions.register(spark)
    Seq("x x x y").toDF("text").createOrReplaceTempView("hh_t")
    val row = spark.sql(
      """SELECT graft_heavy_hitters(tok, 2) AS s
         FROM (SELECT explode(split(text, ' ')) AS tok FROM hh_t)""").head()
    val items = row.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(items.head == (("x", 3L)), s"got $items")
  }

  test("sketch partial-aggregates map-side (ObjectHashAggregate with partial phase)") {
    val docs = Tables.documents(spark, sfDir)
    val df = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(HeavyHitterFunctions.mgHeavyHitters(col("tok"), 8).as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$p")
    assert(p.contains("partial_mgheavyhitters") || p.toLowerCase.contains("partial"),
      "sketch must have a map-side partial phase")
  }
}
