package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage
import graft.operators.Linkage.FieldRule

/** Fellegi–Sunter scoring: weight algebra, blocking behavior, and the
  * separation property (a true duplicate outscores a random pair).
  */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private val people = Seq(
    (1L, "ann smith", "b1", 100.0),
    (2L, "ann smith", "b1", 105.0),   // dup of 1: name agrees, amount near
    (3L, "bob jones", "b1", 900.0),   // same block, no field agreement
    (4L, "ann smith", "b2", 100.0))   // other block: never paired with 1
    .toDF("id", "name", "blk", "amt")

  private val rules = Seq(
    FieldRule("name", (a, b) => a === b, m = 0.9, u = 0.05),
    FieldRule("amt", (a, b) => abs(a - b) <= 10.0, m = 0.8, u = 0.1))

  test("weights: agreement positive, disagreement negative, discrimination ordering") {
    val r = rules.head
    assert(r.wAgree > 0 && r.wDisagree < 0)
    val weak = FieldRule("x", (a, b) => a === b, m = 0.6, u = 0.4)
    assert(r.wAgree > weak.wAgree, "a more discriminating field weighs more")
    intercept[IllegalArgumentException](FieldRule("bad", (a, b) => a === b, m = 0.2, u = 0.5))
  }

  test("candidate pairs stay within blocks, id_a < id_b, payload carried twice") {
    val pairs = Linkage.candidatePairs(people, "id", Seq("blk"))
    val got = pairs.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $got")
    assert(pairs.columns.contains("a_name") && pairs.columns.contains("b_amt"))
  }

  test("scores separate: the true duplicate gets both agreements, strangers get none") {
    val scored = Linkage.score(Linkage.candidatePairs(people, "id", Seq("blk")), rules)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("match_score")).toMap
    val expectDup = rules.map(_.wAgree).sum
    val expectStranger = rules.map(_.wDisagree).sum
    assert(math.abs(scored((1L, 2L)) - expectDup) < 1e-9)
    assert(math.abs(scored((1L, 3L)) - expectStranger) < 1e-9)
    assert(scored((1L, 2L)) > scored((1L, 3L)))
  }

  test("q163 returns 20 ranked rows with the top score = all-agree weight sum") {
    val rows = SparkEntry.queries("q163_record_linkage")(spark, sfDir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("match_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("golden record: transitive matches consolidate, canonical attrs are min-id name + max balance") {
    import spark.implicits._
    import graft.operators.Dedup
    // chain: 1-2 and 2-3 match pairwise → one entity {1,2,3}; 4 is a
    // singleton and must not be emitted
    val matched = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.connectedComponents(matched, "id_a", "id_b")
    val recs = Seq(
      (1L, "alice ltd", 50.0), (2L, "alice limited", 90.0),
      (3L, "alyce ltd", 70.0), (4L, "bob inc", 10.0))
      .toDF("id", "name", "bal")
    val golden = recs.join(clusters, recs("id") === clusters("node"), "left")
      .withColumn("component", coalesce($"component", $"id"))
      .groupBy("component")
      .agg(count(lit(1)).as("n"),
        min(struct($"id", $"name")).getField("name").as("canon_name"),
        max("bal").as("max_bal"))
      .filter($"n" >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(golden.toSeq == Seq((1L, 3L, "alice ltd", 90.0)), s"got ${golden.toSeq}")
  }

  test("candidatePairsCapped: hot block dropped whole, cold pairs bit-identical, cap observable") {
    // hot block h: 6 members (15 pairs); cold blocks match `people`'s
    val hot = (10L until 16L).map(i => (i, s"p$i", "h", i * 1.0))
    val df = people.union(hot.toDF("id", "name", "blk", "amt"))
    val capped = Linkage.candidatePairsCapped(df, "id", Seq("blk"), maxBlockSize = 4)
    val got = capped.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val open = Linkage.candidatePairs(people, "id", Seq("blk"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == open, s"cold blocks must be untouched: $got vs $open")
    // the composite-key guard reports on the shared capBuckets channel
    capped.collect()
    val metrics = capped.queryExecution.observedMetrics
      .collect { case (name, row) if name.startsWith("graft.capBuckets.") => row }
    assert(metrics.nonEmpty, "a firing block cap must be observable")
    assert(metrics.head.getAs[Long]("dropped_rows") == 6L, s"${metrics.head}")
    // multi-column blocks with colliding concatenations stay distinct
    val tricky = Seq((1L, "ab", "c", 1.0), (2L, "a", "bc", 1.0)).toDF("id", "b1", "b2", "x")
    assert(Linkage.candidatePairsCapped(tricky, "id", Seq("b1", "b2"), 4).count() == 0,
      "(ab, c) and (a, bc) are different blocks")
  }
}
