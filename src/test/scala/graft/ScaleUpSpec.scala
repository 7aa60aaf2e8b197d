package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

/** Pins for the ×K scale-up generator backing the round-16 scale-curve
  * audit: the exponent fit is only meaningful if `uniq` mode really grows
  * the corpus linearly (token-disjoint copies, original preserved) and
  * `dup` mode really builds K-clone clusters.
  */
class ScaleUpSpec extends SparkSuite {

  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma", "en", "web", 16L),
    (2L, "delta epsilon", "en", "book", 13L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("uniq mode: copy 0 verbatim, copies token-disjoint, ids/n_chars consistent") {
    val out = ScaleUp.scaleDocuments(docs, 3, uniq = true).collect()
    assert(out.length == 6)
    assert(out.map(_.getLong(0)).distinct.length == 6)
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == "alpha beta gamma")
    assert(byId(1L + ScaleUp.CopyIdOffset) == "c1xalpha c1xbeta c1xgamma")
    // token-disjoint across ALL copy pairs, including tagged-vs-tagged
    val copies = Seq(byId(1L), byId(1L + ScaleUp.CopyIdOffset), byId(1L + 2 * ScaleUp.CopyIdOffset))
      .map(_.split(" ").toSet)
    for (i <- copies.indices; j <- copies.indices if i < j)
      assert(copies(i).intersect(copies(j)).isEmpty, s"copies $i/$j share tokens")
    out.foreach(r => assert(r.getLong(4) == r.getString(1).length.toLong))
  }

  test("dup mode: exact text clones under fresh ids") {
    val out = ScaleUp.scaleDocuments(docs, 4, uniq = false).collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(0)).distinct.length == 8)
    assert(out.count(_.getString(1) == "alpha beta gamma") == 4)
  }

  test("events: uniq remaps user ids, dup keeps them; event ids always fresh") {
    val ev = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val uniq = ScaleUp.scaleEvents(ev, 3, uniq = true).collect()
    assert(uniq.map(_.getLong(0)).distinct.length == 3)
    assert(uniq.map(_.getLong(2)).distinct.length == 3)
    val dup = ScaleUp.scaleEvents(ev, 3, uniq = false).collect()
    assert(dup.map(_.getLong(0)).distinct.length == 3)
    assert(dup.map(_.getLong(2)).distinct.length == 1)
    dup.foreach(r => assert(r.getTimestamp(1) == uniq.head.getTimestamp(1)))
  }

  test("determinism: two scale-ups of real documents agree row for row") {
    val d = Tables.documents(spark, sfDir)
    val a = ScaleUp.scaleDocuments(d, 2, uniq = true)
    val b = ScaleUp.scaleDocuments(d, 2, uniq = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
