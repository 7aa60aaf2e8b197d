package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Mergeable incremental data card: the sketch-union contract that makes
  * per-batch partials equivalent to a full-corpus rescan.
  */
class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("merged partials ≡ single-pass whole-corpus card (counters exact, sketch estimate bit-equal)") {
    val slices = Seq(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      docs.filter(pmod(col("doc_id"), lit(3)) === 2))
    val merged = IncrementalAgg.finalizeCard(
      IncrementalAgg.mergePartials(slices.map(IncrementalAgg.datacardPartials(_))))
      .orderBy("source").collect()
    val whole = IncrementalAgg.finalizeCard(IncrementalAgg.datacardPartials(docs))
      .orderBy("source").collect()
    assert(merged.length == whole.length && merged.nonEmpty)
    merged.zip(whole).foreach { case (m, w) =>
      assert(m.getString(0) == w.getString(0))
      assert(m.getLong(1) == w.getLong(1), s"n_docs drift for ${m.getString(0)}")
      assert(m.getLong(2) == w.getLong(2), s"n_chars drift for ${m.getString(0)}")
      // HLL union is exact over sketch state: same input set → same estimate
      assert(m.getLong(3) == w.getLong(3),
        s"sketch-merge estimate drift for ${m.getString(0)}: ${m.getLong(3)} vs ${w.getLong(3)}")
    }
  }

  test("merge is order-invariant (commutative + associative over batches)") {
    val a = IncrementalAgg.datacardPartials(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val b = IncrementalAgg.datacardPartials(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    val ab = IncrementalAgg.finalizeCard(IncrementalAgg.mergePartials(Seq(a, b)))
      .orderBy("source").collect()
    val ba = IncrementalAgg.finalizeCard(IncrementalAgg.mergePartials(Seq(b, a)))
      .orderBy("source").collect()
    assert(ab.map(_.toSeq.toList).toList == ba.map(_.toSeq.toList).toList)
  }

  test("estimate honors the lgK=12 error bound against the exact distinct count") {
    val rows = SparkEntry.queries("q154_incremental_datacard")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"source ${r.getAs[String]("source")}: estimate outside 5% of exact")
    }
  }

  test("snapshotDiff: insert/update/delete classified, unchanged rows silent") {
    import graft.operators.ChangeCapture
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (5L, null.asInstanceOf[String], 50.0), (6L, null.asInstanceOf[String], 60.0))
      .toDF("k", "v", "p")
    val after = Seq((2L, "b", 20.0), (3L, "x", 30.0), (4L, "d", 40.0),
      (5L, null.asInstanceOf[String], 50.0), (6L, "now", 60.0))
      .toDF("k", "v", "p")
    val diff = ChangeCapture.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "delete", 3L -> "update", 4L -> "insert", 6L -> "update"),
      s"got $diff")
  }

  test("Scd.fold: consecutive repeats collapse, change points open intervals") {
    val log = Seq(
      ("u1", 1000L, 1L, "a"), ("u1", 2000L, 2L, "a"), ("u1", 3000L, 3L, "b"),
      ("u1", 4000L, 4L, "b"), ("u1", 5000L, 5L, "a"),
      ("u2", 1000L, 6L, "z"))
      .toDF("k", "ts", "id", "attr")
    val dim = graft.operators.Scd.fold(log, "k", "ts", "id", "attr")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(dim.toList == List(
      ("u1", "a", 1000L, 3000L), ("u1", "b", 3000L, 5000L), ("u1", "a", 5000L, -1L),
      ("u2", "z", 1000L, -1L)))
  }

  test("Scd incremental contract: merge(fold(prefix), suffix) ≡ fold(log)") {
    val ev = Tables.events(spark, sfDir).select("user_id", "ts", "event_id", "event_type")
    val cut = ev.agg(expr("percentile_approx(unix_millis(ts), 0.5)")).head().getLong(0)
    val prefix = ev.filter(unix_millis(col("ts")) < cut)
    val suffix = ev.filter(unix_millis(col("ts")) >= cut)
    val whole = graft.operators.Scd.fold(ev, "user_id", "ts", "event_id", "event_type")
    val merged = graft.operators.Scd.merge(
      graft.operators.Scd.fold(prefix, "user_id", "ts", "event_id", "event_type"),
      suffix, "user_id", "ts", "event_id", "event_type")
    assert(whole.count() > 0)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "incremental merge must reproduce the full fold exactly")
  }

  test("Scd.merge: unchanged attribute across the batch boundary extends the open interval") {
    val prefix = Seq(("u1", 1000L, 1L, "a")).toDF("k", "ts", "id", "attr")
    val suffix = Seq(("u1", 2000L, 2L, "a"), ("u1", 3000L, 3L, "b"))
      .toDF("k", "ts", "id", "attr")
    val merged = graft.operators.Scd.merge(
      graft.operators.Scd.fold(prefix, "k", "ts", "id", "attr"),
      suffix, "k", "ts", "id", "attr")
      .orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(merged.toList == List(("a", 1000L, 3000L), ("b", 3000L, -1L)),
      s"no duplicate interval for the unchanged 'a': ${merged.toList}")
  }

  test("StreamingDatacard: card after N micro-batches ≡ one-shot card over all rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("card-store").toString + "/card"
    val ckpt = java.nio.file.Files.createTempDirectory("card-ckpt").toString
    val mem = MemoryStream[(Long, String, String, String, Long)]
    def docsDf(m: org.apache.spark.sql.DataFrame) =
      m.toDF("doc_id", "text", "lang", "source", "n_chars")
    def drain(): Unit = {
      val q = graft.streaming.StreamingDatacard.start(docsDf(mem.toDF()), store, ckpt)
      q.awaitTermination()
    }
    assert(graft.streaming.StreamingDatacard.card(spark, store).isEmpty)
    val all = Seq(
      (1L, "alpha beta gamma", "en", "s1", 16L),
      (2L, "beta beta delta", "en", "s1", 15L),
      (3L, "uno dos", "es", "s2", 7L),
      (4L, "alpha dos tres", "es", "s2", 14L),
      (5L, "gamma gamma", "en", "s1", 11L))
    mem.addData(all(0), all(1))
    drain()
    mem.addData(all(2), all(3))
    drain()
    mem.addData(all(4))
    drain()
    val streamed = graft.streaming.StreamingDatacard.card(spark, store).get
      .orderBy("source").collect().map(_.toSeq.toList).toList
    val oneShot = IncrementalAgg.finalizeCard(IncrementalAgg.datacardPartials(
      all.toDF("doc_id", "text", "lang", "source", "n_chars")))
      .orderBy("source").collect().map(_.toSeq.toList).toList
    assert(streamed == oneShot, s"$streamed vs $oneShot")
  }

  test("zero-token documents still count toward n_docs and n_chars") {
    val tiny = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "", "en", "s1", 0L),
      (3L, "   ", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = IncrementalAgg.finalizeCard(IncrementalAgg.datacardPartials(tiny)).collect()
    assert(card.length == 1)
    assert(card(0).getLong(1) == 3L, "every doc counts, token-less included")
    assert(card(0).getLong(2) == 13L)
    assert(card(0).getLong(3) == 2L, "two distinct tokens")
  }
}
