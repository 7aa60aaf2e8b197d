package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Stage}

/** Stage.snapshot mode selection: local (default) vs reliable checkpoint.
  * The operators themselves are covered by their own suites; this asserts
  * the barrier is mode-transparent (same results) and that misconfiguration
  * fails loudly instead of silently degrading.
  *
  * Declaration order matters: the failure-path test MUST run before any
  * reliable-mode success — SparkContext.setCheckpointDir is sticky on the
  * shared session, so once a reliable snapshot has run, the
  * missing-dir branch is unreachable for the rest of the JVM.
  */
class StageSpec extends SparkSuite {
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Stage.ModeConf, mode)
    try body finally spark.conf.unset(Stage.ModeConf)
  }

  test("unknown mode and missing reliable dir fail loudly") {
    val df = Seq(1, 2, 3).toDF("x")
    withMode("turbo") {
      val e = intercept[IllegalArgumentException](Stage.snapshot(df))
      assert(e.getMessage.contains(Stage.ModeConf))
    }
    // runs FIRST in the suite (see class doc), so no checkpoint dir has
    // been set yet — the guard documents the cross-suite hazard
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.unset(Stage.DirConf)
      withMode("reliable") {
        val e = intercept[IllegalArgumentException](Stage.snapshot(df))
        assert(e.getMessage.contains(Stage.DirConf))
      }
    } else
      fail("checkpoint dir already set before StageSpec's failure-path test — " +
        "reorder tests so the missing-dir branch stays covered")
  }

  test("reliable mode produces identical results to local mode") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text").limit(50)
    val local = Corpus.tfidf(docs, "doc_id", "text")
      .select($"doc_id", $"term", round($"tfidf", 6).as("w"))
      .collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Stage.DirConf, dir)
    val reliable = withMode("reliable") {
      Corpus.tfidf(docs, "doc_id", "text")
        .select($"doc_id", $"term", round($"tfidf", 6).as("w"))
        .collect().map(_.toSeq).toSet
    }
    assert(reliable == local)
    // the multi-round CC loop checkpoints per iteration — exercise it too
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = withMode("reliable") {
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("snapshotKeyed: checkpoint carries hash(key) layout (self-join plans " +
    "with no Exchange, no Sort) and the AQE window restores the session conf") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val df = (1 to 500).map(i => (i.toLong, (i % 13).toString)).toDF("id", "k")
    val ck = Stage.snapshotKeyed(df, "k")
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == before,
      "AQE-off window must restore the session setting")
    // force SMJ so the co-partitioning is load-bearing, then check the
    // physical plan: the keyed checkpoint must feed BOTH join sides with
    // no Exchange and no Sort (the whole point of the keyed layout —
    // under AQE-at-checkpoint the LogicalRDD came back UnknownPartitioning
    // and this assertion fails, the PartProbe finding)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = ck.select($"k", $"id".as("a"))
        .join(ck.select($"k", $"id".as("b")), Seq("k"))
        .filter($"a" < $"b")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"keyed snapshot must co-partition the self-join:\n$plan")
      assert(!plan.contains("+- Sort ["), s"keyed snapshot must carry the sort order:\n$plan")
      // and the rows are what an unkeyed pipeline produces
      val got = j.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = (1 to 500).flatMap(a => (a + 1 to 500).filter(b => b % 13 == a % 13)
        .map(b => ((a % 13).toString, a.toLong, b.toLong))).toSet
      assert(got == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("snapshotKeyed: concurrent AQE-off windows never wedge the session " +
    "(depth-counted save/restore, the q248 thread-pool pattern)") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to 8).map { i =>
        Future {
          val df = (1 to 50).map(j => (j.toLong + i, (j % 5).toString)).toDF("id", "k")
          Stage.snapshotKeyed(df, "k").count()
        }
      }
      Await.result(Future.sequence(fs), Duration(120L, "s"))
    } finally pool.shutdown()
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == before,
      "interleaved windows must restore the ORIGINAL setting, not a temporary false")
  }
}
