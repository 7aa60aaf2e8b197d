package graft

import org.apache.spark.sql.DataFrame

import graft.plans.BloomAntiJoinRule

/** The opt-in anti-join bloom reroute: rewrite fires only when enabled,
  * results stay bit-identical to the plain anti-join, and the two
  * correctness traps (null join keys, empty build side) are covered.
  */
class BloomAntiJoinRuleSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(BloomAntiJoinRule)
    spark.conf.set(BloomAntiJoinRule.EnabledConf, "true")
    try f
    finally {
      spark.conf.unset(BloomAntiJoinRule.EnabledConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  private lazy val docs = Tables.documents(spark, sfDir)
  private def probe = docs.select($"doc_id", $"lang")
  private def build = docs.filter($"doc_id" % 3 === 0).select($"doc_id".as("pid"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("rewrite fires when enabled: union + might_contain, results bit-identical") {
    val plain = sortedRows(probe.join(build, $"doc_id" === $"pid", "left_anti"))
    val (got, plan) = withRule {
      val df = probe.join(build, $"doc_id" === $"pid", "left_anti")
      (sortedRows(df), df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("might_contain"), s"reroute did not fire:\n$plan")
    assert(plan.contains("Union"), plan)
    assert(plan.contains("bloom_filter_agg"), "sketch must build as a scalar subquery")
    assert(got == plain)
    assert(got.nonEmpty)
  }

  test("reversed equality and swapped condition sides still match") {
    val plain = sortedRows(probe.join(build, $"pid" === $"doc_id", "left_anti"))
    val (got, plan) = withRule {
      val df = probe.join(build, $"pid" === $"doc_id", "left_anti")
      (sortedRows(df), df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("might_contain"), plan)
    assert(got == plain)
  }

  test("null probe keys are always kept (anti-join null semantics survive routing)") {
    withRule {
      val l = Seq(Some(0L), Some(1L), None).toDF("k")
      val r = Seq(0L).toDF("rk")
      val out = l.join(r, $"k" === $"rk", "left_anti")
      val kept = out.collect().map(row => if (row.isNullAt(0)) None else Some(row.getLong(0)))
      assert(kept.toSet == Set(Some(1L), None), s"got ${kept.toSeq}")
    }
  }

  test("empty build side: null sketch routes everything fresh, nothing is lost") {
    withRule {
      // parquet-backed impossible filter: the optimizer can't constant-fold
      // it to an empty relation, so the rule DOES fire and the sketch is
      // genuinely null at runtime
      val emptyBuild = docs.filter($"doc_id" < 0).select($"doc_id".as("pid"))
      val df = probe.join(emptyBuild, $"doc_id" === $"pid", "left_anti")
      assert(df.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(df.count() == probe.count())
    }
  }

  test("disabled conf leaves the anti-join untouched; richer conditions never match") {
    spark.experimental.extraOptimizations = Seq(BloomAntiJoinRule)
    try {
      val p = probe.join(build, $"doc_id" === $"pid", "left_anti")
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("might_contain"), "rule must be inert without the conf")
      // enabled, but a compound condition → no rewrite
      spark.conf.set(BloomAntiJoinRule.EnabledConf, "true")
      val compound = probe.join(build,
          $"doc_id" === $"pid" && $"lang" =!= "xx", "left_anti")
        .queryExecution.optimizedPlan.toString
      assert(!compound.contains("might_contain"), "compound conditions must be left alone")
    } finally {
      spark.conf.unset(BloomAntiJoinRule.EnabledConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("non-deterministic probe side is left alone (the rewrite executes it twice)") {
    withRule {
      val nd = probe.filter(org.apache.spark.sql.functions.rand(7) < 0.5)
        .join(build, $"doc_id" === $"pid", "left_anti")
        .queryExecution.optimizedPlan.toString
      assert(!nd.contains("might_contain"),
        s"a rand()-filtered probe must not be duplicated into two Union branches:\n$nd")
    }
  }

  test("rule fires exactly once: inner anti-join is never re-rerouted") {
    val (plan, got) = withRule {
      val df = probe.join(build, $"doc_id" === $"pid", "left_anti")
      (df.queryExecution.optimizedPlan.toString, sortedRows(df))
    }
    // one reroute = one Union; a tag lost to a join.copy() used to allow a
    // second reroute of the inner anti-join (nested Union, probe scanned 3x)
    assert(plan.sliding("Union".length).count(_ == "Union") == 1,
      s"inner anti-join was re-rerouted:\n$plan")
    assert(got.nonEmpty)
  }
}
