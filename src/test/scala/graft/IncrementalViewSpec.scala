package graft

import graft.operators.IncrementalView

/** Pins [[graft.operators.IncrementalView]]: signed-delta semantics
  * (insert/delete/update pairs, group-moving updates), vanish-to-zero and
  * newborn groups, and CHAINED refreshes staying exactly equal to a full
  * recompute (the decimal-exactness contract — no drift per cycle).
  */
class IncrementalViewSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "grp", "v")
      .withColumn("v", org.apache.spark.sql.functions.col("v").cast("decimal(18,2)"))

  private def agg(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    df.groupBy("grp").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    df.select(col("grp"), col("cnt").cast("long"),
        col("total").cast("decimal(18,2)"))
      .as[(String, Long, BigDecimal)].collect().sortBy(_._1).toSeq
  }

  private val v1 = Seq(
    (1L, "a", "10.00"), (2L, "a", "5.50"), (3L, "b", "7.25"), (4L, "c", "1.00"))

  test("signed delta: update, group-move, delete, insert — with ±1 weights") {
    val v2 = Seq(
      (1L, "a", "11.00"),  // price update, same group
      (2L, "b", "5.50"),   // MOVES a → b
      (4L, "c", "1.00"),   // unchanged — must not appear
      (5L, "d", "9.99"))   // insert (group born); id 3 deleted (b loses one)
    val d = IncrementalView.signedDelta(snap(v1), snap(v2), Seq("id"))
      .as[(Long, String, BigDecimal, Long)].collect().toSet
    assert(d == Set(
      (1L, "a", BigDecimal("10.00"), -1L), (1L, "a", BigDecimal("11.00"), 1L),
      (2L, "a", BigDecimal("5.50"), -1L), (2L, "b", BigDecimal("5.50"), 1L),
      (3L, "b", BigDecimal("7.25"), -1L),
      (5L, "d", BigDecimal("9.99"), 1L)), s"got $d")
  }

  test("refresh ≡ full recompute; vanished groups drop; chained refresh stays exact") {
    val v2 = Seq(
      (1L, "a", "11.00"), (2L, "b", "5.50"), (5L, "d", "9.99"))
    // id 3 and 4 deleted: c vanishes entirely (count reaches 0)
    val r1 = IncrementalView.refreshCountSum(
      agg(snap(v1)), IncrementalView.signedDelta(snap(v1), snap(v2), Seq("id")),
      Seq("grp"), "v", "cnt", "total")
    assert(canon(r1) == canon(agg(snap(v2))), s"refresh ${canon(r1)}")
    assert(!canon(r1).exists(_._1 == "c"), "zero-count group must drop")
    // chain a second cycle off the REFRESHED view, not a recompute
    val v3 = Seq((2L, "b", "6.00"), (5L, "d", "9.99"), (6L, "a", "2.00"))
    val r2 = IncrementalView.refreshCountSum(
      r1, IncrementalView.signedDelta(snap(v2), snap(v3), Seq("id")),
      Seq("grp"), "v", "cnt", "total")
    assert(canon(r2) == canon(agg(snap(v3))), s"chained refresh ${canon(r2)}")
  }
}
