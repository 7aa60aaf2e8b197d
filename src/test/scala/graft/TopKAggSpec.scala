package graft

import org.apache.spark.sql.functions._

import graft.functions.{TopKBuffer, TopKFunctions}

/** TopKAgg: heap semantics, partial/merge correctness across many
  * partitions, serialization round-trip, and the partial-aggregation plan
  * shape that makes it 100 TB-viable.
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  test("buffer keeps the k largest with deterministic tie-breaks") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 20L), (3.0, 30L), (5.0, 5L), (0.5, 40L))
      .foreach { case (o, p) => b.insert(o, p) }
    // top3 by (ord desc, payload asc): (5.0,5), (5.0,20), (3.0,30)
    assert(b.sorted.toSeq == Seq((5.0, 5L), (5.0, 20L), (3.0, 30L)))
  }

  test("ties at the boundary retain the smaller payload") {
    val b = new TopKBuffer(2)
    Seq((1.0, 2L), (1.0, 3L), (1.0, 1L)).foreach { case (o, p) => b.insert(o, p) }
    assert(b.sorted.toSeq == Seq((1.0, 1L), (1.0, 2L)))
  }

  test("NaN ords follow Spark's total order (NaN greatest) and are arrival-order independent") {
    // primitive </== both answer false for NaN: an unguarded heap let a
    // NaN admitted early sit at the root and block eviction of smaller
    // elements, making the kept set depend on arrival order
    val inputs = Seq((Double.NaN, 1L), (3.0, 2L), (9.0, 3L))
    val expect = Seq((Double.NaN, 1L), (9.0, 3L)) // NaN sorts greatest
    inputs.permutations.foreach { perm =>
      val b = new TopKBuffer(2)
      perm.foreach { case (o, p) => b.insert(o, p) }
      val got = b.sorted.toSeq
      assert(got.map(_._2) == expect.map(_._2) &&
        java.lang.Double.isNaN(got.head._1) && got(1)._1 == 9.0,
        s"order ${perm.mkString(",")} gave $got")
    }
  }

  test("aggregate across many partitions matches the window formulation") {
    val df = (1L to 1000L).map(i => (s"g${i % 7}", i.toDouble % 97, i))
      .toDF("g", "ord", "pay")
      .repartition(13)
    val viaAgg = df.groupBy("g")
      .agg(TopKFunctions.topK(col("ord"), col("pay"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.ord"), col("t.payload"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("pay").asc)
    val viaWin = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).as("pos"), col("ord"), col("pay"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaAgg == viaWin)
  }

  test("nulls in ord or payload are skipped") {
    val df = Seq((Some(1.0), Some(1L)), (None, Some(2L)), (Some(3.0), None))
      .toDF("ord", "pay")
    val out = df.agg(TopKFunctions.topK(col("ord"), col("pay"), 10).as("top"))
      .select(size(col("top"))).collect().head.getInt(0)
    assert(out == 1)
  }

  test("plan runs as partial + final hash aggregate (map-side top-k)") {
    val df = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(TopKFunctions.topK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate (TypedImperativeAggregate's exec) in two phases
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_graft_topk") || plan.contains("partial_topkagg"),
      s"expected a partial aggregation phase in:\n$plan")
  }

  test("SQL registration via graft_topk") {
    GraftExtensions.register(spark)
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_topk")
    val rows = spark.sql("""
      SELECT o_orderpriority, graft_topk(o_totalprice, o_orderkey, 2) AS top
      FROM orders_topk GROUP BY 1""").collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Any](1).size <= 2))
  }
}
