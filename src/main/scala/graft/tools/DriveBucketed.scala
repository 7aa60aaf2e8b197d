package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.sources.Sinks

/** Manual driver: bucketed co-located join — writes two bucketed tables and
  * prints the joined plan so the absence of a shuffle is visible.
  */
object DriveBucketed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"); Sinks.drop(spark, s"spark-warehouse/$t")
    }
    val dir = "/root/testdata/sf0.001"
    Sinks.writeBucketed(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Sinks.writeBucketed(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    println("JOIN ROWS = " + joined.count())
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    println("HAS_SHUFFLE = " + plan.contains("Exchange hashpartitioning"))
    spark.stop()
  }
}
