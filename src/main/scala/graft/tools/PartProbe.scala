package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: does Dataset.localCheckpoint carry the physical plan's
  * outputPartitioning/outputOrdering into the LogicalRDD under this Spark
  * build's defaults (AQE on)? Prints the checkpoint scan's partitioning as
  * seen by a downstream self-join.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 37).toString)).toDF("id", "k")
    def show(tag: String, ck: org.apache.spark.sql.DataFrame): Unit = {
      val j = ck.select(col("k"), col("id").as("a"))
        .join(ck.select(col("k"), col("id").as("b")), Seq("k"))
        .filter(col("a") < col("b"))
      println(s"===== $tag")
      println(j.queryExecution.executedPlan.toString.take(1800))
    }
    val base = df.repartition(col("k")).sortWithinPartitions("k")
    show("aqe-on localCheckpoint", base.localCheckpoint(true))
    show("snapshotKeyed under session AQE-on",
      graft.operators.Stage.snapshotKeyed(df, "k"))
    println("session AQE after window: " +
      spark.conf.get("spark.sql.adaptive.enabled"))
    spark.stop()
  }
}
