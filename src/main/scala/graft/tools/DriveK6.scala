package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Sinks

/** Manual driver for the K6 nested-mode upsert — exercises the sink through
  * the public API end-to-end; doubles as usage documentation.
  */
object DriveK6 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graftdrive/k6")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    Sinks.upsertMergeArrays(spark,
      Seq(("doc_1", Seq((0L, "join")))).toDF("key", "annotations"), out, "key", "annotations")
    Sinks.upsertMergeArrays(spark,
      Seq(("doc_1", Seq((0L, "join"), (1L, "scan"))), ("doc_2", Seq((9L, "hash"))))
        .toDF("key", "annotations"), out, "key", "annotations")
    spark.read.parquet(out).orderBy("key").show(false)
    spark.stop()
  }
}
