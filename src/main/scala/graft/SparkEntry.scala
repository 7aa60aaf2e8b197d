package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.2): one entry
  * per implemented operator, each runnable over a test-data directory.
  * `oracleSql` holds the DuckDB-equivalent SQL for every hash-checkable
  * query; entries absent from it (hash-function-dependent operators like
  * MinHash/SimHash) get a rows-only check and are covered by ScalaTest specs
  * instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire reason to exist (`README.md:10-13`): scan →
    * length-filter → annotate → explode → per-annotation records.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.q30_annotations(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ RelationalQueries2.all ++ PipelineQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      StreamQueries.all ++ MiscQueries.all ++ TrainingQueries.all ++
      RelationalQueries3.all ++ TimeSeriesQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ RelationalQueries2.oracle ++ PipelineQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++ TextQueries.oracle ++
      StreamQueries.oracle ++ MiscQueries.oracle ++ TrainingQueries.oracle ++
      RelationalQueries3.oracle ++ TimeSeriesQueries.oracle
}
