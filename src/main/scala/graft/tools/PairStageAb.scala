package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the two physical forms of the exact pair stage (BENCH_NOTES §r17
  * addendum, decided §r18): `Dedup.jaccardPairsAgg` (collect_list posting
  * arrays → ObjectHashAggregate, whose sort-based fallback went 124× for
  * 10× rows at ×100 — the retired r17 form) vs `Dedup.jaccardPairs`
  * (sort-merge self-join on shingle, UnsafeRow binary sorts — the form
  * shipped after the ×100 cell decided). Same result set by construction;
  * this main prices only the physical choice, min-of-N per form per
  * directory.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PairStageAb <dir>[,<dir>...] [runs]"
  */
object PairStageAb {
  def main(args: Array[String]): Unit = {
    val dirs = args.lift(0).map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1"))
    val runs = args.lift(1).map(_.toInt).getOrElse(2).max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    dirs.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      // warm both forms once (footer cache, codegen), then measure
      graft.operators.Dedup.jaccardPairsAgg(docs, "doc_id", "text", 3, 0.6).count()
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count()
      val agg = (1 to runs).map(_ => time(
        graft.operators.Dedup.jaccardPairsAgg(docs, "doc_id", "text", 3, 0.6).count()))
      val join = (1 to runs).map(_ => time(
        graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count()))
      require(agg.head._2 == join.head._2,
        s"forms disagree: ${agg.head._2} vs ${join.head._2} pairs")
      def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      println(s"""{"dir":"$dir","pairs":${agg.head._2},"agg_s":${r3(agg.map(_._1).min)},"join_s":${r3(join.map(_._1).min)},"runs":$runs}""")
    }
    spark.stop()
  }
}
