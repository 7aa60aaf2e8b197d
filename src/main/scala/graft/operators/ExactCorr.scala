package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-decimal Pearson/OLS closed-form terms — ONE definition of
  * the n·Σxy − ΣxΣy algebra used by [[TimeSeries.linearFit]] (per-key
  * trend) and [[Graph.assortativity]] (edge-endpoint correlation), so an
  * overflow-headroom or guard fix can never drift between them.
  *
  * Contract: callers cast both inputs to [[dec]] BEFORE any product (the
  * per-element product then sums exactly), and keep input magnitudes
  * within the documented headroom — with |x| ≤ 10^a, |y| ≤ 10^b and n
  * rows, the largest term is n²·10^{2·max(a,b)}; it must stay under
  * 10^38. The final casts to double are the ONLY lossy step, applied to
  * identical exact integers on both engines.
  */
private[operators] object ExactCorr {

  val dec = "decimal(38,0)"

  /** The six aggregate columns (named __m/__sx/__sy/__sxy/__sxx/__syy)
    * the term builders below read.
    */
  def aggs(xd: Column, yd: Column): Seq[Column] = Seq(
    count(lit(1)).cast(dec).as("__m"),
    sum(xd).as("__sx"), sum(yd).as("__sy"),
    sum(xd * yd).as("__sxy"), sum(xd * xd).as("__sxx"), sum(yd * yd).as("__syy"))

  def num: Column = (col("__m") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
  def denX: Column = (col("__m") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
  def denY: Column = (col("__m") * col("__syy") - col("__sy") * col("__sy")).cast("double")
}
