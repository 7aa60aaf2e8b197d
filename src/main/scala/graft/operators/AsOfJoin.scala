package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (pandas merge_asof / kdb aj / DuckDB ASOF JOIN): for every
  * left row, the single most recent right row with the same key and
  * `rightTime <= leftTime`, optionally within a tolerance — plus the
  * `forward` and `nearest` directions of pandas' merge_asof.
  *
  * Spark has no as-of operator; per the preference order (compose > custom
  * Catalyst) this is the COMPOSED form, and it is also the scalable one:
  * tag both inputs, union, and take `last(payload, ignoreNulls)` over a
  * (key, time)-ordered running window. One shuffle on the key, one sort —
  * the same cost as a sort-merge join — versus the non-equi range-join
  * formulation (BNLJ or an exploding `BETWEEN` join) that goes quadratic
  * per key. Both backward windows share the single (key, time) sort order,
  * so Catalyst evaluates them in one Window stage; `joinNearest` adds the
  * reverse-ordered traversal — a second SORT but still the SAME single
  * exchange (spec-pinned), never a second shuffle.
  *
  * Tie contracts (all deterministic under retries):
  *  - backward: right ties on (key, time) resolve to the GREATEST rightId;
  *  - forward: to the SMALLEST rightId;
  *  - nearest: equal |lag| resolves backward (the pandas convention).
  */
object AsOfJoin {

  /** Tag, cast, and union the two inputs — shared by every direction. */
  private def unionTagged(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightIdCol: String): DataFrame = {
    val l = left.withColumn("__t", unix_millis(col(leftTimeCol)))
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
      .withColumn("__rt", lit(null).cast("long"))
    val r = right.select(
      col(keyCol),
      unix_millis(col(rightTimeCol)).as("__t"),
      lit(0).as("__side"),
      col(rightIdCol).cast("long").as("__rid"),
      unix_millis(col(rightTimeCol)).as("__rt"))
    l.unionByName(r, allowMissingColumns = true)
  }

  // Traversal orders. At equal times the right row sorts BEFORE the left
  // row (side asc) so a right row AT the left timestamp is visible to it;
  // the rid direction makes the LAST row carried at a tied right time the
  // greatest (backward) / smallest (forward) id.
  private def backwardWindow(keyCol: String) = Window.partitionBy(col(keyCol))
    .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc_nulls_last)
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def forwardWindow(keyCol: String) = Window.partitionBy(col(keyCol))
    .orderBy(col("__t").desc, col("__side").asc, col("__rid").desc_nulls_last)
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightIdCol: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val unioned = unionTagged(left, right, keyCol, leftTimeCol, rightTimeCol, rightIdCol)
    val w = backwardWindow(keyCol)
    val carried = unioned
      .withColumn("__asof_rid", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__asof_rt", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceMs match {
      case Some(tol) => carried.withColumn("__ok",
          col("__asof_rt").isNotNull && (col("__t") - col("__asof_rt")) <= tol)
      case None => carried.withColumn("__ok", col("__asof_rt").isNotNull)
    }
    bounded
      .withColumn("asof_right_id", when(col("__ok"), col("__asof_rid")))
      .withColumn("asof_lag_ms", when(col("__ok"), col("__t") - col("__asof_rt")))
      .drop("__t", "__side", "__rid", "__rt", "__asof_rid", "__asof_rt", "__ok")
  }

  /** Forward as-of: the EARLIEST right row at-or-after the left time
    * (within tolerance) — "next action after" attribution. Same single
    * shuffle, reverse traversal.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightIdCol: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val unioned = unionTagged(left, right, keyCol, leftTimeCol, rightTimeCol, rightIdCol)
    val w = forwardWindow(keyCol)
    val carried = unioned
      .withColumn("__asof_rid", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__asof_rt", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceMs match {
      case Some(tol) => carried.withColumn("__ok",
          col("__asof_rt").isNotNull && (col("__asof_rt") - col("__t")) <= tol)
      case None => carried.withColumn("__ok", col("__asof_rt").isNotNull)
    }
    bounded
      .withColumn("asof_right_id", when(col("__ok"), col("__asof_rid")))
      .withColumn("asof_lead_ms", when(col("__ok"), col("__asof_rt") - col("__t")))
      .drop("__t", "__side", "__rid", "__rt", "__asof_rid", "__asof_rt", "__ok")
  }

  /** Nearest as-of: the right row minimizing |rightTime − leftTime| within
    * tolerance; equal distances resolve BACKWARD. Both traversals run over
    * the one unioned relation — two sorts, ONE exchange (spec-pinned) —
    * then the pick is a map-side comparison. Emits `asof_right_id` and the
    * SIGNED `asof_signed_lag_ms` (= leftTime − rightTime: positive means
    * the match precedes the left row).
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightIdCol: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val unioned = unionTagged(left, right, keyCol, leftTimeCol, rightTimeCol, rightIdCol)
    val wB = backwardWindow(keyCol)
    val wF = forwardWindow(keyCol)
    val carried = unioned
      .withColumn("__b_rid", last(col("__rid"), ignoreNulls = true).over(wB))
      .withColumn("__b_rt", last(col("__rt"), ignoreNulls = true).over(wB))
      .withColumn("__f_rid", last(col("__rid"), ignoreNulls = true).over(wF))
      .withColumn("__f_rt", last(col("__rt"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val lagB = col("__t") - col("__b_rt")
    val leadF = col("__f_rt") - col("__t")
    val tol = toleranceMs.map(lit(_)).getOrElse(lit(Long.MaxValue))
    val okB = col("__b_rt").isNotNull && lagB <= tol
    val okF = col("__f_rt").isNotNull && leadF <= tol
    val pickB = okB && (!okF || lagB <= leadF)
    carried
      .withColumn("asof_right_id",
        when(pickB, col("__b_rid")).when(okF, col("__f_rid")))
      .withColumn("asof_signed_lag_ms",
        when(pickB, lagB).when(okF, -leadF))
      .drop("__t", "__side", "__rid", "__rt", "__b_rid", "__b_rt", "__f_rid", "__f_rt")
  }
}
