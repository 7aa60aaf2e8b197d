package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (pandas merge_asof / kdb aj / DuckDB ASOF JOIN): for every
  * left row, the single most recent right row with the same key and
  * `rightTime <= leftTime`, optionally within a tolerance.
  *
  * Spark has no as-of operator; per the preference order (compose > custom
  * Catalyst) this is the COMPOSED form, and it is also the scalable one:
  * tag both inputs, union, and take `last(payload, ignoreNulls)` over a
  * (key, time)-ordered running window. One shuffle on the key, one sort —
  * the same cost as a sort-merge join — versus the non-equi range-join
  * formulation (BNLJ or an exploding `BETWEEN` join) that goes quadratic
  * per key. Both windows share the single (key, time) sort order, so
  * Catalyst evaluates them in one Window stage.
  *
  * Right-side ties on (key, time) resolve to the row with the greatest
  * `rightId` — deterministic under retries.
  *
  * Columns: left(key, ltime, ...), right(key, rtime, rightId) — the right
  * payload is the id column; join back to the right table for more fields.
  */
object AsOfJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightIdCol: String,
      toleranceMs: Option[Long] = None): DataFrame = {
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
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Order: time asc, right-before-left at equal times (so a right row AT
    // the left timestamp is visible to it), then __rid asc so the LAST row
    // carried forward at a tied right time is the greatest id.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
}
