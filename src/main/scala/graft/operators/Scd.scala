package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance over a change log.
  *
  * The reference's sinks overwrite documents in place (`es_common.py`
  * index/update — type-1 semantics: history is lost). A training-data
  * pipeline needs the type-2 form: every attribute change opens a new
  * validity interval `[valid_from, valid_to)` and closes the previous
  * one, so any historical corpus snapshot can be reconstructed.
  *
  * Two entry points with one contract:
  *  - [[fold]] builds the dimension from a full log in one pass: a
  *    per-key window marks change points (`attr != lag(attr)`), a second
  *    `lead` over the SAME (partition, order) closes each interval — one
  *    shuffle + one sort total, Catalyst coalesces both windows.
  *  - [[merge]] advances an existing dimension by one log batch without
  *    re-reading history: only OPEN rows (valid_to IS NULL) can be
  *    touched, closed history is streamed through untouched. IncrementalSpec
  *    pins `fold(log) == merge(fold(prefix), suffix)` — the re-ingestion
  *    story at 100 TB, where the full log is never rescanned.
  *
  * Ties on `ts` are broken by `idCol` (same convention as sessionize /
  * as-of: the log's unique id makes the fold deterministic).
  */
object Scd {

  /** `(key, attr, valid_from, valid_to)` — `valid_to` NULL = current row. */
  def fold(log: DataFrame, keyCol: String, tsCol: String,
      idCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    log
      .select(col(keyCol), col(tsCol), col(idCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // first row of a key is always a change point; later rows only when
      // the attribute really moved (null-safe: attr can itself be null,
      // and merge's seed rows carry a NULL id — row_number, not lag(id),
      // is the first-row marker)
      .filter(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Advance `dim` (a [[fold]] result) by one new log batch. Every batch
    * row must be at-or-after its key's open `valid_from` (out-of-order
    * arrivals across batch boundaries are a replay, not a merge).
    */
  def merge(dim: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      idCol: String, attrCol: String): DataFrame = {
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"))
    // seed each key's batch fold with its open row (a pseudo log record at
    // the open row's valid_from), so an unchanged attribute extends the
    // open interval instead of opening a duplicate one
    val seeded = open
      .select(col(keyCol), col("valid_from").as(tsCol),
        lit(null).cast(batch.schema(idCol).dataType).as(idCol), col(attrCol))
      .unionByName(batch.select(col(keyCol), col(tsCol), col(idCol), col(attrCol)))
    // NULL id sorts first at equal ts, so the seed precedes same-ts events
    fold(seeded, keyCol, tsCol, idCol, attrCol)
      .unionByName(closed)
  }

  /** Interval summary used by the oracle query: per-attribute interval
    * counts and closed-interval duration statistics.
    */
  def summary(dim: DataFrame, attrCol: String, tsUnit: Column => Column): DataFrame =
    dim.groupBy(col(attrCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"),
        sum(when(col("valid_to").isNotNull,
          tsUnit(col("valid_to")) - tsUnit(col("valid_from")))).as("closed_ms"))
      .orderBy(col(attrCol))
}
