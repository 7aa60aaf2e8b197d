package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two keyed snapshots of the same table.
  *
  * The reference decides "changed vs already-processed" one document at a
  * time — an ES mget per batch slice (`ingester/es_common.py:254-271`) —
  * which at 100 TB is one RPC per key. The set-wise replacement is a
  * single full-outer join on the key: every key present only in `after`
  * is an insert, only in `before` a delete, in both with different
  * payloads an update. The payload comparison is ONE null-safe struct
  * equality (`<=>` over a packed struct), not N per-column predicates, so
  * it stays inside whole-stage codegen regardless of column count.
  *
  * Scale shape: one shuffle of each side on the key — the minimum for
  * arbitrary inputs. Snapshots that live in bucketed stores
  * ([[graft.sources.Sinks.writeBucketed]]) on the same key join
  * exchange-free; SinksLayoutSpec pins that plan shape for the general
  * join and it applies unchanged here.
  */
object ChangeCapture {

  /** Diff rows: key columns + `change` ('insert' | 'update' | 'delete').
    * Both snapshots must share the key columns; payload = every `after`
    * column that is not a key (schema drift between snapshots is a schema
    * migration, not CDC — caller aligns columns first).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = after.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "snapshotDiff needs at least one non-key column")
    val b = before.select(
      (keyCols.map(col) :+ struct(payload.map(col): _*).as("__b")): _*)
    val a = after.select(
      (keyCols.map(col) :+ struct(payload.map(col): _*).as("__a")): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(col("__b").isNull && col("__a").isNotNull, lit("insert"))
          .when(col("__a").isNull && col("__b").isNotNull, lit("delete"))
          .when(!(col("__a") <=> col("__b")), lit("update")))
      .filter(col("change").isNotNull)
      .select((keyCols.map(col) :+ col("change")): _*)
  }
}
