package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the conversion helpers
  * `private[sql]` (`classic.ExpressionUtils`); this shim, compiled into the
  * `org.apache.spark.sql` package, re-exports just the two conversions the
  * engine's custom Catalyst expressions need. No Spark internals are
  * modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the async listener bus so `QueryExecutionListener` callbacks
    * (the `graft.*` cap metrics) are all delivered before a snapshot —
    * `SparkContext.listenerBus` is `private[spark]` and has no public
    * flush. Used once, at the end of the `graft.Verify` sweep.
    */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
