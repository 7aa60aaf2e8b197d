package graft.tools

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Fleet-wide visibility for every bounded-coverage cap in the engine
  * (the no-silent-caps convention): the cap sites — MinHash bucket caps,
  * embedding block drop/sub-block policies, the streaming semantic store
  * cap — each attach an `observe` metric named `graft.*` to the pass that
  * computes the bucket size, costing zero extra jobs. This listener
  * collects those metrics across EVERY query run on the session, so an
  * operator (or a test) can answer "did any cap fire today, and how much
  * did it drop?" without instrumenting call sites one by one.
  *
  * Register once per session: `CapMetricsListener.register(spark)`.
  * Totals accumulate per metric name+column; `snapshot` returns them,
  * `reset` clears. Thread-safe (listener callbacks arrive on the
  * listener bus thread; queries may complete concurrently).
  */
class CapMetricsListener extends QueryExecutionListener {

  private val totals = new ConcurrentHashMap[String, Long]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith("graft.")) {
        row.schema.fieldNames.foreach { f =>
          row.getAs[Any](f) match {
            case n: Number =>
              // one counter per (metric, column), summed across queries;
              // the per-call unique suffix (capBuckets.<key>.<n>) is folded
              // away so repeated stages aggregate into one line
              val key = name.replaceAll("\\.\\d+$", "") + ":" + f
              totals.merge(key, n.longValue(), (a, b) => a + b)
            case _ => ()
          }
        }
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

  /** Accumulated totals keyed `<metric-name>:<column>`. */
  def snapshot: Map[String, Long] = totals.asScala.toMap

  def reset(): Unit = totals.clear()
}

object CapMetricsListener {
  /** Create, register, and return a listener for this session. */
  def register(spark: SparkSession): CapMetricsListener = {
    val l = new CapMetricsListener
    spark.listenerManager.register(l)
    l
  }
}
