package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability: a QueryExecutionListener that records one
  * summary per completed action — duration, row counts from the
  * executed plan's SQL metrics, and shuffle volume. This is the hook a
  * production deployment feeds into its metrics system; here it backs
  * assertions in tests and ad-hoc inspection.
  *
  * (Listener callbacks run on the driver after the action completes —
  * no per-row overhead, no executor-side state.)
  */
class MetricsListener extends QueryExecutionListener {

  final case class QueryMetrics(
      funcName: String,
      durationNs: Long,
      outputRows: Long,
      shuffleBytesWritten: Long,
      failed: Boolean)

  private val log = new ConcurrentLinkedQueue[QueryMetrics]()

  def snapshot: Seq[QueryMetrics] = log.iterator().asScala.toSeq
  def clear(): Unit = log.clear()

  private def collect(qe: QueryExecution, funcName: String,
      durationNs: Long, failed: Boolean): Unit = {
    var outRows = -1L
    var shuffleBytes = 0L
    // AdaptiveSparkPlanExec/QueryStageExec report no children — descend
    // into their materialized plans explicitly or the walk sees only
    // the root.
    def walk(node: org.apache.spark.sql.execution.SparkPlan): Unit = {
      node.metrics.get("numOutputRows").foreach { m =>
        if (outRows < 0) outRows = m.value // root-most node's row count
      }
      node.metrics.get("shuffleBytesWritten").foreach(m => shuffleBytes += m.value)
      node match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case _ => node.children.foreach(walk)
      }
    }
    walk(qe.executedPlan)
    log.add(QueryMetrics(funcName, durationNs, outRows, shuffleBytes, failed))
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    collect(qe, funcName, durationNs, failed = false)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    collect(qe, funcName, 0L, failed = true)
}

object MetricsListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
