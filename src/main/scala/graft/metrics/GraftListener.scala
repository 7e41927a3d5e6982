package graft.metrics

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-action metrics — the reference's instrumented-construct
  * decorators (gobblin-core-base/.../instrumented/: records in/out,
  * timers per Converter/Writer) collapse into one
  * QueryExecutionListener: every Spark action already carries output
  * row counts and per-operator SQL metrics; this listener snapshots
  * them with zero per-record cost (vs. the reference's per-record
  * meter updates — see BASELINE.md metrics QPS table).
  */
final class GraftListener extends QueryExecutionListener {

  final case class ActionMetrics(
      action: String, durationNs: Long, outputRows: Option[Long], failed: Boolean)

  private val events = new ConcurrentLinkedQueue[ActionMetrics]()

  def snapshot: Seq[ActionMetrics] = {
    val it = events.iterator()
    val out = scala.collection.mutable.ArrayBuffer[ActionMetrics]()
    while (it.hasNext) out += it.next()
    out.toSeq
  }

  def clear(): Unit = events.clear()

  private def outputRows(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    events.add(ActionMetrics(funcName, durationNs, outputRows(qe), failed = false))

  override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
    events.add(ActionMetrics(funcName, 0L, None, failed = true))
}

object GraftListener {
  def install(spark: SparkSession): GraftListener = {
    val l = new GraftListener
    spark.listenerManager.register(l)
    l
  }
}
