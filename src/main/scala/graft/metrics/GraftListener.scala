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

  /** File metrics sink — the reference's OutputStreamReporter /
    * FileFailureEventReporter shape (gobblin-metrics-libs/
    * gobblin-metrics-base/.../reporter/OutputStreamReporter.java,
    * FileFailureEventReporter.java): action metrics land as one JSON
    * object per line in a file other tooling tails; failures
    * additionally land in a separate failure log. Atomic tmp+rename
    * per report (a torn half-written report is never visible), driver
    * -side metadata only.
    */
  def reportJsonLines(metrics: Seq[GraftListener#ActionMetrics], path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try {
      metrics.foreach { m =>
        val rows = m.outputRows.map(_.toString).getOrElse("null")
        out.write((s"""{"action":"${m.action}","duration_ns":${m.durationNs},""" +
          s""""output_rows":$rows,"failed":${m.failed}}""" + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    } finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"metrics report rename failed: $tmp -> $p")
  }
}
