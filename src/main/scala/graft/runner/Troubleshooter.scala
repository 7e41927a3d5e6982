package graft.runner

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Automatic troubleshooter: failures classified into deduplicated,
  * bounded, severity-ranked ISSUES a platform can act on.
  *
  * Reference semantics re-expressed
  * (gobblin-runtime/.../troubleshooter/Issue.java:39-81,
  * InMemoryIssueRepository.java:42-111,
  * InMemoryMultiContextIssueRepository.java,
  * DefaultIssueRefinery.java:36-59, TroubleshooterUtils.java:30-32, and
  * gobblin-modules/gobblin-troubleshooter/
  * AutoTroubleshooterLogAppender.java:45-110):
  *
  *   - an issue's CODE identifies the problem class: explicit when the
  *     exception carries one (ThrowableWithErrorCode), otherwise
  *     "T" + first 6 hex of sha256(exception class + stack trace) —
  *     same failure site => same code across tasks and runs;
  *   - a repository keeps the FIRST issue per code (duplicates
  *     discarded) and is size-bounded so an issue storm cannot OOM the
  *     driver — at most maxSize distinct codes, O(config) driver state
  *     no matter how many tasks fail;
  *   - contexts (flowGroup:flowName:flowExecutionId:jobName) isolate
  *     concurrent jobs sharing one driver;
  *   - refine() orders severity-desc then time-asc, drops WARN-and-
  *     below noise from known-chatty sources (kafka clients), and
  *     moves metrics-subsystem issues to the bottom.
  *
  * The reference attaches via a log4j appender; a Spark driver owns
  * its job loop, so the equivalent seam here is explicit: wrap a job
  * in [[guarded]] and/or [[report]] issues directly.
  */
object Troubleshooter {

  sealed abstract class Severity(val rank: Int, val name: String)
  object Severity {
    case object Debug extends Severity(0, "DEBUG")
    case object Info extends Severity(1, "INFO")
    case object Warn extends Severity(2, "WARN")
    case object Error extends Severity(3, "ERROR")
    case object Fatal extends Severity(4, "FATAL")
  }

  final case class Issue(
      timeMs: Long,
      severity: Severity,
      code: String,
      summary: String,
      details: String,
      sourceClass: String,
      exceptionClass: String,
      properties: Map[String, String] = Map.empty)

  /** Exceptions that carry their own stable issue code (ref
    * ThrowableWithErrorCode) — coded failures skip the stack hash.
    */
  trait WithErrorCode { def errorCode: String }

  class CodedException(val errorCode: String, msg: String,
      cause: Throwable = null)
    extends RuntimeException(msg, cause) with WithErrorCode

  private def sha256Hex(text: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** "T" + 6 uppercase hex chars (ref AutoTroubleshooterLogAppender
    * AUTO_GENERATED_HASH_PREFIX/LENGTH).
    */
  private[runner] def autoCode(text: String): String =
    "T" + sha256Hex(text).substring(0, 6).toUpperCase

  private def stackTraceOf(t: Throwable): String = {
    val sw = new java.io.StringWriter()
    t.printStackTrace(new java.io.PrintWriter(sw))
    sw.toString
  }

  /** Innermost cause (cycle-guarded, as commons-lang does). */
  def rootCause(t: Throwable): Throwable = {
    val seen = mutable.Set.empty[Throwable]
    var cur = t
    while (cur.getCause != null && seen.add(cur)) cur = cur.getCause
    cur
  }

  /** Exception classes + stack FRAMES of the whole cause chain,
    * WITHOUT messages: the reference hashes getStackTrace output,
    * which embeds messages, so a storm of one failure site with
    * varying messages ("file X missing", "file Y missing") mints a
    * new code per message and floods the bounded repository —
    * excluding messages is a deliberate fix, keeping "same site =>
    * same code" true by construction.
    */
  private def codeBasis(t: Throwable): String = {
    val sb = new StringBuilder
    val seen = mutable.Set.empty[Throwable]
    var cur = t
    while (cur != null && seen.add(cur)) {
      sb.append(cur.getClass.getName).append('\n')
      cur.getStackTrace.foreach { f =>
        sb.append(f.getClassName).append('.').append(f.getMethodName)
          .append(':').append(f.getLineNumber).append('\n')
      }
      cur = cur.getCause
    }
    sb.toString
  }

  /** Issue code for a throwable: explicit error code when present,
    * otherwise the class+frames hash (same site => same code, even
    * when messages vary per task).
    */
  def issueCode(t: Throwable): String = t match {
    case c: WithErrorCode => c.errorCode
    case _ => autoCode(codeBasis(t))
  }

  /** Build an issue from a throwable. Summary = root-cause short
    * message + the reporter's context message (ref convertToIssue:
    * getRootCauseMessage + " | " + rendered message).
    */
  def fromThrowable(t: Throwable, sourceClass: String, message: String,
      severity: Severity = Severity.Error, timeMs: Long = 0L): Issue = {
    val root = rootCause(t)
    val rootMsg =
      s"${root.getClass.getSimpleName}: ${Option(root.getMessage).getOrElse("")}"
        .linesIterator.next()
    Issue(
      timeMs = timeMs,
      severity = severity,
      code = issueCode(t),
      summary = s"$rootMsg | $message",
      details = stackTraceOf(t),
      sourceClass = sourceClass,
      exceptionClass = t.getClass.getName)
  }

  /** Bounded, first-wins-per-code issue store (ref
    * InMemoryIssueRepository): when full, NEW codes are ignored (the
    * earliest issues are usually the root cause; an overflowing storm
    * must not evict them), and repeated codes are always discarded.
    */
  final class IssueRepository(val maxSize: Int = 100) {
    private val issues = mutable.LinkedHashMap.empty[String, Issue]

    def put(issue: Issue): Unit = synchronized {
      if (issues.size < maxSize && !issues.contains(issue.code))
        issues.put(issue.code, issue)
    }
    def putAll(is: Iterable[Issue]): Unit = is.foreach(put)
    def getAll: List[Issue] = synchronized { issues.values.toList }
    def remove(code: String): Unit = synchronized { issues.remove(code) }
    def removeAll(): Unit = synchronized { issues.clear() }
    def replaceAll(is: Iterable[Issue]): Unit = synchronized {
      issues.clear(); putAll(is)
    }
    /** Refine in place (ref AutomaticTroubleshooterImpl.refineIssues). */
    def refineInPlace(): Unit = replaceAll(refine(getAll))
  }

  /** Per-context repositories (ref InMemoryMultiContextIssueRepository):
    * concurrent jobs in one driver keep separate bounded stores.
    */
  final class MultiContextIssueRepository(val maxSizePerContext: Int = 100) {
    private val repos = mutable.LinkedHashMap.empty[String, IssueRepository]

    def repo(contextId: String): IssueRepository = synchronized {
      repos.getOrElseUpdate(contextId, new IssueRepository(maxSizePerContext))
    }
    def put(contextId: String, issue: Issue): Unit = repo(contextId).put(issue)
    def getAll(contextId: String): List[Issue] = repo(contextId).getAll
    def contexts: List[String] = synchronized { repos.keys.toList }
  }

  /** ref TroubleshooterUtils.getContextIdForJob. */
  def contextIdForJob(flowGroup: String, flowName: String,
      flowExecutionId: String, jobName: String): String =
    s"$flowGroup:$flowName:$flowExecutionId:$jobName"

  /** DefaultIssueRefinery: severity desc then time asc; WARN-and-below
    * from kafka client sources dropped; metrics-subsystem issues moved
    * to the bottom (stable).
    */
  def refine(issues: Seq[Issue]): List[Issue] = {
    def containsIgnoreCase(s: String, sub: String) =
      s != null && s.toLowerCase.contains(sub.toLowerCase)
    val sorted = issues.sortBy(i => (-i.severity.rank, i.timeMs)).toList
    val kept = sorted.filterNot(i =>
      i.severity.rank <= Severity.Warn.rank &&
        (containsIgnoreCase(i.sourceClass, "org.apache.kafka") ||
          containsIgnoreCase(i.sourceClass, "com.linkedin.kafka")))
    val (metrics, rest) =
      kept.partition(i => containsIgnoreCase(i.sourceClass, ".metrics"))
    rest ++ metrics
  }

  /** Run a job body, converting any throwable into an ERROR issue in
    * the context's repository (the log-appender seam, made explicit).
    * The failure is captured, not swallowed — callers get it back as
    * the Left so job control flow (skip, retry, abort) stays theirs.
    */
  def guarded[A](repo: MultiContextIssueRepository, contextId: String,
      sourceClass: String, message: String)(body: => A): Either[Issue, A] =
    try Right(body)
    catch {
      case t: Throwable if !t.isInstanceOf[InterruptedException] =>
        val issue = fromThrowable(t, sourceClass, message,
          timeMs = System.currentTimeMillis())
        repo.put(contextId, issue)
        Left(issue)
    }

  /** Spark-native equivalent of the reference's log-appender seam
    * (AutoTroubleshooterLogAppender attaches to log4j; a Spark driver
    * owns a listener bus instead): task failures surface as
    * ExceptionFailure end reasons and classify into issues. Codes
    * stay stable across attempts/partitions (same site, same code),
    * so a 1000-task failure storm collapses to one issue per cause —
    * the repository bound does the rest. Register around a job with
    * `sc.addSparkListener` / `removeSparkListener`.
    */
  private def issueFromExceptionFailure(
      ef: org.apache.spark.ExceptionFailure): Issue =
    ef.exception match {
      case Some(t) =>
        fromThrowable(t, "spark.task", "task failure",
          timeMs = System.currentTimeMillis())
      case None => // exception not preserved (e.g. unserializable)
        Issue(System.currentTimeMillis(), Severity.Error,
          autoCode(ef.className + ef.description),
          s"${ef.className}: ${ef.description} | task failure",
          ef.toErrorString, "spark.task", ef.className)
    }

  final class TaskFailureIssueListener(
      repo: MultiContextIssueRepository, contextId: String)
    extends org.apache.spark.scheduler.SparkListener {

    override def onTaskEnd(
        taskEnd: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      taskEnd.reason match {
        case ef: org.apache.spark.ExceptionFailure =>
          repo.put(contextId, issueFromExceptionFailure(ef))
        case _ => ()
      }
  }

  /** Job-group-scoped variant: ONE listener serves a whole run of
    * sequential (or concurrent) jobs. Tag each job with its issue
    * context via `sc.setJobGroup(contextId, ...)`; `onJobStart`
    * records which stages belong to which group, and a task failure is
    * attributed to its stage's OWNING context no matter when the async
    * listener bus delivers it. This replaces the per-job attach/remove
    * dance, which is inherently racy: a straggler ExceptionFailure
    * from job N can arrive after job N+1's listener was attached and
    * be filed under the wrong context (observed as a duplicate issue
    * in an otherwise-healthy context). Stage ids are globally unique
    * per SparkContext, so late events for unknown stages (other
    * suites' jobs) are dropped, not misattributed.
    */
  final class JobGroupIssueListener(repo: MultiContextIssueRepository)
    extends org.apache.spark.scheduler.SparkListener {

    private val stageToContext =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()

    override def onJobStart(
        jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val group = Option(jobStart.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      group.foreach { g =>
        jobStart.stageIds.foreach(sid => stageToContext.put(sid, g))
      }
    }

    override def onTaskEnd(
        taskEnd: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      taskEnd.reason match {
        case ef: org.apache.spark.ExceptionFailure =>
          Option(stageToContext.get(taskEnd.stageId))
            .foreach(ctx => repo.put(ctx, issueFromExceptionFailure(ef)))
        case _ => ()
      }
  }

  /** Refined issues across all contexts as a DataFrame — the
    * reportJobIssuesAsEvents surface (IssueEventBuilder tracking
    * events), emitted as rows instead. `ord` is the refined rank
    * within the context. Driver state here is O(contexts * maxSize)
    * by construction — never proportional to task or record count.
    */
  def toDf(spark: SparkSession, repo: MultiContextIssueRepository): DataFrame = {
    import spark.implicits._
    repo.contexts
      .flatMap { ctx =>
        refine(repo.getAll(ctx)).zipWithIndex.map { case (i, ord) =>
          (ctx, ord.toLong, i.code, i.severity.name, i.summary,
            i.sourceClass, i.exceptionClass, i.timeMs)
        }
      }
      .toDF("context", "ord", "code", "severity", "summary",
        "source_class", "exception_class", "time_ms")
  }
}
