package graft.runner

import graft.SparkSpec
import graft.runner.Troubleshooter._

class TroubleshooterSpec extends SparkSpec {

  private def issue(code: String, sev: Severity = Severity.Error,
      src: String = "graft.test", t: Long = 0L) =
    Issue(t, sev, code, s"summary $code", "details", src, "java.lang.Exception")

  test("auto code: T + 6 uppercase hex, deterministic per site") {
    def boom(): Throwable =
      try { throw new IllegalStateException("x"); }
      catch { case t: Throwable => t }
    def boom2(): Throwable =
      try { throw new IllegalStateException("x"); }
      catch { case t: Throwable => t }
    // same call site, same class => same code across instances
    val Seq(a, b) = (1 to 2).map(_ => boom())
    assert(issueCode(a).matches("T[0-9A-F]{6}"))
    assert(issueCode(a) === issueCode(b))
    // a different throw site (different stack) hashes differently
    assert(issueCode(boom2()) !== issueCode(a))
  }

  test("same site with VARYING messages still yields one code (storm collapse)") {
    def boom(i: Int): Throwable =
      try { throw new java.io.IOException(s"file part-$i.parquet missing") }
      catch { case t: Throwable => t }
    val codes = (1 to 5).map(i => issueCode(boom(i))).toSet
    assert(codes.size === 1, s"message-varying storm minted codes: $codes")
    // wrapped causes participate in the site identity, messages don't
    def wrapped(i: Int): Throwable =
      try { throw new RuntimeException(s"run $i", boom(i)) }
      catch { case t: Throwable => t }
    assert((1 to 3).map(i => issueCode(wrapped(i))).toSet.size === 1)
  }

  test("explicit error code wins over the hash") {
    val t = new CodedException("GRAFT_X", "msg")
    assert(issueCode(t) === "GRAFT_X")
  }

  test("summary carries the ROOT cause, not the wrapper") {
    val t = new RuntimeException("outer",
      new java.io.IOException("disk gone"))
    val i = fromThrowable(t, "graft.src", "while publishing")
    assert(i.summary === "IOException: disk gone | while publishing")
    assert(i.exceptionClass === "java.lang.RuntimeException")
    assert(i.details.contains("disk gone"))
  }

  test("rootCause is cycle-safe") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b) // a -> b -> a cycle
    assert(rootCause(b) ne null) // terminates
  }

  test("repository: first issue per code wins, duplicates discarded") {
    val r = new IssueRepository()
    r.put(issue("C1").copy(summary = "first"))
    r.put(issue("C1").copy(summary = "second"))
    assert(r.getAll.map(_.summary) === List("first"))
  }

  test("repository is bounded: new codes ignored when full") {
    val r = new IssueRepository(maxSize = 3)
    (1 to 5).foreach(i => r.put(issue(s"C$i")))
    assert(r.getAll.map(_.code) === List("C1", "C2", "C3"))
  }

  test("remove / removeAll / replaceAll") {
    val r = new IssueRepository()
    r.putAll(Seq(issue("A"), issue("B")))
    r.remove("A")
    assert(r.getAll.map(_.code) === List("B"))
    r.replaceAll(Seq(issue("Z")))
    assert(r.getAll.map(_.code) === List("Z"))
    r.removeAll()
    assert(r.getAll.isEmpty)
  }

  test("refine: severity desc then time asc") {
    val out = refine(Seq(
      issue("W", Severity.Warn, t = 1),
      issue("E2", Severity.Error, t = 2),
      issue("E1", Severity.Error, t = 1),
      issue("F", Severity.Fatal, t = 9)))
    assert(out.map(_.code) === List("F", "E1", "E2", "W"))
  }

  test("refine: kafka WARN dropped, kafka ERROR kept") {
    val out = refine(Seq(
      issue("KW", Severity.Warn, src = "org.apache.kafka.clients.NetworkClient"),
      issue("KE", Severity.Error, src = "org.apache.kafka.clients.Consumer"),
      issue("G", Severity.Warn, src = "graft.runner.JobRunner")))
    assert(out.map(_.code) === List("KE", "G"))
  }

  test("refine: metrics issues move to the bottom, order stable") {
    val out = refine(Seq(
      issue("M", Severity.Error, src = "graft.metrics.GraftListener", t = 1),
      issue("E", Severity.Error, src = "graft.runner.JobRunner", t = 2),
      issue("I", Severity.Info, src = "graft.runner.JobRunner", t = 3)))
    assert(out.map(_.code) === List("E", "I", "M"))
  }

  test("multi-context isolation and context id format") {
    assert(contextIdForJob("g", "f", "7", "j") === "g:f:7:j")
    val m = new MultiContextIssueRepository()
    m.put("ctx1", issue("A"))
    m.put("ctx2", issue("B"))
    assert(m.getAll("ctx1").map(_.code) === List("A"))
    assert(m.getAll("ctx2").map(_.code) === List("B"))
    assert(m.contexts === List("ctx1", "ctx2"))
  }

  test("guarded captures the failure as an ERROR issue and returns it") {
    val m = new MultiContextIssueRepository()
    val res = Troubleshooter.guarded(m, "ctx", "graft.src", "ingest run") {
      throw new CodedException("GRAFT_SOURCE_MISSING", "no input")
    }
    assert(res.isLeft)
    val got = m.getAll("ctx")
    assert(got.map(_.code) === List("GRAFT_SOURCE_MISSING"))
    assert(got.head.severity === Severity.Error)
    // a retry failing the same way does not duplicate
    Troubleshooter.guarded(m, "ctx", "graft.src", "ingest run") {
      throw new CodedException("GRAFT_SOURCE_MISSING", "no input")
    }
    assert(m.getAll("ctx").size === 1)
    // success path passes the value through untouched
    assert(Troubleshooter.guarded(m, "ctx", "s", "m")(42) === Right(42))
  }

  test("task-failure listener classifies executor failures into deduped issues") {
    val m = new MultiContextIssueRepository()
    val listener = new TaskFailureIssueListener(m, "job:ctx")
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      intercept[org.apache.spark.SparkException] {
        spark.range(0, 8, 1, numPartitions = 4).as[Long].mapPartitions { it =>
          throw new CodedException("GRAFT_TASK_BOOM", "planted task failure")
          it
        }.count()
      }
      // listener bus is async: wait for the event to land
      val deadline = System.currentTimeMillis() + 15000
      while (m.getAll("job:ctx").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val got = m.getAll("job:ctx")
      // several tasks may fail before the job cancels, but they share
      // the code -> first wins, exactly one issue
      assert(got.map(_.code) === List("GRAFT_TASK_BOOM"))
      assert(got.head.severity === Severity.Error)
      assert(got.head.exceptionClass.contains("CodedException"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("job-group listener attributes failures to the owning context, drops unknown stages") {
    val m = new MultiContextIssueRepository()
    val listener = new Troubleshooter.JobGroupIssueListener(m)
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      // context A: a job whose tasks really fail on executors
      spark.sparkContext.setJobGroup("grp:A", "failing", interruptOnCancel = false)
      intercept[org.apache.spark.SparkException] {
        spark.range(0, 8, 1, numPartitions = 4).as[Long].mapPartitions { it =>
          throw new CodedException("GRAFT_GROUP_BOOM", "planted")
          it
        }.count()
      }
      // context B attached IMMEDIATELY after — any straggler task-end
      // from A's stages must still land in A, never B
      spark.sparkContext.setJobGroup("grp:B", "healthy", interruptOnCancel = false)
      spark.range(0, 8, 1, numPartitions = 4).count()
      spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis() + 15000
      while (m.getAll("grp:A").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(m.getAll("grp:A").map(_.code) === List("GRAFT_GROUP_BOOM"))
      assert(m.getAll("grp:B").isEmpty, "straggler misattributed to grp:B")
      // events for stages the listener never saw a job-start for are dropped
      listener.onTaskEnd(org.apache.spark.scheduler.SparkListenerTaskEnd(
        stageId = 999999, stageAttemptId = 0, taskType = "ResultTask",
        reason = new org.apache.spark.ExceptionFailure(
          "java.lang.RuntimeException", "orphan", Array.empty, "", None),
        taskInfo = null, taskExecutorMetrics = null, taskMetrics = null))
      assert(m.contexts.toSet === Set("grp:A", "grp:B"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("toDf emits refined per-context rows with rank") {
    val m = new MultiContextIssueRepository()
    m.put("c1", issue("W", Severity.Warn, t = 5))
    m.put("c1", issue("E", Severity.Error, t = 9))
    val rows = Troubleshooter.toDf(spark, m)
      .select("context", "ord", "code", "severity")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("c1", 0L, "E", "ERROR"), ("c1", 1L, "W", "WARN")))
  }
}
