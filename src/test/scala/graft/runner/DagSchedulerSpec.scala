package graft.runner

import graft.SparkSpec
import graft.runner.DagScheduler._

class DagSchedulerSpec extends SparkSpec {

  private val conf = SchedulerConfig(slots = 4, userQuota = 4, groupQuota = 4)

  private def task(dag: String, name: String, deps: Seq[String] = Nil,
      dur: Int = 1, failAtt: Int = 0, maxAtt: Int = 2, submit: Long = 0,
      sla: Long = -1, fopt: String = "FINISH_ALL_POSSIBLE",
      user: String = "u", group: String = "g"): DagTask =
    DagTask(dag, name, user, group, deps, dur, failAtt, maxAtt, submit,
      sla, fopt)

  private def ev(es: Seq[SchedEvent], task: String): Seq[(Long, String)] =
    es.filter(_.task == task).map(e => (e.tick, e.event))

  test("unconstrained diamond runs in dependency order, one tick of latency per edge") {
    val es = schedule(Seq(
      task("d", "a"), task("d", "b", Seq("a")), task("d", "c", Seq("a")),
      task("d", "x", Seq("b", "c"))), conf)
    assert(ev(es, "a") == Seq((1L, "start"), (2L, "success")))
    // b and c see a's success at tick 3 (synchronous update: completions
    // publish one tick before dependents can launch)
    assert(ev(es, "b") == Seq((3L, "start"), (4L, "success")))
    assert(ev(es, "c") == Seq((3L, "start"), (4L, "success")))
    assert(ev(es, "x") == Seq((5L, "start"), (6L, "success")))
  }

  test("a failing attempt re-queues and the retry succeeds") {
    val es = schedule(Seq(task("d", "a", dur = 2, failAtt = 1)), conf)
    assert(ev(es, "a") == Seq((1L, "start"), (3L, "fail"),
      (4L, "start"), (6L, "success")))
    assert(es.filter(_.event == "fail").map(_.attempt) == Seq(1L))
    assert(es.filter(_.event == "success").map(_.attempt) == Seq(2L))
  }

  test("attempt exhaustion under FINISH_RUNNING cancels pending, lets running finish") {
    val es = schedule(Seq(
      task("d", "a", failAtt = 9, maxAtt = 2, fopt = "FINISH_RUNNING"),
      task("d", "slow", dur = 10, fopt = "FINISH_RUNNING"),
      task("d", "late", Seq("slow"), fopt = "FINISH_RUNNING")), conf)
    assert(ev(es, "a") == Seq((1L, "start"), (2L, "fail"), (3L, "start"),
      (4L, "fail")))
    // running sibling finishes; pending dependent cancels on the dag death
    assert(ev(es, "slow") == Seq((1L, "start"), (11L, "success")))
    assert(ev(es, "late") == Seq((5L, "cancelled")))
  }

  test("FINISH_ALL_POSSIBLE runs the independent branch and blocks only descendants") {
    val es = schedule(Seq(
      task("d", "a", failAtt = 9, maxAtt = 1),
      task("d", "kid", Seq("a")),
      task("d", "solo", submit = 3)), conf)
    assert(ev(es, "a") == Seq((1L, "start"), (2L, "fail")))
    assert(ev(es, "kid") == Seq((3L, "cancelled")))
    assert(ev(es, "solo") == Seq((3L, "start"), (4L, "success")))
  }

  test("user quota rejects the over-quota launch (permanent), slots make others wait") {
    // 3 same-user roots, quota 2, slots 3: the third LAUNCH quota-fails
    val es = schedule(Seq(
      task("d1", "a", dur = 5), task("d2", "a", dur = 5), task("d3", "a")),
      SchedulerConfig(slots = 3, userQuota = 2, groupQuota = 9))
    assert(es.filter(_.event == "quota_fail").map(_.dag) == Seq("d3"))
    // with one slot instead, launches serialize and NOBODY quota-fails;
    // a completion frees its slot for the NEXT tick (synchronous
    // update), so starts land every other tick
    val es1 = schedule(Seq(
      task("d1", "a"), task("d2", "a"), task("d3", "a")),
      SchedulerConfig(slots = 1, userQuota = 2, groupQuota = 9))
    assert(es1.count(_.event == "success") == 3)
    assert(!es1.exists(_.event == "quota_fail"))
    assert(es1.filter(_.event == "start").map(_.tick) == Seq(1L, 3L, 5L))
  }

  test("group quota binds across users") {
    val es = schedule(Seq(
      task("d1", "a", dur = 5, user = "u1"), task("d2", "a", dur = 5, user = "u2"),
      task("d3", "a", user = "u3")),
      SchedulerConfig(slots = 3, userQuota = 9, groupQuota = 2))
    assert(es.filter(_.event == "quota_fail").map(_.dag) == Seq("d3"))
  }

  test("SLA kills the running root mid-run and cancels the rest of the dag") {
    val es = schedule(Seq(
      task("d", "a", dur = 10, sla = 3), task("d", "b", Seq("a"), sla = 3)), conf)
    assert(ev(es, "a") == Seq((1L, "start"), (3L, "sla_kill")))
    assert(ev(es, "b") == Seq((3L, "cancelled")))
  }

  test("a schedule that cannot quiesce within the horizon fails loudly") {
    val e = intercept[IllegalArgumentException] {
      schedule(Seq(task("d", "a", dur = 99)), SchedulerConfig(4, 4, 4, horizon = 5))
    }
    assert(e.getMessage.contains("quiesce"))
  }

  test("duplicate task keys and unknown dependencies are rejected") {
    intercept[IllegalArgumentException] {
      schedule(Seq(task("d", "a"), task("d", "a")), conf)
    }
    intercept[IllegalArgumentException] {
      schedule(Seq(task("d", "a", Seq("ghost"))), conf)
    }
  }

  test("job.type=dag: properties-defined dag runs jobs under quota semantics and resumes") {
    val tmp = tmpDir("dagjob")
    graft.Tables.load(spark, sf(), "documents").limit(40)
      .write.mode("overwrite").parquet(s"$tmp/src")
    def jobFile(name: String, pred: String): String = {
      val path = s"$tmp/$name.properties"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""job.name=$name
           |source.path=$tmp/src
           |source.watermark.column=doc_id
           |ops=filter
           |op.filter.predicate=$pred
           |sink.staging=$tmp/staging_$name
           |sink.output=$tmp/out_$name
           |state.dir=$tmp/jobstate
           |""".stripMargin)
      path
    }
    val master = JobConfig.parse(
      s"""job.type=dag
         |dag.state.dir=$tmp/dagstate
         |scheduler.slots=2
         |scheduler.userQuota=1
         |scheduler.groupQuota=9
         |dag.f.extract.job=${jobFile("extract", "doc_id < 20")}
         |dag.f.load.job=${jobFile("load", "doc_id < 5")}
         |dag.f.load.dependsOn=extract
         |dag.g.only.job=${jobFile("only", "doc_id < 10")}
         |dag.g.only.user=other
         |""".stripMargin)
    val r1 = JobConfig.runAny(spark, master)
    assert(r1("tasks") == "3" && r1("ran") == "3" && r1("succeeded") == "3")
    assert(r1("quota_failed") == "0" && r1("failed") == "0")
    assert(spark.read.parquet(s"$tmp/out_load").count() == 5)
    assert(spark.read.parquet(s"$tmp/out_only").count() == 10)
    // rerun: everything resumes off the dag state store
    val r2 = JobConfig.runAny(spark, master)
    assert(r2("ran") == "0" && r2("skipped") == "3")
    // same-user dags under userQuota=1: the second LAUNCH quota-fails
    val clash = JobConfig.parse(
      s"""job.type=dag
         |dag.state.dir=$tmp/dagstate2
         |scheduler.slots=2
         |scheduler.userQuota=1
         |scheduler.groupQuota=9
         |dag.a.t.job=${jobFile("qa", "doc_id < 3")}
         |dag.a.t.duration=5
         |dag.b.t.job=${jobFile("qb", "doc_id < 3")}
         |""".stripMargin)
    val r3 = JobConfig.runAny(spark, clash)
    assert(r3("quota_failed") == "1" && r3("succeeded") == "1", r3.toString)
  }

  test("executeScheduled runs real jobs in trace order and resumes past completions") {
    import org.apache.spark.sql.functions._
    val tmp = tmpDir("dagsched")
    graft.Tables.load(spark, sf(), "documents").limit(50)
      .write.mode("overwrite").parquet(s"$tmp/src")
    def job(out: String) = JobConfig.parse(
      s"""job.name=$out
         |source.path=$tmp/src
         |source.watermark.column=doc_id
         |ops=filter
         |op.filter.predicate=doc_id < 10
         |sink.staging=$tmp/staging_$out
         |sink.output=$tmp/out_$out
         |state.dir=$tmp/jobstate
         |""".stripMargin)
    val wl = Seq(
      (task("f", "first"), job("first")),
      (task("f", "second", Seq("first")), job("second")))
    val store = new graft.state.FsStateStore(s"$tmp/state",
      spark.sparkContext.hadoopConfiguration)
    val r1 = DagScheduler.executeScheduled(spark, store, wl, conf)
    assert(r1 == Seq("f/first" -> "ran", "f/second" -> "ran"))
    assert(spark.read.parquet(s"$tmp/out_second").count() == 10)
    // a rerun touches nothing: both completions are on record
    val r2 = DagScheduler.executeScheduled(spark, store, wl, conf)
    assert(r2 == Seq("f/first" -> "skipped", "f/second" -> "skipped"))
  }

  test("executeScheduled resumes off LEGACY un-suffixed completion keys") {
    // a store written before the per-attempt key format (`dag/task`
    // with no #attempt suffix) must still be recognized on attempt 1
    import org.apache.spark.sql.functions._
    val tmp = tmpDir("dagsched_legacy")
    graft.Tables.load(spark, sf(), "documents").limit(20)
      .write.mode("overwrite").parquet(s"$tmp/src")
    val job = JobConfig.parse(
      s"""job.name=legacy
         |source.path=$tmp/src
         |source.watermark.column=doc_id
         |ops=filter
         |op.filter.predicate=doc_id < 10
         |sink.staging=$tmp/staging
         |sink.output=$tmp/out
         |state.dir=$tmp/jobstate
         |""".stripMargin)
    val store = new graft.state.FsStateStore(s"$tmp/state",
      spark.sparkContext.hadoopConfiguration)
    store.put("dagsched", "f/only", Map("status" -> "done")) // legacy key
    val r = DagScheduler.executeScheduled(spark, store,
      Seq((task("f", "only"), job)), conf)
    assert(r == Seq("f/only" -> "skipped"))
  }
}
