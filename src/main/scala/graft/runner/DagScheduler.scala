package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-tenant dag scheduling — the reference's DagManager semantics
  * (gobblin-service/.../orchestration/DagManager.java: the
  * DagManagerThread advancing dag nodes whose parents finished,
  * per-user/per-group launch quotas via UserQuotaManager.java —
  * exceeding a quota FAILS the node with QuotaExceededException
  * rather than queueing it — flow-SLA kills
  * (DagManagerUtils.getFlowSLA), flow.failure.option =
  * FINISH_RUNNING | FINISH_ALL_POSSIBLE on node failure, and bounded
  * job retries) re-expressed as a DETERMINISTIC virtual-time engine.
  *
  * The transition rule is synchronous (Gauss–Jacobi): every decision
  * at tick t+1 reads only the COMPLETE state snapshot at tick t —
  * completions free their slot for the next tick, cancellations
  * propagate one dep-edge per tick, and within-tick launch order is
  * the total order (dag submit tick, dag name, task name). That makes
  * the whole schedule a pure function of the workload, replayable row
  * for row by a SQL recursive CTE (the oracle does exactly that), and
  * independent of any wall clock or thread interleaving.
  *
  * Per tick, in rule order (first match wins per task):
  *   1. a running task whose end tick arrives completes: it succeeds
  *      once its attempt number exceeds its planted failing-attempt
  *      count, fails permanently when attempts are exhausted, and
  *      otherwise re-queues with attempt+1;
  *   2. a dag past its SLA (submit + slaTicks <= t) kills its running
  *      tasks and cancels its pending ones;
  *   3. a pending task cancels when any dependency is dead, or — under
  *      FINISH_RUNNING — when ANY task of its dag is dead;
  *   4. pending tasks with all dependencies succeeded launch in
  *      priority order into the free slots (slots - running); each
  *      LAUNCH is then quota-checked (running_user + launch rank
  *      within user <= userQuota, same per group) — a launch that
  *      exceeds quota fails permanently as `quota_fail` and its slot
  *      is consumed for the tick (the dispatch happened; the quota
  *      manager rejected it — the reference's launch-time check).
  *
  * Everything here is O(dags × tasks × ticks) driver-side metadata;
  * the data movement lives in the jobs the schedule drives (see
  * [[executeScheduled]]).
  */
object DagScheduler {

  /** One dag node, with its dag's attributes flattened on (the
    * workload row shape — mirrors the oracle's task table).
    * `slaTicks < 0` means no SLA; `failAttempts` is the number of
    * leading attempts that fail (deterministic simulated failure);
    * `failureOption` is FINISH_RUNNING or FINISH_ALL_POSSIBLE.
    */
  final case class DagTask(dag: String, task: String, user: String, group: String,
      dependsOn: Seq[String], duration: Int, failAttempts: Int, maxAttempts: Int,
      submitTick: Long, slaTicks: Long, failureOption: String) {
    require(duration >= 1, s"$dag/$task: duration must be >= 1")
    require(maxAttempts >= 1, s"$dag/$task: maxAttempts must be >= 1")
    require(Set("FINISH_RUNNING", "FINISH_ALL_POSSIBLE").contains(failureOption),
      s"$dag/$task: unknown failure option '$failureOption'")
  }

  final case class SchedulerConfig(slots: Int, userQuota: Int, groupQuota: Int,
      horizon: Int = 64) {
    require(slots >= 1 && userQuota >= 1 && groupQuota >= 1 && horizon >= 1)
  }

  /** (tick, dag, task, attempt, event) — event is one of start,
    * success, fail, quota_fail, cancelled, sla_kill. `fail` carries
    * the attempt number that failed (a retry re-queues silently and
    * its next start is a new `start` event).
    */
  final case class SchedEvent(tick: Long, dag: String, task: String,
      attempt: Long, event: String)

  // task states: P pending, R running, S succeeded, F failed,
  // Q quota-failed, C cancelled, K sla-killed
  private final case class St(state: Char, attempt: Int, endTick: Long)

  private val Dead = Set('F', 'Q', 'C', 'K')

  /** Run the virtual-time schedule. Returns the full event trace in
    * (tick, dag, task, event) order. Tasks still pending/running at
    * the horizon are an error — a schedule that doesn't quiesce is a
    * workload bug, not a result.
    */
  def schedule(workload: Seq[DagTask], conf: SchedulerConfig): Seq[SchedEvent] = {
    val keys = workload.map(t => (t.dag, t.task))
    require(keys.distinct.size == keys.size, "duplicate (dag, task) in workload")
    val byKey = workload.map(t => (t.dag, t.task) -> t).toMap
    workload.foreach { t =>
      t.dependsOn.foreach(d => require(byKey.contains((t.dag, d)),
        s"${t.dag}/${t.task}: unknown dependency '$d'"))
    }
    // launch priority: (dag submit, dag, task) — total, engine-agnostic
    val prio = workload.sortBy(t => (t.submitTick, t.dag, t.task))

    var state: Map[(String, String), St] =
      workload.map(t => (t.dag, t.task) -> St('P', 1, -1L)).toMap
    val events = Seq.newBuilder[SchedEvent]
    var t = 0L
    while (t < conf.horizon &&
        state.values.exists(s => s.state == 'P' || s.state == 'R')) {
      t += 1
      // every rule below reads ONLY this snapshot (synchronous update)
      val prev = state
      def of(k: (String, String)) = prev(k)
      val succByDag = workload.groupBy(_.dag).map { case (d, ts) =>
        d -> ts.filter(x => of((d, x.task)).state == 'S').map(_.task).toSet
      }
      val deadByDag = workload.groupBy(_.dag).map { case (d, ts) =>
        d -> ts.filter(x => Dead(of((d, x.task)).state)).map(_.task).toSet
      }
      val runTot = prev.values.count(_.state == 'R')
      val runUser = workload.filter(x => of((x.dag, x.task)).state == 'R')
        .groupBy(_.user).map { case (u, ts) => u -> ts.size }
      val runGrp = workload.filter(x => of((x.dag, x.task)).state == 'R')
        .groupBy(_.group).map { case (g, ts) => g -> ts.size }

      // rules 1-3: row-local against the snapshot
      val mid = workload.map { w =>
        val k = (w.dag, w.task)
        val s = of(k)
        val completes = s.state == 'R' && s.endTick == t
        val slaHit = !completes && w.slaTicks >= 0 &&
          t >= w.submitTick + w.slaTicks && (s.state == 'P' || s.state == 'R')
        val next: Option[St] =
          if (completes) {
            if (s.attempt > w.failAttempts) {
              events += SchedEvent(t, w.dag, w.task, s.attempt, "success")
              Some(St('S', s.attempt, s.endTick))
            } else if (s.attempt >= w.maxAttempts) {
              events += SchedEvent(t, w.dag, w.task, s.attempt, "fail")
              Some(St('F', s.attempt, s.endTick))
            } else {
              events += SchedEvent(t, w.dag, w.task, s.attempt, "fail")
              Some(St('P', s.attempt + 1, -1L))
            }
          } else if (slaHit) {
            events += SchedEvent(t, w.dag, w.task, s.attempt,
              if (s.state == 'R') "sla_kill" else "cancelled")
            Some(St(if (s.state == 'R') 'K' else 'C', s.attempt, -1L))
          } else if (s.state == 'P' &&
              (w.dependsOn.exists(deadByDag(w.dag).contains) ||
                (w.failureOption == "FINISH_RUNNING" && deadByDag(w.dag).nonEmpty))) {
            events += SchedEvent(t, w.dag, w.task, s.attempt, "cancelled")
            Some(St('C', s.attempt, -1L))
          } else None
        k -> next
      }.toMap

      // rule 4: launch into free slots in priority order, quota-check
      // each launch (quota failures consume their slot for this tick)
      val candidates = prio.filter { w =>
        val k = (w.dag, w.task)
        mid(k).isEmpty && of(k).state == 'P' && w.submitTick <= t &&
          w.dependsOn.forall(succByDag(w.dag).contains)
      }
      val launched = candidates.take(math.max(0, conf.slots - runTot))
      var uSeen = Map.empty[String, Int]
      var gSeen = Map.empty[String, Int]
      val launchSt = launched.map { w =>
        val u = uSeen.getOrElse(w.user, 0) + 1
        val g = gSeen.getOrElse(w.group, 0) + 1
        uSeen += w.user -> u
        gSeen += w.group -> g
        val k = (w.dag, w.task)
        val s = of(k)
        if (runUser.getOrElse(w.user, 0) + u <= conf.userQuota &&
            runGrp.getOrElse(w.group, 0) + g <= conf.groupQuota) {
          events += SchedEvent(t, w.dag, w.task, s.attempt, "start")
          k -> St('R', s.attempt, t + w.duration)
        } else {
          events += SchedEvent(t, w.dag, w.task, s.attempt, "quota_fail")
          k -> St('Q', s.attempt, -1L)
        }
      }.toMap

      state = prev.map { case (k, s) =>
        k -> launchSt.getOrElse(k, mid(k).getOrElse(s))
      }
    }
    require(!state.values.exists(s => s.state == 'P' || s.state == 'R'),
      s"schedule did not quiesce within horizon ${conf.horizon}")
    events.result().sortBy(e => (e.tick, e.dag, e.task, e.event))
  }

  /** The trace as a DataFrame (tick, dag, task, attempt, event) —
    * the gate/reporting face.
    */
  def scheduleDF(spark: SparkSession, workload: Seq[DagTask],
      conf: SchedulerConfig): DataFrame = {
    import spark.implicits._
    schedule(workload, conf).toDF("tick", "dag", "task", "attempt", "event")
  }

  /** Drive REAL jobs through a schedule: tasks are properties jobs
    * ([[JobConfig.runAny]] vocabulary) and the virtual-time trace
    * decides order and admission — every task scheduled to start runs
    * (in trace order; semantically parallel within a tick), quota
    * failures and cancellations never run. Completion records ride
    * `store` exactly like [[FlowCompiler.executeDag]], so a rerun
    * after a crash skips finished tasks; records are keyed PER
    * ATTEMPT, so a within-run retry start (a planted trace failure)
    * is never conflated with crash-resume.
    *
    * Real failures are contained, not fatal: a task whose job throws
    * is recorded `failed` and the run continues — later starts of the
    * SAME task (the trace's retries) still run, while starts of tasks
    * depending (transitively) on a really-failed task — or, under
    * FINISH_RUNNING, any later start in that dag — are `cancelled`
    * without running, mirroring the virtual trace's fail/cancel
    * semantics. The virtual trace bounds the retry budget
    * (maxAttempts); an unplanted real failure does not mint extra
    * attempts beyond the trace's starts.
    *
    * Returns (task key -> action) per trace start, action one of
    * ran/skipped/failed/cancelled.
    */
  def executeScheduled(spark: SparkSession, store: graft.state.StateStore,
      workload: Seq[(DagTask, java.util.Properties)],
      conf: SchedulerConfig): Seq[(String, String)] = {
    val trace = schedule(workload.map(_._1), conf)
    val started = trace.filter(_.event == "start")
      .map(e => (e.tick, e.dag, e.task, e.attempt)).sorted
    val props = workload.map { case (t, p) => (t.dag, t.task) -> p }.toMap
    val depsOf = workload.map { case (t, _) => (t.dag, t.task) -> t }.toMap
    // transitive dependency closure within a dag (config-sized)
    def closure(dag: String, task: String): Set[String] = {
      val seen = scala.collection.mutable.Set.empty[String]
      def go(x: String): Unit = depsOf((dag, x)).dependsOn.foreach { d =>
        if (seen.add(d)) go(d)
      }
      go(task)
      seen.toSet
    }
    var reallyFailed = Set.empty[(String, String)]
    started.map { case (_, dag, task, attempt) =>
      val key = s"$dag/$task"
      val w = depsOf((dag, task))
      val blocked =
        closure(dag, task).exists(d => reallyFailed((dag, d))) ||
          (w.failureOption == "FINISH_RUNNING" &&
            reallyFailed.exists { case (d, x) => d == dag && x != task })
      // attempt 1 also probes the legacy un-suffixed key: stores
      // written before the per-attempt key format (`dag/task` only)
      // must keep crash-resume working across the format bump
      val prior = store.get("dagsched", s"$key#$attempt")
        .orElse(if (attempt == 1) store.get("dagsched", key) else None)
      if (blocked) key -> "cancelled"
      else prior match {
        case Some(st) if st.get("status").contains("done") => key -> "skipped"
        case _ =>
          try {
            val summary = JobConfig.runAny(spark, props((dag, task)))
            store.put("dagsched", s"$key#$attempt",
              summary + ("status" -> "done"))
            reallyFailed -= ((dag, task)) // a retry that succeeds heals
            key -> "ran"
          } catch {
            case scala.util.control.NonFatal(_) =>
              reallyFailed += ((dag, task))
              key -> "failed"
          }
      }
    }
  }
}
