package graft.runner

import graft.SparkSpec
import graft.runner.DagScheduler._

/** Property suite for the virtual-time scheduler: on random
  * workloads, the trace must satisfy the invariants the transition
  * rule promises — every task terminates exactly once, admission
  * never exceeds slots or quotas at any tick, no task starts before
  * its submit tick or before its dependencies succeeded, and the
  * whole schedule is replay-deterministic.
  */
class DagSchedulerPropSpec extends SparkSpec {

  private val Terminal = Set("success", "fail", "quota_fail", "cancelled", "sla_kill")

  private def randomWorkload(rnd: scala.util.Random): Seq[DagTask] = {
    val users = Seq("u0", "u1", "u2")
    val groups = Seq("g0", "g1")
    (0 until 1 + rnd.nextInt(5)).flatMap { d =>
      val n = 1 + rnd.nextInt(4)
      val submit = rnd.nextInt(4).toLong
      val sla = if (rnd.nextInt(4) == 0) (2 + rnd.nextInt(7)).toLong else -1L
      val fopt = if (rnd.nextBoolean()) "FINISH_RUNNING" else "FINISH_ALL_POSSIBLE"
      (0 until n).map { i =>
        val deps = (0 until i).filter(_ => rnd.nextInt(3) == 0).map(j => s"t$j")
        DagTask(s"d$d", s"t$i", users(rnd.nextInt(3)), groups(rnd.nextInt(2)),
          deps,
          duration = 1 + rnd.nextInt(3),
          failAttempts = if (rnd.nextInt(6) == 0) 9 else rnd.nextInt(2),
          maxAttempts = 1 + rnd.nextInt(2),
          submitTick = submit, slaTicks = sla, failureOption = fopt)
      }
    }
  }

  test("a 2000-dag tenant mix schedules as driver metadata and quiesces") {
    // the O(dags x tasks x ticks) claim at a realistic control-plane
    // size: 2000 two-task flows across 20 users / 5 groups through 64
    // slots — must terminate every task inside the horizon (and inside
    // the suite's patience)
    val wl = (0 until 2000).flatMap { d =>
      Seq(
        DagTask(s"d$d", "a", s"u${d % 20}", s"g${d % 5}", Nil,
          duration = 1 + d % 2, failAttempts = 0, maxAttempts = 2,
          submitTick = (d % 40).toLong, slaTicks = -1L,
          failureOption = "FINISH_ALL_POSSIBLE"),
        DagTask(s"d$d", "b", s"u${d % 20}", s"g${d % 5}", Seq("a"),
          duration = 1, failAttempts = 0, maxAttempts = 2,
          submitTick = (d % 40).toLong, slaTicks = -1L,
          failureOption = "FINISH_ALL_POSSIBLE"))
    }
    val es = schedule(wl, SchedulerConfig(slots = 64, userQuota = 8,
      groupQuota = 20, horizon = 2000))
    val byTask = es.groupBy(e => (e.dag, e.task))
    assert(byTask.size == 4000)
    // quotas make some launches fail permanently; every task still
    // reaches exactly one terminal state
    wl.foreach { t =>
      val last = byTask((t.dag, t.task)).maxBy(_.tick)
      assert(Terminal(last.event), s"${t.dag}/${t.task}: ${last.event}")
    }
  }

  test("invariants hold on 60 random workloads") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 60) {
      val wl = randomWorkload(rnd)
      val conf = SchedulerConfig(
        slots = 1 + rnd.nextInt(4), userQuota = 1 + rnd.nextInt(3),
        groupQuota = 1 + rnd.nextInt(3), horizon = 500)
      val es = schedule(wl, conf)
      val ctx = s"trial $trial conf=$conf wl=${wl.size} tasks"

      // determinism: an identical replay produces the identical trace
      assert(es == schedule(wl, conf), s"$ctx: non-deterministic")

      val byTask = es.groupBy(e => (e.dag, e.task))
      // exactly one terminal event per task, and it is the LAST event
      wl.foreach { t =>
        val tr = byTask.getOrElse((t.dag, t.task), Nil)
        assert(tr.nonEmpty, s"$ctx: ${t.dag}/${t.task} has no events")
        val terms = tr.filter(e => Terminal(e.event) &&
          !(e.event == "fail" && tr.exists(l => l.tick > e.tick)))
        val permanent = tr.sortBy(_.tick).last
        assert(Terminal(permanent.event),
          s"$ctx: ${t.dag}/${t.task} last event ${permanent.event}")
        assert(terms.size == 1, s"$ctx: ${t.dag}/${t.task} terminals: $tr")
      }

      // reconstruct running intervals: a start at tick s runs (s, e]
      // where e is that task's next event tick (completion/kill)
      val byKey = wl.map(t => (t.dag, t.task) -> t).toMap
      val intervals = byTask.toSeq.flatMap { case (k, tr) =>
        tr.filter(_.event == "start").map { st =>
          val after = tr.filter(e => e.tick > st.tick)
          val end = if (after.isEmpty) st.tick + byKey(k).duration
            else after.minBy(_.tick).tick
          (k, st.tick, end)
        }
      }
      // no start before submit; deps all succeeded strictly earlier
      intervals.foreach { case (k, s, _) =>
        val t = byKey(k)
        assert(s >= t.submitTick && s >= 1,
          s"$ctx: $k started at $s before submit ${t.submitTick}")
        t.dependsOn.foreach { d =>
          val dep = byTask((t.dag, d)).filter(_.event == "success")
          assert(dep.nonEmpty && dep.head.tick < s,
            s"$ctx: $k started at $s before dep $d succeeded")
        }
      }
      // per-tick admission: running <= slots, per user/group <= quota.
      // a task occupies its slot on ticks s .. e-1 (it frees the slot
      // for the tick AFTER its completion tick e arrives)
      val maxTick = es.map(_.tick).maxOption.getOrElse(0L)
      (1L to maxTick).foreach { tick =>
        val running = intervals.filter { case (_, s, e) => s <= tick && tick < e }
        assert(running.size <= conf.slots,
          s"$ctx: tick $tick running ${running.size} > slots ${conf.slots}")
        running.groupBy(r => byKey(r._1).user).foreach { case (u, rs) =>
          assert(rs.size <= conf.userQuota,
            s"$ctx: tick $tick user $u running ${rs.size} > ${conf.userQuota}")
        }
        running.groupBy(r => byKey(r._1).group).foreach { case (g, rs) =>
          assert(rs.size <= conf.groupQuota,
            s"$ctx: tick $tick group $g running ${rs.size} > ${conf.groupQuota}")
        }
      }
    }
  }
}
