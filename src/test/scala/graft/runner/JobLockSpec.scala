package graft.runner

import graft.SparkSpec

/** FS job lock: mutual exclusion, release, stale takeover, withLock. */
class JobLockSpec extends SparkSpec {

  test("second acquire fails while held; succeeds after release") {
    val dir = tmpDir("graft_lock")
    val a = new JobLock(dir, "job1")
    val b = new JobLock(dir, "job1")
    assert(a.tryAcquire())
    assert(!b.tryAcquire())
    assert(b.isLocked)
    a.release()
    assert(b.tryAcquire())
    b.release()
  }

  test("different jobs do not contend") {
    val dir = tmpDir("graft_lock2")
    val a = new JobLock(dir, "job1")
    val b = new JobLock(dir, "job2")
    assert(a.tryAcquire() && b.tryAcquire())
    a.release(); b.release()
  }

  test("a stale lock is broken and re-acquired") {
    val dir = tmpDir("graft_lock3")
    val holder = new JobLock(dir, "job1")
    assert(holder.tryAcquire())
    // a taker that considers anything older than 0 ms stale
    Thread.sleep(10)
    val taker = new JobLock(dir, "job1", staleMs = 1)
    assert(taker.tryAcquire(), "stale lock must be breakable")
    taker.release()
  }

  test("a holder that lost its lock to a stale-break cannot delete the new holder's lock") {
    val dir = tmpDir("graft_lock5")
    val old = new JobLock(dir, "job1")
    assert(old.tryAcquire())
    Thread.sleep(10)
    val taker = new JobLock(dir, "job1", staleMs = 1)
    assert(taker.tryAcquire()) // breaks old's stale lock
    old.release() // must be a no-op: the file carries taker's token
    assert(taker.isLocked, "live lock deleted by the previous holder")
    val third = new JobLock(dir, "job1")
    assert(!third.tryAcquire(), "mutual exclusion broken after stale-break")
    taker.release()
  }

  test("withLock runs the body exactly when acquired") {
    val dir = tmpDir("graft_lock4")
    val a = new JobLock(dir, "job1")
    val b = new JobLock(dir, "job1")
    val r = a.withLock {
      assert(b.withLock(42).isEmpty) // nested acquire denied
      "ran"
    }
    assert(r.contains("ran"))
    assert(!a.isLocked) // released after the body
    assert(b.withLock(42).contains(42))
  }
}
