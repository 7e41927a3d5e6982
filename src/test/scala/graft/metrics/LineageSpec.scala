package graft.metrics

import graft.SparkSpec
import graft.metrics.Lineage.Descriptor
import graft.state.FsStateStore

/** Lineage event assembly: source + per-branch destinations, retry
  * idempotence, skip-branches-without-destination, purge.
  */
class LineageSpec extends SparkSpec {

  private def newStore() = new FsStateStore(tmpDir("graft_lineage_spec"))

  test("events assemble per branch; retries do not double-count") {
    val store = newStore()
    Lineage.setSource(store, "j1", "ds", Descriptor("file", "in"))
    Lineage.putDestination(store, "j1", 0, Descriptor("file", "out0"), 10L)
    Lineage.putDestination(store, "j1", 2, Descriptor("jdbc", "out2"), 7L)
    // branch 0 retried with the corrected count: overwrites, not appends
    Lineage.putDestination(store, "j1", 0, Descriptor("file", "out0"), 12L)
    val evs = Lineage.loadEvents(store, Seq("j1"))
    assert(evs.map(e => (e.branch, e.dst, e.nRows)) ==
      Seq((0, "file:out0", 12L), (2, "jdbc:out2", 7L)))
    assert(evs.forall(e => e.src == "file:in" && e.dataset == "ds"))
  }

  test("no destination -> no event; unknown job -> no rows") {
    val store = newStore()
    Lineage.setSource(store, "j2", "ds", Descriptor("file", "in"))
    assert(Lineage.loadEvents(store, Seq("j2", "nope")).isEmpty)
  }

  test("putDestination before setSource is a contract violation") {
    val store = newStore()
    intercept[IllegalStateException] {
      Lineage.putDestination(store, "j3", 0, Descriptor("file", "x"), 1L)
    }
  }

  test("setSource resets prior lineage; purge removes it") {
    val store = newStore()
    Lineage.setSource(store, "j4", "ds", Descriptor("file", "in"))
    Lineage.putDestination(store, "j4", 0, Descriptor("file", "old"), 1L)
    Lineage.setSource(store, "j4", "ds", Descriptor("file", "in")) // rerun
    assert(Lineage.loadEvents(store, Seq("j4")).isEmpty)
    Lineage.putDestination(store, "j4", 0, Descriptor("file", "new"), 2L)
    Lineage.purge(store, "j4")
    assert(Lineage.loadEvents(store, Seq("j4")).isEmpty)
  }

  test("load emits the queryable frame") {
    val store = newStore()
    Lineage.setSource(store, "j5", "ds", Descriptor("file", "in"))
    Lineage.putDestination(store, "j5", 1, Descriptor("file", "out"), 5L)
    val rows = Lineage.load(spark, store, Seq("j5")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "j5" && r.getInt(2) == 1 &&
      r.getString(4) == "file:out" && r.getLong(5) == 5L)
  }
}
