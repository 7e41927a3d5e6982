package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def run(rows: Seq[(Long, String, Long)], gap: Long = 100L) =
    Funnel.funnel(rows.toDF("k", "typ", "ms"), "k", "typ", "ms", steps, gap)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getLong(4)))
      }.toMap

  test("greedy-earliest anchoring, strictly-after, gap-capped") {
    val got = run(Seq(
      // key 1: full conversion; the b BEFORE a must be ignored
      (1L, "b", 5L), (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // key 2: b arrives past the gap -> stops at step 1
      (2L, "a", 10L), (2L, "b", 200L),
      // key 3: b at the SAME ms as a is not strictly after
      (3L, "a", 10L), (3L, "b", 10L), (3L, "b", 50L), (3L, "c", 60L),
      // key 4: never saw step 1 -> absent
      (4L, "b", 1L), (4L, "c", 2L)))
    assert(got(1L) === ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(got(2L) === ((Some(10L), None, None, 1L)))
    assert(got(3L) === ((Some(10L), Some(50L), Some(60L), 3L)))
    assert(!got.contains(4L))
  }

  test("anchor is the EARLIEST step-1 even when a later one would convert") {
    // greedy: t1=10 -> b must land in (10, 110]; the only b is at 500,
    // reachable from the second a(450) but greedy does not backtrack
    val got = run(Seq(
      (1L, "a", 10L), (1L, "a", 450L), (1L, "b", 500L)))
    assert(got(1L) === ((Some(10L), None, None, 1L)))
  }

  test("duplicate step events pick the earliest qualifying one") {
    val got = run(Seq(
      (1L, "a", 0L), (1L, "b", 40L), (1L, "b", 20L), (1L, "c", 25L)))
    // t2 = 20 (earliest), c at 25 > 20 qualifies
    assert(got(1L) === ((Some(0L), Some(20L), Some(25L), 3L)))
  }
}
