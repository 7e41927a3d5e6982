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

  test("property: matches a naive greedy matcher on random event streams") {
    def naive(rows: Seq[(Long, String, Long)], gap: Long): Map[Long, Seq[Long]] =
      rows.groupBy(_._1).flatMap { case (k, evs) =>
        val byType = evs.groupBy(_._2).view
          .mapValues(_.map(_._3).sorted).toMap
        byType.get(steps.head).map(_.head).map { t1 =>
          val anchors = steps.tail.scanLeft(Option(t1)) { (prev, st) =>
            prev.flatMap(p => byType.getOrElse(st, Nil)
              .find(ms => ms > p && ms <= p + gap))
          }
          k -> anchors.takeWhile(_.isDefined).map(_.get)
        }
      }
    val rnd = new scala.util.Random(13)
    val types = Vector("a", "b", "c", "x")
    for (trial <- 1 to 10) {
      val rows = (1 to 300).map(_ => (rnd.nextInt(12).toLong,
        types(rnd.nextInt(types.size)), rnd.nextInt(400).toLong))
      val gap = 20L + rnd.nextInt(100)
      val exp = naive(rows, gap)
      val got = run(rows, gap)
      assert(got.keySet === exp.keySet, s"trial $trial keys")
      got.foreach { case (k, (t1, t2, t3, n)) =>
        val seq = Seq(t1, t2, t3).takeWhile(_.isDefined).map(_.get)
        assert(seq === exp(k), s"trial $trial key $k")
        assert(n === seq.size.toLong, s"trial $trial key $k n_steps")
      }
    }
  }
}
