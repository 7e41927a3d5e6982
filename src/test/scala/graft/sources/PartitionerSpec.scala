package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PartitionerSpec extends AnyFunSuite {

  test("simple intervals partition the range exactly (property, 500 seeds)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val low = rnd.nextLong(1000000L)
      val high = low + 1 + rnd.nextLong(1000000L)
      val n = 1 + rnd.nextInt(50)
      val iv = Partitioner.intervals(low, high, n, WatermarkType.Simple)
      assert(iv.nonEmpty && iv.size <= n, s"($low,$high,$n)")
      assert(iv.head._1 == low && iv.last._2 == high, s"($low,$high,$n)")
      // contiguous, non-overlapping
      iv.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 == lo2, s"($low,$high,$n)")
        case _ =>
      }
      iv.foreach { case (lo, hi) => assert(lo < hi || (lo == hi && hi == high)) }
    }
  }

  test("degenerate ranges") {
    assert(Partitioner.intervals(5, 5, 10, WatermarkType.Simple) == Seq((5L, 5L)))
    assert(Partitioner.intervals(6, 5, 10, WatermarkType.Simple).isEmpty)
  }

  test("date intervals split on day boundaries") {
    val iv = Partitioner.intervals(20240101L, 20240110L, 3, WatermarkType.Date)
    assert(iv.head._1 == 20240101L && iv.last._2 == 20240110L)
    assert(iv.size <= 3)
    iv.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 == l2)
      case _ =>
    }
  }

  test("hour intervals respect encoding") {
    val iv = Partitioner.intervals(2024010100L, 2024010123L, 24, WatermarkType.Hour)
    assert(iv.size == 23)
    assert(iv.head == (2024010100L, 2024010101L))
  }

  test("timestamp predicates render SQL timestamps, last closed") {
    val preds = Partitioner.jdbcPredicates("updated_at", 20240101000000L, 20240101060000L, 2, WatermarkType.Timestamp)
    assert(preds.length == 2)
    assert(preds.head == "updated_at >= '2024-01-01 00:00:00' AND updated_at < '2024-01-01 03:00:00'")
    assert(preds.last == "updated_at >= '2024-01-01 03:00:00' AND updated_at <= '2024-01-01 06:00:00'")
  }

  test("simple predicates render plain longs") {
    val preds = Partitioner.jdbcPredicates("id", 0, 10, 2, WatermarkType.Simple)
    assert(preds.head == "id >= 0 AND id < 5")
    assert(preds.last == "id >= 5 AND id <= 10")
  }

  test("histogram split: balanced ranges, exact coverage (property, 500 seeds)") {
    import Partitioner.HistBucket
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      // random histogram with gaps and heavy skew (some buckets 1000x)
      var lo = rnd.nextLong(1000L)
      val buckets = (0 until 1 + rnd.nextInt(40)).map { _ =>
        val hi = lo + 1 + rnd.nextLong(100L)
        val b = HistBucket(lo, hi, rnd.nextInt(4) match {
          case 0 => rnd.nextLong(10000L) // hot bucket
          case _ => rnd.nextLong(100L)
        })
        lo = hi + rnd.nextLong(10L) // maybe a gap
        b
      }
      val target = 1 + rnd.nextLong(2000L)
      val ranges = Partitioner.splitByHistogram(buckets, target)
      // exact coverage: first lo .. last hi, contiguous, ordered
      assert(ranges.head._1 == buckets.head.lo && ranges.last._2 == buckets.last.hi)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 == l2)
        case _ =>
      }
      ranges.foreach { case (l, h) => assert(l < h) }
      // balance: a range holds <= target rows unless it is a SINGLE
      // bucket that alone exceeds target (histogram granularity is the
      // split floor)
      ranges.foreach { case (l, h) =>
        val inRange = buckets.filter(b => b.lo >= l && b.lo < h)
        val rows = inRange.map(_.count).sum
        assert(rows <= target || (inRange.size == 1 && inRange.head.count > target),
          s"range ($l,$h) rows=$rows target=$target")
      }
      // every bucket's rows land in exactly one range
      assert(buckets.map(_.count).sum ==
        ranges.map { case (l, h) => buckets.filter(b => b.lo >= l && b.lo < h).map(_.count).sum }.sum)
    }
  }

  test("histogram split: one oversized bucket isolates, neighbors pack") {
    import Partitioner.HistBucket
    val buckets = Seq(
      HistBucket(0, 10, 50), HistBucket(10, 20, 50),
      HistBucket(20, 30, 100000), // the skew spike
      HistBucket(30, 40, 50), HistBucket(40, 50, 50))
    val ranges = Partitioner.splitByHistogram(buckets, targetRows = 200)
    assert(ranges == Seq((0L, 20L), (20L, 30L), (30L, 50L)))
    assert(Partitioner.splitByHistogram(buckets, targetRows = 1000000) == Seq((0L, 50L)))
    intercept[IllegalArgumentException](
      Partitioner.splitByHistogram(Seq(HistBucket(0, 10, 1), HistBucket(5, 15, 1)), 10))
  }
}
