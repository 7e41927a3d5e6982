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
}
