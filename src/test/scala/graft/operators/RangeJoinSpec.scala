package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, (i % 5).toLong, rnd.nextLong(100000L)))
      .toDF("pid", "k", "p")
    val ranges = (1 to 80).map { i =>
      val s = rnd.nextLong(90000L); (i.toLong, (i % 5).toLong, s, s + 1 + rnd.nextLong(15000L))
    }.toDF("rid", "k2", "s", "e")

    val binned = RangeJoin.intervalJoin(points, ranges, "k", "k2", "p", "s", "e",
        binWidthMicros = 8192)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ranges,
        $"k" === $"k2" && $"p" >= $"s" && $"p" < $"e")
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("end-exclusive boundary: point at end never matches; at start always") {
    val points = Seq((1L, 0L, 1000L), (2L, 0L, 2000L)).toDF("pid", "k", "p")
    val ranges = Seq((9L, 0L, 1000L, 2000L)).toDF("rid", "k2", "s", "e")
    val out = RangeJoin.intervalJoin(points, ranges, "k", "k2", "p", "s", "e", 512)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L)) // p=1000 matches [1000,2000); p=2000 does not
  }
}
