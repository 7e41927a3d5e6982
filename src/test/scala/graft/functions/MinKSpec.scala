package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MinKLongs: deterministic bounded min-k across partitions and
  * merges, hot-group memory bound by construction.
  */
class MinKSpec extends SparkSpec {
  import spark.implicits._

  test("returns the k smallest, sorted, across partition merges") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rng.nextLong() % 100000)
    val df = vals.toDF("v").repartition(16)
    val got = df.agg(MinKLongs(col("v"), 8).as("m"))
      .head().getSeq[Long](0)
    assert(got == vals.sorted.take(8))
  }

  test("groups smaller than k return the whole sorted set; nulls skipped") {
    val df = Seq(Some(5L), None, Some(1L), Some(9L)).toDF("v")
    val got = df.agg(MinKLongs(col("v"), 8).as("m")).head().getSeq[Long](0)
    assert(got == Seq(1L, 5L, 9L))
  }

  test("a hot group stays O(k): 200k values, result is exactly min-8") {
    val df = spark.range(200000).select(
      lit("hot").as("g"), (col("id") * 48271L % 999983L).as("v"))
    val got = df.groupBy("g").agg(MinKLongs(col("v"), 8).as("m"))
      .head().getSeq[Long](1)
    val expect = (0L until 200000L).map(i => i * 48271L % 999983L)
      .sorted.take(8)
    assert(got == expect)
  }
}
