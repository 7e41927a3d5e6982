package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + 100 of others
  lazy val skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val out = Skew.saltedAgg(skewed, Seq("k"), saltFrom = Seq("v"), buckets = 8,
      partialAggs = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      finalAggs = Seq(sum($"s").as("total"), sum($"c").as("n")))
    val plain = skewed.groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
    assert(out.count() == 101)
    assert(out.except(plain).isEmpty && plain.except(out).isEmpty)
  }

  test("saltedJoin equals plain join") {
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val out = Skew.saltedJoin(skewed, small, "k", buckets = 8, saltFrom = Seq("v"))
    val plain = skewed.join(small, Seq("k"))
    assert(out.count() == plain.count())
    assert(out.select("k", "v", "tag").except(plain.select("k", "v", "tag")).isEmpty)
  }

  test("salt is deterministic and spread across buckets") {
    val salts = skewed.filter($"k" === "hot")
      .select(Skew.salt(8, $"v").as("s")).distinct().collect().map(_.getInt(0)).sorted
    assert(salts.length == 8) // hot key spread over all buckets
    val again = skewed.filter($"k" === "hot")
      .select(Skew.salt(8, $"v").as("s")).distinct().collect().map(_.getInt(0)).sorted
    assert(salts.sameElements(again))
  }
}
