package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("split fractions approximately honored, assignment deterministic") {
    val df = (1L to 10000L).toDF("id")
    val out = Splits.split(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
    // deterministic under repartition
    val again = Splits.split(df.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("growing the dataset never reassigns existing records") {
    val small = (1L to 1000L).toDF("id")
    val big = (1L to 5000L).toDF("id")
    val fr = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Splits.split(small, "id", fr).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.split(big, "id", fr).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("validation: fractions must not exceed 1") {
    intercept[IllegalArgumentException](
      Splits.assign(lit(1L), Seq("a" -> 0.9, "b" -> 0.3)))
  }

  test("shardAndShuffle: dense positions per shard, deterministic, roughly uniform") {
    val df = (1L to 8000L).toDF("id")
    val out = Splits.shardAndShuffle(df, "id", 8).cache()
    try {
      val perShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("npos"))
        .collect()
      assert(perShard.length == 8, "all 8 shards populated")
      perShard.foreach { r =>
        assert(r.getLong(2) == 1L && r.getLong(3) == r.getLong(1) && r.getLong(4) == r.getLong(1),
          s"positions must be dense 1..n within shard: $r")
        assert(math.abs(r.getLong(1) - 1000L) < 250, s"shard imbalance: $r")
      }
      // deterministic under physical reshuffling
      val again = Splits.shardAndShuffle(df.repartition(17), "id", 8)
      assert(out.except(again).isEmpty && again.except(out).isEmpty)
    } finally out.unpersist()
  }

  test("shardAndShuffle breaks id-order locality") {
    // consecutive ids must not land at consecutive positions of one shard
    val out = Splits.shardAndShuffle((1L to 2000L).toDF("id"), "id", 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val adjacentSameShardInOrder = (1L until 2000L).count { i =>
      val (s1, p1) = out(i); val (s2, p2) = out(i + 1)
      s1 == s2 && p2 == p1 + 1
    }
    assert(adjacentSameShardInOrder < 20,
      s"$adjacentSameShardInOrder adjacent id pairs kept adjacent positions — not shuffled")
  }
}
