package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val n = 2
  private val buckets = 1 << 14

  test("target-like docs outscore garble; weights are the exact smoothed ratio") {
    val target = Seq(
      "the cat sat on the mat", "the dog sat on the rug",
      "the cat ran to the dog").toDF("text")
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zzq qzz zzq qzz zzq qzz"),
      (3L, "the dog ran to the rug")).toDF("id", "text")
    val w = Importance.bucketWeights(target, "text", raw, "text", n, buckets)
    val scores = Importance.score(raw, "id", "text", w, n, buckets)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(scores.map(_._2).toSeq === Seq(5L, 5L, 5L)) // 6 tokens -> 5 bigrams
    val byId = scores.map(s => s._1 -> s._3).toMap
    assert(byId(1L) > byId(2L), s"target-like must outscore garble: $byId")
    assert(byId(3L) > byId(2L))
    // hand-check one weight: "zzq qzz" grams never in target; their
    // bucket raw count is 3 ("zzq qzz" occurs 3x) -> w = 2^20 div 4
    val garbleBucket = raw.filter($"id" === 2L)
      .select(explode(FnvShingleHashes($"text", n)).as("h"))
      .select(pmod($"h", lit(buckets.toLong)).as("b")).distinct().collect()
    val wmap = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "zzq qzz" (3x) and "qzz zzq" (2x) buckets, absent from target
    val garbleWs = garbleBucket.map(r => wmap(r.getLong(0))).sorted
    assert(garbleWs === Array(Importance.WeightScale / 4,
      Importance.WeightScale / 3))
  }

  test("docs shorter than n tokens surface with zero grams and score") {
    val target = Seq("a b c").toDF("text")
    val raw = Seq((1L, "a b c"), (2L, "solo")).toDF("id", "text")
    val w = Importance.bucketWeights(target, "text", raw, "text", n, buckets)
    val got = Importance.score(raw, "id", "text", w, n, buckets)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(1) === ((2L, 0L, 0L)))
    assert(got(0)._2 === 2L)
  }

  test("unseen bucket takes the neutral weight") {
    val target = Seq("a b").toDF("text")
    val raw = Seq((1L, "a b")).toDF("id", "text")
    val w = Importance.bucketWeights(target, "text", raw, "text", n, buckets)
    val newDocs = Seq((9L, "never seen grams")).toDF("id", "text")
    val got = Importance.score(newDocs, "id", "text", w, n, buckets).collect().head
    assert(got.getLong(2) === 2 * Importance.WeightScale) // 2 grams x 2^20
  }

  test("plan shape: weight join is a broadcast, no shuffle of the weight table") {
    val target = Seq("a b c d").toDF("text")
    val raw = Seq((1L, "a b c d")).toDF("id", "text")
    val w = Importance.bucketWeights(target, "text", raw, "text", n, buckets)
    val plan = Importance.score(raw, "id", "text", w, n, buckets)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(500))
  }

  test("invalid params rejected") {
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException](
      Importance.bucketWeights(df, "text", df, "text", 0, 16))
    intercept[IllegalArgumentException](
      Importance.bucketWeights(df, "text", df, "text", 2, 0))
  }
}
