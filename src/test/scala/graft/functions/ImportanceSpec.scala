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

  test("selectTopK keeps k per domain, score desc then id asc") {
    val scored = Seq(
      (1L, "en", 50L), (2L, "en", 90L), (3L, "en", 90L), (4L, "en", 10L),
      (5L, "fr", 70L), (6L, "fr", 60L)).toDF("id", "dom", "score")
    val got = Importance.selectTopK(scored, "id", "dom", "score", k = 2)
      .orderBy("dom", "id").collect().map(r => (r.getLong(0), r.getString(1)))
    // en ties at 90 break by id asc -> 2, 3; fr keeps both (only 2 docs)
    assert(got.toSeq === Seq((2L, "en"), (3L, "en"), (5L, "fr"), (6L, "fr")))
    assert(scored.columns.toSeq ===
      Importance.selectTopK(scored, "id", "dom", "score", 2).columns.toSeq)
  }

  test("selectTopK plan: constant rank bound rides WindowGroupLimit") {
    val scored = Seq((1L, "en", 5L), (2L, "en", 9L)).toDF("id", "dom", "score")
    val plan = Importance.selectTopK(scored, "id", "dom", "score", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("selectTopFraction stratifies by domain with a floor for rare domains") {
    val scored = ((1L to 10L).map(i => (i, "big", i * 10L)) :+
      ((99L, "rare", 5L))).toDF("id", "dom", "score")
    val got = Importance
      .selectTopFraction(scored, "id", "dom", "score", 0.3, minPerDomain = 1)
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted
    // big: ceil(10 * 0.3) = 3 highest scores = ids 8, 9, 10; rare: floor keeps 1
    assert(got.toSeq === Seq(("big", 8L), ("big", 9L), ("big", 10L), ("rare", 99L)))
    intercept[IllegalArgumentException](
      Importance.selectTopFraction(scored, "id", "dom", "score", 0.0))
    intercept[IllegalArgumentException](
      Importance.selectTopFraction(scored, "id", "dom", "score", 1.5))
  }
}
