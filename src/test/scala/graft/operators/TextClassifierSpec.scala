package graft.operators

import graft.SparkSpec

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two planted vocabularies with a shared stopword
  private val train = Seq(
    (1L, "the cat sat on the mat", "animal"),
    (2L, "the dog chased the cat", "animal"),
    (3L, "a cat and a dog", "animal"),
    (4L, "the engine burns fuel", "machine"),
    (5L, "the turbine spins fast", "machine"),
    (6L, "fuel feeds the engine turbine", "machine"))
    .toDF("doc_id", "text", "label")

  private lazy val model = TextClassifier.train(train, "text", "label")

  test("weights are exact quantized rationals with Laplace smoothing") {
    val (weights, classInfo) = model
    val w = weights.as[(String, String, Long)].collect()
      .map { case (l, t, v) => (l, t) -> v }.toMap
    // animal: 16 token occurrences; machine: 13; vocab = distinct tokens
    val v = weights.select("token").distinct().count()
    val animalTot = 16L
    val catCnt = 3L
    assert(w(("animal", "cat")) ==
      math.floor((catCnt + 1L) * TextClassifier.Q.toDouble / (animalTot + v)).toLong)
    val ci = classInfo.as[(String, Long, Long)].collect()
      .map { case (l, p, w0) => l -> ((p, w0)) }.toMap
    assert(ci("animal")._1 == TextClassifier.Q / 2) // 3 of 6 docs
    assert(ci("machine")._2 ==
      math.floor(TextClassifier.Q.toDouble / (13L + v)).toLong)
  }

  test("prediction recovers the planted split on held-out docs") {
    val (weights, classInfo) = model
    val heldOut = Seq(
      (101L, "the cat and the dog sat"),
      (102L, "the turbine engine burns"),
      (103L, "")) // empty doc must survive with prior-only scores
      .toDF("doc_id", "text")
    val out = TextClassifier
      .predictWithMargin(heldOut, "doc_id", "text", weights, classInfo)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(101L)._2 == "animal")
    assert(out(102L)._2 == "machine")
    assert(out.contains(103L)) // not dropped
    assert(out(101L)._4 > 0) // positive margin
  }

  test("incremental count merge equals full retrain") {
    val half1 = train.filter("doc_id <= 3")
    val half2 = train.filter("doc_id > 3")
    val merged = TextClassifier.mergeCounts(
      TextClassifier.trainCounts(half1, "text", "label"),
      TextClassifier.trainCounts(half2, "text", "label"))
    val (wInc, ciInc) = TextClassifier.weightsFromCounts(merged._1, merged._2)
    val (wFull, ciFull) = TextClassifier.train(train, "text", "label")
    assert(wInc.as[(String, String, Long)].collect().toSet ==
      wFull.as[(String, String, Long)].collect().toSet)
    assert(ciInc.as[(String, Long, Long)].collect().toSet ==
      ciFull.as[(String, Long, Long)].collect().toSet)
  }

  test("score keeps one row per (doc, class) and ties break to larger label") {
    val (weights, classInfo) = model
    val docs = Seq((1L, "zzz unseen words only")).toDF("doc_id", "text")
    val scores = TextClassifier
      .score(docs, "doc_id", "text", weights, classInfo)
      .as[(Long, String, Long)].collect()
    assert(scores.length == 2)
    // unseen-only doc: score = prior + n*w0 per class, exact
    val ci = classInfo.as[(String, Long, Long)].collect()
      .map { case (l, p, w0) => l -> ((p, w0)) }.toMap
    val expect = scores.map { case (_, l, s) =>
      s == ci(l)._1 + 4 * ci(l)._2
    }
    assert(expect.forall(identity))
  }
}
