package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram LM quality scoring: counts, hit rates, probability floor,
  * and the degenerate shapes (empty text, single token, full OOV).
  */
class NgramLmSpec extends SparkSpec {

  private lazy val train = {
    import spark.implicits._
    Seq("the cat sat", "the cat ran", "a dog sat").toDF("text")
  }
  private lazy val lm = NgramLm.train(train, "text")

  test("train counts unigrams and conditional probabilities exactly") {
    val uni = lm.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni("the") == 2 && uni("cat") == 2 && uni("sat") == 2)
    val p = lm.probs.collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(p("the cat") == 1.0) // both "the" are followed by "cat"
    assert(p("cat sat") == 0.5) // one of two "cat" occurrences
    assert(!p.contains("sat the")) // no cross-document bigrams
  }

  test("score: hits, OOV, floor, and degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"), // fully in-model
      (2L, "the cat flew"), // one unknown bigram + one OOV token
      (3L, "zz qq"), // fully OOV
      (4L, "cat"), // single token: no bigrams
      (5L, ""), // empty
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "doc_id", "text", lm)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 0)
    assert(byId(1L).getLong(3) == 2 && byId(1L).getLong(4) == 2)
    assert(byId(1L).getDouble(5) == 1.0)
    assert(byId(1L).getDouble(6) == 0.5) // floor = P(sat|cat)
    assert(byId(2L).getLong(2) == 1 && byId(2L).getLong(4) == 1)
    assert(byId(2L).getDouble(5) == 0.5)
    assert(byId(3L).getLong(2) == 2 && byId(3L).getLong(4) == 0)
    assert(byId(3L).isNullAt(6)) // no known bigram -> no floor
    assert(byId(4L).getLong(3) == 0 && byId(4L).isNullAt(5))
    Seq(5L, 6L).foreach { id =>
      val r = byId(id)
      assert(r.getLong(1) == 0 && r.getLong(3) == 0)
      assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("scoring is join-shaped: LM rides equi-joins, never a collected map") {
    val out = NgramLm.score(train.withColumn("doc_id", lit(1L)),
      "doc_id", "text", lm)
    val plan = out.queryExecution.optimizedPlan.toString
    // token-OOV join + bigram-prob join + the id re-join pair
    assert("Join LeftOuter".r.findAllIn(plan).size >= 4)
    assert(!plan.contains("udf")) // pure built-ins end to end
  }
}
