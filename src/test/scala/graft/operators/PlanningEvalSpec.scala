package graft.operators

import graft.SparkSpec

class PlanningEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK counts hits, keeps missed queries, divides by k") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L)) // query 2 absent
      .toDF("query_id", "neighbor_id")
    val out = RetrievalEval.recallAtK(exact, approx, k = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 2L, 2.0 / 3)))
    assert(out(2L) == ((2L, 2L, 0L, 0.0)))
  }

  test("mixture plan: exact targets, ceil epochs, cap and shortfall") {
    val corpus = Seq(
      ("a", 100L), ("a", 100L), // mass 200
      ("b", 1000L), // mass 1000
      ("c", 10L)) // mass 10: tiny source slams the 4-epoch cap
      .toDF("source", "tok")
    val out = MixturePlan.plan(corpus, "source", "tok",
        Map("a" -> 1L, "b" -> 1L, "c" -> 2L), budgetTokens = 4000L, maxEpochs = 4L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // targets: a,b = 4000/4 = 1000; c = 2*4000/4 = 2000
    val (_, massA, _, targetA, eqA, plannedA, shortA) = out("a")
    assert(massA == 200L && targetA == 1000L)
    // raw ceil(1000*1024/200) = 5120 > cap 4*1024 → capped
    assert(eqA == 4096L && plannedA == 800L && shortA == 200L)
    val (_, _, _, targetB, eqB, plannedB, shortB) = out("b")
    assert(targetB == 1000L && eqB == 1024L && plannedB == 1000L && shortB == 0L)
    val (_, _, _, targetC, eqC, _, shortC) = out("c")
    assert(targetC == 2000L && eqC == 4096L && shortC == 2000L - 40L)
  }

  test("mixture plan: zero-weight groups plan to zero") {
    val corpus = Seq(("a", 100L), ("z", 50L)).toDF("source", "tok")
    val out = MixturePlan.plan(corpus, "source", "tok",
        Map("a" -> 1L), budgetTokens = 100L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("z")._4 == 0L && out("z")._5 == 0L && out("z")._6 == 0L)
    assert(out("a")._4 == 100L)
  }

  test("mixture plan rejects empty or negative weights") {
    val corpus = Seq(("a", 100L)).toDF("source", "tok")
    intercept[IllegalArgumentException] {
      MixturePlan.plan(corpus, "source", "tok", Map("a" -> 0L), 100L)
    }
    intercept[IllegalArgumentException] {
      MixturePlan.plan(corpus, "source", "tok", Map("a" -> -1L, "b" -> 2L), 100L)
    }
  }
}
