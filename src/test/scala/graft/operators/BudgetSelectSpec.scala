package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (id, cost, priority)
    (1L, 10L, 5L), (2L, 20L, 9L), (3L, 5L, 9L), (4L, 40L, 7L),
    (5L, 15L, 3L), (6L, 25L, 7L), (7L, 1L, 1L), (8L, 30L, 8L)
  ).toDF("id", "cost", "prio")

  private def naive(budget: Long): Seq[(Long, Long)] = {
    val ordered = Seq((1L, 10L, 5L), (2L, 20L, 9L), (3L, 5L, 9L), (4L, 40L, 7L),
      (5L, 15L, 3L), (6L, 25L, 7L), (7L, 1L, 1L), (8L, 30L, 8L))
      .sortBy { case (id, _, p) => (-p, id) }
    ordered.scanLeft((0L, 0L)) { case ((_, acc), (id, c, _)) => (id, acc + c) }
      .drop(1).takeWhile(_._2 <= budget)
  }

  private def run(budget: Long, partitions: Int): Seq[(Long, Long)] =
    BudgetSelect.selectByBudget(docs, "id", "cost", "prio", budget, partitions)
      .select(col("id"), col("cum_cost")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("prefix cut matches the naive global order, across partition counts") {
    for (budget <- Seq(0L, 24L, 25L, 26L, 55L, 95L, 200L); parts <- Seq(1, 3, 8)) {
      assert(run(budget, parts).sortBy(_._1) === naive(budget).sortBy(_._1),
        s"budget=$budget partitions=$parts")
    }
  }

  test("null costs are rejected loudly, never selected for free") {
    val withNull = Seq((1L, Some(10L), 5L), (2L, None, 9L))
      .toDF("id", "cost", "prio")
    val e = intercept[Exception] {
      BudgetSelect.selectByBudget(withNull, "id", "cost", "prio", 100L, 2).collect()
    }
    assert(e.getMessage.contains("null"), s"unexpected: ${e.getMessage}")
  }

  test("budget >= total keeps everything; straddler and beyond are dropped") {
    assert(run(1000L, 3).map(_._1).toSet === (1L to 8L).toSet)
    // order: 2(20) 3(25) 8(55) 4(95) 6(120) 1(130) 5(145) 7(146)
    // budget 100 -> keep through 4; 6 straddles and everything after drops
    assert(run(100L, 3).map(_._1).toSet === Set(2L, 3L, 8L, 4L))
  }
}
