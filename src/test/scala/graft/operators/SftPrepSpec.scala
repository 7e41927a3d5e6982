package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SftPrepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def threads(rows: Seq[(Long, Timestamp, Long, String, String, Long)],
      budget: Long = 100L) =
    SftPrep.assembleThreads(
      rows.toDF("user_id", "ts", "event_id", "role", "text", "tok"),
      "user_id", "ts", "event_id", "role", "text", "tok",
      gapMs = 10 * 60 * 1000L, budgetTokens = budget)

  test("sessionizes on silence gaps and assembles ordered turns") {
    val out = threads(Seq(
      (1L, ts(0), 1L, "user", "hi", 5L),
      (1L, ts(1), 2L, "assistant", "hello", 5L),
      (1L, ts(30), 3L, "user", "back", 5L), // >10 min later: new thread
      (2L, ts(0), 4L, "user", "yo", 5L)))
      .orderBy("user_id", "session_no")
      .collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Long]("n_turns") == 2)
    assert(first.getAs[Long]("n_kept") == 2)
    assert(first.getAs[String]("thread_text") == "user: hi\nassistant: hello")
    assert(first.getAs[Boolean]("roles_ok"))
    assert(out(1).getAs[String]("thread_text") == "user: back")
    assert(out(2).getAs[Long]("n_turns") == 1)
  }

  test("budget keeps the longest suffix and drops oversized heads") {
    val out = threads(Seq(
      (1L, ts(0), 1L, "user", "a", 60L),
      (1L, ts(1), 2L, "assistant", "b", 30L),
      (1L, ts(2), 3L, "user", "c", 30L),
      (1L, ts(3), 4L, "assistant", "d", 30L)), budget = 70L)
      .collect()
    assert(out.length == 1)
    // suffix sums: d=30, c+d=60, b+c+d=90 > 70 → keep (c, d)
    assert(out(0).getAs[Long]("n_kept") == 2)
    assert(out(0).getAs[Long]("kept_tokens") == 60L)
    assert(out(0).getAs[String]("thread_text") == "user: c\nassistant: d")
    assert(out(0).getAs[Boolean]("roles_ok"))
  }

  test("role validation flags repeats, wrong openers, and empty threads") {
    val out = threads(Seq(
      (1L, ts(0), 1L, "user", "a", 5L),
      (1L, ts(1), 2L, "user", "b", 5L), // repeat role
      (2L, ts(0), 3L, "assistant", "x", 5L), // wrong opener
      (3L, ts(0), 4L, "user", "big", 500L)), // over budget → nothing kept
      budget = 100L)
      .orderBy("user_id").collect()
    assert(!out(0).getAs[Boolean]("roles_ok"))
    assert(!out(1).getAs[Boolean]("roles_ok"))
    assert(out(2).getAs[Long]("n_kept") == 0 && !out(2).getAs[Boolean]("roles_ok"))
    assert(out(2).getAs[String]("thread_text") == "")
  }

  test("preference pairs pick extreme scores with ascending-id tie-breaks") {
    val df = Seq(
      (10L, 1L, 5L), (10L, 2L, 9L), (10L, 3L, 9L), (10L, 4L, 1L), (10L, 5L, 1L),
      (20L, 6L, 7L), (20L, 7L, 7L), // margin 0 → dropped
      (30L, 8L, 3L)) // singleton → dropped
      .toDF("prompt_id", "doc_id", "score")
    val out = SftPrep.preferencePairs(df, "prompt_id", "doc_id", "score")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("chosen_id") == 2L) // min id among the 9s
    assert(r.getAs[Long]("rejected_id") == 4L) // min id among the 1s
    assert(r.getAs[Long]("margin") == 8L)
    assert(r.getAs[Long]("n_candidates") == 5L)
  }

  test("split assignment is group-atomic and respects fractions") {
    val docs = (0L until 400L).map(i => (i, s"grp${i % 40}")).toDF("id", "grp")
    val out = SftPrep.assignSplit(docs, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // leakage: every group maps to exactly one split
    val spans = out.groupBy("grp").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(spans == 0L)
    val bySplit = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.values.sum == 400L)
  }

  test("split assignment rejects bad fractions") {
    val docs = Seq((1L, "a")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      SftPrep.assignSplit(docs, "grp", Seq("a" -> 0.9, "b" -> 0.3))
    }
    intercept[IllegalArgumentException] {
      SftPrep.assignSplit(docs, "grp", Seq("only" -> 1.0))
    }
  }
}
