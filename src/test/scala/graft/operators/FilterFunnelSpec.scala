package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", 100L), (2L, "en", 50L), (3L, "de", 200L),
    (4L, "en", 150L), (5L, null.asInstanceOf[String], 90L)
  ).toDF("id", "lang", "len")

  test("funnel counts are ordered survivors, nulls fail their stage") {
    val rows = FilterFunnel.report(docs, Seq(
        "lang_en" -> (col("lang") === "en"),
        "min_len" -> (col("len") >= 120)))
      .orderBy("stage").collect()
    // stage 0: in=5, pass=3 (docs 1,2,4; null lang fails)
    assert((rows(0).getLong(2), rows(0).getLong(3), rows(0).getLong(4)) === ((5L, 3L, 2L)))
    assert(rows(0).getString(1) === "lang_en")
    // stage 1: in=3, pass=1 (doc 4)
    assert((rows(1).getLong(2), rows(1).getLong(3), rows(1).getLong(4)) === ((3L, 1L, 2L)))
  }

  test("single aggregation pass: one stage, all pass") {
    val rows = FilterFunnel.report(docs, Seq("all" -> lit(true))).collect()
    assert(rows.length === 1)
    assert((rows(0).getLong(2), rows(0).getLong(3)) === ((5L, 5L)))
  }

  test("stage names with quotes and backslashes survive the unpivot verbatim") {
    val rows = FilterFunnel.report(docs, Seq(
        "it's" -> (col("lang") === "en"),
        """back\slash""" -> lit(true)))
      .orderBy("stage").collect()
    assert(rows(0).getString(1) === "it's")
    assert(rows(1).getString(1) === """back\slash""")
  }

  test("empty stage list is rejected") {
    intercept[IllegalArgumentException] {
      FilterFunnel.report(docs, Seq.empty)
    }
  }

  test("empty corpus reports a zero-count funnel, not null counts") {
    val rows = FilterFunnel.report(docs.filter(lit(false)), Seq(
        "a" -> (col("lang") === "en"), "b" -> (col("len") >= 0)))
      .orderBy("stage").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      // getLong on a null would throw / return garbage — the coalesced
      // sums must be real zeros (the JobConfig curate summary reads
      // these as primitive longs)
      assert(!r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((0L, 0L, 0L)))
    }
  }
}
