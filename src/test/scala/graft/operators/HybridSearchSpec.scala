package graft.operators

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private def contrib(rank: Option[Long], rrfK: Int = 60): Long =
    rank.map(r => math.floor(HybridSearch.Scale.toDouble / (rrfK.toDouble + r.toDouble)).toLong)
      .getOrElse(0L)

  test("fusion matches the naive fixed-point RRF, absent ranks contribute zero") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrf(a, b, k = 10).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toMap
    val want = Map(
      10L -> contrib(Some(1L)),
      11L -> (contrib(Some(2L)) + contrib(Some(1L))),
      12L -> contrib(Some(3L)),
      13L -> contrib(Some(2L)))
    assert(got === want)
    // doc 11 appears in both lists -> must rank first
    val first = HybridSearch.rrf(a, b, k = 1).collect()
    assert(first.length === 1 && first(0).getLong(2) === 11L)
  }

  test("k bounds per-query output; score ties break by doc_id") {
    val a = Seq((1L, 5L, 1L), (1L, 6L, 1L), (2L, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = spark.emptyDataset[(Long, Long, Long)].toDF("query_id", "doc_id", "rank")
    val rows = HybridSearch.rrf(a, b, k = 1).collect().sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq === Seq((1L, 5L), (2L, 7L)))
  }
}
