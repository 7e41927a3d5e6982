package graft.operators

import graft.SparkSpec

/** Margin-criterion mining: hub suppression (the property absolute
  * cosine thresholds lack), mutual-best flags, and the guard rails
  * around non-positive similarities.
  */
class BitextMineSpec extends SparkSpec {

  import spark.implicits._

  private def knn(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("query_id", "neighbor_id", "sim")

  test("hub suppression: equal cosine, denser neighborhood loses") {
    // src 1 -> dst 10 with cos .8 in a sparse neighborhood (others .1)
    // src 2 -> dst 20 with cos .8 in a dense neighborhood (others .75)
    val ab = knn(
      (1L, 10L, 0.8), (1L, 11L, 0.1), (1L, 12L, 0.1),
      (2L, 20L, 0.8), (2L, 21L, 0.75), (2L, 22L, 0.75))
    val ba = knn(
      (10L, 1L, 0.8), (10L, 2L, 0.1), (10L, 3L, 0.1),
      (20L, 2L, 0.8), (20L, 1L, 0.75), (20L, 3L, 0.75))
    val out = BitextMine.marginPairs(ab, ba, 21, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(out.toSeq == Seq((1L, 10L, true)),
      s"dense-neighborhood pair must fail the margin test: ${out.toSeq}")
  }

  test("mutual flag reflects the reverse best match") {
    val ab = knn((1L, 10L, 0.9), (1L, 11L, 0.1))
    val baMutual = knn((10L, 1L, 0.9), (10L, 2L, 0.1),
      (11L, 2L, 0.5), (11L, 1L, 0.1))
    val m = BitextMine.marginPairs(ab, baMutual, 21, 20).collect().head
    assert(m.getBoolean(4))
    val baNot = knn((10L, 2L, 0.9), (10L, 1L, 0.1),
      (11L, 2L, 0.5), (11L, 1L, 0.1))
    val n = BitextMine.marginPairs(ab, baNot, 21, 20).collect().head
    assert(!n.getBoolean(4))
  }

  test("non-positive cosine and neighborhood mass are dropped, not divided") {
    val ab = knn((1L, 10L, -0.5), (1L, 11L, -0.6))
    val ba = knn((10L, 1L, -0.5), (10L, 2L, -0.6))
    assert(BitextMine.marginPairs(ab, ba, 21, 20).count() == 0)
  }

  test("bad threshold rejected") {
    val e = knn((1L, 10L, 0.5))
    intercept[IllegalArgumentException](BitextMine.marginPairs(e, e, 0, 20))
  }
}
