package graft.operators

import graft.SparkSpec

class TripletMiningSpec extends SparkSpec {
  import spark.implicits._

  // doc 0 anchors; lexically all docs share tokens with 0; embeddings
  // place doc 1 nearest (positive), doc 2 semantically close (vetoed),
  // docs 3-4 orthogonal (eligible negatives)
  private val docs = Seq(
    (0L, "spark join scan merge"),
    (1L, "spark join scan"),
    (2L, "spark join merge"),
    (3L, "spark scan"),
    (4L, "join merge")
  ).toDF("doc_id", "text")

  private val emb = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)),   // nearest to 0
    (2L, Array(0.8f, 0.2f, 0f)),   // close to 0 -> vetoed as negative
    (3L, Array(0f, 1f, 0f)),       // orthogonal
    (4L, Array(0f, 0f, 1f))        // orthogonal
  ).toDF("vec_id", "embedding")

  test("positive is the exact NN; close candidates vetoed; negatives ride BM25 order") {
    val anchors = docs.filter($"doc_id" === 0)
    val rows = TripletMining.mine(docs, emb, anchors,
        "doc_id", "text", "vec_id", "embedding",
        kCand = 10, nNeg = 3, negMaxSim = 0.5)
      .orderBy("neg_rank").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) == 1L), "positive must be doc 1 (cos ~0.994)")
    val negs = rows.map(_.getLong(4)).toSet
    assert(negs.subsetOf(Set(3L, 4L)), s"docs 1 (positive) and 2 (cos ~0.97) must be vetoed: $negs")
    // every reported neg_sim honors the veto
    assert(rows.forall(_.getDouble(5) < 0.5))
  }

  test("an anchor with every candidate vetoed emits no triplets") {
    val anchors = docs.filter($"doc_id" === 0)
    val rows = TripletMining.mine(docs, emb, anchors,
      "doc_id", "text", "vec_id", "embedding",
      kCand = 10, nNeg = 3, negMaxSim = -0.9) // nothing clears the veto
    assert(rows.count() === 0L)
  }
}
