package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Contrastive training-triplet mining — the data-SYNTHESIS step of a
  * retrieval-model pipeline (DPR/Contriever-style): for each anchor
  * document,
  *
  *   positive  = its exact cosine nearest neighbor in embedding space;
  *   negatives = its top LEXICAL (BM25) candidates that are NOT
  *               semantically close (cosine < negMaxSim) and not the
  *               positive — "hard negatives": lexically confusable,
  *               semantically distinct, the pairs that actually teach
  *               a bi-encoder something.
  *
  * 100 TB shape: the positive pass is the ANN problem (gated-broadcast
  * exact here; swap in `Ann.IvfIndex.search` for large anchor sets —
  * the plan downstream is identical), the negative pass is the BM25
  * scoring join (bounded by anchor terms × postings, df-capped), and
  * the semantic veto joins embeddings onto ANCHORS × kCand candidate
  * rows only — never corpus². All scoring is the repo's exact
  * arithmetic, so the triplet set is bit-reproducible.
  */
object TripletMining {

  /** One row per (anchor, negative): anchor_id, pos_id, pos_sim,
    * neg_rank (1..nNeg by BM25 rank), neg_id, neg_sim. Anchors with no
    * qualifying negatives emit nothing (no positive-only rows — a
    * triplet needs all three legs).
    */
  def mine(docs: DataFrame, emb: DataFrame, anchors: DataFrame,
      idCol: String, textCol: String, embIdCol: String, embVecCol: String,
      kCand: Int = 10, nNeg: Int = 3, negMaxSim: Double = 0.15): DataFrame = {
    val anchorEmb = emb.join(
      anchors.select(col(idCol).as(embIdCol)), Seq(embIdCol), "left_semi")
    val pos = Similarity.bruteForceTopK(anchorEmb, emb, k = 1,
        probeId = embIdCol, corpusId = embIdCol,
        probeVec = embVecCol, corpusVec = embVecCol)
      .select(col("query_id").as("anchor_id"), col("neighbor_id").as("pos_id"),
        col("sim").as("pos_sim"))
    val cand = Bm25.topK(docs, anchors, idCol, textCol, idCol, textCol, k = kCand)
      .select(col("query_id").as("anchor_id"), col("doc_id").as("neg_id"),
        col("rank").as("bm_rank"))
    val av = emb.select(col(embIdCol).as("anchor_id"), col(embVecCol).as("_av"))
    val nv = emb.select(col(embIdCol).as("neg_id"), col(embVecCol).as("_nv"))
    val vetoed = cand
      .join(av, Seq("anchor_id")).join(nv, Seq("neg_id"))
      .withColumn("neg_sim", Similarity.cosine(col("_av"), col("_nv")))
      .filter(col("neg_sim") < negMaxSim)
      .join(pos, Seq("anchor_id"))
      .filter(col("neg_id") =!= col("pos_id"))
    vetoed
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("anchor_id")).orderBy(col("bm_rank"))))
      .filter(col("neg_rank") <= nNeg)
      .select(col("anchor_id"), col("pos_id"), col("pos_sim"),
        col("neg_rank").cast("long").as("neg_rank"), col("neg_id"), col("neg_sim"))
  }
}
