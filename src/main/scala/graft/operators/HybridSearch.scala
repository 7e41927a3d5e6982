package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of two ranked candidate lists — the standard way to combine a
  * lexical ranker (BM25) with a vector ranker (ANN cosine) without
  * calibrating their incomparable scores. Fusion is rank-based and
  * integer-exact:
  *
  *   fused(q, d) = Σ_systems floor(2^20 / (rrfK + rank_s(q, d)))
  *
  * (the classic 1/(60+rank) scaled to a fixed-point integer, so
  * per-pair sums are order-free and the DuckDB oracle replays ranking
  * bit-for-bit — same discipline as Bm25's quantized idf).
  *
  * 100 TB shape: inputs are already k-bounded per query (each ranker's
  * top-k), so the fusion join touches O(queries × k) rows — a full
  * outer equi-join on (query, doc) plus one per-query rank window.
  * Never joins the raw corpora.
  */
object HybridSearch {

  val Scale: Long = 1L << 20

  /** Fuse two (query_id, doc_id, rank) lists; ranks are 1-based. A doc
    * absent from one list contributes nothing from that list. Returns
    * the fused top-`k` per query with both source ranks (null where
    * absent).
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    def contrib(rank: org.apache.spark.sql.Column) =
      coalesce(floor(lit(Scale.toDouble) / (lit(rrfK).cast("double") + rank.cast("double"))).cast("long"), lit(0L))
    val fa = a.select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val fb = b.select(col("query_id"), col("doc_id"), col("rank").as("rank_b"))
    val fused = fa.join(fb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("fused_score", contrib(col("rank_a")) + contrib(col("rank_b")))
    fused
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("fused_score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("doc_id"),
        col("fused_score"), col("rank_a"), col("rank_b"))
  }
}
