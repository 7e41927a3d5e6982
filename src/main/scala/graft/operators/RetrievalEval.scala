package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval quality evaluation — the measurement loop every ANN /
  * retrieval deployment needs before trusting an index: recall@k of
  * an approximate top-k against the exact answer, computed as ONE
  * equi-join + hash aggregation (never a re-scoring pass; both
  * inputs are already k-bounded, so the join is
  * O(queries × k) regardless of corpus size).
  */
object RetrievalEval {

  /** Per-query recall@k: `exact` and `approx` are (query_id,
    * neighbor_id [, ...]) top-k tables. Output: query_id, n_exact
    * (how many exact neighbors existed — < k at corpus edges),
    * n_hit (approx ∩ exact), recall = n_hit / k (IEEE division).
    * Queries the approx side missed entirely still appear (left
    * join from exact), so a broken index reads 0.0, not absent.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("_hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / lit(k))
  }
}
