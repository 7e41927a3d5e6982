package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitext / parallel-pair mining with the MARGIN criterion (Artetxe &
  * Schwenk 2019, the CCMatrix/LASER recipe): a candidate pair (x, y)
  * across two embedding spaces scores by its cosine RELATIVE to each
  * side's neighborhood density,
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x, B) + avgK(y, A)) / 2)
  *
  * which suppresses hubs (vectors close to everything) that absolute
  * cosine thresholds mis-mine. Re-expressed in the repo's exact
  * discipline: similarities quantize to 2^20 fixed-point once, the
  * neighborhood sums are integer, and the margin decision
  *
  *   2·qsim·nA·nB·den >= num·(sumA·nB + sumB·nA)
  *
  * is pure long arithmetic (threshold num/den, e.g. 21/20 = 1.05) —
  * bit-replayable by the oracle. Pairs with non-positive cosine or
  * non-positive neighborhood mass are dropped before any division,
  * so the reported integer margin never hits the cross-engine
  * negative-division rounding difference.
  *
  * Inputs are (query_id, neighbor_id, sim) k-NN tables from ANY
  * retriever — brute force in the gate, the IVF/PQ ladder at 100 TB —
  * so mining composes with the existing ANN index instead of owning
  * its own scan.
  */
object BitextMine {

  val Q: Long = 1L << 20

  /** Forward-best pairs A→B passing the margin test. Returns
    * (src_id, dst_id, qsim, margin_q, mutual) where margin_q is the
    * 2^20-quantized margin and mutual marks pairs that are also the
    * reverse side's best match.
    */
  def marginPairs(knnAB: DataFrame, knnBA: DataFrame,
      minMarginNum: Long, minMarginDen: Long): DataFrame = {
    require(minMarginNum > 0 && minMarginDen > 0,
      s"margin threshold must be positive: $minMarginNum/$minMarginDen")
    def quant(df: DataFrame) = df.select(col("query_id"), col("neighbor_id"),
      floor(col("sim") * Q).cast("long").as("qsim"))
    val ab = quant(knnAB)
    val ba = quant(knnBA)
    val dA = ab.groupBy(col("query_id").as("src_id"))
      .agg(sum("qsim").as("sum_a"), count(lit(1)).as("n_a"))
    val dB = ba.groupBy(col("query_id").as("dst_id"))
      .agg(sum("qsim").as("sum_b"), count(lit(1)).as("n_b"))
    val wF = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val fwd = ab.withColumn("_rn", row_number().over(wF))
      .filter(col("_rn") === 1)
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("dst_id"), col("qsim"))
    val back = ba.withColumn("_rn", row_number().over(wF))
      .filter(col("_rn") === 1)
      .select(col("query_id").as("dst_id"),
        col("neighbor_id").as("best_src"))
    val denom = col("sum_a") * col("n_b") + col("sum_b") * col("n_a")
    fwd.join(dA, "src_id").join(dB, "dst_id")
      .join(back, Seq("dst_id"), "left")
      .filter(col("qsim") > 0 && denom > 0)
      .filter(lit(2L) * col("qsim") * col("n_a") * col("n_b") * minMarginDen >=
        lit(minMarginNum) * denom)
      .select(col("src_id"), col("dst_id"), col("qsim"),
        expr(s"(2 * qsim * n_a * n_b * $Q) div (sum_a * n_b + sum_b * n_a)")
          .as("margin_q"),
        coalesce(col("best_src") === col("src_id"), lit(false)).as("mutual"))
  }
}
