package graft.operators

import org.apache.spark.sql.DataFrame

/** Compliance purge (SURVEY.md §2.6; reference
  * gobblin-modules/gobblin-compliance: HivePurgerSource →
  * HivePurgerConverter → HivePurgerWriter rewrites each Hive partition
  * dropping rows whose compliance id appears in a deletion dataset).
  *
  * Spark-first: one `left_anti` join per partition rewrite. At 100 TB
  * the deletion-id set is almost always small relative to the data —
  * Catalyst broadcast-joins it automatically (or via broadcast() hint),
  * so the rewrite is a scan + broadcast-anti-join with zero shuffle of
  * the big side.
  */
object Compliance {

  /** Rows of `data` that survive the purge. */
  def purge(data: DataFrame, deleteIds: DataFrame, dataKey: String, deleteKey: String): DataFrame =
    data.join(
      org.apache.spark.sql.functions.broadcast(deleteIds),
      data(dataKey) === deleteIds(deleteKey),
      "left_anti")

  /** Rows that would be removed (for audit counts before rewriting). */
  def purged(data: DataFrame, deleteIds: DataFrame, dataKey: String, deleteKey: String): DataFrame =
    data.join(
      org.apache.spark.sql.functions.broadcast(deleteIds),
      data(dataKey) === deleteIds(deleteKey),
      "left_semi")

  /** k-anonymous aggregate release: aggregate `data` by `dims`, then
    * fold every cell with fewer than k members into a single OTHER
    * cell per publication (the small-cell suppression a privacy review
    * requires before an aggregate leaves the boundary — cells of 1-2
    * users re-identify them). The fold cell itself is released only
    * when ITS total reaches k — otherwise the suppressed mass would be
    * a sub-k published cell, the exact leak this operator exists to
    * close — so totals are preserved exactly whenever the fold cell
    * appears, and the withheld remainder is < k records by
    * construction.
    *
    * Scale: one map-side-combined aggregation to |cells| rows; the
    * suppression regroup runs over the aggregated cells, not the data.
    */
  def kAnonymize(data: DataFrame, dims: Seq[String], k: Long,
      other: String = "OTHER"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 1, "k must be >= 1")
    val cells = data.groupBy(dims.map(col): _*).agg(count(lit(1)).as("n"))
    val masked = cells.select(
      dims.map(dim => when(col("n") >= k, col(dim).cast("string"))
        .otherwise(lit(other)).as(dim)) :+ col("n"): _*)
    masked.groupBy(dims.map(col): _*)
      .agg(sum(col("n")).as("n"))
      // the fold cell is the one with every dim sentineled (callers
      // must pick a sentinel outside the dims' value domain)
      .withColumn("suppressed", dims.map(c => col(c) === other).reduce(_ && _))
      .filter(!col("suppressed") || col("n") >= k)
  }
}
