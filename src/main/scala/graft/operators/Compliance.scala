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
}
