package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank over a total order WITHOUT the single-partition window
  * trap. A bare `row_number() OVER (ORDER BY ...)` collapses its whole
  * input into ONE task; this is the distributed re-expression
  * ([[BudgetSelect]] pioneered the shape for running sums):
  *
  *   1. `repartitionByRange` on the order (partition p's rows all
  *      precede partition p+1's in the total order),
  *   2. per-partition `row_number` via a window PARTITIONED by the
  *      range-partition id (parallel, no global sort task),
  *   3. per-partition row counts collected to the driver
  *      (O(parallelism) longs, never O(data)) and broadcast back as
  *      literal prefix offsets.
  *
  * The order MUST be total (include a unique tiebreaker column):
  * global ranks over a total order are partition-assignment-invariant,
  * so the sampled range boundaries can't change the result — only the
  * two-pass CONSISTENCY needs pinning, which the eager localCheckpoint
  * provides (range boundary sampling is re-drawn per evaluation;
  * without the checkpoint the count pass and the window pass could see
  * different assignments and the offsets would be wrong).
  */
object GlobalOrder {

  /** `df` plus a LongType `outCol` = 1-based global rank by `order`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      partitions: Int = 0): DataFrame =
    withRowNumberCounted(df, order, outCol, partitions)._1

  /** [[withRowNumber]] plus the TOTAL row count — free here (the
    * prefix-offset pass already collects per-partition counts), and it
    * saves callers that need n (ntile-style staging) a second scan.
    */
  def withRowNumberCounted(df: DataFrame, order: Seq[Column], outCol: String,
      partitions: Int = 0): (DataFrame, Long) = {
    require(order.nonEmpty, "global rank needs at least one order column")
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("_gpid", spark_partition_id())
      .localCheckpoint(true)
    val cnts = ranged.groupBy(col("_gpid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      cnts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
        .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
        .toMap
    val offCol = cnts.foldLeft(lit(0L)) { case (c, (pid, _)) =>
      when(col("_gpid") === pid, lit(offsets.getOrElse(pid, 0L))).otherwise(c)
    }
    val w = Window.partitionBy(col("_gpid")).orderBy(order: _*)
    val out = ranged
      .withColumn(outCol, row_number().over(w).cast("long") + offCol)
      .drop("_gpid")
    (out, cnts.map(_._2).sum)
  }
}
