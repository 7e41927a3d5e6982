package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep documents in priority order
  * until a global resource budget is exhausted — "give me the best
  * 500 B tokens of this corpus" (the selection step after importance /
  * quality scoring; DSIR and FineWeb-style pipelines end exactly here).
  *
  * Semantics: order docs by (priority DESC, id ASC); keep a doc iff
  * the running cost INCLUDING it is <= budget (docs past the first
  * straddler are dropped even if a later, smaller doc would still
  * fit — prefix semantics, not bin packing, so the result is a
  * deterministic cut line in the global order).
  *
  * 100 TB shape — a global running sum WITHOUT the single-partition
  * trap: a naive `sum over (ORDER BY ...)` window has no PARTITION BY,
  * so Spark collapses the whole corpus into ONE task. Instead:
  *   1. `repartitionByRange` on the priority order (range exchange —
  *      partition p's rows all precede partition p+1's),
  *   2. per-partition running sums via a window PARTITIONED by the
  *      range-partition id (parallel, one hash exchange),
  *   3. per-partition totals collected to the driver (numPartitions
  *      longs — O(parallelism), not O(data)) and turned into prefix
  *      offsets broadcast back as a literal map.
  * Total: two exchanges + one O(parallelism) driver scalar list.
  */
object BudgetSelect {

  /** Rows of `docs` that fit the budget, with their global `cum_cost`.
    * Cost and priority must be integral (exact arithmetic; the repo's
    * oracle discipline).
    */
  def selectByBudget(docs: DataFrame, idCol: String, costCol: String,
      priorityCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint(eager): the range exchange SAMPLES its bounds per
    // evaluation, so re-evaluating this subtree for the totals pass and
    // the window pass can assign boundary rows to different partitions
    // (measured: ~3% of rows moved between two evaluations at 20k) —
    // the prefix offsets would then be wrong. Both passes must read ONE
    // materialized assignment; the checkpoint is that materialization
    // (one extra write of the projected (id, cost, priority) columns,
    // not the full row — project before calling if rows are wide).
    val ordered = docs
      .withColumn("_cost", col(costCol).cast("long"))
      .repartitionByRange(n, col(priorityCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // per-partition totals -> prefix offsets (driver-side: n longs).
    // Null costs are rejected HERE (piggybacked on the same pass): a
    // null would vanish from sum() and ride the previous row's
    // cum_cost through the budget filter for free.
    val totals = ordered.groupBy(col("_pid"))
      .agg(sum(col("_cost")).as("_t"),
        count(when(col("_cost").isNull, lit(1))).as("_nulls"))
      .collect()
      .map { r =>
        require(r.getLong(2) == 0,
          s"costCol '$costCol' has ${r.getLong(2)} null/uncastable values " +
            s"(partition ${r.getInt(0)}); budget selection needs exact costs")
        (r.getInt(0), r.getLong(1))
      }.sortBy(_._1)
    val offsets: Map[Int, Long] =
      totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
        .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
        .toMap
    // a straggler partition id that somehow saw no rows offsets to 0
    val offsetCol = totals.foldLeft(lit(0L)) { case (c, (pid, _)) =>
      when(col("_pid") === pid, lit(offsets.getOrElse(pid, 0L))).otherwise(c)
    }
    val w = Window.partitionBy(col("_pid"))
      .orderBy(col(priorityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered
      .withColumn("cum_cost", sum(col("_cost")).over(w) + offsetCol)
      .filter(col("cum_cost") <= budget)
      .drop("_cost", "_pid")
  }
}
