package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance via mergeable partial aggregates —
  * the materialized-view side of the reference's compaction/rollup
  * story (ref gobblin-compaction: recompaction folds a delta into a
  * previously published aggregate instead of recomputing from raw).
  *
  * State rows carry (dims..., cnt, sum_m, min_m, max_m) — each field
  * an associative, commutative summary, so `merge(state, delta)` is a
  * union + one re-aggregation and `merge(init(a), init(b)) ==
  * init(a union b)` exactly (longs, not floats). Derived values (avg)
  * are computed only at [[finalizeState]], never stored — the
  * standard partial/final split Spark itself uses inside
  * HashAggregate, lifted to cross-job persistence.
  *
  * Scale: `init` over a delta batch is map-side combined (linear scan,
  * one shuffle of |dims| combined rows); `merge` shuffles only
  * |state| + |delta-dims| aggregated rows — both independent of raw
  * history size, which is the point: a daily refresh of a 100 TB-raw
  * rollup costs one scan of the DAY, not the history.
  */
object IncrementalRollup {

  /** Partial-aggregate state for `measure` (an exact integral column)
    * grouped by `dims`.
    */
  def init(df: DataFrame, dims: Seq[String], measure: String): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(measure)).as("sum_m"),
        min(col(measure)).as("min_m"),
        max(col(measure)).as("max_m"))

  /** Fold a later state (e.g. `init` of a new batch) into an existing
    * one. Both sides must share the same dims/state schema.
    */
  def merge(state: DataFrame, delta: DataFrame, dims: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(dims.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_m")).as("sum_m"),
        min(col("min_m")).as("min_m"),
        max(col("max_m")).as("max_m"))

  /** Final values from state: exact longs plus the one derived float
    * (avg = one division of exact longs — deterministic cross-engine).
    */
  def finalizeState(state: DataFrame, dims: Seq[String]): DataFrame =
    state.select(
      dims.map(col) ++ Seq(
        col("cnt"), col("sum_m"), col("min_m"), col("max_m"),
        (col("sum_m").cast("double") / col("cnt")).as("avg_m")): _*)
}
