package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the dataset health report run before
  * committing a corpus to training: per column, row/null/distinct
  * counts and the value range, computed in ONE aggregation pass and
  * melted to long format (a per-column job per metric is the shape
  * that does not survive 100 TB).
  *
  * `exact = true` uses exact distinct counts (multiple distincts in
  * one aggregate plan through Spark's expand — fine for gates and
  * small dims); at warehouse scale pass `exact = false` for
  * `approx_count_distinct`, which keeps the pass single-shuffle with
  * no expand multiplier.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    def distinctOf(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    val aggs = columns.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"nulls_$c"),
        distinctOf(col(c)).as(s"distinct_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = columns.flatMap(c => Seq(
      lit(c), struct(
        col(s"nulls_$c").as("n_nulls"),
        col(s"distinct_$c").as("n_distinct"),
        col(s"min_$c").as("min_repr"),
        col(s"max_$c").as("max_repr"))))
    wide.select(col("n_rows"), explode(map(pairs: _*)).as(Seq("column", "m")))
      .select(col("column"), col("n_rows"),
        col("m.n_nulls").as("n_nulls"),
        col("m.n_distinct").as("n_distinct"),
        col("m.min_repr").as("min_repr"), col("m.max_repr").as("max_repr"))
  }
}
