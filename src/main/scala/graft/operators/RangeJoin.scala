package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point column joined to
  * right rows carrying [start, end) intervals — sessions, validity
  * windows, rate cards.
  *
  * Naive Spark planning for `point >= start AND point < end` is a
  * broadcast-nested-loop (quadratic). The scale path here is bin
  * compositing: both sides map to fixed-width time bins — right
  * intervals explode to every bin they overlap — then an EQUI-join on
  * (key, bin) plus the exact residual predicate. Shuffle cost is
  * O(rows x bins-per-interval); pick binWidth near the median interval
  * length so the explode factor stays small.
  */
object RangeJoin {

  /** Inner interval join on an optional equality key + containment.
    * `point`, `start`, `end` are epoch-micros long columns (cast
    * timestamps with unix_micros). binWidthMicros must be > 0.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      pointCol: String, startCol: String, endCol: String,
      binWidthMicros: Long): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    val l = left.withColumn("_bin", floor(col(pointCol) / binWidthMicros))
    val r = right.withColumn("_bin",
      explode(sequence(
        floor(col(startCol) / binWidthMicros),
        // end is exclusive: a range ending exactly on a bin edge does
        // not occupy the next bin
        floor((col(endCol) - 1) / binWidthMicros))))
    l.join(r, l("_bin") === r("_bin") && l(leftKey) === r(rightKey) &&
        l(pointCol) >= r(startCol) && l(pointCol) < r(endCol))
      .drop("_bin")
  }
}
