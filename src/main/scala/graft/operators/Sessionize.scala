package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analog of the streaming
  * stateful operator (SURVEY.md §2.8: the reference has no event-time
  * windows; its streaming commit is flush-interval based, so session
  * semantics are net-new Spark-first capability).
  *
  * Gap comparison uses exact integer microseconds (unix_micros), never
  * seconds-truncated or floating-point timestamps — deterministic and
  * oracle-matchable.
  *
  * Scale: two window functions over the same (user, ts) ordering — one
  * shuffle on the user key, sort amortized across both windows.
  */
object Sessionize {

  /** Adds a `session_id` column: consecutive events of one key whose
    * gaps are <= gapMicros share a session; ids are 1-based per key.
    */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val newSession = when(
      prev.isNull || (unix_micros(col(tsCol)) - prev) > gapMicros, 1L).otherwise(0L)
    df.withColumn("_new_s", newSession)
      .withColumn("session_id",
        sum(col("_new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_s")
  }

  /** Session summary: one row per (key, session). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, gapMicros: Long): DataFrame =
    assignSessions(df, keyCol, tsCol, tieBreak, gapMicros)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
