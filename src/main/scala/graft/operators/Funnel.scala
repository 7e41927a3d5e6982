package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) matching — the event-pattern capability
  * SQL engines expose as MATCH_RECOGNIZE and Spark has no native
  * operator for: for each key, greedily match the earliest occurrence
  * of step 1, then the earliest step-2 event strictly after it within
  * `maxGapMs`, and so on. Greedy-earliest is the standard funnel
  * definition (it maximizes downstream completion under a gap cap for
  * single-match-per-key semantics).
  *
  * Built by composition — one filtered min-aggregation per step plus a
  * key-equi-join to carry the previous step's anchor: k steps = k hash
  * shuffles on the key, each over only that step's event slice (the
  * type filter prunes at the scan). No per-key event buffering, no
  * window sort over the whole stream — unlike a collect_list approach
  * this never materializes a key's full history, so a bot key with
  * 10^8 events costs its aggregations, not memory.
  */
object Funnel {

  /** Per-key funnel over `steps` event types, timestamps in `msCol`
    * (epoch millis, exact longs). Output: key, t1..tk (nullable ms),
    * n_steps completed.
    */
  def funnel(df: DataFrame, keyCol: String, typeCol: String, msCol: String,
      steps: Seq[String], maxGapMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // step 1: earliest occurrence per key
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(col(msCol)).as("t1"))
    val matched = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        // earliest qualifying event per key AFTER that key's previous
        // anchor: join the step slice to the anchors, then min
        val nexts = df.filter(col(typeCol) === step)
          .select(col(keyCol), col(msCol).as("_ms"))
          .join(acc.select(col(keyCol), col(prev)), Seq(keyCol))
          .filter(col("_ms") > col(prev) &&
            col("_ms") <= col(prev) + maxGapMs)
          .groupBy(col(keyCol))
          .agg(min(col("_ms")).as(cur))
        acc.join(nexts, Seq(keyCol), "left")
    }
    val stepCols = (1 to steps.size).map(i => col(s"t$i"))
    matched.withColumn("n_steps",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("long"))
  }
}
