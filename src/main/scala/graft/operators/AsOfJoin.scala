package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the single right row with
  * the greatest rightTs <= leftTs for the same key (the
  * latest-dimension-version-at-event-time enrichment a training-data
  * pipeline needs for slowly-changing metadata).
  *
  * Built by composition (preference order (a) — no custom SparkPlan
  * needed): union both sides tagged, ONE shuffle + sort on the key,
  * `last(payload_struct, ignoreNulls)` carries the most recent right
  * payload forward, keep left rows. Payload columns travel in one
  * struct so they always come from the SAME right row.
  *
  * Scale: exactly one exchange (hash by key) + one sort — the same
  * cost as a sort-merge join, but with no unbounded probe-side
  * buffering for skewed keys; right-side ts ties should be resolved by
  * the caller (unique (key, ts)) for fully deterministic payloads.
  */
object AsOfJoin {

  def asOfLeft(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Map[String, Column]): DataFrame = {
    val payloadNames = payload.keys.toSeq.sorted
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", col(leftTs).cast("timestamp"))
      .withColumn("_tag", lit(1))
      .withColumn("_payload", lit(null).cast("string")) // replaced below

    val rightStruct = struct(payloadNames.map(n => payload(n).as(n)): _*)
    val taggedRight = right
      .select(
        col(rightKey).as("_k"),
        col(rightTs).cast("timestamp").as("_ts"),
        lit(0).as("_tag"),
        rightStruct.as("_rp"))

    // align schemas for union: left gets a null right-payload struct
    val l = taggedLeft.drop("_payload")
      .withColumn("_rp", lit(null).cast(taggedRight.schema("_rp").dataType))
      .select((Seq("_k", "_ts", "_tag", "_rp").map(col) ++ leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    val r = taggedRight
      .select((Seq("_k", "_ts", "_tag", "_rp").map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)

    // right rows sort before left rows at equal ts (inclusive <=)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++
        payloadNames.map(n => col(s"_match.$n").as(n)): _*)
  }
}
