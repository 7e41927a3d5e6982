package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-cascade accounting: the attrition report a curation run
  * reads to see WHICH filter killed HOW MANY documents (FineWeb/CCNet
  * pipelines publish exactly this funnel next to every release).
  *
  * Stages are named predicates applied in order; a doc is alive at
  * stage i iff it passed stages 0..i. The whole funnel is ONE
  * aggregation pass — per-stage conditional sums over cumulative-AND
  * columns — not N filtered count jobs, so at 100 TB it costs one scan
  * regardless of stage count. The single aggregated row is unpivoted
  * to (stage, name, n_in, n_pass, n_fail) rows with `stack` (constant
  * folding; no driver round-trip, no second shuffle).
  *
  * Reference seam: RowLevelPolicy counters
  * (gobblin-core/.../qualitychecker/row/RowLevelPolicyCheckResults.java)
  * count per-policy failures independently; the funnel form adds the
  * ordered survivor accounting those counters can't express.
  */
object FilterFunnel {

  def report(docs: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // alive(i) = pred(0) AND ... AND pred(i), null-safe (null = fail)
    val alive = stages.scanLeft(lit(true)) { case (acc, (_, p)) =>
      acc && coalesce(p, lit(false))
    }.drop(1)
    // coalesce: a global sum over ZERO rows is NULL, and an empty
    // corpus must report a zero-count funnel, not null counts (callers
    // like JobConfig's curate summary read these as primitive longs)
    val aggs = stages.indices.flatMap { i =>
      val in = if (i == 0) lit(true) else alive(i - 1)
      Seq(coalesce(sum(when(in, 1L).otherwise(0L)), lit(0L)).as(s"_in$i"),
        coalesce(sum(when(alive(i), 1L).otherwise(0L)), lit(0L)).as(s"_pass$i"))
    }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    // Spark SQL string literals escape with BACKSLASH, not the SQL-
    // standard '' doubling — '' parses as two adjacent strings
    // concatenated (silently eating the quote)
    def q(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = stages.zipWithIndex.map { case ((name, _), i) =>
      s"CAST($i AS BIGINT), ${q(name)}, _in$i, _pass$i"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${stages.size}, $stackArgs) AS (stage, name, n_in, n_pass)")
      .withColumn("n_fail", col("n_in") - col("n_pass"))
  }
}
