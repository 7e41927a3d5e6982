package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sketch-based aggregation (HLL via approx_count_distinct): the
  * cardinality path for 100 TB where exact countDistinct's shuffle is
  * the bottleneck. Asserted against exact counts within the configured
  * rsd, on real tables.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within rsd of exact on events.user_id") {
    val ev = Tables.load(spark, sf(), "events")
    val exact = ev.select(countDistinct($"user_id")).head.getLong(0)
    val approx = ev.select(approx_count_distinct($"user_id", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("partial-mergeable: approx over unioned halves equals approx over whole") {
    val ev = Tables.load(spark, sf(), "events")
    val whole = ev.select(approx_count_distinct($"user_id", 0.02)).head.getLong(0)
    val halves = ev.filter($"event_id" < 500)
      .union(ev.filter($"event_id" >= 500))
      .select(approx_count_distinct($"user_id", 0.02)).head.getLong(0)
    assert(whole == halves) // HLL merge is exact over the same rows
  }
}
