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

  test("bloom: no false negatives on members, bounded FPR, empty build rejected") {
    val members = (1L to 2000L).toDF("k")
    val bits = Bloom.buildBloom(members, xxhash64($"k"), 2000L, 16000L)
    val misses = members.filter(!Bloom.mightContain(bits, xxhash64($"k"))).count()
    assert(misses == 0, "a bloom filter NEVER false-negatives")
    val absent = (100001L to 102000L).toDF("k")
    val fp = absent.filter(Bloom.mightContain(bits, xxhash64($"k"))).count()
    assert(fp <= 100, s"FPR at 8 bits/item should be ~2%, got $fp/2000")
    intercept[IllegalArgumentException](
      Bloom.buildBloom(members.filter($"k" < 0), xxhash64($"k"), 10L, 80L))
  }

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
