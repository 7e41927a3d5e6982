package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact counts for keys above n/k, nothing below") {
    // 600 hot + 250 warm + 150 spread over 15 singles-ish keys; n=1000
    val rows = Seq.fill(600)("hot") ++ Seq.fill(250)("warm") ++
      (1 to 150).map(i => s"cold${i % 15}")
    val df = rows.toDF("w").repartition(8)
    val got = HeavyHitters.heavyHitters(df, col("w"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // threshold: cnt * 5 > 1000 => cnt > 200
    assert(got === Map("hot" -> 600L, "warm" -> 250L))
  }

  test("guarantee holds under adversarial partitioning") {
    // the hot key is a minority in EVERY partition (paired with
    // partition-local noise), so per-partition top-1 would miss it —
    // the merged Misra-Gries summary must not
    val rows = (0 until 40).flatMap { p =>
      Seq.fill(30)(s"noise_$p") ++ Seq.fill(26)("globally_hot")
    }
    val df = rows.toDF("w").repartition(40)
    val n = rows.size // 2240; globally_hot = 1040 > n/3 ~ 747
    val got = HeavyHitters.heavyHitters(df, col("w"), k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("globally_hot" -> 1040L))
    assert(1040L * 3 > n)
  }

  test("empty input and no-qualifier input return empty") {
    val empty = Seq.empty[String].toDF("w")
    assert(HeavyHitters.heavyHitters(empty, col("w"), 3).count() === 0)
    // uniform: no key exceeds n/k
    val uniform = (1 to 100).map(i => s"u$i").toDF("w")
    assert(HeavyHitters.heavyHitters(uniform, col("w"), 10).count() === 0)
    intercept[IllegalArgumentException](
      HeavyHitters.heavyHitters(uniform, col("w"), 0))
  }

  test("nulls are ignored, not counted") {
    val df = (Seq.fill(9)(Some("a")) :+ Option.empty[String]).toDF("w")
    val got = HeavyHitters.heavyHitters(df, col("w"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 9L)) // n = 9 non-null, 9 * 2 > 9
  }
}
