package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column profiler: exact counts on known data, approx mode bounds. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
    .toDF("id", "s")

  test("exact profile: rows, nulls, distincts, range per column") {
    val out = Profile.profile(df, Seq("id", "s")).orderBy("column").collect()
    val byCol = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(byCol("id") == ((4L, 0L, 4L, "1", "4")))
    // count(DISTINCT) and min/max skip NULLs
    assert(byCol("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("approx mode stays within the sketch bound") {
    val big = spark.range(10000).select(col("id"), (col("id") % 97).as("m"))
    val out = Profile.profile(big, Seq("m"), exact = false).head()
    val est = out.getLong(3)
    assert(math.abs(est - 97) <= 97 * 0.1, s"estimate $est too far from 97")
  }
}
