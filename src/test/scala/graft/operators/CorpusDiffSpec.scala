package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed/unchanged per stratum") {
    val v1 = Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"),
      (4L, "de", "d")).toDF("id", "lang", "txt")
    val v2 = Seq((1L, "en", "a"), (2L, "en", "B2"), (5L, "de", "e"))
      .toDF("id", "lang", "txt")
    val got = CorpusDiff.diff(v1, v2, "id", xxhash64(col("txt")), col("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: 1 unchanged, 2 changed; de: 3+4 removed, 5 added
    assert(got("en") === ((0L, 0L, 1L, 1L)))
    assert(got("de") === ((1L, 2L, 0L, 0L)))
  }

  test("a doc that moves stratum counts under its NEW stratum") {
    val v1 = Seq((1L, "en", "same")).toDF("id", "lang", "txt")
    val v2 = Seq((1L, "de", "same")).toDF("id", "lang", "txt")
    val got = CorpusDiff.diff(v1, v2, "id", xxhash64(col("txt")), col("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got === Map("de" -> 1L))
  }
}
