package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("split fractions approximately honored, assignment deterministic") {
    val df = (1L to 10000L).toDF("id")
    val out = Splits.split(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
    // deterministic under repartition
    val again = Splits.split(df.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("growing the dataset never reassigns existing records") {
    val small = (1L to 1000L).toDF("id")
    val big = (1L to 5000L).toDF("id")
    val fr = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Splits.split(small, "id", fr).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.split(big, "id", fr).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("validation: fractions must not exceed 1") {
    intercept[IllegalArgumentException](
      Splits.assign(lit(1L), Seq("a" -> 0.9, "b" -> 0.3)))
  }
}
