package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuotaSampleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 100L).map { i =>
    val g = if (i <= 50) "a" else if (i <= 80) "b" else if (i <= 95) "c" else "d"
    (i, g)
  }.toDF("id", "g")

  test("quotas sum to exactly k and are within 1 of exact proportion") {
    val sel = QuotaSample.quotaSample(docs, "g", "id", k = 7)
    val perGroup = sel.groupBy("g").agg(count(lit(1)).as("n"), first("quota").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perGroup.map(_._2).sum === 7L)
    perGroup.foreach { case (g, n, q) =>
      assert(n === q, s"group $g drew $n != quota $q")
    }
    // proportionality: |quota - k*n_g/N| < 1 (largest-remainder bound)
    val ng = Map("a" -> 50.0, "b" -> 30.0, "c" -> 15.0, "d" -> 5.0)
    perGroup.foreach { case (g, _, q) =>
      assert(math.abs(q - 7.0 * ng(g) / 100.0) < 1.0, s"group $g quota $q")
    }
  }

  test("k equal to corpus size selects everything; k=0 selects nothing") {
    assert(QuotaSample.quotaSample(docs, "g", "id", k = 100).count() === 100L)
    assert(QuotaSample.quotaSample(docs, "g", "id", k = 0).count() === 0L)
  }

  test("k beyond the corpus size errors instead of under-delivering silently") {
    val e = intercept[Exception] {
      QuotaSample.quotaSample(docs, "g", "id", k = 101).collect()
    }
    assert(e.getMessage.contains("exceeds") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds")), e.getMessage)
  }

  test("null group keys draw their allocation like any group (null-safe join)") {
    val withNull = docs.withColumn("g",
      when(col("id") <= 10, null).otherwise(col("g")))
    val sel = QuotaSample.quotaSample(withNull, "g", "id", k = 50)
    assert(sel.count() === 50L, "null group's allocation must not silently vanish")
    // the null group (10 of 100 rows) gets its proportional 5
    assert(sel.filter(col("g").isNull).count() === 5L)
  }

  test("empty corpus with k > 0 throws the budget-exceeds error, not an empty frame") {
    val e = intercept[IllegalArgumentException] {
      QuotaSample.quotaSample(docs.filter(lit(false)), "g", "id", k = 5)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    // k = 0 over an empty corpus is legitimately empty
    assert(QuotaSample.quotaSample(docs.filter(lit(false)), "g", "id", k = 0)
      .count() === 0L)
  }

  test("draw is deterministic across runs") {
    def ids = QuotaSample.quotaSample(docs, "g", "id", k = 13)
      .select("id").as[Long].collect().toSet
    assert(ids === ids)
    assert(ids.size === 13)
  }
}
