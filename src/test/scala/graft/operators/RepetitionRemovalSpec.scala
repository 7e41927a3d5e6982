package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepetitionRemovalSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("repeatedSpansWithinDoc finds only within-doc repeats, not cross-doc") {
    // docs 1 and 2 share their whole text (cross-doc dup), but only
    // doc 3 repeats a >= 10-token run inside itself
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, s"$base $base"),
      (4L, "short text")).toDF("id", "text")
    val spans = RepetitionRemoval
      .repeatedSpansWithinDoc(docs, "id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 3: both copies merge into one island covering all 40 tokens
    assert(spans.toSeq === Seq((3L, 0L, 39L)))
  }

  test("clean classifies drop/trim/keep and accounts tokens exactly") {
    val spam = Seq.fill(20)("buy now click here fast").mkString(" ")
    val trimmable = s"$base $base"
    val docs = Seq(
      (1L, base),       // keep: all trigrams distinct
      (2L, trimmable),  // trim: ratio 20/38 > 0.1, but <= 0.6 drop bar
      (3L, spam))       // drop: ratio (100-2-3)/98 ~ 0.97
      .toDF("id", "text")
    val got = RepetitionRemoval
      .clean(docs, "id", "text", dupN = 3, dropAbove = 0.6,
        trimK = 10, trimAbove = 0.1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("action"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_tokens"),
        r.getAs[String]("clean_text")))
    assert(got(0) === ((1L, "keep", 20L, 0L, base)))
    // trim deletes ALL occurrences of the repeated span (ExactSubstr)
    assert(got(1)._2 === "trim" && got(1)._3 === 40L && got(1)._4 === 40L)
    assert(got(1)._5 === "")
    assert(got(2)._2 === "drop" && got(2)._4 === got(2)._3)
    assert(got(2)._5 == null)
  }

  test("trim removes the repeated tail but keeps the unique head") {
    val doc = s"unique head words here then $base $base"
    val got = RepetitionRemoval
      .clean(Seq((1L, doc)).toDF("id", "text"), "id", "text",
        dupN = 3, dropAbove = 0.9, trimK = 10, trimAbove = 0.05)
      .collect().head
    assert(got.getAs[String]("action") === "trim")
    assert(got.getAs[String]("clean_text") === "unique head words here then")
    assert(got.getAs[Long]("n_dup_tokens") === 40L)
  }

  test("invalid thresholds rejected") {
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException](
      RepetitionRemoval.clean(df, "id", "text", dropAbove = 0.1, trimAbove = 0.2))
    intercept[IllegalArgumentException](
      RepetitionRemoval.repeatedSpansWithinDoc(df, "id", "text", k = 1))
  }
}
