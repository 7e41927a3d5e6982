package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(d: org.apache.spark.sql.DataFrame, k: Int, min: Int = 0) =
    SubstringDedup
      .duplicatedSpans(d, "doc_id", "text", k, min)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("shared substring across two docs is found in both, exact bounds") {
    // "c d e f" (4 tokens) shared; k=3 anchors at 2 positions each
    val d = df(
      (1L, "a b c d e f g"),
      (2L, "x c d e f y z"))
    assert(spans(d, 3) === Seq((1L, 2L, 5L), (2L, 1L, 4L)))
  }

  test("no duplication -> no spans; docs shorter than k are skipped") {
    val d = df((1L, "a b c d"), (2L, "e f g h"), (3L, "x y"))
    assert(spans(d, 3).isEmpty)
  }

  test("within-document repeat counts as duplication") {
    val d = df((1L, "p q r z z p q r"))
    assert(spans(d, 3) === Seq((1L, 0L, 2L), (1L, 5L, 7L)))
  }

  test("overlapping anchor runs merge into one maximal span") {
    // whole 5-token run shared -> one span, not three gram-sized ones
    val d = df(
      (1L, "m n o p q tail1 tail2"),
      (2L, "head m n o p q"))
    assert(spans(d, 3) === Seq((1L, 0L, 4L), (2L, 1L, 5L)))
  }

  test("disjoint duplicated regions stay separate rows") {
    val d = df(
      (1L, "a b c GAP1 GAP2 GAP3 d e f"),
      (2L, "a b c OTHER1 OTHER2 OTHER3 d e f"))
    assert(spans(d, 3) === Seq(
      (1L, 0L, 2L), (1L, 6L, 8L),
      (2L, 0L, 2L), (2L, 6L, 8L)))
  }

  test("minSpanTokens filters short spans") {
    val d = df(
      (1L, "a b c d e f g"),
      (2L, "x c d e f y z"))
    assert(spans(d, 3, min = 5).isEmpty)
    assert(spans(d, 3, min = 4).nonEmpty)
  }

  test("removeSpans drops all occurrences and counts dup tokens") {
    val d = df(
      (1L, "a b c d e f g"),
      (2L, "x c d e f y z"),
      (3L, "solo only here"))
    val out = SubstringDedup
      .removeSpans(d, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_dup_tokens", "clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Seq(
      (1L, 7L, 4L, "a b g"),
      (2L, 7L, 4L, "x y z"),
      (3L, 3L, 0L, "solo only here")))
  }

  test("null text survives removeSpans without poisoning counts") {
    val d = df((1L, "a b c d e f"), (2L, null))
    val out = SubstringDedup
      .removeSpans(d, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_dup_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Seq((1L, 0L), (2L, 0L)))
  }

  test("incremental: batch-2 span found only via the ledger, additions exclude known fps") {
    val s = spark
    import s.implicits._
    val emptyLedger = Seq.empty[String].toDF("fp")
    // batch 1: boilerplate appears ONCE -> no spans, all fps to ledger
    val b1 = df((1L, "alpha beta gamma delta epsilon zeta"))
    val (spans1, led1) = SubstringDedup
      .duplicatedSpansIncremental(b1, "doc_id", "text", 3, emptyLedger)
    assert(spans1.count() === 0)
    assert(led1.count() === 4) // 6 tokens -> 4 trigrams
    // batch 2: same run appears once IN the batch, but is in the ledger
    val b2 = df(
      (2L, "x alpha beta gamma delta y"),
      (3L, "totally different words here now"))
    val (spans2, led2) = SubstringDedup
      .duplicatedSpansIncremental(b2, "doc_id", "text", 3, led1)
    val got = spans2.orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((2L, 1L, 4L))) // "alpha beta gamma delta"
    // additions: batch-2 fps minus the ones already in the ledger
    val led2fps = led2.collect().map(_.getString(0)).toSet
    assert(led2.count() > 0)
    assert(led1.collect().map(_.getString(0)).toSet
      .intersect(led2fps).isEmpty)
    // within-batch duplication still detected with a ledger present
    val b3 = df(
      (4L, "p q r s t u"),
      (5L, "m p q r s n"))
    val (spans3, _) = SubstringDedup
      .duplicatedSpansIncremental(b3, "doc_id", "text", 3, led1)
    assert(spans3.count() === 2) // "p q r s" in both docs
  }

  test("incremental with empty ledger equals the batch definition") {
    val s = spark
    import s.implicits._
    val d = df(
      (1L, "a b c d e f g"),
      (2L, "x c d e f y z"),
      (3L, "nothing shared at all here"))
    val batch = SubstringDedup.duplicatedSpans(d, "doc_id", "text", 3)
      .orderBy("doc_id", "span_start").collect().toSeq
    val (inc, _) = SubstringDedup.duplicatedSpansIncremental(
      d, "doc_id", "text", 3, Seq.empty[String].toDF("fp"))
    assert(inc.orderBy("doc_id", "span_start").collect().toSeq === batch)
  }

  test("plan shape: no cartesian/BNLJ, two shuffles for spans") {
    val d = df((1L, "a b c d e f g"), (2L, "x c d e f y z"))
    val plan = SubstringDedup
      .duplicatedSpans(d, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("invalid k rejected") {
    val d = df((1L, "a b"))
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(d, "doc_id", "text", 1)
    }
  }
}
