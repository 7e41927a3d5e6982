package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark shuffle join join join"),
    (1L, "spark filter scan"),
    (2L, "shuffle shuffle shuffle scan filter"),
    (3L, "join scan"),
    (4L, "the the the the the the the the the the")
  ).toDF("doc_id", "text")

  /** Naive in-memory replay of the documented scoring math. */
  private def naive(queryTerms: Seq[String], qid: Long, k1: Double = 1.2,
      b: Double = 0.75): Map[Long, Long] = {
    val docs = Seq(
      0L -> "spark shuffle join join join", 1L -> "spark filter scan",
      2L -> "shuffle shuffle shuffle scan filter", 3L -> "join scan",
      4L -> "the the the the the the the the the the")
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val n = docs.size.toLong
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val dfm = docs.flatMap { case (_, ts) => ts.distinct }.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    docs.filter(_._1 != qid).map { case (id, ts) =>
      val dl = ts.size.toLong
      val score = queryTerms.distinct.flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0 || !dfm.contains(t)) None
        else {
          val df = dfm(t)
          val idfq = math.floor((2 * n - 2 * df + 1).toDouble * Bm25.Scale.toDouble
            / (2 * df + 1).toDouble)
          Some(math.floor((idfq * (tf.toDouble * (k1 + 1.0)))
            / (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))).toLong)
        }
      }.sum
      id -> score
    }.filter(_._2 > 0).toMap
  }

  test("topK matches the naive replay of the documented math") {
    val queries = Seq((0L, "spark join absent")).toDF("doc_id", "text")
    val got = Bm25.topK(corpus, queries, "doc_id", "text", "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(got === naive(Seq("spark", "join", "absent"), qid = 0L))
  }

  test("ranking is deterministic: score desc, doc_id asc tie-break") {
    val queries = Seq((99L, "scan")).toDF("doc_id", "text")
    // scan appears once in docs 1, 2, 3 (same tf); shorter docs rank first,
    // equal-length docs 1 vs 3: doc 3 is shorter (dl=2) than doc 1 (dl=3)
    val rows = Bm25.topK(corpus, queries, "doc_id", "text", "doc_id", "text", k = 10)
      .orderBy("rank").collect()
    assert(rows.map(_.getLong(2)).toSeq === Seq(3L, 1L, 2L))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
  }

  test("maxDf prunes stopword posting lists") {
    val queries = Seq((99L, "the spark")).toDF("doc_id", "text")
    // 'the' df=1 here, but cap at df<=0 style check: use a corpus where
    // 'spark' df=2 and cap maxDf=1 -> only rarer terms score
    val got = Bm25.topK(corpus, queries, "doc_id", "text", "doc_id", "text",
      k = 10, maxDf = 1)
    // spark has df=2 (docs 0,1) -> pruned; 'the' df=1 -> doc 4 only
    assert(got.select("doc_id").as[Long].collect().toSeq === Seq(4L))
  }

  test("query's own doc is excluded; k bounds the output") {
    val queries = corpus.filter(col("doc_id") === 0)
    val got = Bm25.topK(corpus, queries, "doc_id", "text", "doc_id", "text", k = 2)
      .collect()
    assert(!got.map(_.getLong(2)).contains(0L))
    assert(got.length <= 2)
  }

  test("mergeIndex: delta-wins replacement equals a full rebuild") {
    val stale = corpus.withColumn("text",
      when(col("doc_id") % 2 === 0, concat(col("text"), lit(" junk junk")))
        .otherwise(col("text")))
    val merged = Bm25.mergeIndex(Bm25.index(stale, "doc_id", "text"),
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val rebuilt = Bm25.index(corpus, "doc_id", "text")
    val m = merged.collect().map(r => (r.getLong(0), r.getString(2), r.getLong(1), r.getLong(3))).toSet
    val f = rebuilt.collect().map(r => (r.getLong(0), r.getString(2), r.getLong(1), r.getLong(3))).toSet
    assert(m === f)
  }

  test("empty-text docs never match and drop out of corpus stats") {
    val c2 = corpus.union(Seq((5L, "")).toDF("doc_id", "text"))
    val queries = Seq((99L, "spark")).toDF("doc_id", "text")
    val a = Bm25.topK(corpus, queries, "doc_id", "text", "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    val b = Bm25.topK(c2, queries, "doc_id", "text", "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
  }
}
