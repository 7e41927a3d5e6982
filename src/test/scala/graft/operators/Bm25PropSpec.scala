package graft.operators

import graft.SparkSpec

/** Property suite: Bm25.topK against a from-scratch in-memory replay
  * of the documented scoring math on random corpora (same device as
  * SubstringDedupPropSpec / ImportancePropSpec — the operator's
  * distributed joins/aggregations must reproduce the naive
  * single-machine definition exactly, scores included).
  */
class Bm25PropSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")

  private def naiveTopK(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, qTerms: Int, k1: Double, b: Double): Map[(Long, Long), (Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val n = toks.size.toLong
    if (n == 0) return Map.empty
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfm = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    (for {
      (qid, qtext) <- queries
      qts = qtext.split(" ").filter(_.nonEmpty).take(qTerms).distinct.toSeq
      scored = toks.filter(_._1 != qid).flatMap { case (did, ts) =>
        val contribs = qts.flatMap { t =>
          val tf = ts.count(_ == t).toLong
          if (tf == 0 || !dfm.contains(t)) None
          else {
            val df = dfm(t)
            val idfq = math.floor(
              (2 * n - 2 * df + 1).toDouble * Bm25.Scale.toDouble / (2 * df + 1).toDouble)
            Some(math.floor((idfq * (tf.toDouble * (k1 + 1.0)))
              / (tf.toDouble + k1 * ((1.0 - b) + b * (ts.size.toDouble / avgdl)))).toLong)
          }
        }
        if (contribs.isEmpty) None
        else Some((did, contribs.sum, contribs.size.toLong))
      }
      ranked = scored.sortBy { case (did, s, _) => (-s, did) }.take(k).zipWithIndex
      ((did, score, nt), i) <- ranked
    } yield (qid, did) -> (score, i + 1L)).toMap
  }

  test("topK == naive replay on 30 random corpora (scores AND ranks)") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 30) {
      val nDocs = 2 + rnd.nextInt(30)
      val corpus = (0L until nDocs.toLong).map { id =>
        val len = rnd.nextInt(25) // may be zero-length
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val queries = corpus.filter(_._1 % 3 == 0)
      val k = 1 + rnd.nextInt(6)
      val got = Bm25.topK(corpus.toDF("doc_id", "text"), queries.toDF("doc_id", "text"),
          "doc_id", "text", "doc_id", "text", k = k, qTerms = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(1))).toMap
      val want = naiveTopK(corpus, queries, k, qTerms = 4, k1 = 1.2, b = 0.75)
      assert(got === want, s"trial $trial: nDocs=$nDocs k=$k")
    }
  }
}
