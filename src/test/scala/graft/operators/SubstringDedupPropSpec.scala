package graft.operators

import graft.SparkSpec

/** Property check: on random small corpora from a tiny vocabulary
  * (forcing natural k-gram collisions), the distributed k-gram
  * anchoring + island merge must equal a NAIVE single-machine
  * reference that marks duplicated windows by string comparison and
  * merges runs by hand. 60 random corpora x 2 gram sizes.
  */
class SubstringDedupPropSpec extends SparkSpec {

  private def naiveSpans(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val grams = for {
      (id, ts) <- toks
      i <- 0 to ts.length - k
    } yield (id, i, ts.slice(i, i + k).mkString(" "))
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = grams.filter(g => counts(g._3) > 1)
    dup.groupBy(_._1).toSeq.flatMap { case (id, sites) =>
      val starts = sites.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for (s <- starts) {
        val e = s + k - 1
        if (spans.nonEmpty && s <= spans.last._2 + 1)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e))
        else spans += ((s, e))
      }
      spans.map { case (s, e) => (id, s.toLong, e.toLong) }
    }.sorted
  }

  test("duplicatedSpans equals the naive definition on 60 random corpora") {
    val s = spark
    import s.implicits._
    val vocab = Array("a", "b", "c", "d", "e")
    for (seed <- 1 to 60; k <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed * 31 + k)
      val docs = (1L to (3 + rnd.nextInt(5)).toLong).map { id =>
        val n = 1 + rnd.nextInt(14) // includes docs shorter than k
        id -> Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = SubstringDedup
        .duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val want = naiveSpans(docs, k)
      assert(got === want, s"seed=$seed k=$k docs=$docs")
    }
  }

  test("incremental(batch, ledger) equals naive over the concatenated history") {
    val s = spark
    import s.implicits._
    val vocab = Array("x", "y", "z", "w")
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed * 97)
      def corpus(ids: Range) = ids.map { id =>
        id.toLong -> Array.fill(2 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val b1 = corpus(1 to 3)
      val b2 = corpus(10 to 13)
      val k = 2
      val (_, ledger) = SubstringDedup.duplicatedSpansIncremental(
        b1.toDF("doc_id", "text"), "doc_id", "text", k,
        Seq.empty[String].toDF("fp"))
      val (spans, _) = SubstringDedup.duplicatedSpansIncremental(
        b2.toDF("doc_id", "text"), "doc_id", "text", k, ledger)
      val got = spans.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      // naive: batch-2 window duplicated iff repeated in batch 2 or
      // present anywhere in batch 1
      val b1grams = (for {
        (_, t) <- b1
        ts = t.split(" ").toSeq
        i <- 0 to ts.length - k
      } yield ts.slice(i, i + k).mkString(" ")).toSet
      val b2toks = b2.map { case (id, t) => id -> t.split(" ").toSeq }
      val b2grams = for {
        (id, ts) <- b2toks
        i <- 0 to ts.length - k
      } yield (id, i, ts.slice(i, i + k).mkString(" "))
      val counts = b2grams.groupBy(_._3).view.mapValues(_.size).toMap
      val dup = b2grams.filter(g => counts(g._3) > 1 || b1grams(g._3))
      val want = dup.groupBy(_._1).toSeq.flatMap { case (id, sites) =>
        val spansB = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        for (st <- sites.map(_._2).sorted) {
          val e = st + k - 1
          if (spansB.nonEmpty && st <= spansB.last._2 + 1)
            spansB(spansB.length - 1) =
              (spansB.last._1, math.max(spansB.last._2, e))
          else spansB += ((st, e))
        }
        spansB.map { case (st, e) => (id, st.toLong, e.toLong) }
      }.sorted
      assert(got === want, s"seed=$seed b1=$b1 b2=$b2")
    }
  }
}
