package graft.functions

import graft.SparkSpec

/** Property check: the distributed bucket-weight fit + broadcast-join
  * scoring must equal a naive single-machine implementation using the
  * same FNV bigram hashes, on 40 random corpora.
  */
class ImportancePropSpec extends SparkSpec {

  private val n = 2
  private val buckets = 512 // small enough to force bucket collisions

  private def naiveGramBuckets(text: String): Seq[Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    (0 to toks.length - n).map { i =>
      val h = Fnv64Ops.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks.slice(i, i + n).mkString(" ")))
      ((h % buckets) + buckets) % buckets
    }
  }

  test("scores equal the naive definition on 40 random corpora") {
    val s = spark
    import s.implicits._
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 1 to 40) {
      val rnd = new scala.util.Random(seed * 131)
      def doc() = Array.fill(1 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val target = Seq.fill(3 + rnd.nextInt(4))(doc())
      val raw = (1L to (3 + rnd.nextInt(5)).toLong).map(id => id -> doc())

      // naive fit + score
      val tc = target.flatMap(naiveGramBuckets).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val rc = raw.flatMap(d => naiveGramBuckets(d._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      def w(b: Long): Long =
        ((tc.getOrElse(b, 0L) + 1) * Importance.WeightScale) /
          (rc.getOrElse(b, 0L) + 1)
      val want = raw.map { case (id, t) =>
        val gs = naiveGramBuckets(t)
        (id, gs.size.toLong, gs.map(w).sum)
      }.sortBy(_._1)

      val weights = Importance.bucketWeights(
        target.toDF("text"), "text", raw.toDF("id", "text"), "text",
        n, buckets)
      val got = Importance
        .score(raw.toDF("id", "text"), "id", "text", weights, n, buckets)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want, s"seed=$seed raw=$raw target=$target")
    }
  }
}
