package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property suite: the distributed largest-remainder apportionment
  * against a naive single-machine replay on random group structures.
  */
class QuotaSamplePropSpec extends SparkSpec {
  import spark.implicits._

  private def naiveQuota(sizes: Map[String, Long], k: Long): Map[String, Long] = {
    val n = sizes.values.sum
    val base = sizes.map { case (g, s) => g -> s * k / n }
    val deficit = (k - base.values.sum).toInt
    val topUp = sizes.keys.toSeq
      .sortBy(g => (-((sizes(g) * k) % n), g))
      .take(deficit)
    base ++ topUp.map(g => g -> (base(g) + 1L))
  }

  test("quotas == naive largest-remainder on 25 random group structures") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 25) {
      val nGroups = 1 + rnd.nextInt(12)
      val sizes = (0 until nGroups)
        .map(g => s"g$g" -> (1L + rnd.nextInt(40))).toMap
      val total = sizes.values.sum
      val k = rnd.between(0L, total + 1)
      val rows = sizes.toSeq.flatMap { case (g, s) =>
        (0L until s).map(i => (g, g.hashCode.toLong * 1000 + i))
      }
      val df = rows.toDF("g", "id")
      val got = QuotaSample.quotaSample(df, "g", "id", k)
        .groupBy("g").agg(first("quota").as("q"), count(lit(1)).as("drawn"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val want = naiveQuota(sizes, k)
      got.foreach { case (g, q, drawn) =>
        assert(q === want(g), s"trial $trial group $g: quota $q != ${want(g)} (k=$k sizes=$sizes)")
        assert(drawn === q, s"trial $trial group $g drew $drawn != quota $q")
      }
      // groups absent from the draw must have been allocated zero
      (want.keySet -- got.map(_._1).toSet).foreach { g =>
        assert(want(g) === 0L, s"trial $trial group $g allocated ${want(g)} but drew nothing")
      }
      assert(got.map(_._3).sum === k, s"trial $trial: total drawn != k")
    }
  }
}
