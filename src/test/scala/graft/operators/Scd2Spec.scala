package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dimOf(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    Scd2.fromChangelog(rows.toDF("k", "seq", "op", "price"),
      "k", "seq", "op", Seq("price"))

  private def canon(df: DataFrame): Set[(Long, Double, Long, Option[Long], Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet

  test("fromChangelog: upserts chain, delete closes without a row") {
    val dim = dimOf(Seq(
      (1L, 10L, "U", 1.0), (1L, 20L, "U", 2.0), (1L, 30L, "D", 0.0),
      (2L, 15L, "U", 5.0)))
    assert(canon(dim) === Set(
      (1L, 1.0, 10L, Some(20L), false),
      (1L, 2.0, 20L, Some(30L), false),
      (2L, 5.0, 15L, None, true)))
  }

  test("merge rebuilds only touched keys, equals full rebuild (interior deletes too)") {
    // key 1 has an INTERIOR delete (U 10, D 15, U 20) — the interval
    // (10,15) must survive a merge that touches key 1 again
    val all = Seq(
      (1L, 10L, "U", 1.0), (1L, 15L, "D", 0.0), (1L, 20L, "U", 2.0),
      (1L, 40L, "U", 3.0),
      (2L, 12L, "U", 7.0), (2L, 35L, "D", 0.0),
      (3L, 5L, "U", 9.0)) // untouched by the delta
    val (first, delta) = all.partition(_._2 <= 20)
    val dim = dimOf(first)
    val merged = Scd2.merge(dim, delta.toDF("k", "seq", "op", "price"),
      "k", "seq", "op", Seq("price"))
    assert(canon(merged) === canon(dimOf(all)))
    assert(canon(merged).contains((1L, 1.0, 10L, Some(15L), false)))
  }

  test("merge is idempotent under micro-batch replay") {
    // crash-after-publish: the SAME delta is merged twice; the second
    // application must converge, not mint zero-width intervals
    val all = Seq(
      (1L, 10L, "U", 1.0), (1L, 20L, "U", 2.0), (1L, 30L, "D", 0.0),
      (2L, 15L, "U", 5.0), (2L, 25L, "U", 6.0))
    val (first, delta) = all.partition(_._2 <= 15)
    val deltaDf = delta.toDF("k", "seq", "op", "price")
    val once = Scd2.merge(dimOf(first), deltaDf, "k", "seq", "op", Seq("price"))
    val twice = Scd2.merge(once, deltaDf, "k", "seq", "op", Seq("price"))
    assert(canon(twice) === canon(dimOf(all)))
    assert(canon(twice) === canon(once))
  }

  test("property: merge == full rebuild over random changelogs and split points") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val nKeys = 1 + rnd.nextInt(5)
      val rows = (1 to 40).map { seq =>
        (rnd.nextInt(nKeys).toLong, seq.toLong * 10,
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(100).toDouble)
      }
      val split = rows(rnd.nextInt(rows.size))._2
      val (first, delta) = rows.partition(_._2 <= split)
      val merged = Scd2.merge(dimOf(first),
        delta.toDF("k", "seq", "op", "price"), "k", "seq", "op", Seq("price"))
      assert(canon(merged) === canon(dimOf(rows)), s"trial $trial split $split")
    }
  }
}
