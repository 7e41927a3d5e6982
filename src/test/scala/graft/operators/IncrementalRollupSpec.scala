package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = Seq("d")

  private def canon(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.select("d", "cnt", "sum_m", "min_m", "max_m").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("merge of per-batch states equals init over the union") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val rows = (1 to 200).map(_ =>
        (s"d${rnd.nextInt(4)}", rnd.nextInt(2001).toLong - 1000))
      val nBatches = 2 + rnd.nextInt(3)
      val batches = rows.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq
      val states = batches.map(b =>
        IncrementalRollup.init(b.toDF("d", "m"), dims, "m"))
      val merged = states.reduce(IncrementalRollup.merge(_, _, dims))
      val full = IncrementalRollup.init(rows.toDF("d", "m"), dims, "m")
      assert(canon(merged) === canon(full), s"trial $trial")
    }
  }

  test("finalizeState derives avg from exact longs") {
    val st = IncrementalRollup.init(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("d", "m"), dims, "m")
    val fin = IncrementalRollup.finalizeState(st, dims)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(fin === Map("a" -> 1.5, "b" -> 10.0))
  }

  test("merge with an empty delta state is identity") {
    val st = IncrementalRollup.init(
      Seq(("a", 3L), ("b", -4L)).toDF("d", "m"), dims, "m")
    val empty = IncrementalRollup.init(
      Seq.empty[(String, Long)].toDF("d", "m"), dims, "m")
    assert(canon(IncrementalRollup.merge(st, empty, dims)) === canon(st))
  }
}
