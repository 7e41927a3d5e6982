package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton keys: bit-exact interleave vs a reference implementation,
  * and the locality property that makes them a layout tool.
  */
class ZOrderSpec extends SparkSpec {

  private def refInterleave(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= (x.toLong >> i & 1L) << (2 * i)
      z |= (y.toLong >> i & 1L) << (2 * i + 1)
    }
    z
  }

  test("zkey16 matches the bit-by-bit reference on edge and random values") {
    import spark.implicits._
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0),
      (0, 65535), (0x5555, 0xAAAA), (12345, 54321), (1, 65534))
    val out = cases.toDF("x", "y")
      .select(ZOrder.zkey16(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    cases.zip(out).foreach { case ((x, y), z) =>
      assert(z == refInterleave(x, y), s"($x,$y)")
    }
  }

  test("z-sorted chunks cluster BOTH dimensions") {
    import spark.implicits._
    // a 64x64 grid; chunked by z-key prefix, every chunk's span in
    // each dim is the 8x8 tile — vs 64 for a row-major layout's y span
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val spans = grid
      .withColumn("z", ZOrder.zkey16(col("x"), col("y")))
      .withColumn("chunk", shiftright(col("z"), 6)) // 64 cells per chunk
      .groupBy("chunk")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(max("sx").as("wx"), max("sy").as("wy"))
      .head()
    assert(spans.getInt(0) == 7 && spans.getInt(1) == 7,
      s"every 64-cell z-chunk must be an 8x8 tile, got $spans")
  }
}
