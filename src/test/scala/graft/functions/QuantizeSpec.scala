package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("groupedQuantizedSums matches a naive per-group integer replay") {
    val data = vecs(20, 8).map { case (id, v) => (id % 3, v) }
    val df = data.toDF("g", "v")
    val got = Quantize.groupedQuantizedSums(df, "g", "v")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    def quant(v: Array[Float]): Array[Long] = {
      val ma = v.map(x => math.abs(x.toDouble)).max
      val sc = if (ma == 0) 0.0 else 127.0 / ma
      v.map(x => math.floor(x.toDouble * sc + 0.5).toLong)
    }
    val want = data.groupBy(_._1).flatMap { case (g, rows) =>
      val qs = rows.map(r => quant(r._2))
      (0 until 8).map(d => ((g, d), (qs.map(_(d)).sum, rows.size.toLong)))
    }
    assert(got === want)
  }

  test("quantize: values bounded by 127, zero vector quantizes to zeros") {
    val df = (vecs(50, 16) :+ (99L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding")
    val q = Quantize.withQuantized(df, "embedding")
    val bad = q.filter(exists(col("q"), x => abs(x) > 127)).count()
    assert(bad == 0, "quantized values must fit int8")
    val zero = q.filter(col("vec_id") === 99L)
      .select(col("q_scale"), aggregate(col("q"), lit(0L), (a, x) => a + abs(x))).head()
    assert(zero.getDouble(0) == 0.0 && zero.getLong(1) == 0L, "zero vector -> scale 0, all zeros")
  }

  test("max-abs element quantizes to exactly +/-127") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val q = Quantize.withQuantized(df, "embedding").select(col("q")).head().getSeq[Long](0)
    assert(q(1) == -127L, s"max-abs element must hit -127, got ${q(1)}")
    assert(q(0) == 64L && q(2) == 32L, s"half/quarter scale off: $q")
  }

  test("quantized top-k recall >= 0.8 against exact cosine top-k") {
    val df = vecs(300, 32).toDF("vec_id", "embedding")
    val probes = df.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(probes, df, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Quantize.quantizedTopK(probes, df, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized dot recall too low: $recall")
  }

  test("native long dot == aggregate(zip_with) fold on random vectors") {
    val df = vecs(100, 24).toDF("vec_id", "embedding")
    val q = Quantize.withQuantized(df, "embedding").select(col("vec_id"), col("q"))
    val mismatches = q.as("a").crossJoin(q.as("b"))
      .select(Quantize.intDot(col("a.q"), col("b.q")).as("native"),
        aggregate(zip_with(col("a.q"), col("b.q"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("intDot is exact and symmetric") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f)), (2L, Array(0.5f, 0.5f, -1.0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.withQuantized(df, "embedding").select(col("vec_id"), col("q"))
    val pair = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(Quantize.intDot(col("a.q"), col("b.q")).as("ab"),
        Quantize.intDot(col("b.q"), col("a.q")).as("ba")).head()
    assert(pair.getLong(0) == pair.getLong(1))
    // hand check (round-half-up toward +inf): a = [127, -63, 32], b = [64, 64, -127]
    assert(pair.getLong(0) == 127L * 64 - 63L * 64 - 32L * 127)
  }
}
