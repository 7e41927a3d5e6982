package graft.functions

import graft.SparkSpec
import graft.operators.Multimodal

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  test("DCT table is sign-symmetric and row 0 is flat") {
    val d = PerceptualHash.Dct
    assert(d(0).forall(_ == PerceptualHash.Scale))
    // odd rows: C(u, 31-x) == -C(u, x) exactly (survives quantization)
    for (u <- Seq(1, 3, 5, 7); x <- 0 until 32)
      assert(d(u)(31 - x) == -d(u)(x), s"u=$u x=$x")
    for (u <- Seq(1, 3, 5, 7)) assert(d(u).sum == 0L)
  }

  test("flat images share one hash at any brightness; structure changes it") {
    // flat fields: F(u,v) = g * rowsum(u) * rowsum(v) — signs (and so
    // bits) are brightness-independent, only quantization residue in
    // the even rows survives
    val dim = PerceptualHash.phash64Gray32(Array.fill(1024)(60L))
    val bright = PerceptualHash.phash64Gray32(Array.fill(1024)(3000L))
    assert(dim == bright)
    // a real texture has ~half the 63 AC bits above the median
    val tex = Array.tabulate(1024) { i =>
      val x = i % 32; val y = i / 32
      (40 + (x * 13 + y * 29 + (x / 8) * 97) % 180).toLong * 12
    }
    val h = PerceptualHash.phash64Gray32(tex)
    assert(h != dim && java.lang.Long.bitCount(h) >= 16)
  }

  test("uniform brightness shift keeps hamming distance tiny") {
    def textured(shift: Long): Array[Long] = Array.tabulate(1024) { i =>
      val x = i % 32; val y = i / 32
      (40 + (x * 13 + y * 29 + (x / 8) * 97) % 180).toLong * 12 + shift * 12
    }
    val a = PerceptualHash.phash64Gray32(textured(0))
    val b = PerceptualHash.phash64Gray32(textured(25))
    val hamming = java.lang.Long.bitCount(a ^ b)
    assert(hamming <= 4, s"brightness shift moved $hamming pHash bits")
  }

  test("phashBmp decodes real BMPs and matches the pure-math hash") {
    // 64x64 gray BMP with 16x16 constant blocks
    def blockVal(bx: Int, by: Int): Int = 30 + (bx * 53 + by * 77) % 200
    val bmp = Multimodal.BmpCodec.synthesize(64, 64, { k =>
      val pix = k / 3
      blockVal((pix % 64) / 16, (pix / 64) / 16)
    })
    val media = Seq((7L, bmp)).toDF("media_id", "content")
    val out = Multimodal.phashBmp(media).collect()
    assert(out.length == 1)
    // replay: 2x2 box sums of 3 equal channels
    val g = Array.tabulate(1024) { i =>
      val cx = i % 32; val cy = i / 32
      // cell (cx, cy) covers pixels (2cx.., 2cy..): same 16x16 block
      4L * 3L * blockVal((2 * cx) / 16, (2 * cy) / 16)
    }
    assert(out(0).phash == PerceptualHash.phash64Gray32(g))
  }

  test("phashBmp rejects non-multiple-of-32 dims with the media id") {
    val bmp = Multimodal.BmpCodec.synthesize(48, 48, _ => 10)
    val media = Seq((9L, bmp)).toDF("media_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.phashBmp(media).collect()
    }
    assert(e.getMessage.contains("media 9") ||
      e.getCause.getMessage.contains("media 9"))
  }

  test("re-encoded copies collapse to hamming 0 through the banded join") {
    def bmpFor(seed: Int, shift: Int): Array[Byte] =
      Multimodal.BmpCodec.synthesize(64, 64, { k =>
        val pix = k / 3
        val bx = (pix % 64) / 16; val by = (pix / 64) / 16
        (20 + (seed * 31 + bx * 53 + by * 77) % 190 + shift).min(255)
      })
    val media = Seq(
      (1L, bmpFor(3, 0)), (2L, bmpFor(3, 0)), // exact copies
      (3L, bmpFor(3, 15)), // re-grade of the same content
      (4L, bmpFor(8, 0))) // different content
      .toDF("media_id", "content")
    val hashes = Multimodal.phashBmp(media).toDF()
      .withColumn("block", org.apache.spark.sql.functions.lit("all"))
    val pairs = Similarity.hammingPairs64(hashes, "media_id", "phash", "block",
        maxHamming = 6, collapseIdentical = false)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 6)
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }
}
