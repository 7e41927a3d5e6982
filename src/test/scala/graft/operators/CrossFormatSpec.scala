package graft.operators

import graft.SparkSpec

/** Cross-format hash normalization: the SAME logical image serialized
  * as PNG / GIF / JPEG(q100 blocks) / BMP must produce the identical
  * 64-bit aHash through `Multimodal.aHashAuto` — including the BMP
  * bottom-up row flip, which matters only for vertically ASYMMETRIC
  * content (the case this spec pins).
  */
class CrossFormatSpec extends SparkSpec {

  // vertically asymmetric 64x48 gray: block value depends on by
  private def v(x: Int, y: Int): Int = 30 + (x / 16) * 20 + (y / 16) * 55

  private def pngBytes: Array[Byte] = {
    val px = new Array[Byte](64 * 48)
    var i = 0
    while (i < px.length) { px(i) = v(i % 64, i / 64).toByte; i += 1 }
    PngCodec.encode(64, 48, 1, px)
  }

  private def gifBytes: Array[Byte] = {
    val pal = new Array[Byte](768)
    var j = 0
    while (j < 256) {
      pal(j * 3) = j.toByte; pal(j * 3 + 1) = j.toByte; pal(j * 3 + 2) = j.toByte
      j += 1
    }
    val idx = new Array[Byte](64 * 48)
    var i = 0
    while (i < idx.length) { idx(i) = v(i % 64, i / 64).toByte; i += 1 }
    GifCodec.encode(64, 48, pal, Seq(idx))
  }

  private def jpegBytes: Array[Byte] = {
    val rgb = new Array[Byte](64 * 48 * 3)
    var i = 0
    while (i < 64 * 48) {
      val b = v(i % 64, i / 64).toByte
      rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
      i += 1
    }
    JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
  }

  private def bmpBytes: Array[Byte] =
    Multimodal.BmpCodec.synthesize(64, 48, { i =>
      val pix = i / 3
      v(pix % 64, 47 - pix / 64) // BMP file rows are bottom-up
    })

  private def tiffBytes: Array[Byte] = {
    val px = new Array[Byte](64 * 48)
    var i = 0
    while (i < px.length) { px(i) = v(i % 64, i / 64).toByte; i += 1 }
    TiffCodec.encode(64, 48, 1, px, compression = 5, predictor = true)
  }

  test("one logical image hashes identically across all five formats") {
    import spark.implicits._
    val media = Seq(
      (0L, pngBytes), (1L, gifBytes), (2L, jpegBytes), (3L, bmpBytes),
      (4L, tiffBytes)
    ).toDF("media_id", "content")
    val rows = Multimodal.aHashAuto(media).collect().sortBy(_.media_id)
    assert(rows.map(_.modality).toSeq ==
      Seq("image/png", "image/gif", "image/jpeg", "image/bmp", "image/tiff"))
    assert(rows.map(_.ahash).distinct.length == 1,
      s"hashes diverge across formats: ${rows.map(r => r.modality -> r.ahash).toSeq}")
  }

  test("BMP without the flip would hash differently (the content is asymmetric)") {
    import spark.implicits._
    // aHashBmp hashes in bottom-up FILE order — on asymmetric content
    // it must disagree with the normalized cross-format hash, proving
    // the flip in aHashAuto is load-bearing
    val media = Seq((3L, bmpBytes)).toDF("media_id", "content")
    val fileOrder = Multimodal.aHashBmp(media).collect().head.ahash
    val normalized = Multimodal.aHashAuto(media).collect().head.ahash
    assert(fileOrder != normalized)
  }

  test("unsupported payloads fail loudly with the media id") {
    import spark.implicits._
    val media = Seq((7L, "not an image".getBytes)).toDF("media_id", "content")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.aHashAuto(media).collect())
    assert(e.getCause.getMessage.contains("media 7"))
  }
}
