package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Exif privacy scrub: GPS detection and removal on JPEG and WebP,
  * pixel byte-identity after the scrub, orientation preservation,
  * XMP removal, idempotence.
  */
class ExifScrubSpec extends AnyFunSuite {

  private def grayJpeg(salt: Int): Array[Byte] = {
    val rgb = Array.tabulate(64 * 48 * 3) { i =>
      ((20 + ((i / 3 / 16) * 31 + salt * 7) % 200) & 0xff).toByte
    }
    JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
  }

  test("JPEG: GPS detected, stripped, pixels identical, orientation kept") {
    val plain = grayJpeg(1)
    val withGps = JpegCodec.withExifGps(plain, orientation = 6,
      latMilli = 52520, lonMilli = 13405)
    assert(JpegCodec.exifHasGps(1L, withGps))
    assert(JpegCodec.exifOrientation(1L, withGps) == 6)

    val scrubbed = JpegCodec.stripExif(1L, withGps)
    assert(!JpegCodec.exifHasGps(1L, scrubbed))
    assert(JpegCodec.exifOrientation(1L, scrubbed) == 6) // kept
    // pixels identical to the pre-Exif original
    val a = JpegCodec.decode(1L, plain)
    val b = JpegCodec.decode(1L, scrubbed)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
    // idempotent
    assert(java.util.Arrays.equals(
      JpegCodec.stripExif(1L, scrubbed), scrubbed))
  }

  test("JPEG: orientation 1 scrubs to a fully Exif-free file") {
    val withGps = JpegCodec.withExifGps(grayJpeg(2), orientation = 1,
      latMilli = 1000, lonMilli = 2000, bigEndian = true)
    val scrubbed = JpegCodec.stripExif(2L, withGps)
    assert(JpegCodec.exifOrientation(2L, scrubbed) == 1)
    assert(!JpegCodec.exifHasGps(2L, scrubbed))
    assert(java.util.Arrays.equals(scrubbed, grayJpeg(2)))
  }

  test("JPEG: keepOrientation=false drops everything") {
    val withGps = JpegCodec.withExifGps(grayJpeg(3), orientation = 8,
      latMilli = 100, lonMilli = 200)
    val scrubbed = JpegCodec.stripExif(3L, withGps, keepOrientation = false)
    assert(JpegCodec.exifOrientation(3L, scrubbed) == 1)
  }

  test("WebP: EXIF chunk stripped, bitstream identical, orientation kept") {
    val rgb = Array.tabulate(32 * 16 * 3)(i => ((i * 7) & 0xff).toByte)
    val plain = WebpCodec.encodeLossless(32, 16, 3, rgb)
    val withO = WebpCodec.withExifOrientation(4L, plain, 3)
    assert(WebpCodec.exifOrientation(4L, withO) == 3)
    assert(!WebpCodec.exifHasGps(4L, withO)) // orientation-only block

    val scrubbed = WebpCodec.scrubExif(4L, withO)
    assert(WebpCodec.exifOrientation(4L, scrubbed) == 3) // kept
    val a = WebpCodec.toDecodedImage(WebpCodec.decode(4L, plain))
    val b = WebpCodec.toDecodedImage(WebpCodec.decode(4L, scrubbed))
    assert(java.util.Arrays.equals(a.pixels, b.pixels))

    val bare = WebpCodec.scrubExif(4L, withO, keepOrientation = false)
    assert(WebpCodec.exifOrientation(4L, bare) == 1)
  }

  test("dataset op scrubs mixed media and flags GPS carriers") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("scrub")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val media = Seq(
      (0L, JpegCodec.withExifGps(grayJpeg(5), 6, 1000, 2000)),
      (1L, grayJpeg(6)),
      (2L, "plain text payload".getBytes)).toDF("media_id", "content")
    val rows = Multimodal.scrubExifGps(media).collect().sortBy(_.media_id)
    assert(rows(0).had_gps && rows(0).modality == "image/jpeg")
    assert(!JpegCodec.exifHasGps(0L, rows(0).content))
    assert(!rows(1).had_gps)
    assert(!rows(2).had_gps && rows(2).modality == "unknown")
    assert(java.util.Arrays.equals(rows(2).content,
      "plain text payload".getBytes))
  }
}
