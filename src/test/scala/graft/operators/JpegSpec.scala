package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** JPEG codec: exact round-trips in the quality-100 constant-block
  * regime, two-direction interop with the JDK's independent ImageIO
  * (libjpeg) implementation — same foreign-binary discipline as the
  * GPG codec — and loud rejection of unsupported modes.
  */
class JpegSpec extends AnyFunSuite {

  // deterministic "random" bytes without java.util.Random seeding drift
  private def det(i: Int, salt: Int): Int =
    (((i + 7) * (salt + 13) * 1103515245L + 12345) >>> 16).toInt & 0xff

  /** width x height gray image as RGB bytes (R=G=B), constant per
    * 16x16 block — the analytically-exact regime.
    */
  private def constantBlocks(w: Int, h: Int, vOf: (Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = vOf(x / 16, y / 16) & 0xff
        val o = (y * w + x) * 3
        rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        out(o) = ((p >> 16) & 0xff).toByte
        out(o + 1) = ((p >> 8) & 0xff).toByte
        out(o + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  private def imageIoEncode(w: Int, h: Int, rgb: Array[Byte], q: Float,
      gray: Boolean = false): Array[Byte] = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, t)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    bos.toByteArray
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"length ${a.length} != ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  private def meanDiff(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
    s.toDouble / a.length
  }

  test("q=100 constant 16x16 gray blocks round-trip bit-exactly (4:2:0 color path)") {
    val rgb = constantBlocks(64, 48, (bx, by) => 20 + bx * 37 + by * 61)
    val jpg = JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
    val dec = JpegCodec.decode(1L, jpg)
    assert(dec.width == 64 && dec.height == 48 && dec.channels == 3)
    assert(maxDiff(dec.pixels, rgb) == 0)
  }

  test("q=100 constant-block file decodes bit-exactly under ImageIO too") {
    val rgb = constantBlocks(64, 48, (bx, by) => 15 + bx * 53 + by * 29)
    val jpg = JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
    val (w, h, theirs) = imageIoDecode(jpg)
    assert(w == 64 && h == 48)
    assert(maxDiff(theirs, rgb) == 0,
      "libjpeg must reproduce the DC-only constant blocks exactly")
  }

  test("q=100 uniform image with odd dimensions round-trips exactly (edge MCU clip)") {
    val rgb = Array.fill(37 * 23 * 3)(143.toByte)
    val jpg = JpegCodec.encodeRgb(37, 23, rgb, quality = 100, subsample = true)
    val dec = JpegCodec.decode(2L, jpg)
    assert(dec.width == 37 && dec.height == 23)
    assert(maxDiff(dec.pixels, rgb) == 0)
  }

  test("restart markers: DRI/RSTn round-trip exactly and under ImageIO") {
    val rgb = constantBlocks(64, 48, (bx, by) => 30 + bx * 43 + by * 17)
    val jpg = JpegCodec.encodeRgb(64, 48, rgb, quality = 100,
      subsample = true, restartInterval = 3)
    val dec = JpegCodec.decode(3L, jpg)
    assert(maxDiff(dec.pixels, rgb) == 0)
    val (_, _, theirs) = imageIoDecode(jpg)
    assert(maxDiff(theirs, rgb) == 0)
  }

  test("gray encode round-trips exactly on constant blocks, with and without restarts") {
    val g = new Array[Byte](64 * 48)
    var y = 0
    while (y < 48) {
      var x = 0
      while (x < 64) { g(y * 64 + x) = (25 + (x / 16) * 31 + (y / 16) * 47).toByte; x += 1 }
      y += 1
    }
    for (ri <- Seq(0, 2)) {
      val jpg = JpegCodec.encodeGray(64, 48, g, quality = 100, restartInterval = ri)
      val dec = JpegCodec.decode(4L, jpg)
      assert(dec.channels == 1 && maxDiff(dec.pixels, g) == 0, s"restartInterval=$ri")
    }
  }

  test("ImageIO-encoded GRAY jpeg (random content) decodes here within IDCT tolerance") {
    for (salt <- 1 to 3) {
      val w = 40 + salt; val h = 25 + salt // odd sizes too
      // raw raster writes/reads: getRGB/setRGB on TYPE_BYTE_GRAY apply
      // a linear-gray<->sRGB color-space conversion that would distort
      // the comparison
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < w * h) {
        img.getRaster.setSample(i % w, i / w, 0, det(i, salt))
        i += 1
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.85f)
      val bos = new java.io.ByteArrayOutputStream()
      wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose()
      val jpg = bos.toByteArray
      val ours = JpegCodec.decode(5L, jpg)
      assert(ours.channels == 1)
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(back.getWidth == w && back.getHeight == h)
      val theirsGray = Array.tabulate[Byte](w * h)(i =>
        back.getRaster.getSample(i % w, i / w, 0).toByte)
      // independent IDCT implementations (double-precision reference
      // vs libjpeg integer islow) may differ by a quantum
      assert(maxDiff(ours.pixels, theirsGray) <= 2,
        s"salt=$salt max=${maxDiff(ours.pixels, theirsGray)}")
      assert(meanDiff(ours.pixels, theirsGray) <= 0.51, s"salt=$salt")
    }
  }

  test("ImageIO-encoded COLOR jpeg (smooth content) decodes here close to ImageIO's own decode") {
    val w = 49; val h = 35
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        rgb(o) = (40 + 3 * x + 2 * y).toByte
        rgb(o + 1) = (200 - 2 * x - y).toByte
        rgb(o + 2) = (90 + x + 3 * y).toByte
        x += 1
      }
      y += 1
    }
    val jpg = imageIoEncode(w, h, rgb, 0.9f)
    val ours = JpegCodec.decode(6L, jpg)
    val (_, _, theirs) = imageIoDecode(jpg)
    // same bitstream, two decoders: differences = IDCT quantum + chroma
    // upsampling filter (nearest here vs libjpeg fancy). Smooth chroma
    // keeps the filter gap small.
    assert(maxDiff(ours.pixels, theirs) <= 8,
      s"max=${maxDiff(ours.pixels, theirs)}")
    assert(meanDiff(ours.pixels, theirs) <= 2.0,
      s"mean=${meanDiff(ours.pixels, theirs)}")
  }

  test("our COLOR encode decodes under ImageIO close to the original (lossy bound)") {
    val w = 48; val h = 32
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        rgb(o) = (60 + 2 * x + y).toByte
        rgb(o + 1) = (180 - x - 2 * y).toByte
        rgb(o + 2) = (100 + x + y).toByte
        x += 1
      }
      y += 1
    }
    for ((jpg, label) <- Seq(
        (JpegCodec.encodeRgb(w, h, rgb, 95, subsample = true), "4:2:0"),
        (JpegCodec.encodeRgb(w, h, rgb, 95, subsample = false), "4:4:4"))) {
      val (tw, th, theirs) = imageIoDecode(jpg)
      assert(tw == w && th == h, label)
      assert(maxDiff(theirs, rgb) <= 12, s"$label max=${maxDiff(theirs, rgb)}")
      assert(meanDiff(theirs, rgb) <= 2.5, s"$label mean=${meanDiff(theirs, rgb)}")
      // and our own decode of the same file agrees with the original
      val ours = JpegCodec.decode(7L, jpg)
      assert(maxDiff(ours.pixels, rgb) <= 12, s"$label ours")
    }
  }

  test("quality curve: q=100 pins all divisors to 1; q=50 is the Annex K base") {
    val base = Array.tabulate(64)(i => 16 + i)
    assert(JpegCodec.quantTable(base, 100).forall(_ == 1))
    assert(JpegCodec.quantTable(base, 50).sameElements(base))
    assert(JpegCodec.quantTable(base, 1).forall(q => q >= 1 && q <= 255))
  }

  test("unsupported/corrupt inputs are rejected loudly") {
    // not a JPEG
    assertThrows[IllegalArgumentException] {
      JpegCodec.decode(8L, Array[Byte](1, 2, 3, 4, 5))
    }
    // SOF2 header with no scans and no EOI: truncated, not mis-decoded
    val sof2 = Array[Int](0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b, 0x08,
      0x00, 0x08, 0x00, 0x08, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    val e = intercept[IllegalArgumentException] { JpegCodec.decode(9L, sof2) }
    assert(e.getMessage.contains("truncated"))
    // truncated entropy data
    val good = JpegCodec.encodeGray(16, 16, Array.fill(256)(77.toByte), 90)
    assertThrows[IllegalArgumentException] {
      JpegCodec.decode(10L, good.take(good.length - 10))
    }
  }

  // ------------------------------------------------- progressive (SOF2)

  private def imageIoEncodeProgressive(img: java.awt.image.BufferedImage,
      q: Float): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    val jpg = bos.toByteArray
    // make sure the writer actually produced SOF2 (the test premise)
    val hasSof2 = jpg.sliding(2).exists(w =>
      (w(0) & 0xff) == 0xff && (w(1) & 0xff) == 0xc2)
    require(hasSof2, "ImageIO did not emit a progressive JPEG")
    jpg
  }

  test("progressive GRAY jpeg (ImageIO-encoded) decodes within IDCT tolerance") {
    for (salt <- 1 to 3) {
      val w = 40 + salt; val h = 25 + salt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < w * h) {
        img.getRaster.setSample(i % w, i / w, 0, det(i, salt))
        i += 1
      }
      val jpg = imageIoEncodeProgressive(img, 0.85f)
      val ours = JpegCodec.decode(20L + salt, jpg)
      assert(ours.channels == 1 && ours.width == w && ours.height == h)
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      val theirs = Array.tabulate[Byte](w * h)(i =>
        back.getRaster.getSample(i % w, i / w, 0).toByte)
      assert(maxDiff(ours.pixels, theirs) <= 2,
        s"salt=$salt max=${maxDiff(ours.pixels, theirs)}")
      assert(meanDiff(ours.pixels, theirs) <= 0.51, s"salt=$salt")
    }
  }

  test("progressive COLOR jpeg (ImageIO-encoded, subsampled) matches ImageIO's decode") {
    val w = 49; val h = 35
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // smooth gradients: chroma subsampling differences stay small
        val r = (x * 255) / (w - 1)
        val g = (y * 255) / (h - 1)
        val b = ((x + y) * 255) / (w + h - 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val jpg = imageIoEncodeProgressive(img, 0.9f)
    val ours = JpegCodec.decode(30L, jpg)
    assert(ours.channels == 3 && ours.width == w && ours.height == h)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val theirs = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val px = back.getRGB(i % w, i / w)
      theirs(3 * i) = ((px >> 16) & 0xff).toByte
      theirs(3 * i + 1) = ((px >> 8) & 0xff).toByte
      theirs(3 * i + 2) = (px & 0xff).toByte
      i += 1
    }
    // two independent decoders of the same lossy stream: allow a small
    // per-sample quantum (chroma upsampling filters differ: box here,
    // fancy triangle in libjpeg) but require close agreement on average
    assert(meanDiff(ours.pixels, theirs) <= 2.0,
      s"mean=${meanDiff(ours.pixels, theirs)}")
  }

  test("progressive decode equals sequential decode of the same source image") {
    // same pixels, both ImageIO-encoded at the same quality — one
    // baseline, one progressive: the two decodes land within the same
    // tolerance of each other (coefficient accumulation is complete)
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < w * h) {
      img.getRaster.setSample(i % w, i / w, 0, det(i, 7))
      i += 1
    }
    val prog = imageIoEncodeProgressive(img, 0.9f)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.9f)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    val seq = JpegCodec.decode(41L, bos.toByteArray)
    val pro = JpegCodec.decode(42L, prog)
    assert(pro.width == seq.width && pro.height == seq.height)
    assert(maxDiff(pro.pixels, seq.pixels) <= 2)
  }
}
