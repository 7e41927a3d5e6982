package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PNG codec: exact round-trips (PNG is lossless, so every comparison
  * is bit-exact), two-direction interop with the JDK's independent
  * ImageIO PNG implementation — including ImageIO's adaptive filters,
  * Adam7 interlace (progressive write mode), palette, 16-bit, and
  * alpha variants — and loud, id-tagged rejection of corrupt input.
  */
class PngSpec extends AnyFunSuite {

  private def det(i: Int, salt: Int): Int =
    (((i + 7) * (salt + 13) * 1103515245L + 12345) >>> 16).toInt & 0xff

  private def rgbPixels(w: Int, h: Int, salt: Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3)
    var i = 0
    while (i < a.length) { a(i) = det(i, salt).toByte; i += 1 }
    a
  }

  private def imageIoRead(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO failed to decode")
    img
  }

  private def imageIoWrite(img: java.awt.image.BufferedImage,
      interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    if (interlaced && param.canWriteProgressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  private def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
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
    out
  }

  // --- our encoder -> our decoder: exact ------------------------------

  test("round-trip RGB exact (adaptive filters)") {
    for ((w, h, salt) <- Seq((64, 48, 1), (17, 9, 2), (1, 1, 3), (3, 200, 4))) {
      val px = rgbPixels(w, h, salt)
      val enc = PngCodec.encode(w, h, 3, px)
      val img = PngCodec.decode(42L, enc)
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(img.bitDepth == 8 && img.colorType == 2)
      assert(java.util.Arrays.equals(img.pixels, px))
    }
  }

  test("round-trip gray exact") {
    val w = 33; val h = 21
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) { px(i) = det(i, 9).toByte; i += 1 }
    val img = PngCodec.decode(1L, PngCodec.encode(w, h, 1, px))
    assert(img.channels == 1 && img.colorType == 0)
    assert(java.util.Arrays.equals(img.pixels, px))
  }

  test("adaptive filter actually varies (gradient rows pick non-zero filters)") {
    // a smooth gradient compresses via Sub/Up/Paeth; ensure the encoder
    // is not silently always writing filter 0 by checking the encoded
    // stream inflates to rows with mixed filter tags
    val w = 32; val h = 32
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = (x * 7 + y * 3).toByte; x += 1 }
      y += 1
    }
    val enc = PngCodec.encode(w, h, 1, px)
    val img = PngCodec.decode(2L, enc)
    assert(java.util.Arrays.equals(img.pixels, px))
    // find the IDAT chunk and inflate the filtered stream
    var pos = 8
    var idat: Array[Byte] = null
    while (idat == null) {
      val len = ((enc(pos) & 0xff) << 24) | ((enc(pos + 1) & 0xff) << 16) |
        ((enc(pos + 2) & 0xff) << 8) | (enc(pos + 3) & 0xff)
      val t = new String(enc, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (t == "IDAT") idat = java.util.Arrays.copyOfRange(enc, pos + 8, pos + 8 + len)
      pos += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte]((w + 1) * h)
    var got = 0
    while (got < raw.length && !inf.finished())
      got += inf.inflate(raw, got, raw.length - got)
    inf.end()
    val filters = (0 until h).map(y2 => raw(y2 * (w + 1)) & 0xff).toSet
    assert(filters.exists(_ != 0), s"all rows used filter 0: $filters")
  }

  // --- ours -> ImageIO ------------------------------------------------

  test("ImageIO decodes our RGB and gray files exactly") {
    val w = 40; val h = 25
    val px = rgbPixels(w, h, 5)
    val dec = imageIoRead(PngCodec.encode(w, h, 3, px))
    assert(dec.getWidth == w && dec.getHeight == h)
    assert(java.util.Arrays.equals(rgbOf(dec), px))

    val gpx = new Array[Byte](w * h)
    var i = 0
    while (i < gpx.length) { gpx(i) = det(i, 6).toByte; i += 1 }
    val gdec = imageIoRead(PngCodec.encode(w, h, 1, gpx))
    // gray PNG: ImageIO raster carries the raw samples
    val raster = gdec.getRaster
    var p = 0
    var ok = true
    while (p < w * h) {
      if (raster.getSample(p % w, p / w, 0) != (gpx(p) & 0xff)) ok = false
      p += 1
    }
    assert(ok, "gray sample mismatch via ImageIO")
  }

  // --- ImageIO -> ours (their encoder's filter choices, our unfilter) -

  test("we decode ImageIO RGB output exactly") {
    val w = 57; val h = 31
    val px = rgbPixels(w, h, 7)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      bi.setRGB(p % w, p / w, ((px(p * 3) & 0xff) << 16) |
        ((px(p * 3 + 1) & 0xff) << 8) | (px(p * 3 + 2) & 0xff))
      p += 1
    }
    val img = PngCodec.decode(7L, imageIoWrite(bi))
    assert(img.width == w && img.height == h && img.channels == 3)
    assert(java.util.Arrays.equals(img.pixels, px))
  }

  test("we decode ImageIO Adam7-interlaced output exactly") {
    val w = 37; val h = 23 // non-multiples of 8 stress pass geometry
    val px = rgbPixels(w, h, 8)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      bi.setRGB(p % w, p / w, ((px(p * 3) & 0xff) << 16) |
        ((px(p * 3 + 1) & 0xff) << 8) | (px(p * 3 + 2) & 0xff))
      p += 1
    }
    val bytes = imageIoWrite(bi, interlaced = true)
    // confirm the file really is interlaced (IHDR byte 12 at offset 8+8+12)
    assert((bytes(8 + 8 + 12) & 0xff) == 1, "fixture is not Adam7-interlaced")
    val img = PngCodec.decode(8L, bytes)
    assert(java.util.Arrays.equals(img.pixels, px))
  }

  test("we decode ImageIO gray+alpha and RGBA output exactly") {
    val w = 19; val h = 13
    val abgr = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var p = 0
    while (p < w * h) {
      abgr.setRGB(p % w, p / w, (det(p, 11) << 24) | (det(p, 12) << 16) |
        (det(p, 13) << 8) | det(p, 14))
      p += 1
    }
    val img = PngCodec.decode(9L, imageIoWrite(abgr))
    assert(img.channels == 4 && img.colorType == 6)
    p = 0
    while (p < w * h) {
      val argb = abgr.getRGB(p % w, p / w)
      assert((img.pixels(p * 4) & 0xff) == ((argb >> 16) & 0xff))
      assert((img.pixels(p * 4 + 1) & 0xff) == ((argb >> 8) & 0xff))
      assert((img.pixels(p * 4 + 2) & 0xff) == (argb & 0xff))
      assert((img.pixels(p * 4 + 3) & 0xff) == ((argb >>> 24) & 0xff))
      p += 1
    }
  }

  test("we decode ImageIO palette output exactly") {
    val w = 23; val h = 17
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    var p = 0
    while (p < w * h) {
      bi.setRGB(p % w, p / w, (det(p, 15) << 16) | (det(p, 16) << 8) | det(p, 17))
      p += 1
    }
    val bytes = imageIoWrite(bi)
    assert((bytes(8 + 8 + 9) & 0xff) == 3, "fixture is not palette color type")
    val img = PngCodec.decode(10L, bytes)
    assert(img.colorType == 3 && (img.channels == 3 || img.channels == 4))
    // compare RGB against ImageIO's own decode of the same file
    val ref = rgbOf(imageIoRead(bytes))
    p = 0
    while (p < w * h) {
      var c = 0
      while (c < 3) {
        assert((img.pixels(p * img.channels + c) & 0xff) == (ref(p * 3 + c) & 0xff),
          s"palette pixel $p channel $c")
        c += 1
      }
      p += 1
    }
  }

  test("we decode ImageIO 16-bit gray output (high-byte reduction)") {
    val w = 21; val h = 11
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val raster = bi.getRaster
    var p = 0
    while (p < w * h) {
      raster.setSample(p % w, p / w, 0, (det(p, 18) << 8) | det(p, 19))
      p += 1
    }
    val bytes = imageIoWrite(bi)
    val img = PngCodec.decode(11L, bytes)
    assert(img.bitDepth == 16 && img.colorType == 0 && img.channels == 1)
    p = 0
    while (p < w * h) {
      assert((img.pixels(p) & 0xff) == det(p, 18), s"16-bit gray pixel $p")
      p += 1
    }
  }

  test("low-bit-depth gray decodes with exact replication scaling") {
    // hand-built 1-bit gray 10x2: rows 0b1010101010..., filter 0
    val w = 10; val h = 2
    val raw = Array[Byte](0, 0xaa.toByte, 0x80.toByte, 0, 0x55.toByte, 0x40.toByte)
    val z = deflate(raw)
    val png = buildPng(w, h, bitDepth = 1, colorType = 0, idat = z)
    val img = PngCodec.decode(12L, png)
    assert(img.bitDepth == 1 && img.channels == 1)
    val row0 = (0 until w).map(x => img.pixels(x) & 0xff)
    val row1 = (0 until w).map(x => img.pixels(w + x) & 0xff)
    assert(row0 == Seq(255, 0, 255, 0, 255, 0, 255, 0, 255, 0))
    assert(row1 == Seq(0, 255, 0, 255, 0, 255, 0, 255, 0, 255))
  }

  test("gray tRNS level becomes an alpha channel") {
    // hand-build 4x1 gray-8 with tRNS level 0x42: pixel values
    // [0x42, 0x10, 0x42, 0x20] -> alpha [0, 255, 0, 255]
    val raw = Array[Byte](0, 0x42, 0x10, 0x42, 0x20)
    val png = buildPngWithTrns(4, 1, 8, 0, deflate(raw),
      Array[Byte](0, 0x42))
    val img = PngCodec.decode(20L, png)
    assert(img.channels == 2)
    val alphas = (0 until 4).map(p => img.pixels(p * 2 + 1) & 0xff)
    assert(alphas == Seq(0, 255, 0, 255))
    val grays = (0 until 4).map(p => img.pixels(p * 2) & 0xff)
    assert(grays == Seq(0x42, 0x10, 0x42, 0x20))
  }

  test("RGB tRNS color becomes an alpha channel") {
    // 2x1 RGB-8, transparent color (1,2,3)
    val raw = Array[Byte](0, 1, 2, 3, 9, 9, 9)
    val png = buildPngWithTrns(2, 1, 8, 2, deflate(raw),
      Array[Byte](0, 1, 0, 2, 0, 3))
    val img = PngCodec.decode(21L, png)
    assert(img.channels == 4)
    assert((img.pixels(3) & 0xff) == 0 && (img.pixels(7) & 0xff) == 255)
  }

  // --- corruption: loud, id-tagged ------------------------------------

  test("corrupt inputs fail loudly with the media id") {
    val good = PngCodec.encode(16, 16, 1, new Array[Byte](256))
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](PngCodec.decode(99L, bad))
      assert(e.getMessage.contains("media 99"), s"$what: ${e.getMessage}")
    }
    expectFail(b => { b(1) = 'Q'.toByte; b }, "signature")
    expectFail(b => { b(30) = (b(30) ^ 1).toByte; b }, "IHDR crc") // inside IHDR data
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 20), "truncation")
    expectFail(b => { b(8 + 8 + 8) = 3.toByte; b }, "bad bit depth (crc)") // also breaks crc
    // valid-CRC bad filter byte: rebuild with a filter-5 row
    val rawBad = new Array[Byte](17 * 16)
    rawBad(0) = 5
    val badPng = buildPng(16, 16, 8, 0, deflate(rawBad))
    val e = intercept[IllegalArgumentException](PngCodec.decode(99L, badPng))
    assert(e.getMessage.contains("media 99") && e.getMessage.contains("filter"))
    // truncated deflate stream
    val shortZ = deflate(new Array[Byte](17 * 16)).dropRight(4)
    val e2 = intercept[IllegalArgumentException](
      PngCodec.decode(99L, buildPng(16, 16, 8, 0, shortZ)))
    assert(e2.getMessage.contains("media 99"))
  }

  test("decompression bomb rejected by decoded size, not by OOM") {
    // tiny file claiming 20000x20000 RGBA
    val raw = Array.emptyByteArray
    val e = intercept[IllegalArgumentException](
      PngCodec.decode(13L, buildPng(20000, 20000, 8, 6, deflate(raw))))
    assert(e.getMessage.contains("too large"))
  }

  // --- helpers to hand-build minimal PNGs -----------------------------

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def buildPngWithTrns(w: Int, h: Int, bitDepth: Int, colorType: Int,
      idat: Array[Byte], trns: Array[Byte]): Array[Byte] = {
    // splice a tRNS chunk before IDAT of a minimal file
    val base = buildPng(w, h, bitDepth, colorType, idat)
    val out = new java.io.ByteArrayOutputStream()
    val ihdrEnd = 8 + 12 + 13 // sig + IHDR chunk
    out.write(base, 0, ihdrEnd)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(trns.length).array(), 0, 4)
    val tb = "tRNS".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb, 0, 4)
    out.write(trns, 0, trns.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(trns)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    out.write(base, ihdrEnd, base.length - ihdrEnd)
    out.toByteArray
  }

  private def buildPng(w: Int, h: Int, bitDepth: Int, colorType: Int,
      idat: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .foreach(out.write)
    def chunk(t: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val tb = t.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
