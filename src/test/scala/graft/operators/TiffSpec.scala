package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** TiffCodec: every committed fixture (tools/tiff_probe.py, encoded by
  * the SYSTEM libtiff) must decode (a) byte-exactly to the shared
  * deterministic generator pattern — everything in the matrix is
  * lossless — and (b) to the same per-channel RGBA sums libtiff's own
  * TIFFReadRGBAImageOriented produced at fixture-generation time
  * (expected.txt), so a staging mistake in the generator cannot hide.
  * Plus own-encoder round-trips and loud corruption failures.
  */
class TiffSpec extends AnyFunSuite {

  // ---- shared deterministic patterns (tools/tiff_probe.py mirrors) --
  private def gray(x: Int, y: Int): Int = (x * 7 + y * 13) % 256
  private def rgb(x: Int, y: Int, c: Int): Int = (x * 3 + y * 11 + c * 97) % 256
  private def alpha(x: Int, y: Int): Int = (x * 5 + y * 7) % 256
  private def palIdx(x: Int, y: Int): Int = (x + y * 5) % 256
  private def ink(x: Int, y: Int): Boolean = ((x / 5 + y / 3) % 2) == 0

  private def sweepRuns(i: Int): Seq[Int] =
    if (i < 64) Seq(i, 64 - i)
    else if (i < 103) Seq(64 * (i - 63), 5)
    else if (i < 142) Seq(1, 64 * (i - 102))
    else if (i == 142) Seq(2623, 7)
    else if (i == 143) Seq(1, 2623)
    else if (i == 144) Seq()
    else Seq(0, 2880)

  private def sweepInk(x: Int, i: Int): Boolean = {
    var pos = 0
    var black = false
    sweepRuns(i).foreach { r =>
      if (x >= pos && x < pos + r) return black
      pos += r
      black = !black
    }
    false
  }

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/tiff/fixture_$i.tif")
    require(in != null, s"missing tiff fixture $i")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[Int, (Int, Int, Int, Long, Long, Long, Long)] = {
    val in = getClass.getResourceAsStream("/graft/tiff/expected.txt")
    require(in != null, "missing tiff expected manifest")
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map { l =>
      val p = l.trim.split("\\s+")
      p(0).toInt -> ((p(1).toInt, p(2).toInt, p(3).toInt,
        p(4).toLong, p(5).toLong, p(6).toLong, p(7).toLong))
    }.toMap
  }

  /** RGBA-equivalent channel sums of a decoded image (gray replicated,
    * missing alpha = 255), matching libtiff's RGBA raster convention.
    */
  private def rgbaSums(img: JpegCodec.DecodedImage): (Long, Long, Long, Long) = {
    var rs = 0L; var gs = 0L; var bs = 0L; var as = 0L
    val n = img.width * img.height
    var p = 0
    while (p < n) {
      img.channels match {
        case 1 =>
          val v = (img.pixels(p) & 0xff).toLong
          rs += v; gs += v; bs += v; as += 255
        case 3 =>
          rs += img.pixels(p * 3) & 0xff
          gs += img.pixels(p * 3 + 1) & 0xff
          bs += img.pixels(p * 3 + 2) & 0xff
          as += 255
        case 4 =>
          // libtiff's RGBA reader PREMULTIPLIES unassociated alpha
          // with round-half-up: (v*a + 127) / 255. Our decode keeps
          // the raw samples (the pattern test pins those); fold the
          // same convention here so the sums comparison is apples to
          // apples.
          val a = img.pixels(p * 4 + 3) & 0xff
          rs += ((img.pixels(p * 4) & 0xff) * a + 127) / 255
          gs += ((img.pixels(p * 4 + 1) & 0xff) * a + 127) / 255
          bs += ((img.pixels(p * 4 + 2) & 0xff) * a + 127) / 255
          as += a
      }
      p += 1
    }
    (rs, gs, bs, as)
  }

  private def assertLibtiffSums(i: Int, img: JpegCodec.DecodedImage): Unit = {
    val (w, h, _, rs, gs, bs, as) = expected(i)
    assert(img.width == w && img.height == h, s"fixture $i dims")
    assert(rgbaSums(img) == ((rs, gs, bs, as)), s"fixture $i channel sums vs libtiff")
  }

  private def assertGray(i: Int, shift: Int = 0): Unit = {
    val img = TiffCodec.decode(i.toLong, fixture(i))
    assertLibtiffSums(i, img)
    assert(img.channels == 1)
    for (y <- 0 until img.height; x <- 0 until img.width)
      assert((img.pixels(y * img.width + x) & 0xff) == (gray(x, y) + shift) % 256,
        s"fixture $i gray($x,$y)")
  }

  private def assertRgb(i: Int, samples: Int = 3): Unit = {
    val img = TiffCodec.decode(i.toLong, fixture(i))
    assertLibtiffSums(i, img)
    assert(img.channels == samples)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      for (c <- 0 until 3)
        assert((img.pixels((y * img.width + x) * samples + c) & 0xff) == rgb(x, y, c),
          s"fixture $i rgb($x,$y,$c)")
      if (samples == 4)
        assert((img.pixels((y * img.width + x) * 4 + 3) & 0xff) == alpha(x, y),
          s"fixture $i alpha($x,$y)")
    }
  }

  private def assertInk(i: Int, minIsWhite: Boolean = true): Unit = {
    val img = TiffCodec.decode(i.toLong, fixture(i))
    assertLibtiffSums(i, img)
    assert(img.channels == 1)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val exp = if (ink(x, y) == minIsWhite) 0 else 255
      assert((img.pixels(y * img.width + x) & 0xff) == exp, s"fixture $i ink($x,$y)")
    }
  }

  // ---- fixture matrix -----------------------------------------------
  test("gray strips uncompressed (fixture 0)") { assertGray(0) }
  test("gray strips LZW + predictor (fixture 1)") { assertGray(1) }
  test("RGB big-endian uncompressed (fixture 2)") { assertRgb(2) }
  test("RGB LZW no predictor (fixture 3)") { assertRgb(3) }
  test("RGB LZW + predictor (fixture 4)") { assertRgb(4) }
  test("RGB tiled Deflate + predictor (fixture 5)") { assertRgb(5) }
  test("RGB PackBits (fixture 6)") { assertRgb(6) }
  test("RGBA LZW + predictor, ExtraSamples (fixture 7)") { assertRgb(7, samples = 4) }

  test("palette uncompressed (fixture 8)") {
    val img = TiffCodec.decode(8L, fixture(8))
    assertLibtiffSums(8, img)
    assert(img.channels == 3)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val i = palIdx(x, y)
      val p = (y * img.width + x) * 3
      assert((img.pixels(p) & 0xff) == i)
      assert((img.pixels(p + 1) & 0xff) == 255 - i)
      assert((img.pixels(p + 2) & 0xff) == (i * 3) % 256)
    }
  }

  test("bilevel Group 4 (fixture 9)") { assertInk(9) }
  test("bilevel Group 3 1D (fixture 10)") { assertInk(10) }
  test("bilevel MH-RLE (fixture 11)") { assertInk(11) }
  test("bilevel uncompressed MinIsBlack (fixture 12)") {
    // stored bit = ink; MinIsBlack maps 1 -> white(255)
    assertInk(12, minIsWhite = false)
  }
  test("gray big-endian LZW + predictor (fixture 13)") { assertGray(13) }
  test("RGB legacy Deflate 32946 (fixture 14)") { assertRgb(14) }

  test("T.4 codeword sweep, Group 4 (fixture 15)") {
    val img = TiffCodec.decode(15L, fixture(15))
    assertLibtiffSums(15, img)
    for (y <- 0 until img.height; x <- 0 until img.width)
      assert((img.pixels(y * img.width + x) & 0xff) == (if (sweepInk(x, y)) 0 else 255),
        s"sweep G4 ($x,$y)")
  }
  test("T.4 codeword sweep, MH-RLE (fixture 16)") {
    val img = TiffCodec.decode(16L, fixture(16))
    assertLibtiffSums(16, img)
    for (y <- 0 until img.height; x <- 0 until img.width)
      assert((img.pixels(y * img.width + x) & 0xff) == (if (sweepInk(x, y)) 0 else 255),
        s"sweep MH ($x,$y)")
  }

  test("multi-page decode (fixture 17)") {
    val b = fixture(17)
    assert(TiffCodec.nPages(17L, b) == 3)
    assert(TiffCodec.meta(17L, b).nPages == 3)
    for (p <- 0 until 3) {
      val img = TiffCodec.decodePage(17L, b, p)
      assert(img.width == 61 && img.height == 37 && img.channels == 1)
      for (y <- 0 until 37; x <- 0 until 61)
        assert((img.pixels(y * 61 + x) & 0xff) == (gray(x, y) + p * 17) % 256,
          s"page $p ($x,$y)")
    }
    assertLibtiffSums(17, TiffCodec.decodePage(17L, b, 0))
  }

  test("bilevel Group 3 2D (fixture 18)") { assertInk(18) }
  test("bilevel MH-RLE FillOrder 2 (fixture 19)") { assertInk(19) }

  test("Orientation tag parsed; storage unrotated (fixture 20)") {
    val b = fixture(20)
    assert(TiffCodec.exifOrientation(20L, b) == 3)
    // decode() yields STORED pixels; normalization applies elsewhere
    val img = TiffCodec.decode(20L, b)
    for (y <- 0 until 37; x <- 0 until 61)
      assert((img.pixels(y * 61 + x) & 0xff) == gray(x, y))
    assertLibtiffSums(20, img) // sums invariant under 180-rotation
  }

  // ---- own-encoder round-trips --------------------------------------
  private def det(i: Int, salt: Int): Int =
    (((i + 11) * (salt + 17) * 1103515245L + 12345) >>> 16).toInt & 0xff

  test("encode/decode round-trip matrix") {
    for {
      comp <- Seq(1, 5, 8, 32773)
      ch <- Seq(1, 3)
      pred <- Seq(false, true)
      be <- Seq(false, true)
      if !pred || comp == 5 || comp == 8
    } {
      val w = 37; val h = 23
      val px = Array.tabulate(w * h * ch)(i => det(i, comp + ch).toByte)
      val enc = TiffCodec.encode(w, h, ch, px, compression = comp,
        predictor = pred, bigEndian = be, rowsPerStrip = 7)
      assert(TiffCodec.isTiff(enc))
      val img = TiffCodec.decode(1L, enc)
      assert(img.width == w && img.height == h && img.channels == ch,
        s"comp=$comp ch=$ch pred=$pred be=$be dims")
      assert(java.util.Arrays.equals(img.pixels, px),
        s"comp=$comp ch=$ch pred=$pred be=$be pixels")
    }
  }

  test("encode multi-page round-trip, every compression") {
    val w = 31; val h = 18
    for (comp <- Seq(1, 5, 8, 32773); be <- Seq(false, true)) {
      val pages = (0 until 3).map(p =>
        Array.tabulate(w * h)(i => det(i, comp + p * 7).toByte))
      val enc = TiffCodec.encodeGrayPages(w, h, pages, compression = comp,
        predictor = comp == 5, bigEndian = be, rowsPerStrip = 5)
      assert(TiffCodec.nPages(6L, enc) == 3, s"comp=$comp be=$be")
      for (p <- 0 until 3) {
        val img = TiffCodec.decodePage(6L, enc, p)
        assert(img.width == w && img.height == h && img.channels == 1)
        assert(java.util.Arrays.equals(img.pixels, pages(p)),
          s"comp=$comp be=$be page=$p")
      }
    }
  }

  test("encode palette round-trip") {
    val w = 29; val h = 17
    val idx = Array.tabulate(w * h)(i => det(i, 3).toByte)
    val pal = Array.tabulate(768)(i => det(i, 9).toByte)
    val enc = TiffCodec.encodePalette(w, h, idx, pal, compression = 5)
    val img = TiffCodec.decode(2L, enc)
    assert(img.width == w && img.height == h && img.channels == 3)
    for (p <- 0 until w * h; c <- 0 until 3)
      assert((img.pixels(p * 3 + c) & 0xff) == (pal((idx(p) & 0xff) * 3 + c) & 0xff))
  }

  test("encode bilevel round-trip") {
    val w = 41; val h = 19
    def b(x: Int, y: Int): Boolean = det(y * w + x, 5) > 127
    val enc = TiffCodec.encodeBilevel(w, h, b)
    val img = TiffCodec.decode(3L, enc)
    assert(img.width == w && img.height == h && img.channels == 1)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xff) == (if (b(x, y)) 255 else 0))
  }

  test("PackBits survives pathological runs") {
    val w = 300; val h = 3
    // long repeats (>128), alternating bytes, trailing 2-run
    val px = Array.tabulate(w * h) { i =>
      if (i < 200) 7.toByte
      else if (i % 2 == 0) 1.toByte else 2.toByte
    }
    val enc = TiffCodec.encode(w, h, 1, px, compression = 32773)
    assert(java.util.Arrays.equals(TiffCodec.decode(4L, enc).pixels, px))
  }

  // ---- loud failures --------------------------------------------------
  test("corruption fails loudly with the media id") {
    val good = fixture(1)
    val badMagic = good.clone(); badMagic(0) = 'X'
    val eMagic = intercept[IllegalArgumentException](TiffCodec.decode(7L, badMagic))
    assert(eMagic.getMessage.contains("media 7"))

    val truncated = java.util.Arrays.copyOf(good, 60)
    val eTrunc = intercept[Exception](TiffCodec.decode(8L, truncated))
    assert(eTrunc.getMessage.contains("media 8"))

    // 16-bit samples rejected by name
    val px = Array.fill(4 * 4)(0.toByte)
    val enc = TiffCodec.encode(4, 4, 1, px, compression = 1)
    // patch BitsPerSample (tag 258 SHORT) from 8 -> 16: find the IFD
    // entry and rewrite its inline value
    val e16 = {
      val b = enc.clone()
      // II header: IFD offset at 4
      val ifd = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      val n = (b(ifd) & 0xff) | ((b(ifd + 1) & 0xff) << 8)
      var patched = false
      for (i <- 0 until n) {
        val eo = ifd + 2 + i * 12
        val tag = (b(eo) & 0xff) | ((b(eo + 1) & 0xff) << 8)
        if (tag == 258) { b(eo + 8) = 16.toByte; patched = true }
      }
      assert(patched)
      intercept[IllegalArgumentException](TiffCodec.decode(9L, b))
    }
    assert(e16.getMessage.contains("media 9") && e16.getMessage.contains("16-bit"))
  }

  test("sniff detects both byte orders") {
    assert(TiffCodec.isTiff(fixture(0)))
    assert(TiffCodec.isTiff(fixture(2))) // MM
    assert(!TiffCodec.isTiff("%PDF-1.4".getBytes))
  }
}
