package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GIF codec: lossless round-trips through our LZW encoder/decoder,
  * two-direction interop with the JDK's independent ImageIO GIF
  * implementation, interlacing, animation compositing (disposal and
  * transparency), and loud id-tagged corruption failures.
  */
class GifSpec extends AnyFunSuite {

  private def det(i: Int, salt: Int): Int =
    (((i + 7) * (salt + 13) * 1103515245L + 12345) >>> 16).toInt & 0xff

  /** 256-entry palette where entry i = (i, i^0x5a, 255-i). */
  private def pal256: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(i * 3) = i.toByte
      p(i * 3 + 1) = (i ^ 0x5a).toByte
      p(i * 3 + 2) = (255 - i).toByte
      i += 1
    }
    p
  }

  private def frame(w: Int, h: Int, salt: Int): Array[Byte] = {
    val f = new Array[Byte](w * h)
    var i = 0
    while (i < f.length) { f(i) = det(i, salt).toByte; i += 1 }
    f
  }

  private def expectRgb(idx: Array[Byte], pal: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](idx.length * 3)
    var i = 0
    while (i < idx.length) {
      val v = idx(i) & 0xff
      out(i * 3) = pal(v * 3)
      out(i * 3 + 1) = pal(v * 3 + 1)
      out(i * 3 + 2) = pal(v * 3 + 2)
      i += 1
    }
    out
  }

  test("round-trip single frame exact (LZW + palette)") {
    for ((w, h, salt) <- Seq((64, 48, 1), (17, 9, 2), (1, 1, 3), (5, 300, 4))) {
      val f = frame(w, h, salt)
      val enc = GifCodec.encode(w, h, pal256, Seq(f))
      val img = GifCodec.decode(42L, enc)
      assert(img.width == w && img.height == h && img.nFrames == 1)
      assert(java.util.Arrays.equals(img.frames.head.pixels, expectRgb(f, pal256)))
    }
  }

  test("round-trip forces LZW dictionary overflow (clear-on-full)") {
    // high-entropy 200x200 = 40k pixels exhausts the 4096-code dict
    // repeatedly, exercising mid-stream clear codes in both directions
    val w = 200; val h = 200
    val f = frame(w, h, 5)
    val img = GifCodec.decode(1L, GifCodec.encode(w, h, pal256, Seq(f)))
    assert(java.util.Arrays.equals(img.frames.head.pixels, expectRgb(f, pal256)))
  }

  test("round-trip interlaced exact") {
    val w = 31; val h = 23 // odd dims stress the 4-pass row map
    val f = frame(w, h, 6)
    val enc = GifCodec.encode(w, h, pal256, Seq(f), interlaced = true)
    assert((enc(6 + 7 + 768 + 8 + 9) & 0x40) != 0, "fixture not interlaced")
    val img = GifCodec.decode(2L, enc)
    assert(java.util.Arrays.equals(img.frames.head.pixels, expectRgb(f, pal256)))
  }

  test("round-trip small palette (4 colors, min code size 2)") {
    val pal = Array[Byte](0, 0, 0, 127, 0, 0, 0, 127, 0, 0, 0, 127)
    val w = 40; val h = 30
    val f = new Array[Byte](w * h)
    var i = 0
    while (i < f.length) { f(i) = (det(i, 7) % 4).toByte; i += 1 }
    val img = GifCodec.decode(3L, GifCodec.encode(w, h, pal, Seq(f)))
    assert(java.util.Arrays.equals(img.frames.head.pixels, expectRgb(f, pal)))
  }

  test("animated round-trip: every frame composites exactly (disposal keep)") {
    val w = 24; val h = 18
    val fs = Seq(frame(w, h, 8), frame(w, h, 9), frame(w, h, 10))
    val img = GifCodec.decode(4L, GifCodec.encode(w, h, pal256, fs))
    assert(img.nFrames == 3)
    // full-canvas opaque frames: composited == raw expansion
    fs.zipWithIndex.foreach { case (f, i) =>
      assert(java.util.Arrays.equals(img.frames(i).pixels, expectRgb(f, pal256)),
        s"frame $i")
      assert(img.frames(i).delayCs == 10)
    }
  }

  test("transparency + disposal: transparent pixels keep the prior canvas") {
    // hand-build: frame 1 full red; frame 2 full-canvas with the
    // TRANSPARENT index everywhere except one green pixel -> frame 2's
    // composite must be red with one green pixel
    val pal = Array[Byte](
      255.toByte, 0, 0, // 0 = red
      0, 255.toByte, 0, // 1 = green
      0, 0, 255.toByte, // 2 = blue (transparent slot)
      0, 0, 0)
    val w = 4; val h = 3
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    le16(w); le16(h); out.write(0x80 | 1); out.write(0); out.write(0)
    out.write(pal, 0, 12)
    def writeFrame(indices: Array[Byte], transparent: Int): Unit = {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((1 << 2) | (if (transparent >= 0) 1 else 0))
      le16(0); out.write(math.max(0, transparent)); out.write(0)
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      // real LZW stream around a hand-assembled container (the GCE
      // transparency flag is container-level; the pixel stream is
      // ordinary)
      out.write(2)
      val z = GifCodec.lzwEncode(indices, 2)
      var off = 0
      while (off < z.length) {
        val n = math.min(255, z.length - off)
        out.write(n); out.write(z, off, n); off += n
      }
      out.write(0)
    }
    writeFrame(Array.fill[Byte](w * h)(0), -1) // all red
    val f2 = Array.fill[Byte](w * h)(2) // transparent index 2
    f2(5) = 1 // one green pixel
    writeFrame(f2, 2)
    out.write(0x3b)
    val img = GifCodec.decode(5L, out.toByteArray)
    assert(img.nFrames == 2)
    val c2 = img.frames(1).pixels
    var p = 0
    while (p < w * h) {
      val (r, g) = (c2(p * 3) & 0xff, c2(p * 3 + 1) & 0xff)
      if (p == 5) assert(g == 255 && r == 0, s"pixel $p should be green")
      else assert(r == 255 && g == 0, s"pixel $p should show through red")
      p += 1
    }
  }

  // --- ours -> ImageIO ------------------------------------------------

  test("ImageIO decodes our single-frame GIF exactly") {
    val w = 40; val h = 25
    val f = frame(w, h, 11)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(GifCodec.encode(w, h, pal256, Seq(f))))
    require(bi != null, "ImageIO failed to decode our GIF")
    val exp = expectRgb(f, pal256)
    var p = 0
    while (p < w * h) {
      val argb = bi.getRGB(p % w, p / w)
      assert(((argb >> 16) & 0xff) == (exp(p * 3) & 0xff), s"R pixel $p")
      assert(((argb >> 8) & 0xff) == (exp(p * 3 + 1) & 0xff), s"G pixel $p")
      assert((argb & 0xff) == (exp(p * 3 + 2) & 0xff), s"B pixel $p")
      p += 1
    }
  }

  test("ImageIO reads every frame of our animated GIF") {
    val w = 16; val h = 12
    val fs = Seq(frame(w, h, 12), frame(w, h, 13), frame(w, h, 14))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(GifCodec.encode(w, h, pal256, fs))))
    assert(reader.getNumImages(true) == 3)
    fs.zipWithIndex.foreach { case (f, i) =>
      val bi = reader.read(i)
      val exp = expectRgb(f, pal256)
      var p = 0
      while (p < w * h) {
        val argb = bi.getRGB(p % w, p / w)
        assert(((argb >> 16) & 0xff) == (exp(p * 3) & 0xff), s"frame $i pixel $p")
        p += 1
      }
    }
    reader.dispose()
  }

  // --- ImageIO -> ours ------------------------------------------------

  test("we decode ImageIO GIF output exactly") {
    val w = 37; val h = 29
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    var p = 0
    while (p < w * h) {
      bi.setRGB(p % w, p / w, (det(p, 15) << 16) | (det(p, 16) << 8) | det(p, 17))
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", out))
    val bytes = out.toByteArray
    val img = GifCodec.decode(7L, bytes)
    assert(img.width == w && img.height == h && img.nFrames == 1)
    // compare against ImageIO's own read of the same bytes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = img.frames.head.pixels
    p = 0
    while (p < w * h) {
      val argb = ref.getRGB(p % w, p / w)
      assert((px(p * 3) & 0xff) == ((argb >> 16) & 0xff), s"R pixel $p")
      assert((px(p * 3 + 1) & 0xff) == ((argb >> 8) & 0xff), s"G pixel $p")
      assert((px(p * 3 + 2) & 0xff) == (argb & 0xff), s"B pixel $p")
      p += 1
    }
  }

  // --- corruption -----------------------------------------------------

  test("corrupt inputs fail loudly with the media id") {
    val good = GifCodec.encode(16, 16, pal256, Seq(frame(16, 16, 20)))
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val bad = mutate(good.clone())
      val e = intercept[IllegalArgumentException](GifCodec.decode(99L, bad))
      assert(e.getMessage.contains("media 99"), s"$what: ${e.getMessage}")
    }
    expectFail(b => { b(0) = 'J'.toByte; b }, "signature")
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 10), "truncation")
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 1), "no trailer")
    expectFail(b => { b(b.length - 1) = 0x7f; b }, "unknown block")
    // frame rect outside canvas: image descriptor follows the 768-byte
    // global table + 8-byte GCE intro at fixed offsets in our encoder
    expectFail(b => {
      val idOff = 13 + 768 + 8 // 0x2c marker
      require(b(idOff) == 0x2c, "fixture layout changed")
      b(idOff + 5) = 0xff.toByte // frame width low byte -> 255 > canvas
      b
    }, "frame rect")
  }
}
