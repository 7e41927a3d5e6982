package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property hardening for the container/image codecs: deterministic
  * pseudo-random round-trips across dimension/size/content edge
  * cases, and a fuzz pass asserting the LOUD-FAILURE CONTRACT — a
  * mutated archive either still decodes or throws the id-tagged
  * IllegalArgumentException; never an untyped crash
  * (ArrayIndexOutOfBounds, NegativeArraySize, OOM) and never a hang.
  * Pure JVM, no Spark session.
  */
class CodecPropSpec extends AnyFunSuite {

  // deterministic LCG so failures replay exactly
  private final class Rng(seed0: Long) {
    private var s = seed0
    def nextInt(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
    def bytes(n: Int): Array[Byte] = Array.fill(n)(nextInt(256).toByte)
  }

  // --- round-trip properties -----------------------------------------

  test("PNG: random images round-trip across dims and channel counts") {
    (0 until 60).foreach { i =>
      val r = new Rng(1000 + i)
      val w = 1 + r.nextInt(37)
      val h = 1 + r.nextInt(29)
      val ch = if (r.nextInt(2) == 0) 1 else 3
      val px = r.bytes(w * h * ch)
      val img = PngCodec.decode(i.toLong, PngCodec.encode(w, h, ch, px))
      assert(img.width == w && img.height == h && img.channels == ch, s"case $i")
      assert(java.util.Arrays.equals(img.pixels, px), s"case $i pixels")
    }
  }

  test("GIF: random palettes and frame stacks round-trip") {
    (0 until 40).foreach { i =>
      val r = new Rng(2000 + i)
      val palBits = 1 + r.nextInt(8) // 2..256 colors
      val nColors = 1 << palBits
      val pal = r.bytes(nColors * 3)
      val w = 1 + r.nextInt(25)
      val h = 1 + r.nextInt(19)
      val nf = 1 + r.nextInt(3)
      val frames = (0 until nf).map(_ =>
        Array.fill(w * h)(r.nextInt(nColors).toByte))
      val interlaced = r.nextInt(2) == 0
      val img = GifCodec.decode(i.toLong,
        GifCodec.encode(w, h, pal, frames, interlaced))
      assert(img.nFrames == nf, s"case $i")
      frames.zipWithIndex.foreach { case (f, fi) =>
        val px = img.frames(fi).pixels
        var p = 0
        while (p < w * h) {
          val idx = f(p) & 0xff
          assert((px(p * 3) & 0xff) == (pal(idx * 3) & 0xff),
            s"case $i frame $fi pixel $p")
          p += 1
        }
      }
    }
  }

  test("TAR: random member sets round-trip incl. boundary sizes") {
    (0 until 40).foreach { i =>
      val r = new Rng(3000 + i)
      val n = 1 + r.nextInt(6)
      val ms = (0 until n).map { k =>
        val size = r.nextInt(4) match {
          case 0 => 0
          case 1 => 512 * (1 + r.nextInt(3))
          case 2 => 511 + r.nextInt(3)
          case _ => r.nextInt(1500)
        }
        (f"m$i%03d_$k.bin", r.bytes(size))
      }
      val back = TarCodec.parse(i.toLong, TarCodec.write(ms))
      assert(back.map(_._1) == ms.map(_._1), s"case $i")
      back.zip(ms).foreach { case ((_, a), (_, b)) =>
        assert(java.util.Arrays.equals(a, b), s"case $i")
      }
    }
  }

  test("ZIP: random member sets round-trip") {
    (0 until 40).foreach { i =>
      val r = new Rng(4000 + i)
      val n = 1 + r.nextInt(6)
      val ms = (0 until n).map { k =>
        (f"d/$i%03d/$k.bin", r.bytes(r.nextInt(1200)))
      }
      val back = ZipCodec.parse(i.toLong, ZipCodec.write(ms))
      assert(back.map(_._1) == ms.map(_._1), s"case $i")
      back.zip(ms).foreach { case ((_, a), (_, b)) =>
        assert(java.util.Arrays.equals(a, b), s"case $i")
      }
    }
  }

  test("WARC: random page sets round-trip in all three layouts") {
    (0 until 30).foreach { i =>
      val r = new Rng(5000 + i)
      val n = 1 + r.nextInt(5)
      val pages = (0 until n).map(k =>
        (s"https://x$i.com/p$k", r.bytes(r.nextInt(900))))
      val layout = r.nextInt(3)
      val bytes = layout match {
        case 0 => WarcCodec.writeResponses(pages)
        case 1 => WarcCodec.writeResponses(pages, gzipPerRecord = true)
        case _ =>
          val gz = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(gz)
          g.write(WarcCodec.writeResponses(pages))
          g.close()
          gz.toByteArray
      }
      val recs = WarcCodec.parse(i.toLong, bytes)
      assert(recs.length == n, s"case $i layout $layout")
      recs.zip(pages).foreach { case (rec, (_, body)) =>
        assert(java.util.Arrays.equals(rec.payload, body), s"case $i")
      }
    }
  }

  // --- fuzz: the loud-failure contract --------------------------------

  // flips of ancillary bytes may legitimately survive decoding; the
  // contract under test is the FAILURE SHAPE, not failure certainty
  private def fuzzContract(name: String, good: Array[Byte],
      decode: Array[Byte] => Unit, cases: Int, seed: Int): Unit =
    (0 until cases).foreach { i =>
      val r = new Rng(seed + i)
      val b = good.clone()
      r.nextInt(3) match {
        case 0 => // flip 1-4 random bytes
          (0 to r.nextInt(4)).foreach { _ =>
            val p = r.nextInt(b.length)
            b(p) = (b(p) ^ (1 + r.nextInt(255))).toByte
          }
          tryDecode(name, i, b, decode)
        case 1 => // truncate
          tryDecode(name, i,
            java.util.Arrays.copyOfRange(b, 0, 1 + r.nextInt(b.length)), decode)
        case _ => // splice garbage into the middle
          val at = r.nextInt(b.length)
          val junk = r.bytes(1 + r.nextInt(64))
          tryDecode(name, i, java.util.Arrays.copyOfRange(b, 0, at) ++ junk ++
            java.util.Arrays.copyOfRange(b, at, b.length), decode)
      }
    }

  private def tryDecode(name: String, i: Int, b: Array[Byte],
      decode: Array[Byte] => Unit): Unit =
    try decode(b)
    catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage != null && e.getMessage.contains("media"),
          s"$name fuzz $i: untagged IllegalArgumentException: ${e.getMessage}")
      case e: Throwable =>
        fail(s"$name fuzz $i: contract violation — ${e.getClass.getName}: ${e.getMessage}")
    }

  test("fuzz: every codec fails loudly or survives, never crashes untyped") {
    val r = new Rng(77)
    val pngGood = PngCodec.encode(24, 16, 3, r.bytes(24 * 16 * 3))
    fuzzContract("png", pngGood, b => PngCodec.decode(9L, b), 120, 10000)

    val pal = r.bytes(256 * 3)
    val gifGood = GifCodec.encode(20, 14, pal,
      Seq(r.bytes(280), r.bytes(280)))
    fuzzContract("gif", gifGood, b => GifCodec.decode(9L, b), 120, 20000)

    val tarGood = TarCodec.write(Seq("a.bin" -> r.bytes(700), "b.bin" -> r.bytes(90)))
    fuzzContract("tar", tarGood, b => TarCodec.parse(9L, b), 120, 30000)

    val zipGood = ZipCodec.write(Seq("a.bin" -> r.bytes(700), "b.bin" -> r.bytes(90)))
    fuzzContract("zip", zipGood, b => ZipCodec.parse(9L, b), 120, 40000)

    val warcGood = WarcCodec.writeResponses(
      Seq(("https://f.com/1", r.bytes(300))), gzipPerRecord = true)
    fuzzContract("warc", warcGood, b => WarcCodec.parse(9L, b), 120, 50000)
  }

  test("fuzz: the media codecs honor the same contract") {
    val r = new Rng(99)
    val rgb = r.bytes(48 * 32 * 3)
    val jpegGood = JpegCodec.encodeRgb(48, 32, rgb, quality = 90, subsample = true)
    fuzzContract("jpeg", jpegGood, b => JpegCodec.decode(9L, b), 120, 60000)

    val wavGood = Multimodal.WavCodec.synthesize(8000,
      Array.tabulate(500)(i => ((i * 377) % 65536 - 32768).toShort))
    fuzzContract("wav", wavGood, b => Multimodal.WavCodec.parse(9L, b), 120, 70000)

    val bmpGood = Multimodal.BmpCodec.synthesize(23, 17, i => (i * 11) % 256)
    fuzzContract("bmp", bmpGood, b => Multimodal.BmpCodec.parse(9L, b), 120, 80000)

    val aviGood = AviCodec.synthesize(48, 32, 33333, Seq(jpegGood, jpegGood))
    fuzzContract("avi", aviGood, b => {
      val v = AviCodec.parse(9L, b)
      v.frames.foreach(f => JpegCodec.decode(9L, f))
    }, 120, 90000)
  }
}
