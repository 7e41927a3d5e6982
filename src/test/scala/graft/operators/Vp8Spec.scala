package graft.operators

/** RFC 6386 VP8 keyframe decoder: byte-exact YUV interop against the
  * system libwebp across content classes, qualities, segmentation,
  * token partitions and loop-filter strengths; a pinned real-encoder
  * fixture that runs without python; routing through the shared
  * multimodal dispatch; loud id-tagged corruption failures.
  */
class Vp8Spec extends graft.SparkSpec {

  private lazy val python: Option[String] =
    graft.BinTool.resolve("python3").filter { py =>
      try {
        val p = new ProcessBuilder(py, "-c",
          "import ctypes; ctypes.CDLL('libwebp.so.7')").start()
        p.waitFor() == 0
      } catch { case _: Exception => false }
    }

  private def run(stdin: Array[Byte], args: String*): String = {
    val pb = new ProcessBuilder((Seq(python.get, "tools/webp_probe.py") ++
      args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.write(stdin); p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"webp_probe ${args.mkString(" ")}: $out")
    out.trim
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def encodeVp8(w: Int, h: Int, rgba: Array[Byte], quality: Int,
      filterStrength: Int, segments: Int, partitionsLog2: Int): Array[Byte] =
    hex(run(rgba, "encode-vp8", w.toString, h.toString, quality.toString,
      filterStrength.toString, segments.toString, partitionsLog2.toString))

  private def libwebpYuv(bytes: Array[Byte])
      : (Int, Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val parts = run(bytes, "decode-yuv").split(" ")
    (parts(0).toInt, parts(1).toInt, hex(parts(2)), hex(parts(3)), hex(parts(4)))
  }

  test("fuzz: YUV planes byte-exact vs libwebp across configs") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val rnd = new scala.util.Random(60386)
    def noise(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h * 4)(i => (if (i % 4 == 3) 255 else rnd.nextInt(256)).toByte)
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4
        (i % 4 match {
          case 0 => (p % w) * 255 / math.max(1, w - 1)
          case 1 => (p / w) * 255 / math.max(1, h - 1)
          case 2 => 128
          case _ => 255
        }).toByte
      }
    def blocky(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4
        (if (i % 4 == 3) 255
        else ((p % w) / 8 * 37 + (p / w) / 8 * 53) % 256).toByte
      }
    // (w, h, content, quality, filter_strength, segments, partitions)
    val cases = Seq(
      (32, 32, gradient(32, 32), 75, 0, 1, 0),
      (1, 1, noise(1, 1), 75, 0, 1, 0),
      (16, 16, noise(16, 16), 75, 0, 1, 0),
      (33, 17, gradient(33, 17), 75, 0, 1, 0),
      (64, 48, noise(64, 48), 75, 0, 1, 0),
      (80, 64, gradient(80, 64), 95, 0, 1, 0),
      (80, 64, gradient(80, 64), 10, 0, 1, 0),
      (64, 64, noise(64, 64), 30, 0, 4, 0),   // segmentation
      (96, 80, blocky(96, 80), 75, 0, 4, 0),
      (64, 64, gradient(64, 64), 75, 0, 1, 1), // 2 token partitions
      (128, 96, noise(128, 96), 75, 0, 1, 2),  // 4 token partitions
      (64, 64, gradient(64, 64), 75, 60, 1, 0), // normal loop filter
      (64, 64, noise(64, 64), 75, 60, 1, 0),
      (96, 96, blocky(96, 96), 40, 100, 1, 0),
      (48, 80, gradient(48, 80), 85, 30, 1, 0),
      (200, 150, blocky(200, 150), 60, 60, 4, 1),
      (144, 112, noise(144, 112), 20, 80, 4, 2),
      // more token partitions than MB rows: a 1-row image with 8/4
      // partitions leaves 7/3 of them 0-byte — spec-valid streams the
      // boolean decoder must pad with virtual zero bytes, not reject
      (16, 16, noise(16, 16), 75, 0, 1, 3),
      (48, 16, gradient(48, 16), 75, 0, 1, 2),
      (64, 32, blocky(64, 32), 75, 30, 1, 3))
    for ((w, h, rgba, q, fs, segs, pl) <- cases) {
      val enc = encodeVp8(w, h, rgba, q, fs, segs, pl)
      val (rw, rh, ry, ru, rv) = libwebpYuv(enc)
      val f = WebpCodec.decodeYuv(7L, enc)
      assert(f.width === rw && f.height === rh, s"${w}x$h q$q dims")
      assert(f.y.toSeq === ry.toSeq, s"${w}x$h q$q fs$fs segs$segs p$pl: Y")
      assert(f.u.toSeq === ru.toSeq, s"${w}x$h q$q fs$fs segs$segs p$pl: U")
      assert(f.v.toSeq === rv.toSeq, s"${w}x$h q$q fs$fs segs$segs p$pl: V")
    }
  }

  test("pinned libwebp lossy fixture decodes exactly (no python needed)") {
    // 16x16 two-tone 8x8 blocks (40/200 gray), q50, filter_strength=0,
    // 1 segment — encoded by libwebp 7.1.5; expected planes are
    // WebPDecodeYUV's own output pinned at generation time
    val fixture =
      "524946462800000057454250565038201c0000003401009d012a10001000" +
        "00004c25a400037000fec59effff07580000"
    val expectY =
      "3232323232323232bcbcbcbcbcbcbcbc" * 8 +
        "bcbcbcbcbcbcbcbc3232323232323232" * 8
    val f = WebpCodec.decodeYuv(3L, hex(fixture))
    assert(f.width === 16 && f.height === 16)
    assert(f.y.toSeq === hex(expectY).toSeq)
    assert(f.u.forall(_ == 0x80.toByte) && f.u.length === 64)
    assert(f.v.forall(_ == 0x80.toByte) && f.v.length === 64)
  }

  test("lossy WebP routes through the shared dispatch with real pixels") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val w = 48; val h = 32
    val rgba = Array.tabulate(w * h * 4)(i =>
      (if (i % 4 == 3) 255 else ((i / 4 % w) * 4 + (i / 4 / w) * 2) & 0xff).toByte)
    val enc = encodeVp8(w, h, rgba, 75, 60, 1, 0)
    assert(Multimodal.sniffModality(enc) === "image/webp-lossy")
    val img = WebpCodec.decode(5L, enc)
    assert(!img.lossless && img.width === w && img.height === h)
    assert(img.pixels.length === w * h)
    assert(img.pixels.forall(p => (p >>> 24) == 0xff))
    // decodeNormalized serves RGB pixels; the hash is stable
    val (m, d) = Multimodal.decodeNormalized(5L, enc)
    assert(m === "image/webp-lossy" && d.width === w && d.channels === 3)
    val h1 = MjpegVideo.aHashDecoded(d)
    val h2 = MjpegVideo.aHashDecoded(Multimodal.decodeNormalized(5L, enc)._2)
    assert(h1 === h2)
  }

  test("ALPH alpha planes decode exactly (VP8L-compressed, raw, filtered)") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val rnd = new scala.util.Random(777)
    def rgbaAlpha(w: Int, h: Int, kind: Int): Array[Byte] =
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4
        (i % 4 match {
          case 3 => kind match {
            case 0 => (p % w) * 255 / math.max(1, w - 1) // smooth ramp
            case 1 => rnd.nextInt(256) // noise alpha
            case _ => if ((p % w / 8 + p / w / 8) % 2 == 0) 64 else 255 // blocky
          }
          case c => (p * 3 + c * 7) & 0xff
        }).toByte
      }
    // (content kind, alpha_compression, alpha_filtering)
    for ((kind, ac, af) <- Seq((0, 1, 1), (1, 1, 1), (2, 1, 1),
      (0, 0, 1), (1, 0, 2), (0, 1, 3), (2, 1, 2))) {
      val w = 40; val h = 32
      val rgba = rgbaAlpha(w, h, kind)
      val enc = hex(run(rgba, "encode-vp8", w.toString, h.toString, "75",
        "0", "1", "0", ac.toString, af.toString))
      // libwebp's RGBA alpha channel is the ground truth (alpha is
      // coded losslessly, so it must match OUR plane byte-for-byte)
      val refAlpha = {
        val parts = run(enc, "decode").split(" ")
        hex(parts(2)).grouped(4).map(_(3)).toArray
      }
      val img = WebpCodec.decode(11L, enc)
      assert(img.hasAlpha, s"kind=$kind ac=$ac af=$af hasAlpha")
      val mine = img.pixels.map(p => ((p >>> 24) & 0xff).toByte)
      assert(mine.toSeq === refAlpha.toSeq, s"kind=$kind ac=$ac af=$af alpha")
    }
  }

  test("lossy frames composite inside animations") {
    // hand-wrap the pinned 16x16 lossy fixture (tone blocks 40/200) as
    // an ANMF frame over a 32x16 lossless base canvas
    val lossy =
      "524946462800000057454250565038201c0000003401009d012a10001000" +
        "00004c25a400037000fec59effff07580000"
    val vp8Chunk = {
      val all = hex(lossy)
      java.util.Arrays.copyOfRange(all, 12, all.length) // 'VP8 ' chunk
    }
    val base = WebpCodec.encodeLossless(32, 16, 3,
      Array.fill(32 * 16 * 3)(90.toByte))
    val baseVp8l = java.util.Arrays.copyOfRange(base, 12, base.length)
    def le24(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]) =
      tag.getBytes ++ Array((body.length & 0xff).toByte,
        ((body.length >> 8) & 0xff).toByte, 0.toByte, 0.toByte) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    val anmf1 = chunk("ANMF", le24(0) ++ le24(0) ++ le24(31) ++ le24(15) ++
      le24(40) ++ Array(0x02.toByte) ++ baseVp8l)
    val anmf2 = chunk("ANMF", le24(8) ++ le24(0) ++ le24(15) ++ le24(15) ++
      le24(50) ++ Array(0x02.toByte) ++ vp8Chunk)
    val vp8x = chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le24(31) ++ le24(15))
    val anim = chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0))
    val body = vp8x ++ anim ++ anmf1 ++ anmf2
    val data = "RIFF".getBytes ++ Array((4 + body.length & 0xff).toByte,
      ((4 + body.length) >> 8 & 0xff).toByte, 0.toByte, 0.toByte) ++
      "WEBP".getBytes ++ body
    val animD = WebpCodec.decodeAnim(8L, data)
    assert(animD.frames.length === 2)
    val f1 = animD.frames(1).pixels
    assert((f1(0) >> 8 & 0xff) === 90)   // untouched base
    assert((f1(16) >> 8 & 0xff) === 40)  // lossy frame (0,0): tone 1
    assert((f1(24) >> 8 & 0xff) === 200) // lossy frame (8,0): tone 2
  }

  test("corrupt lossy payloads fail loudly with the media id") {
    def riffVp8(payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte]((4 + 8 + payload.length).toByte, 0, 0, 0) ++
        "WEBP".getBytes ++ "VP8 ".getBytes ++
        Array[Byte](payload.length.toByte, 0, 0, 0) ++ payload
    def loud(p: Array[Byte]): Unit = {
      val e = intercept[IllegalArgumentException](
        WebpCodec.decode(99L, riffVp8(p)))
      assert(e.getMessage.contains("99"), e.getMessage)
    }
    loud(Array[Byte](1, 2, 3)) // too short
    loud(Array[Byte](0x11, 0, 0, 0x9d.toByte, 0x01, 0x2a, 16, 0, 16, 0)) // interframe bit
    loud(Array[Byte](0x10, 0, 0, 0x11, 0x22, 0x33, 16, 0, 16, 0)) // bad start code
    // declared first-partition length past the payload end
    loud(Array[Byte](0x40, 0x10, 0, 0x9d.toByte, 0x01, 0x2a, 16, 0, 16, 0, 0, 0))
  }
}
