package graft.operators


/** VP8L codec: own-encoder round-trips, TWO-direction interop with the
  * system libwebp (via python3 ctypes — the reference implementation;
  * real encodings exercise predictors, color transform, subtract-green,
  * palette bundling, color cache, meta groups and LZ77), a pinned
  * libwebp fixture that runs without python, lossy VP8 dimension
  * probing, and loud id-tagged corruption failures.
  */
class WebpSpec extends graft.SparkSpec {

  private def det(i: Int, salt: Int): Int =
    (((i + 11) * (salt + 17) * 1103515245L + 12345) >>> 16).toInt & 0xff

  private def rgb(w: Int, h: Int, salt: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => det(i, salt).toByte)

  // ---- python/libwebp bridge (assume()-guarded) ---------------------

  private lazy val python: Option[String] = {
    graft.BinTool.resolve("python3").filter { py =>
      try {
        val p = new ProcessBuilder(py, "-c",
          "import ctypes; ctypes.CDLL('libwebp.so.7')").start()
        p.waitFor() == 0
      } catch { case _: Exception => false }
    }
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

  private def libwebpEncode(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] =
    hex(run(rgba, "encode", w.toString, h.toString))

  private def libwebpDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val parts = run(bytes, "decode").split(" ")
    (parts(0).toInt, parts(1).toInt, hex(parts(2)))
  }

  private def argbToRgba(px: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](px.length * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i * 4) = ((p >> 16) & 0xff).toByte
      out(i * 4 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 4 + 2) = (p & 0xff).toByte
      out(i * 4 + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  // ---- own encoder round-trip --------------------------------------

  test("encodeLossless/decode round-trip: RGB and RGBA, odd sizes") {
    for ((w, h, ch, salt) <- Seq((1, 1, 3, 1), (7, 3, 3, 2), (33, 17, 4, 3),
      (64, 48, 3, 4), (2, 129, 4, 5))) {
      val px = Array.tabulate(w * h * ch)(i => det(i, salt).toByte)
      val img = WebpCodec.decode(1L, WebpCodec.encodeLossless(w, h, ch, px))
      assert(img.width === w && img.height === h && img.lossless)
      val back = new Array[Byte](w * h * ch)
      var i = 0
      while (i < w * h) {
        val p = img.pixels(i)
        back(i * ch) = ((p >> 16) & 0xff).toByte
        back(i * ch + 1) = ((p >> 8) & 0xff).toByte
        back(i * ch + 2) = (p & 0xff).toByte
        if (ch == 4) back(i * ch + 3) = ((p >>> 24) & 0xff).toByte
        i += 1
      }
      assert(back.toSeq === px.toSeq, s"${w}x$h ch=$ch")
      if (ch == 3)
        assert(img.pixels.forall(p => (p >>> 24) == 0xff), "opaque alpha")
    }
  }

  // ---- interop: libwebp encodes, we decode --------------------------

  test("decode matches libwebp output on REAL encodings (transforms, cache, meta, LZ77)") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val rnd = new scala.util.Random(90210)
    def noise(w: Int, h: Int): Array[Byte] =
      Array.fill(w * h * 4)(rnd.nextInt(256).toByte)
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4; val x = p % w; val y = p / w
        (i % 4 match {
          case 0 => x * 255 / w
          case 1 => y * 255 / h
          case 2 => (x + y) * 255 / (w + h)
          case _ => 255
        }).toByte
      }
    def palette4(w: Int, h: Int): Array[Byte] = {
      val colors = Array(0xff204080, 0xffe0a010, 0xff10e070, 0xff777777)
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4; val c = colors(((p % w) / 3 + (p / w) / 2) % 4)
        (i % 4 match {
          case 0 => (c >> 16) & 0xff
          case 1 => (c >> 8) & 0xff
          case 2 => c & 0xff
          case _ => (c >>> 24) & 0xff
        }).toByte
      }
    }
    def tiles(w: Int, h: Int): Array[Byte] = { // LZ77-friendly repeats
      val tile = Array.tabulate(8 * 8 * 4)(i => det(i, 77).toByte)
      Array.tabulate(w * h * 4) { i =>
        val p = i / 4; val x = (p % w) % 8; val y = (p / w) % 8
        tile((y * 8 + x) * 4 + i % 4)
      }
    }
    val cases = Seq(
      (13, 9, noise(13, 9)), (64, 64, noise(64, 64)),
      (80, 60, gradient(80, 60)), (320, 200, gradient(320, 200)),
      (50, 40, palette4(50, 40)), (96, 64, tiles(96, 64)),
      (301, 199, noise(301, 199)))
    for ((w, h, rgba) <- cases) {
      val encoded = libwebpEncode(w, h, rgba)
      val img = WebpCodec.decode(42L, encoded)
      assert(img.width === w && img.height === h, s"${w}x$h dims")
      // ground truth is libwebp's own decode of the same file: the
      // simple encode API is non-exact under transparency (it may
      // rewrite RGB of alpha<255 pixels for density), so the INPUT is
      // not the contract — the reference decoder's output is
      val (_, _, ref) = libwebpDecode(encoded)
      assert(argbToRgba(img.pixels).toSeq === ref.toSeq,
        s"${w}x$h pixel mismatch vs libwebp")
      val opaque = rgba.grouped(4).forall(px => (px(3) & 0xff) == 255)
      if (opaque)
        assert(argbToRgba(img.pixels).toSeq === rgba.toSeq,
          s"${w}x$h opaque image must round-trip the input exactly")
    }
  }

  test("fuzz: 30 random libwebp encodings decode bit-exactly") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val rnd = new scala.util.Random(271828)
    for (trial <- 1 to 30) {
      val w = 1 + rnd.nextInt(90)
      val h = 1 + rnd.nextInt(70)
      // mix content classes so the encoder picks varied transform sets
      val rgba = rnd.nextInt(4) match {
        case 0 => Array.fill(w * h * 4)(rnd.nextInt(256).toByte)
        case 1 => // few-color (palette path)
          val cols = Array.fill(1 + rnd.nextInt(15) * 4)(rnd.nextInt(256).toByte)
          Array.tabulate(w * h * 4) { i =>
            val p = i / 4
            cols(((p * 31) % (cols.length / 4)) * 4 + i % 4)
          }
        case 2 => // smooth (predictor path)
          Array.tabulate(w * h * 4) { i =>
            val p = i / 4
            ((p % w) + (p / w) * 2 + i % 4 * 40 & 0xff).toByte
          }
        case _ => // repeated rows (LZ77 path)
          val row = Array.fill(w * 4)(rnd.nextInt(256).toByte)
          Array.tabulate(w * h * 4)(i => row(i % (w * 4)))
      }
      val encoded = libwebpEncode(w, h, rgba)
      val img = WebpCodec.decode(trial.toLong, encoded)
      val (_, _, ref) = libwebpDecode(encoded)
      assert(img.width === w && img.height === h, s"trial $trial dims")
      assert(argbToRgba(img.pixels).toSeq === ref.toSeq,
        s"trial $trial ${w}x$h mismatch")
    }
  }

  test("libwebp decodes OUR encoder's output byte-identically") {
    assume(python.isDefined, "python3 + libwebp.so.7 not available")
    val w = 37; val h = 23
    val rgba = Array.tabulate(w * h * 4)(i =>
      (if (i % 4 == 3) 255 else det(i, 9)).toByte)
    val rgb3 = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; rgba(p * 4 + i % 3)
    }
    val (dw, dh, back) = libwebpDecode(WebpCodec.encodeLossless(w, h, 3, rgb3))
    assert(dw === w && dh === h)
    assert(back.toSeq === rgba.toSeq)
  }

  // ---- pinned fixture (no python needed) -----------------------------

  test("pinned libwebp fixture decodes exactly (seed formula replayed)") {
    // tools/webp_probe.py fixture 1 32 24 — encoded by libwebp 7.1.5,
    // round-trip-verified against the library at generation time
    val fixtureHex =
      "5249464640000000574542505650384c340000002f1fc005000980486a7fee19" +
        "22fa9fba0008c27fb8862844ff53a1b46d23a82fecfe331f3db40a4402a431d0" +
        "6434725abbeadf1b"
    val img = WebpCodec.decode(7L, hex(fixtureHex))
    assert(img.width === 32 && img.height === 24 && img.lossless)
    var p = 0
    while (p < 32 * 24) {
      val x = p % 32; val y = p / 32
      val expect = (0xffL << 24) |
        (((1 * 7 + x * 3 + y * 11) % 256) << 16) |
        (((1 * 13 + x * 5 + y * 2) % 256) << 8) |
        ((1 * 3 + x * 9 + y * 17) % 256)
      assert((img.pixels(p) & 0xffffffffL) === expect, s"pixel ($x,$y)")
      p += 1
    }
  }

  // ---- lossy + routing ----------------------------------------------

  test("lossy VP8 decodes real pixels and routes with its own label") {
    // the pinned libwebp 7.1.5 encoding from Vp8Spec: 16x16 two-tone
    // 8x8 blocks (40/200 gray), q50, no loop filter
    val fixture =
      "524946462800000057454250565038201c0000003401009d012a10001000" +
        "00004c25a400037000fec59effff07580000"
    val bytes = hex(fixture)
    assert(Multimodal.sniffModality(bytes) === "image/webp-lossy")
    val img = WebpCodec.decode(3L, bytes)
    assert(img.width === 16 && img.height === 16 && !img.lossless)
    // Y=0x32 U=V=0x80 converts to gray ~34 via the documented BT.601
    // form: ((0x32-16)*298 + 128) >> 8 = 40 (the source tone)
    assert((img.pixels(0) & 0xff) === 40)
    assert(((img.pixels(15) >> 8) & 0xff) === 200) // Y=0xbc -> the 200 tone
  }

  test("sniff + cross-format hash: same pixels hash identically as PNG and WebP") {
    val w = 64; val h = 48
    val px = rgb(w, h, 5)
    val asWebp = WebpCodec.encodeLossless(w, h, 3, px)
    val asPng = PngCodec.encode(w, h, 3, px)
    assert(Multimodal.sniffModality(asWebp) === "image/webp")
    val hashWebp = MjpegVideo.aHashDecoded(
      Multimodal.decodeNormalized(1L, asWebp)._2)
    val hashPng = MjpegVideo.aHashDecoded(
      Multimodal.decodeNormalized(1L, asPng)._2)
    assert(hashWebp === hashPng, "cross-format aHash parity")
  }

  // ---- animation ------------------------------------------------------

  test("animation: sub-rect frames composite; overwrite, blend, dispose") {
    import WebpCodec.AnimFrameSpec
    def gray(w: Int, h: Int, v: Int): Array[Byte] =
      Array.fill(w * h * 3)(v.toByte)
    val data = WebpCodec.encodeAnim(32, 16, loopCount = 2, Seq(
      AnimFrameSpec(0, 0, 32, 16, 40, noBlend = true, disposeBg = false,
        gray(32, 16, 100)),
      AnimFrameSpec(8, 0, 16, 8, 50, noBlend = true, disposeBg = false,
        gray(16, 8, 200)),
      AnimFrameSpec(0, 8, 8, 8, 60, noBlend = true, disposeBg = true,
        gray(8, 8, 30))))
    assert(Multimodal.sniffModality(data) === "image/webp-anim")
    val anim = WebpCodec.decodeAnim(5L, data)
    assert(anim.width === 32 && anim.height === 16 && anim.loopCount === 2)
    assert(anim.frames.map(_.durationMs) === Seq(40, 50, 60))
    def px(f: Int, x: Int, y: Int): Int = anim.frames(f).pixels(y * 32 + x)
    assert(px(0, 0, 0) === 0xff646464) // frame 0: uniform 100
    assert(px(1, 9, 1) === 0xffc8c8c8) // frame 1 painted its rect...
    assert(px(1, 0, 0) === 0xff646464) // ...and kept the rest
    assert(px(2, 2, 9) === 0xff1e1e1e) // frame 2 painted bottom-left
    // frame 2's dispose-to-background only affects FOLLOWING frames,
    // so its own composited pixels keep the paint; the canvas state
    // is internal — verify via a 4th frame in a second decode
    val data2 = WebpCodec.encodeAnim(32, 16, 0, Seq(
      AnimFrameSpec(0, 0, 32, 16, 40, noBlend = true, disposeBg = false,
        gray(32, 16, 100)),
      AnimFrameSpec(0, 8, 8, 8, 60, noBlend = true, disposeBg = true,
        gray(8, 8, 30)),
      AnimFrameSpec(16, 8, 8, 8, 60, noBlend = true, disposeBg = false,
        gray(8, 8, 201))))
    val anim2 = WebpCodec.decodeAnim(6L, data2)
    def px2(f: Int, x: Int, y: Int): Int = anim2.frames(f).pixels(y * 32 + x)
    assert(px2(2, 2, 9) === 0) // disposed rect is transparent black now
    assert(px2(2, 17, 9) === 0xffc9c9c9)
  }

  test("animation: blend math, per-frame rows, first-frame hash parity") {
    import WebpCodec.AnimFrameSpec
    // blendPx: opaque src overwrites; transparent src keeps dst
    assert(WebpCodec.blendPx(0xff112233, 0xff445566) === 0xff112233)
    assert(WebpCodec.blendPx(0x00000000, 0xff445566) === 0xff445566)
    // half-alpha over opaque: a = 128 + 255*127/255 = 255;
    // ch = (s*128 + d*255*127/255)/255
    val half = WebpCodec.blendPx(0x80646464, 0xffc8c8c8)
    assert((half >>> 24) === 255)
    assert((half & 0xff) === (100 * 128 + 200 * 127) / 255)
    val base = Array.tabulate(64 * 48 * 3)(i => det(i, 3).toByte)
    val data = WebpCodec.encodeAnim(64, 48, 0, Seq(
      AnimFrameSpec(0, 0, 64, 48, 40, noBlend = true, disposeBg = false,
        base),
      AnimFrameSpec(16, 16, 16, 16, 50, noBlend = true, disposeBg = false,
        Array.fill(16 * 16 * 3)(9.toByte))))
    import spark.implicits._
    val media = Seq((1L, data)).toDF("media_id", "content")
    val rows = Multimodal.decodeWebpAnimFrames(media).collect()
      .sortBy(_.frame_no)
    assert(rows.length === 2 && rows.forall(_.n_frames == 2))
    assert(rows.map(_.duration_ms).toSeq === Seq(40, 50))
    // frame 0 == the still image: hash parity with the still codec
    val still = WebpCodec.encodeLossless(64, 48, 3, base)
    val stillHash = MjpegVideo.aHashDecoded(
      Multimodal.decodeNormalized(1L, still)._2)
    assert(rows(0).ahash === stillHash)
    assert(rows(1).ahash !== stillHash, "painted frame must hash apart")
  }

  // ---- corruption ----------------------------------------------------

  test("corrupt inputs fail loudly with the media id") {
    val good = WebpCodec.encodeLossless(8, 8, 3, rgb(8, 8, 1))
    def expectLoud(bytes: Array[Byte]): Unit = {
      val e = intercept[IllegalArgumentException](WebpCodec.decode(99L, bytes))
      assert(e.getMessage.contains("99"), e.getMessage)
    }
    expectLoud(good.take(30))                       // truncated stream
    expectLoud(good.take(12))                       // no bitstream chunk
    val badSig = good.clone(); badSig(20) = 0x33    // VP8L signature byte
    expectLoud(badSig)
    // oversized chunk length
    val badLen = good.clone(); badLen(16) = 0x7f; badLen(17) = 0x7f
    expectLoud(badLen)
  }
}
