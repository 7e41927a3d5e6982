package graft.operators

/** VP8 (lossy WebP) KEYFRAME decoder per RFC 6386 — the intra-only
  * still-image subset, which is exactly what a `VP8 ` chunk inside a
  * WebP container is: boolean arithmetic decoder, keyframe header
  * (segmentation, loop-filter params, token partitions, quantizer
  * indices, coefficient-probability updates), intra mode parsing
  * (16x16 DC/V/H/TM, per-4x4 B_PRED with neighbor-context trees,
  * chroma modes), DCT token decoding with the band/context model and
  * extra-bit categories, dequantization (incl. the Y2 scaling and the
  * chroma-DC index cap), inverse WHT + the exact integer 4x4 iDCT,
  * full intra prediction (all ten 4x4 sub-modes with VP8's
  * top-right-row quirk), and the in-loop deblocking filter (simple
  * and normal) applied post-reconstruction in macroblock raster
  * order.
  *
  * Output is the YUV 4:2:0 frame the spec defines; RGB conversion is
  * a DISPLAY concern the spec leaves open, so interop pins the YUV
  * planes byte-for-byte against the system libwebp's WebPDecodeYUV
  * (Vp8Spec) and the repo's own deterministic YUV→RGB (BT.601
  * limited/studio-range integer form, documented in [[toRgb]]) feeds
  * hashing and stats. Constant tables ride [[Vp8Tables]] (extracted from
  * libwebp's rodata, fuzz-verified).
  *
  * Scale contract: executor-local per-payload decode, same as
  * [[JpegCodec]] — no driver involvement, loud id-tagged failures.
  */
object Vp8 {

  final case class Yuv(width: Int, height: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte],
      yStride: Int, uvStride: Int) {
    def uvWidth: Int = (width + 1) / 2
    def uvHeight: Int = (height + 1) / 2
  }

  // ------------------------------------------------- boolean decoder

  private final class Bool(b: Array[Byte], start: Int, end: Int, id: Long) {
    require(start >= 0 && end >= start && end <= b.length,
      s"media $id: VP8 partition bounds invalid")
    private var pos = start
    private var range = 255
    private var bitCount = 0
    private var overrun = 0
    // A spec-valid stream can carry 0/1-byte token partitions (e.g. more
    // partitions than MB rows, or rows whose MBs all skip); libwebp pads
    // such partitions with virtual zero bytes, so the initial 16-bit fill
    // must tolerate a short buffer instead of rejecting it.
    private var value = {
      val hi = if (pos < end) b(pos) & 0xff else 0
      pos += 1
      val lo = if (pos < end) b(pos) & 0xff else 0
      pos += 1
      (hi << 8) | lo
    }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      var r = 0
      if ((value >> 8) >= split) {
        value -= split << 8; range -= split; r = 1
      } else range = split
      while (range < 128) {
        range <<= 1
        value = (value << 1) & 0xffffff
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          if (pos < end) value |= b(pos) & 0xff
          else {
            // a well-formed stream may drain its final byte mid-token;
            // sustained reads past the end are a truncated partition
            overrun += 1
            require(overrun <= 8, s"media $id: VP8 partition truncated")
          }
          pos += 1
        }
      }
      r
    }

    def lit(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    def signedLit(n: Int): Int = {
      val v = lit(n)
      if (bool(128) == 1) -v else v
    }

    def flagged(n: Int): Int = if (bool(128) == 1) signedLit(n) else 0

    /** token-tree walk; `start` skips the EOB branch after a zero. */
    def tree(t: Array[Int], probs: Array[Int], pOff: Int,
        start: Int = 0): Int = {
      var i = t(start + bool(probs(pOff + (start >> 1))))
      while (i > 0) i = t(i + bool(probs(pOff + (i >> 1))))
      -i
    }
  }

  // ---------------------------------------------------------- trees

  // y modes: DC=0 V=1 H=2 TM=3 B_PRED=4; b modes: DC=0 TM=1 VE=2 HE=3
  // LD=4 RD=5 VR=6 VL=7 HD=8 HU=9 (RFC 6386 11.2)
  private val KfYModeTree = Array(-4, 2, 4, 6, 0 /* -DC */, -1, -2, -3)
  private val UvModeTree = Array(0 /* -DC */, 2, -1, 4, -2, -3)
  private val BModeTree = Array(
    0 /* -B_DC */, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -5, -6,
    -4, 14,
    -7, 16,
    -8, -9)
  // token values: DCT_0..4 = 0..4, cat1..6 = 5..10, EOB = 11
  private val CoeffTree = Array(
    -11, 2,
    0 /* -DCT_0 */, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10)
  private val CatProbs: Array[Array[Int]] = Array(
    Vp8Tables.Cat1, Vp8Tables.Cat2, Vp8Tables.Cat3,
    Vp8Tables.Cat4, Vp8Tables.Cat5, Vp8Tables.Cat6)
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  // 16x16 y mode -> the b mode it implies for neighbor context
  private val YModeAsB = Array(0, 2, 3, 1)
  // RFC b-mode number -> libwebp table index (libwebp enum: DC TM VE
  // HE RD VR LD VL HD HU; RFC: DC TM VE HE LD RD VR VL HD HU)
  private val BCtxPerm = Array(0, 1, 2, 3, 6, 4, 5, 7, 8, 9)

  @inline private def clampIdx(v: Int, hi: Int = 127): Int =
    if (v < 0) 0 else if (v > hi) hi else v

  // ------------------------------------------------------ container

  /** Decode the `VP8 ` chunk payload of a WebP container (keyframe). */
  def decode(id: Long, payload: Array[Byte]): Yuv = {
    require(payload.length >= 10, s"media $id: VP8 payload too short")
    val tag = (payload(0) & 0xff) | ((payload(1) & 0xff) << 8) |
      ((payload(2) & 0xff) << 16)
    require((tag & 1) == 0, s"media $id: not a VP8 keyframe")
    val part0Len = tag >> 5
    require((payload(3) & 0xff) == 0x9d && (payload(4) & 0xff) == 0x01 &&
      (payload(5) & 0xff) == 0x2a, s"media $id: bad VP8 start code")
    val w = (payload(6) & 0xff) | ((payload(7) & 0x3f) << 8)
    val h = (payload(8) & 0xff) | ((payload(9) & 0x3f) << 8)
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
      s"media $id: bad VP8 dims ${w}x$h")
    require(10 + part0Len <= payload.length,
      s"media $id: VP8 first partition overruns payload")
    val bd = new Bool(payload, 10, 10 + part0Len, id)

    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16

    // ---- frame header ------------------------------------------
    bd.lit(1) // color space (must be 0, but tolerate per decoders)
    bd.lit(1) // clamping type
    var segEnabled = false
    var segUpdateMap = false
    var segAbsValues = false
    val segQuant = new Array[Int](4)
    val segFilter = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.lit(1) == 1) {
      segEnabled = true
      segUpdateMap = bd.lit(1) == 1
      val updateData = bd.lit(1) == 1
      if (updateData) {
        segAbsValues = bd.lit(1) == 1
        var i = 0
        while (i < 4) { segQuant(i) = bd.flagged(7); i += 1 }
        i = 0
        while (i < 4) { segFilter(i) = bd.flagged(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          segTreeProbs(i) = if (bd.lit(1) == 1) bd.lit(8) else 255
          i += 1
        }
      }
    }
    val filterType = bd.lit(1)
    val filterLevel = bd.lit(6)
    val sharpness = bd.lit(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.lit(1) == 1) {
      lfDeltaEnabled = true
      if (bd.lit(1) == 1) { // update
        var i = 0
        while (i < 4) { if (bd.lit(1) == 1) refLfDelta(i) = bd.signedLit(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.lit(1) == 1) modeLfDelta(i) = bd.signedLit(6); i += 1 }
      }
    }
    val nParts = 1 << bd.lit(2)
    // token partition sizes trail the first partition (3-byte LE each
    // for all but the last, which runs to the end)
    val sizesOff = 10 + part0Len
    require(sizesOff + 3 * (nParts - 1) <= payload.length,
      s"media $id: VP8 partition size table overruns payload")
    val partBounds = new Array[(Int, Int)](nParts)
    var dataOff = sizesOff + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val len =
        if (pi == nParts - 1) payload.length - dataOff
        else (payload(sizesOff + 3 * pi) & 0xff) |
          ((payload(sizesOff + 3 * pi + 1) & 0xff) << 8) |
          ((payload(sizesOff + 3 * pi + 2) & 0xff) << 16)
      require(len >= 0 && dataOff + len <= payload.length,
        s"media $id: VP8 token partition $pi overruns payload")
      partBounds(pi) = (dataOff, dataOff + len)
      dataOff += len
      pi += 1
    }
    val tokenBd = partBounds.map { case (s, e) => new Bool(payload, s, e, id) }

    // quantizer indices
    val yAcQi = bd.lit(7)
    val yDcDelta = bd.flagged(4)
    val y2DcDelta = bd.flagged(4)
    val y2AcDelta = bd.flagged(4)
    val uvDcDelta = bd.flagged(4)
    val uvAcDelta = bd.flagged(4)

    bd.lit(1) // refresh entropy probs (keyframe: both paths identical)

    // coefficient probability updates
    val probs = Vp8Tables.CoeffProbs.clone()
    var k = 0
    while (k < 4 * 8 * 3 * 11) {
      if (bd.bool(Vp8Tables.CoeffUpdateProbs(k)) == 1) probs(k) = bd.lit(8)
      k += 1
    }
    val mbNoSkip = bd.lit(1) == 1
    val skipProb = if (mbNoSkip) bd.lit(8) else 0


    // ---- per-MB modes (rest of the first partition) --------------
    val nMb = mbW * mbH
    val segOf = new Array[Int](nMb)
    val skipOf = new Array[Boolean](nMb)
    val yModeOf = new Array[Int](nMb)
    val uvModeOf = new Array[Int](nMb)
    val bModes = new Array[Int](nMb * 16)
    // b-mode neighbor context rows (above per column of subblocks,
    // left per MB row position)
    val aboveB = new Array[Int](mbW * 4) // starts 0 = B_DC
    var mbIdx = 0
    var my = 0
    while (my < mbH) {
      val leftB = new Array[Int](4)
      var mx = 0
      while (mx < mbW) {
        if (segEnabled && segUpdateMap) {
          segOf(mbIdx) =
            if (bd.bool(segTreeProbs(0)) == 0)
              bd.bool(segTreeProbs(1))
            else 2 + bd.bool(segTreeProbs(2))
        }
        skipOf(mbIdx) = mbNoSkip && bd.bool(skipProb) == 1
        val yMode = bd.tree(KfYModeTree, Vp8Tables.KfYModeProbs, 0)
        yModeOf(mbIdx) = yMode
        if (yMode == 4) { // B_PRED: 16 sub modes with neighbor context
          var sy = 0
          while (sy < 4) {
            var sx = 0
            while (sx < 4) {
              val above = if (sy == 0) aboveB(mx * 4 + sx)
                else bModes(mbIdx * 16 + (sy - 1) * 4 + sx)
              val left = if (sx == 0) leftB(sy)
                else bModes(mbIdx * 16 + sy * 4 + sx - 1)
              // the extracted table's ctx dims follow libwebp's
              // INTERNAL enum, which orders RD,VR before LD — permute
              // our RFC-numbered neighbor modes into table indices
              val m = bd.tree(BModeTree, Vp8Tables.KfBModeProbs,
                (BCtxPerm(above) * 10 + BCtxPerm(left)) * 9)
              bModes(mbIdx * 16 + sy * 4 + sx) = m
              if (sx == 3) leftB(sy) = m
              if (sy == 3) aboveB(mx * 4 + sx) = m
              sx += 1
            }
            sy += 1
          }
        } else {
          val asB = YModeAsB(yMode)
          java.util.Arrays.fill(bModes, mbIdx * 16, mbIdx * 16 + 16, asB)
          var i = 0
          while (i < 4) { leftB(i) = asB; aboveB(mx * 4 + i) = asB; i += 1 }
        }
        uvModeOf(mbIdx) = bd.tree(UvModeTree, Vp8Tables.KfUvModeProbs, 0)
        mbIdx += 1
        mx += 1
      }
      my += 1
    }

    // ---- dequant factors per segment ------------------------------
    def segQi(seg: Int): Int = {
      if (!segEnabled) yAcQi
      else if (segAbsValues) segQuant(seg)
      else yAcQi + segQuant(seg)
    }
    val dq = Array.tabulate(4) { seg =>
      val qi = clampIdx(segQi(seg))
      Array(
        Vp8Tables.DcQ(clampIdx(qi + yDcDelta)), // y1 dc
        Vp8Tables.AcQ(qi), // y1 ac
        Vp8Tables.DcQ(clampIdx(qi + y2DcDelta)) * 2, // y2 dc
        math.max(8, Vp8Tables.AcQ(clampIdx(qi + y2AcDelta)) * 155 / 100), // y2 ac
        Vp8Tables.DcQ(clampIdx(qi + uvDcDelta, 117)), // uv dc (capped idx)
        Vp8Tables.AcQ(clampIdx(qi + uvAcDelta))) // uv ac
    }

    // ---- token decoding + reconstruction --------------------------
    // padded reconstruction planes (full MBs), cropped at the end
    val pw = mbW * 16
    val ph = mbH * 16
    val cw = mbW * 8
    val chh = mbH * 8
    val Y = new Array[Byte](pw * ph)
    val U = new Array[Byte](cw * chh)
    val V = new Array[Byte](cw * chh)

    // nonzero-context flags: above (per frame column of subblocks) and
    // left (reset per MB row)
    val aboveNzY = new Array[Int](mbW * 4)
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)
    val innerSkipOf = new Array[Boolean](nMb)
    val coeffs = new Array[Int](25 * 16) // 16 Y + 4 U + 4 V + 1 Y2
    val y2out = new Array[Int](16)

    /** decode one block's tokens; returns 1 if any nonzero coeff. */
    def residual(tb: Bool, tpe: Int, ctx0: Int, first: Int,
        out: Array[Int], outOff: Int, dcq: Int, acq: Int): Int = {
      var n = first
      var ctx = ctx0
      var skipEob = false
      var nz = 0
      while (n < 16) {
        val pOff = (tpe * 8 * 3 + Vp8Tables.Bands(n) * 3 + ctx) * 11
        val tok = tb.tree(CoeffTree, probs, pOff, if (skipEob) 2 else 0)
        if (tok == 11) return nz // EOB
        if (tok == 0) { ctx = 0; skipEob = true; n += 1 }
        else {
          skipEob = false
          var v =
            if (tok <= 4) tok
            else {
              val cat = tok - 5
              val cp = CatProbs(cat)
              var extra = 0
              var i = 0
              while (i < cp.length) { extra = (extra << 1) | tb.bool(cp(i)); i += 1 }
              CatBase(cat) + extra
            }
          ctx = if (v == 1) 1 else 2
          if (tb.bool(128) == 1) v = -v
          out(outOff + Vp8Tables.Zigzag(n)) = v * (if (n == 0) dcq else acq)
          nz = 1
          n += 1
        }
      }
      nz
    }

    mbIdx = 0
    my = 0
    while (my < mbH) {
      val tb = tokenBd(my % nParts)
      val leftNzY = new Array[Int](4)
      val leftNzU = new Array[Int](2)
      val leftNzV = new Array[Int](2)
      var leftNzY2 = 0
      var mx = 0
      while (mx < mbW) {
        java.util.Arrays.fill(coeffs, 0)
        val seg = segOf(mbIdx)
        val q = dq(seg)
        val hasY2 = yModeOf(mbIdx) != 4
        var mbNz = false
        if (skipOf(mbIdx)) {
          java.util.Arrays.fill(leftNzY, 0)
          java.util.Arrays.fill(leftNzU, 0)
          java.util.Arrays.fill(leftNzV, 0)
          var i = 0
          while (i < 4) { aboveNzY(mx * 4 + i) = 0; i += 1 }
          i = 0
          while (i < 2) {
            aboveNzU(mx * 2 + i) = 0; aboveNzV(mx * 2 + i) = 0; i += 1
          }
          if (hasY2) { leftNzY2 = 0; aboveNzY2(mx) = 0 }
          // !hasY2: Y2 context flags stay untouched (spec quirk)
        } else {
          var y2nz = 0
          if (hasY2) {
            y2nz = residual(tb, 1, leftNzY2 + aboveNzY2(mx), 0,
              coeffs, 24 * 16, q(2), q(3))
            leftNzY2 = y2nz; aboveNzY2(mx) = y2nz
            // inverse WHT scatters Y2 into the 16 Y DCs
            iwht(coeffs, 24 * 16, y2out)
            var i = 0
            while (i < 16) { coeffs(i * 16) = y2out(i); i += 1 }
          }
          val yType = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            // the running left array holds the left NEIGHBOR's flag at
            // sub-row sy (previous sub-column, or previous MB); above
            // likewise per frame sub-column
            val ctx = leftNzY(sy) + aboveNzY(mx * 4 + sx)
            val nz = residual(tb, yType, ctx, yFirst, coeffs, sb * 16,
              q(0), q(1))
            leftNzY(sy) = nz
            aboveNzY(mx * 4 + sx) = nz
            if (nz == 1) mbNz = true
            sb += 1
          }
          if (y2nz == 1) mbNz = true
          var pl = 0
          while (pl < 2) {
            val aNz = if (pl == 0) aboveNzU else aboveNzV
            val lNz = if (pl == 0) leftNzU else leftNzV
            var sb2 = 0
            while (sb2 < 4) {
              val sx = sb2 & 1
              val sy = sb2 >> 1
              val ctx = lNz(sy) + aNz(mx * 2 + sx)
              val nz = residual(tb, 2, ctx, 0,
                coeffs, (16 + pl * 4 + sb2) * 16, q(4), q(5))
              lNz(sy) = nz
              aNz(mx * 2 + sx) = nz
              if (nz == 1) mbNz = true
              sb2 += 1
            }
            pl += 1
          }
        }
        // inner loop-filter edges are skipped for all-zero whole-block
        // MBs (RFC 15) — record per MB
        innerSkipOf(mbIdx) = !mbNz && hasY2

        // ---- reconstruct this MB --------------------------------
        predictLuma(Y, pw, mx, my, mbW, mbH, yModeOf(mbIdx),
          bModes, mbIdx * 16, coeffs, skipOf(mbIdx), hasY2)
        predictChroma(U, coeffs, 16 * 16, cw, mx, my, mbW, mbH,
          uvModeOf(mbIdx), skipOf(mbIdx))
        predictChroma(V, coeffs, 20 * 16, cw, mx, my, mbW, mbH,
          uvModeOf(mbIdx), skipOf(mbIdx))
        mbIdx += 1
        mx += 1
      }
      my += 1
    }

    // ---- loop filter ------------------------------------------------
    if (filterLevel > 0)
      loopFilter(Y, U, V, pw, cw, mbW, mbH, filterType, filterLevel,
        sharpness, segEnabled, segAbsValues, segFilter, segOf,
        lfDeltaEnabled, refLfDelta, modeLfDelta, yModeOf, innerSkipOf)

    // crop to frame dims
    val outY = new Array[Byte](w * h)
    var r = 0
    while (r < h) { System.arraycopy(Y, r * pw, outY, r * w, w); r += 1 }
    val uw = (w + 1) / 2
    val uh = (h + 1) / 2
    val outU = new Array[Byte](uw * uh)
    val outV = new Array[Byte](uw * uh)
    r = 0
    while (r < uh) {
      System.arraycopy(U, r * cw, outU, r * uw, uw)
      System.arraycopy(V, r * cw, outV, r * uw, uw)
      r += 1
    }
    Yuv(w, h, outY, outU, outV, w, uw)
  }

  // ------------------------------------------------------ transforms

  @inline private def mul1(a: Int): Int = ((a * 20091) >> 16) + a
  @inline private def mul2(a: Int): Int = (a * 35468) >> 16

  /** exact integer 4x4 iDCT (RFC 6386 14.3); adds to prediction. */
  private def idctAdd(plane: Array[Byte], stride: Int, off: Int,
      c: Array[Int], cOff: Int): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // vertical pass
      val a = c(cOff + i) + c(cOff + 8 + i)
      val b = c(cOff + i) - c(cOff + 8 + i)
      val c1 = mul2(c(cOff + 4 + i)) - mul1(c(cOff + 12 + i))
      val d = mul1(c(cOff + 4 + i)) + mul2(c(cOff + 12 + i))
      tmp(i) = a + d
      tmp(12 + i) = a - d
      tmp(4 + i) = b + c1
      tmp(8 + i) = b - c1
      i += 1
    }
    i = 0
    while (i < 4) { // horizontal pass + add
      val o = i * 4
      val dc = tmp(o) + 4
      val a = dc + tmp(o + 2)
      val b = dc - tmp(o + 2)
      val c1 = mul2(tmp(o + 1)) - mul1(tmp(o + 3))
      val d = mul1(tmp(o + 1)) + mul2(tmp(o + 3))
      val base = off + i * stride
      store(plane, base, (a + d) >> 3)
      store(plane, base + 1, (b + c1) >> 3)
      store(plane, base + 2, (b - c1) >> 3)
      store(plane, base + 3, (a - d) >> 3)
      i += 1
    }
  }

  @inline private def store(p: Array[Byte], at: Int, delta: Int): Unit = {
    val v = (p(at) & 0xff) + delta
    p(at) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
  }

  /** inverse WHT for the Y2 block (RFC 6386 14.3). */
  private def iwht(c: Array[Int], off: Int, out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = c(off + i) + c(off + 12 + i)
      val b = c(off + 4 + i) + c(off + 8 + i)
      val c1 = c(off + 4 + i) - c(off + 8 + i)
      val d = c(off + i) - c(off + 12 + i)
      tmp(i) = a + b
      tmp(4 + i) = d + c1
      tmp(8 + i) = a - b
      tmp(12 + i) = d - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a = tmp(o) + tmp(o + 3)
      val b = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d = tmp(o) - tmp(o + 3)
      out(o) = (a + b + 3) >> 3
      out(o + 1) = (d + c1 + 3) >> 3
      out(o + 2) = (a - b + 3) >> 3
      out(o + 3) = (d - c1 + 3) >> 3
      i += 1
    }
  }

  // -------------------------------------------------- intra: helpers

  @inline private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  @inline private def avg3(a: Int, b: Int, c: Int): Int =
    (a + 2 * b + c + 2) >> 2
  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** plane pixel with VP8 border conventions: above row off-frame =
    * 127, left column off-frame = 129, above-left corner = 127 when
    * the MB row is 0 else 129 when the MB col is 0.
    */
  @inline private def px(p: Array[Byte], stride: Int, x: Int, y: Int): Int = {
    if (y < 0) 127 // whole above row incl. the corner (libwebp-validated)
    else if (x < 0) 129
    else p(y * stride + x) & 0xff
  }

  // ------------------------------------------------------- luma pred

  private def predictLuma(y: Array[Byte], stride: Int, mx: Int, myy: Int,
      mbW: Int, mbH: Int, mode: Int, bModes: Array[Int], bOff: Int,
      coeffs: Array[Int], skipped: Boolean, hasY2: Boolean): Unit = {
    val x0 = mx * 16
    val y0 = myy * 16
    if (mode == 4) {
      // B_PRED: 4x4 sub-blocks in raster order, predict + transform
      var sb = 0
      while (sb < 16) {
        val sx = (sb & 3) * 4
        val sy = (sb >> 2) * 4
        predict4x4(y, stride, x0 + sx, y0 + sy, bModes(bOff + sb),
          mbW, myy, mx, sbRow = sb >> 2, sbCol = sb & 3)
        idctAdd(y, stride, (y0 + sy) * stride + x0 + sx, coeffs, sb * 16)
        sb += 1
      }
    } else {
      predict16x16(y, stride, x0, y0, mode, mx, myy)
      if (!skipped) {
        var sb = 0
        while (sb < 16) {
          val sx = (sb & 3) * 4
          val sy = (sb >> 2) * 4
          idctAdd(y, stride, (y0 + sy) * stride + x0 + sx, coeffs, sb * 16)
          sb += 1
        }
      }
    }
  }

  private def predict16x16(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      mode: Int, mx: Int, myy: Int): Unit = {
    mode match {
      case 0 => // DC
        var sum = 0
        var n = 0
        if (myy > 0) { var i = 0; while (i < 16) { sum += px(p, stride, x0 + i, y0 - 1); i += 1 }; n += 16 }
        if (mx > 0) { var i = 0; while (i < 16) { sum += px(p, stride, x0 - 1, y0 + i); i += 1 }; n += 16 }
        val dc = if (n == 0) 128 else (sum + n / 2) / n
        fill(p, stride, x0, y0, 16, dc)
      case 1 => // V
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) { p((y0 + r) * stride + x0 + c) = px(p, stride, x0 + c, y0 - 1).toByte; c += 1 }
          r += 1
        }
      case 2 => // H
        var r = 0
        while (r < 16) {
          val v = px(p, stride, x0 - 1, y0 + r).toByte
          var c = 0
          while (c < 16) { p((y0 + r) * stride + x0 + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val tl = px(p, stride, x0 - 1, y0 - 1)
        var r = 0
        while (r < 16) {
          val l = px(p, stride, x0 - 1, y0 + r)
          var c = 0
          while (c < 16) {
            p((y0 + r) * stride + x0 + c) =
              clamp255(l + px(p, stride, x0 + c, y0 - 1) - tl).toByte
            c += 1
          }
          r += 1
        }
    }
  }

  private def fill(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      n: Int, v: Int): Unit = {
    var r = 0
    while (r < n) {
      java.util.Arrays.fill(p, (y0 + r) * stride + x0,
        (y0 + r) * stride + x0 + n, v.toByte)
      r += 1
    }
  }

  /** 4x4 sub-block intra prediction (RFC 6386 12.3). `x0,y0` are
    * frame coordinates of the sub-block. Above-right quirk: for the
    * rightmost sub-block COLUMN the 4 above-right pixels always come
    * from the MB's top edge row (row y0 of the MB minus 1), taken
    * from the above-right MB's bottom row — off-frame they replicate
    * the rightmost above pixel (127 on the top MB row).
    */
  private def predict4x4(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      mode: Int, mbW: Int, mbRow: Int, mbCol: Int, sbRow: Int,
      sbCol: Int): Unit = {
    val A = new Array[Int](8) // above 0..3, above-right 4..7
    var i = 0
    while (i < 4) { A(i) = px(p, stride, x0 + i, y0 - 1); i += 1 }
    if (sbCol < 3) {
      // above-right neighbors already reconstructed (or border row)
      i = 0
      while (i < 4) { A(4 + i) = px(p, stride, x0 + 4 + i, y0 - 1); i += 1 }
    } else {
      // rightmost column: ALWAYS the MB's top edge row
      val topY = mbRow * 16 - 1
      val rightX0 = (mbCol + 1) * 16
      if (mbCol == mbW - 1) {
        // off-frame: replicate the pixel above the MB's right edge
        val v = px(p, stride, mbW * 16 - 1, topY)
        i = 0
        while (i < 4) { A(4 + i) = v; i += 1 }
      } else {
        i = 0
        while (i < 4) { A(4 + i) = px(p, stride, rightX0 + i, topY); i += 1 }
      }
    }
    val L = new Array[Int](4)
    i = 0
    while (i < 4) { L(i) = px(p, stride, x0 - 1, y0 + i); i += 1 }
    val P = px(p, stride, x0 - 1, y0 - 1)
    val out = new Array[Int](16)
    mode match {
      case 0 => // B_DC
        val dc = (A(0) + A(1) + A(2) + A(3) + L(0) + L(1) + L(2) + L(3) + 4) >> 3
        i = 0
        while (i < 16) { out(i) = dc; i += 1 }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { out(r * 4 + c) = clamp255(L(r) + A(c) - P); c += 1 }
          r += 1
        }
      case 2 => // B_VE
        val v0 = avg3(P, A(0), A(1))
        val v1 = avg3(A(0), A(1), A(2))
        val v2 = avg3(A(1), A(2), A(3))
        val v3 = avg3(A(2), A(3), A(4))
        var r = 0
        while (r < 4) {
          out(r * 4) = v0; out(r * 4 + 1) = v1
          out(r * 4 + 2) = v2; out(r * 4 + 3) = v3
          r += 1
        }
      case 3 => // B_HE
        val h0 = avg3(P, L(0), L(1))
        val h1 = avg3(L(0), L(1), L(2))
        val h2 = avg3(L(1), L(2), L(3))
        val h3 = avg3(L(2), L(3), L(3))
        var r = 0
        while (r < 4) {
          val v = r match { case 0 => h0 case 1 => h1 case 2 => h2 case _ => h3 }
          out(r * 4) = v; out(r * 4 + 1) = v; out(r * 4 + 2) = v; out(r * 4 + 3) = v
          r += 1
        }
      case 4 => // B_LD (down-left)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val j = r + c
            out(r * 4 + c) =
              if (j == 6) avg3(A(6), A(7), A(7))
              else avg3(A(j), A(j + 1), A(j + 2))
            c += 1
          }
          r += 1
        }
      case 5 => // B_RD (down-right); edge E = L3 L2 L1 L0 P A0 A1 A2 A3
        val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val j = 4 + c - r
            out(r * 4 + c) = avg3(e(j - 1), e(j), e(j + 1))
            c += 1
          }
          r += 1
        }
      case 6 => // B_VR (vertical-right)
        val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
        out(0) = avg2(e(4), e(5)); out(1) = avg2(e(5), e(6))
        out(2) = avg2(e(6), e(7)); out(3) = avg2(e(7), e(8))
        out(4) = avg3(e(3), e(4), e(5)); out(5) = avg3(e(4), e(5), e(6))
        out(6) = avg3(e(5), e(6), e(7)); out(7) = avg3(e(6), e(7), e(8))
        out(8) = avg3(e(2), e(3), e(4)); out(9) = out(0)
        out(10) = out(1); out(11) = out(2)
        out(12) = avg3(e(1), e(2), e(3)); out(13) = out(4)
        out(14) = out(5); out(15) = out(6)
      case 7 => // B_VL (vertical-left)
        out(0) = avg2(A(0), A(1)); out(1) = avg2(A(1), A(2))
        out(2) = avg2(A(2), A(3)); out(3) = avg2(A(3), A(4))
        out(4) = avg3(A(0), A(1), A(2)); out(5) = avg3(A(1), A(2), A(3))
        out(6) = avg3(A(2), A(3), A(4)); out(7) = avg3(A(3), A(4), A(5))
        out(8) = out(1); out(9) = out(2)
        out(10) = out(3); out(11) = avg3(A(4), A(5), A(6))
        out(12) = out(5); out(13) = out(6)
        out(14) = out(7); out(15) = avg3(A(5), A(6), A(7))
      case 8 => // B_HD (horizontal-down)
        val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2))
        out(0) = avg2(e(3), e(4)); out(1) = avg3(e(3), e(4), e(5))
        out(2) = avg3(e(4), e(5), e(6)); out(3) = avg3(e(5), e(6), e(7))
        out(4) = avg2(e(2), e(3)); out(5) = avg3(e(2), e(3), e(4))
        out(6) = out(0); out(7) = out(1)
        out(8) = avg2(e(1), e(2)); out(9) = avg3(e(1), e(2), e(3))
        out(10) = out(4); out(11) = out(5)
        out(12) = avg2(e(0), e(1)); out(13) = avg3(e(0), e(1), e(2))
        out(14) = out(8); out(15) = out(9)
      case _ => // B_HU (horizontal-up)
        out(0) = avg2(L(0), L(1)); out(1) = avg3(L(0), L(1), L(2))
        out(2) = avg2(L(1), L(2)); out(3) = avg3(L(1), L(2), L(3))
        out(4) = out(2); out(5) = out(3)
        out(6) = avg2(L(2), L(3)); out(7) = avg3(L(2), L(3), L(3))
        out(8) = out(6); out(9) = out(7)
        out(10) = L(3); out(11) = L(3)
        out(12) = L(3); out(13) = L(3); out(14) = L(3); out(15) = L(3)
    }
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        p((y0 + r) * stride + x0 + c) = out(r * 4 + c).toByte
        c += 1
      }
      r += 1
    }
  }

  // ----------------------------------------------------- chroma pred

  private def predictChroma(p: Array[Byte], coeffs: Array[Int], cOff: Int,
      stride: Int, mx: Int, myy: Int, mbW: Int, mbH: Int, mode: Int,
      skipped: Boolean): Unit = {
    val x0 = mx * 8
    val y0 = myy * 8
    mode match {
      case 0 => // DC
        var sum = 0
        var n = 0
        if (myy > 0) { var i = 0; while (i < 8) { sum += px(p, stride, x0 + i, y0 - 1); i += 1 }; n += 8 }
        if (mx > 0) { var i = 0; while (i < 8) { sum += px(p, stride, x0 - 1, y0 + i); i += 1 }; n += 8 }
        val dc = if (n == 0) 128 else (sum + n / 2) / n
        fill(p, stride, x0, y0, 8, dc)
      case 1 => // V
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) { p((y0 + r) * stride + x0 + c) = px(p, stride, x0 + c, y0 - 1).toByte; c += 1 }
          r += 1
        }
      case 2 => // H
        var r = 0
        while (r < 8) {
          val v = px(p, stride, x0 - 1, y0 + r).toByte
          var c = 0
          while (c < 8) { p((y0 + r) * stride + x0 + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val tl = px(p, stride, x0 - 1, y0 - 1)
        var r = 0
        while (r < 8) {
          val l = px(p, stride, x0 - 1, y0 + r)
          var c = 0
          while (c < 8) {
            p((y0 + r) * stride + x0 + c) =
              clamp255(l + px(p, stride, x0 + c, y0 - 1) - tl).toByte
            c += 1
          }
          r += 1
        }
    }
    if (!skipped) {
      var sb = 0
      while (sb < 4) {
        val sx = (sb & 1) * 4
        val sy = (sb >> 1) * 4
        idctAdd(p, stride, (y0 + sy) * stride + x0 + sx, coeffs,
          cOff + sb * 16)
        sb += 1
      }
    }
  }

  // ------------------------------------------------------ loop filter

  /** In-loop deblocking (RFC 6386 15), MB raster order, in place:
    * per MB (filter level resolved from segment + delta adjustments),
    * left MB edge, inner vertical edges, top MB edge, inner
    * horizontal edges; the SIMPLE filter touches Y only.
    */
  private def loopFilter(yP: Array[Byte], uP: Array[Byte], vP: Array[Byte],
      yStride: Int, uvStride: Int, mbW: Int, mbH: Int, filterType: Int,
      baseLevel: Int, sharpness: Int, segEnabled: Boolean,
      segAbs: Boolean, segFilter: Array[Int], segOf: Array[Int],
      lfDelta: Boolean, refDelta: Array[Int], modeDelta: Array[Int],
      yModeOf: Array[Int], innerSkip: Array[Boolean]): Unit = {
    var mbIdx = 0
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        var level = baseLevel
        if (segEnabled)
          level = if (segAbs) segFilter(segOf(mbIdx))
          else baseLevel + segFilter(segOf(mbIdx))
        if (lfDelta) {
          level += refDelta(0) // intra frame (keyframe): ref 0
          if (yModeOf(mbIdx) == 4) level += modeDelta(0) // B_PRED
        }
        level = if (level < 0) 0 else if (level > 63) 63 else level
        if (level > 0) {
          var interior = if (sharpness > 0) {
            val l = if (sharpness > 4) level >> 2 else level >> 1
            math.min(l, 9 - sharpness)
          } else level
          if (interior < 1) interior = 1
          val edgeLimit = (level + 2) * 2 + interior
          val innerEdgeLimit = level * 2 + interior
          val hevT =
            if (level >= 40) 2
            else if (level >= 15) 1
            else 0
          // NOTE: hev threshold per RFC for keyframes:
          //   level >= 40 -> 2, >= 15 -> 1, else 0
          val skipInner = innerSkip(mbIdx)
          if (filterType == 1) { // SIMPLE: Y only, MB + inner edges
            if (mx > 0)
              simpleEdge(yP, yStride, my * 16, mx * 16, 16, edgeLimit, vertical = true)
            if (!skipInner) {
              var k = 4
              while (k < 16) {
                simpleEdge(yP, yStride, my * 16, mx * 16 + k, 16,
                  innerEdgeLimit, vertical = true)
                k += 4
              }
            }
            if (my > 0)
              simpleEdge(yP, yStride, my * 16, mx * 16, 16, edgeLimit, vertical = false)
            if (!skipInner) {
              var k = 4
              while (k < 16) {
                simpleEdge(yP, yStride, my * 16 + k, mx * 16, 16,
                  innerEdgeLimit, vertical = false)
                k += 4
              }
            }
          } else { // NORMAL: Y + chroma, MB edges use the 8-tap variant
            if (mx > 0) {
              mbEdge(yP, yStride, my * 16, mx * 16, 16, edgeLimit, interior, hevT, vertical = true)
              mbEdge(uP, uvStride, my * 8, mx * 8, 8, edgeLimit, interior, hevT, vertical = true)
              mbEdge(vP, uvStride, my * 8, mx * 8, 8, edgeLimit, interior, hevT, vertical = true)
            }
            if (!skipInner) {
              var k = 4
              while (k < 16) {
                innerEdge(yP, yStride, my * 16, mx * 16 + k, 16,
                  innerEdgeLimit, interior, hevT, vertical = true)
                k += 4
              }
              innerEdge(uP, uvStride, my * 8, mx * 8 + 4, 8,
                innerEdgeLimit, interior, hevT, vertical = true)
              innerEdge(vP, uvStride, my * 8, mx * 8 + 4, 8,
                innerEdgeLimit, interior, hevT, vertical = true)
            }
            if (my > 0) {
              mbEdge(yP, yStride, my * 16, mx * 16, 16, edgeLimit, interior, hevT, vertical = false)
              mbEdge(uP, uvStride, my * 8, mx * 8, 8, edgeLimit, interior, hevT, vertical = false)
              mbEdge(vP, uvStride, my * 8, mx * 8, 8, edgeLimit, interior, hevT, vertical = false)
            }
            if (!skipInner) {
              var k = 4
              while (k < 16) {
                innerEdge(yP, yStride, my * 16 + k, mx * 16, 16,
                  innerEdgeLimit, interior, hevT, vertical = false)
                k += 4
              }
              innerEdge(uP, uvStride, my * 8 + 4, mx * 8, 8,
                innerEdgeLimit, interior, hevT, vertical = false)
              innerEdge(vP, uvStride, my * 8 + 4, mx * 8, 8,
                innerEdgeLimit, interior, hevT, vertical = false)
            }
          }
        }
        mbIdx += 1
        mx += 1
      }
      my += 1
    }
  }

  @inline private def s8(v: Int): Int = (v & 0xff) - 128 // to signed-128 domain
  @inline private def c128(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  /** common 4-tap adjust (RFC 15.2/15.3); returns (p0', q0', a>>1-ish
    * outer delta for the use-outer variant).
    */
  private def filterCommon(p: Array[Byte], o: Int, step: Int,
      useOuter: Boolean): Unit = {
    val p1 = s8(p(o - 2 * step) & 0xff)
    val p0 = s8(p(o - step) & 0xff)
    val q0 = s8(p(o) & 0xff)
    val q1 = s8(p(o + step) & 0xff)
    var a = 3 * (q0 - p0)
    if (useOuter) a += c128(p1 - q1)
    a = c128(a)
    val f1 = c128(a + 4) >> 3
    val f2 = c128(a + 3) >> 3
    p(o - step) = (c128(p0 + f2) + 128).toByte
    p(o) = (c128(q0 - f1) + 128).toByte
    if (!useOuter) {
      val a2 = (f1 + 1) >> 1
      p(o - 2 * step) = (c128(p1 + a2) + 128).toByte
      p(o + step) = (c128(q1 - a2) + 128).toByte
    }
  }

  private def simpleThresh(p: Array[Byte], o: Int, step: Int,
      limit: Int): Boolean =
    math.abs((p(o - step) & 0xff) - (p(o) & 0xff)) * 2 +
      math.abs((p(o - 2 * step) & 0xff) - (p(o + step) & 0xff)) / 2 <= limit

  private def simpleEdge(p: Array[Byte], stride: Int, row0: Int, col0: Int,
      n: Int, limit: Int, vertical: Boolean): Unit = {
    var i = 0
    while (i < n) {
      val o = if (vertical) (row0 + i) * stride + col0 else row0 * stride + col0 + i
      val step = if (vertical) 1 else stride
      if (simpleThresh(p, o, step, limit)) filterCommon(p, o, step, useOuter = true)
      i += 1
    }
  }

  private def normalThresh(p: Array[Byte], o: Int, step: Int,
      edge: Int, interior: Int): Boolean = {
    @inline def v(k: Int): Int = p(o + k * step) & 0xff
    math.abs(v(-1) - v(0)) * 2 + math.abs(v(-2) - v(1)) / 2 <= edge &&
      math.abs(v(-4) - v(-3)) <= interior &&
      math.abs(v(-3) - v(-2)) <= interior &&
      math.abs(v(-2) - v(-1)) <= interior &&
      math.abs(v(1) - v(0)) <= interior &&
      math.abs(v(2) - v(1)) <= interior &&
      math.abs(v(3) - v(2)) <= interior
  }

  private def hev(p: Array[Byte], o: Int, step: Int, t: Int): Boolean =
    math.abs((p(o - 2 * step) & 0xff) - (p(o - step) & 0xff)) > t ||
      math.abs((p(o + step) & 0xff) - (p(o) & 0xff)) > t

  private def innerEdge(p: Array[Byte], stride: Int, row0: Int, col0: Int,
      n: Int, edge: Int, interior: Int, hevT: Int,
      vertical: Boolean): Unit = {
    var i = 0
    while (i < n) {
      val o = if (vertical) (row0 + i) * stride + col0 else row0 * stride + col0 + i
      val step = if (vertical) 1 else stride
      if (normalThresh(p, o, step, edge, interior))
        filterCommon(p, o, step, useOuter = hev(p, o, step, hevT))
      i += 1
    }
  }

  private def mbEdge(p: Array[Byte], stride: Int, row0: Int, col0: Int,
      n: Int, edge: Int, interior: Int, hevT: Int,
      vertical: Boolean): Unit = {
    var i = 0
    while (i < n) {
      val o = if (vertical) (row0 + i) * stride + col0 else row0 * stride + col0 + i
      val step = if (vertical) 1 else stride
      if (normalThresh(p, o, step, edge, interior)) {
        if (hev(p, o, step, hevT)) filterCommon(p, o, step, useOuter = true)
        else {
          // 6-tap MB-edge filter (RFC 15.3)
          val p2 = s8(p(o - 3 * step) & 0xff)
          val p1 = s8(p(o - 2 * step) & 0xff)
          val p0 = s8(p(o - step) & 0xff)
          val q0 = s8(p(o) & 0xff)
          val q1 = s8(p(o + step) & 0xff)
          val q2 = s8(p(o + 2 * step) & 0xff)
          val w = c128(c128(p1 - q1) + 3 * (q0 - p0))
          val a0 = (27 * w + 63) >> 7
          val a1 = (18 * w + 63) >> 7
          val a2 = (9 * w + 63) >> 7
          p(o) = (c128(q0 - a0) + 128).toByte
          p(o - step) = (c128(p0 + a0) + 128).toByte
          p(o + step) = (c128(q1 - a1) + 128).toByte
          p(o - 2 * step) = (c128(p1 + a1) + 128).toByte
          p(o + 2 * step) = (c128(q2 - a2) + 128).toByte
          p(o - 3 * step) = (c128(p2 + a2) + 128).toByte
        }
      }
      i += 1
    }
  }

  // ------------------------------------------------------- RGB view

  /** Deterministic YUV 4:2:0 → RGB for hashing/stats: BT.601
    * limited-range integer form (the JFIF-style conversion
    * [[JpegCodec]] uses is full-range; VP8 video is studio-range),
    * nearest-neighbor chroma upsampling. This is the repo's OWN
    * documented convention — the spec leaves display conversion open.
    */
  def toRgb(f: Yuv): JpegCodec.DecodedImage = {
    val out = new Array[Byte](f.width * f.height * 3)
    var yy = 0
    while (yy < f.height) {
      var x = 0
      while (x < f.width) {
        val yv = ((f.y(yy * f.yStride + x) & 0xff) - 16) * 298
        val u = (f.u((yy / 2) * f.uvStride + x / 2) & 0xff) - 128
        val v = (f.v((yy / 2) * f.uvStride + x / 2) & 0xff) - 128
        val o = (yy * f.width + x) * 3
        out(o) = clamp255((yv + 409 * v + 128) >> 8).toByte
        out(o + 1) = clamp255((yv - 100 * u - 208 * v + 128) >> 8).toByte
        out(o + 2) = clamp255((yv + 516 * u + 128) >> 8).toByte
        x += 1
      }
      yy += 1
    }
    JpegCodec.DecodedImage(f.width, f.height, 3, out)
  }
}
