package graft.operators

/** Pure-JVM baseline JPEG (ITU-T T.81) codec — the real video-frame
  * decoder behind MJPEG pipelines, with zero native/external deps.
  *
  * Decoder: baseline sequential DCT (SOF0/SOF1), 8-bit samples, 1 or 3
  * components, any sampling factors up to 4x4 (JFIF 4:4:4 / 4:2:2 /
  * 4:2:0 all included), multiple DQT/DHT segments, 8- and 16-bit quant
  * tables, restart markers (DRI/RSTn), byte-stuffed entropy data, odd
  * dimensions (edge MCU clipping). Progressive (SOF2) is decoded too
  * (spectral-selection + successive-approximation scan accumulation,
  * see decodeProgressiveScan below); arithmetic coding and
  * hierarchical modes are rejected loudly — a corpus scan must never
  * silently mis-decode.
  *
  * Encoder: baseline, Annex K quantization tables scaled by the
  * libjpeg quality curve and Annex K Huffman tables, 4:2:0 or 4:4:4
  * chroma, gray or RGB input. At quality=100 every quantizer is 1, so
  * a frame built from CONSTANT 16x16 gray blocks round-trips
  * bit-exactly (DC-only blocks: the IDCT of a pure-DC block is the
  * constant itself, and gray pixels carry Cb=Cr=128 exactly through
  * both color transforms) — the property the oracle gates replay
  * analytically.
  *
  * Everything is deterministic per byte content: double-precision
  * DCT/IDCT with a fixed cosine basis and Math.round, no
  * platform-dependent paths — retries at 100 TB replay rows.
  *
  * Interop: encoded output decodes under the JDK's ImageIO (libjpeg)
  * reader and ImageIO-encoded files decode here (JpegSpec asserts both
  * directions, tolerance-bounded for the lossy paths, exact for the
  * constant-block path) — the same two-sided foreign-binary discipline
  * as the GPG codec.
  *
  * Reference seam: the reference treats media as opaque bytes on the
  * copy path (gobblin-data-management/.../copy/FileAwareInputStream*);
  * frame decode is part of this engine's beyond-reference multimodal
  * dedup tier (SURVEY §2.9).
  */
object JpegCodec {

  /** Decoded image: `pixels` pixel-major, top-down, channel-fastest —
    * length = width*height*channels, channels 1 (gray) or 3 (RGB).
    */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // c(u,x) = C(u)/2 * cos((2x+1)u*pi/16): f = Bt * F * B (separable)
  private val Basis: Array[Double] = {
    val b = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        b(u * 8 + x) = c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    b
  }

  // ---------------------------------------------------------------- //
  //  Huffman tables                                                  //
  // ---------------------------------------------------------------- //

  /** Canonical Huffman table from BITS (counts per code length 1..16)
    * and HUFFVAL — T.81 Annex C decode tables plus the encode map.
    */
  private final class HuffTable(bits: Array[Int], huffval: Array[Int]) {
    require(bits.length == 16, "BITS must have 16 entries")
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val vals: Array[Int] = huffval
    // encode side: symbol -> (code, length)
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        minCode(l) = code
        valPtr(l) = k
        var i = 0
        while (i < bits(l - 1)) {
          val sym = huffval(k)
          encCode(sym) = code
          encLen(sym) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  // T.81 Annex K.3 typical tables (spec constants)
  private val StdDcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaVals = (0 to 11).toArray
  private val StdDcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaVals = (0 to 11).toArray
  private val StdAcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val StdAcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // T.81 Annex K.1/K.2 quantization tables, natural (row-major) order
  private val StdQuantLuma = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val StdQuantChroma = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K table scaled by the (libjpeg-curve) quality 1..100 —
    * quality 100 pins EVERY divisor to 1 (the lossless-DC regime the
    * gates rely on).
    */
  def quantTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality out of [1,100]")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map { q =>
      math.min(255, math.max(1, (q * scale + 50) / 100))
    }
  }

  // ---------------------------------------------------------------- //
  //  Decoder                                                         //
  // ---------------------------------------------------------------- //

  /** Entropy-coded-segment bit reader: byte unstuffing (FF 00), strict
    * on unexpected markers, byte-aligned restart consumption.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0

    def nextBit(id: Long): Int = {
      if (cnt == 0) {
        require(pos < bytes.length, s"media $id: entropy data truncated")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, s"media $id: entropy data truncated at FF")
          val b2 = bytes(pos) & 0xff
          // only stuffed FF 00 is data; a marker here means the scan
          // ran past its entropy data (RSTn is consumed byte-aligned
          // in expectRst, never through the bit buffer)
          require(b2 == 0x00, f"media $id: unexpected marker FF$b2%02X in scan")
          pos += 1
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(id: Long, n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(id); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker. */
    def expectRst(id: Long, m: Int): Unit = {
      cnt = 0
      require(pos + 1 < bytes.length, s"media $id: truncated at restart")
      val a = bytes(pos) & 0xff
      val b = bytes(pos + 1) & 0xff
      require(a == 0xff && b == 0xd0 + (m % 8),
        f"media $id: expected RST${m % 8} marker, got $a%02X$b%02X")
      pos += 2
    }
  }

  private def huffDecode(br: BitReader, t: HuffTable, id: Long): Int = {
    var code = br.nextBit(id)
    var l = 1
    while (t.maxCode(l) < code || t.maxCode(l) == -1) {
      require(l < 16, s"media $id: invalid Huffman code (>16 bits)")
      code = (code << 1) | br.nextBit(id)
      l += 1
    }
    t.vals(t.valPtr(l) + code - t.minCode(l))
  }

  // T.81 F.2.2.1 EXTEND
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final class Component {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0 // quant table id
    var td = 0 // DC huff id (from SOS)
    var ta = 0 // AC huff id (from SOS)
    var pred = 0 // DC predictor
    var plane: Array[Int] = null // samples at component resolution (padded)
    var planeW = 0
    var planeH = 0
    // progressive mode: raw (not-yet-dequantized) coefficients for
    // every block in the MCU-padded grid, natural order within a block
    var coefs: Array[Int] = null
    var blocksPerLine = 0 // MCU-padded
    var blocksPerCol = 0
    var nbW = 0 // true (non-padded) block counts — what AC scans cover
    var nbH = 0
  }

  /** Dequantized natural-order 8x8 → samples written into the
    * component plane at block origin (px0, py0). Separable IDCT: zz
    * row = vertical frequency v, col = horizontal frequency u; pass 1
    * tmp[v][x] = sum_u c(u,x)*F(u,v); pass 2 f(x,y) = sum_v
    * c(v,y)*tmp[v][x].
    */
  private def idctBlock(zz: Array[Int], tmp: Array[Double],
      plane: Array[Int], planeW: Int, px0: Int, py0: Int): Unit = {
    var vf = 0
    while (vf < 8) {
      var x1 = 0
      while (x1 < 8) {
        var acc = 0.0
        var uf = 0
        while (uf < 8) { acc += Basis(uf * 8 + x1) * zz(vf * 8 + uf); uf += 1 }
        tmp(vf * 8 + x1) = acc
        x1 += 1
      }
      vf += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u2 = 0
        while (u2 < 8) { acc += Basis(u2 * 8 + y) * tmp(u2 * 8 + x); u2 += 1 }
        val s = Math.round(acc).toInt + 128
        plane((py0 + y) * planeW + (px0 + x)) =
          if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  /** Upsample component planes to full resolution + color convert. */
  private def assemble(comps: Array[Component], width: Int, height: Int,
      hMax: Int, vMax: Int): DecodedImage = {
    val nc = comps.length
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = c.plane(y * c.planeW + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          val o = (y * width + x) * 3
          out(o) = clampByte(Math.round(yy + 1.402 * pr))
          out(o + 1) = clampByte(Math.round(yy - 0.344136 * pb - 0.714136 * pr))
          out(o + 2) = clampByte(Math.round(yy + 1.772 * pb))
          x += 1
        }
        y += 1
      }
    }
    DecodedImage(width, height, nc, out)
  }

  /** Decode a baseline JPEG. Throws IllegalArgumentException with the
    * media id on any unsupported/corrupt structure.
    */
  def decode(id: Long, bytes: Array[Byte]): DecodedImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      s"media $id: not a JPEG (no SOI)")
    val quant = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var scansSeen = 0
    var pos = 2

    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    var result: DecodedImage = null
    // segment length, validated against the buffer: a truncated
    // SOF/DHT/DQT/SOS/APPn must fail with the id-tagged message, never
    // an ArrayIndexOutOfBoundsException from a body read past the end
    def segLen(pos: Int): Int = {
      require(pos + 2 <= bytes.length, s"media $id: truncated segment header")
      val len = u16(pos)
      require(len >= 2 && pos + len <= bytes.length,
        s"media $id: truncated segment (len=$len at $pos)")
      len
    }
    while (result == null) {
      require(pos + 1 < bytes.length, s"media $id: truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"media $id: expected marker at $pos")
      // optional fill bytes before a marker (bounds-checked: a file
      // ENDING in 0xFF fill bytes must fail loudly with the id, not AIOOBE)
      while (pos + 2 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      require((bytes(pos + 1) & 0xff) != 0xff, s"media $id: truncated in fill bytes")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => // EOI: progressive images finalize here
          if (progressive && scansSeen > 0)
            result = finishProgressive(id, comps, quant, width, height)
          else
            throw new IllegalArgumentException(s"media $id: EOI before any scan")
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
          progressive = marker == 0xc2
          val len = segLen(pos)
          require((bytes(pos + 2) & 0xff) == 8, s"media $id: only 8-bit precision supported")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require(width > 0 && height > 0, s"media $id: bad dimensions ${width}x$height (DNL unsupported)")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"media $id: $nc components unsupported (1 or 3)")
          require(len >= 8 + 3 * nc, s"media $id: SOF too short for $nc components")
          comps = Array.fill(nc)(new Component)
          var i = 0
          while (i < nc) {
            val o = pos + 8 + 3 * i
            comps(i).id = bytes(o) & 0xff
            comps(i).h = (bytes(o + 1) & 0xff) >> 4
            comps(i).v = bytes(o + 1) & 0x0f
            comps(i).tq = bytes(o + 2) & 0xff
            require(comps(i).tq <= 3, s"media $id: bad quant table id ${comps(i).tq}")
            require(comps(i).h >= 1 && comps(i).h <= 4 && comps(i).v >= 1 && comps(i).v <= 4,
              s"media $id: bad sampling ${comps(i).h}x${comps(i).v}")
            i += 1
          }
          if (progressive) {
            // coefficient accumulation grid: scans refine these until
            // EOI dequantizes + IDCTs the finished blocks
            val hMax = comps.map(_.h).max
            val vMax = comps.map(_.v).max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.blocksPerLine = mcusX * c.h
              c.blocksPerCol = mcusY * c.v
              c.nbW = (width * c.h + 8 * hMax - 1) / (8 * hMax)
              c.nbH = (height * c.v + 8 * vMax - 1) / (8 * vMax)
              c.coefs = new Array[Int](c.blocksPerLine * c.blocksPerCol * 64)
              c.pred = 0
            }
          }
          pos += len
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          throw new IllegalArgumentException(f"media $id: SOF$m%x mode unsupported")
        case 0xc4 => // DHT (possibly several tables)
          val len = segLen(pos)
          var o = pos + 2
          while (o < pos + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            require(tc <= 1 && th <= 3, s"media $id: bad DHT header")
            require(o + 17 <= pos + len, s"media $id: DHT bits overrun segment")
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val n = bits.sum
            require(o + 17 + n <= pos + len, s"media $id: DHT values overrun segment")
            val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + n
          }
          pos += len
        case 0xdb => // DQT (possibly several tables)
          val len = segLen(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            require(pq <= 1 && tq <= 3, s"media $id: bad DQT header")
            require(o + 1 + (if (pq == 0) 64 else 128) <= pos + len,
              s"media $id: DQT table overrun segment")
            val tab = new Array[Int](64)
            var i = 0
            while (i < 64) {
              tab(i) = if (pq == 0) bytes(o + 1 + i) & 0xff
                else u16(o + 1 + 2 * i)
              i += 1
            }
            quant(tq) = tab
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xdd => // DRI
          val len = segLen(pos)
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda => // SOS
          require(comps != null, s"media $id: SOS before SOF")
          val len = segLen(pos)
          val ns = bytes(pos + 2) & 0xff
          require(if (progressive) ns == 1 || ns == comps.length
              else ns == comps.length,
            s"media $id: unsupported scan layout ($ns of ${comps.length} components)")
          require(len >= 6 + 2 * ns, s"media $id: SOS too short for $ns components")
          val scanComps = new Array[Component](ns)
          var i = 0
          while (i < ns) {
            val cs = bytes(pos + 3 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"media $id: SOS references unknown component $cs"))
            c.td = (bytes(pos + 4 + 2 * i) & 0xff) >> 4
            c.ta = bytes(pos + 4 + 2 * i) & 0x0f
            require(c.td <= 3 && c.ta <= 3,
              s"media $id: bad Huffman table ids dc=${c.td} ac=${c.ta}")
            scanComps(i) = c
            i += 1
          }
          if (progressive) {
            val ss = bytes(pos + 3 + 2 * ns) & 0xff
            val se = bytes(pos + 4 + 2 * ns) & 0xff
            val ahal = bytes(pos + 5 + 2 * ns) & 0xff
            pos += len
            pos = decodeProgressiveScan(id, bytes, pos, scanComps, comps,
              quant, dcTabs, acTabs, width, height, restartInterval,
              ss, se, ahal >> 4, ahal & 15)
            scansSeen += 1
          } else {
            pos += len
            result = decodeScan(id, bytes, pos, comps, quant, dcTabs, acTabs,
              width, height, restartInterval)
          }
        case 0x01 => // TEM, no payload
          ()
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside scan
          throw new IllegalArgumentException(s"media $id: RST marker outside scan")
        case _ => // APPn, COM, anything else with a length
          pos += segLen(pos)
      }
    }
    result
  }

  private def decodeScan(id: Long, bytes: Array[Byte], scanStart: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      width: Int, height: Int, restartInterval: Int): DecodedImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      require(quant(c.tq) != null, s"media $id: missing quant table ${c.tq}")
      require(dcTabs(c.td) != null && acTabs(c.ta) != null,
        s"media $id: missing Huffman table dc=${c.td} ac=${c.ta}")
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }
    val br = new BitReader(bytes, scanStart)
    val zz = new Array[Int](64) // natural-order dequantized coefficients
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRst(id, rstIdx)
          rstIdx += 1
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          val qt = quant(c.tq)
          val dcT = dcTabs(c.td)
          val acT = acTabs(c.ta)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // --- decode one block ---
              java.util.Arrays.fill(zz, 0)
              val t = huffDecode(br, dcT, id)
              require(t <= 11, s"media $id: DC category $t out of range")
              val diff = extend(br.receive(id, t), t)
              c.pred += diff
              zz(0) = c.pred * qt(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = huffDecode(br, acT, id)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  require(k < 64, s"media $id: AC index $k out of block")
                  zz(Zigzag(k)) = extend(br.receive(id, s), s) * qt(k)
                  k += 1
                }
              }
              // --- IDCT (separable): zz is natural order with row =
              // vertical frequency v, col = horizontal frequency u.
              // Pass 1 (horizontal): tmp[v][x] = sum_u c(u,x)*F(u,v).
              var vf = 0
              while (vf < 8) {
                var x1 = 0
                while (x1 < 8) {
                  var acc = 0.0
                  var uf = 0
                  while (uf < 8) { acc += Basis(uf * 8 + x1) * zz(vf * 8 + uf); uf += 1 }
                  tmp(vf * 8 + x1) = acc
                  x1 += 1
                }
                vf += 1
              }
              // Pass 2 (vertical): f(x,y) = sum_v c(v,y)*tmp[v][x]
              val px0 = (mx * c.h + bx) * 8
              val py0 = (my * c.v + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var acc = 0.0
                  var u2 = 0
                  while (u2 < 8) { acc += Basis(u2 * 8 + y) * tmp(u2 * 8 + x); u2 += 1 }
                  val s = Math.round(acc).toInt + 128
                  c.plane((py0 + y) * c.planeW + (px0 + x)) =
                    if (s < 0) 0 else if (s > 255) 255 else s
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // --- upsample + color convert ---
    val nc = comps.length
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = c.plane(y * c.planeW + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          val o = (y * width + x) * 3
          out(o) = clampByte(Math.round(yy + 1.402 * pr))
          out(o + 1) = clampByte(Math.round(yy - 0.344136 * pb - 0.714136 * pr))
          out(o + 2) = clampByte(Math.round(yy + 1.772 * pb))
          x += 1
        }
        y += 1
      }
    }
    DecodedImage(width, height, nc, out)
  }

  private def clampByte(v: Long): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---------------------------------------------------------------- //
  //  Progressive mode (T.81 §G.2)                                    //
  // ---------------------------------------------------------------- //

  /** Decode one progressive scan into the components' coefficient
    * grids and return the byte position just past its entropy data.
    * DC scans (ss=0) may interleave all frame components or cover one;
    * AC scans (ss>0) are single-component by spec. `ah == 0` is a
    * first pass (values at bit position `al`), `ah > 0` a successive-
    * approximation refinement contributing bit `al`. The shared
    * EOB-run counter spans blocks within the scan (reset at restarts).
    */
  private def decodeProgressiveScan(id: Long, bytes: Array[Byte], start: Int,
      scanComps: Array[Component], comps: Array[Component],
      quant: Array[Array[Int]], dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable], width: Int, height: Int,
      restartInterval: Int, ss: Int, se: Int, ah: Int, al: Int): Int = {
    require(ss >= 0 && se <= 63 && ss <= se,
      s"media $id: bad spectral selection $ss..$se")
    require(ss == 0 || scanComps.length == 1,
      s"media $id: interleaved AC scan is not allowed by T.81")
    if (ss == 0 && ah == 0) scanComps.foreach { c =>
      require(dcTabs(c.td) != null, s"media $id: missing DC Huffman table ${c.td}")
    }
    if (ss > 0 && ah == 0)
      require(acTabs(scanComps(0).ta) != null,
        s"media $id: missing AC Huffman table ${scanComps(0).ta}")
    val br = new BitReader(bytes, start)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    // one 8x8 block of component c at block coordinates (row, col)
    def blockBase(c: Component, row: Int, col: Int): Int =
      (row * c.blocksPerLine + col) * 64

    def decodeBlock(c: Component, row: Int, col: Int): Unit = {
      val base = blockBase(c, row, col)
      val cf = c.coefs
      if (ss == 0) {
        if (ah == 0) { // DC first
          val t = huffDecode(br, dcTabs(c.td), id)
          require(t <= 11, s"media $id: DC category $t out of range")
          c.pred += extend(br.receive(id, t), t)
          cf(base) = c.pred << al
        } else { // DC refinement: one bit per block
          if (br.nextBit(id) == 1) cf(base) |= (1 << al)
        }
      } else if (ah == 0) { // AC first
        if (eobrun > 0) { eobrun -= 1 }
        else {
          var k = ss
          var done = false
          while (k <= se && !done) {
            val rs = huffDecode(br, acTabs(c.ta), id)
            val r = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.receive(id, r)
                done = true
              } else k += 16 // ZRL
            } else {
              k += r
              require(k <= se, s"media $id: AC index $k out of band $ss..$se")
              cf(base + Zigzag(k)) = extend(br.receive(id, s), s) << al
              k += 1
            }
          }
        }
      } else { // AC refinement (T.81 G.2.2 / libjpeg decode_mcu_AC_refine)
        val p1 = 1 << al
        val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = huffDecode(br, acTabs(c.ta), id)
            var r = rs >> 4
            val s = rs & 15
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                // includes the CURRENT block (its remaining band gets
                // the correction pass below, then eobrun decrements) —
                // libjpeg decode_mcu_AC_refine's EOBRUN convention
                eobrun = 1 << r
                if (r > 0) eobrun += br.receive(id, r)
                done = true
              }
              // r == 15: skip 16 zero-history coefficients
            } else {
              require(s == 1, s"media $id: AC refinement magnitude $s != 1")
              newVal = if (br.nextBit(id) == 1) p1 else m1
            }
            if (!done) {
              // advance past `r` zero-history coefficients, reading a
              // correction bit at every nonzero-history one en route
              var placed = false
              while (k <= se && !placed) {
                val zi = base + Zigzag(k)
                if (cf(zi) != 0) {
                  if (br.nextBit(id) == 1 && (cf(zi) & p1) == 0)
                    cf(zi) += (if (cf(zi) > 0) p1 else m1)
                } else {
                  if (r == 0) {
                    if (newVal != 0) cf(zi) = newVal
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          // EOB correction pass: refine every nonzero coefficient in
          // the remainder of the band
          while (k <= se) {
            val zi = base + Zigzag(k)
            if (cf(zi) != 0) {
              if (br.nextBit(id) == 1 && (cf(zi) & p1) == 0)
                cf(zi) += (if (cf(zi) > 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }
    }

    def restartIfDue(unit: Int, rstIdx: Int): Int = {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.expectRst(id, rstIdx)
        scanComps.foreach(_.pred = 0)
        eobrun = 0
        rstIdx + 1
      } else rstIdx
    }

    if (scanComps.length > 1) {
      // interleaved (DC) scan: frame MCU geometry
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      var mcu = 0
      var rstIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          rstIdx = restartIfDue(mcu, rstIdx)
          scanComps.foreach { c =>
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(c, my * c.v + by, mx * c.h + bx)
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved scan: raster over the component's TRUE block
      // grid (nbW x nbH — padding blocks are not coded, T.81 A.2.2)
      val c = scanComps(0)
      var unit = 0
      var rstIdx = 0
      var row = 0
      while (row < c.nbH) {
        var col = 0
        while (col < c.nbW) {
          rstIdx = restartIfDue(unit, rstIdx)
          decodeBlock(c, row, col)
          unit += 1
          col += 1
        }
        row += 1
      }
    }
    br.pos
  }

  /** Dequantize + IDCT the accumulated progressive coefficients and
    * assemble the final image.
    */
  private def finishProgressive(id: Long, comps: Array[Component],
      quant: Array[Array[Int]], width: Int, height: Int): DecodedImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val zz = new Array[Int](64)
    val tmp = new Array[Double](64)
    comps.foreach { c =>
      require(quant(c.tq) != null, s"media $id: missing quant table ${c.tq}")
      val qt = quant(c.tq)
      c.planeW = c.blocksPerLine * 8
      c.planeH = c.blocksPerCol * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var row = 0
      while (row < c.blocksPerCol) {
        var col = 0
        while (col < c.blocksPerLine) {
          val base = (row * c.blocksPerLine + col) * 64
          var k = 0
          while (k < 64) {
            val nat = Zigzag(k)
            zz(nat) = c.coefs(base + nat) * qt(k)
            k += 1
          }
          idctBlock(zz, tmp, c.plane, c.planeW, col * 8, row * 8)
          col += 1
        }
        row += 1
      }
    }
    assemble(comps, width, height, hMax, vMax)
  }

  // ---------------------------------------------------------------- //
  //  Encoder                                                         //
  // ---------------------------------------------------------------- //

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt) } // pad with 1s
  }

  private def magnitudeCategory(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode RGB (pixel-major, channel-fastest, top-down) as baseline
    * JFIF; `subsample` selects 4:2:0 (2x2,1x1,1x1) vs 4:4:4.
    */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte], quality: Int,
      subsample: Boolean = true, restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != ${width}x$height x3")
    // color transform (JFIF), planes at luma resolution
    val n = width * height
    val py = new Array[Int](n)
    val pb = new Array[Int](n)
    val pr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      py(i) = clampInt(Math.round(0.299 * r + 0.587 * g + 0.114 * b))
      pb(i) = clampInt(Math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
      pr(i) = clampInt(Math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
      i += 1
    }
    if (subsample) {
      // 2x2 box downsample with edge clamp (+2 rounding bias, exact
      // for constant 2x2 cells)
      val cw = (width + 1) / 2
      val ch = (height + 1) / 2
      def down(src: Array[Int]): Array[Int] = {
        val d = new Array[Int](cw * ch)
        var yy = 0
        while (yy < ch) {
          var xx = 0
          while (xx < cw) {
            val x0 = 2 * xx; val x1 = math.min(2 * xx + 1, width - 1)
            val y0 = 2 * yy; val y1 = math.min(2 * yy + 1, height - 1)
            d(yy * cw + xx) = (src(y0 * width + x0) + src(y0 * width + x1) +
              src(y1 * width + x0) + src(y1 * width + x1) + 2) / 4
            xx += 1
          }
          yy += 1
        }
        d
      }
      encodePlanes(width, height,
        Seq((py, width, height, 2, 2), (down(pb), cw, ch, 1, 1), (down(pr), cw, ch, 1, 1)),
        quality, restartInterval)
    } else {
      encodePlanes(width, height,
        Seq((py, width, height, 1, 1), (pb, width, height, 1, 1), (pr, width, height, 1, 1)),
        quality, restartInterval)
    }
  }

  /** Encode a single-component (grayscale) baseline JFIF. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte], quality: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == width * height,
      s"gray length ${gray.length} != ${width}x$height")
    encodePlanes(width, height,
      Seq((gray.map(_ & 0xff), width, height, 1, 1)), quality, restartInterval)
  }

  private def clampInt(v: Long): Int =
    (if (v < 0) 0 else if (v > 255) 255 else v).toInt

  /** Shared encode core over component planes `(samples, w, h, hSamp,
    * vSamp)` — component 0 uses the luma tables, the rest chroma.
    * `restartInterval` > 0 emits DRI + byte-aligned RSTn markers every
    * that many MCUs (predictors reset), exercising the decoder's
    * restart machinery.
    */
  private def encodePlanes(width: Int, height: Int,
      planes: Seq[(Array[Int], Int, Int, Int, Int)], quality: Int,
      restartInterval: Int = 0): Array[Byte] = {
    val nc = planes.size
    require(nc == 1 || nc == 3, s"$nc components unsupported")
    val qLuma = quantTable(StdQuantLuma, quality)
    val qChroma = quantTable(StdQuantChroma, quality)
    val dcLuma = new HuffTable(StdDcLumaBits, StdDcLumaVals)
    val acLuma = new HuffTable(StdAcLumaBits, StdAcLumaVals)
    val dcChroma = new HuffTable(StdDcChromaBits, StdDcChromaVals)
    val acChroma = new HuffTable(StdAcChromaBits, StdAcChromaVals)
    val hMax = planes.map(_._4).max
    val vMax = planes.map(_._5).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    "JFIF".foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT (zigzag order on the wire)
    marker(0xdb); u16(2 + 65 * (if (nc == 3) 2 else 1))
    u8(0x00); (0 until 64).foreach(i => u8(qLuma(Zigzag(i))))
    if (nc == 3) { u8(0x01); (0 until 64).foreach(i => u8(qChroma(Zigzag(i)))) }
    // SOF0
    marker(0xc0); u16(8 + 3 * nc); u8(8); u16(height); u16(width); u8(nc)
    planes.zipWithIndex.foreach { case ((_, _, _, h, v), ci) =>
      u8(ci + 1); u8((h << 4) | v); u8(if (ci == 0) 0 else 1)
    }
    // DHT
    def writeDht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    writeDht(0, 0, StdDcLumaBits, StdDcLumaVals)
    writeDht(1, 0, StdAcLumaBits, StdAcLumaVals)
    if (nc == 3) {
      writeDht(0, 1, StdDcChromaBits, StdDcChromaVals)
      writeDht(1, 1, StdAcChromaBits, StdAcChromaVals)
    }
    // DRI
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nc); u8(nc)
    planes.indices.foreach { ci => u8(ci + 1); u8(if (ci == 0) 0x00 else 0x11) }
    u8(0); u8(63); u8(0)

    // entropy-coded data
    var bw = new BitWriter(out)
    val preds = new Array[Int](nc)
    val block = new Array[Double](64)
    val coef = new Array[Int](64) // zigzag-order quantized coefficients
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (rstIdx % 8))
          rstIdx += 1
          java.util.Arrays.fill(preds, 0)
          bw = new BitWriter(out)
        }
        planes.zipWithIndex.foreach { case ((samples, pw, ph, h, v), ci) =>
          val qt = if (ci == 0) qLuma else qChroma
          val dcT = if (ci == 0) dcLuma else dcChroma
          val acT = if (ci == 0) acLuma else acChroma
          var by = 0
          while (by < v) {
            var bx = 0
            while (bx < h) {
              // gather (edge-replicated) 8x8, level-shifted
              val px0 = (mx * h + bx) * 8
              val py0 = (my * v + by) * 8
              var y = 0
              while (y < 8) {
                val sy = math.min(py0 + y, ph - 1)
                var x = 0
                while (x < 8) {
                  val sx = math.min(px0 + x, pw - 1)
                  block(y * 8 + x) = samples(sy * pw + sx) - 128.0
                  x += 1
                }
                y += 1
              }
              // FDCT: F = B * f * Bt
              var u = 0
              while (u < 8) {
                var y2 = 0
                while (y2 < 8) {
                  var acc = 0.0
                  var x2 = 0
                  while (x2 < 8) { acc += Basis(u * 8 + x2) * block(y2 * 8 + x2); x2 += 1 }
                  tmp(u * 8 + y2) = acc
                  y2 += 1
                }
                u += 1
              }
              var k = 0
              while (k < 64) {
                val nat = Zigzag(k)
                val uu = nat % 8 // horizontal frequency (column of F)
                val vv = nat / 8 // vertical frequency
                var acc = 0.0
                var y3 = 0
                while (y3 < 8) { acc += Basis(vv * 8 + y3) * tmp(uu * 8 + y3); y3 += 1 }
                coef(k) = Math.round(acc / qt(nat)).toInt
                k += 1
              }
              // emit: DC diff then AC run-lengths
              val diff = coef(0) - preds(ci)
              preds(ci) = coef(0)
              val t = magnitudeCategory(diff)
              bw.put(dcT.encCode(t), dcT.encLen(t))
              if (t > 0) bw.put(if (diff >= 0) diff else diff - 1 + (1 << t), t)
              var lastNz = 63
              while (lastNz > 0 && coef(lastNz) == 0) lastNz -= 1
              var kk = 1
              while (kk <= lastNz) {
                var run = 0
                while (coef(kk) == 0) { run += 1; kk += 1 }
                while (run >= 16) {
                  bw.put(acT.encCode(0xf0), acT.encLen(0xf0)) // ZRL
                  run -= 16
                }
                val s = magnitudeCategory(coef(kk))
                val rs = (run << 4) | s
                bw.put(acT.encCode(rs), acT.encLen(rs))
                bw.put(if (coef(kk) >= 0) coef(kk) else coef(kk) - 1 + (1 << s), s)
                kk += 1
              }
              if (lastNz < 63) bw.put(acT.encCode(0x00), acT.encLen(0x00)) // EOB
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------- EXIF

  /** The EXIF Orientation (TIFF tag 0x0112) of a JPEG, or 1 when the
    * file carries no APP1/Exif segment or no Orientation entry — the
    * "as stored" default. Real web JPEGs carry values 2-8 (camera
    * rotations/mirrors); perceptual dedup must normalize them or a
    * rotated duplicate defeats the hash ([[Multimodal.decodeNormalized]]
    * applies the transform). The walk is marker-level only (no entropy
    * decode): SOI, then length-prefixed segments until SOS/EOI; inside
    * APP1 "Exif\0\0" the TIFF header (II/MM byte order, magic 42,
    * IFD0 offset) and IFD0's 12-byte entries are scanned for tag
    * 0x0112 type SHORT. A malformed Exif payload fails loudly
    * (id-tagged) like every codec path; a missing one is simply 1.
    */
  def exifOrientation(id: Long, bytes: Array[Byte]): Int = {
    var result = 1
    var seen = false
    walkSegments(id, bytes, (marker, pos, len) => {
      if (!seen && marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
          bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
          bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
        seen = true
        result = tiffOrientation(id, bytes, pos + 10, pos + 2 + len)
      }
    })
    result
  }

  /** The Orientation entry of a TIFF IFD0 block at `[tiff, end)` —
    * the payload of a JPEG APP1/Exif segment or a WebP EXIF chunk.
    * Returns 1 when no Orientation entry exists; malformed TIFF
    * structure fails loudly.
    */
  private[operators] def tiffOrientation(id: Long, bytes: Array[Byte],
      tiff: Int, end: Int): Int = {
    require(tiff + 8 <= end, s"media $id: Exif TIFF block too short")
    val b0 = bytes(tiff) & 0xff
    val b1 = bytes(tiff + 1) & 0xff
    val little =
      if (b0 == 'I' && b1 == 'I') true
      else if (b0 == 'M' && b1 == 'M') false
      else throw new IllegalArgumentException(
        s"media $id: bad TIFF byte-order mark in Exif")
    def u16At(o: Int): Int = {
      require(o + 2 <= end, s"media $id: Exif TIFF read past segment")
      if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    }
    def u32At(o: Int): Long = {
      require(o + 4 <= end, s"media $id: Exif TIFF read past segment")
      if (little) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    }
    require(u16At(tiff + 2) == 42, s"media $id: bad TIFF magic in Exif")
    val ifd0 = u32At(tiff + 4)
    require(ifd0 >= 8 && tiff + ifd0 + 2 <= end,
      s"media $id: Exif IFD0 offset outside segment")
    val entryBase = tiff + ifd0.toInt
    val n = u16At(entryBase)
    var i = 0
    while (i < n) {
      val e = entryBase + 2 + i * 12
      if (u16At(e) == 0x0112 && u16At(e + 2) == 3 && u32At(e + 4) == 1L) {
        val v = u16At(e + 8) // SHORT fits inline, byte-order applies
        require(v >= 1 && v <= 8,
          s"media $id: Exif Orientation $v outside 1..8")
        return v
      }
      i += 1
    }
    1 // Exif present, no Orientation entry
  }

  /** True iff the TIFF IFD0 block at `[tiff, end)` carries a GPSInfo
    * IFD pointer (tag 0x8825) — the privacy-relevant Exif payload.
    */
  private[operators] def tiffHasGps(id: Long, bytes: Array[Byte],
      tiff: Int, end: Int): Boolean = {
    require(tiff + 8 <= end, s"media $id: Exif TIFF block too short")
    val little = (bytes(tiff) & 0xff) == 'I'
    def u16At(o: Int): Int = {
      require(o + 2 <= end, s"media $id: Exif TIFF read past segment")
      if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    }
    def u32At(o: Int): Long = {
      require(o + 4 <= end, s"media $id: Exif TIFF read past segment")
      if (little) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    }
    val ifd0 = u32At(tiff + 4).toInt
    val entryBase = tiff + ifd0
    val n = u16At(entryBase)
    var i = 0
    while (i < n) {
      if (u16At(entryBase + 2 + i * 12) == 0x8825) return true
      i += 1
    }
    false
  }

  /** True iff a JPEG's APP1/Exif segment carries GPS coordinates. */
  def exifHasGps(id: Long, bytes: Array[Byte]): Boolean = {
    var result = false
    var seen = false
    walkSegments(id, bytes, (marker, pos, len) => {
      if (!seen && marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
          bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
          bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
        seen = true
        result = tiffHasGps(id, bytes, pos + 10, pos + 2 + len)
      }
    })
    result
  }

  /** A TIFF block with Orientation + a GPS IFD (latitude/longitude as
    * degree/minute/second rationals) — the fixture face of the
    * privacy scrub. Coordinates in millidegrees.
    */
  private[graft] def exifTiffBytesGps(orientation: Int, latMilli: Int,
      lonMilli: Int, bigEndian: Boolean): Array[Byte] = {
    val t = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { t.write(v >> 8); t.write(v & 0xff) }
      else { t.write(v & 0xff); t.write(v >> 8) }
    def u32(v: Int): Unit =
      if (bigEndian) { u16(v >>> 16); u16(v & 0xffff) }
      else { u16(v & 0xffff); u16(v >>> 16) }
    t.write(if (bigEndian) 'M' else 'I')
    t.write(if (bigEndian) 'M' else 'I')
    u16(42); u32(8)
    // IFD0 at 8: Orientation + GPSInfo pointer; ends at 8+2+24+4 = 38
    u16(2)
    u16(0x0112); u16(3); u32(1); u16(orientation); u16(0)
    u16(0x8825); u16(4); u32(1); u32(38)
    u32(0)
    // GPS IFD at 38: 4 entries; ends at 38+2+48+4 = 92
    def rat3Off(i: Int): Int = 92 + i * 24
    u16(4)
    u16(0x0001); u16(2); u32(2) // GPSLatitudeRef ASCII "N\0" inline
    if (bigEndian) { t.write('N'); t.write(0); u16(0) }
    else { t.write('N'); t.write(0); u16(0) }
    u16(0x0002); u16(5); u32(3); u32(rat3Off(0)) // GPSLatitude
    u16(0x0003); u16(2); u32(2)
    if (bigEndian) { t.write('E'); t.write(0); u16(0) }
    else { t.write('E'); t.write(0); u16(0) }
    u16(0x0004); u16(5); u32(3); u32(rat3Off(1)) // GPSLongitude
    u32(0)
    def dms(milli: Int): Unit = {
      val deg = milli / 1000
      val minTotal = (milli % 1000) * 60
      val min = minTotal / 1000
      val secMilli = (minTotal % 1000) * 60
      u32(deg); u32(1)
      u32(min); u32(1)
      u32(secMilli); u32(1000)
    }
    dms(latMilli); dms(lonMilli)
    t.toByteArray
  }

  /** Splice an APP1/Exif segment carrying Orientation + GPS — the
    * privacy-scrub fixture writer.
    */
  def withExifGps(jpeg: Array[Byte], orientation: Int, latMilli: Int,
      lonMilli: Int, bigEndian: Boolean = false): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val t = exifTiffBytesGps(orientation, latMilli, lonMilli, bigEndian)
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + t.length
    seg.write(len >> 8); seg.write(len & 0xff)
    "Exif".foreach(c => seg.write(c)); seg.write(0); seg.write(0)
    seg.write(t, 0, t.length)
    val s = seg.toByteArray
    val out = new Array[Byte](jpeg.length + s.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(s, 0, out, 2, s.length)
    System.arraycopy(jpeg, 2, out, 2 + s.length, jpeg.length - 2)
    out
  }

  /** Walk the pre-SOS marker segments of a JPEG with the same
    * 0xFF-fill-byte tolerance as [[decode]] (a file that decodes must
    * also survive the metadata walks): `f(marker, segStart, segLen)`
    * fires per length-carrying segment, where `segStart` is the
    * offset of the marker's 0xFF and `segLen` the stored length.
    * Returns the 0xFF offset of the terminating SOS/EOI marker, or
    * -1 when the file ends before either (headers-only payloads).
    */
  private def walkSegments(id: Long, bytes: Array[Byte],
      f: (Int, Int, Int) => Unit): Int = {
    require(bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, s"media $id: not a JPEG (no SOI)")
    var pos = 2
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff,
        s"media $id: expected marker at $pos in segment walk")
      // optional fill bytes before the marker byte, decode()-style
      while (pos + 2 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      require((bytes(pos + 1) & 0xff) != 0xff,
        s"media $id: truncated in fill bytes in segment walk")
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return pos
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        s"media $id: segment ${marker.toHexString} overruns the file at $pos")
      f(marker, pos, len)
      pos += 2 + len
    }
    -1
  }

  /** Offset just past the EOI marker, starting the scan at a
    * SOS/EOI marker offset: walks entropy-coded data honoring byte
    * stuffing (FF00), RSTn, fill bytes and any embedded
    * length-carrying segments (progressive scans, DNL) until EOI.
    * Bytes appended AFTER the returned offset are trailer payloads
    * (MPF/motion-photo), not image data.
    */
  private def entropyEnd(id: Long, bytes: Array[Byte], start: Int): Int = {
    var pos = start
    while (pos + 2 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff,
        s"media $id: expected marker at $pos in EOI scan")
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return pos + 2
      require(marker != 0xff && pos + 4 <= bytes.length,
        s"media $id: truncated before EOI")
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        s"media $id: segment overruns the file in EOI scan")
      pos += 2 + len
      if (marker == 0xda) {
        // entropy data: scan to the next true marker
        var scanning = true
        while (scanning) {
          require(pos + 1 < bytes.length, s"media $id: truncated in scan data")
          if ((bytes(pos) & 0xff) != 0xff) pos += 1
          else {
            val b = bytes(pos + 1) & 0xff
            if (b == 0x00 || (b >= 0xd0 && b <= 0xd7)) pos += 2 // stuffed / RSTn
            else if (b == 0xff) pos += 1 // fill byte
            else scanning = false
          }
        }
      }
    }
    throw new IllegalArgumentException(s"media $id: no EOI marker found")
  }

  /** Strip metadata segments from a JPEG — the privacy scrub before
    * corpus publication: APP1 Exif/XMP, APP13 Photoshop/IPTC
    * (creator names, captions, location strings) and COM comment
    * segments are dropped, and the file is truncated at EOI so
    * appended trailer payloads (MPF/motion-photo blobs carrying
    * their own Exif) don't ride through. Pixels and every other
    * segment stay byte-identical; when `keepOrientation` and the
    * stored Orientation is not 1, a minimal orientation-only APP1 is
    * re-spliced so display stays correct without leaking the rest
    * (GPS, timestamps, device ids).
    */
  def stripExif(id: Long, jpeg: Array[Byte],
      keepOrientation: Boolean = true): Array[Byte] = {
    val o = exifOrientation(id, jpeg)
    val out = new java.io.ByteArrayOutputStream(jpeg.length)
    out.write(jpeg(0)); out.write(jpeg(1))
    val sos = walkSegments(id, jpeg, (marker, pos, len) => {
      val isExif = marker == 0xe1 && len >= 8 &&
        jpeg(pos + 4) == 'E' && jpeg(pos + 5) == 'x' &&
        jpeg(pos + 6) == 'i' && jpeg(pos + 7) == 'f'
      val isXmp = marker == 0xe1 && len >= 8 &&
        jpeg(pos + 4) == 'h' && jpeg(pos + 5) == 't' &&
        jpeg(pos + 6) == 't' && jpeg(pos + 7) == 'p'
      val isIptc = marker == 0xed // APP13 Photoshop 3.0 / IPTC
      val isCom = marker == 0xfe
      if (!isExif && !isXmp && !isIptc && !isCom)
        out.write(jpeg, pos, 2 + len)
    })
    require(sos >= 0, s"media $id: no SOS/EOI before EOF in scrub walk")
    val end = entropyEnd(id, jpeg, sos)
    out.write(jpeg, sos, end - sos)
    val stripped = out.toByteArray
    if (keepOrientation && o != 1) withExifOrientation(stripped, o)
    else stripped
  }

  /** A minimal TIFF block carrying only the Orientation tag — the
    * payload shared by the JPEG APP1 splice and WebP's EXIF chunk.
    */
  private[operators] def exifTiffBytes(orientation: Int,
      bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"Exif orientation $orientation outside 1..8")
    val tiff = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { tiff.write(v >> 8); tiff.write(v & 0xff) }
      else { tiff.write(v & 0xff); tiff.write(v >> 8) }
    def u32(v: Int): Unit =
      if (bigEndian) { u16(v >>> 16); u16(v & 0xffff) }
      else { u16(v & 0xffff); u16(v >>> 16) }
    tiff.write(if (bigEndian) 'M' else 'I')
    tiff.write(if (bigEndian) 'M' else 'I')
    u16(42); u32(8) // magic + IFD0 at offset 8
    u16(1) // one entry
    u16(0x0112); u16(3); u32(1); u16(orientation); u16(0) // tag/SHORT/count/value+pad
    u32(0) // next-IFD pointer: none
    tiff.toByteArray
  }

  /** Splice an APP1/Exif segment carrying only the Orientation tag
    * right after SOI (writers put APP1 first; readers only need it
    * before SOS). `bigEndian` picks the TIFF byte order — both are
    * legal in the wild and [[exifOrientation]] must read both.
    */
  def withExifOrientation(jpeg: Array[Byte], orientation: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val t = exifTiffBytes(orientation, bigEndian)
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + t.length
    seg.write(len >> 8); seg.write(len & 0xff)
    "Exif".foreach(c => seg.write(c)); seg.write(0); seg.write(0)
    seg.write(t, 0, t.length)
    val s = seg.toByteArray
    val out = new Array[Byte](jpeg.length + s.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(s, 0, out, 2, s.length)
    System.arraycopy(jpeg, 2, out, 2 + s.length, jpeg.length - 2)
    out
  }
}
