package graft.operators

/** WebP VP8L (lossless) codec — pure-JVM decode of the format modern
  * web corpora ship most images in, per the public "WebP Lossless
  * Bitstream Specification" (RFC 9649 / libwebp): RIFF container walk
  * (VP8X wrappers included), LSB-first bit reader, canonical-Huffman
  * entropy codes (simple and code-length-coded forms), color cache,
  * meta-Huffman group images, LZ77 backward references with the 120-
  * entry 2D distance neighborhood, and all four transforms (predictor,
  * color, subtract-green, color indexing incl. sub-byte pixel
  * bundling) inverted in reverse read order.
  *
  * Interop: every format constant that memory could plausibly betray
  * (the code-length-code order, the distance neighborhood table, the
  * prefix-value coding) was validated EMPIRICALLY against the system
  * libwebp 7.1.5 by crafting minimal VP8L streams and observing the
  * reference decoder's output (tools/webp_probe.py); WebpSpec pins
  * libwebp-encoded fixtures (which exercise transforms, color cache,
  * meta groups and LZ77) byte-for-byte and round-trips both
  * directions through the system library when present.
  *
  * Lossy (`VP8 `) stills decode through the full RFC 6386 keyframe
  * decoder in [[Vp8]] (byte-exact YUV vs libwebp — Vp8Spec), converted
  * to RGB via the repo's documented BT.601 integer form;
  * [[Multimodal.sniffModality]] keeps them labeled `image/webp-lossy`
  * so pipelines can distinguish exact from lossy pixels. ALPH chunks
  * (lossy-with-alpha) decode too: headerless VP8L (or raw) alpha
  * planes with the pre-filter inverted — lossless, libwebp-pinned.
  *
  * The [[encodeLossless]] writer emits literal-only VP8L (uniform
  * canonical codes, no transforms) — a valid, libwebp-decodable
  * stream used for fixtures and loader-facing exports; it trades
  * density for determinism, like the repo's PNG writer.
  *
  * Reference seam: the reference pipelines treat images as opaque
  * bytes (gobblin copy/retention tiers); pixel-level decode is
  * net-new capability of this engine's multimodal tier, same contract
  * as [[JpegCodec]]/[[PngCodec]].
  */
object WebpCodec {

  final case class WebpImage(width: Int, height: Int, hasAlpha: Boolean,
      lossless: Boolean, pixels: Array[Int] /* ARGB, empty for lossy */)

  // ------------------------------------------------------------ RIFF

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  /** (fourcc -> payload) for the first VP8L or VP8 chunk; walks over
    * VP8X/ICCP/EXIF/ANIM metadata chunks.
    */
  private def findBitstream(id: Long, b: Array[Byte]): (String, Array[Byte]) = {
    require(isWebp(b), s"media $id: not a WebP RIFF container")
    var o = 12
    while (o + 8 <= b.length) {
      val tag = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(b, o + 4)
      require(size <= Int.MaxValue && o + 8 + size <= b.length,
        s"media $id: WebP chunk '$tag' overruns the container")
      if (tag == "VP8L" || tag == "VP8 ")
        return (tag, java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size.toInt))
      o += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    throw new IllegalArgumentException(
      s"media $id: WebP container carries no VP8/VP8L bitstream")
  }

  /** First chunk with `tag`, if present (stops at the bitstream —
    * ALPH precedes VP8 in well-formed files).
    */
  private def findChunk(id: Long, b: Array[Byte],
      wanted: String): Option[Array[Byte]] = {
    var o = 12
    while (o + 8 <= b.length) {
      val tag = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(b, o + 4)
      require(size <= Int.MaxValue && o + 8 + size <= b.length,
        s"media $id: WebP chunk '$tag' overruns the container")
      if (tag == wanted)
        return Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size.toInt))
      o += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** The EXIF Orientation of a WebP still (VP8X EXIF chunk), or 1
    * when absent — same contract as [[JpegCodec.exifOrientation]].
    * The chunk payload is a raw TIFF block; some writers prefix it
    * with JPEG's "Exif\0\0" marker, both are read.
    */
  def exifOrientation(id: Long, bytes: Array[Byte]): Int = {
    require(isWebp(bytes), s"media $id: not a WebP RIFF container")
    findChunk(id, bytes, "EXIF") match {
      case None => 1
      case Some(p) =>
        val off = if (p.length >= 6 && p(0) == 'E' && p(1) == 'x' &&
          p(2) == 'i' && p(3) == 'f' && p(4) == 0 && p(5) == 0) 6 else 0
        JpegCodec.tiffOrientation(id, p, off, p.length)
    }
  }

  /** Wrap a simple (VP8 /VP8L-only) WebP into a VP8X container
    * carrying an EXIF chunk with the Orientation tag — the fixture
    * face of [[exifOrientation]]. Canvas dims come from decoding the
    * bitstream (fixture-time cost only).
    */
  def withExifOrientation(id: Long, webp: Array[Byte], orientation: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    val img = decode(id, webp)
    val (tag, payload) = findBitstream(id, webp)
    val exif = JpegCodec.exifTiffBytes(orientation, bigEndian)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def u24(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff)
    }
    def chunk(t: String, data: Array[Byte]): Unit = {
      t.foreach(c => out.write(c))
      u32(data.length)
      out.write(data, 0, data.length)
      if ((data.length & 1) == 1) out.write(0) // pad to even
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    u32(0) // placeholder, patched below
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    // VP8X: flags (EXIF=0x08 plus alpha if the source has it), canvas
    val vp8x = new java.io.ByteArrayOutputStream()
    vp8x.write(0x08 | (if (img.hasAlpha) 0x10 else 0))
    vp8x.write(0); vp8x.write(0); vp8x.write(0)
    val w1 = img.width - 1; val h1 = img.height - 1
    vp8x.write(w1 & 0xff); vp8x.write((w1 >> 8) & 0xff)
    vp8x.write((w1 >> 16) & 0xff)
    vp8x.write(h1 & 0xff); vp8x.write((h1 >> 8) & 0xff)
    vp8x.write((h1 >> 16) & 0xff)
    chunk("VP8X", vp8x.toByteArray)
    chunk(tag, payload)
    chunk("EXIF", exif)
    val bytes = out.toByteArray
    val riffSize = bytes.length - 8
    bytes(4) = (riffSize & 0xff).toByte
    bytes(5) = ((riffSize >> 8) & 0xff).toByte
    bytes(6) = ((riffSize >> 16) & 0xff).toByte
    bytes(7) = ((riffSize >> 24) & 0xff).toByte
    bytes
  }

  /** True iff the container's EXIF chunk carries GPS coordinates. */
  def exifHasGps(id: Long, bytes: Array[Byte]): Boolean = {
    require(isWebp(bytes), s"media $id: not a WebP RIFF container")
    findChunk(id, bytes, "EXIF") match {
      case None => false
      case Some(p) =>
        val off = if (p.length >= 6 && p(0) == 'E' && p(1) == 'x' &&
          p(2) == 'i' && p(3) == 'f' && p(4) == 0 && p(5) == 0) 6 else 0
        JpegCodec.tiffHasGps(id, p, off, p.length)
    }
  }

  /** Strip metadata chunks (EXIF, XMP) from a WebP container — the
    * privacy scrub before corpus publication. Every other chunk
    * (bitstream, ALPH, ICCP, animation) is copied verbatim; the VP8X
    * EXIF/XMP flag bits are cleared. When `keepOrientation` and the
    * stored Orientation is not 1, a minimal orientation-only EXIF is
    * re-added (flag kept) so display stays correct without leaking
    * GPS/timestamps/device ids.
    */
  def scrubExif(id: Long, bytes: Array[Byte],
      keepOrientation: Boolean = true): Array[Byte] = {
    require(isWebp(bytes), s"media $id: not a WebP RIFF container")
    val o = exifOrientation(id, bytes)
    val keepExif = keepOrientation && o != 1
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(bytes, 0, 12) // RIFF size patched below
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val len = (bytes(pos + 4) & 0xff) | ((bytes(pos + 5) & 0xff) << 8) |
        ((bytes(pos + 6) & 0xff) << 16) | ((bytes(pos + 7) & 0xff) << 24)
      val total = 8 + len + (len & 1)
      require(len >= 0 && pos + total <= bytes.length,
        s"media $id: WebP chunk $tag overruns container in scrub")
      tag match {
        case "EXIF" | "XMP " => // dropped (minimal EXIF re-added below)
        case "VP8X" =>
          val payload = java.util.Arrays.copyOfRange(bytes, pos + 8,
            pos + 8 + len)
          require(payload.length >= 1, s"media $id: VP8X chunk too short")
          payload(0) = ((payload(0) & ~0x0c) |
            (if (keepExif) 0x08 else 0)).toByte // EXIF=0x08, XMP=0x04
          out.write(bytes, pos, 8) // chunk header verbatim
          out.write(payload, 0, payload.length)
          if ((len & 1) == 1) out.write(0)
        case _ =>
          out.write(bytes, pos, total)
      }
      pos += total
    }
    if (keepExif) {
      val exif = JpegCodec.exifTiffBytes(o, bigEndian = false)
      out.write('E'); out.write('X'); out.write('I'); out.write('F')
      val l = exif.length
      out.write(l & 0xff); out.write((l >> 8) & 0xff)
      out.write((l >> 16) & 0xff); out.write((l >> 24) & 0xff)
      out.write(exif, 0, exif.length)
      if ((l & 1) == 1) out.write(0)
    }
    val res = out.toByteArray
    val riffSize = res.length - 8
    res(4) = (riffSize & 0xff).toByte
    res(5) = ((riffSize >> 8) & 0xff).toByte
    res(6) = ((riffSize >> 16) & 0xff).toByte
    res(7) = ((riffSize >> 24) & 0xff).toByte
    res
  }

  /** True iff the container carries a LOSSLESS (VP8L) bitstream. */
  def isLossless(bytes: Array[Byte]): Boolean =
    isWebp(bytes) &&
      (try findBitstream(-1L, bytes)._1 == "VP8L"
      catch { case _: IllegalArgumentException => false })

  /** True iff the container is animated (VP8X animation flag). A
    * sniff-time probe: never throws on malformed chunk lists.
    */
  def isAnim(bytes: Array[Byte]): Boolean = {
    if (!isWebp(bytes)) return false
    var o = 12
    while (o + 8 <= bytes.length) {
      val tag = new String(bytes, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(bytes, o + 4)
      if (size > Int.MaxValue || o + 8 + size > bytes.length) return false
      if (tag == "VP8X" && size >= 10 && (bytes(o + 8) & 0x02) != 0)
        return true
      o += 8 + size.toInt + (size.toInt & 1)
    }
    false
  }

  // ------------------------------------------------------ bit reader

  private final class Reader(b: Array[Byte], var bitPos: Long, id: Long) {
    private val limit = b.length.toLong * 8
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        // tolerate sub-byte padding at the very end; anything further
        // is a truncated stream and must fail loudly
        require(bitPos < limit + 32, s"media $id: VP8L stream truncated")
        if (bitPos < limit) {
          val byte = b((bitPos >> 3).toInt) & 0xff
          v |= ((byte >> (bitPos & 7).toInt) & 1) << i
        }
        bitPos += 1
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // --------------------------------------------------------- huffman

  /** Canonical Huffman decode tree from code lengths (deflate
    * construction; codes enter the stream MSB-first — validated
    * against libwebp). Flat arrays: node i has children 2i+1/2i+2 in
    * `kids`... represented instead as explicit arrays grown on insert.
    * `root >= 0` short-circuits 0-bit single-symbol codes.
    */
  private final class Huff(lengths: Array[Int], id: Long) {
    // -1 = unset, >= 0 = symbol + 1 encoded as -(sym+2) for leaves
    private var left = new Array[Int](64)
    private var right = new Array[Int](64)
    private var nodes = 1
    java.util.Arrays.fill(left, 0, 64, -1)
    java.util.Arrays.fill(right, 0, 64, -1)
    private var single = -1 // 0-bit code: the only symbol

    locally {
      val maxLen = lengths.max
      if (maxLen == 0)
        throw new IllegalArgumentException(s"media $id: empty huffman code")
      val count = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      if (count.sum == 1) {
        single = lengths.indexWhere(_ > 0)
      } else {
        // completeness: sum 2^-len == 1, or the table is corrupt
        var kraft = 0L
        val unit = 1L << maxLen
        var l = 1
        while (l <= maxLen) { kraft += count(l).toLong << (maxLen - l); l += 1 }
        require(kraft == unit, s"media $id: incomplete huffman code")
        val nextCode = new Array[Int](maxLen + 1)
        var code = 0
        l = 1
        while (l <= maxLen) {
          code = (code + count(l - 1)) << 1
          nextCode(l) = code
          l += 1
        }
        var sym = 0
        while (sym < lengths.length) {
          val len = lengths(sym)
          if (len > 0) {
            insert(nextCode(len), len, sym)
            nextCode(len) += 1
          }
          sym += 1
        }
      }
    }

    private def grow(): Unit = {
      if (nodes >= left.length) {
        val nl = new Array[Int](left.length * 2)
        val nr = new Array[Int](left.length * 2)
        java.util.Arrays.fill(nl, -1); java.util.Arrays.fill(nr, -1)
        System.arraycopy(left, 0, nl, 0, left.length)
        System.arraycopy(right, 0, nr, 0, right.length)
        left = nl; right = nr
      }
    }

    private def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val b = (code >> i) & 1
        // NOTE: grow() replaces the arrays — always re-index through
        // the fields, never through a captured reference
        if (i == 0) {
          if (b == 0) left(node) = -(sym + 2) else right(node) = -(sym + 2)
        } else {
          val cur = if (b == 0) left(node) else right(node)
          if (cur == -1) {
            grow()
            if (b == 0) left(node) = nodes else right(node) = nodes
            node = nodes
            nodes += 1
          } else {
            node = cur
            require(node > 0, s"media $id: over-subscribed huffman code")
          }
        }
        i -= 1
      }
    }

    def read(r: Reader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val v = if (r.bit() == 0) left(node) else right(node)
        require(v != -1, s"media $id: invalid huffman code in stream")
        if (v <= -2) return -v - 2
        node = v
      }
      -1 // unreachable
    }
  }

  /** order in which the 19 code-length-code lengths appear (validated
    * against libwebp — note 16 sits at index 8, NOT at the tail).
    */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readCode(r: Reader, alphabetSize: Int, id: Long): Huff = {
    if (r.bit() == 1) { // simple code: 1-2 symbols
      val lengths = new Array[Int](alphabetSize)
      val nSyms = r.bit() + 1
      val first8 = r.bit()
      val s0 = r.bits(if (first8 == 1) 8 else 1)
      require(s0 < alphabetSize, s"media $id: simple-code symbol out of range")
      if (nSyms == 2) {
        val s1 = r.bits(8)
        require(s1 < alphabetSize && s1 != s0,
          s"media $id: bad simple-code symbol pair")
        lengths(s0) = 1; lengths(s1) = 1
      } else lengths(s0) = 1
      new Huff(lengths, id)
    } else {
      val clLengths = new Array[Int](19)
      val numCodes = r.bits(4) + 4
      var i = 0
      while (i < numCodes) { clLengths(ClOrder(i)) = r.bits(3); i += 1 }
      val clHuff = new Huff(clLengths, id)
      var maxSymbol =
        if (r.bit() == 1) {
          val nbits = 2 + 2 * r.bits(3)
          2 + r.bits(nbits)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var prev = 8
      var sym = 0
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clHuff.read(r)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + r.bits(2), prev)
            case 17 => (3 + r.bits(3), 0)
            case _ => (11 + r.bits(7), 0)
          }
          require(sym + repeat <= alphabetSize,
            s"media $id: huffman code-length repeat overruns alphabet")
          var k = 0
          while (k < repeat) { lengths(sym) = value; sym += 1; k += 1 }
        }
      }
      new Huff(lengths, id)
    }
  }

  // ----------------------------------------------------- LZ77 coding

  /** prefix symbol -> value (with extra bits from the stream). */
  private def lz77Value(sym: Int, r: Reader): Int =
    if (sym < 4) sym + 1
    else {
      val extra = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extra
      offset + r.bits(extra) + 1
    }

  /** (dx, dy) for distance codes 1..120 — the 2D pixel neighborhood
    * of the spec, empirically extracted from libwebp 7.1.5 decode
    * behavior (tools/webp_probe.py).
    */
  private val DistLut: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeToDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistLut(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------------ transforms

  private sealed trait Transform
  private final case class Predictor(bits: Int, image: Array[Int],
      xsize: Int) extends Transform
  private final case class ColorTx(bits: Int, image: Array[Int],
      xsize: Int) extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(palette: Array[Int], xsize: Int,
      xbits: Int) extends Transform

  private def sub(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // --------------------------------------------------------- decode

  def decode(id: Long, bytes: Array[Byte]): WebpImage = {
    val (tag, payload) = findBitstream(id, bytes)
    if (tag == "VP8 ") {
      // lossy VP8 keyframe: full RFC 6386 intra decode ([[Vp8]],
      // libwebp-interop-pinned on the YUV planes), converted to RGB
      // via the repo's documented BT.601 form; an accompanying ALPH
      // chunk (lossy-with-alpha) is decoded below into the alpha byte.
      val yuv = Vp8.decode(id, payload)
      val rgb = Vp8.toRgb(yuv)
      // an ALPH chunk carries the (lossless) alpha plane of a lossy
      // still: headerless VP8L or raw, + a PNG-style pre-filter
      val alphaPlane = findChunk(id, bytes, "ALPH")
        .map(a => decodeAlpha(id, a, yuv.width, yuv.height))
      val px = new Array[Int](yuv.width * yuv.height)
      var i = 0
      while (i < px.length) {
        val a = alphaPlane.map(_(i) & 0xff).getOrElse(0xff)
        px(i) = (a << 24) | ((rgb.pixels(i * 3) & 0xff) << 16) |
          ((rgb.pixels(i * 3 + 1) & 0xff) << 8) | (rgb.pixels(i * 3 + 2) & 0xff)
        i += 1
      }
      return WebpImage(yuv.width, yuv.height,
        hasAlpha = alphaPlane.isDefined, lossless = false, pixels = px)
    }
    decodeVp8l(id, payload)
  }

  /** Lossy (VP8) WebP decoded to its native YUV 4:2:0 planes — the
    * spec-exact output, byte-comparable against reference decoders.
    */
  def decodeYuv(id: Long, bytes: Array[Byte]): Vp8.Yuv = {
    val (tag, payload) = findBitstream(id, bytes)
    require(tag == "VP8 ", s"media $id: not a lossy (VP8) WebP")
    Vp8.decode(id, payload)
  }

  /** Decode one bare VP8L bitstream (the payload of a VP8L chunk). */
  private def decodeVp8l(id: Long, payload: Array[Byte]): WebpImage = {
    require(payload.nonEmpty && (payload(0) & 0xff) == 0x2f,
      s"media $id: bad VP8L signature")
    val r = new Reader(payload, 8L, id)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    val alpha = r.bit() == 1
    val version = r.bits(3)
    require(version == 0, s"media $id: unknown VP8L version $version")
    require(w.toLong * h <= 64L * 1024 * 1024,
      s"media $id: ${w}x$h exceeds the 64 MP decode guard")
    WebpImage(w, h, alpha, lossless = true, level0(r, w, h, id))
  }

  /** An ALPH chunk's alpha plane: a HEADERLESS level-0 VP8L stream of
    * the frame's dimensions whose green channel carries alpha, then
    * the chunk's pre-filter inverted row-wise (horizontal/vertical/
    * gradient, PNG-style). Compression method 0 is the raw plane.
    */
  private def decodeAlpha(id: Long, chunk: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    require(chunk.length >= 1, s"media $id: empty ALPH chunk")
    val hdr = chunk(0) & 0xff
    val filter = (hdr >> 2) & 3
    val method = hdr & 3
    require(method <= 1, s"media $id: reserved ALPH compression $method")
    val raw = new Array[Byte](w * h)
    if (method == 0) {
      require(chunk.length >= 1 + w * h, s"media $id: short raw ALPH plane")
      System.arraycopy(chunk, 1, raw, 0, w * h)
    } else {
      val payload = java.util.Arrays.copyOfRange(chunk, 1, chunk.length)
      val px = level0(new Reader(payload, 0L, id), w, h, id)
      var i = 0
      while (i < px.length) { raw(i) = ((px(i) >> 8) & 0xff).toByte; i += 1 }
    }
    if (filter != 0) { // invert the pre-filter in place, row-major
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val left = if (x > 0) raw(i - 1) & 0xff else if (y > 0) raw(i - w) & 0xff else 0
          val top = if (y > 0) raw(i - w) & 0xff else left
          val tl = if (x > 0 && y > 0) raw(i - w - 1) & 0xff else left
          val pred = filter match {
            case 1 => left
            case 2 => top
            case _ =>
              val g = left + top - tl
              if (g < 0) 0 else if (g > 255) 255 else g
          }
          raw(i) = ((raw(i) & 0xff) + pred).toByte
          x += 1
        }
        y += 1
      }
    }
    raw
  }

  /** The level-0 (transform-carrying) VP8L image stream at known
    * dimensions — shared by the headered still path and headerless
    * ALPH alpha planes.
    */
  private def level0(r: Reader, w: Int, h: Int, id: Long): Array[Int] = {
    // ---- transforms (top level only; color-indexing shrinks xsize)
    var xsize = w
    var transforms = List.empty[Transform]
    var seen = Set.empty[Int]
    while (r.bit() == 1) {
      val t = r.bits(2)
      require(!seen(t), s"media $id: duplicate VP8L transform $t")
      seen += t
      t match {
        case 0 | 1 =>
          val bits = r.bits(3) + 2
          val img = entropyImage(r, sub(xsize, bits), sub(h, bits), id)
          transforms ::=
            (if (t == 0) Predictor(bits, img, xsize)
            else ColorTx(bits, img, xsize))
        case 2 => transforms ::= SubtractGreen
        case _ =>
          val nColors = r.bits(8) + 1
          val raw = entropyImage(r, nColors, 1, id)
          val pal = new Array[Int](nColors)
          var i = 0
          var prev = 0
          while (i < nColors) { // component-wise delta accumulation
            val p = raw(i)
            val a = (((prev >>> 24) + (p >>> 24)) & 0xff) << 24
            val rr = (((prev >> 16) + (p >> 16)) & 0xff) << 16
            val g = (((prev >> 8) + (p >> 8)) & 0xff) << 8
            val b = ((prev + p) & 0xff)
            prev = a | rr | g | b
            pal(i) = prev
            i += 1
          }
          val xbits =
            if (nColors <= 2) 3 else if (nColors <= 4) 2
            else if (nColors <= 16) 1 else 0
          transforms ::= ColorIndex(pal, xsize, xbits)
          xsize = sub(xsize, xbits)
      }
    }

    // ---- main spatially-coded image (cache + meta + groups)
    var px = spatialImage(r, xsize, h, id)

    // ---- inverse transforms, reverse read order (list head = last read)
    transforms.foreach {
      case ColorIndex(pal, origX, xbits) =>
        px = invColorIndex(px, xsize, h, pal, origX, xbits, id)
        xsize = origX
      case SubtractGreen => invSubtractGreen(px)
      case ColorTx(bits, img, tx) => invColor(px, tx, h, bits, img)
      case Predictor(bits, img, tx) => invPredictor(px, tx, h, bits, img, id)
    }
    require(xsize == w, s"media $id: transform size bookkeeping broke")
    px
  }

  /** Entropy-coded image (transform data / entropy image / palette):
    * own color cache, single huffman group, LZ77 — no meta, no
    * transforms.
    */
  private def entropyImage(r: Reader, w: Int, h: Int, id: Long): Array[Int] = {
    val cacheBits = if (r.bit() == 1) r.bits(4) else 0
    require(cacheBits <= 11, s"media $id: color cache bits $cacheBits > 11")
    val group = readGroup(r, cacheBits, id)
    decodePixels(r, w, h, cacheBits, Array(group), null, 0, 1, id)
  }

  /** The main image: cache bit, optional meta-huffman image, groups. */
  private def spatialImage(r: Reader, w: Int, h: Int, id: Long): Array[Int] = {
    val cacheBits = if (r.bit() == 1) r.bits(4) else 0
    require(cacheBits <= 11, s"media $id: color cache bits $cacheBits > 11")
    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 1
    var nGroups = 1
    if (r.bit() == 1) {
      metaBits = r.bits(3) + 2
      metaW = sub(w, metaBits)
      metaImg = entropyImage(r, metaW, sub(h, metaBits), id)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      nGroups = mx + 1
      require(nGroups <= (1 << 16), s"media $id: meta group count")
    }
    val groups = Array.fill(nGroups)(readGroup(r, cacheBits, id))
    decodePixels(r, w, h, cacheBits, groups, metaImg, metaBits, metaW, id)
  }

  private final case class Group(green: Huff, red: Huff, blue: Huff,
      alpha: Huff, dist: Huff)

  private def readGroup(r: Reader, cacheBits: Int, id: Long): Group = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    Group(
      readCode(r, 256 + 24 + cacheSize, id),
      readCode(r, 256, id), readCode(r, 256, id), readCode(r, 256, id),
      readCode(r, 40, id))
  }

  private def decodePixels(r: Reader, w: Int, h: Int, cacheBits: Int,
      groups: Array[Group], metaImg: Array[Int], metaBits: Int, metaW: Int,
      id: Long): Array[Int] = {
    val n = w * h
    val out = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    @inline def put(pos: Int, px: Int): Unit = {
      out(pos) = px
      if (cache != null)
        cache(((0x1e35a7bd * px) >>> (32 - cacheBits)).toInt) = px
    }
    var pos = 0
    while (pos < n) {
      val g =
        if (metaImg == null) groups(0)
        else {
          val x = pos % w
          val y = pos / w
          val m = (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
          groups(m)
        }
      val sym = g.green.read(r)
      if (sym < 256) {
        val red = g.red.read(r)
        val blue = g.blue.read(r)
        val a = g.alpha.read(r)
        put(pos, (a << 24) | (red << 16) | (sym << 8) | blue)
        pos += 1
      } else if (sym < 256 + 24) {
        val length = lz77Value(sym - 256, r)
        val distCode = lz77Value(g.dist.read(r), r)
        val dist = planeToDistance(distCode, w)
        require(dist <= pos, s"media $id: LZ77 distance $dist before image start")
        require(pos + length <= n, s"media $id: LZ77 run past image end")
        var k = 0
        while (k < length) { put(pos, out(pos - dist)); pos += 1; k += 1 }
      } else {
        val idx = sym - 256 - 24
        require(cache != null && idx < cache.length,
          s"media $id: color-cache reference without a cache")
        put(pos, cache(idx))
        pos += 1
      }
    }
    out
  }

  // ------------------------------------------- inverse transforms

  private def invSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val red = ((p >> 16) + g) & 0xff
      val b = (p + g) & 0xff
      px(i) = (p & 0xff00ff00) | (red << 16) | b
      i += 1
    }
  }

  @inline private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  @inline private def addPixels(a: Int, b: Int): Int = {
    val ag = (a & 0xff00ff00L) + (b & 0xff00ff00L)
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((ag & 0xff00ff00L) | (rb & 0x00ff00ff)).toInt
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def select(t: Int, l: Int, tl: Int): Int = {
    @inline def d(a: Int, b: Int, c: Int): Int =
      math.abs(b - c) - math.abs(a - c)
    val s =
      d((t >>> 24), (l >>> 24), (tl >>> 24)) +
        d((t >> 16) & 0xff, (l >> 16) & 0xff, (tl >> 16) & 0xff) +
        d((t >> 8) & 0xff, (l >> 8) & 0xff, (tl >> 8) & 0xff) +
        d(t & 0xff, l & 0xff, tl & 0xff)
    if (s <= 0) t else l
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(sh: Int): Int =
      clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    @inline def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clip255(a + (a - b) / 2) // C truncation toward zero, per libwebp
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def invPredictor(px: Array[Int], w: Int, h: Int, bits: Int,
      modes: Array[Int], id: Long): Unit = {
    val mw = sub(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // top row: left
          else if (x == 0) px(pos - w) // left column: top
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >> 8) & 0xff
            require(mode < 14, s"media $id: predictor mode $mode > 13")
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // rightmost column: TR wraps to the current row's first
            // pixel (already decoded) — libwebp pointer arithmetic
            val tr = if (x + 1 < w) px(pos - w + 1) else px(y * w)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case _ => clampAddSubHalf(l, t, tl)
            }
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
  }

  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def invColor(px: Array[Int], w: Int, h: Int, bits: Int,
      ctes: Array[Int]): Unit = {
    val mw = sub(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val cte = ctes((y >> bits) * mw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        val red = (((p >> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
        val b = ((p & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, red)) & 0xff
        px(pos) = (p & 0xff00ff00) | (red << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def invColorIndex(px: Array[Int], packedW: Int, h: Int,
      pal: Array[Int], origW: Int, xbits: Int, id: Long): Array[Int] = {
    val out = new Array[Int](origW * h)
    val bpp = 8 >> xbits
    val mask = (1 << xbits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < origW) {
        val packed = px(y * packedW + (x >> xbits))
        val g = (packed >> 8) & 0xff
        val idx = (g >> ((x & mask) * bpp)) & ((1 << bpp) - 1)
        // out-of-palette indices decode as transparent black (the
        // conservative spec-permitted handling)
        out(y * origW + x) = if (idx < pal.length) pal(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------- encode

  /** Literal-only VP8L writer: no transforms, no cache, no meta; green
    * as a canonical 9-bit/256-literal code (+ an unused length-prefix
    * symbol completing the Kraft sum), red/blue as uniform 8-bit
    * codes, constant alpha and distance as 1-symbol simple codes.
    * Valid per the spec and verified decodable by libwebp. `pixels`
    * is RGB (3 bytes/px) or RGBA (4).
    */
  def encodeLossless(w: Int, h: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] =
    riffWrap(chunk("VP8L", encodeVp8lPayload(w, h, channels, pixels)))

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le24(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] =
    tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def riffWrap(body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WEBP".getBytes("US-ASCII") ++ body

  /** The bare VP8L bitstream (signature byte included) for one image. */
  private def encodeVp8lPayload(w: Int, h: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels $channels not in {3,4}")
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384, s"bad dims ${w}x$h")
    require(pixels.length == w * h * channels, "pixel buffer size mismatch")
    val o = new BitWriter
    o.bits(w - 1, 14); o.bits(h - 1, 14)
    o.bits(if (channels == 4) 1 else 0, 1) // alpha hint
    o.bits(0, 3) // version
    o.bits(0, 1) // no transforms
    o.bits(0, 1) // no color cache
    o.bits(0, 1) // no meta huffman
    // green: 256 literals @9 + symbol 256 @1 + 23 zeros (Kraft = 1);
    // canonical => literal g encodes as value 256+g in 9 bits
    writeNormalHeader(o, Map(9 -> 1, 16 -> 2, 1 -> 3, 18 -> 3))
    writeClSym(o, 9, Map(9 -> (0, 1), 16 -> (2, 2), 1 -> (6, 3), 18 -> (7, 3)))
    writeRepeat16(o, 255, Map(9 -> (0, 1), 16 -> (2, 2), 1 -> (6, 3), 18 -> (7, 3)))
    writeClSym(o, 1, Map(9 -> (0, 1), 16 -> (2, 2), 1 -> (6, 3), 18 -> (7, 3)))
    writeClSym(o, 18, Map(9 -> (0, 1), 16 -> (2, 2), 1 -> (6, 3), 18 -> (7, 3)))
    o.bits(23 - 11, 7)
    // red, blue: uniform 8-bit over exactly 256 symbols
    var c = 0
    while (c < 2) {
      writeNormalHeader(o, Map(8 -> 1, 16 -> 1))
      writeClSym(o, 8, Map(8 -> (0, 1), 16 -> (1, 1)))
      writeRepeat16(o, 255, Map(8 -> (0, 1), 16 -> (1, 1)))
      c += 1
    }
    // alpha: simple 1-symbol (255 for RGB input); distance: symbol 0
    if (channels == 3) writeSimple1(o, 255)
    else {
      // alpha varies: uniform 8-bit code like red/blue
      writeNormalHeader(o, Map(8 -> 1, 16 -> 1))
      writeClSym(o, 8, Map(8 -> (0, 1), 16 -> (1, 1)))
      writeRepeat16(o, 255, Map(8 -> (0, 1), 16 -> (1, 1)))
    }
    if (channels == 3) writeSimple1(o, 0)
    else writeSimple1(o, 0)
    var i = 0
    val n = w * h
    while (i < n) {
      val r = pixels(i * channels) & 0xff
      val g = pixels(i * channels + 1) & 0xff
      val b = pixels(i * channels + 2) & 0xff
      o.code(256 + g, 9)
      o.code(r, 8)
      o.code(b, 8)
      if (channels == 4) o.code(pixels(i * channels + 3) & 0xff, 8)
      i += 1
    }
    Array[Byte](0x2f) ++ o.toBytes
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Int, n: Int): Unit = { // LSB-first
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nb
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i += 1
      }
    }
    def code(v: Int, n: Int): Unit = { // huffman code, MSB-first
      var i = n - 1
      while (i >= 0) { bits((v >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nb > 0) { buf.write(cur); cur = 0; nb = 0 }
      buf.toByteArray
    }
  }

  /** normal-code preamble: not-simple, all 19 CL slots, the 3-bit CL
    * lengths in [[ClOrder]], no max_symbol.
    */
  private def writeNormalHeader(o: BitWriter, clLen: Map[Int, Int]): Unit = {
    o.bits(0, 1)
    o.bits(19 - 4, 4)
    ClOrder.foreach(s => o.bits(clLen.getOrElse(s, 0), 3))
    o.bits(0, 1)
  }

  private def writeClSym(o: BitWriter, sym: Int,
      codes: Map[Int, (Int, Int)]): Unit = {
    val (c, n) = codes(sym)
    o.code(c, n)
  }

  /** emit `left` copies of the previous code length via symbol 16. */
  private def writeRepeat16(o: BitWriter, count: Int,
      codes: Map[Int, (Int, Int)]): Unit = {
    var left = count
    while (left > 0) {
      // never leave a sub-3 remainder (16 repeats 3..6)
      val take =
        if (left <= 6) left max 3 min left
        else if (left - 6 < 3 && left - 6 > 0) left - 3
        else 6
      require(take >= 3 && take <= 6 && take <= left,
        s"unencodable repeat remainder $left")
      writeClSym(o, 16, codes)
      o.bits(take - 3, 2)
      left -= take
    }
  }

  private def writeSimple1(o: BitWriter, sym: Int): Unit = {
    o.bits(1, 1); o.bits(0, 1); o.bits(1, 1); o.bits(sym, 8)
  }

  // ------------------------------------------------------- animation

  final case class AnimFrame(durationMs: Int, pixels: Array[Int])

  final case class WebpAnim(width: Int, height: Int, loopCount: Int,
      frames: Seq[AnimFrame])

  private def u24le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)

  /** Straight-alpha source-over blend, the container spec's formula in
    * exact integer form (blend flag 0 frames).
    */
  private[operators] def blendPx(src: Int, dst: Int): Int = {
    val sa = src >>> 24
    if (sa == 255) src
    else {
      val da = dst >>> 24
      val a = sa + da * (255 - sa) / 255
      if (a == 0) 0
      else {
        @inline def ch(sh: Int): Int = {
          val s = (src >>> sh) & 0xff
          val d = (dst >>> sh) & 0xff
          (s * sa + d * da * (255 - sa) / 255) / a
        }
        (a << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      }
    }
  }

  /** Decode an ANIMATED lossless WebP (VP8X + ANIM + ANMF chunks with
    * VP8L frame bitstreams): each ANMF sub-rectangle composites onto
    * the canvas per its blend flag (alpha-blend or overwrite) and, per
    * its dispose flag, clears its rect to transparent afterwards (the
    * dispose-to-background semantics renderers apply — the ANIM
    * background color is a hint, not pixel data). Returns the FULLY
    * COMPOSITED frames — the analysis-ready form, matching
    * [[GifCodec]]'s contract. Lossy (VP8) frames fail loudly.
    */
  def decodeAnim(id: Long, b: Array[Byte]): WebpAnim = {
    require(isWebp(b), s"media $id: not a WebP RIFF container")
    var o = 12
    var canvasW = -1
    var canvasH = -1
    var loop = 0
    var animSeen = false
    var canvas: Array[Int] = null
    var totalPx = 0L
    val frames = Seq.newBuilder[AnimFrame]
    while (o + 8 <= b.length) {
      val tag = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(b, o + 4)
      require(size <= Int.MaxValue && o + 8 + size <= b.length,
        s"media $id: WebP chunk '$tag' overruns the container")
      val sz = size.toInt
      tag match {
        case "VP8X" =>
          require(sz >= 10, s"media $id: short VP8X chunk")
          val flags = b(o + 8) & 0xff
          require((flags & 0x02) != 0,
            s"media $id: VP8X without the animation flag")
          canvasW = u24le(b, o + 12) + 1
          canvasH = u24le(b, o + 15) + 1
          require(canvasW.toLong * canvasH <= 64L * 1024 * 1024,
            s"media $id: ${canvasW}x$canvasH exceeds the 64 MP decode guard")
          canvas = new Array[Int](canvasW * canvasH)
        case "ANIM" =>
          require(sz >= 6 && canvas != null,
            s"media $id: ANIM chunk without a VP8X canvas")
          loop = (b(o + 12) & 0xff) | ((b(o + 13) & 0xff) << 8)
          animSeen = true
        case "ANMF" =>
          require(animSeen, s"media $id: ANMF frame before the ANIM chunk")
          require(sz >= 16, s"media $id: short ANMF header")
          // each composited frame clones the full canvas, so the budget
          // is frames * canvas pixels — bound it like the 64 MP per-image
          // guard or an adversarial many-tiny-frame file allocates
          // unboundedly before any loud failure
          totalPx += canvasW.toLong * canvasH
          require(totalPx <= 256L * 1024 * 1024,
            s"media $id: animation exceeds the 256 MP cumulative " +
              s"decode guard (${canvasW}x$canvasH canvas)")
          val fx = u24le(b, o + 8) * 2
          val fy = u24le(b, o + 11) * 2
          val fw = u24le(b, o + 14) + 1
          val fh = u24le(b, o + 17) + 1
          val dur = u24le(b, o + 20)
          val fl = b(o + 23) & 0xff
          val noBlend = (fl & 0x02) != 0
          val disposeBg = (fl & 0x01) != 0
          require(fx + fw <= canvasW && fy + fh <= canvasH,
            s"media $id: frame rect ${fw}x$fh@($fx,$fy) outside the canvas")
          // inner chunks of the frame: the VP8L bitstream (ALPH would
          // accompany lossy frames only)
          var p = o + 8 + 16
          var sub: Array[Byte] = null
          var subLossy = false
          val end = o + 8 + sz
          while (sub == null && p + 8 <= end) {
            val t2 = new String(b, p, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            val s2 = u32le(b, p + 4)
            require(s2 <= Int.MaxValue && p + 8 + s2 <= end,
              s"media $id: frame chunk '$t2' overruns its ANMF")
            if (t2 == "VP8L" || t2 == "VP8 ") {
              sub = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + s2.toInt)
              subLossy = t2 == "VP8 "
            }
            p += 8 + s2.toInt + (s2.toInt & 1)
          }
          require(sub != null, s"media $id: ANMF frame without a bitstream")
          val img =
            if (!subLossy) decodeVp8l(id, sub)
            else { // lossy frame: keyframe decode, opaque pixels
              val yuv = Vp8.decode(id, sub)
              val rgb = Vp8.toRgb(yuv)
              val px2 = new Array[Int](yuv.width * yuv.height)
              var i2 = 0
              while (i2 < px2.length) {
                px2(i2) = 0xff000000 |
                  ((rgb.pixels(i2 * 3) & 0xff) << 16) |
                  ((rgb.pixels(i2 * 3 + 1) & 0xff) << 8) |
                  (rgb.pixels(i2 * 3 + 2) & 0xff)
                i2 += 1
              }
              WebpImage(yuv.width, yuv.height, hasAlpha = false,
                lossless = false, px2)
            }
          require(img.width == fw && img.height == fh,
            s"media $id: frame bitstream ${img.width}x${img.height} != " +
              s"ANMF rect ${fw}x$fh")
          var yy = 0
          while (yy < fh) {
            var xx = 0
            while (xx < fw) {
              val di = (fy + yy) * canvasW + (fx + xx)
              val src = img.pixels(yy * fw + xx)
              canvas(di) = if (noBlend) src else blendPx(src, canvas(di))
              xx += 1
            }
            yy += 1
          }
          frames += AnimFrame(dur, canvas.clone())
          if (disposeBg) {
            var y2 = 0
            while (y2 < fh) {
              java.util.Arrays.fill(canvas, (fy + y2) * canvasW + fx,
                (fy + y2) * canvasW + fx + fw, 0)
              y2 += 1
            }
          }
        case _ => ()
      }
      o += 8 + sz + (sz & 1)
    }
    val fs = frames.result()
    require(animSeen && fs.nonEmpty, s"media $id: no animation frames")
    WebpAnim(canvasW, canvasH, loop, fs)
  }

  /** Frame spec for [[encodeAnim]]: even-aligned rect + RGB pixels. */
  final case class AnimFrameSpec(x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, noBlend: Boolean, disposeBg: Boolean,
      rgb: Array[Byte])

  /** Animated lossless WebP writer (VP8X + ANIM + one ANMF with a
    * [[encodeVp8lPayload]] bitstream per frame) — fixture/export
    * counterpart of [[decodeAnim]].
    */
  def encodeAnim(canvasW: Int, canvasH: Int, loopCount: Int,
      frames: Seq[AnimFrameSpec]): Array[Byte] = {
    require(frames.nonEmpty, "animation needs frames")
    val vp8x = Array[Byte](0x02, 0, 0, 0) ++
      le24(canvasW - 1) ++ le24(canvasH - 1)
    val anim = le32(0) ++ // background color hint (transparent)
      Array((loopCount & 0xff).toByte, ((loopCount >> 8) & 0xff).toByte)
    val anmfs = frames.map { f =>
      require(f.x % 2 == 0 && f.y % 2 == 0,
        s"frame offsets must be even, got (${f.x},${f.y})")
      require(f.x + f.w <= canvasW && f.y + f.h <= canvasH,
        s"frame rect outside canvas")
      val flags = ((if (f.noBlend) 0x02 else 0) |
        (if (f.disposeBg) 0x01 else 0)).toByte
      val header = le24(f.x / 2) ++ le24(f.y / 2) ++
        le24(f.w - 1) ++ le24(f.h - 1) ++ le24(f.durationMs) ++
        Array(flags)
      chunk("ANMF",
        header ++ chunk("VP8L", encodeVp8lPayload(f.w, f.h, 3, f.rgb)))
    }
    riffWrap(chunk("VP8X", vp8x) ++ chunk("ANIM", anim) ++
      anmfs.reduce(_ ++ _))
  }

  /** Decode to the shared cross-format layout: top-down RGB, alpha
    * dropped (matching how PNG/GIF/JPEG hash in [[Multimodal]]).
    */
  def toDecodedImage(img: WebpImage): JpegCodec.DecodedImage =
    argbToRgbImage(img.width, img.height, img.pixels)

  /** One composited animation frame in the shared RGB layout. */
  def frameToDecodedImage(anim: WebpAnim, idx: Int): JpegCodec.DecodedImage =
    argbToRgbImage(anim.width, anim.height, anim.frames(idx).pixels)

  private def argbToRgbImage(w: Int, h: Int,
      px: Array[Int]): JpegCodec.DecodedImage = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i * 3) = ((p >> 16) & 0xff).toByte
      out(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    JpegCodec.DecodedImage(w, h, 3, out)
  }
}
