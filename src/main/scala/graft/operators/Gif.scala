package graft.operators

/** Pure-JVM GIF codec (GIF87a/89a) — the third leg of the web-image
  * triad (JPEG/PNG/GIF), decoded from scratch: logical-screen +
  * palette parsing, the full variable-width LZW decompressor (3-12
  * bit codes, clear/EOI, deferred-clear streams), 4-pass row
  * interlacing, and ANIMATION compositing with all four disposal
  * methods (unspecified / keep / restore-background /
  * restore-previous) plus per-frame transparency — so every frame of
  * an animated GIF decodes to the composited RGB canvas a viewer
  * shows, the right input for frame-level perceptual hashing. The
  * encoder writes single- or multi-frame GIF89a with a real LZW
  * compressor (dictionary growth + clear-on-full), giving round-trip
  * fixtures and a second anchor against ImageIO's independent
  * implementation.
  *
  * Reference seam: like [[PngCodec]]/[[JpegCodec]], the reference
  * copies media as opaque bytes (gobblin-data-management/.../copy/
  * CopySource.java); decode is the curation-pipeline feature step,
  * executed per-partition. Corrupt inputs fail loudly with the media
  * id.
  */
object GifCodec {

  /** One composited frame: RGB bytes, pixel-major, top-down,
    * channel-fastest (length = width*height*3, canvas-sized).
    */
  final case class GifFrame(index: Int, delayCs: Int, pixels: Array[Byte])

  final case class GifImage(width: Int, height: Int, frames: Seq[GifFrame]) {
    def nFrames: Int = frames.length
  }

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  // interlace pass geometry: start row / step per pass
  private val PassStart = Array(0, 4, 2, 1)
  private val PassStep = Array(8, 8, 4, 2)

  def decode(id: Long, bytes: Array[Byte]): GifImage = {
    if (bytes.length < 13) fail(id, s"not a GIF (${bytes.length} bytes)")
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") fail(id, s"bad GIF signature '$sig'")
    val width = u16(bytes, 6)
    val height = u16(bytes, 8)
    if (width <= 0 || height <= 0) fail(id, s"bad dims ${width}x$height")
    if (width.toLong * height * 3 > (1L << 26))
      fail(id, s"canvas ${width}x$height too large to decode")
    val flags = bytes(10) & 0xff
    val bgIndex = bytes(11) & 0xff
    var pos = 13
    var globalPal: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (pos + n * 3 > bytes.length) fail(id, "truncated global color table")
      globalPal = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
      pos += n * 3
    }

    // canvas state (RGB + a "background/transparent" flag per pixel)
    val canvas = new Array[Byte](width * height * 3)
    if (globalPal != null && bgIndex * 3 + 2 < globalPal.length) {
      var p = 0
      while (p < width * height) {
        canvas(p * 3) = globalPal(bgIndex * 3)
        canvas(p * 3 + 1) = globalPal(bgIndex * 3 + 1)
        canvas(p * 3 + 2) = globalPal(bgIndex * 3 + 2)
        p += 1
      }
    }

    val frames = Vector.newBuilder[GifFrame]
    var frameIdx = 0
    var transparentIdx = -1
    var disposal = 0
    var delayCs = 0
    var prevCanvas: Array[Byte] = null
    var done = false
    while (!done) {
      if (pos >= bytes.length) fail(id, "missing GIF trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension
          if (pos + 2 > bytes.length) fail(id, "truncated extension")
          val label = bytes(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control
            if (pos + 6 > bytes.length || (bytes(pos) & 0xff) != 4)
              fail(id, "malformed graphic control extension")
            val gcFlags = bytes(pos + 1) & 0xff
            disposal = (gcFlags >> 2) & 7
            delayCs = u16(bytes, pos + 2)
            transparentIdx = if ((gcFlags & 1) != 0) bytes(pos + 4) & 0xff else -1
            pos += 5
          }
          // skip (remaining) sub-blocks
          var sb = if (pos < bytes.length) bytes(pos) & 0xff else -1
          while (sb > 0) {
            pos += 1 + sb
            sb = if (pos < bytes.length) bytes(pos) & 0xff
              else fail(id, "truncated extension sub-blocks")
          }
          if (sb != 0) fail(id, "truncated extension sub-blocks")
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) fail(id, "truncated image descriptor")
          val left = u16(bytes, pos + 1)
          val top = u16(bytes, pos + 3)
          val fw = u16(bytes, pos + 5)
          val fh = u16(bytes, pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          pos += 10
          if (fw <= 0 || fh <= 0 || left + fw > width || top + fh > height)
            fail(id, s"frame rect ${fw}x$fh@($left,$top) outside ${width}x$height canvas")
          var pal = globalPal
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (pos + n * 3 > bytes.length) fail(id, "truncated local color table")
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
            pos += n * 3
          }
          if (pal == null) fail(id, "frame has no color table")
          val interlaced = (iflags & 0x40) != 0
          if (pos >= bytes.length) fail(id, "missing LZW minimum code size")
          val minCode = bytes(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) fail(id, s"bad LZW min code size $minCode")
          // gather sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var sb = if (pos < bytes.length) bytes(pos) & 0xff
            else fail(id, "truncated image data")
          while (sb > 0) {
            if (pos + 1 + sb > bytes.length) fail(id, "truncated image sub-block")
            data.write(bytes, pos + 1, sb)
            pos += 1 + sb
            sb = if (pos < bytes.length) bytes(pos) & 0xff
              else fail(id, "truncated image data")
          }
          pos += 1
          val indices = lzwDecode(id, data.toByteArray, minCode, fw * fh)

          // disposal 3 needs the pre-frame canvas back afterwards
          prevCanvas = if (disposal == 3) canvas.clone() else prevCanvas
          // paint (interlace remap; transparent pixels leave the canvas)
          var row = 0
          var src = 0
          val rowsOrder: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else {
              val order = new Array[Int](fh)
              var k = 0
              var p = 0
              while (p < 4) {
                var y = PassStart(p)
                while (y < fh) { order(k) = y; k += 1; y += PassStep(p) }
                p += 1
              }
              order
            }
          while (row < fh) {
            val destY = top + rowsOrder(row)
            var x = 0
            while (x < fw) {
              val idx = indices(src) & 0xff
              if (idx != transparentIdx) {
                if (idx * 3 + 2 >= pal.length)
                  fail(id, s"color index $idx outside ${pal.length / 3}-entry table")
                val o = (destY * width + left + x) * 3
                canvas(o) = pal(idx * 3)
                canvas(o + 1) = pal(idx * 3 + 1)
                canvas(o + 2) = pal(idx * 3 + 2)
              }
              src += 1
              x += 1
            }
            row += 1
          }
          frames += GifFrame(frameIdx, delayCs, canvas.clone())
          frameIdx += 1
          // dispose for the NEXT frame
          disposal match {
            case 2 => // restore to background color over the frame rect
              val bg = new Array[Byte](3)
              if (globalPal != null && bgIndex * 3 + 2 < globalPal.length) {
                bg(0) = globalPal(bgIndex * 3)
                bg(1) = globalPal(bgIndex * 3 + 1)
                bg(2) = globalPal(bgIndex * 3 + 2)
              }
              var y = top
              while (y < top + fh) {
                var x = left
                while (x < left + fw) {
                  val o = (y * width + x) * 3
                  canvas(o) = bg(0); canvas(o + 1) = bg(1); canvas(o + 2) = bg(2)
                  x += 1
                }
                y += 1
              }
            case 3 =>
              if (prevCanvas != null)
                System.arraycopy(prevCanvas, 0, canvas, 0, canvas.length)
            case _ => // 0/1: leave in place
          }
          transparentIdx = -1
          disposal = 0
          delayCs = 0
        case other => fail(id, f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) fail(id, "GIF contains no image frames")
    GifImage(width, height, fs)
  }

  /** Variable-width LZW decode producing exactly `expect` color
    * indices. Handles code-width growth to 12 bits, clear codes
    * (including streams that never emit one), and rejects premature
    * EOI / overlong streams loudly.
    */
  private def lzwDecode(id: Long, data: Array[Byte], minCode: Int,
      expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expect)
    var outPos = 0
    // dictionary: prefix link + appended byte (4096 max entries)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    var i = 0
    while (i < clear) {
      suffix(i) = i.toByte
      prefix(i) = -1
      i += 1
    }
    var bitBuf = 0L
    var bitCnt = 0
    var bytePos = 0
    var prevCode = -1
    val stack = new Array[Byte](4097)
    var done = false
    while (!done) {
      while (bitCnt < codeSize && bytePos < data.length) {
        bitBuf |= (data(bytePos) & 0xffL) << bitCnt
        bitCnt += 8
        bytePos += 1
      }
      if (bitCnt < codeSize) {
        if (outPos < expect) fail(id, s"LZW stream truncated at $outPos of $expect pixels")
        done = true
      } else {
        val code = (bitBuf & ((1 << codeSize) - 1)).toInt
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == clear) {
          nextCode = eoi + 1
          codeSize = minCode + 1
          prevCode = -1
        } else if (code == eoi) {
          if (outPos < expect) fail(id, s"premature LZW EOI at $outPos of $expect pixels")
          done = true
        } else if (outPos >= expect) {
          // extra data past the pixel count — tolerate trailing codes
          // (some encoders pad); stop decoding
          done = true
        } else {
          var emit = code
          if (code >= nextCode) {
            // KwKwK case: only valid as prevCode + firstChar(prevCode)
            if (code != nextCode || prevCode < 0)
              fail(id, s"corrupt LZW code $code (dict size $nextCode)")
            emit = prevCode
          }
          var sp = 0
          var c = emit
          while (c >= 0) {
            stack(sp) = suffix(c)
            sp += 1
            c = prefix(c)
          }
          val firstChar = stack(sp - 1)
          // emit reversed (KwKwK appends firstChar once more, below)
          var k = sp - 1
          while (k >= 0 && outPos < expect) {
            out(outPos) = stack(k)
            outPos += 1
            k -= 1
          }
          if (code >= nextCode && outPos < expect) {
            out(outPos) = firstChar
            outPos += 1
          }
          if (prevCode >= 0 && nextCode < 4096) {
            prefix(nextCode) = prevCode
            suffix(nextCode) = firstChar
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prevCode = code
          if (outPos == expect) {
            // consume optional EOI + end; stop either way
            done = true
          }
        }
      }
    }
    if (outPos != expect) fail(id, s"LZW produced $outPos of $expect pixels")
    out
  }

  // --- encoder -------------------------------------------------------

  /** Encode full-canvas frames of color INDICES over one global
    * palette as GIF89a (multi-frame = animated, 10 cs delay,
    * disposal keep). `palette` is RGB triplets (length 3*2^k).
    */
  def encode(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[Array[Byte]], interlaced: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val palSize = palette.length / 3
    require(palSize >= 2 && palSize <= 256 && Integer.bitCount(palSize) == 1 &&
      palette.length % 3 == 0, s"palette must be 3*2^k bytes, got ${palette.length}")
    frames.foreach(f => require(f.length == width * height,
      s"frame has ${f.length} indices for ${width}x$height"))
    val palBits = 31 - Integer.numberOfLeadingZeros(palSize) // log2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | ((palBits - 1) & 7)) // global table present
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette, 0, palette.length)
    frames.foreach { f =>
      // graphic control (needed for animation timing; harmless for 1)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1 << 2) // disposal 1 (keep), no transparency
      le16(10) // delay cs
      out.write(0); out.write(0)
      out.write(0x2c) // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      out.write(if (interlaced) 0x40 else 0)
      val minCode = math.max(2, palBits)
      out.write(minCode)
      val ordered =
        if (!interlaced) f
        else {
          val o = new Array[Byte](f.length)
          var k = 0
          var p = 0
          while (p < 4) {
            var y = PassStart(p)
            while (y < height) {
              System.arraycopy(f, y * width, o, k * width, width)
              k += 1
              y += PassStep(p)
            }
            p += 1
          }
          o
        }
      val z = lzwEncode(ordered, minCode)
      var off = 0
      while (off < z.length) {
        val n = math.min(255, z.length - off)
        out.write(n)
        out.write(z, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** LZW compress with hash-chained dictionary, emitting clear on
    * dictionary overflow (the standard strategy). Exposed to specs
    * that hand-assemble exotic container layouts around real streams.
    */
  private[operators] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: map (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    put(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev << 8) | b
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          put(prev)
          if (nextCode < 4096) {
            dict.put(key, nextCode)
            // width grows when nextCode EXCEEDS the current code space
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          } else {
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** First (or only) frame as the shared image shape for aHash/etc. */
  def toDecodedImage(img: GifImage, frame: Int = 0): JpegCodec.DecodedImage =
    JpegCodec.DecodedImage(img.width, img.height, 3, img.frames(frame).pixels)
}
