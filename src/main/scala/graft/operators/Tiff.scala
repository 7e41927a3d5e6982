package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM baseline-TIFF codec — the scanned-document format a crawl
  * corpus carries (faxes, book scans, archival imagery). Reference
  * semantics: the reference pipeline treats images as opaque payloads
  * (`gobblin-core/.../converter/` has no image codecs); decoding here
  * is the LLM-curation extension, built from the public TIFF 6.0
  * specification and ITU-T T.4/T.6, interop-pinned against the
  * system libtiff (tools/tiff_probe.py fixtures, TiffSpec).
  *
  * Decoder coverage: classic TIFF (II + MM byte orders), strips AND
  * tiles, compressions 1 (none), 2 (CCITT modified-Huffman RLE),
  * 3 (Group 3 1D/2D), 4 (Group 4), 5 (LZW with the TIFF early-change
  * rule), 8/32946 (Deflate), 32773 (PackBits); predictor 2;
  * photometrics WhiteIsZero / BlackIsZero / RGB / Palette; 1- and
  * 8-bit samples, gray / RGB / RGBA (ExtraSamples); FillOrder 2;
  * multi-page IFD chains; EXIF Orientation (tag 274). Unsupported
  * shapes (planar config 2, 16-bit, JPEG-in-TIFF) are rejected loudly
  * with id-tagged errors — never silently mis-decoded.
  *
  * Encoder (for fixture synthesis and TIFF-as-sink): gray/RGB, none /
  * LZW / Deflate / PackBits, optional predictor, either byte order,
  * strip layout.
  */
object TiffCodec {
  import TiffTables._

  final case class TiffMeta(
      width: Int, height: Int, bits: Int, samples: Int,
      compression: Int, photometric: Int, nPages: Int, orientation: Int)

  def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  // ------------------------------------------------------------------
  // low-level endian-aware reads
  // ------------------------------------------------------------------
  private final class Rd(val b: Array[Byte], val le: Boolean, id: Long) {
    def u8(o: Int): Int = {
      require(o >= 0 && o < b.length, s"media $id: TIFF read past end ($o/${b.length})")
      b(o) & 0xff
    }
    def u16(o: Int): Int =
      if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (le) (u16(o).toLong | (u16(o + 2).toLong << 16))
      else ((u16(o).toLong << 16) | u16(o + 2).toLong)
  }

  /** One parsed IFD: tag -> numeric values (BYTE/SHORT/LONG widened). */
  private final case class Ifd(tags: Map[Int, Array[Long]], next: Long)

  private def parseIfd(r: Rd, off: Long, id: Long): Ifd = {
    val o = off.toInt
    require(o >= 0 && o + 2 <= r.b.length, s"media $id: TIFF IFD offset $off out of range")
    val n = r.u16(o)
    require(n > 0 && n < 4096, s"media $id: implausible TIFF IFD entry count $n")
    val m = Map.newBuilder[Int, Array[Long]]
    var i = 0
    while (i < n) {
      val eo = o + 2 + i * 12
      val tag = r.u16(eo)
      val typ = r.u16(eo + 2)
      val cnt = r.u32(eo + 4)
      val unit = typ match {
        case 1 | 2 | 6 | 7 => 1 // BYTE / ASCII / SBYTE / UNDEFINED
        case 3 | 8 => 2         // SHORT / SSHORT
        case 4 | 9 => 4         // LONG / SLONG
        case 5 | 10 => 8        // RATIONAL
        case _ => 0             // unknown type: skip entry
      }
      if (unit > 0 && cnt < Int.MaxValue / 8) {
        val total = unit * cnt
        val vo = if (total <= 4) eo + 8 else {
          val ext = r.u32(eo + 8)
          require(ext + total <= r.b.length,
            s"media $id: TIFF tag $tag values out of range")
          ext.toInt
        }
        // widen everything numeric to Long; rationals read numerator
        val vals = new Array[Long](cnt.toInt)
        var k = 0
        while (k < cnt) {
          vals(k) = unit match {
            case 1 => r.u8(vo + k).toLong
            case 2 => r.u16(vo + k * 2).toLong
            case 4 => r.u32(vo + k * 4)
            case 8 => r.u32(vo + k * 8)
          }
          k += 1
        }
        m += tag -> vals
      }
      i += 1
    }
    Ifd(m.result(), r.u32(o + 2 + n * 12))
  }

  private def reader(id: Long, b: Array[Byte]): Rd = {
    require(isTiff(b), s"media $id: not a TIFF (bad magic)")
    new Rd(b, b(0) == 'I', id)
  }

  private def ifdChain(id: Long, b: Array[Byte]): Vector[Ifd] = {
    val r = reader(id, b)
    var off = r.u32(4)
    val out = Vector.newBuilder[Ifd]
    var seen = Set.empty[Long]
    var n = 0
    while (off != 0) {
      require(!seen(off), s"media $id: TIFF IFD cycle at offset $off")
      require(n < 4096, s"media $id: TIFF IFD chain too long")
      seen += off
      val ifd = parseIfd(r, off, id)
      out += ifd
      off = ifd.next
      n += 1
    }
    val v = out.result()
    require(v.nonEmpty, s"media $id: TIFF has no IFD")
    v
  }

  def nPages(id: Long, b: Array[Byte]): Int = ifdChain(id, b).length

  def meta(id: Long, b: Array[Byte]): TiffMeta = {
    val chain = ifdChain(id, b)
    val t = chain.head.tags
    def one(tag: Int, dflt: Long): Long = t.get(tag).map(_.head).getOrElse(dflt)
    TiffMeta(
      width = one(256, -1).toInt, height = one(257, -1).toInt,
      bits = one(258, 1).toInt,
      samples = one(277, 1).toInt,
      compression = one(259, 1).toInt,
      photometric = one(262, -1).toInt,
      nPages = chain.length,
      orientation = one(274, 1).toInt)
  }

  /** EXIF/TIFF Orientation of page 0 (tag 274, 1-8; 1 = upright). */
  def exifOrientation(id: Long, b: Array[Byte]): Int = {
    val o = meta(id, b).orientation
    if (o >= 1 && o <= 8) o else 1
  }

  def decode(id: Long, b: Array[Byte]): JpegCodec.DecodedImage =
    decodePage(id, b, 0)

  // ------------------------------------------------------------------
  // page decode
  // ------------------------------------------------------------------
  def decodePage(id: Long, b: Array[Byte], page: Int): JpegCodec.DecodedImage = {
    val chain = ifdChain(id, b)
    require(page >= 0 && page < chain.length,
      s"media $id: TIFF page $page out of range (${chain.length} pages)")
    val r = reader(id, b)
    val t = chain(page).tags
    def one(tag: Int, dflt: Long): Long = t.get(tag).map(_.head).getOrElse(dflt)
    def arr(tag: Int): Array[Long] = t.getOrElse(tag, Array.emptyLongArray)

    val w = one(256, -1).toInt
    val h = one(257, -1).toInt
    require(w > 0 && h > 0, s"media $id: TIFF missing/invalid dimensions ($w x $h)")
    require(w.toLong * h <= 64L * 1024 * 1024,
      s"media $id: TIFF $w x $h exceeds the 64 MP guard")
    val samples = one(277, 1).toInt
    val bitsArr = arr(258)
    val bits = if (bitsArr.isEmpty) 1 else bitsArr.head.toInt
    require(bitsArr.forall(_ == bits),
      s"media $id: TIFF heterogeneous BitsPerSample unsupported")
    val comp = one(259, 1).toInt
    val photo = one(262, -1).toInt
    val planar = one(284, 1).toInt
    val predictor = one(317, 1).toInt
    val fillOrder = one(266, 1).toInt

    require(planar == 1, s"media $id: TIFF planar configuration $planar unsupported (chunky only)")
    require(bits == 1 || bits == 8, s"media $id: TIFF $bits-bit samples unsupported (1/8 only)")
    require(predictor == 1 || predictor == 2,
      s"media $id: TIFF predictor $predictor unsupported")
    if (bits == 1) require(samples == 1, s"media $id: TIFF 1-bit with $samples samples unsupported")
    require(photo >= 0 && photo <= 3,
      s"media $id: TIFF photometric $photo unsupported (bilevel/gray/RGB/palette only)")
    val isFax = comp == 2 || comp == 3 || comp == 4
    if (isFax) require(bits == 1, s"media $id: TIFF CCITT compression requires 1-bit samples")

    val stride = (w * samples * bits + 7) / 8
    val raw = new Array[Byte](stride * h)

    def unfilterRows(buf: Array[Byte], rowBytes: Int, rows: Int): Unit =
      if (predictor == 2 && bits == 8) {
        var y = 0
        while (y < rows) {
          var i = samples
          while (i < rowBytes) {
            buf(y * rowBytes + i) = (buf(y * rowBytes + i) + buf(y * rowBytes + i - samples)).toByte
            i += 1
          }
          y += 1
        }
      }

    def maybeReverse(seg: Array[Byte]): Array[Byte] =
      if (fillOrder == 2) seg.map(x => reverseByte(x)) else seg

    def decompress(seg0: Array[Byte], expect: Int, rows: Int, rowBytes: Int): Array[Byte] = {
      val seg = maybeReverse(seg0)
      val out = comp match {
        case 1 =>
          require(seg.length >= expect,
            s"media $id: TIFF uncompressed segment short (${seg.length}/$expect)")
          java.util.Arrays.copyOf(seg, expect)
        case 5 => lzwDecode(id, seg, expect)
        case 8 | 32946 => inflate(id, seg, expect)
        case 32773 => packBitsDecode(id, seg, expect)
        case 2 | 3 | 4 => faxDecode(id, seg, w, rows, comp,
          one(292, 0), rowBytes)
        case other => throw new IllegalArgumentException(
          s"media $id: TIFF compression $other unsupported")
      }
      unfilterRows(out, rowBytes, rows)
      out
    }

    if (t.contains(322)) {
      // --- tiled layout ---
      val tw = one(322, -1).toInt
      val th = one(323, -1).toInt
      require(tw > 0 && th > 0, s"media $id: TIFF invalid tile size $tw x $th")
      // TIFF 6.0 requires tile dims to be multiples of 16, which also
      // keeps 1-bit tile rows byte-aligned at every tile column
      require(tw % 16 == 0 && th % 16 == 0,
        s"media $id: TIFF tile size $tw x $th not a multiple of 16")
      val offs = arr(324)
      val cnts = arr(325)
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      require(offs.length >= across * down && cnts.length >= across * down,
        s"media $id: TIFF tile tables short (${offs.length} offsets for ${across * down} tiles)")
      val tileRowBytes = (tw * samples * bits + 7) / 8
      var ti = 0
      var ty = 0
      while (ty < down) {
        var tx = 0
        while (tx < across) {
          val o = offs(ti).toInt
          val c = cnts(ti).toInt
          require(o >= 0 && c >= 0 && o + c <= b.length,
            s"media $id: TIFF tile $ti segment out of range")
          val seg = java.util.Arrays.copyOfRange(b, o, o + c)
          val tile = decompress(seg, tileRowBytes * th, th, tileRowBytes)
          // clip-copy into the page buffer (right/bottom edge tiles
          // overhang; the overhang bytes are padding and are dropped)
          val copyRows = math.min(th, h - ty * th)
          val copyBytes = math.min(tileRowBytes, stride - tx * tileRowBytes)
          var yy = 0
          while (yy < copyRows) {
            System.arraycopy(tile, yy * tileRowBytes,
              raw, (ty * th + yy) * stride + tx * tileRowBytes,
              math.max(0, copyBytes))
            yy += 1
          }
          ti += 1
          tx += 1
        }
        ty += 1
      }
    } else {
      // --- strip layout ---
      val offs = arr(273)
      val cnts = arr(279)
      require(offs.nonEmpty, s"media $id: TIFF missing StripOffsets")
      val rps0 = one(278, 0xffffffffL)
      val rps = math.min(rps0, h.toLong).toInt
      require(rps > 0, s"media $id: TIFF invalid RowsPerStrip $rps0")
      val nStrips = (h + rps - 1) / rps
      require(offs.length >= nStrips,
        s"media $id: TIFF strip tables short (${offs.length} offsets for $nStrips strips)")
      var s = 0
      while (s < nStrips) {
        val rows = math.min(rps, h - s * rps)
        val o = offs(s).toInt
        val c = if (cnts.length > s) cnts(s).toInt else b.length - o
        require(o >= 0 && c >= 0 && o + c <= b.length,
          s"media $id: TIFF strip $s segment out of range")
        val seg = java.util.Arrays.copyOfRange(b, o, o + c)
        val strip = decompress(seg, stride * rows, rows, stride)
        System.arraycopy(strip, 0, raw, s * rps * stride, stride * rows)
        s += 1
      }
    }

    // ---- raw scanlines -> DecodedImage ----
    photo match {
      case 0 | 1 if bits == 1 =>
        val out = new Array[Byte](w * h)
        val one_ = if (photo == 0) 0 else 255 // MinIsWhite: 1-bit = black
        val zero_ = if (photo == 0) 255 else 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bit = (raw(y * stride + (x >> 3)) >> (7 - (x & 7))) & 1
            out(y * w + x) = (if (bit == 1) one_ else zero_).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.DecodedImage(w, h, 1, out)
      case 0 => // 8-bit WhiteIsZero: invert to intensity
        require(samples == 1, s"media $id: TIFF WhiteIsZero with $samples samples unsupported")
        val out = new Array[Byte](w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(i) = (255 - (raw(y * stride + x) & 0xff)).toByte
            i += 1; x += 1
          }
          y += 1
        }
        JpegCodec.DecodedImage(w, h, 1, out)
      case 1 =>
        require(samples == 1 || samples == 2,
          s"media $id: TIFF gray with $samples samples unsupported")
        if (samples == 1 && stride == w)
          JpegCodec.DecodedImage(w, h, 1, raw)
        else {
          val out = new Array[Byte](w * h * samples)
          var y = 0
          while (y < h) {
            System.arraycopy(raw, y * stride, out, y * w * samples, w * samples)
            y += 1
          }
          JpegCodec.DecodedImage(w, h, samples, out)
        }
      case 2 =>
        require(samples == 3 || samples == 4,
          s"media $id: TIFF RGB with $samples samples unsupported")
        if (stride == w * samples)
          JpegCodec.DecodedImage(w, h, samples, raw)
        else {
          val out = new Array[Byte](w * h * samples)
          var y = 0
          while (y < h) {
            System.arraycopy(raw, y * stride, out, y * w * samples, w * samples)
            y += 1
          }
          JpegCodec.DecodedImage(w, h, samples, out)
        }
      case 3 =>
        require(samples == 1, s"media $id: TIFF palette with $samples samples unsupported")
        val cmap = arr(320)
        val n = 1 << bits
        require(cmap.length >= 3 * n,
          s"media $id: TIFF ColorMap short (${cmap.length} for $n entries)")
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val idx = raw(y * stride + x) & 0xff
            val p = (y * w + x) * 3
            // ColorMap entries are 16-bit; high byte is the 8-bit value
            out(p) = (cmap(idx) >> 8).toByte
            out(p + 1) = (cmap(n + idx) >> 8).toByte
            out(p + 2) = (cmap(2 * n + idx) >> 8).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.DecodedImage(w, h, 3, out)
    }
  }

  private def reverseByte(x: Byte): Byte = {
    var v = x & 0xff
    v = ((v & 0x55) << 1) | ((v & 0xaa) >> 1)
    v = ((v & 0x33) << 2) | ((v & 0xcc) >> 2)
    v = ((v & 0x0f) << 4) | ((v & 0xf0) >> 4)
    v.toByte
  }

  // ------------------------------------------------------------------
  // segment codecs
  // ------------------------------------------------------------------
  private def inflate(id: Long, seg: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(seg)
    val out = new Array[Byte](expect)
    var got = 0
    try {
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(out, got, expect - got)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException(s"media $id: TIFF deflate stream truncated")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"media $id: corrupt TIFF deflate segment: ${e.getMessage}")
    } finally inf.end()
    require(got == expect, s"media $id: TIFF deflate segment short ($got/$expect)")
    out
  }

  private def packBitsDecode(id: Long, seg: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (o < expect) {
      require(i < seg.length, s"media $id: TIFF PackBits segment truncated")
      val n = seg(i)
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        require(i + cnt <= seg.length && o + cnt <= expect,
          s"media $id: TIFF PackBits literal overruns")
        System.arraycopy(seg, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        require(i < seg.length && o + cnt <= expect,
          s"media $id: TIFF PackBits repeat overruns")
        java.util.Arrays.fill(out, o, o + cnt, seg(i))
        i += 1; o += cnt
      }
    }
    out
  }

  /** TIFF-variant LZW: MSB-first codes, 9->12 bit widths with the
    * "early change" (width bumps when the NEXT code would not fit one
    * code earlier than classic LZW), Clear=256, EOI=257.
    */
  private def lzwDecode(id: Long, seg: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var o = 0
    var bitPos = 0
    val totalBits = seg.length * 8
    def read(width: Int): Int = {
      require(bitPos + width <= totalBits, s"media $id: TIFF LZW stream truncated")
      var v = 0
      var k = 0
      while (k < width) {
        v = (v << 1) | ((seg(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    val Clear = 256
    val Eoi = 257
    // dictionary as prefix/append arrays
    val maxCodes = 4096
    val prefix = new Array[Int](maxCodes)
    val append = new Array[Byte](maxCodes)
    val lenOf = new Array[Int](maxCodes)
    var next = 258
    var width = 9
    var prev = -1
    def emit(code: Int): Byte = {
      // write the string for `code` at out[o..]; returns first byte
      val l = if (code < 256) 1 else lenOf(code)
      require(o + l <= expect, s"media $id: TIFF LZW output overruns ($o+$l/$expect)")
      var c = code
      var p = o + l - 1
      while (c >= 256) {
        out(p) = append(c); p -= 1; c = prefix(c)
      }
      out(p) = c.toByte
      o += l
      out(p)
    }
    var done = false
    while (!done && o < expect) {
      val code = read(width)
      if (code == Eoi) done = true
      else if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else {
        require(code < next || (code == next && prev >= 0),
          s"media $id: TIFF LZW code $code out of range (next=$next)")
        if (prev < 0) {
          require(code < 256, s"media $id: TIFF LZW first code after clear not a literal")
          emit(code)
          prev = code
        } else {
          val first: Byte =
            if (code < next) {
              val f = emit(code)
              f
            } else {
              // KwKwK case: string = prev's string + its first byte
              val l = if (prev < 256) 1 else lenOf(prev)
              require(o + l + 1 <= expect, s"media $id: TIFF LZW output overruns")
              val start = o
              emit(prev)
              out(o) = out(start)
              o += 1
              out(start)
            }
          if (next < maxCodes) {
            prefix(next) = prev
            append(next) = first
            lenOf(next) = (if (prev < 256) 1 else lenOf(prev)) + 1
            next += 1
          }
          prev = code
          // TIFF early change: bump when the next code to be written
          // is one short of the current width's capacity
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
      }
    }
    require(o == expect, s"media $id: TIFF LZW segment short ($o/$expect)")
    out
  }

  // ------------------------------------------------------------------
  // CCITT fax decode (compressions 2, 3, 4)
  // ------------------------------------------------------------------
  private final class BitRd(seg: Array[Byte], id: Long) {
    var pos = 0
    val total: Int = seg.length * 8
    def bit(): Int = {
      require(pos < total, s"media $id: TIFF fax stream truncated")
      val v = (seg(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def peekZeros(max: Int): Int = {
      var n = 0
      var p = pos
      while (n < max && p < total && ((seg(p >> 3) >> (7 - (p & 7))) & 1) == 0) {
        n += 1; p += 1
      }
      n
    }
    def alignByte(): Unit = { pos = (pos + 7) & ~7 }
    def exhausted: Boolean = pos >= total
  }

  /** Read one modified-Huffman run (make-ups accumulated until a
    * terminating code). `white` selects the colour table.
    */
  private def mhRun(r: BitRd, white: Boolean, id: Long): Int = {
    var run = 0
    var terminating = false
    val lut = if (white) WhiteLut else BlackLut
    while (!terminating) {
      var len = 0
      var code = 0
      var found = -1
      while (found < 0) {
        require(len < 14, s"media $id: TIFF fax code not found (${if (white) "white" else "black"}, bits=$code/$len)")
        code = (code << 1) | r.bit()
        len += 1
        lut.get((len, code)) match {
          case Some(rl) => found = rl
          case None =>
        }
      }
      run += found
      terminating = found < 64
    }
    run
  }

  /** Decode a fax-compressed segment to packed 1-bit rows (MSB-first,
    * 0 = first-run colour = "white"). comp: 2 = MH-RLE (byte-aligned
    * rows), 3 = G3 (EOL-framed, 1D or 2D per T4Options bit 0),
    * 4 = G4 (pure 2D).
    */
  private def faxDecode(id: Long, seg: Array[Byte], w: Int, rows: Int,
      comp: Int, t4opts: Long, rowBytes: Int): Array[Byte] = {
    val r = new BitRd(seg, id)
    val out = new Array[Byte](rowBytes * rows)
    // reference line as changing-element positions; starts all-white
    var ref = Array[Int](w, w)
    val cur = new Array[Int](w + 2)

    def setRun(row: Int, from: Int, until: Int): Unit = {
      var x = math.max(0, from)
      val end = math.min(w, until)
      while (x < end) {
        out(row * rowBytes + (x >> 3)) = (out(row * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
        x += 1
      }
    }

    def decode1d(row: Int): Unit = {
      var x = 0
      var white = true
      var n = 0
      while (x < w) {
        val run = mhRun(r, white, id)
        require(x + run <= w, s"media $id: TIFF fax row overruns ($x+$run > $w)")
        if (!white) setRun(row, x, x + run)
        x += run
        if (n < w) { cur(n) = x }
        n += 1
        white = !white
      }
      require(x == w, s"media $id: TIFF fax row short ($x/$w)")
      // build transition list for 2D reference (not needed for 1D-only
      // but harmless): cur(0..n-1) then sentinel w,w
      var i = math.min(n, w)
      // drop trailing transition at exactly w duplicates — keep as-is;
      // pad sentinels
      cur(i) = w; cur(i + 1) = w
      ref = java.util.Arrays.copyOf(cur, i + 2)
    }

    def decode2d(row: Int): Unit = {
      // a0 = -1 imaginary white; transitions of current row into cur
      var a0 = -1
      var white = true
      var n = 0
      def b1(): Int = {
        // first changing element in ref > a0 with colour opposite a0's
        // colour: transitions alternate white->black (even index),
        // black->white (odd). We need a transition TO !white... i.e.
        // to the opposite of the current colour: index parity == (white ? 0 : 1)
        var i = if (white) 0 else 1
        while (i < ref.length && ref(i) <= a0) i += 2
        if (i < ref.length) ref(i) else w
      }
      while (a0 < w) {
        // classify mode code
        val zeros = r.peekZeros(14)
        if (zeros >= 11) {
          // EOL inside G4 = EOFB; stop row loudly only if row empty
          throw new IllegalArgumentException(
            s"media $id: TIFF fax unexpected EOL inside 2D row $row")
        }
        val m1 = r.bit()
        if (m1 == 1) { // V0
          val b = b1()
          val a1 = b
          if (!white) setRun(row, math.max(a0, 0), a1)
          cur(n) = a1; n += 1
          a0 = a1; white = !white
        } else {
          val m2 = r.bit()
          val m3 = r.bit()
          (m2, m3) match {
            case (1, 1) => // 011 VR1
              val a1 = b1() + 1
              require(a1 <= w, s"media $id: TIFF fax VR1 overruns")
              if (!white) setRun(row, math.max(a0, 0), a1)
              cur(n) = a1; n += 1; a0 = a1; white = !white
            case (1, 0) => // 010 VL1
              val a1 = b1() - 1
              require(a1 >= 0, s"media $id: TIFF fax VL1 underruns")
              if (!white) setRun(row, math.max(a0, 0), a1)
              cur(n) = a1; n += 1; a0 = a1; white = !white
            case (0, 1) => // 001 horizontal: two MH runs
              val s = math.max(a0, 0)
              val r1 = mhRun(r, white, id)
              val r2 = mhRun(r, !white, id)
              val a1 = s + r1
              val a2 = a1 + r2
              require(a2 <= w, s"media $id: TIFF fax H overruns ($a1,$a2 > $w)")
              if (!white) setRun(row, s, a1) else setRun(row, a1, a2)
              cur(n) = a1; cur(n + 1) = a2; n += 2
              a0 = a2 // colour unchanged
            case (0, 0) =>
              val m4 = r.bit()
              if (m4 == 1) { // 0001 pass
                // skip past b2, colour unchanged, no transition
                var i = if (white) 0 else 1
                while (i < ref.length && ref(i) <= a0) i += 2
                val bb1 = if (i < ref.length) ref(i) else w
                val bb2 = if (i + 1 < ref.length) ref(i + 1) else w
                val _ = bb1
                if (!white) setRun(row, math.max(a0, 0), bb2)
                a0 = bb2
              } else {
                val m5 = r.bit()
                val m6 = r.bit()
                (m5, m6) match {
                  case (1, 1) => // 000011 VR2
                    val a1 = b1() + 2
                    require(a1 <= w, s"media $id: TIFF fax VR2 overruns")
                    if (!white) setRun(row, math.max(a0, 0), a1)
                    cur(n) = a1; n += 1; a0 = a1; white = !white
                  case (1, 0) => // 000010 VL2
                    val a1 = b1() - 2
                    require(a1 >= 0, s"media $id: TIFF fax VL2 underruns")
                    if (!white) setRun(row, math.max(a0, 0), a1)
                    cur(n) = a1; n += 1; a0 = a1; white = !white
                  case (0, 1) => // 0000011 VR3
                    require(r.bit() == 1, s"media $id: TIFF fax bad VR3 code")
                    val a1 = b1() + 3
                    require(a1 <= w, s"media $id: TIFF fax VR3 overruns")
                    if (!white) setRun(row, math.max(a0, 0), a1)
                    cur(n) = a1; n += 1; a0 = a1; white = !white
                  case (0, 0) => // 0000010 VL3 (needs trailing 1)
                    require(r.bit() == 1, s"media $id: TIFF fax bad 2D mode code")
                    val a1 = b1() - 3
                    require(a1 >= 0, s"media $id: TIFF fax VL3 underruns")
                    if (!white) setRun(row, math.max(a0, 0), a1)
                    cur(n) = a1; n += 1; a0 = a1; white = !white
                }
              }
          }
        }
      }
      require(a0 == w, s"media $id: TIFF fax 2D row overruns ($a0 > $w)")
      cur(n) = w; cur(n + 1) = w
      ref = java.util.Arrays.copyOf(cur, n + 2)
    }

    def consumeEolIfPresent(): Boolean = {
      // G3 rows are EOL-framed: fill 0s then 000000000001
      val zeros = r.peekZeros(64)
      if (zeros >= 11 && r.pos + zeros < r.total) {
        var k = 0
        while (k < zeros) { r.bit(); k += 1 }
        require(r.bit() == 1, s"media $id: TIFF fax EOL sync lost")
        true
      } else false
    }

    var row = 0
    while (row < rows) {
      comp match {
        case 2 => // MH-RLE: byte-aligned 1D rows
          r.alignByte()
          decode1d(row)
        case 3 =>
          consumeEolIfPresent()
          if ((t4opts & 1) != 0) {
            // 2D-capable: 1 tag bit after EOL; 1 = 1D, 0 = 2D
            val tag = r.bit()
            if (tag == 1) decode1d(row) else decode2d(row)
          } else decode1d(row)
        case 4 =>
          decode2d(row)
      }
      row += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // encoder
  // ------------------------------------------------------------------
  /** Encode 8-bit gray (channels=1) or RGB (channels=3) pixels as a
    * classic TIFF. compression: 1 none, 5 LZW, 8 Deflate, 32773
    * PackBits. Strip layout; optional horizontal predictor (LZW /
    * Deflate only); either byte order.
    */
  def encode(w: Int, h: Int, channels: Int, px: Array[Byte],
      compression: Int = 5, predictor: Boolean = false,
      bigEndian: Boolean = false, rowsPerStrip: Int = 16): Array[Byte] = {
    require(channels == 1 || channels == 3, s"TIFF encode supports 1/3 channels, got $channels")
    require(px.length == w * h * channels, s"TIFF encode pixel buffer ${px.length} != $w*$h*$channels")
    require(!predictor || compression == 5 || compression == 8,
      "TIFF predictor only valid with LZW/Deflate")
    val stride = w * channels
    val rps = math.max(1, math.min(rowsPerStrip, h))
    val nStrips = (h + rps - 1) / rps

    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val seg = new Array[Byte](rows * stride)
      System.arraycopy(px, s * rps * stride, seg, 0, rows * stride)
      if (predictor) {
        var y = rows - 1
        while (y >= 0) {
          var i = stride - 1
          while (i >= channels) {
            seg(y * stride + i) = (seg(y * stride + i) - seg(y * stride + i - channels)).toByte
            i -= 1
          }
          y = y - 1
        }
      }
      compression match {
        case 1 => seg
        case 5 => lzwEncode(seg)
        case 8 => deflate(seg)
        case 32773 => packBitsEncode(seg, stride)
        case other => throw new IllegalArgumentException(s"TIFF encode compression $other unsupported")
      }
    }

    writeTiff(Seq(PageSpec(w, h, channels, 8,
      photometric = if (channels == 1) 1 else 2,
      compression = compression, predictor = if (predictor) 2 else 1,
      rps = rps, strips = strips, colorMap = null)), bigEndian)
  }

  /** Encode a MULTI-PAGE gray TIFF (one IFD per page, chained) — the
    * scanned-document container shape.
    */
  def encodeGrayPages(w: Int, h: Int, pages: Seq[Array[Byte]],
      compression: Int = 5, predictor: Boolean = false,
      bigEndian: Boolean = false, rowsPerStrip: Int = 16): Array[Byte] = {
    require(pages.nonEmpty, "TIFF encode needs at least one page")
    val rps = math.max(1, math.min(rowsPerStrip, h))
    val specs = pages.map { px =>
      require(px.length == w * h, s"TIFF page buffer ${px.length} != $w*$h")
      val nStrips = (h + rps - 1) / rps
      val strips = (0 until nStrips).map { s =>
        val rows = math.min(rps, h - s * rps)
        val seg = new Array[Byte](rows * w)
        System.arraycopy(px, s * rps * w, seg, 0, rows * w)
        if (predictor) {
          var y = rows - 1
          while (y >= 0) {
            var i = w - 1
            while (i >= 1) {
              seg(y * w + i) = (seg(y * w + i) - seg(y * w + i - 1)).toByte
              i -= 1
            }
            y -= 1
          }
        }
        compression match {
          case 1 => seg
          case 5 => lzwEncode(seg)
          case 8 => deflate(seg)
          case 32773 => packBitsEncode(seg, w)
          case other => throw new IllegalArgumentException(
            s"TIFF encode compression $other unsupported")
        }
      }
      PageSpec(w, h, 1, 8, photometric = 1, compression = compression,
        predictor = if (predictor) 2 else 1, rps = rps, strips = strips,
        colorMap = null)
    }
    writeTiff(specs, bigEndian)
  }

  /** Encode an 8-bit palette TIFF (photometric 3) — indices + a
    * 256-entry RGB palette of 8-bit values (widened to 16-bit
    * ColorMap words as v*257, the TIFF convention).
    */
  def encodePalette(w: Int, h: Int, idx: Array[Byte], palette: Array[Byte],
      compression: Int = 1, bigEndian: Boolean = false): Array[Byte] = {
    require(idx.length == w * h, s"TIFF palette index buffer ${idx.length} != $w*$h")
    require(palette.length == 768, s"TIFF palette must be 256*3 bytes, got ${palette.length}")
    val rps = h
    val seg = compression match {
      case 1 => idx
      case 5 => lzwEncode(idx)
      case 8 => deflate(idx)
      case 32773 => packBitsEncode(idx, w)
      case other => throw new IllegalArgumentException(s"TIFF encode compression $other unsupported")
    }
    writeTiff(Seq(PageSpec(w, h, 1, 8, photometric = 3,
      compression = compression, predictor = 1, rps = rps,
      strips = Seq(seg), colorMap = palette)), bigEndian)
  }

  /** Encode a bilevel (1-bit) TIFF, uncompressed, MinIsBlack
    * (photometric 1): bit 1 = white(255). `bits(x,y)` true = white.
    */
  def encodeBilevel(w: Int, h: Int, bit: (Int, Int) => Boolean,
      bigEndian: Boolean = false): Array[Byte] = {
    val stride = (w + 7) / 8
    val seg = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (bit(x, y)) seg(y * stride + (x >> 3)) =
          (seg(y * stride + (x >> 3)) | (0x80 >> (x & 7))).toByte
        x += 1
      }
      y += 1
    }
    writeTiff(Seq(PageSpec(w, h, 1, 1, photometric = 1, compression = 1,
      predictor = 1, rps = h, strips = Seq(seg), colorMap = null)),
      bigEndian)
  }

  private final case class PageSpec(w: Int, h: Int, samples: Int, bits: Int,
      photometric: Int, compression: Int, predictor: Int, rps: Int,
      strips: Seq[Array[Byte]], colorMap: Array[Byte])

  private final case class Entry(tag: Int, typ: Int, cnt: Int,
      inline: Option[Long], ext: Option[Array[Long]])

  /** Emit a classic TIFF with one chained IFD per page. Layout per
    * page: [strip data][pad][IFD][external values]; the IFD's next
    * pointer targets the following page's IFD position.
    */
  private def writeTiff(pages: Seq[PageSpec], bigEndian: Boolean): Array[Byte] = {
    // first pass: entry lists with strip offsets as placeholders, so
    // sizes (and therefore every offset) are known before emission
    def entriesOf(p: PageSpec, stripOffs: Seq[Long]): Seq[Entry] = {
      val entries = ArrayBuffer.empty[Entry]
      def shortE(tag: Int, v: Int): Unit =
        entries += Entry(tag, 3, 1, Some(v.toLong), None)
      def longE(tag: Int, v: Long): Unit =
        entries += Entry(tag, 4, 1, Some(v), None)
      def longsE(tag: Int, vs: Seq[Long]): Unit =
        if (vs.length == 1) longE(tag, vs.head)
        else entries += Entry(tag, 4, vs.length, None, Some(vs.toArray))
      def shortsE(tag: Int, vs: Seq[Int]): Unit =
        if (vs.length == 1) shortE(tag, vs.head)
        else entries += Entry(tag, 3, vs.length, None, Some(vs.map(_.toLong).toArray))
      longE(256, p.w.toLong)
      longE(257, p.h.toLong)
      shortsE(258, Seq.fill(p.samples)(p.bits))
      shortE(259, p.compression)
      shortE(262, p.photometric)
      longsE(273, stripOffs)
      shortE(277, p.samples)
      longE(278, p.rps.toLong)
      longsE(279, p.strips.map(_.length.toLong))
      shortE(284, 1)
      if (p.predictor != 1) shortE(317, p.predictor)
      if (p.colorMap != null)
        shortsE(320, (0 until 3).flatMap(c =>
          (0 until 256).map(i => (p.colorMap(i * 3 + c) & 0xff) * 257)))
      entries.sortBy(_.tag).toSeq
    }
    def extSize(es: Seq[Entry]): Long = es.map {
      case Entry(_, 3, _, None, Some(vs)) => 2L * vs.length
      case Entry(_, 4, _, None, Some(vs)) => 4L * vs.length
      case _ => 0L
    }.sum

    // compute page block offsets
    var cur = 8L
    val placed = pages.map { p =>
      val stripsStart = cur
      val stripOffs = p.strips.scanLeft(stripsStart)(_ + _.length).init
      val afterStrips = stripsStart + p.strips.map(_.length.toLong).sum
      val pad = (afterStrips % 2).toInt
      val ifdStart = afterStrips + pad
      val es = entriesOf(p, stripOffs)
      val extStart = ifdStart + 2 + es.length * 12 + 4
      cur = extStart + extSize(es)
      cur += cur % 2 // keep every IFD even-aligned
      (p, stripOffs, pad, ifdStart, es, extStart, cur)
    }

    val bo = new ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { bo.write((v >> 8) & 0xff); bo.write(v & 0xff) }
      else { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      else { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }

    if (bigEndian) { bo.write('M'); bo.write('M'); w16(42) }
    else { bo.write('I'); bo.write('I'); w16(42) }
    w32(placed.head._4) // first IFD

    placed.zipWithIndex.foreach { case ((p, _, pad, ifdStart, es, extStart, blockEnd), pi) =>
      p.strips.foreach(bo.write)
      if (pad == 1) bo.write(0)
      require(bo.size() == ifdStart, s"TIFF writer IFD offset drift (${bo.size()} vs $ifdStart)")
      w16(es.length)
      var extOff = extStart
      val extData = ArrayBuffer.empty[(Int, Array[Long])] // (typ, vals)
      es.foreach { e =>
        w16(e.tag); w16(e.typ); w32(e.cnt.toLong)
        e.inline match {
          case Some(v) =>
            if (e.typ == 3 && e.cnt == 1) { w16(v.toInt); w16(0) }
            else w32(v)
          case None =>
            val vs = e.ext.get
            w32(extOff)
            extData += ((e.typ, vs))
            extOff += (if (e.typ == 3) 2L else 4L) * vs.length
        }
      }
      // next-IFD pointer: the following page's IFD start, or 0
      w32(if (pi + 1 < placed.length) placed(pi + 1)._4 else 0L)
      extData.foreach { case (typ, vs) =>
        if (typ == 3) vs.foreach(v => w16(v.toInt)) else vs.foreach(w32)
      }
      while (bo.size() < blockEnd) bo.write(0) // inter-page alignment
    }
    bo.toByteArray
  }

  private def deflate(seg: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(seg)
    d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def packBitsEncode(seg: Array[Byte], rowBytes: Int): Array[Byte] = {
    // encode each row independently (the convention readers expect)
    val out = new ByteArrayOutputStream()
    var r = 0
    while (r < seg.length) {
      val end = math.min(r + rowBytes, seg.length)
      var i = r
      while (i < end) {
        // find run
        var j = i
        while (j + 1 < end && seg(j + 1) == seg(i) && j - i < 126) j += 1
        if (j > i) { // repeat run of length j-i+1
          out.write(1 - (j - i + 1)) // negative count as signed byte
          out.write(seg(i))
          i = j + 1
        } else {
          // literal run until next repeat of >=3 or 128 bytes
          var k = i
          var lit = 0
          var stop = false
          while (!stop && k < end && lit < 128) {
            if (k + 2 < end && seg(k + 1) == seg(k) && seg(k + 2) == seg(k)) stop = true
            else { k += 1; lit += 1 }
          }
          out.write(lit - 1)
          out.write(seg, i, lit)
          i = k
        }
      }
      r = end
    }
    out.toByteArray
  }

  private def lzwEncode(seg: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nAcc += width
      while (nAcc >= 8) {
        out.write(((acc >> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }
    val Clear = 256
    val Eoi = 257
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    def key(prefix: Int, b: Byte): Long = (prefix.toLong << 8) | (b & 0xff)
    put(Clear)
    var prefix = -1
    var i = 0
    while (i < seg.length) {
      val b = seg(i)
      if (prefix < 0) prefix = b & 0xff
      else {
        val k = key(prefix, b)
        val hit = dict.get(k)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          dict.put(k, Integer.valueOf(next))
          next += 1
          // early change, encoder side: the decoder registers its
          // matching entry one code LATER than we do (it has no entry
          // for the very first post-clear literal), so its
          // next==(1<<width)-1 bump corresponds to next==(1<<width)
          // here
          if (next == (1 << width) && width < 12) width += 1
          if (next == 4094) {
            put(Clear)
            dict.clear()
            next = 258
            width = 9
          }
          prefix = b & 0xff
        }
      }
      i += 1
    }
    if (prefix >= 0) put(prefix)
    put(Eoi)
    if (nAcc > 0) out.write(((acc << (8 - nAcc)) & 0xff).toInt)
    out.toByteArray
  }
}
