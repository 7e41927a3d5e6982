package graft.operators

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec (ISO/IEC 15948 / RFC 2083) — the web corpus'
  * most common lossless image format, decoded from scratch on the
  * JDK's raw DEFLATE primitive: chunk walk with CRC-32 verification,
  * multi-IDAT zlib inflate, all five scanline filters (None/Sub/Up/
  * Average/Paeth), every legal bit-depth/color-type combination
  * (gray 1/2/4/8/16, palette 1/2/4/8 with tRNS, RGB/gray-alpha/RGBA
  * 8/16), and Adam7 interlacing. The encoder writes 8-bit gray/RGB
  * with the standard minimum-sum-of-absolute-differences adaptive
  * per-row filter, so round-trip fixtures exercise the full unfilter
  * matrix, not just filter 0. 16-bit samples reduce to their high
  * byte (the spec's sample-depth rescale for 8-bit consumers).
  *
  * Reference seam: the reference treats binary media as opaque
  * payloads copied by its distcp flows
  * (gobblin-data-management/.../copy/CopySource.java); decode here is
  * the Spark-native feature-extraction step an LLM curation pipeline
  * adds on top, executed per-partition with zero driver involvement
  * (same contract as [[JpegCodec]] / [[Multimodal.BmpCodec]]).
  * Corrupt inputs fail LOUDLY with the media id — a 100-TB crawl has
  * malformed files, and silent skips poison dedup statistics.
  */
object PngCodec {

  /** Decoded image: 8-bit samples, pixel-major, TOP-DOWN,
    * channel-fastest. `channels`: 1 gray, 2 gray+alpha, 3 RGB,
    * 4 RGBA (palette expands to 3, or 4 when a tRNS chunk supplies
    * alpha). `pixels.length == width*height*channels`.
    */
  final case class PngImage(width: Int, height: Int, bitDepth: Int,
      colorType: Int, channels: Int, pixels: Array[Byte])

  private val Signature: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  // Adam7 pass geometry (T.81-independent; PNG spec §8.2)
  private val XStart = Array(0, 4, 0, 2, 0, 1, 0)
  private val YStart = Array(0, 0, 4, 0, 2, 0, 1)
  private val XStep = Array(8, 8, 4, 4, 2, 2, 1)
  private val YStep = Array(8, 8, 8, 4, 4, 2, 2)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  /** Source channels as stored in the file (palette rows carry one
    * index sample per pixel).
    */
  private def srcChannels(ct: Int): Int = ct match {
    case 0 | 3 => 1
    case 4 => 2
    case 2 => 3
    case 6 => 4
  }

  def decode(id: Long, bytes: Array[Byte]): PngImage = {
    if (bytes.length < 8 + 12 + 13 + 12)
      fail(id, s"not a PNG (${bytes.length} bytes)")
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != Signature(i)) fail(id, "bad PNG signature")
      i += 1
    }

    // --- chunk walk (CRC-verified) -----------------------------------
    var pos = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0; var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32()
    while (!sawIend) {
      if (pos + 12 > bytes.length) fail(id, s"truncated chunk header at $pos")
      val dlen = be32(bytes, pos)
      if (dlen > bytes.length - pos - 12)
        fail(id, s"chunk at $pos overruns file: len $dlen of ${bytes.length}")
      val n = dlen.toInt
      val ctype = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != be32(bytes, pos + 8 + n))
        fail(id, s"CRC mismatch in $ctype chunk at $pos")
      val off = pos + 8
      ctype match {
        case "IHDR" =>
          if (sawIhdr) fail(id, "duplicate IHDR")
          if (n != 13) fail(id, s"IHDR length $n != 13")
          sawIhdr = true
          width = be32(bytes, off).toInt
          height = be32(bytes, off + 4).toInt
          bitDepth = bytes(off + 8) & 0xff
          colorType = bytes(off + 9) & 0xff
          val compression = bytes(off + 10) & 0xff
          val filterMethod = bytes(off + 11) & 0xff
          interlace = bytes(off + 12) & 0xff
          if (width <= 0 || height <= 0) fail(id, s"bad dims ${width}x$height")
          if (compression != 0) fail(id, s"unknown compression $compression")
          if (filterMethod != 0) fail(id, s"unknown filter method $filterMethod")
          if (interlace > 1) fail(id, s"unknown interlace method $interlace")
          val okDepth = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)
            case 3 => Set(1, 2, 4, 8)
            case 2 | 4 | 6 => Set(8, 16)
            case _ => fail(id, s"unknown color type $colorType")
          }
          if (!okDepth(bitDepth))
            fail(id, s"illegal bit depth $bitDepth for color type $colorType")
          // decoded-size guard: reject decompression bombs loudly
          // instead of OOMing an executor (64 MiB decoded per image)
          val outCh = if (colorType == 3) (if (trns != null) 4 else 3)
            else srcChannels(colorType)
          if (width.toLong * height * outCh > (1L << 26))
            fail(id, s"image ${width}x$height too large to decode")
        case "PLTE" =>
          if (!sawIhdr) fail(id, "PLTE before IHDR")
          if (n == 0 || n % 3 != 0 || n > 768) fail(id, s"bad PLTE length $n")
          palette = java.util.Arrays.copyOfRange(bytes, off, off + n)
        case "tRNS" =>
          if (!sawIhdr) fail(id, "tRNS before IHDR")
          trns = java.util.Arrays.copyOfRange(bytes, off, off + n)
        case "IDAT" =>
          if (!sawIhdr) fail(id, "IDAT before IHDR")
          idat.write(bytes, off, n)
        case "IEND" =>
          sawIend = true
        case _ => // ancillary (gAMA, pHYs, tEXt, ...) — ignored
      }
      pos += 12 + n
    }
    if (!sawIhdr) fail(id, "missing IHDR")
    if (idat.size() == 0) fail(id, "no IDAT data")
    if (colorType == 3 && palette == null) fail(id, "palette image missing PLTE")

    val srcCh = srcChannels(colorType)
    // tRNS adds an alpha channel: palette (per-index alpha), gray
    // (one transparent level), RGB (one transparent color)
    val outCh = colorType match {
      case 3 => if (trns != null) 4 else 3
      case 0 => if (trns != null) 2 else 1
      case 2 => if (trns != null) 4 else 3
      case ct => srcChannels(ct)
    }
    // the transparent LEVEL for gray/RGB tRNS, at source bit depth
    // (16-bit big-endian fields per spec; -1 = none)
    def trns16(k: Int): Int =
      if (trns != null && trns.length >= 2 * k + 2)
        ((trns(2 * k) & 0xff) << 8) | (trns(2 * k + 1) & 0xff)
      else -1

    // --- expected raw size over passes, then one zlib inflate --------
    val passes: Array[(Int, Int)] =
      if (interlace == 0) Array((width, height))
      else (0 until 7).map { p =>
        (ceilDiv(width - XStart(p), XStep(p)), ceilDiv(height - YStart(p), YStep(p)))
      }.toArray
    var rawLen = 0L
    passes.foreach { case (pw, ph) =>
      if (pw > 0 && ph > 0) rawLen += ph.toLong * (1L + rowBytes(pw, srcCh, bitDepth))
    }
    if (rawLen > (1L << 28)) fail(id, s"filtered stream too large ($rawLen)")
    val raw = inflateExact(id, idat.toByteArray, rawLen.toInt)

    // --- unfilter + sample extraction, pass by pass ------------------
    val out = new Array[Byte](width * height * outCh)
    val bpp = math.max(1, srcCh * bitDepth / 8)
    var rawPos = 0
    var p = 0
    while (p < passes.length) {
      val (pw, ph) = passes(p)
      if (pw > 0 && ph > 0) {
        val rb = rowBytes(pw, srcCh, bitDepth)
        val prior = new Array[Byte](rb) // zero row above the first
        val row = new Array[Byte](rb)
        var y = 0
        while (y < ph) {
          val ft = raw(rawPos) & 0xff
          System.arraycopy(raw, rawPos + 1, row, 0, rb)
          rawPos += 1 + rb
          unfilterRow(id, ft, row, prior, rb, bpp)
          emitRow(bytes = row, pw = pw, destY =
              if (interlace == 0) y else YStart(p) + y * YStep(p),
            destX0 = if (interlace == 0) 0 else XStart(p),
            destXStep = if (interlace == 0) 1 else XStep(p),
            width = width, bitDepth = bitDepth, colorType = colorType,
            srcCh = srcCh, outCh = outCh, palette = palette, trns = trns,
            trnsLevels = Array(trns16(0), trns16(1), trns16(2)),
            out = out, id = id)
          System.arraycopy(row, 0, prior, 0, rb)
          y += 1
        }
      }
      p += 1
    }
    PngImage(width, height, bitDepth, colorType, outCh, out)
  }

  private def ceilDiv(a: Int, b: Int): Int = if (a <= 0) 0 else (a + b - 1) / b

  private def rowBytes(pixels: Int, ch: Int, depth: Int): Int =
    (pixels.toLong * ch * depth / 8 +
      (if ((pixels.toLong * ch * depth) % 8 != 0) 1 else 0)).toInt

  private def inflateExact(id: Long, z: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new Array[Byte](expect)
    var got = 0
    try {
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(out, got, expect - got)
        // n == 0 while unfinished means the stream is truncated (or
        // demands a preset dictionary, which PNG forbids) — never spin
        if (n == 0 && !inf.finished()) fail(id, "truncated IDAT stream")
        got += n
      }
      // a correct stream ends exactly at the filtered-size boundary AND
      // carries its full zlib trailer (a truncated adler32 checksum is
      // corruption even when every filtered byte arrived)
      val probe = new Array[Byte](1)
      while (got == expect && !inf.finished()) {
        if (inf.inflate(probe, 0, 1) > 0)
          fail(id, "IDAT inflates past the expected filtered size")
        else if (!inf.finished())
          fail(id, "truncated IDAT stream (missing zlib trailer)")
      }
    } catch {
      case _: DataFormatException => fail(id, "corrupt IDAT deflate stream")
    } finally inf.end()
    if (got != expect) fail(id, s"IDAT inflated to $got of $expect bytes")
    out
  }

  private def unfilterRow(id: Long, ft: Int, row: Array[Byte],
      prior: Array[Byte], rb: Int, bpp: Int): Unit = ft match {
    case 0 => // None
    case 1 => // Sub
      var i = bpp
      while (i < rb) { row(i) = (row(i) + row(i - bpp)).toByte; i += 1 }
    case 2 => // Up
      var i = 0
      while (i < rb) { row(i) = (row(i) + prior(i)).toByte; i += 1 }
    case 3 => // Average
      var i = 0
      while (i < rb) {
        val left = if (i >= bpp) row(i - bpp) & 0xff else 0
        row(i) = (row(i) + ((left + (prior(i) & 0xff)) >> 1)).toByte
        i += 1
      }
    case 4 => // Paeth
      var i = 0
      while (i < rb) {
        val a = if (i >= bpp) row(i - bpp) & 0xff else 0
        val b = prior(i) & 0xff
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
        row(i) = (row(i) + paeth(a, b, c)).toByte
        i += 1
      }
    case other => fail(id, s"unknown scanline filter $other")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Sample `k` (0-based across the row) of an unfiltered scanline as
    * a raw value at the stored bit depth.
    */
  private def sampleAt(row: Array[Byte], k: Int, depth: Int): Int = depth match {
    case 8 => row(k) & 0xff
    case 16 => row(k * 2) & 0xff // high byte == spec's 8-bit rescale
    case d =>
      val perByte = 8 / d
      (row(k / perByte) >> (8 - d * (k % perByte + 1))) & ((1 << d) - 1)
  }

  /** Low-depth gray expands by exact replication (255/(2^d-1) is an
    * integer for d in {1,2,4}).
    */
  private def grayScale(depth: Int): Int = depth match {
    case 1 => 255
    case 2 => 85
    case 4 => 17
    case _ => 1
  }

  private def emitRow(bytes: Array[Byte], pw: Int, destY: Int, destX0: Int,
      destXStep: Int, width: Int, bitDepth: Int, colorType: Int,
      srcCh: Int, outCh: Int, palette: Array[Byte], trns: Array[Byte],
      trnsLevels: Array[Int], out: Array[Byte], id: Long): Unit = {
    var px = 0
    while (px < pw) {
      val destX = destX0 + px * destXStep
      val o = (destY * width + destX) * outCh
      // raw sample at source depth (16-bit keeps BOTH bytes for the
      // tRNS comparison, which is defined on the full-depth value)
      def rawAt(k: Int): Int = bitDepth match {
        case 16 => ((bytes(k * 2) & 0xff) << 8) | (bytes(k * 2 + 1) & 0xff)
        case _ => sampleAt(bytes, k, bitDepth)
      }
      colorType match {
        case 0 =>
          out(o) = (sampleAt(bytes, px, bitDepth) * grayScale(bitDepth)).toByte
          if (outCh == 2)
            out(o + 1) = if (rawAt(px) == trnsLevels(0)) 0 else 0xff.toByte
        case 2 =>
          out(o) = sampleAt(bytes, px * 3, bitDepth).toByte
          out(o + 1) = sampleAt(bytes, px * 3 + 1, bitDepth).toByte
          out(o + 2) = sampleAt(bytes, px * 3 + 2, bitDepth).toByte
          if (outCh == 4)
            out(o + 3) = if (rawAt(px * 3) == trnsLevels(0) &&
              rawAt(px * 3 + 1) == trnsLevels(1) &&
              rawAt(px * 3 + 2) == trnsLevels(2)) 0 else 0xff.toByte
        case 3 =>
          val idx = sampleAt(bytes, px, bitDepth)
          if (idx * 3 + 2 >= palette.length)
            fail(id, s"palette index $idx outside ${palette.length / 3}-entry PLTE")
          out(o) = palette(idx * 3)
          out(o + 1) = palette(idx * 3 + 1)
          out(o + 2) = palette(idx * 3 + 2)
          if (outCh == 4)
            out(o + 3) = if (idx < trns.length) trns(idx) else 0xff.toByte
        case 4 =>
          out(o) = sampleAt(bytes, px * 2, bitDepth).toByte
          out(o + 1) = sampleAt(bytes, px * 2 + 1, bitDepth).toByte
        case 6 =>
          var c = 0
          while (c < 4) {
            out(o + c) = sampleAt(bytes, px * 4 + c, bitDepth).toByte
            c += 1
          }
      }
      px += 1
    }
  }

  // --- encoder -------------------------------------------------------

  /** Encode 8-bit gray (channels=1) or RGB (channels=3) pixels
    * (top-down, channel-fastest) as a non-interlaced PNG with the
    * standard adaptive per-row filter (minimum sum of absolute
    * differences over filters 0-4) — round-trip fixtures therefore
    * exercise every unfilter branch.
    */
  def encode(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"encode supports 1|3 channels, got $channels")
    require(width > 0 && height > 0 && pixels.length == width * height * channels,
      s"bad encode geometry ${width}x${height}x$channels for ${pixels.length} bytes")
    val rb = width * channels
    val raw = new Array[Byte]((rb + 1) * height)
    val cand = new Array[Byte](rb)
    var y = 0
    while (y < height) {
      val rowOff = y * rb
      var bestFt = 0
      var bestSum = Long.MaxValue
      var bestRow: Array[Byte] = null
      var ft = 0
      while (ft <= 4) {
        var sum = 0L
        var i = 0
        while (i < rb) {
          val x = pixels(rowOff + i) & 0xff
          val a = if (i >= channels) pixels(rowOff + i - channels) & 0xff else 0
          val b = if (y > 0) pixels(rowOff - rb + i) & 0xff else 0
          val c = if (y > 0 && i >= channels) pixels(rowOff - rb + i - channels) & 0xff else 0
          val f = ft match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - ((a + b) >> 1)
            case 4 => x - paeth(a, b, c)
          }
          val fb = (f & 0xff).toByte
          cand(i) = fb
          // MSAD treats filtered bytes as signed deltas
          sum += math.abs(fb.toInt)
          i += 1
        }
        if (sum < bestSum) {
          bestSum = sum
          bestFt = ft
          bestRow = cand.clone()
        }
        ft += 1
      }
      raw(y * (rb + 1)) = bestFt.toByte
      System.arraycopy(bestRow, 0, raw, y * (rb + 1) + 1, rb)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put((if (channels == 1) 0 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zOut.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Chunk types carrying textual/temporal/Exif metadata — the
    * classes the privacy scrub removes (creator names, captions,
    * software tags, timestamps, GPS in the eXIf block).
    */
  private val MetaChunks = Set("tEXt", "zTXt", "iTXt", "tIME", "eXIf")

  /** Privacy scrub for PNGs — the [[JpegCodec.stripExif]] sibling:
    * tEXt/zTXt/iTXt/tIME/eXIf chunks are dropped, every other chunk
    * (pixels, palette, transparency, gamma) is copied byte-identical,
    * each chunk's CRC is verified while walking, and the file is
    * truncated after IEND so appended trailers don't ride through.
    */
  def stripMetadata(id: Long, bytes: Array[Byte]): Array[Byte] = {
    checkSignature(id, bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(bytes, 0, 8)
    var pos = 8
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 12 > bytes.length) fail(id, s"truncated chunk header at $pos")
      val n = be32(bytes, pos).toInt
      if (n < 0 || pos + 12 + n > bytes.length)
        fail(id, s"chunk overruns the file at $pos")
      val ctype = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != be32(bytes, pos + 8 + n))
        fail(id, s"CRC mismatch in $ctype chunk during scrub")
      if (!MetaChunks.contains(ctype)) out.write(bytes, pos, 12 + n)
      if (ctype == "IEND") sawEnd = true
      pos += 12 + n
    }
    out.toByteArray
  }

  /** True iff the PNG's eXIf chunk carries GPS coordinates. */
  def exifHasGps(id: Long, bytes: Array[Byte]): Boolean = {
    checkSignature(id, bytes)
    var pos = 8
    while (pos + 12 <= bytes.length) {
      val n = be32(bytes, pos).toInt
      if (n < 0 || pos + 12 + n > bytes.length)
        fail(id, s"chunk overruns the file at $pos")
      val ctype = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (ctype == "eXIf")
        return JpegCodec.tiffHasGps(id, bytes, pos + 8, pos + 8 + n)
      if (ctype == "IEND") return false
      pos += 12 + n
    }
    false
  }

  private def checkSignature(id: Long, bytes: Array[Byte]): Unit = {
    require(bytes.length >= 8 &&
      (0 until 8).forall(i => (bytes(i) & 0xff) == Signature(i)),
      s"media $id: not a PNG (bad signature)")
  }

  /** Splice metadata chunks after IHDR — the scrub's fixture face:
    * tEXt pairs (latin-1), an optional tIME stamp, and an optional
    * raw Exif TIFF block as eXIf.
    */
  def withMetadata(id: Long, png: Array[Byte],
      texts: Seq[(String, String)] = Nil,
      exifTiff: Option[Array[Byte]] = None,
      withTime: Boolean = false): Array[Byte] = {
    checkSignature(id, png)
    val ihdrLen = be32(png, 8).toInt
    val afterIhdr = 8 + 12 + ihdrLen
    val mid = new java.io.ByteArrayOutputStream()
    texts.foreach { case (k, v) =>
      val latin = java.nio.charset.StandardCharsets.ISO_8859_1
      writeChunk(mid, "tEXt", k.getBytes(latin) ++ Array(0.toByte) ++
        v.getBytes(latin))
    }
    if (withTime)
      writeChunk(mid, "tIME", Array(0x07, 0xea, 7, 15, 12, 30, 45)
        .map(_.toByte))
    exifTiff.foreach(t => writeChunk(mid, "eXIf", t))
    val m = mid.toByteArray
    val out = new Array[Byte](png.length + m.length)
    System.arraycopy(png, 0, out, 0, afterIhdr)
    System.arraycopy(m, 0, out, afterIhdr, m.length)
    System.arraycopy(png, afterIhdr, out, afterIhdr + m.length,
      png.length - afterIhdr)
    out
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** Alpha-stripped view for the shared image ops (aHash, resize):
    * gray+alpha → gray, RGBA → RGB; palette already expanded.
    */
  def toDecodedImage(img: PngImage): JpegCodec.DecodedImage = img.channels match {
    case 1 | 3 =>
      JpegCodec.DecodedImage(img.width, img.height, img.channels, img.pixels)
    case ch =>
      val keep = ch - 1
      val out = new Array[Byte](img.width * img.height * keep)
      var p = 0
      while (p < img.width * img.height) {
        var c = 0
        while (c < keep) { out(p * keep + c) = img.pixels(p * ch + c); c += 1 }
        p += 1
      }
      JpegCodec.DecodedImage(img.width, img.height, keep, out)
  }
}
