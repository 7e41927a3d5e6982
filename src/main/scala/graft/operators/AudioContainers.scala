package graft.operators

/** MP3 and FLAC container probes — honest header-level parsing of the
  * two compressed audio formats a scraped corpus actually carries
  * (the WAV codec handles PCM; frame DECODE of MDCT codecs is out of
  * scope, exactly the boundary the container imposes — the Mp4Codec
  * contract). Everything here is integer arithmetic from the public
  * specs (MPEG-1/2 audio frame headers incl. the bitrate/samplerate
  * tables; FLAC STREAMINFO bit layout), so fixture parameters replay
  * bit-for-bit in SQL.
  *
  * Scale contract: executor-local per-payload walks, loud id-tagged
  * failures on corruption.
  */
object Mp3Codec {

  /** kbit/s by (versionIdx 1=MPEG1, layer III) bitrate index. */
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SampleRateV1 = Array(44100, 48000, 32000)
  private val SampleRateV2 = Array(22050, 24000, 16000)

  final case class Mp3Info(
      nFrames: Int, bitrateKbps: Int, sampleRate: Int,
      samplesPerFrame: Int, durationMs: Long, hasId3: Boolean)

  def isMp3(b: Array[Byte]): Boolean =
    (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)

  /** Walk an MP3: optional ID3v2 tag (syncsafe size), then MPEG audio
    * frames — layer III, MPEG-1 or MPEG-2, constant rate assumed for
    * duration (the probe reports the FIRST frame's parameters and
    * counts every frame; VBR files still count correctly because each
    * frame's own header sizes it).
    */
  def parse(id: Long, b: Array[Byte]): Mp3Info = {
    require(isMp3(b), s"media $id: not an MP3 (no ID3/frame sync)")
    var o = 0
    var hasId3 = false
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      hasId3 = true
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      o = 10 + size
      require(o <= b.length, s"media $id: ID3v2 tag overruns the file")
    }
    var nFrames = 0
    var bitrate = -1
    var sampleRate = -1
    var spf = -1
    while (o + 4 <= b.length) {
      require((b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0,
        s"media $id: lost MP3 frame sync at $o")
      val versionBits = (b(o + 1) >> 3) & 0x03 // 3=MPEG1, 2=MPEG2
      val layerBits = (b(o + 1) >> 1) & 0x03 // 1 = Layer III
      require(layerBits == 1, s"media $id: only Layer III supported")
      require(versionBits == 3 || versionBits == 2,
        s"media $id: reserved MPEG version")
      val mpeg1 = versionBits == 3
      val brIdx = (b(o + 2) >> 4) & 0x0f
      val srIdx = (b(o + 2) >> 2) & 0x03
      require(brIdx >= 1 && brIdx <= 14, s"media $id: bad bitrate index")
      require(srIdx <= 2, s"media $id: reserved sample-rate index")
      val br = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
      val sr = (if (mpeg1) SampleRateV1 else SampleRateV2)(srIdx)
      val padding = (b(o + 2) >> 1) & 0x01
      val thisSpf = if (mpeg1) 1152 else 576
      if (nFrames == 0) { bitrate = br; sampleRate = sr; spf = thisSpf }
      val frameLen = thisSpf / 8 * br * 1000 / sr + padding
      require(frameLen > 4 && o + frameLen <= b.length,
        s"media $id: MP3 frame at $o overruns the file")
      o += frameLen
      nFrames += 1
    }
    require(nFrames > 0, s"media $id: MP3 with no audio frames")
    Mp3Info(nFrames, bitrate, sampleRate, spf,
      nFrames.toLong * spf * 1000L / sampleRate, hasId3)
  }

  /** The Xing/Info (or VBRI) VBR header in the FIRST audio frame —
    * the frame/byte totals a VBR file carries because frame-1's
    * bitrate field lies about the rest. `nFrames` is the MUSIC frame
    * count (excluding the header frame itself, the LAME convention);
    * durationMs is computed from it.
    */
  final case class VbrInfo(tag: String, nFrames: Int, nBytes: Long,
      durationMs: Long)

  def vbrInfo(id: Long, b: Array[Byte]): Option[VbrInfo] = {
    var o = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      o = 10 + size
    }
    if (o + 4 > b.length) return None
    require((b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0,
      s"media $id: no MP3 frame sync for VBR probe")
    val mpeg1 = ((b(o + 1) >> 3) & 0x03) == 3
    val srIdx = (b(o + 2) >> 2) & 0x03
    require(srIdx <= 2, s"media $id: reserved sample-rate index")
    val sr = (if (mpeg1) SampleRateV1 else SampleRateV2)(srIdx)
    val spf = if (mpeg1) 1152 else 576
    val mono = ((b(o + 3) >> 6) & 0x03) == 3
    val sideInfo =
      if (mpeg1) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }
    def be32(p: Int): Long = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    val x = o + 4 + sideInfo
    if (x + 8 <= b.length && (
        (b(x) == 'X' && b(x + 1) == 'i' && b(x + 2) == 'n' && b(x + 3) == 'g') ||
        (b(x) == 'I' && b(x + 1) == 'n' && b(x + 2) == 'f' && b(x + 3) == 'o'))) {
      val tag = new String(b, x, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val flags = be32(x + 4)
      var p = x + 8
      var frames = -1
      var bytes = -1L
      if ((flags & 0x1) != 0) { frames = be32(p).toInt; p += 4 }
      if ((flags & 0x2) != 0) { bytes = be32(p); p += 4 }
      require(frames > 0, s"media $id: $tag header without a frame count")
      Some(VbrInfo(tag, frames, bytes,
        frames.toLong * spf * 1000L / sr))
    } else {
      // VBRI sits at a FIXED 32-byte offset after the header (Fraunhofer)
      val v = o + 4 + 32
      if (v + 26 <= b.length && b(v) == 'V' && b(v + 1) == 'B' &&
          b(v + 2) == 'R' && b(v + 3) == 'I') {
        val bytes = be32(v + 10)
        val frames = be32(v + 14).toInt
        require(frames > 0, s"media $id: VBRI header without a frame count")
        Some(VbrInfo("VBRI", frames, bytes,
          frames.toLong * spf * 1000L / sr))
      } else None
    }
  }

  /** Synthesize a VBR Layer-III stream: per-frame bitrate indexes,
    * optionally led by a Xing header frame carrying the music-frame
    * count (zeroed payloads — silent, decoder-walkable). Prepend an
    * [[Id3.synthesize]] tag for the full real-file shape.
    */
  def synthesizeVbr(brIdxs: Seq[Int], srIdx: Int, mpeg1: Boolean,
      withXing: Boolean, id3: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(brIdxs.nonEmpty && brIdxs.forall(i => i >= 1 && i <= 14))
    val out = new java.io.ByteArrayOutputStream()
    out.write(id3, 0, id3.length)
    val sr = (if (mpeg1) SampleRateV1 else SampleRateV2)(srIdx)
    val spf = if (mpeg1) 1152 else 576
    def frame(brIdx: Int, fill: Array[Byte] => Unit): Unit = {
      val br = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
      val frameLen = spf / 8 * br * 1000 / sr
      val buf = new Array[Byte](frameLen)
      buf(0) = 0xff.toByte
      buf(1) = (if (mpeg1) 0xfa else 0xf2).toByte
      buf(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      buf(3) = 0x00 // stereo
      fill(buf)
      out.write(buf, 0, buf.length)
    }
    if (withXing) {
      // header frame: largest table rate so the Xing block fits
      frame(14, { buf =>
        val sideInfo = if (mpeg1) 32 else 17 // stereo
        val x = 4 + sideInfo
        buf(x) = 'X'; buf(x + 1) = 'i'; buf(x + 2) = 'n'; buf(x + 3) = 'g'
        buf(x + 7) = 0x01 // flags: frames only
        val n = brIdxs.length
        buf(x + 8) = ((n >> 24) & 0xff).toByte
        buf(x + 9) = ((n >> 16) & 0xff).toByte
        buf(x + 10) = ((n >> 8) & 0xff).toByte
        buf(x + 11) = (n & 0xff).toByte
      })
    }
    brIdxs.foreach(i => frame(i, _ => ()))
    out.toByteArray
  }

  /** Synthesize a valid constant-rate Layer-III stream (headers +
    * zeroed payloads — silent, decoder-walkable) with an optional
    * ID3v2 shell. Fixture generator; parameters replay in SQL.
    */
  def synthesize(nFrames: Int, brIdx: Int, srIdx: Int, mpeg1: Boolean,
      id3Bytes: Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      out.write(new Array[Byte](id3Bytes), 0, id3Bytes)
    }
    val br = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
    val sr = (if (mpeg1) SampleRateV1 else SampleRateV2)(srIdx)
    val spf = if (mpeg1) 1152 else 576
    val frameLen = spf / 8 * br * 1000 / sr // no padding
    var f = 0
    while (f < nFrames) {
      out.write(0xff)
      out.write(if (mpeg1) 0xfa else 0xf2) // sync | version | L3 | no CRC
      out.write((brIdx << 4) | (srIdx << 2)) // no padding
      out.write(0x00) // stereo, no extras
      out.write(new Array[Byte](frameLen - 4), 0, frameLen - 4)
      f += 1
    }
    out.toByteArray
  }
}

/** AIFF (Audio IFF) — the big-endian PCM container older corpora
  * carry beside RIFF/WAVE: FORM/AIFF chunks, the COMM chunk's sample
  * rate stored as an 80-bit IEEE 754 extended float (parsed exactly:
  * sign/15-bit exponent/64-bit mantissa with the explicit integer
  * bit), SSND with offset/blockSize, big-endian signed samples at
  * 8/16/24/32 bits. Same loud-failure and per-payload executor
  * contract as WavCodec.
  */
object AiffCodec {

  final case class AiffInfo(
      sampleRate: Int, channels: Int, bits: Int, nFrames: Long,
      durationUs: Long, meanAbsAmp: Double)

  def isAiff(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
      b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      b(11) == 'F'

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** 80-bit extended float at `o` → integer sample rate (audio rates
    * are whole numbers; a non-integral or absurd rate fails loudly).
    */
  private[operators] def extended80(id: Long, b: Array[Byte], o: Int): Int = {
    val sign = (b(o) & 0x80) != 0
    val exp = ((b(o) & 0x7f) << 8) | (b(o + 1) & 0xff)
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xffL); i += 1 }
    if (sign || exp == 0 || mant == 0) fail(id, "bad AIFF sample rate")
    // value = mantissa * 2^(exp - 16383 - 63); integral when the
    // shift keeps all set mantissa bits
    val shift = exp - 16383 - 63
    val rate =
      if (shift >= 0) mant << shift
      else {
        if ((mant & ((1L << -shift) - 1)) != 0)
          fail(id, "non-integral AIFF sample rate")
        mant >>> -shift // logical: the explicit integer bit is bit 63
      }
    if (rate <= 0 || rate > 1000000) fail(id, s"absurd AIFF rate $rate")
    rate.toInt
  }

  def parse(id: Long, b: Array[Byte]): AiffInfo = {
    if (!isAiff(b)) fail(id, "not an AIFF (no FORM/AIFF)")
    var off = 12
    var channels = -1; var nFrames = -1L; var bits = -1; var rate = -1
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= b.length) {
      val ct = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val cl = u32(b, off + 4)
      if (cl < 0 || off + 8 + cl > b.length)
        fail(id, s"chunk '$ct' size $cl overruns the file at $off")
      if (ct == "COMM") {
        if (cl < 18) fail(id, s"COMM chunk too short ($cl)")
        channels = u16(b, off + 8)
        nFrames = u32(b, off + 10)
        bits = u16(b, off + 14)
        rate = extended80(id, b, off + 16)
      } else if (ct == "SSND") {
        if (cl < 8) fail(id, s"SSND chunk too short ($cl)")
        val dOff = u32(b, off + 8) // extra offset before sound data
        dataOff = (off + 16 + dOff).toInt
        dataLen = cl - 8 - dOff
      }
      off += 8 + cl.toInt + (cl.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0) fail(id, "missing COMM chunk")
    if (dataOff < 0) fail(id, "missing SSND chunk")
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"media $id: unsupported AIFF depth $bits")
    val w = bits / 8
    require(dataLen >= nFrames * channels * w,
      s"media $id: SSND holds $dataLen bytes < $nFrames x $channels x $w")
    var sum = 0L
    var i = 0
    val total = (nFrames * channels).toInt
    while (i < total) {
      val o = dataOff + i * w
      // big-endian signed at any width (8-bit AIFF is SIGNED,
      // unlike WAV's unsigned-centered convention)
      var v = b(o).toInt // sign-extended leading byte
      var k = 1
      while (k < w) { v = (v << 8) | (b(o + k) & 0xff); k += 1 }
      sum += math.abs(v.toLong)
      i += 1
    }
    AiffInfo(rate, channels, bits, nFrames,
      nFrames * 1000000L / rate,
      if (total == 0) 0.0 else sum.toDouble / total)
  }

  /** Synthesize a canonical AIFF: FORM/AIFF + COMM (with the exact
    * 80-bit extended rate) + SSND, big-endian signed samples.
    */
  def synthesize(sampleRate: Int, channels: Int, bits: Int,
      interleaved: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32)
    require(channels >= 1 && interleaved.length % channels == 0)
    val w = bits / 8
    val nFrames = interleaved.length / channels
    val ssndLen = 8 + interleaved.length * w
    val formLen = 4 + (8 + 18) + (8 + ssndLen)
    val buf = java.nio.ByteBuffer.allocate(8 + formLen) // big-endian default
    buf.put("FORM".getBytes("US-ASCII")).putInt(formLen)
      .put("AIFF".getBytes("US-ASCII"))
    buf.put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(channels.toShort).putInt(nFrames).putShort(bits.toShort)
    // 80-bit extended: exponent chosen so mantissa = rate << 63-e
    val nbits = 64 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    val exp = 16383 + nbits - 1
    val mant = sampleRate.toLong << (64 - nbits)
    buf.putShort(exp.toShort).putLong(mant)
    buf.put("SSND".getBytes("US-ASCII")).putInt(ssndLen)
      .putInt(0).putInt(0) // offset + blockSize
    interleaved.foreach { v =>
      var k = w - 1
      while (k >= 0) { buf.put(((v >> (8 * k)) & 0xff).toByte); k -= 1 }
    }
    buf.array()
  }
}

object FlacCodec {

  final case class FlacInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long, md5Hex: String)

  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** Parse the mandatory STREAMINFO metadata block (the fLaC marker
    * is followed by it per the spec).
    */
  def parse(id: Long, b: Array[Byte]): FlacInfo = {
    require(isFlac(b), s"media $id: not a FLAC stream")
    require(b.length >= 4 + 4 + 34, s"media $id: truncated STREAMINFO")
    require((b(4) & 0x7f) == 0, s"media $id: first block is not STREAMINFO")
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    require(len == 34, s"media $id: STREAMINFO length $len != 34")
    val s = 8 // block payload start
    // [min/max blocksize 16+16][min/max framesize 24+24][sr 20]
    // [channels-1 3][bps-1 5][total 36][md5 128]
    val sampleRate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) |
      ((b(s + 12) & 0xf0) >> 4)
    val channels = ((b(s + 12) & 0x0e) >> 1) + 1
    val bps = (((b(s + 12) & 0x01) << 4) | ((b(s + 13) & 0xf0) >> 4)) + 1
    var total = (b(s + 13) & 0x0fL)
    var i = 14
    while (i <= 17) { total = (total << 8) | (b(s + i) & 0xffL); i += 1 }
    require(sampleRate > 0, s"media $id: FLAC sample rate 0")
    val md5 = (18 until 34).map(k => f"${b(s + k) & 0xff}%02x").mkString
    FlacInfo(sampleRate, channels, bps, total,
      total * 1000L / sampleRate, md5)
  }

  /** Synthesize a STREAMINFO-only FLAC shell (valid header, no audio
    * frames — the metadata face fixtures need).
    */
  def synthesize(sampleRate: Int, channels: Int, bps: Int,
      totalSamples: Long, md5: Array[Byte]): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && bps >= 4 && bps <= 32)
    require(md5.length == 16)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80) // last block + type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    out.write(0x10); out.write(0x00) // min blocksize 4096
    out.write(0x10); out.write(0x00) // max blocksize 4096
    (0 until 6).foreach(_ => out.write(0)) // min/max framesize unknown
    out.write((sampleRate >> 12) & 0xff)
    out.write((sampleRate >> 4) & 0xff)
    out.write(((sampleRate & 0x0f) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4))
    out.write((((bps - 1) & 0x0f) << 4) | ((totalSamples >> 32) & 0x0f).toInt)
    out.write(((totalSamples >> 24) & 0xff).toInt)
    out.write(((totalSamples >> 16) & 0xff).toInt)
    out.write(((totalSamples >> 8) & 0xff).toInt)
    out.write((totalSamples & 0xff).toInt)
    out.write(md5, 0, 16)
    out.toByteArray
  }
}
