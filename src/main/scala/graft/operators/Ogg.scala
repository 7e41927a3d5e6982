package graft.operators

/** Ogg container parsing (RFC 3533) with Vorbis and Opus stream
  * identification — the third audio container family real corpora
  * carry beside WAV and FLAC/MP3. Page-level walk with full CRC-32
  * verification (the Ogg polynomial 0x04c11db7, non-reflected,
  * init/xorout 0, computed with the CRC field zeroed), packet
  * reassembly across the lacing table (255-byte continuation
  * segments), BOS/EOS flags, and the metadata packets:
  *
  *  - Vorbis identification header (`vorbis`: channels, rate)
  *    and comment header (`vorbis`: vendor + KEY=value user
  *    comments — the VorbisComment tag system);
  *  - Opus `OpusHead` (channels, pre-skip, input rate) and
  *    `OpusTags` (same comment structure).
  *
  * Duration is exact granule arithmetic: the last page's granule
  * position is the PCM sample count (Vorbis, at the stream rate;
  * Opus, at 48 kHz minus pre-skip). Like the MP3 layer, full audio
  * DECODE is a declared non-goal (no reference codec here to pin
  * lossy output against); the container+metadata layer is exactly
  * specified and CRC-verifiable.
  */
object OggCodec {

  final case class OggMeta(
      codec: String, channels: Int, sampleRate: Int, preSkip: Int,
      vendor: String, comments: Seq[(String, String)],
      nPages: Int, lastGranule: Long, durationMs: Long)

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  def isOgg(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  // Ogg CRC-32: poly 0x04c11db7, no reflection, init 0, xorout 0
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[operators] def crc(b: Array[Byte], from: Int, until: Int,
      seed: Int = 0): Int = {
    var c = seed
    var i = from
    while (i < until) {
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  private final case class Page(
      headerType: Int, granule: Long, serial: Int, seq: Int,
      segments: Seq[Array[Byte]])

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  private def readPages(id: Long, b: Array[Byte]): Seq[Page] = {
    val out = Seq.newBuilder[Page]
    var o = 0
    while (o < b.length) {
      if (o + 27 > b.length) fail(id, s"truncated Ogg page header at $o")
      if (!(b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' && b(o + 3) == 'S'))
        fail(id, s"lost OggS capture at $o")
      if (b(o + 4) != 0) fail(id, s"unsupported Ogg version ${b(o + 4)}")
      val headerType = b(o + 5) & 0xff
      val granule = le64(b, o + 6)
      val serial = le32(b, o + 14)
      val seq = le32(b, o + 18)
      val storedCrc = le32(b, o + 22)
      val nSegs = b(o + 26) & 0xff
      if (o + 27 + nSegs > b.length) fail(id, s"truncated lacing table at $o")
      val lacing = (0 until nSegs).map(i => b(o + 27 + i) & 0xff)
      val bodyLen = lacing.sum
      val bodyStart = o + 27 + nSegs
      if (bodyStart + bodyLen > b.length) fail(id, s"page body overruns at $o")
      // CRC over the whole page with the CRC field zeroed
      val computed = {
        var c = crc(b, o, o + 22)
        var k = 0
        while (k < 4) { c = (c << 8) ^ CrcTable((c >>> 24) & 0xff); k += 1 }
        crc(b, o + 26, bodyStart + bodyLen, c)
      }
      if (computed != storedCrc)
        fail(id, f"Ogg page CRC mismatch at $o (got $computed%08x, stored $storedCrc%08x)")
      var p = bodyStart
      val segs = lacing.map { l =>
        val s = java.util.Arrays.copyOfRange(b, p, p + l)
        p += l
        s
      }
      out += Page(headerType, granule, serial, seq, segs)
      o = bodyStart + bodyLen
    }
    out.result()
  }

  /** Reassemble packets from pages' lacing values: a 255-byte segment
    * continues, anything shorter terminates the packet.
    */
  private def packets(pages: Seq[Page]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    pages.foreach { pg =>
      pg.segments.zipWithIndex.foreach { case (s, i) =>
        cur.write(s, 0, s.length)
        val lacing = s.length
        if (lacing < 255) { out += cur.toByteArray; cur.reset() }
        val _ = i
      }
    }
    out.result()
  }

  private def comments(id: Long, b: Array[Byte], o0: Int)
      : (String, Seq[(String, String)]) = {
    var o = o0
    def str(): String = {
      if (o + 4 > b.length) fail(id, "truncated comment header")
      val n = le32(b, o)
      o += 4
      if (n < 0 || o + n > b.length) fail(id, "comment string overruns")
      val s = new String(b, o, n, java.nio.charset.StandardCharsets.UTF_8)
      o += n
      s
    }
    val vendor = str()
    if (o + 4 > b.length) fail(id, "truncated comment count")
    val n = le32(b, o)
    o += 4
    val cs = (0 until n).map { _ =>
      val kv = str()
      val eq = kv.indexOf('=')
      if (eq < 0) fail(id, s"comment without '=': '$kv'")
      kv.substring(0, eq).toUpperCase(java.util.Locale.ROOT) ->
        kv.substring(eq + 1)
    }
    (vendor, cs)
  }

  /** Parse an Ogg Vorbis or Ogg Opus stream's container + metadata. */
  def parse(id: Long, b: Array[Byte]): OggMeta = {
    if (!isOgg(b)) fail(id, "not an Ogg stream (no OggS capture)")
    val pages = readPages(id, b)
    if (pages.isEmpty) fail(id, "Ogg stream with no pages")
    if ((pages.head.headerType & 0x02) == 0) fail(id, "first page is not BOS")
    if ((pages.last.headerType & 0x04) == 0) fail(id, "last page is not EOS")
    val ps = packets(pages)
    if (ps.size < 2) fail(id, "Ogg stream without header packets")
    val idPkt = ps.head
    val isVorbis = idPkt.length >= 7 && idPkt(0) == 1 &&
      new String(idPkt, 1, 6, java.nio.charset.StandardCharsets.US_ASCII) == "vorbis"
    val isOpus = idPkt.length >= 8 &&
      new String(idPkt, 0, 8, java.nio.charset.StandardCharsets.US_ASCII) == "OpusHead"
    val lastGranule = pages.last.granule
    if (isVorbis) {
      if (idPkt.length < 30) fail(id, "short Vorbis identification header")
      require(le32(idPkt, 7) == 0, s"media $id: unsupported Vorbis version")
      val channels = idPkt(11) & 0xff
      val rate = le32(idPkt, 12)
      require(rate > 0, s"media $id: Vorbis rate 0")
      val cPkt = ps(1)
      if (!(cPkt.length >= 7 && cPkt(0) == 3 &&
        new String(cPkt, 1, 6, java.nio.charset.StandardCharsets.US_ASCII) == "vorbis"))
        fail(id, "second Vorbis packet is not the comment header")
      val (vendor, cs) = comments(id, cPkt, 7)
      OggMeta("vorbis", channels, rate, 0, vendor, cs, pages.length,
        lastGranule, lastGranule * 1000L / rate)
    } else if (isOpus) {
      if (idPkt.length < 19) fail(id, "short OpusHead")
      val channels = idPkt(9) & 0xff
      val preSkip = (idPkt(10) & 0xff) | ((idPkt(11) & 0xff) << 8)
      val inputRate = le32(idPkt, 12)
      val cPkt = ps(1)
      if (!(cPkt.length >= 8 &&
        new String(cPkt, 0, 8, java.nio.charset.StandardCharsets.US_ASCII) == "OpusTags"))
        fail(id, "second Opus packet is not OpusTags")
      val (vendor, cs) = comments(id, cPkt, 8)
      // Opus granules are ALWAYS 48 kHz regardless of the input rate
      val samples = math.max(0L, lastGranule - preSkip)
      OggMeta("opus", channels, inputRate, preSkip, vendor, cs,
        pages.length, lastGranule, samples * 1000L / 48000L)
    } else fail(id, "Ogg stream is neither Vorbis nor Opus")
  }

  // --- fixture writer ------------------------------------------------

  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      pkts: Seq[Array[Byte]]): Array[Byte] = {
    // lacing: each packet becomes ceil splits of 255 + terminator
    val lacing = Seq.newBuilder[Int]
    pkts.foreach { p =>
      var rest = p.length
      while (rest >= 255) { lacing += 255; rest -= 255 }
      lacing += rest // may be 0: legal terminator for a 255-multiple
    }
    val lac = lacing.result()
    require(lac.length <= 255, "too many lacing segments for one page")
    val body = pkts.flatMap(_.toSeq).toArray
    val head = new Array[Byte](27 + lac.length)
    head(0) = 'O'; head(1) = 'g'; head(2) = 'g'; head(3) = 'S'
    head(4) = 0
    head(5) = headerType.toByte
    var g = granule
    var i = 0
    while (i < 8) { head(6 + i) = (g & 0xff).toByte; g >>= 8; i += 1 }
    def putLe32(o: Int, v: Int): Unit = {
      head(o) = (v & 0xff).toByte; head(o + 1) = ((v >> 8) & 0xff).toByte
      head(o + 2) = ((v >> 16) & 0xff).toByte
      head(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(14, serial); putLe32(18, seq); putLe32(22, 0)
    head(26) = lac.length.toByte
    lac.zipWithIndex.foreach { case (l, k) => head(27 + k) = l.toByte }
    val all = head ++ body
    val c = crc(all, 0, all.length)
    all(22) = (c & 0xff).toByte; all(23) = ((c >> 8) & 0xff).toByte
    all(24) = ((c >> 16) & 0xff).toByte; all(25) = ((c >> 24) & 0xff).toByte
    all
  }

  private def commentPacket(magic: Array[Byte], vendor: String,
      cs: Seq[(String, String)], framing: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(magic, 0, magic.length)
    def putStr(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
      out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
      out.write(b, 0, b.length)
    }
    putStr(vendor)
    out.write(cs.length & 0xff); out.write((cs.length >> 8) & 0xff)
    out.write((cs.length >> 16) & 0xff); out.write((cs.length >> 24) & 0xff)
    cs.foreach { case (k, v) => putStr(s"$k=$v") }
    if (framing) out.write(1)
    out.toByteArray
  }

  /** Synthesize an Ogg Vorbis or Opus stream: real header packets,
    * comment header, `nAudioPages` dummy audio pages with ascending
    * granules ending at `finalGranule`, valid CRCs throughout.
    */
  def synthesize(codec: String, channels: Int, rate: Int, preSkip: Int,
      vendor: String, cs: Seq[(String, String)], nAudioPages: Int,
      finalGranule: Long, serial: Int = 0x1234): Array[Byte] = {
    require(nAudioPages >= 1 && finalGranule >= 0)
    val (idPkt, cPkt) = codec match {
      case "vorbis" =>
        val p = new Array[Byte](30)
        p(0) = 1
        "vorbis".getBytes.copyToArray(p, 1)
        p(11) = channels.toByte
        p(12) = (rate & 0xff).toByte; p(13) = ((rate >> 8) & 0xff).toByte
        p(14) = ((rate >> 16) & 0xff).toByte; p(15) = ((rate >> 24) & 0xff).toByte
        p(28) = 0xb8.toByte // blocksizes 256/1024 (exercised, not decoded)
        p(29) = 1 // framing
        (p, commentPacket(Array[Byte](3) ++ "vorbis".getBytes, vendor, cs,
          framing = true))
      case "opus" =>
        val p = new Array[Byte](19)
        "OpusHead".getBytes.copyToArray(p, 0)
        p(8) = 1 // version
        p(9) = channels.toByte
        p(10) = (preSkip & 0xff).toByte; p(11) = ((preSkip >> 8) & 0xff).toByte
        p(12) = (rate & 0xff).toByte; p(13) = ((rate >> 8) & 0xff).toByte
        p(14) = ((rate >> 16) & 0xff).toByte; p(15) = ((rate >> 24) & 0xff).toByte
        (p, commentPacket("OpusTags".getBytes, vendor, cs, framing = false))
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    val out = new java.io.ByteArrayOutputStream()
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    put(page(0x02, 0L, serial, 0, Seq(idPkt))) // BOS
    put(page(0x00, 0L, serial, 1, Seq(cPkt)))
    var i = 0
    while (i < nAudioPages) {
      val granule = finalGranule * (i + 1) / nAudioPages
      val flag = if (i == nAudioPages - 1) 0x04 else 0x00 // EOS on last
      val payload = Array.tabulate(40 + i % 17)(k => ((i * 31 + k) & 0xff).toByte)
      put(page(flag, granule, serial, 2 + i, Seq(payload)))
      i += 1
    }
    out.toByteArray
  }
}
