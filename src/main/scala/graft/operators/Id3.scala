package graft.operators

/** ID3v2 tag parsing (informal standard id3v2.3.0 / id3v2.4.0) — the
  * metadata face of real MP3 corpora: title/artist/album and friends
  * are curation signals (dedup keys, language hints, provenance) that
  * ride in front of the audio stream. Full MDCT frame decode stays a
  * non-goal (no reference codec in this environment to pin against —
  * the [[FlacAudio]] integrity-channel discipline has no MP3
  * equivalent); the TAG layer is exactly specified and verifiable.
  *
  * Covered: v2.3 (plain frame sizes) and v2.4 (syncsafe frame
  * sizes), all four text encodings (ISO-8859-1, UTF-16 with BOM,
  * UTF-16BE, UTF-8), unsynchronisation, the extended header, padding,
  * T*** text frames, TXXX user frames (desc:value) and COMM comments
  * (lang + desc + text). Unknown/binary frames pass through as named
  * lengths so corpus audits can count them.
  *
  * Scale contract: executor-local per-payload parse, loud id-tagged
  * failures on structural corruption (bad sizes, overruns).
  */
object Id3 {

  /** One parsed tag: version "2.3"/"2.4", decoded text frames in file
    * order (TXXX as "desc:value", COMM as "lang/desc:text"), and
    * (name, size) of non-text frames.
    */
  final case class Id3Tag(
      version: String,
      textFrames: Seq[(String, String)],
      otherFrames: Seq[(String, Int)]) {
    def first(id: String): Option[String] =
      textFrames.collectFirst { case (n, v) if n == id => v }
  }

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private def syncsafe(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
      ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Reverse unsynchronisation: every FF 00 pair becomes FF. */
  private def resync(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff && i + 1 < b.length && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  private def charsetOf(id: Long, enc: Int): java.nio.charset.Charset =
    enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-aware
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case 3 => java.nio.charset.StandardCharsets.UTF_8
      case other => fail(id, s"unknown ID3 text encoding $other")
    }

  /** Split a frame body into its NUL-separated strings at the BYTE
    * level (the separator is 00 00 on a 2-byte boundary for the wide
    * encodings, a single 00 otherwise) — each string is then decoded
    * independently, because in UTF-16 frames EVERY string carries its
    * own BOM.
    */
  private def nulSplit(b: Array[Byte], enc: Int): Seq[Array[Byte]] = {
    val wide = enc == 1 || enc == 2
    val out = Seq.newBuilder[Array[Byte]]
    var start = 0
    var i = 0
    val step = if (wide) 2 else 1
    while (i + step <= b.length) {
      val isNul = if (wide) b(i) == 0 && b(i + 1) == 0 else b(i) == 0
      if (isNul) {
        out += java.util.Arrays.copyOfRange(b, start, i)
        start = i + step
      }
      i += step
    }
    if (start < b.length) out += java.util.Arrays.copyOfRange(b, start, b.length)
    out.result().filter(_.nonEmpty) // drop empty trailing terminators
  }

  /** Decode a text-frame payload: leading encoding byte, then one or
    * more NUL-separated strings (v2.4 multi-values, TXXX desc+value)
    * joined with '/'.
    */
  private def text(id: Long, b: Array[Byte], from: Int, until: Int): String = {
    require(until > from, s"media $id: empty text frame body")
    val enc = b(from) & 0xff
    val cs = charsetOf(id, enc)
    val body = java.util.Arrays.copyOfRange(b, from + 1, until)
    nulSplit(body, enc).map(new String(_, cs)).mkString("/")
  }

  /** v2.2 3-char frame ids → their v2.3 names, so consumers see one
    * vocabulary (old MP3s in the wild really do carry v2.2).
    */
  private val V22Names = Map(
    "TT2" -> "TIT2", "TP1" -> "TPE1", "TP2" -> "TPE2", "TAL" -> "TALB",
    "TYE" -> "TYER", "TRK" -> "TRCK", "TCO" -> "TCON", "TEN" -> "TENC",
    "COM" -> "COMM", "TXX" -> "TXXX")

  /** Parse the ID3v2 tag at the head of `b`; None when absent. */
  def parse(id: Long, b: Array[Byte]): Option[Id3Tag] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return None
    val majVer = b(3) & 0xff
    if (majVer == 2) return Some(parseV22(id, b))
    if (majVer != 3 && majVer != 4)
      fail(id, s"unsupported ID3v2.$majVer tag")
    val flags = b(5) & 0xff
    val unsync = (flags & 0x80) != 0
    val tagSize = syncsafe(b, 6)
    if (10 + tagSize > b.length) fail(id, "ID3 tag overruns the file")
    var body = java.util.Arrays.copyOfRange(b, 10, 10 + tagSize)
    // v2.3 unsynchronises the whole tag; v2.4 per-frame (flag bit),
    // but applying tag-level resync to a v2.4 tag that set the
    // global flag is also correct per the spec's compatibility note
    if (unsync) body = resync(body)
    var o = 0
    if ((flags & 0x40) != 0) { // extended header
      val ehSize =
        if (majVer == 4) syncsafe(body, o) else be32(body, o) + 4
      require(ehSize >= 4 && o + ehSize <= body.length,
        s"media $id: ID3 extended header overruns the tag")
      o += ehSize
    }
    val texts = Seq.newBuilder[(String, String)]
    val others = Seq.newBuilder[(String, Int)]
    var done = false
    while (!done && o + 10 <= body.length) {
      if (body(o) == 0) done = true // padding
      else {
        val name = new String(body, o, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        require(name.forall(c => c.isUpper || c.isDigit),
          s"media $id: bad ID3 frame id '$name' at $o")
        val size = if (majVer == 4) syncsafe(body, o + 4) else be32(body, o + 4)
        require(size >= 0 && o + 10 + size <= body.length,
          s"media $id: ID3 frame $name overruns the tag")
        val until = o + 10 + size
        // frame FORMAT flags (second flag byte): real-world v2.4
        // encoders set per-frame unsynchronisation (0x02) and the
        // data-length indicator (0x01); both must be unwound or the
        // text decodes garbled. Compressed/encrypted frames have no
        // zlib/key support here — fail loudly, never emit garbage.
        val fmt = body(o + 9) & 0xff
        var fb = java.util.Arrays.copyOfRange(body, o + 10, until)
        if (majVer == 4) {
          require((fmt & 0x0c) == 0,
            s"media $id: ID3 frame $name is compressed/encrypted " +
              f"(format flags 0x$fmt%02x) — unsupported")
          // unsynchronisation covers ALL frame data after the header
          // (id3v2.4.0-structure §6.1) — de-unsync FIRST, then strip
          // the group byte and the data-length indicator, which were
          // stuffed along with the payload (a group id of 0xFF really
          // does get a 0x00 inserted after it)
          if ((fmt & 0x02) != 0) fb = resync(fb) // per-frame unsync
          if ((fmt & 0x40) != 0) { // grouping identity byte
            require(fb.length >= 1, s"media $id: $name grouped but empty")
            fb = java.util.Arrays.copyOfRange(fb, 1, fb.length)
          }
          if ((fmt & 0x01) != 0) { // data-length indicator (syncsafe)
            require(fb.length >= 4, s"media $id: $name DLI but <4 bytes")
            fb = java.util.Arrays.copyOfRange(fb, 4, fb.length)
          }
        } else { // v2.3: %ijk00000 — i compression, j encryption
          require((fmt & 0xc0) == 0,
            s"media $id: ID3 frame $name is compressed/encrypted " +
              f"(format flags 0x$fmt%02x) — unsupported")
          if ((fmt & 0x20) != 0) { // grouping identity byte
            require(fb.length >= 1, s"media $id: $name grouped but empty")
            fb = java.util.Arrays.copyOfRange(fb, 1, fb.length)
          }
        }
        if (name == "TXXX") {
          // desc and value are NUL-separated; text() folded to '/'
          texts += name -> text(id, fb, 0, fb.length).replaceFirst("/", ":")
        } else if (name.startsWith("T")) {
          texts += name -> text(id, fb, 0, fb.length)
        } else if (name == "COMM") {
          require(fb.length >= 4, s"media $id: COMM frame too short")
          val lang = new String(fb, 1, 3,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          // re-frame as a text body (encoding byte + desc\0text)
          val synth = Array(fb(0)) ++
            java.util.Arrays.copyOfRange(fb, 4, fb.length)
          val v = text(id, synth, 0, synth.length).replaceFirst("/", ":")
          texts += name -> s"$lang/$v"
        } else {
          others += name -> size
        }
        o = until
      }
    }
    Some(Id3Tag(s"2.$majVer", texts.result(), others.result()))
  }

  /** v2.2: 3-char frame ids, 3-byte plain sizes, no frame flags.
    * Only encodings 0/1 exist at this version.
    */
  private def parseV22(id: Long, b: Array[Byte]): Id3Tag = {
    val flags = b(5) & 0xff
    val tagSize = syncsafe(b, 6)
    if (10 + tagSize > b.length) fail(id, "ID3 tag overruns the file")
    var body = java.util.Arrays.copyOfRange(b, 10, 10 + tagSize)
    if ((flags & 0x80) != 0) body = resync(body)
    val texts = Seq.newBuilder[(String, String)]
    val others = Seq.newBuilder[(String, Int)]
    var o = 0
    var done = false
    while (!done && o + 6 <= body.length) {
      if (body(o) == 0) done = true // padding
      else {
        val raw = new String(body, o, 3,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        require(raw.forall(c => c.isUpper || c.isDigit),
          s"media $id: bad ID3v2.2 frame id '$raw' at $o")
        val size = ((body(o + 3) & 0xff) << 16) |
          ((body(o + 4) & 0xff) << 8) | (body(o + 5) & 0xff)
        require(size >= 0 && o + 6 + size <= body.length,
          s"media $id: ID3v2.2 frame $raw overruns the tag")
        val name = V22Names.getOrElse(raw, raw)
        val from = o + 6
        val until = from + size
        if (name == "TXXX") {
          texts += name -> text(id, body, from, until).replaceFirst("/", ":")
        } else if (raw.startsWith("T")) {
          texts += name -> text(id, body, from, until)
        } else if (name == "COMM") {
          require(size >= 4, s"media $id: COM frame too short")
          val lang = new String(body, from + 1, 3,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val synth = Array(body(from)) ++
            java.util.Arrays.copyOfRange(body, from + 4, until)
          val v = text(id, synth, 0, synth.length).replaceFirst("/", ":")
          texts += name -> s"$lang/$v"
        } else others += name -> size
        o = until
      }
    }
    Id3Tag("2.2", texts.result(), others.result())
  }

  // --- fixture writer ------------------------------------------------

  /** Spec unsynchronisation: insert 0x00 after an 0xFF that precedes
    * a byte >= 0xE0 (a false sync), a 0x00, or nothing (end of data).
    */
  private def unsyncBytes(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff &&
        (i + 1 == b.length || (b(i + 1) & 0xff) >= 0xe0 || b(i + 1) == 0))
        out.write(0)
      i += 1
    }
    out.toByteArray
  }

  /** Write an ID3v2.3 or v2.4 tag. `encoding`: 0 latin-1, 1 UTF-16
    * with BOM, 2 UTF-16BE (2.4 only), 3 UTF-8 (2.4 only).
    * `v24Format` sets each frame's v2.4 FORMAT flag byte — 0x40
    * grouping (a group byte is emitted), 0x02 per-frame
    * unsynchronisation, 0x01 data-length indicator — the shapes
    * real-world encoders produce that [[parse]] must unwind.
    */
  def synthesize(frames: Seq[(String, String)], v24: Boolean,
      encoding: Int, padding: Int = 16,
      v24Format: Int = 0): Array[Byte] = {
    require(encoding >= 0 && encoding <= 3, s"encoding $encoding")
    require(v24 || encoding <= 1, "encodings 2/3 are ID3v2.4-only")
    require(v24Format == 0 || v24, "frame format flags are v2.4-only")
    require((v24Format & ~0x43) == 0,
      f"unsupported v2.4 format flags 0x$v24Format%02x")
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (name, value) =>
      require(name.length == 4, s"frame id '$name'")
      val cs = encoding match {
        case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
        case 1 => java.nio.charset.StandardCharsets.UTF_16 // writes BOM
        case 2 => java.nio.charset.StandardCharsets.UTF_16BE
        case 3 => java.nio.charset.StandardCharsets.UTF_8
      }
      val payload: Array[Byte] =
        if (name == "COMM") {
          val Array(lang, rest) = value.split("/", 2)
          val Array(desc, txt) = rest.split(":", 2)
          val nul: Array[Byte] =
            if (encoding == 1 || encoding == 2) Array(0, 0) else Array(0)
          Array(encoding.toByte) ++
            lang.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
            desc.getBytes(cs) ++ nul ++ txt.getBytes(cs)
        } else if (name == "TXXX") {
          val Array(desc, txt) = value.split(":", 2)
          val nul: Array[Byte] =
            if (encoding == 1 || encoding == 2) Array(0, 0) else Array(0)
          Array(encoding.toByte) ++ desc.getBytes(cs) ++ nul ++
            txt.getBytes(cs)
        } else Array(encoding.toByte) ++ value.getBytes(cs)
      // on-disk frame data under the v2.4 format flags: group byte,
      // then the DLI (syncsafe length with all format flags zeroed),
      // then the payload — and unsynchronisation applied LAST over
      // the whole assembly, per §6.1 ("all data from the end of the
      // frame header"); parse() de-unsyncs first, then strips
      var data = payload
      val origLen = data.length
      if ((v24Format & 0x01) != 0)
        data = Array[Byte](((origLen >> 21) & 0x7f).toByte,
          ((origLen >> 14) & 0x7f).toByte, ((origLen >> 7) & 0x7f).toByte,
          (origLen & 0x7f).toByte) ++ data
      // group id 0xFF on purpose: under unsync it MUST get a 0x00
      // stuffed after it, proving readers de-unsync before stripping
      if ((v24Format & 0x40) != 0) data = Array[Byte](0xff.toByte) ++ data
      if ((v24Format & 0x02) != 0) data = unsyncBytes(data)
      body.write(name.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val sz = data.length
      if (v24) {
        body.write((sz >> 21) & 0x7f); body.write((sz >> 14) & 0x7f)
        body.write((sz >> 7) & 0x7f); body.write(sz & 0x7f)
      } else {
        body.write((sz >> 24) & 0xff); body.write((sz >> 16) & 0xff)
        body.write((sz >> 8) & 0xff); body.write(sz & 0xff)
      }
      body.write(0); body.write(v24Format) // status + format flags
      body.write(data, 0, data.length)
    }
    (0 until padding).foreach(_ => body.write(0))
    val bodyBytes = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v24) 4 else 3); out.write(0); out.write(0) // no flags
    val n = bodyBytes.length
    out.write((n >> 21) & 0x7f); out.write((n >> 14) & 0x7f)
    out.write((n >> 7) & 0x7f); out.write(n & 0x7f)
    out.write(bodyBytes, 0, bodyBytes.length)
    out.toByteArray
  }
}
