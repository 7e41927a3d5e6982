package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Pure-JVM PDF text extraction — the last big real-corpus payload a
  * crawl-curation pipeline meets (web crawls are full of PDFs; the
  * reference's copy/ingest tier moves them as opaque bytes,
  * gobblin-data-management/.../copy/CopyableFile.java, and has no
  * text path at all). Built from the public PDF 1.7 spec (ISO
  * 32000-1): COS object lexer, classic xref tables AND
  * cross-reference streams (/W + /Index + PNG predictors), object
  * streams (/Type /ObjStm), Flate/ASCIIHex/ASCII85/RunLength/LZW
  * filters, the page-tree walk with inherited /Resources, a content
  * stream interpreter (BT/ET, Td/TD/TD/Tm/T*, Tj/TJ/'/", Tf/TL/Tc/
  * Tw/Tz, q/Q/cm, Form XObjects, inline images skipped), and font
  * decode via ToUnicode CMaps, /Differences + the Adobe Glyph List,
  * WinAnsi/MacRoman/Standard base encodings, and Identity-H Type0
  * 2-byte codes. Layout follows the pdftotext approach: glyph
  * advances from /Widths//W track the pen; a y-jump breaks a line, an
  * x-gap over 0.15 em inserts a space.
  *
  * Loud id-tagged failures for structural corruption (bad xref,
  * overrun streams, cycles). /Encrypt documents open through the
  * standard security handler ([[PdfCrypt]]: R2-R4 RC4/AESV2, R6
  * AES-256) when the user password is EMPTY — the crawled-corpus
  * case — and password-protected files fail loudly by name;
  * unmappable glyph codes extract as U+FFFD so
  * one exotic font cannot sink a page — corpus quality scoring sees
  * the replacement density downstream.
  *
  * Scale contract: executor-local per-payload work, the JPEG/WARC
  * codec contract — no driver involvement.
  */
object PdfCodec {

  // ------------------------------------------------ COS object model

  sealed trait Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj
  final case class PNum(v: Double) extends Obj {
    def i: Int = v.toInt
    def l: Long = v.toLong
  }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  /** A bare keyword — only appears when lexing content streams. */
  final case class POp(name: String) extends Obj

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** COS lexer over a byte range. Streams are NOT consumed here (the
    * document layer owns /Length resolution); `readToken` returns
    * POp("stream") and leaves `pos` after the keyword.
    */
  final class Lexer(val b: Array[Byte], var pos: Int, val id: Long) {

    def skipWs(): Unit = {
      while (pos < b.length &&
        (isWs(b(pos) & 0xff) || (b(pos) & 0xff) == '%')) {
        if ((b(pos) & 0xff) == '%') { // comment to EOL
          while (pos < b.length && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else pos += 1
      }
    }

    def atEnd: Boolean = { skipWs(); pos >= b.length }

    private def hexVal(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1

    private def readLiteralString(): PStr = {
      val out = new ByteArrayOutputStream()
      var depth = 1
      pos += 1 // past '('
      while (depth > 0) {
        require(pos < b.length, s"media $id: unterminated PDF string")
        val c = b(pos) & 0xff
        c match {
          case '(' => depth += 1; out.write(c); pos += 1
          case ')' =>
            depth -= 1; if (depth > 0) out.write(c); pos += 1
          case '\\' =>
            require(pos + 1 < b.length, s"media $id: dangling escape")
            val e = b(pos + 1) & 0xff
            e match {
              case 'n' => out.write('\n'); pos += 2
              case 'r' => out.write('\r'); pos += 2
              case 't' => out.write('\t'); pos += 2
              case 'b' => out.write('\b'); pos += 2
              case 'f' => out.write('\f'); pos += 2
              case '(' | ')' | '\\' => out.write(e); pos += 2
              case '\r' => // line continuation, swallow optional \n
                pos += 2; if (pos < b.length && b(pos) == '\n') pos += 1
              case '\n' => pos += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0; pos += 1
                while (n < 3 && pos < b.length &&
                  b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other); pos += 2 // spec: drop backslash
            }
          case _ => out.write(c); pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def readHexString(): PStr = {
      pos += 1 // past '<'
      val out = new ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        require(pos < b.length, s"media $id: unterminated hex string")
        val c = b(pos) & 0xff
        if (c == '>') { done = true; pos += 1 }
        else {
          val v = hexVal(c)
          if (v >= 0) {
            if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
          } else require(isWs(c), s"media $id: bad hex-string byte $c")
          pos += 1
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: final digit is high nibble
      PStr(out.toByteArray)
    }

    private def readName(): PName = {
      pos += 1 // past '/'
      val sb = new StringBuilder
      while (pos < b.length && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < b.length &&
          hexVal(b(pos + 1) & 0xff) >= 0 && hexVal(b(pos + 2) & 0xff) >= 0) {
          sb.append(((hexVal(b(pos + 1) & 0xff) << 4) |
            hexVal(b(pos + 2) & 0xff)).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def readNumberOrRef(): Obj = {
      val start = pos
      if (b(pos) == '+' || b(pos) == '-') pos += 1
      var dot = false
      while (pos < b.length && ((b(pos) >= '0' && b(pos) <= '9') ||
        (b(pos) == '.' && !dot && { dot = true; true }))) pos += 1
      val s = new String(b, start, pos - start, StandardCharsets.US_ASCII)
      val v = PNum(s.toDouble)
      if (!dot && v.v >= 0 && v.v == v.v.floor) {
        // lookahead for "G R" (indirect reference)
        val save = pos
        skipWs()
        val gStart = pos
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
        if (pos > gStart) {
          val gen = new String(b, gStart, pos - gStart,
            StandardCharsets.US_ASCII).toInt
          skipWs()
          if (pos < b.length && b(pos) == 'R' &&
            (pos + 1 >= b.length || isWs(b(pos + 1) & 0xff) ||
              isDelim(b(pos + 1) & 0xff))) {
            pos += 1
            return PRef(v.i, gen)
          }
        }
        pos = save
      }
      v
    }

    // adversarial [[[[... / <<<<... nesting must fail loudly instead
    // of overflowing the parse stack
    private var nesting = 0
    private def push(): Unit = {
      nesting += 1
      require(nesting <= 64, s"media $id: PDF nesting deeper than 64")
    }

    /** Next object; content-stream keywords come back as POp. */
    def readToken(): Obj = {
      skipWs()
      require(pos < b.length, s"media $id: unexpected end of PDF data")
      val c = b(pos) & 0xff
      c match {
        case '(' => readLiteralString()
        case '/' => readName()
        case '[' =>
          push()
          pos += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while ({ require(pos < b.length, s"media $id: unterminated array")
            b(pos) != ']' }) {
            items += readToken(); skipWs()
          }
          pos += 1
          nesting -= 1
          PArr(items.result())
        case ']' | '}' | ')' | '>' =>
          if (c == '>' && pos + 1 < b.length && b(pos + 1) == '>') {
            pos += 2; POp(">>")
          } else throw new IllegalArgumentException(
            s"media $id: stray delimiter '${c.toChar}' at $pos")
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') {
            push()
            pos += 2
            val m = Map.newBuilder[String, Obj]
            var done = false
            while (!done) {
              skipWs()
              require(pos + 1 < b.length, s"media $id: unterminated dict")
              if (b(pos) == '>' && b(pos + 1) == '>') {
                pos += 2; nesting -= 1; done = true
              }
              else {
                val k = readToken()
                require(k.isInstanceOf[PName],
                  s"media $id: dict key is not a name")
                m += k.asInstanceOf[PName].v -> readToken()
              }
            }
            PDict(m.result())
          } else readHexString()
        case d if (d >= '0' && d <= '9') || d == '+' || d == '-' || d == '.' =>
          readNumberOrRef()
        case _ =>
          val start = pos
          while (pos < b.length && !isWs(b(pos) & 0xff) &&
            !isDelim(b(pos) & 0xff)) pos += 1
          new String(b, start, pos - start, StandardCharsets.US_ASCII) match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case kw if kw.nonEmpty => POp(kw)
            case _ => throw new IllegalArgumentException(
              s"media $id: cannot lex PDF byte $c at $start")
          }
      }
    }
  }

  // ---------------------------------------------------------- filters

  /** Decoded-stream budget: only content/font/CMap/xref/ObjStm
    * streams are ever decoded (images are skipped), so 64 MB is far
    * past any legitimate size — an adversarial deflate bomb fails
    * loudly instead of allocating unboundedly on an executor.
    */
  private val MaxStreamBytes = 64 * 1024 * 1024

  private def inflate(id: Long, data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          // tolerate truncated final block only if bytes were produced
          require(inf.finished() || out.size() > 0,
            s"media $id: FlateDecode stalled")
          if (!inf.finished()) return out.toByteArray
        }
        out.write(buf, 0, n)
        require(out.size() <= MaxStreamBytes,
          s"media $id: FlateDecode output exceeds the " +
            s"$MaxStreamBytes-byte stream budget (deflate bomb?)")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"media $id: corrupt FlateDecode stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  /** PNG (predictors 10-15) and TIFF (2) predictor undo — xref
    * streams use PNG Up almost universally.
    */
  private def unpredict(id: Long, data: Array[Byte], predictor: Int,
      colors: Int, bpc: Int, columns: Int): Array[Byte] = {
    if (predictor <= 1) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF horizontal
      require(bpc == 8, s"media $id: TIFF predictor needs 8 bpc")
      var r = 0
      while (r * rowLen < data.length) {
        var i = bpp
        while (i < rowLen && r * rowLen + i < data.length) {
          data(r * rowLen + i) =
            (data(r * rowLen + i) + data(r * rowLen + i - bpp)).toByte
          i += 1
        }
        r += 1
      }
      return data
    }
    // PNG: each row prefixed by a filter-type byte
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other => throw new IllegalArgumentException(
            s"media $id: PNG predictor row filter $other")
        }
        out(dst + i) = v.toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def asciiHexDecode(id: Long, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else if (!isWs(c)) {
        val v = Character.digit(c, 16)
        require(v >= 0, s"media $id: bad ASCIIHex byte $c")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  private def ascii85Decode(id: Long, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var tuple = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (!isWs(c)) {
        require(c >= '!' && c <= 'u', s"media $id: bad ASCII85 byte $c")
        tuple = tuple * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.write((tuple >> 24).toInt); out.write((tuple >> 16).toInt)
          out.write((tuple >> 8).toInt); out.write(tuple.toInt)
          tuple = 0; n = 0
        }
      }
      i += 1
    }
    if (n > 0) { // partial group: pad with 'u', emit n-1 bytes
      require(n >= 2, s"media $id: dangling ASCII85 digit")
      var k = n
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bs = Array((tuple >> 24).toByte, (tuple >> 16).toByte,
        (tuple >> 8).toByte, tuple.toByte)
      out.write(bs, 0, n - 1)
    }
    out.toByteArray
  }

  private def runLengthDecode(id: Long, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true
      else if (l < 128) {
        require(i + 1 + l + 1 <= data.length, s"media $id: RunLength overrun")
        out.write(data, i + 1, l + 1); i += l + 2
      } else {
        require(i + 1 < data.length, s"media $id: RunLength overrun")
        var k = 0
        while (k < 257 - l) { out.write(data(i + 1)); k += 1 }
        i += 2
      }
    }
    out.toByteArray
  }

  /** PDF LZW: MSB-first variable 9-12 bit codes, Clear=256, EOD=257,
    * EarlyChange=1 by default (code width bumps one code early).
    */
  private def lzwDecode(id: Long, data: Array[Byte],
      earlyChange: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dict = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def reset(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict += Array(i.toByte); i += 1 }
      dict += null; dict += null // 256 Clear, 257 EOD
    }
    reset()
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (!done) {
      while (bitCnt < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xff); bitCnt += 8; i += 1
      }
      if (bitCnt < width) done = true
      else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
        bitCnt -= width
        if (code == 257) done = true
        else if (code == 256) { reset(); width = 9; prev = null }
        else {
          val entry =
            if (code < dict.length && dict(code) != null) dict(code)
            else if (code == dict.length && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(
              s"media $id: bad LZW code $code")
          out.write(entry, 0, entry.length)
          require(out.size() <= MaxStreamBytes,
            s"media $id: LZWDecode output exceeds the stream budget")
          if (prev != null && dict.length < 4096) dict += (prev :+ entry(0))
          prev = entry
          if (dict.length + earlyChange >= (1 << width) && width < 12)
            width += 1
        }
      }
    }
    out.toByteArray
  }

  // ----------------------------------------------------- the document

  private sealed trait XrefEntry
  private final case class AtOffset(off: Long) extends XrefEntry
  private final case class InObjStm(stm: Int, idx: Int) extends XrefEntry

  /** Random-access document: xref chain resolved eagerly (bounded),
    * objects parsed lazily with a small cache. All offsets are
    * validated against the buffer; cycles in the /Prev chain, the
    * page tree and Form XObject recursion are guarded.
    */
  final class Doc(val id: Long, val bytes: Array[Byte]) {
    require(bytes.length >= 8 &&
      new String(bytes, 0, 5, StandardCharsets.US_ASCII) == "%PDF-",
      s"media $id: not a PDF (missing %%PDF- header)")

    private val xref = scala.collection.mutable.Map.empty[Int, XrefEntry]
    private[this] var trailerDict: Map[String, Obj] = Map.empty
    private val cache = scala.collection.mutable.Map.empty[Int, Obj]
    private val inFlight = scala.collection.mutable.Set.empty[Int]
    private[this] var crypt: Option[PdfCrypt.State] = None
    private[this] var encryptObjNum: Int = -1

    locally {
      val tail = new String(bytes,
        math.max(0, bytes.length - 2048),
        math.min(2048, bytes.length), StandardCharsets.ISO_8859_1)
      val sx = tail.lastIndexOf("startxref")
      require(sx >= 0, s"media $id: no startxref")
      val numStart = math.max(0, bytes.length - 2048) + sx + 9
      val lx = new Lexer(bytes, numStart, id)
      val first = lx.readToken() match {
        case n: PNum => n.l
        case _ => throw new IllegalArgumentException(
          s"media $id: bad startxref offset")
      }
      var next = first
      var hops = 0
      val seen = scala.collection.mutable.Set.empty[Long]
      while (next >= 0) {
        require(hops < 64 && seen.add(next),
          s"media $id: xref /Prev chain cycle or >64 sections")
        hops += 1
        next = readXrefSection(next)
      }
      require(trailerDict.contains("Root"), s"media $id: trailer has no /Root")
      trailerDict.get("Encrypt").foreach(initCrypt)
    }

    /** Standard-security-handler setup (empty user password only;
      * password-protected documents fail loudly by name). The
      * /Encrypt dictionary itself and /ID strings are parsed while
      * `crypt` is still None, so they are never "decrypted".
      */
    private def initCrypt(encRef: Obj): Unit = {
      encryptObjNum = encRef match {
        case PRef(n, _) => n
        case _ => -1
      }
      val enc = resolve(encRef) match {
        case d: PDict => d
        case o => throw new IllegalArgumentException(
          s"media $id: /Encrypt is $o, not a dictionary")
      }
      def num(k: String, dflt: Long): Long =
        resolve(enc.get(k).getOrElse(PNull)) match {
          case n: PNum => n.l
          case _ => dflt
        }
      def str(k: String): Array[Byte] =
        resolve(enc.get(k).getOrElse(PNull)) match {
          case PStr(b) => b
          case _ => Array.emptyByteArray
        }
      val filter = resolve(enc.get("Filter").getOrElse(PNull))
      require(filter == PName("Standard"),
        s"media $id: PDF security handler $filter unsupported (Standard only)")
      val v = num("V", 0).toInt
      val r = num("R", 0).toInt
      val cfm =
        if (v < 4) "V2"
        else {
          // /CF <</StdCF <</CFM ...>>>> with /StmF//StrF naming StdCF
          val cf = resolve(enc.get("CF").getOrElse(PNull)) match {
            case d: PDict => d
            case _ => PDict(Map.empty)
          }
          val stdcf = resolve(cf.get("StdCF").getOrElse(PNull)) match {
            case d: PDict => d
            case _ => PDict(Map.empty)
          }
          Seq("StmF", "StrF").foreach { k =>
            val f = resolve(enc.get(k).getOrElse(PName("Identity")))
            require(f == PName("StdCF"),
              s"media $id: PDF /$k $f unsupported (StdCF only)")
          }
          resolve(stdcf.get("CFM").getOrElse(PNull)) match {
            case PName(m) => m
            case o => throw new IllegalArgumentException(
              s"media $id: PDF /CFM missing ($o)")
          }
        }
      val encryptMetadata = resolve(enc.get("EncryptMetadata")
        .getOrElse(PBool(true))) match {
        case PBool(b) => b
        case _ => true
      }
      val id0 = resolve(trailerDict.getOrElse("ID", PNull)) match {
        case PArr(items) if items.nonEmpty => resolve(items.head) match {
          case PStr(b) => b
          case _ => Array.emptyByteArray
        }
        case _ => Array.emptyByteArray
      }
      crypt = Some(PdfCrypt.init(id, v, r, num("Length", 40).toInt,
        num("P", -1), str("O"), str("U"), str("UE"), cfm,
        encryptMetadata, id0))
    }

    /** Decrypt every string and stream payload of a directly-stored
      * object (objects INSIDE object streams are plaintext per spec;
      * xref streams are never encrypted).
      */
    private def decryptTree(o: Obj, num: Int, gen: Int): Obj = o match {
      case PStr(b) =>
        PStr(PdfCrypt.decrypt(id, crypt.get, num, gen, b))
      case PDict(m) =>
        PDict(m.map { case (k, v) => k -> decryptTree(v, num, gen) })
      case PArr(items) => PArr(items.map(decryptTree(_, num, gen)))
      case PStream(d, raw) =>
        val nd = decryptTree(d, num, gen).asInstanceOf[PDict]
        val isXref = d.get("Type").contains(PName("XRef"))
        PStream(nd, if (isXref) raw
        else PdfCrypt.decrypt(id, crypt.get, num, gen, raw))
      case x => x
    }

    /** Parse one xref section (classic table or xref stream) at
      * `off`; merge entries (earlier sections win — they are newer in
      * the chain walk) and the trailer; return /Prev or -1.
      */
    private def readXrefSection(off: Long): Long = {
      require(off >= 0 && off < bytes.length,
        s"media $id: xref offset $off outside file")
      val lx = new Lexer(bytes, off.toInt, id)
      lx.readToken() match {
        case POp("xref") => // classic table
          var done = false
          while (!done) {
            lx.skipWs()
            val save = lx.pos
            lx.readToken() match {
              case POp("trailer") => done = true
              case first: PNum =>
                val count = lx.readToken().asInstanceOf[PNum].i
                var k = 0
                while (k < count) {
                  lx.skipWs()
                  // fixed 20-byte entries: "nnnnnnnnnn ggggg n\r\n"
                  val o = new String(lx.b, lx.pos, 10,
                    StandardCharsets.US_ASCII).toLong
                  val ty = lx.b(lx.pos + 17).toChar
                  val num = first.i + k
                  if (ty == 'n' && !xref.contains(num))
                    xref(num) = AtOffset(o)
                  lx.pos += 18
                  k += 1
                }
              case other => throw new IllegalArgumentException(
                s"media $id: unexpected $other in xref table at $save")
            }
          }
          val tr = lx.readToken().asInstanceOf[PDict]
          mergeTrailer(tr.m)
          tr.get("XRefStm") match {
            // hybrid-reference file: the xref stream carries the
            // compressed-object entries the table cannot express
            case Some(n: PNum) => readXrefSection(n.l)
            case _ => ()
          }
          tr.get("Prev") match {
            case Some(n: PNum) => n.l
            case _ => -1L
          }
        case _: PNum => // "N G obj" — an xref STREAM object
          val stream = parseObjectAt(off.toInt)._3 match {
            case s: PStream => s
            case other => throw new IllegalArgumentException(
              s"media $id: xref offset points at $other")
          }
          val d = stream.dict
          require(d.get("Type").contains(PName("XRef")),
            s"media $id: xref stream without /Type /XRef")
          val data = decodeStream(stream)
          val w = d.get("W") match {
            case Some(PArr(ws)) => ws.map(_.asInstanceOf[PNum].i)
            case _ => throw new IllegalArgumentException(
              s"media $id: xref stream missing /W")
          }
          require(w.length >= 3 && w.forall(x => x >= 0 && x <= 8),
            s"media $id: bad xref /W $w")
          val size = d.get("Size") match {
            case Some(n: PNum) => n.i
            case _ => throw new IllegalArgumentException(
              s"media $id: xref stream missing /Size")
          }
          val index: Seq[(Int, Int)] = d.get("Index") match {
            case Some(PArr(ix)) =>
              ix.grouped(2).map { p =>
                (p(0).asInstanceOf[PNum].i, p(1).asInstanceOf[PNum].i)
              }.toSeq
            case _ => Seq((0, size))
          }
          val rowLen = w.sum
          var p = 0
          def field(len: Int): Long = {
            var v = 0L
            var k = 0
            while (k < len) { v = (v << 8) | (data(p) & 0xff); p += 1; k += 1 }
            v
          }
          index.foreach { case (start, count) =>
            var k = 0
            while (k < count && p + rowLen <= data.length) {
              val t = if (w(0) == 0) 1L else field(w(0))
              val f2 = field(w(1))
              val f3 = field(w(2))
              val num = start + k
              if (!xref.contains(num)) t match {
                case 1 => xref(num) = AtOffset(f2)
                case 2 => xref(num) = InObjStm(f2.toInt, f3.toInt)
                case _ => () // type 0 = free
              }
              k += 1
            }
          }
          mergeTrailer(d.m)
          d.get("Prev") match {
            case Some(n: PNum) => n.l
            case _ => -1L
          }
        case other => throw new IllegalArgumentException(
          s"media $id: no xref at offset $off (found $other)")
      }
    }

    private def mergeTrailer(m: Map[String, Obj]): Unit =
      // earlier (newer) sections win
      trailerDict = m ++ trailerDict

    /** Parse "N G obj <object> [stream...endstream] endobj" at a byte
      * offset; returns (number, object).
      */
    private def parseObjectAt(off: Int): (Int, Int, Obj) = {
      require(off >= 0 && off < bytes.length,
        s"media $id: object offset $off outside file")
      val lx = new Lexer(bytes, off, id)
      val num = lx.readToken() match {
        case n: PNum => n.i
        case o => throw new IllegalArgumentException(
          s"media $id: expected object number at $off, got $o")
      }
      val gen = lx.readToken() match {
        case n: PNum => n.i
        case _ => 0
      }
      require(lx.readToken() == POp("obj"),
        s"media $id: missing 'obj' keyword at $off")
      val body = lx.readToken()
      lx.skipWs()
      val obj = body match {
        case d: PDict =>
          val save = lx.pos
          lx.readToken() match {
            case POp("stream") =>
              // EOL after 'stream': CRLF or LF
              var p = lx.pos
              if (p < bytes.length && bytes(p) == '\r') p += 1
              if (p < bytes.length && bytes(p) == '\n') p += 1
              val len = resolve(d.get("Length").getOrElse(PNull)) match {
                case n: PNum => n.i
                case _ => throw new IllegalArgumentException(
                  s"media $id: stream of object $num has no /Length")
              }
              require(len >= 0 && p + len <= bytes.length,
                s"media $id: stream of object $num overruns the file")
              PStream(d, java.util.Arrays.copyOfRange(bytes, p, p + len))
            case _ => lx.pos = save; d
          }
        case other => other
      }
      (num, gen, obj)
    }

    /** Fetch object `num`, through object streams if needed. A
      * corrupted xref can point an object INTO an ObjStm whose own
      * stream object resolves back through it — guard the recursion
      * or it overflows the stack instead of failing loudly.
      */
    def obj(num: Int): Obj = cache.get(num).getOrElse {
      require(inFlight.add(num),
        s"media $id: object $num resolves through itself (xref cycle)")
      val resolvedObj = try objUncached(num) finally inFlight.remove(num)
      cache(num) = resolvedObj
      resolvedObj
    }

    private def objUncached(num: Int): Obj = {
      xref.get(num) match {
        case None => PNull // spec: missing object is null
        case Some(AtOffset(off)) =>
          val (n, g, o) = parseObjectAt(off.toInt)
          require(n == num,
            s"media $id: xref says object $num at $off but found $n")
          // decrypt strings/streams of directly-stored objects (the
          // /Encrypt dictionary itself stays as stored)
          if (crypt.isDefined && num != encryptObjNum) decryptTree(o, num, g)
          else o
        case Some(InObjStm(stmNum, idx)) =>
          val stm = obj(stmNum) match {
            case s: PStream => s
            case o => throw new IllegalArgumentException(
              s"media $id: object stream $stmNum is $o")
          }
          require(stm.dict.get("Type").contains(PName("ObjStm")),
            s"media $id: object $num points into non-ObjStm $stmNum")
          val data = decodeStream(stm)
          val n = resolve(stm.dict.get("N").getOrElse(PNull))
            .asInstanceOf[PNum].i
          val first = resolve(stm.dict.get("First").getOrElse(PNull))
            .asInstanceOf[PNum].i
          val lx = new Lexer(data, 0, id)
          var found: Obj = null
          var foundNum = -1
          var k = 0
          var offInStm = -1
          while (k < n && found == null) {
            val objNum = lx.readToken().asInstanceOf[PNum].i
            val objOff = lx.readToken().asInstanceOf[PNum].i
            if (k == idx) { foundNum = objNum; offInStm = first + objOff }
            k += 1
          }
          require(offInStm >= 0 && foundNum == num,
            s"media $id: object $num not at index $idx of ObjStm $stmNum")
          new Lexer(data, offInStm, id).readToken()
      }
    }

    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => resolve(obj(n))
      case x => x
    }

    /** Decoded stream bytes: the full /Filter (+/DecodeParms) chain. */
    def decodeStream(s: PStream): Array[Byte] = {
      val filters: Seq[String] = resolve(s.dict.get("Filter").getOrElse(PNull)) match {
        case PNull => Seq.empty
        case PName(n) => Seq(n)
        case PArr(fs) => fs.map(f => resolve(f).asInstanceOf[PName].v)
        case o => throw new IllegalArgumentException(
          s"media $id: bad /Filter $o")
      }
      val parms: Seq[Option[PDict]] =
        resolve(s.dict.get("DecodeParms")
          .orElse(s.dict.get("DP")).getOrElse(PNull)) match {
          case PNull => Seq.fill(filters.length)(None)
          case d: PDict => Some(d) +: Seq.fill(math.max(0, filters.length - 1))(None)
          case PArr(ps) => ps.map(p => resolve(p) match {
            case d: PDict => Some(d)
            case _ => None
          })
          case _ => Seq.fill(filters.length)(None)
        }
      var data = s.raw
      filters.zipWithIndex.foreach { case (f, i) =>
        val pm = if (i < parms.length) parms(i) else None
        def parmInt(k: String, dflt: Int): Int =
          pm.flatMap(_.get(k)).map(o => resolve(o).asInstanceOf[PNum].i)
            .getOrElse(dflt)
        data = f match {
          case "FlateDecode" | "Fl" =>
            unpredict(id, inflate(id, data), parmInt("Predictor", 1),
              parmInt("Colors", 1), parmInt("BitsPerComponent", 8),
              parmInt("Columns", 1))
          case "LZWDecode" | "LZW" =>
            unpredict(id, lzwDecode(id, data, parmInt("EarlyChange", 1)),
              parmInt("Predictor", 1), parmInt("Colors", 1),
              parmInt("BitsPerComponent", 8), parmInt("Columns", 1))
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(id, data)
          case "ASCII85Decode" | "A85" => ascii85Decode(id, data)
          case "RunLengthDecode" | "RL" => runLengthDecode(id, data)
          case other => throw new IllegalArgumentException(
            s"media $id: unsupported stream filter /$other")
        }
      }
      data
    }

    def trailer: Map[String, Obj] = trailerDict

    /** The page dictionaries in document order, with inheritable
      * attributes (/Resources, /MediaBox, /Rotate) merged down.
      */
    def pages: Seq[PDict] = {
      val root = resolve(trailerDict("Root")) match {
        case d: PDict => d
        case o => throw new IllegalArgumentException(
          s"media $id: /Root is $o")
      }
      val top = resolve(root.get("Pages").getOrElse(PNull)) match {
        case d: PDict => d
        case o => throw new IllegalArgumentException(
          s"media $id: catalog /Pages is $o")
      }
      val out = Seq.newBuilder[PDict]
      val visited = scala.collection.mutable.Set.empty[Int]
      val Inherited = Seq("Resources", "MediaBox", "Rotate", "CropBox")
      def walk(node: PDict, inh: Map[String, Obj], depth: Int): Unit = {
        require(depth <= 64, s"media $id: page tree deeper than 64")
        val merged = inh ++ node.m.view.filterKeys(Inherited.contains).toMap
        resolve(node.get("Type").getOrElse(PNull)) match {
          case PName("Page") =>
            out += PDict(merged ++ node.m)
          case _ => // Pages (or untyped intermediate)
            resolve(node.get("Kids").getOrElse(PNull)) match {
              case PArr(kids) => kids.foreach { k =>
                k match {
                  case PRef(n, _) =>
                    require(visited.add(n),
                      s"media $id: page-tree cycle at object $n")
                  case _ => ()
                }
                resolve(k) match {
                  case d: PDict => walk(d, merged, depth + 1)
                  case o => throw new IllegalArgumentException(
                    s"media $id: page-tree kid is $o")
                }
              }
              case o => throw new IllegalArgumentException(
                s"media $id: /Kids is $o")
            }
        }
      }
      walk(top, Map.empty, 0)
      out.result()
    }
  }
}
