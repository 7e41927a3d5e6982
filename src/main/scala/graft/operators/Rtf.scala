package graft.operators

/** RTF text extraction, pure JVM — the third common office text
  * format in crawled corpora beside DOCX/ODT ([[OfficeText]]) and PDF
  * ([[PdfText]]). Built from the public RTF 1.9 specification: group
  * stack with inherited state, control-word dispatch, \'hh cp1252
  * escapes, \uN unicode with \ucN skip counts, \binN raw-byte skips,
  * destination groups (font/color tables, pict, info, field
  * instructions) dropped while field RESULTS are kept.
  *
  * Reference semantics: the reference's text converters stop at
  * flat/JSON text (`gobblin-core/.../converter/string/`); RTF is part
  * of this engine's LLM-curation document tier.
  */
object RtfText {

  def isRtf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '{' && b(1) == '\\' && b(2) == 'r' &&
      b(3) == 't' && b(4) == 'f'

  /** cp1252's 0x80-0x9f block (the rest is latin-1-identical). */
  private val Cp1252High: Array[Char] = Array(
    '\u20ac', '\u0081', '\u201a', '\u0192', '\u201e', '\u2026',
    '\u2020', '\u2021', '\u02c6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u008d', '\u017d', '\u008f', '\u0090', '\u2018',
    '\u2019', '\u201c', '\u201d', '\u2022', '\u2013', '\u2014',
    '\u02dc', '\u2122', '\u0161', '\u203a', '\u0153', '\u009d',
    '\u017e', '\u0178')

  /** Destination control words whose whole group is dropped. `field`
    * is handled specially (instructions dropped, result kept).
    */
  private val SkipDest = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "fldinst", "xe", "tc", "footnote", "themedata",
    "colorschememapping", "datastore", "latentstyles", "listtable",
    "listoverridetable", "generator", "wgrffmtfilter")

  private final case class GState(uc: Int, skip: Boolean)

  def extract(id: Long, bytes: Array[Byte]): String = {
    require(isRtf(bytes), s"media $id: not an RTF payload")
    val sb = new StringBuilder
    val stack = scala.collection.mutable.Stack[GState]()
    var cur = GState(uc = 1, skip = false)
    var i = 0
    val n = bytes.length
    var pendingUnicodeSkip = 0
    var depth = 0
    def ch(o: Int): Char = (bytes(o) & 0xff).toChar
    def emit(c: Char): Unit =
      if (!cur.skip) {
        if (pendingUnicodeSkip > 0) pendingUnicodeSkip -= 1
        else sb.append(c)
      }
    while (i < n) {
      ch(i) match {
        case '{' =>
          stack.push(cur)
          depth += 1
          i += 1
        case '}' =>
          require(stack.nonEmpty, s"media $id: RTF group underflow at $i")
          cur = stack.pop()
          depth -= 1
          i += 1
        case '\\' =>
          require(i + 1 < n, s"media $id: RTF dangling backslash")
          val c1 = ch(i + 1)
          if (c1 == '\'') {
            require(i + 3 < n, s"media $id: RTF truncated hex escape")
            val hex = try Integer.parseInt(new String(bytes, i + 2, 2, "ASCII"), 16)
              catch { case _: NumberFormatException => throw new IllegalArgumentException(
                s"media $id: RTF bad hex escape at $i") }
            emit(if (hex >= 0x80 && hex <= 0x9f) Cp1252High(hex - 0x80)
            else hex.toChar)
            i += 4
          } else if (c1 == '{' || c1 == '}' || c1 == '\\') {
            emit(c1); i += 2
          } else if (c1 == '~') { emit('\u00a0'); i += 2 } // non-breaking space
          else if (c1 == '_') { emit('\u2011'); i += 2 } // non-breaking hyphen
          else if (c1 == '-') { i += 2 } // optional hyphen: drop
          else if (c1 == '*') {
            // {\*\dest ...}: unknown starred destinations are skipped
            // (the spec's forward-compat rule); the group's state flag
            // does it — unless the following word is a known keeper
            i += 2
            // peek the control word
            var j = i
            if (j < n && ch(j) == '\\') {
              j += 1
              val s = j
              while (j < n && ch(j).isLetter) j += 1
              val word = new String(bytes, s, j - s, "ASCII")
              if (word != "fldrslt") cur = cur.copy(skip = true)
            } else cur = cur.copy(skip = true)
          } else if (c1.isLetter) {
            var j = i + 1
            val s = j
            while (j < n && ch(j).isLetter) j += 1
            val word = new String(bytes, s, j - s, "ASCII")
            var param = 0L
            var hasParam = false
            var neg = false
            if (j < n && (ch(j) == '-' || ch(j).isDigit)) {
              hasParam = true
              if (ch(j) == '-') { neg = true; j += 1 }
              val ps = j
              while (j < n && ch(j).isDigit) j += 1
              require(j - ps <= 10, s"media $id: RTF parameter overlong")
              if (j > ps) param = new String(bytes, ps, j - ps, "ASCII").toLong
              if (neg) param = -param
            }
            if (j < n && ch(j) == ' ') j += 1 // delimiter space consumed
            word match {
              case "par" | "line" | "sect" | "page" => emit('\n')
              case "tab" | "cell" => emit('\t')
              case "row" => emit('\n')
              case "emdash" => emit('—')
              case "endash" => emit('–')
              case "lquote" => emit('‘')
              case "rquote" => emit('’')
              case "ldblquote" => emit('“')
              case "rdblquote" => emit('”')
              case "bullet" => emit('•')
              case "uc" => cur = cur.copy(uc = math.max(0, param.toInt))
              case "u" =>
                if (!cur.skip) {
                  val cp = (if (param < 0) param + 65536 else param).toInt
                  sb.append(cp.toChar)
                  pendingUnicodeSkip = cur.uc
                }
              case "bin" =>
                val skip = math.max(0L, param)
                require(j + skip <= n, s"media $id: RTF \\bin overruns payload")
                j += skip.toInt
              case w if SkipDest(w) => cur = cur.copy(skip = true)
              case _ => // formatting word: no text effect
            }
            i = j
          } else {
            // control symbol with no text meaning
            i += 2
          }
        case '\r' | '\n' => i += 1 // raw newlines are ignored in RTF
        case c =>
          emit(c)
          i += 1
      }
    }
    require(depth == 0, s"media $id: RTF unbalanced groups (depth $depth at EOF)")
    sb.toString
  }

  /** Write an RTF document from paragraphs — escapes specials, maps
    * non-ASCII to \uN with a skip char, splits paragraphs with \par,
    * and carries the metadata groups (\fonttbl, \info) a real editor
    * emits so extraction must skip them.
    */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1")
    sb.append("{\\fonttbl{\\f0\\fswiss\\fcharset0 Helvetica;}}")
    sb.append("{\\colortbl;\\red0\\green0\\blue0;}")
    sb.append("{\\*\\generator graft 1.0;}")
    sb.append("{\\info{\\title synthetic}}")
    sb.append("\\f0\\fs24 ")
    paragraphs.zipWithIndex.foreach { case (p, idx) =>
      if (idx > 0) sb.append("\\par ")
      p.foreach {
        case '\\' => sb.append("\\\\")
        case '{' => sb.append("\\{")
        case '}' => sb.append("\\}")
        case '\t' => sb.append("\\tab ")
        case '\n' => sb.append("\\line ")
        case c if c < 0x80 => sb.append(c)
        case c =>
          val v = c.toInt
          sb.append("\\u").append(if (v > 32767) v - 65536 else v).append("?")
      }
    }
    sb.append("}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }
}
