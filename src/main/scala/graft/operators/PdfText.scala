package graft.operators

import java.nio.charset.StandardCharsets
import PdfCodec._

/** Text extraction over [[PdfCodec]]'s document model: font decode
  * (ToUnicode CMaps, /Differences + Adobe Glyph List names, WinAnsi/
  * MacRoman/Standard base encodings, Identity-H Type0), glyph-width
  * pen tracking from /Widths//W, and the content-stream interpreter.
  * Layout is the pdftotext approach reduced to two deterministic
  * rules: a baseline jump over half the font size breaks the line; a
  * pen gap over 0.15 em inserts a space (TeX writes inter-word space
  * as TJ kern adjustments, not space glyphs — the gap rule recovers
  * them; sub-0.15-em kerning inside a word stays glued).
  */
object PdfText {

  final case class PdfDocText(nPages: Int, pages: Seq[String]) {
    def text: String = pages.mkString("\n")
  }

  // ------------------------------------------------ glyph-name table

  /** The Adobe Glyph List subset real corpora hit: ASCII names,
    * typographic punctuation, f-ligatures, and Latin-1 accents
    * (es/de/fr coverage). `uniXXXX`/`uXXXX` parse programmatically.
    */
  private val Agl: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    // ASCII letter/digit names are themselves
    ('a' to 'z').foreach(c => m += c.toString -> c.toString)
    ('A' to 'Z').foreach(c => m += c.toString -> c.toString)
    Seq("zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9",
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~",
      "quoteright" -> "’", "quoteleft" -> "‘",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—",
      "bullet" -> "•", "periodcentered" -> "·",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "ellipsis" -> "…", "fraction" -> "⁄",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
      "florin" -> "ƒ", "section" -> "§",
      "currency" -> "¤", "copyright" -> "©",
      "registered" -> "®", "trademark" -> "™",
      "degree" -> "°", "plusminus" -> "±",
      "multiply" -> "×", "divide" -> "÷", "mu" -> "µ",
      "paragraph" -> "¶", "brokenbar" -> "¦",
      "logicalnot" -> "¬", "macron" -> "¯",
      "acute" -> "´", "cedilla" -> "¸",
      "dieresis" -> "¨", "circumflex" -> "ˆ",
      "tilde" -> "˜", "caron" -> "ˇ", "breve" -> "˘",
      "dotaccent" -> "˙", "ring" -> "˚",
      "hungarumlaut" -> "˝", "ogonek" -> "˛",
      "fi" -> "fi", "fl" -> "fl", "ff" -> "ff",
      "ffi" -> "ffi", "ffl" -> "ffl",
      "germandbls" -> "ß", "ae" -> "æ", "AE" -> "Æ",
      "oe" -> "œ", "OE" -> "Œ", "oslash" -> "ø",
      "Oslash" -> "Ø", "thorn" -> "þ", "Thorn" -> "Þ",
      "eth" -> "ð", "Eth" -> "Ð",
      "dotlessi" -> "ı", "Lslash" -> "Ł",
      "lslash" -> "ł", "Zcaron" -> "Ž", "zcaron" -> "ž",
      "Scaron" -> "Š", "scaron" -> "š",
      "Ydieresis" -> "Ÿ", "Euro" -> "€",
      "minus" -> "−", "nbspace" -> " ",
      "sfthyphen" -> "­", "middot" -> "·",
      "perthousand" -> "‰", "onesuperior" -> "¹",
      "twosuperior" -> "²", "threesuperior" -> "³",
      "onequarter" -> "¼", "onehalf" -> "½",
      "threequarters" -> "¾", "ordfeminine" -> "ª",
      "ordmasculine" -> "º").foreach(m += _)
    // Latin-1 accented letters: build names programmatically
    val accents = Seq("grave" -> Map('a' -> 0xe0, 'e' -> 0xe8, 'i' -> 0xec,
      'o' -> 0xf2, 'u' -> 0xf9, 'A' -> 0xc0, 'E' -> 0xc8, 'I' -> 0xcc,
      'O' -> 0xd2, 'U' -> 0xd9),
      "acute" -> Map('a' -> 0xe1, 'e' -> 0xe9, 'i' -> 0xed, 'o' -> 0xf3,
        'u' -> 0xfa, 'y' -> 0xfd, 'A' -> 0xc1, 'E' -> 0xc9, 'I' -> 0xcd,
        'O' -> 0xd3, 'U' -> 0xda, 'Y' -> 0xdd),
      "circumflex" -> Map('a' -> 0xe2, 'e' -> 0xea, 'i' -> 0xee,
        'o' -> 0xf4, 'u' -> 0xfb, 'A' -> 0xc2, 'E' -> 0xca, 'I' -> 0xce,
        'O' -> 0xd4, 'U' -> 0xdb),
      "dieresis" -> Map('a' -> 0xe4, 'e' -> 0xeb, 'i' -> 0xef,
        'o' -> 0xf6, 'u' -> 0xfc, 'y' -> 0xff, 'A' -> 0xc4, 'E' -> 0xcb,
        'I' -> 0xcf, 'O' -> 0xd6, 'U' -> 0xdc),
      "tilde" -> Map('a' -> 0xe3, 'n' -> 0xf1, 'o' -> 0xf5, 'A' -> 0xc3,
        'N' -> 0xd1, 'O' -> 0xd5),
      "ring" -> Map('a' -> 0xe5, 'A' -> 0xc5),
      "cedilla" -> Map('c' -> 0xe7, 'C' -> 0xc7))
    accents.foreach { case (suffix, letters) =>
      letters.foreach { case (l, cp) =>
        m += s"$l$suffix" -> cp.toChar.toString
      }
    }
    m.result()
  }

  private def glyphToUnicode(name: String): Option[String] =
    Agl.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7)
        try Some(new String(name.drop(3).grouped(4)
          .map(h => Integer.parseInt(h, 16).toChar).toArray))
        catch { case _: NumberFormatException => None }
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
        try Some(new String(Character.toChars(Integer.parseInt(name.drop(1), 16))))
        catch { case _: Exception => None }
      else None
    }

  // --------------------------------------------------- base encodings

  /** code -> text for WinAnsi (cp1252). */
  private val WinAnsi: Array[String] = {
    val t = new Array[String](256)
    (32 to 126).foreach(c => t(c) = c.toChar.toString)
    (160 to 255).foreach(c => t(c) = c.toChar.toString)
    Seq(128 -> "€", 130 -> "‚", 131 -> "ƒ", 132 -> "„",
      133 -> "…", 134 -> "†", 135 -> "‡", 136 -> "ˆ",
      137 -> "‰", 138 -> "Š", 139 -> "‹", 140 -> "Œ",
      142 -> "Ž", 145 -> "‘", 146 -> "’", 147 -> "“",
      148 -> "”", 149 -> "•", 150 -> "–", 151 -> "—",
      152 -> "˜", 153 -> "™", 154 -> "š", 155 -> "›",
      156 -> "œ", 158 -> "ž", 159 -> "Ÿ")
      .foreach { case (c, s) => t(c) = s }
    t
  }

  /** StandardEncoding: ASCII with Adobe's quote quirks; the high
    * range holds punctuation/ligatures by name.
    */
  private val Standard: Array[String] = {
    val t = new Array[String](256)
    (32 to 126).foreach(c => t(c) = c.toChar.toString)
    t(39) = "’"; t(96) = "‘"
    Seq(161 -> "¡", 162 -> "¢", 163 -> "£", 164 -> "⁄",
      165 -> "¥", 166 -> "ƒ", 167 -> "§", 168 -> "¤",
      169 -> "'", 170 -> "“", 171 -> "«", 172 -> "‹",
      173 -> "›", 174 -> "fi", 175 -> "fl", 177 -> "–",
      178 -> "†", 179 -> "‡", 180 -> "·", 182 -> "¶",
      183 -> "•", 184 -> "‚", 185 -> "„", 186 -> "”",
      187 -> "»", 188 -> "…", 189 -> "‰", 191 -> "¿",
      193 -> "`", 194 -> "´", 195 -> "ˆ", 196 -> "˜",
      197 -> "¯", 198 -> "˘", 199 -> "˙", 200 -> "¨",
      202 -> "˚", 203 -> "¸", 205 -> "˝", 206 -> "˛",
      207 -> "ˇ", 208 -> "—", 225 -> "Æ", 227 -> "ª",
      232 -> "Ł", 233 -> "Ø", 234 -> "Œ", 235 -> "º",
      241 -> "æ", 245 -> "ı", 248 -> "ł", 249 -> "ø",
      250 -> "œ", 251 -> "ß")
      .foreach { case (c, s) => t(c) = s }
    t
  }

  /** MacRomanEncoding's high range. */
  private val MacRoman: Array[String] = {
    val t = new Array[String](256)
    (32 to 126).foreach(c => t(c) = c.toChar.toString)
    val hi = "ÄÅÇÉÑÖÜáàâäãåçéèêëíìîïñóòôöõúùûü†°¢£§•¶ß®©™´¨≠ÆØ∞±≤≥¥µ∂∑∏π∫ªºΩæø" +
      "¿¡¬√ƒ≈∆«»… ÀÃÕŒœ–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔ�ÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ"
    var c = 128
    var i = 0
    while (c < 256 && i < hi.length) {
      t(c) = hi.charAt(i).toString
      c += 1; i += 1
    }
    t
  }

  // ----------------------------------------------------------- fonts

  private final case class Font(
      twoByte: Boolean,
      toUnicode: Map[Int, String],
      baseMap: Array[String], // null for Type0
      diffs: Map[Int, String],
      widths: Map[Int, Double],
      defaultWidth: Double) {
    def decode(code: Int): String =
      toUnicode.getOrElse(code,
        diffs.get(code).flatMap(glyphToUnicode).getOrElse {
          val base =
            if (baseMap != null && code >= 0 && code < 256) baseMap(code)
            else null
          if (base != null) base else "�"
        })
    def width(code: Int): Double = widths.getOrElse(code, defaultWidth)
  }

  /** Parse a ToUnicode CMap stream: bfchar + bfrange (both dst forms),
    * UTF-16BE destinations.
    */
  private def parseToUnicode(id: Long, data: Array[Byte]): Map[Int, String] = {
    val lx = new Lexer(data, 0, id)
    val out = Map.newBuilder[Int, String]
    def codeOf(o: Obj): Int = o match {
      case PStr(bs) =>
        var v = 0
        bs.foreach(b => v = (v << 8) | (b & 0xff))
        v
      case n: PNum => n.i
      case other => throw new IllegalArgumentException(
        s"media $id: CMap code is $other")
    }
    def dstOf(o: Obj): String = o match {
      case PStr(bs) => new String(bs, StandardCharsets.UTF_16BE)
      case PName(n) => glyphToUnicode(n).getOrElse("�")
      case other => throw new IllegalArgumentException(
        s"media $id: CMap dst is $other")
    }
    val pending = new scala.collection.mutable.ArrayBuffer[Obj]
    while (!lx.atEnd) {
      lx.readToken() match {
        case POp("beginbfchar") =>
          var done = false
          while (!done) {
            lx.readToken() match {
              case POp("endbfchar") => done = true
              case src =>
                out += codeOf(src) -> dstOf(lx.readToken())
            }
          }
        case POp("beginbfrange") =>
          var done = false
          while (!done) {
            lx.readToken() match {
              case POp("endbfrange") => done = true
              case lo =>
                val hi = codeOf(lx.readToken())
                val loC = codeOf(lo)
                lx.readToken() match {
                  case PArr(dsts) =>
                    var c = loC
                    dsts.foreach { d => out += c -> dstOf(d); c += 1 }
                  case d =>
                    val base = dstOf(d)
                    var c = loC
                    while (c <= hi) {
                      // increment the LAST UTF-16 unit, per the spec
                      val s =
                        if (base.isEmpty) base
                        else base.init +
                          (base.last + (c - loC)).toChar
                      out += c -> s
                      c += 1
                    }
                }
            }
          }
        case _ => pending.clear() // other CMap sections: ignore
      }
    }
    out.result()
  }

  /** Type0 /W array: [ c [w1 w2 ...] | cFirst cLast w ]* */
  private def parseCidWidths(doc: Doc, arr: PArr): Map[Int, Double] = {
    val out = Map.newBuilder[Int, Double]
    var i = 0
    val it = arr.items.map(doc.resolve)
    while (i < it.length) {
      val c = it(i).asInstanceOf[PNum].i
      it(i + 1) match {
        case PArr(ws) =>
          ws.zipWithIndex.foreach { case (w, k) =>
            out += (c + k) -> doc.resolve(w).asInstanceOf[PNum].v
          }
          i += 2
        case last: PNum =>
          val w = it(i + 2).asInstanceOf[PNum].v
          var k = c
          while (k <= last.i) { out += k -> w; k += 1 }
          i += 3
        case other => throw new IllegalArgumentException(
          s"media ${doc.id}: bad /W element $other")
      }
    }
    out.result()
  }

  /** The BUILT-IN encoding of an embedded Type1 font program
    * (/FontFile): TeX fonts carry custom layouts as cleartext
    * `dup <code> /<name> put` lines before `eexec` — without them the
    * Standard fallback misreads every repositioned glyph (this is how
    * pdftotext resolves CM-font text). Used only when the font dict
    * names no /Encoding (the spec's precedence).
    */
  private val DupPut = """dup\s+(\d+)\s*/([^\s/]+)\s+put""".r

  private def builtinType1Encoding(doc: Doc, fd: PDict): Map[Int, String] =
    doc.resolve(fd.get("FontDescriptor").getOrElse(PNull)) match {
      case d: PDict => doc.resolve(d.get("FontFile").getOrElse(PNull)) match {
        case s: PStream =>
          val data = doc.decodeStream(s)
          val text = new String(data, StandardCharsets.ISO_8859_1)
          val cut = text.indexOf("eexec")
          val clear = if (cut >= 0) text.substring(0, cut) else text
          DupPut.findAllMatchIn(clear)
            .map(m => m.group(1).toInt -> m.group(2)).toMap
        case _ => Map.empty
      }
      case _ => Map.empty
    }

  private def loadFont(doc: Doc, fd: PDict): Font = {
    val id = doc.id
    val subtype = doc.resolve(fd.get("Subtype").getOrElse(PNull)) match {
      case PName(n) => n
      case _ => "Type1"
    }
    val toUni: Map[Int, String] =
      doc.resolve(fd.get("ToUnicode").getOrElse(PNull)) match {
        case s: PStream => parseToUnicode(id, doc.decodeStream(s))
        case _ => Map.empty
      }
    if (subtype == "Type0") {
      doc.resolve(fd.get("Encoding").getOrElse(PNull)) match {
        case PName("Identity-H") | PName("Identity-V") | PNull => ()
        case s: PStream => () // embedded CMap: codes still decoded via ToUnicode
        case PName(other) => throw new IllegalArgumentException(
          s"media $id: unsupported Type0 CMap /$other (only Identity-H/V)")
        case _ => ()
      }
      val desc = doc.resolve(fd.get("DescendantFonts").getOrElse(PNull)) match {
        case PArr(ds) if ds.nonEmpty => doc.resolve(ds(0)) match {
          case d: PDict => d
          case _ => PDict(Map.empty)
        }
        case _ => PDict(Map.empty)
      }
      val dw = doc.resolve(desc.get("DW").getOrElse(PNull)) match {
        case n: PNum => n.v
        case _ => 1000.0
      }
      val w = doc.resolve(desc.get("W").getOrElse(PNull)) match {
        case a: PArr => parseCidWidths(doc, a)
        case _ => Map.empty[Int, Double]
      }
      Font(twoByte = true, toUni, null, Map.empty, w, dw)
    } else {
      // simple font: base encoding + differences; when NO base
      // encoding is named, the embedded font program's built-in
      // encoding applies underneath /Differences (spec precedence)
      var baseMap: Array[String] =
        if (subtype == "TrueType") WinAnsi else Standard
      var namedBase = false
      var diffs = Map.empty[Int, String]
      doc.resolve(fd.get("Encoding").getOrElse(PNull)) match {
        case PName("WinAnsiEncoding") => baseMap = WinAnsi; namedBase = true
        case PName("MacRomanEncoding") => baseMap = MacRoman; namedBase = true
        case PName("StandardEncoding") => baseMap = Standard; namedBase = true
        case d: PDict =>
          doc.resolve(d.get("BaseEncoding").getOrElse(PNull)) match {
            case PName("WinAnsiEncoding") =>
              baseMap = WinAnsi; namedBase = true
            case PName("MacRomanEncoding") =>
              baseMap = MacRoman; namedBase = true
            case PName("StandardEncoding") =>
              baseMap = Standard; namedBase = true
            case _ => ()
          }
          doc.resolve(d.get("Differences").getOrElse(PNull)) match {
            case PArr(items) =>
              var code = 0
              val b = Map.newBuilder[Int, String]
              items.foreach {
                case n: PNum => code = n.i
                case PName(g) => b += code -> g; code += 1
                case other => throw new IllegalArgumentException(
                  s"media $id: bad /Differences element $other")
              }
              diffs = b.result()
            case _ => ()
          }
        case _ => ()
      }
      if (!namedBase && subtype == "Type1") {
        val builtin = builtinType1Encoding(doc, fd)
        if (builtin.nonEmpty) diffs = builtin ++ diffs // diffs win
      }
      val firstChar = doc.resolve(fd.get("FirstChar").getOrElse(PNull)) match {
        case n: PNum => n.i
        case _ => 0
      }
      val widths = doc.resolve(fd.get("Widths").getOrElse(PNull)) match {
        case PArr(ws) =>
          ws.zipWithIndex.map { case (w, k) =>
            (firstChar + k) -> (doc.resolve(w) match {
              case n: PNum => n.v
              case _ => 500.0
            })
          }.toMap
        case _ => Map.empty[Int, Double]
      }
      val missing = doc.resolve(fd.get("FontDescriptor").getOrElse(PNull)) match {
        case d: PDict => doc.resolve(d.get("MissingWidth").getOrElse(PNull)) match {
          case n: PNum => n.v
          case _ => 500.0
        }
        case _ => 500.0
      }
      Font(twoByte = false, toUni, baseMap, diffs, widths, missing)
    }
  }

  // ------------------------------------------------------ interpreter

  /** Per-page text assembler: pdftotext's two layout decisions. */
  private final class PageAssembler {
    private val sb = new StringBuilder
    private var lastX = 0.0
    private var lastY = Double.NaN
    private var lastSize = 0.0
    def show(text: String, x: Double, y: Double, endX: Double,
        size: Double): Unit = {
      if (text.nonEmpty) {
        if (!lastY.isNaN) {
          if (math.abs(y - lastY) > 0.5 * math.max(size, lastSize)) {
            while (sb.nonEmpty && sb.last == ' ') sb.setLength(sb.length - 1)
            sb.append('\n')
          } else if (x - lastX > 0.15 * size && sb.nonEmpty &&
            sb.last != ' ' && sb.last != '\n') sb.append(' ')
        }
        sb.append(text)
        lastY = y
        lastSize = size
      }
      lastX = endX
    }
    def result: String = {
      while (sb.nonEmpty && (sb.last == ' ' || sb.last == '\n'))
        sb.setLength(sb.length - 1)
      sb.toString
    }
  }

  private final case class TextState(
      var font: Font, var size: Double, var charSp: Double,
      var wordSp: Double, var hscale: Double, var leading: Double,
      var rise: Double) {
    def copyOf: TextState =
      TextState(font, size, charSp, wordSp, hscale, leading, rise)
  }

  private def interpret(doc: Doc, content: Array[Byte], resources: PDict,
      asm: PageAssembler, fontCache: scala.collection.mutable.Map[String, Font],
      depth: Int): Unit = {
    val id = doc.id
    require(depth <= 8, s"media $id: Form XObject recursion deeper than 8")
    val lx = new Lexer(content, 0, id)
    val operands = new scala.collection.mutable.ArrayBuffer[Obj]
    val st = TextState(null, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0)
    val gsStack = new scala.collection.mutable.ArrayBuffer[TextState]
    // text matrix (a b c d e f) and line matrix
    var tm = Array(1.0, 0, 0, 1.0, 0, 0)
    var tlm = tm.clone()
    def num(o: Obj): Double = o match {
      case n: PNum => n.v
      case other => throw new IllegalArgumentException(
        s"media $id: number expected in content, got $other")
    }
    // malformed content (too few operands) must fail id-tagged, not
    // with a bare IndexOutOfBounds
    def operand(fromEnd: Int, op: String): Obj = {
      require(operands.length >= fromEnd,
        s"media $id: operator $op needs $fromEnd operands, " +
          s"got ${operands.length}")
      operands(operands.length - fromEnd)
    }
    def setTd(tx: Double, ty: Double): Unit = {
      // Tlm = [1 0 0 1 tx ty] x Tlm
      val e = tx * tlm(0) + ty * tlm(2) + tlm(4)
      val f = tx * tlm(1) + ty * tlm(3) + tlm(5)
      tlm(4) = e; tlm(5) = f
      tm = tlm.clone()
    }
    def fontOf(name: String): Font =
      fontCache.getOrElseUpdate(name, {
        val fonts = doc.resolve(resources.get("Font").getOrElse(PNull)) match {
          case d: PDict => d
          case _ => PDict(Map.empty)
        }
        doc.resolve(fonts.get(name).getOrElse(PNull)) match {
          case d: PDict => loadFont(doc, d)
          case _ => throw new IllegalArgumentException(
            s"media $id: font /$name not in /Resources")
        }
      })
    def showString(bs: Array[Byte]): Unit = {
      require(st.font != null, s"media $id: text shown before Tf")
      val f = st.font
      val sb = new StringBuilder
      var adv = 0.0 // text-space advance
      val step = if (f.twoByte) 2 else 1
      var i = 0
      while (i + step <= bs.length) {
        val code =
          if (f.twoByte) ((bs(i) & 0xff) << 8) | (bs(i + 1) & 0xff)
          else bs(i) & 0xff
        sb.append(f.decode(code))
        adv += (f.width(code) / 1000.0) * st.size + st.charSp +
          (if (!f.twoByte && code == 32) st.wordSp else 0.0)
        i += step
      }
      val scale = st.hscale / 100.0
      val x = tm(4); val y = tm(5)
      val tx = adv * scale
      // advance Tm by [tx 0]
      tm(4) += tx * tm(0)
      tm(5) += tx * tm(1)
      // effective size for layout thresholds: |d| component of Tm
      val effSize = st.size * math.hypot(tm(2), tm(3)).max(1e-9)
      asm.show(sb.toString, x, y, tm(4), if (effSize > 0) effSize else st.size)
    }
    def skipInlineImage(): Unit = {
      // lex the image dict keys/values until the ID operator, then
      // scan raw bytes for whitespace + "EI" + boundary
      var tok = lx.readToken()
      while (tok != POp("ID")) tok = lx.readToken()
      val start = lx.pos + 1 // one whitespace byte after ID
      val b = lx.b
      // prefer whitespace-delimited EI (binary data can contain the
      // two letters); fall back to a bare EI+boundary — image data is
      // allowed to end flush against the operator
      var found = -1
      var p = start
      while (found < 0 && p + 1 < b.length) {
        if (b(p) == 'E' && b(p + 1) == 'I' &&
          (p == 0 || isWsByte(b(p - 1))) &&
          (p + 2 >= b.length || isWsByte(b(p + 2)) || isDelimByte(b(p + 2))))
          found = p
        p += 1
      }
      if (found < 0) {
        p = start
        while (found < 0 && p + 1 < b.length) {
          if (b(p) == 'E' && b(p + 1) == 'I' &&
            (p + 2 >= b.length || isWsByte(b(p + 2)) || isDelimByte(b(p + 2))))
            found = p
          p += 1
        }
      }
      require(found >= 0, s"media $id: inline image without EI")
      lx.pos = found + 2
    }
    while (!lx.atEnd) {
      lx.readToken() match {
        case op: POp =>
          op.name match {
            case "BT" =>
              tm = Array(1.0, 0, 0, 1.0, 0, 0); tlm = tm.clone()
            case "ET" => ()
            case "Tf" =>
              st.size = num(operand(1, "Tf"))
              st.font = fontOf(operand(2, "Tf") match {
                case PName(n) => n
                case other => throw new IllegalArgumentException(
                  s"media $id: Tf font operand is $other")
              })
            case "Td" =>
              setTd(num(operand(2, "Td")), num(operand(1, "Td")))
            case "TD" =>
              st.leading = -num(operand(1, "TD"))
              setTd(num(operand(2, "TD")), num(operand(1, "TD")))
            case "Tm" =>
              tm = Array(num(operand(6, "Tm")), num(operand(5, "Tm")),
                num(operand(4, "Tm")), num(operand(3, "Tm")),
                num(operand(2, "Tm")), num(operand(1, "Tm")))
              tlm = tm.clone()
            case "T*" => setTd(0, -st.leading)
            case "TL" => st.leading = num(operand(1, "TL"))
            case "Tc" => st.charSp = num(operand(1, "Tc"))
            case "Tw" => st.wordSp = num(operand(1, "Tw"))
            case "Tz" => st.hscale = num(operand(1, "Tz"))
            case "Ts" => st.rise = num(operand(1, "Ts"))
            case "Tj" => operand(1, "Tj") match {
              case PStr(bs) => showString(bs)
              case other => throw new IllegalArgumentException(
                s"media $id: Tj operand is $other")
            }
            case "'" =>
              setTd(0, -st.leading)
              showString(operand(1, "'").asInstanceOf[PStr].bytes)
            case "\"" =>
              st.wordSp = num(operand(3, "\""))
              st.charSp = num(operand(2, "\""))
              setTd(0, -st.leading)
              showString(operand(1, "\"").asInstanceOf[PStr].bytes)
            case "TJ" =>
              operand(1, "TJ").asInstanceOf[PArr].items.foreach {
                case s: PStr => showString(s.bytes)
                case n: PNum =>
                  val tx = -n.v / 1000.0 * st.size * (st.hscale / 100.0)
                  tm(4) += tx * tm(0)
                  tm(5) += tx * tm(1)
                case other => throw new IllegalArgumentException(
                  s"media $id: bad TJ element $other")
              }
            case "q" => gsStack += st.copyOf
            case "Q" =>
              if (gsStack.nonEmpty) {
                val s = gsStack.remove(gsStack.length - 1)
                st.font = s.font; st.size = s.size; st.charSp = s.charSp
                st.wordSp = s.wordSp; st.hscale = s.hscale
                st.leading = s.leading; st.rise = s.rise
              }
            case "Do" =>
              val name = operand(1, "Do").asInstanceOf[PName].v
              val xobjs = doc.resolve(resources.get("XObject")
                .getOrElse(PNull)) match {
                case d: PDict => d
                case _ => PDict(Map.empty)
              }
              doc.resolve(xobjs.get(name).getOrElse(PNull)) match {
                case s: PStream
                  if doc.resolve(s.dict.get("Subtype").getOrElse(PNull)) ==
                    PName("Form") =>
                  val res = doc.resolve(s.dict.get("Resources")
                    .getOrElse(PNull)) match {
                    case d: PDict => d
                    case _ => resources
                  }
                  interpret(doc, doc.decodeStream(s), res, asm,
                    scala.collection.mutable.Map.empty, depth + 1)
                case _ => () // image or missing: no text
              }
            case "BI" => skipInlineImage()
            case _ => () // path/color/marked-content operators
          }
          operands.clear()
        case o => operands += o
      }
    }
  }

  private def isWsByte(b: Byte): Boolean = {
    val c = b & 0xff
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  }
  private def isDelimByte(b: Byte): Boolean = {
    val c = b & 0xff
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'
  }

  // -------------------------------------------------------- public API

  /** Extract per-page text. Structural corruption and /Encrypt fail
    * loudly with the media id; unmapped glyphs extract as U+FFFD.
    */
  def extract(id: Long, bytes: Array[Byte]): PdfDocText = {
    val doc = new Doc(id, bytes)
    val pages = doc.pages
    require(pages.nonEmpty, s"media $id: PDF has no pages")
    val texts = pages.map { page =>
      val asm = new PageAssembler
      val resources = doc.resolve(page.get("Resources").getOrElse(PNull)) match {
        case d: PDict => d
        case _ => PDict(Map.empty)
      }
      val contents = doc.resolve(page.get("Contents").getOrElse(PNull)) match {
        case s: PStream => Seq(s)
        case PArr(cs) => cs.map(doc.resolve).collect { case s: PStream => s }
        case PNull => Seq.empty
        case o => throw new IllegalArgumentException(
          s"media $id: page /Contents is $o")
      }
      if (contents.isEmpty) ""
      else {
        // streams of one page form ONE content stream: join with \n
        val joined = new java.io.ByteArrayOutputStream()
        contents.foreach { s =>
          val d = doc.decodeStream(s)
          joined.write(d, 0, d.length)
          joined.write('\n')
        }
        interpret(doc, joined.toByteArray, resources, asm,
          scala.collection.mutable.Map.empty, 0)
        asm.result
      }
    }
    PdfDocText(pages.length, texts)
  }
}
