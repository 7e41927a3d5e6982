package graft.operators

/** WHATWG-style encoding detection for fetched web content.
  *
  * The reference's crawl-adjacent sources assume transport metadata
  * is authoritative; real crawls carry `<meta charset=...>` /
  * http-equiv declarations and plenty of undeclared legacy-codepage
  * pages, so honoring only the HTTP header silently corrupts text.
  * This implements the WHATWG Encoding Standard's sniffing order for
  * a fetched body:
  *
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — wins over everything;
  *   2. the transport-layer charset (HTTP Content-Type), resolved
  *      through the standard's label table (notably: `iso-8859-1`,
  *      `latin1`, `ascii` are all LABELS FOR windows-1252 on the
  *      web — the euro at 0x80 decodes, instead of a C1 control);
  *   3. a meta prescan of the first 1024 bytes (`<meta charset=..>`
  *      and `http-equiv=content-type`, any quote style, comments
  *      skipped; a `utf-16` label found here resolves to utf-8 and
  *      `x-user-defined` to windows-1252, both per the standard);
  *   4. fallback: windows-1252 (the standard's default for the
  *      locales this engine targets).
  *
  * Unknown labels at any layer fall through to the next layer, per
  * the standard (a decoder that throws on `charset=foo` cannot crawl
  * the web). All decoding is JDK charsets — this module only decides
  * WHICH one.
  */
object CharsetSniff {

  /** WHATWG label → canonical encoding name (the subset of the
    * standard's table a text-curation crawl meets; every canonical
    * name maps to a JDK charset in [[javaCharset]]).
    */
  private val Labels: Map[String, String] = {
    def group(canonical: String, labels: String*): Seq[(String, String)] =
      labels.map(_ -> canonical)
    (group("utf-8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
      "utf-8", "utf8", "x-unicode20utf8") ++
      group("windows-1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819",
        "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
        "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
        "us-ascii", "windows-1252", "x-cp1252") ++
      group("windows-1250", "cp1250", "windows-1250", "x-cp1250") ++
      group("windows-1251", "cp1251", "windows-1251", "x-cp1251") ++
      group("windows-1253", "cp1253", "windows-1253", "x-cp1253") ++
      group("windows-1254", "cp1254", "csisolatin5", "iso-8859-9",
        "iso-ir-148", "l5", "latin5", "windows-1254", "x-cp1254") ++
      group("windows-1256", "cp1256", "windows-1256", "x-cp1256") ++
      group("windows-1257", "cp1257", "windows-1257", "x-cp1257") ++
      group("windows-1258", "cp1258", "windows-1258", "x-cp1258") ++
      group("windows-874", "dos-874", "iso-8859-11", "iso8859-11",
        "iso885911", "tis-620", "windows-874") ++
      group("ibm866", "866", "cp866", "csibm866", "ibm866") ++
      group("iso-8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101",
        "iso8859-2", "iso88592", "iso_8859-2", "l2", "latin2") ++
      group("iso-8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110",
        "iso8859-4", "iso88594", "l4", "latin4") ++
      group("iso-8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5",
        "iso-ir-144", "iso8859-5", "iso88595") ++
      group("iso-8859-6", "arabic", "csiso88596e", "csiso88596i",
        "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-ir-127",
        "iso8859-6", "iso88596") ++
      group("iso-8859-7", "csisolatingreek", "ecma-118", "elot_928",
        "greek", "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7",
        "iso88597", "sun_eu_greek") ++
      group("iso-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew",
        "iso-8859-8", "iso-ir-138", "iso8859-8", "iso88598", "visual") ++
      group("iso-8859-13", "iso-8859-13", "iso8859-13", "iso885913") ++
      group("iso-8859-15", "csisolatin9", "iso-8859-15", "iso8859-15",
        "iso885915", "iso_8859-15", "l9", "latin9") ++
      group("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r") ++
      group("koi8-u", "koi8-ru", "koi8-u") ++
      group("shift_jis", "csshiftjis", "ms932", "ms_kanji", "shift-jis",
        "shift_jis", "sjis", "windows-31j", "x-sjis") ++
      group("euc-jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp") ++
      group("iso-2022-jp", "csiso2022jp", "iso-2022-jp") ++
      group("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312",
        "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk") ++
      group("gb18030", "gb18030") ++
      group("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5") ++
      group("euc-kr", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
        "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
        "windows-949") ++
      group("utf-16be", "unicodefffe", "utf-16be") ++
      group("utf-16le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
        "unicodefeff", "utf-16", "utf-16le") ++
      group("x-user-defined", "x-user-defined")).toMap
  }

  /** Canonical WHATWG name → JDK charset name (identity for most). */
  private val JdkNames: Map[String, String] = Map(
    "windows-874" -> "x-windows-874",
    // no JDK x-user-defined; windows-1252 is the standard's stand-in
    // when the label appears in a meta declaration
    "x-user-defined" -> "windows-1252")

  /** Resolve a raw label (case/space-insensitive) to its canonical
    * WHATWG encoding name, or None for labels off the table.
    */
  def resolveLabel(raw: String): Option[String] =
    Labels.get(raw.trim.toLowerCase(java.util.Locale.ROOT))

  /** The JDK charset behind a canonical name from [[resolveLabel]]. */
  def javaCharset(canonical: String): java.nio.charset.Charset =
    java.nio.charset.Charset.forName(
      JdkNames.getOrElse(canonical, canonical))

  /** WHATWG sniff order: BOM, transport label, meta prescan,
    * windows-1252 fallback. Returns a canonical encoding name.
    */
  def sniff(payload: Array[Byte], transport: Option[String]): String = {
    // 1. BOM (must win over the header: a BOM'd page IS that encoding)
    if (payload.length >= 3 && (payload(0) & 0xff) == 0xef &&
      (payload(1) & 0xff) == 0xbb && (payload(2) & 0xff) == 0xbf)
      return "utf-8"
    if (payload.length >= 2 && (payload(0) & 0xff) == 0xfe &&
      (payload(1) & 0xff) == 0xff) return "utf-16be"
    if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xfe) return "utf-16le"
    // 2. transport layer
    transport.flatMap(resolveLabel) match {
      case Some(cs) => cs
      case None =>
        // 3. meta prescan; 4. fallback
        prescanMeta(payload).getOrElse("windows-1252")
    }
  }

  private def isWs(b: Byte): Boolean =
    b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d || b == 0x20

  private def lc(b: Byte): Char = {
    val c = (b & 0xff).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  /** "Get an attribute" results: an attribute, none left, or ABORT —
    * the WHATWG prescan fails outright on an unterminated quoted
    * value (the window cut a tag mid-value; resuming the scan INSIDE
    * the value would honor decoy markup in attribute text).
    */
  private sealed trait AttrResult
  private final case class Attr(name: String, value: String,
      next: Int) extends AttrResult
  private case object NoAttr extends AttrResult
  private case object AbortPrescan extends AttrResult

  /** The standard's "get an attribute" over the prescan bytes: skips
    * leading whitespace and `/`, collects a lowercased name up to
    * `=`/whitespace/`/`/`>`, then the (quoted or bare) lowercased
    * value. [[NoAttr]] when the next non-skipped byte is `>` / EOF;
    * [[AbortPrescan]] on an unterminated quote.
    */
  private def getAttribute(b: Array[Byte], n: Int,
      start: Int): AttrResult = {
    var p = start
    while (p < n && (isWs(b(p)) || b(p) == 0x2f)) p += 1
    if (p >= n || b(p) == '>') return NoAttr
    val name = new StringBuilder
    var value: String = null
    var done = false
    while (!done && p < n) {
      if (b(p) == '=' && name.nonEmpty) { p += 1; value = null; done = true }
      else if (isWs(b(p))) {
        // spaces before a possible '='
        while (p < n && isWs(b(p))) p += 1
        if (p < n && b(p) == '=') { p += 1; value = null; done = true }
        else return Attr(name.toString, "", p) // valueless attribute
      }
      else if (b(p) == '/' || b(p) == '>')
        return Attr(name.toString, "", p)
      else { name += lc(b(p)); p += 1 }
    }
    if (p >= n) return Attr(name.toString, "", p)
    // the value
    while (p < n && isWs(b(p))) p += 1
    if (p >= n) return Attr(name.toString, "", p)
    val sb = new StringBuilder
    if (b(p) == '"' || b(p) == '\'') {
      val q = b(p); p += 1
      while (p < n && b(p) != q) { sb += lc(b(p)); p += 1 }
      if (p >= n) return AbortPrescan // unterminated quoted value
      p += 1
    } else if (b(p) == '>') {
      return Attr(name.toString, "", p)
    } else {
      while (p < n && !isWs(b(p)) && b(p) != '>') { sb += lc(b(p)); p += 1 }
    }
    Attr(name.toString, sb.toString, p)
  }

  /** The standard's "extract a character encoding from a meta
    * element" over a `content` attribute value: each
    * case-insensitive `charset` occurrence must be followed by
    * (whitespace-tolerant) `=`, then a quoted or `;`/space-delimited
    * label; an unmatched quote fails.
    */
  private def extractFromContent(v: String): Option[String] = {
    val lcv = v // getAttribute already lowercased
    var from = 0
    while (true) {
      val i = lcv.indexOf("charset", from)
      if (i < 0) return None
      var p = i + 7
      while (p < lcv.length && lcv(p).isWhitespace) p += 1
      if (p < lcv.length && lcv(p) == '=') {
        p += 1
        while (p < lcv.length && lcv(p).isWhitespace) p += 1
        if (p >= lcv.length) return None
        if (lcv(p) == '"' || lcv(p) == '\'') {
          val q = lcv(p)
          val e = lcv.indexOf(q, p + 1)
          return if (e < 0) None else Some(lcv.substring(p + 1, e))
        }
        val e0 = lcv.indexWhere(c => c.isWhitespace || c == ';', p)
        val e = if (e0 < 0) lcv.length else e0
        return Some(lcv.substring(p, e))
      }
      from = i + 7 // "charset" not followed by '=': try the next one
    }
    None
  }

  /** The standard's prescan, attribute-level: walk the first 1024
    * bytes; skip `<!-- -->` comments (`<!-->` terminates, per the
    * HTML prescan) and `<!`/`</`/`<?` constructs to their `>`;
    * tokenize every `<meta>`'s attributes with the real "get an
    * attribute" algorithm — so a literal `charset=` inside an
    * unrelated attribute's VALUE can never false-positive — honoring
    * first-occurrence-wins per attribute name, the `charset`
    * attribute, and `http-equiv=content-type` + `content=...;
    * charset=..` (the charset applies only when the pragma is
    * declared). Other tags get their attributes consumed so a `>`
    * inside a quoted value cannot end them early.
    */
  private[operators] def prescanMeta(payload: Array[Byte]): Option[String] = {
    val n = math.min(1024, payload.length)
    val b = payload
    var pos = 0
    def startsWith(s: String, at: Int): Boolean =
      at + s.length <= n && (0 until s.length).forall(i => lc(b(at + i)) == s(i))
    while (pos < n) {
      if (startsWith("<!--", pos)) {
        // first '>' preceded by '--' (dashes may overlap the opener)
        var j = pos + 4
        while (j < n && !(b(j) == '>' && b(j - 1) == '-' && b(j - 2) == '-'))
          j += 1
        if (j >= n) return None
        pos = j + 1
      } else if (startsWith("<meta", pos) && pos + 5 < n &&
        (isWs(b(pos + 5)) || b(pos + 5) == 0x2f)) {
        var p = pos + 6
        val seen = scala.collection.mutable.Set.empty[String]
        var gotPragma = false
        var needPragma = false
        var haveCharset = false
        var charset: Option[String] = None
        var more = true
        while (more) {
          getAttribute(b, n, p) match {
            case NoAttr => more = false
            case AbortPrescan => return None // unterminated quote
            case Attr(name, value, after) =>
              p = math.max(after, p + 1) // always progress
              if (!seen.contains(name)) {
                seen += name
                name match {
                  case "http-equiv" =>
                    if (value == "content-type") gotPragma = true
                  case "content" =>
                    if (!haveCharset) extractFromContent(value).foreach { l =>
                      needPragma = true
                      haveCharset = true
                      charset = resolveLabel(l)
                    }
                  case "charset" =>
                    haveCharset = true
                    charset = resolveLabel(value)
                    needPragma = false
                  case _ =>
                }
              }
          }
        }
        if (haveCharset && (!needPragma || gotPragma) && charset.isDefined)
          return charset.map {
            // per the standard, a meta-declared UTF-16 is treated as
            // UTF-8 (the bytes plainly aren't UTF-16 if the ASCII
            // prescan could read the declaration)
            case "utf-16be" | "utf-16le" => "utf-8"
            case "x-user-defined" => "windows-1252"
            case other => other
          }
        pos = p
      } else if (startsWith("</", pos) && pos + 2 < n && {
        val c = lc(b(pos + 2)); c >= 'a' && c <= 'z'
      }) {
        // end tag: skip name, then consume attributes like a start tag
        consumeTag(b, n, pos + 2) match {
          case Some(next) => pos = next
          case None => return None // unterminated quote: abort
        }
      } else if (pos + 1 < n && b(pos) == '<' && {
        val c = lc(b(pos + 1)); c >= 'a' && c <= 'z'
      }) {
        consumeTag(b, n, pos + 1) match {
          case Some(next) => pos = next
          case None => return None // unterminated quote: abort
        }
      } else if (startsWith("<!", pos) || startsWith("</", pos) ||
        startsWith("<?", pos)) {
        var j = pos + 2
        while (j < n && b(j) != '>') j += 1
        if (j >= n) return None
        pos = j + 1
      } else pos += 1
    }
    None
  }

  /** Skip a (start or end) tag from just after its `<`/`</`: advance
    * past the name, then drain attributes so quoted `>` bytes cannot
    * terminate the tag early. Returns the next scan position, or None
    * when an unterminated quoted value aborts the whole prescan.
    */
  private def consumeTag(b: Array[Byte], n: Int,
      nameStart: Int): Option[Int] = {
    var p = nameStart
    while (p < n && !isWs(b(p)) && b(p) != '>' && b(p) != '/') p += 1
    var more = true
    while (more) {
      getAttribute(b, n, p) match {
        case NoAttr => more = false
        case AbortPrescan => return None
        case Attr(_, _, after) => p = math.max(after, p + 1)
      }
    }
    // position now sits at '>' (or EOF); step past it
    while (p < n && b(p) != '>') p += 1
    Some(if (p < n) p + 1 else n)
  }
}
