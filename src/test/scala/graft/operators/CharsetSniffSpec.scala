package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CharsetSniff: WHATWG sniff order (BOM > transport > meta prescan >
  * windows-1252), label table quirks, prescan tolerance (quote
  * styles, http-equiv, comments, 1024-byte window).
  */
class CharsetSniffSpec extends AnyFunSuite {

  private def sniff(html: String, enc: String, header: Option[String] = None,
      bom: Array[Byte] = Array.emptyByteArray): String =
    CharsetSniff.sniff(bom ++ html.getBytes(enc), header)

  test("BOM wins over a contradicting header") {
    val utf8Bom = Array(0xef, 0xbb, 0xbf).map(_.toByte)
    assert(sniff("<html>x</html>", "UTF-8", Some("shift_jis"),
      utf8Bom) == "utf-8")
    assert(CharsetSniff.sniff(Array(0xfe, 0xff, 0, 'x').map(_.toByte),
      Some("utf-8")) == "utf-16be")
    assert(CharsetSniff.sniff(Array(0xff, 0xfe, 'x', 0).map(_.toByte),
      None) == "utf-16le")
  }

  test("transport labels resolve through the WHATWG table") {
    assert(sniff("<html/>", "UTF-8", Some("ISO-8859-1")) == "windows-1252")
    assert(sniff("<html/>", "UTF-8", Some("latin1")) == "windows-1252")
    assert(sniff("<html/>", "UTF-8", Some(" Shift_JIS ")) == "shift_jis")
    assert(sniff("<html/>", "UTF-8", Some("gb2312")) == "gbk")
    assert(sniff("<html/>", "UTF-8", Some("UTF8")) == "utf-8")
  }

  test("unknown transport label falls through to the meta prescan") {
    assert(sniff("<meta charset=koi8-r><html/>", "UTF-8",
      Some("x-bogus-charset")) == "koi8-r")
    assert(sniff("<html>plain</html>", "UTF-8",
      Some("x-bogus-charset")) == "windows-1252")
  }

  test("meta prescan: quote styles, http-equiv, comments, window") {
    assert(sniff("""<meta charset="windows-1251">""", "UTF-8", None)
      == "windows-1251")
    assert(sniff("""<meta charset='euc-jp'>""", "UTF-8", None) == "euc-jp")
    assert(sniff("""<meta charset=big5>""", "UTF-8", None) == "big5")
    assert(sniff(
      """<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">""",
      "UTF-8", None) == "shift_jis")
    // a commented-out meta must NOT win
    assert(sniff(
      """<!-- <meta charset="koi8-r"> --><meta charset="utf-8">""",
      "UTF-8", None) == "utf-8")
    // declarations beyond the 1024-byte prescan window are ignored
    val far = " " * 1100 + """<meta charset="koi8-r">"""
    assert(sniff(far, "UTF-8", None) == "windows-1252")
    // meta utf-16 resolves to utf-8; x-user-defined to windows-1252
    assert(sniff("""<meta charset="utf-16">""", "UTF-8", None) == "utf-8")
    assert(sniff("""<meta charset="x-user-defined">""", "UTF-8", None)
      == "windows-1252")
  }

  test("attribute-level prescan: decoys cannot false-positive") {
    // charset= inside an unrelated meta's content VALUE with no
    // http-equiv pragma must be ignored (the r13 regex matched it)
    assert(sniff(
      """<meta name="description" content="see charset=koi8-r docs">""" +
        """<meta charset="utf-8">""", "UTF-8", None) == "utf-8")
    // ... and with NO later meta it falls through to the default
    assert(sniff(
      """<meta name="description" content="use charset=koi8-r here">""",
      "UTF-8", None) == "windows-1252")
    // an attribute NAMED data-charset is not the charset attribute
    assert(sniff(
      """<meta data-charset="koi8-r" name="x"><meta charset='greek'>""",
      "UTF-8", None) == "iso-8859-7")
    // a quoted '>' inside an earlier tag's attribute must not
    // terminate that tag early and hide the real meta
    assert(sniff(
      """<img alt="a > b charset=big5" src=i><meta charset=ibm866>""",
      "UTF-8", None) == "ibm866")
    // content= BEFORE http-equiv= (attribute order is free)
    assert(sniff(
      """<meta content="text/html; charset=euc-kr" """ +
        """http-equiv="content-type">""", "UTF-8", None) == "euc-kr")
    // http-equiv that is NOT content-type gives the content no power
    assert(sniff(
      """<meta http-equiv="refresh" content="1; url=/?charset=koi8-r">""",
      "UTF-8", None) == "windows-1252")
    // first occurrence of an attribute name wins within one tag
    assert(sniff("""<meta charset="utf-8" charset="koi8-r">""",
      "UTF-8", None) == "utf-8")
    // <!--> terminates a comment per the HTML prescan
    assert(sniff("""<!--><meta charset="koi8-r">""", "UTF-8", None)
      == "koi8-r")
    // a meta whose charset label is off the table keeps scanning
    assert(sniff(
      """<meta charset="not-a-real-label"><meta charset="utf-8">""",
      "UTF-8", None) == "utf-8")
    // charset WITHOUT '=' inside content: the extractor moves on
    assert(sniff(
      """<meta http-equiv="content-type" """ +
        """content="charset charset=shift_jis">""", "UTF-8", None)
      == "shift_jis")
  }

  test("javaCharset round-trips every canonical name in the table") {
    val canonicals = Seq("utf-8", "windows-1252", "windows-1251",
      "windows-874", "ibm866", "iso-8859-2", "iso-8859-5", "iso-8859-7",
      "iso-8859-15", "koi8-r", "shift_jis", "euc-jp", "iso-2022-jp",
      "gbk", "gb18030", "big5", "euc-kr", "utf-16be", "utf-16le",
      "x-user-defined")
    canonicals.foreach { c =>
      val cs = CharsetSniff.javaCharset(c)
      assert(cs != null, s"no JDK charset for $c")
    }
  }

  test("windows-1252 really is the decode for latin1-labeled bytes") {
    // 0x80 is the euro in cp1252, an unprintable control in latin1
    val bytes = "price ".getBytes("ASCII") ++ Array(0x80.toByte)
    val resolved = CharsetSniff.sniff(bytes, Some("iso-8859-1"))
    assert(new String(bytes, CharsetSniff.javaCharset(resolved))
      == "price €")
  }
}
