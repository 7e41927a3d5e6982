package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RtfText: writer/extractor round-trips, the spec's escape and
  * destination rules on hand-built documents (hex cp1252, \uN with
  * \ucN skips, nested group state restore, field instruction vs
  * result, \bin raw skips), and loud failures.
  */
class RtfSpec extends AnyFunSuite {

  private def x(s: String): String =
    RtfText.extract(1L, s.getBytes("ISO-8859-1"))

  test("write/extract round-trip") {
    val paras = Seq(
      "Plain ASCII paragraph one.",
      "Unicode: naïve — “quoted” 日本語.",
      "Specials: {braces} and \\backslash\ttabbed.",
      "Line\nbreak inside.")
    val doc = RtfText.write(paras)
    assert(RtfText.isRtf(doc))
    assert(RtfText.extract(2L, doc) == paras.mkString("\n"))
  }

  test("hex escapes map through cp1252's high block") {
    assert(x("""{\rtf1 caf\'e9 \'80 \'93 \'96}""") == "caf\u00e9 \u20ac \u201c \u2013")
  }

  test("\\u with \\uc skip counts, group-scoped") {
    // uc1: one fallback char after \u is dropped
    assert(x("{\\rtf1\\uc1 a\\" + "u233?b}") == "a\u00e9b")
    // uc2 inside a group restores to uc1 outside it
    assert(x("{\\rtf1\\uc1 {\\uc2 \\" + "u233ab}\\" + "u234?c}") == "\u00e9\u00eac")
    // negative code points wrap (spec: signed 16-bit)
    assert(x("{\\rtf1\\uc0 \\" + "u-10179\\" + "u-8704}") == "\ud83d\ude00") // U+1F600
  }

  test("destination groups drop; field results survive") {
    val doc = """{\rtf1{\fonttbl{\f0 Arial;}}{\info{\title secret}}""" +
      """{\field{\*\fldinst HYPERLINK "http://x"}{\fldrslt shown text}}""" +
      """ body}"""
    assert(x(doc) == "shown text body")
  }

  test("starred destinations are skipped by default") {
    assert(x("{\\rtf1{\\*\\mystery junk}visible}") == "visible")
  }

  test("control symbols and breaks") {
    assert(x("""{\rtf1 a\par b\line c\tab d\~e\emdash f}""") ==
      "a\nb\nc\td\u00a0e\u2014f") // \~ is a NON-BREAKING space per spec
  }

  test("\\bin skips raw bytes that may contain braces") {
    // after "\bin5 " the next 5 bytes ("}}}}}") are RAW; then "}"
    // closes the pict group and " b}" resumes the body
    val doc = "{\\rtf1 a{\\pict\\bin5 }}}}}} b}"
    assert(x(doc) == "a b")
  }

  test("raw newlines in the file are ignored") {
    assert(x("{\\rtf1 one\ntwo\r\nthree}") == "onetwothree")
  }

  test("corruption fails loudly with the media id") {
    val e1 = intercept[IllegalArgumentException](
      RtfText.extract(7L, "not rtf".getBytes))
    assert(e1.getMessage.contains("media 7"))
    val e2 = intercept[IllegalArgumentException](
      RtfText.extract(8L, """{\rtf1 {unbalanced""".getBytes))
    assert(e2.getMessage.contains("media 8"))
    val e3 = intercept[IllegalArgumentException](
      RtfText.extract(9L, """{\rtf1 \'zz}""".getBytes))
    assert(e3.getMessage.contains("media 9"))
  }
}
