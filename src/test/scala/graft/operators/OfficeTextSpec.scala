package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** OfficeText: DOCX/ODT container classification and text
  * extraction — writer round-trips (runs split mid-sentence, preserve
  * spaces, tabs, proofErr noise), a REAL LibreOffice-produced ODT
  * (docutils' styles.odt, committed as a fixture) pinned to its
  * ElementTree-derived ground truth, dropped-content rules (tracked
  * deletions, field instructions, note bodies), and loud failures on
  * broken or adversarial containers (XXE).
  */
class OfficeTextSpec extends AnyFunSuite {

  private val paras = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Second paragraph with more words to split across several runs here.",
    "Short one.",
    "A fourth paragraph so the proofErr and rsid cycling both repeat fully.")

  test("DOCX write/extract round-trip reassembles split runs") {
    for (salt <- 0L until 6L) {
      val bytes = OfficeText.writeDocx(paras, salt)
      assert(OfficeText.classifyZip(1L, bytes) == "docx")
      val doc = OfficeText.extract(1L, bytes)
      assert(doc.kind == "docx")
      assert(doc.nParagraphs == paras.length, s"salt=$salt")
      assert(doc.text == paras.mkString("\n"), s"salt=$salt")
    }
  }

  test("ODT write/extract round-trip") {
    for (salt <- 0L until 6L) {
      val bytes = OfficeText.writeOdt(paras, salt)
      assert(OfficeText.classifyZip(2L, bytes) == "odt")
      val doc = OfficeText.extract(2L, bytes)
      assert(doc.kind == "odt")
      assert(doc.nParagraphs == paras.length)
      assert(doc.text == paras.mkString("\n"), s"salt=$salt")
    }
  }

  test("tabs survive both formats") {
    val p = Seq("col1\tcol2\tcol3", "plain")
    assert(OfficeText.extract(3L, OfficeText.writeDocx(p)).text ==
      "col1\tcol2\tcol3\nplain")
    assert(OfficeText.extract(3L, OfficeText.writeOdt(p)).text ==
      "col1\tcol2\tcol3\nplain")
  }

  test("XML-special characters escape and round-trip") {
    val p = Seq("""a < b && c > "d" in <tags>""")
    assert(OfficeText.extract(4L, OfficeText.writeDocx(p)).text == p.head)
    assert(OfficeText.extract(4L, OfficeText.writeOdt(p)).text == p.head)
  }

  test("REAL LibreOffice ODT extracts its ground-truth text") {
    val in = getClass.getResourceAsStream("/graft/office/libreoffice_styles.odt")
    require(in != null, "missing ODT fixture")
    val bytes = try in.readAllBytes() finally in.close()
    assert(OfficeText.classifyZip(5L, bytes) == "odt")
    val doc = OfficeText.extract(5L, bytes)
    assert(doc.nParagraphs == 25)
    // ElementTree-derived ground truth (tools note: see OfficeText
    // scaladoc); includes en-dash, curly quotes and empty table cells
    val expected = "Table style 0 (rststyle-table-0) – the default table style\n" +
      "Do not change the name of this table.  rststyle-table-0 is the default style used by  odf-odt writer.\n" +
      "Name all table styles with prefix “rststyle-table-”.\n" +
      "\n\n\n\n\n\n\n\n" +
      "Table style 1 (rststyle-table-1) – another sample table style.  Use the “class” directive to apply this style to a table.\n" +
      "\n\n\n\n\n\n\n\n\n\n\n\n"
    assert(doc.text == expected)
  }

  test("tracked deletions, field instructions and note bodies drop") {
    val doc =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>keep</w:t></w:r>
        |  <w:del w:id="1"><w:r><w:delText> deleted</w:delText></w:r></w:del>
        |  <w:r><w:instrText>PAGEREF _Toc</w:instrText></w:r>
        |  <w:r><w:t xml:space="preserve"> kept</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val bytes = ZipCodec.write(Seq(
      "[Content_Types].xml" -> "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\"/>".getBytes,
      "word/document.xml" -> doc.getBytes("UTF-8")))
    assert(OfficeText.extractDocx(6L, bytes).text == "keep kept")

    val odt =
      """<?xml version="1.0"?>
        |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body><office:text>
        |<text:p>body<text:note text:id="ftn1"><text:note-body><text:p>footnote text</text:p></text:note-body></text:note> continues</text:p>
        |<text:p>x<text:s text:c="3"/>y</text:p>
        |</office:text></office:body></office:document-content>""".stripMargin
    val ob = ZipCodec.write(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes,
      "content.xml" -> odt.getBytes("UTF-8")))
    val d = OfficeText.extractOdt(7L, ob)
    assert(d.text == "body continues\nx   y")
    assert(d.nParagraphs == 2)
  }

  test("plain ZIP classifies as zip and extract refuses it") {
    val bytes = ZipCodec.write(Seq("a.txt" -> "hello".getBytes))
    assert(OfficeText.classifyZip(8L, bytes) == "zip")
    val e = intercept[IllegalArgumentException](OfficeText.extract(8L, bytes))
    assert(e.getMessage.contains("media 8"))
  }

  test("XXE payloads are rejected, not resolved") {
    val doc =
      """<?xml version="1.0"?>
        |<!DOCTYPE w:document [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>&xxe;</w:t></w:r></w:p></w:body></w:document>""".stripMargin
    val bytes = ZipCodec.write(Seq(
      "word/document.xml" -> doc.getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException](OfficeText.extractDocx(9L, bytes))
    assert(e.getMessage.contains("media 9"))
  }

  test("malformed XML fails loudly with the media id") {
    val bytes = ZipCodec.write(Seq(
      "word/document.xml" -> "<w:document><unclosed".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException](OfficeText.extractDocx(10L, bytes))
    assert(e.getMessage.contains("media 10"))
  }

  test("missing document part fails loudly") {
    val bytes = ZipCodec.write(Seq("other.xml" -> "<a/>".getBytes))
    val e = intercept[IllegalArgumentException](OfficeText.extractOdt(11L, bytes))
    assert(e.getMessage.contains("media 11") &&
      e.getMessage.contains("content.xml"))
  }
}
