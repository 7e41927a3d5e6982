package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EpubText: container resolution, spine-ordered extraction, href
  * resolution, block/skip element handling, loud failures, and the
  * classifyZip/OfficeText dispatch.
  */
class EpubSpec extends AnyFunSuite {

  test("write → extract round-trips title, spine order and paragraphs") {
    val book = EpubText.write("A Test Book", Seq(
      ("One", Seq("first para", "second para")),
      ("Two", Seq("third para"))))
    val doc = EpubText.extract(1L, book)
    assert(doc.title == "A Test Book")
    assert(doc.nSpine == 2 && doc.nParagraphs == 3)
    assert(doc.text == "first para\nsecond para\nthird para")
  }

  test("classifyZip and OfficeText.extract dispatch epub") {
    val book = EpubText.write("T", Seq(("c", Seq("hello book"))))
    assert(OfficeText.classifyZip(2L, book) == "epub")
    val od = OfficeText.extract(2L, book)
    assert(od.kind == "epub" && od.text == "hello book")
    // docx/odt/zip classification is untouched
    val zip = ZipCodec.write(Seq(("a.txt", "x".getBytes)))
    assert(OfficeText.classifyZip(2L, zip) == "zip")
  }

  test("script/style dropped, br becomes newline, headings extracted") {
    val xhtml =
      """<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">
        |<head><title>t</title><style>p { color: red }</style></head>
        |<body>
        |  <h1>Chapter &amp; Title</h1>
        |  <script>var x = "not text";</script>
        |  <p>line one<br/>line two</p>
        |  <ul><li>item a</li><li>item b</li></ul>
        |</body></html>""".stripMargin.getBytes("UTF-8")
    val container =
      """<?xml version="1.0"?><container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |<rootfiles><rootfile full-path="book.opf" media-type="application/oebps-package+xml"/></rootfiles>
        |</container>""".stripMargin.getBytes("UTF-8")
    val opf =
      """<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf">
        |<metadata xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:title>S</dc:title></metadata>
        |<manifest><item id="x" href="ch/x.xhtml" media-type="application/xhtml+xml"/>
        |<item id="css" href="style.css" media-type="text/css"/></manifest>
        |<spine><itemref idref="x"/></spine>
        |</package>""".stripMargin.getBytes("UTF-8")
    val zip = ZipCodec.write(Seq(
      ("META-INF/container.xml", container),
      ("book.opf", opf),
      ("ch/x.xhtml", xhtml),
      ("style.css", "p{}".getBytes)))
    val doc = EpubText.extract(3L, zip)
    assert(doc.title == "S")
    assert(doc.text ==
      "Chapter & Title\nline one\nline two\nitem a\nitem b")
    assert(doc.nSpine == 1 && doc.nParagraphs == 4)
  }

  test("hrefs resolve relative to the OPF directory") {
    assert(EpubText.resolveHref("OEBPS/content.opf", "c0.xhtml")
      == "OEBPS/c0.xhtml")
    assert(EpubText.resolveHref("OEBPS/content.opf", "../other/x.xhtml")
      == "other/x.xhtml")
    assert(EpubText.resolveHref("content.opf", "ch/x.xhtml") == "ch/x.xhtml")
    assert(EpubText.resolveHref("a/b/p.opf", "./y.xhtml") == "a/b/y.xhtml")
  }

  test("broken containers fail loudly with the id") {
    val noContainer = ZipCodec.write(Seq(
      ("mimetype", "application/epub+zip".getBytes)))
    val e1 = intercept[IllegalArgumentException](
      EpubText.extract(7L, noContainer))
    assert(e1.getMessage.contains("media 7"))
    // spine item missing from the archive
    val book = EpubText.write("T", Seq(("c", Seq("x"))))
    val entries = ZipCodec.parse(7L, book).filterNot(_._1.endsWith("c0.xhtml"))
    val broken = ZipCodec.write(entries)
    val e2 = intercept[IllegalArgumentException](
      EpubText.extract(7L, broken))
    assert(e2.getMessage.contains("missing spine item"))
  }
}
