package graft.operators

import javax.xml.stream.XMLStreamConstants

/** EPUB (OCF/OPF) text extraction — pure composition of shipped
  * parts: [[ZipCodec]] walks the container, [[OfficeText.xmlReader]]
  * (hardened StAX, no DTDs/external entities) parses container.xml →
  * OPF package → spine-ordered XHTML chapters. Books are a
  * first-class corpus tier beside [[PdfText]] and the DOCX/ODT/RTF
  * extractors; the reference pipeline moves them as opaque files
  * (gobblin-core/.../extract/filebased/FileBasedExtractor.java).
  *
  * Extraction contract (mirrors the office extractors): block
  * elements (`p`, `h1`-`h6`, `li`) become paragraphs joined with
  * '\n' in spine reading order; `<br/>` inside a block is '\n';
  * `script`/`style` bodies are dropped; manifest items that are not
  * XHTML (images, css, fonts) are skipped. Broken containers —
  * missing container.xml/OPF/spine item — fail loudly with the id.
  */
object EpubText {

  final case class EpubDoc(
      title: String, nSpine: Int, nParagraphs: Int, text: String)

  /** True when a ZIP's entries mark it as an EPUB: the OCF `mimetype`
    * entry, or a META-INF/container.xml (some real books deflate or
    * misplace the mimetype entry — the container descriptor is the
    * structural marker).
    */
  def isEpubZip(entries: Seq[(String, Array[Byte])]): Boolean =
    entries.exists { case (n, d) =>
      n == "mimetype" &&
        new String(d, java.nio.charset.StandardCharsets.UTF_8).trim ==
          "application/epub+zip"
    } || entries.exists(_._1 == "META-INF/container.xml")

  /** Resolve `href` against the directory of `basePath`, collapsing
    * `.` and `..` segments (hrefs in an OPF are relative to the OPF's
    * own directory).
    */
  private[operators] def resolveHref(basePath: String, href: String): String = {
    val baseDir = basePath.lastIndexOf('/') match {
      case -1 => Seq.empty[String]
      case i => basePath.substring(0, i).split('/').toSeq
    }
    val out = scala.collection.mutable.ArrayBuffer(baseDir: _*)
    href.split('/').foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    out.mkString("/")
  }

  /** Full extraction: container.xml → OPF (title, manifest, spine) →
    * chapters in spine order.
    */
  def extract(id: Long, bytes: Array[Byte]): EpubDoc = {
    val entries = ZipCodec.parse(id, bytes)
    val byName = entries.toMap
    val container = byName.getOrElse("META-INF/container.xml",
      throw new IllegalArgumentException(
        s"media $id: EPUB missing META-INF/container.xml"))
    val opfPath = rootfilePath(id, container)
    val opf = byName.getOrElse(opfPath,
      throw new IllegalArgumentException(
        s"media $id: EPUB missing OPF package $opfPath"))
    val (title, manifest, spine) = parseOpf(id, opf)
    require(spine.nonEmpty, s"media $id: EPUB spine is empty")
    val paras = Vector.newBuilder[String]
    var nParas = 0
    var nSpine = 0
    spine.foreach { idref =>
      val (href, mediaType) = manifest.getOrElse(idref,
        throw new IllegalArgumentException(
          s"media $id: spine idref '$idref' not in manifest"))
      val isXhtml = mediaType == "application/xhtml+xml" ||
        href.endsWith(".xhtml") || href.endsWith(".html")
      if (isXhtml) {
        val path = resolveHref(opfPath, href)
        val xhtml = byName.getOrElse(path,
          throw new IllegalArgumentException(
            s"media $id: EPUB missing spine item $path"))
        val ps = chapterParagraphs(id, xhtml)
        paras ++= ps
        nParas += ps.length
        nSpine += 1
      }
    }
    EpubDoc(title, nSpine, nParas, paras.result().mkString("\n"))
  }

  /** container.xml → the first rootfile's full-path. */
  private def rootfilePath(id: Long, xml: Array[Byte]): String = {
    val r = OfficeText.xmlReader(id, xml)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "rootfile") {
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "full-path")
              return r.getAttributeValue(i)
            i += 1
          }
        }
      }
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"media $id: malformed container.xml: ${e.getMessage}", e)
    } finally r.close()
    throw new IllegalArgumentException(
      s"media $id: container.xml has no rootfile full-path")
  }

  /** OPF → (dc:title, manifest id → (href, media-type), spine idrefs
    * in order).
    */
  private def parseOpf(id: Long, xml: Array[Byte])
      : (String, Map[String, (String, String)], Seq[String]) = {
    val r = OfficeText.xmlReader(id, xml)
    var title = ""
    var inTitle = false
    val manifest = Map.newBuilder[String, (String, String)]
    val spine = Vector.newBuilder[String]
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "title" => inTitle = true
              case "item" =>
                var itemId = ""; var href = ""; var mt = ""
                var i = 0
                while (i < r.getAttributeCount) {
                  r.getAttributeLocalName(i) match {
                    case "id" => itemId = r.getAttributeValue(i)
                    case "href" => href = r.getAttributeValue(i)
                    case "media-type" => mt = r.getAttributeValue(i)
                    case _ =>
                  }
                  i += 1
                }
                if (itemId.nonEmpty && href.nonEmpty)
                  manifest += itemId -> (href, mt)
              case "itemref" =>
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "idref")
                    spine += r.getAttributeValue(i)
                  i += 1
                }
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "title" =>
            inTitle = false
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inTitle => title += r.getText
          case _ =>
        }
      }
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"media $id: malformed OPF package: ${e.getMessage}", e)
    } finally r.close()
    (title.trim, manifest.result(), spine.result())
  }

  private val BlockNames =
    Set("p", "h1", "h2", "h3", "h4", "h5", "h6", "li")

  /** One XHTML spine item → its block-element paragraphs. */
  private def chapterParagraphs(id: Long, xml: Array[Byte]): Seq[String] = {
    val r = OfficeText.xmlReader(id, xml)
    val paras = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inBody = false
    var blockDepth = 0
    var skipDepth = 0 // script/style
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "body" => inBody = true
              case "script" | "style" => skipDepth += 1
              case n if BlockNames(n) && inBody && skipDepth == 0 =>
                if (blockDepth == 0) sb.setLength(0)
                blockDepth += 1
              case "br" if blockDepth > 0 && skipDepth == 0 =>
                sb.append('\n')
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "body" => inBody = false
              case "script" | "style" if skipDepth > 0 => skipDepth -= 1
              case n if BlockNames(n) && blockDepth > 0 =>
                blockDepth -= 1
                if (blockDepth == 0) {
                  val t = sb.toString.trim
                  if (t.nonEmpty) paras += t
                }
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inBody && blockDepth > 0 && skipDepth == 0 =>
            sb.append(r.getText)
          case _ =>
        }
      }
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"media $id: malformed EPUB chapter: ${e.getMessage}", e)
    } finally r.close()
    paras.result()
  }

  // --- fixture writer ------------------------------------------------

  /** Write a minimal conforming EPUB: OCF mimetype + container.xml,
    * one OPF with dc:title + manifest + spine, one XHTML file per
    * chapter ((chapterTitle, paragraphs); the chapter title goes in
    * `head/title` only, so extracted text is exactly the paragraphs).
    * Entries ride [[ZipCodec.write]] (deflated; our reader does not
    * require the stored-mimetype-first OCF nicety).
    */
  def write(title: String, chapters: Seq[(String, Seq[String])]): Array[Byte] = {
    import OfficeText.xmlEscape
    val container =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin
    val items = chapters.indices.map(i =>
      s"""    <item id="c$i" href="c$i.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n")
    val refs = chapters.indices.map(i => s"""    <itemref idref="c$i"/>""")
      .mkString("\n")
    val opf =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
         |  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |    <dc:identifier id="uid">urn:uuid:0</dc:identifier>
         |    <dc:title>${xmlEscape(title)}</dc:title>
         |    <dc:language>en</dc:language>
         |  </metadata>
         |  <manifest>
         |$items
         |  </manifest>
         |  <spine>
         |$refs
         |  </spine>
         |</package>""".stripMargin
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chapterEntries = chapters.zipWithIndex.map { case ((ct, paras), i) =>
      val body = paras.map(p => s"    <p>${xmlEscape(p)}</p>").mkString("\n")
      val xhtml =
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<html xmlns="http://www.w3.org/1999/xhtml">
           |  <head><title>${xmlEscape(ct)}</title></head>
           |  <body>
           |$body
           |  </body>
           |</html>""".stripMargin
      (s"OEBPS/c$i.xhtml", xhtml.getBytes(utf8))
    }
    ZipCodec.write(Seq(
      ("mimetype", "application/epub+zip".getBytes(utf8)),
      ("META-INF/container.xml", container.getBytes(utf8)),
      ("OEBPS/content.opf", opf.getBytes(utf8))) ++ chapterEntries)
  }
}
