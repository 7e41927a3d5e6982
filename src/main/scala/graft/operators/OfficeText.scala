package graft.operators

import java.io.ByteArrayInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Office-document text extraction, pure JVM: DOCX (ECMA-376
  * WordprocessingML) and ODT (OASIS OpenDocument) — both are ZIP
  * containers of XML, walked with [[ZipCodec]] and parsed with the
  * JDK's StAX reader (DTDs and external entities disabled — office
  * payloads from a crawl are adversarial input). Reference semantics:
  * the reference pipeline's converters stop at JSON/Avro/CSV
  * (`gobblin-core/src/main/java/org/apache/gobblin/converter/`);
  * office formats are part of the LLM-curation document tier beside
  * [[PdfText]].
  *
  * Extraction contract (mirrors PdfText): paragraphs joined with
  * '\n'; tabs and line breaks inside a paragraph become '\t' / '\n';
  * tracked deletions, field instructions and note bodies are
  * dropped; unknown elements pass through transparently (their text
  * children still collected where the spec says they hold body
  * text). Encrypted or structurally broken containers fail loudly
  * with the media id.
  */
object OfficeText {

  final case class OfficeDoc(kind: String, text: String, nParagraphs: Int)

  /** Classify a ZIP payload: "docx" | "odt" | "epub" | "zip" (plain
    * archive).
    */
  def classifyZip(id: Long, bytes: Array[Byte]): String = {
    val entries = ZipCodec.parse(id, bytes)
    val names = entries.iterator.map(_._1).toSet
    if (names.contains("word/document.xml")) "docx"
    else entries.find(_._1 == "mimetype") match {
      case Some((_, m))
        if new String(m, "UTF-8").trim ==
          "application/vnd.oasis.opendocument.text" => "odt"
      case _ =>
        if (EpubText.isEpubZip(entries)) "epub" else "zip"
    }
  }

  /** Sniff + extract: dispatches on the container's own markers. */
  def extract(id: Long, bytes: Array[Byte]): OfficeDoc =
    classifyZip(id, bytes) match {
      case "docx" => extractDocx(id, bytes)
      case "odt" => extractOdt(id, bytes)
      case "epub" =>
        val e = EpubText.extract(id, bytes)
        OfficeDoc("epub", e.text, e.nParagraphs)
      case other => throw new IllegalArgumentException(
        s"media $id: ZIP is not an office document (classified '$other')")
    }

  // ------------------------------------------------------------------
  // hardened StAX
  // ------------------------------------------------------------------
  private[operators] def xmlReader(id: Long, xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // XXE hardening: no DTDs, no external entities, no coalescing
    // surprises — office XML never legitimately needs either
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_REPLACING_ENTITY_REFERENCES,
      java.lang.Boolean.TRUE)
    try f.createXMLStreamReader(new ByteArrayInputStream(xml))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"media $id: office XML unreadable: ${e.getMessage}", e)
    }
  }

  private[operators] def entry(id: Long, bytes: Array[Byte], name: String): Array[Byte] =
    ZipCodec.parse(id, bytes).collectFirst { case (n, d) if n == name => d }
      .getOrElse(throw new IllegalArgumentException(
        s"media $id: office container missing $name"))

  // ------------------------------------------------------------------
  // DOCX (WordprocessingML main document part)
  // ------------------------------------------------------------------
  private val WNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Extract body text from word/document.xml: w:p paragraphs (incl.
    * those nested in tables), w:t runs, w:tab / w:br / w:cr controls,
    * w:noBreakHyphen; w:delText (tracked deletions) and w:instrText
    * (field code instructions) are dropped.
    */
  def extractDocx(id: Long, bytes: Array[Byte]): OfficeDoc = {
    val r = xmlReader(id, entry(id, bytes, "word/document.xml"))
    val paras = Vector.newBuilder[String]
    var nParas = 0
    val sb = new StringBuilder
    var inP = false
    var textDepth = 0 // inside w:t
    var dropDepth = 0 // inside w:delText / w:instrText / w:del
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getNamespaceURI == WNs =>
            r.getLocalName match {
              case "p" => inP = true; sb.setLength(0)
              case "t" if dropDepth == 0 => textDepth += 1
              case "delText" | "instrText" | "del" => dropDepth += 1
              case "tab" if inP && dropDepth == 0 => sb.append('\t')
              case "br" | "cr" if inP && dropDepth == 0 => sb.append('\n')
              case "noBreakHyphen" if inP && dropDepth == 0 => sb.append('-')
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT if r.getNamespaceURI == WNs =>
            r.getLocalName match {
              case "p" =>
                if (inP) { paras += sb.toString; nParas += 1 }
                inP = false
              case "t" if dropDepth == 0 && textDepth > 0 => textDepth -= 1
              case "delText" | "instrText" | "del" if dropDepth > 0 =>
                dropDepth -= 1
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if textDepth > 0 && dropDepth == 0 && inP =>
            sb.append(r.getText)
          case _ =>
        }
      }
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"media $id: malformed DOCX document.xml: ${e.getMessage}", e)
    } finally r.close()
    OfficeDoc("docx", paras.result().mkString("\n"), nParas)
  }

  // ------------------------------------------------------------------
  // ODT (OpenDocument text content)
  // ------------------------------------------------------------------
  private val TextNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  private val OfficeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

  /** Extract body text from content.xml: text:p / text:h paragraphs
    * under office:text, character data (spans/links transparent),
    * text:tab, text:line-break, text:s run-length spaces; note
    * bodies (text:note) and change-tracking regions
    * (text:tracked-changes) are dropped.
    */
  def extractOdt(id: Long, bytes: Array[Byte]): OfficeDoc = {
    val r = xmlReader(id, entry(id, bytes, "content.xml"))
    val paras = Vector.newBuilder[String]
    var nParas = 0
    val sb = new StringBuilder
    var inBody = false
    var pDepth = 0    // nesting of text:p/text:h (lists nest paragraphs)
    var dropDepth = 0 // inside text:note / text:tracked-changes
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val ns = r.getNamespaceURI
            val ln = r.getLocalName
            if (ns == OfficeNs && ln == "text") inBody = true
            else if (inBody && ns == TextNs) ln match {
              case "p" | "h" =>
                if (pDepth == 0) sb.setLength(0)
                pDepth += 1
              case "note" | "tracked-changes" => dropDepth += 1
              case "tab" if pDepth > 0 && dropDepth == 0 => sb.append('\t')
              case "line-break" if pDepth > 0 && dropDepth == 0 =>
                sb.append('\n')
              case "s" if pDepth > 0 && dropDepth == 0 =>
                val c = Option(r.getAttributeValue(TextNs, "c"))
                  .map(_.toInt).getOrElse(1)
                require(c >= 0 && c <= 65535,
                  s"media $id: implausible text:s count $c")
                sb.append(" " * c)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            val ns = r.getNamespaceURI
            val ln = r.getLocalName
            if (ns == OfficeNs && ln == "text") inBody = false
            else if (inBody && ns == TextNs) ln match {
              case "p" | "h" if pDepth > 0 =>
                pDepth -= 1
                if (pDepth == 0) { paras += sb.toString; nParas += 1 }
              case "note" | "tracked-changes" if dropDepth > 0 =>
                dropDepth -= 1
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inBody && pDepth > 0 && dropDepth == 0 =>
            sb.append(r.getText)
          case _ =>
        }
      }
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"media $id: malformed ODT content.xml: ${e.getMessage}", e)
    } finally r.close()
    OfficeDoc("odt", paras.result().mkString("\n"), nParas)
  }

  // ------------------------------------------------------------------
  // writers (fixture synthesis / office-as-sink)
  // ------------------------------------------------------------------
  private[operators] def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Split a paragraph into 1-3 runs at deterministic word
    * boundaries — real Word documents split runs mid-sentence
    * constantly (rsid churn), so extraction must reassemble them.
    */
  private def runSplits(p: String, salt: Long): Seq[String] = {
    if (p.length < 8) return Seq(p)
    val words = p.split(" ", -1)
    if (words.length < 3) return Seq(p)
    val k = (math.abs(salt) % 3 + 1).toInt
    if (k == 1) return Seq(p)
    val cut1 = 1 + (math.abs(salt * 31) % (words.length - 1)).toInt
    val cut2 = 1 + (math.abs(salt * 53) % (words.length - 1)).toInt
    val cuts = (if (k == 2) Seq(cut1) else Seq(cut1, cut2))
      .distinct.sorted.filter(c => c > 0 && c < words.length)
    val bounds = (0 +: cuts) :+ words.length
    bounds.sliding(2).map { case Seq(a, b) =>
      val chunk = words.slice(a, b).mkString(" ")
      if (b < words.length) chunk + " " else chunk
    }.toSeq
  }

  /** Write a minimal-but-real DOCX: [Content_Types].xml, _rels/.rels,
    * and a word/document.xml whose paragraphs are split into multiple
    * runs with rsid attributes, proofErr markers and
    * xml:space="preserve" — the shapes real Word output carries.
    */
  def writeDocx(paragraphs: Seq[String], salt: Long = 0L): Array[Byte] = {
    val body = new StringBuilder
    paragraphs.zipWithIndex.foreach { case (p, i) =>
      body.append(f"""<w:p w:rsidR="00${(salt + i) % 256}%02XB7"><w:pPr><w:pStyle w:val="Normal"/></w:pPr>""")
      if (i % 3 == 0) body.append("""<w:proofErr w:type="spellStart"/>""")
      runSplits(p, salt + i).foreach { run =>
        val preserve = run != run.trim
        body.append("<w:r>")
        if (i % 2 == 0) body.append("<w:rPr><w:rFonts w:ascii=\"Calibri\"/></w:rPr>")
        body.append(if (preserve) "<w:t xml:space=\"preserve\">" else "<w:t>")
        body.append(xmlEscape(run)
          .replace("\t", "</w:t><w:tab/><w:t xml:space=\"preserve\">"))
        body.append("</w:t></w:r>")
      }
      if (i % 3 == 0) body.append("""<w:proofErr w:type="spellEnd"/>""")
      body.append("</w:p>")
    }
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$WNs"><w:body>${body.toString}<w:sectPr><w:pgSz w:w="11906" w:h="16838"/></w:sectPr></w:body></w:document>"""
        .stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
        .stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>"""
        .stripMargin
    ZipCodec.write(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes("UTF-8"),
      "_rels/.rels" -> rels.getBytes("UTF-8"),
      "word/document.xml" -> doc.getBytes("UTF-8")))
  }

  /** Write a minimal-but-real ODT: mimetype, META-INF/manifest.xml,
    * and a content.xml with spans and style names.
    */
  def writeOdt(paragraphs: Seq[String], salt: Long = 0L): Array[Byte] = {
    val body = new StringBuilder
    paragraphs.zipWithIndex.foreach { case (p, i) =>
      body.append(s"""<text:p text:style-name="P${i % 4 + 1}">""")
      runSplits(p, salt + i).zipWithIndex.foreach { case (run, j) =>
        val esc = xmlEscape(run).replace("\t", "<text:tab/>")
        if (j % 2 == 1) body.append(s"""<text:span text:style-name="T1">$esc</text:span>""")
        else body.append(esc)
      }
      body.append("</text:p>")
    }
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content xmlns:office="$OfficeNs" xmlns:text="$TextNs" office:version="1.2"><office:body><office:text>${body.toString}</office:text></office:body></office:document-content>"""
        .stripMargin
    val manifest =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2"><manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.text"/><manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/></manifest:manifest>"""
        .stripMargin
    ZipCodec.write(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes("UTF-8"),
      "META-INF/manifest.xml" -> manifest.getBytes("UTF-8"),
      "content.xml" -> content.getBytes("UTF-8")))
  }
}
