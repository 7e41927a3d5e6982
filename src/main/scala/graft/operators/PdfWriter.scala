package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic PDF writer — fixture generator for [[PdfText]] and a
  * real document sink (corpus exports that downstream PDF tooling can
  * read). Three structural variants cover the reader's whole surface,
  * so gates exercise every parse path at scale:
  *
  *  - variant 0: classic xref table, uncompressed content streams,
  *    Helvetica + /Encoding /WinAnsiEncoding, one Tj per line with
  *    Td line moves;
  *  - variant 1: classic xref, FlateDecode content, /Differences
  *    encoding (codes shifted +1, mapped back by AGL glyph names),
  *    TJ arrays with kern adjustments — inter-word space is a -300
  *    kern (no space glyph at all), intra-word splits are -50 kerns
  *    the extractor must keep glued;
  *  - variant 2: cross-reference STREAM (/W + PNG-Up predictor) with
  *    every dictionary packed into an /ObjStm, FlateDecode content,
  *    Type0 Identity-H font (2-byte codes) with a ToUnicode bfrange
  *    CMap.
  *
  * All variants use flat 500/1000-em widths so pen positions are
  * exactly reproducible. Layout: size-10 text, lines at x=72 from
  * y=720 stepping 14, `linesPerPage` lines per page.
  */
object PdfWriter {

  private val Size = 10.0
  private val LineStep = 14

  def write(id: Long, pages: Seq[Seq[String]], variant: Int): Array[Byte] = {
    require(pages.nonEmpty && pages.forall(_.nonEmpty),
      s"media $id: PDF writer needs at least one line per page")
    variant match {
      case 0 => writeClassic(pages, flate = false, diffs = false)
      case 1 => writeClassic(pages, flate = true, diffs = true)
      case 2 => writeXrefStream(pages)
      case other => throw new IllegalArgumentException(
        s"media $id: unknown PDF writer variant $other")
    }
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case c =>
        require(c >= 32 && c < 127,
          s"PDF writer literal strings are ASCII-only, got ${c.toInt}")
        sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(9)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One page's content stream. `diffs` also switches to TJ+kern
    * form with +1-shifted codes.
    */
  private def contentFor(lines: Seq[String], diffs: Boolean,
      twoByte: Boolean): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 ").append(Size.toInt).append(" Tf\n")
    sb.append("72 720 Td\n").append(LineStep).append(" TL\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("T*\n")
      if (twoByte) {
        // Identity-H: 2-byte codes, hex string
        sb.append('<')
        line.foreach(c => sb.append(f"${c.toInt}%04X"))
        sb.append("> Tj\n")
      } else if (!diffs) {
        sb.append('(').append(escape(line)).append(") Tj\n")
      } else {
        // TJ with kerns; codes shifted +1 (Differences maps back);
        // spaces become -300 kerns, words split mid-way with -50
        sb.append('[')
        line.split(' ').filter(_.nonEmpty).zipWithIndex.foreach {
          case (w, wi) =>
            if (wi > 0) sb.append(" -300 ")
            def enc(part: String): Unit = {
              sb.append('(')
              part.foreach { c =>
                val code = c.toInt + 1
                require(code >= 33 && code <= 127, s"diffs code $code")
                if (code == '(' || code == ')' || code == '\\')
                  sb.append('\\')
                sb.append(code.toChar)
              }
              sb.append(')')
            }
            if (w.length >= 4) {
              enc(w.substring(0, w.length / 2))
              sb.append(" -50 ")
              enc(w.substring(w.length / 2))
            } else enc(w)
        }
        sb.append("] TJ\n")
      }
    }
    sb.append("ET\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** The /Differences array mapping shifted codes back to AGL names. */
  private def diffsArray: String = {
    val names = Map(' ' -> "space", '!' -> "exclam", '"' -> "quotedbl",
      '#' -> "numbersign", '$' -> "dollar", '%' -> "percent",
      '&' -> "ampersand", '\'' -> "quotesingle", '(' -> "parenleft",
      ')' -> "parenright", '*' -> "asterisk", '+' -> "plus",
      ',' -> "comma", '-' -> "hyphen", '.' -> "period", '/' -> "slash",
      ':' -> "colon", ';' -> "semicolon", '<' -> "less", '=' -> "equal",
      '>' -> "greater", '?' -> "question", '@' -> "at",
      '[' -> "bracketleft", '\\' -> "backslash", ']' -> "bracketright",
      '^' -> "asciicircum", '_' -> "underscore", '`' -> "grave",
      '{' -> "braceleft", '|' -> "bar", '}' -> "braceright",
      '~' -> "asciitilde",
      '0' -> "zero", '1' -> "one", '2' -> "two", '3' -> "three",
      '4' -> "four", '5' -> "five", '6' -> "six", '7' -> "seven",
      '8' -> "eight", '9' -> "nine")
    val sb = new StringBuilder("[")
    var c = 32
    while (c < 127) { // code c+1 renders character c
      sb.append(' ').append(c + 1).append(" /")
      sb.append(names.getOrElse(c.toChar, c.toChar.toString))
      c += 1
    }
    sb.append(" ]")
    sb.toString
  }

  private def widthsArray: String =
    "[" + Seq.fill(96)("500").mkString(" ") + "]" // codes 32..127

  private def writeClassic(pages: Seq[Seq[String]], flate: Boolean,
      diffs: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def beginObj(n: Int): Unit = { offsets += out.size().toLong; w(s"$n 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = pages.length
    // 1 catalog, 2 pages, 3 font, then per page: 4+2i page, 5+2i content
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Count $nPages /Kids [" +
      (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ") +
      "] /MediaBox [0 0 612 792] >>\nendobj\n")
    beginObj(3)
    if (!diffs)
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 127 /Widths " +
        widthsArray + " >>\nendobj\n")
    else
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding" +
        s" /Differences $diffsArray >>" +
        " /FirstChar 33 /LastChar 128 /Widths " + widthsArray +
        " >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      beginObj(4 + 2 * i)
      w(s"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 3 0 R >> >>" +
        s" /Contents ${5 + 2 * i} 0 R >>\nendobj\n")
      val raw = contentFor(lines, diffs, twoByte = false)
      val data = if (flate) deflate(raw) else raw
      beginObj(5 + 2 * i)
      w(s"<< /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    val xrefOff = out.size()
    val n = offsets.length + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Variant 2: xref stream + ObjStm + Type0/Identity-H + ToUnicode. */
  private def writeXrefStream(pages: Seq[Seq[String]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n%âãÏÓ\n")
    val nPages = pages.length
    // object numbers:
    //   1 catalog, 2 pages, 3 font, 4 descendant font, 5 ToUnicode,
    //   6..5+nPages page dicts — ALL of 1,2,3,4 and the page dicts live
    //   in the ObjStm; 5 (ToUnicode stream) and content streams are
    //   regular objects (streams cannot live in an ObjStm).
    val contentFirst = 6 + nPages
    val objStmNum = contentFirst + nPages
    val xrefNum = objStmNum + 1
    // ToUnicode CMap for Identity-H ASCII
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0020> <007E> <0020>
        |endbfrange
        |endcmap
        |CMap currentdict /CMap defineresource pop
        |end end""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    // the compressed dictionaries
    val inStmDicts: Seq[(Int, String)] = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> (s"<< /Type /Pages /Count $nPages /Kids [" +
        (0 until nPages).map(i => s"${6 + i} 0 R").mkString(" ") +
        "] /MediaBox [0 0 612 792] >>"),
      3 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica" +
        " /Encoding /Identity-H /DescendantFonts [4 0 R]" +
        " /ToUnicode 5 0 R >>"),
      4 -> ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica" +
        " /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)" +
        " /Supplement 0 >> /DW 500 >>")) ++
      (0 until nPages).map { i =>
        (6 + i) -> (s"<< /Type /Page /Parent 2 0 R /Resources" +
          s" << /Font << /F1 3 0 R >> >> /Contents ${contentFirst + i} 0 R >>")
      }
    // build ObjStm payload: header of "num off" pairs, then bodies
    val bodies = inStmDicts.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init
    val headStr = inStmDicts.zip(offs).map { case ((num, _), off) => s"$num $off" }
      .mkString(" ") + "\n"
    val stmPayload = (headStr + bodies.mkString)
      .getBytes(StandardCharsets.ISO_8859_1)
    val stmDeflated = deflate(stmPayload)

    val offsets = scala.collection.mutable.Map[Int, Long]()
    // object 5: ToUnicode
    offsets(5) = out.size().toLong
    w(s"5 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
    out.write(cmap, 0, cmap.length)
    w("\nendstream\nendobj\n")
    // content streams
    pages.zipWithIndex.foreach { case (lines, i) =>
      val raw = contentFor(lines, diffs = false, twoByte = true)
      val data = deflate(raw)
      offsets(contentFirst + i) = out.size().toLong
      w(s"${contentFirst + i} 0 obj\n<< /Length ${data.length}" +
        " /Filter /FlateDecode >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    // the ObjStm
    offsets(objStmNum) = out.size().toLong
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${inStmDicts.length}" +
      s" /First ${headStr.length} /Length ${stmDeflated.length}" +
      " /Filter /FlateDecode >>\nstream\n")
    out.write(stmDeflated, 0, stmDeflated.length)
    w("\nendstream\nendobj\n")
    // xref stream: W [1 4 2], PNG Up predictor (the wild's shape)
    val xrefOff = out.size().toLong
    val size = xrefNum + 1
    val rowLen = 1 + 4 + 2
    val rows = new Array[Byte](size * rowLen)
    def putRow(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val p = num * rowLen
      rows(p) = t.toByte
      rows(p + 1) = (f2 >> 24).toByte; rows(p + 2) = (f2 >> 16).toByte
      rows(p + 3) = (f2 >> 8).toByte; rows(p + 4) = f2.toByte
      rows(p + 5) = (f3 >> 8).toByte; rows(p + 6) = f3.toByte
    }
    putRow(0, 0, 0, 0xffff)
    inStmDicts.zipWithIndex.foreach { case ((num, _), idx) =>
      putRow(num, 2, objStmNum.toLong, idx)
    }
    offsets.foreach { case (num, off) => putRow(num, 1, off, 0) }
    putRow(xrefNum, 1, xrefOff, 0)
    // PNG Up predictor: row-filter byte 2 + delta vs previous row
    val pred = new Array[Byte](size * (rowLen + 1))
    var r = 0
    while (r < size) {
      pred(r * (rowLen + 1)) = 2
      var i = 0
      while (i < rowLen) {
        val up = if (r > 0) rows((r - 1) * rowLen + i) & 0xff else 0
        pred(r * (rowLen + 1) + 1 + i) = ((rows(r * rowLen + i) & 0xff) - up).toByte
        i += 1
      }
      r += 1
    }
    val xrefData = deflate(pred)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2]" +
      s" /Root 1 0 R /Filter /FlateDecode" +
      s" /DecodeParms << /Predictor 12 /Columns $rowLen >>" +
      s" /Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData, 0, xrefData.length)
    w(s"\nendstream\nendobj\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Split running text into the writer's page/line shape: `perLine`
    * words per line, `linesPerPage` lines per page — the exact shape
    * the oracle replays (ceil divisions).
    */
  def layout(text: String, perLine: Int, linesPerPage: Int): Seq[Seq[String]] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    require(words.nonEmpty, "PDF layout of empty text")
    val lines = words.grouped(perLine).map(_.mkString(" ")).toSeq
    lines.grouped(linesPerPage).map(_.toSeq).toSeq
  }
}
