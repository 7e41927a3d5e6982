package graft.operators

/** Subtitle text extraction — SRT (SubRip) and WebVTT (W3C), the text
  * face of video corpora: transcript-aligned text is training data
  * and dedup keys for the video tier, exactly as [[PdfText]] is for
  * documents. Pure string parsing from the public formats:
  *
  *  - SRT: numbered cue blocks, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  *    (comma millisecond separator; dot tolerated — the wild mixes
  *    them), text until the blank line.
  *  - WebVTT: `WEBVTT` signature (optional BOM), `HH:` optional in
  *    timestamps (dot separator), optional cue ids and settings
  *    after the arrow line, NOTE/STYLE/REGION blocks skipped, and
  *    inline markup (`<b>`, `<c.class>`, voice `<v Name>`, cue
  *    timestamps `<00:00:01.000>`) stripped from the text.
  *
  * Failures are loud and id-tagged (overlapping negative durations,
  * unparsable timestamps); cosmetic messiness (stray blank lines,
  * missing cue indexes) is tolerated.
  */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long, text: String)

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  def isWebVtt(b: Array[Byte]): Boolean = {
    val o = if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
      (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0
    b.length >= o + 6 &&
      new String(b, o, 6, java.nio.charset.StandardCharsets.UTF_8) == "WEBVTT"
  }

  private val SrtTime =
    """(\d+):(\d{2}):(\d{2})[,.](\d{3})""".r
  private val VttTime =
    """(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})""".r

  private def srtMs(id: Long, s: String): Long = s.trim match {
    case SrtTime(h, m, sec, ms) =>
      h.toLong * 3600000L + m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case other => fail(id, s"unparsable SRT timestamp '$other'")
  }

  private def vttMs(id: Long, s: String): Long = s.trim match {
    case VttTime(h, m, sec, ms) =>
      Option(h).map(_.toLong).getOrElse(0L) * 3600000L +
        m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case other => fail(id, s"unparsable WebVTT timestamp '$other'")
  }

  private def blocks(text: String): Seq[Seq[String]] = {
    val lines = text.split("\r\n|\n|\r", -1).toSeq
    val out = Seq.newBuilder[Seq[String]]
    var cur = Seq.newBuilder[String]
    var nonEmpty = false
    lines.foreach { l =>
      if (l.trim.isEmpty) {
        if (nonEmpty) out += cur.result()
        cur = Seq.newBuilder[String]
        nonEmpty = false
      } else { cur += l; nonEmpty = true }
    }
    if (nonEmpty) out += cur.result()
    out.result()
  }

  /** Parse an SRT document. */
  def parseSrt(id: Long, text: String): Seq[Cue] =
    blocks(text).zipWithIndex.map { case (b, fallbackIdx) =>
      // first line may be the numeric index; the arrow line follows
      val (idx, rest) =
        if (b.head.trim.forall(_.isDigit) && b.length > 1)
          (b.head.trim.toInt, b.tail)
        else (fallbackIdx + 1, b)
      val arrow = rest.headOption.getOrElse(
        fail(id, s"SRT cue $idx has no timing line"))
      val parts = arrow.split("-->")
      if (parts.length != 2) fail(id, s"SRT cue $idx: bad timing '$arrow'")
      val start = srtMs(id, parts(0))
      val end = srtMs(id, parts(1))
      if (end < start) fail(id, s"SRT cue $idx ends before it starts")
      Cue(idx, start, end, rest.tail.mkString("\n").trim)
    }

  private def stripVttMarkup(s: String): String =
    s.replaceAll("</?[A-Za-z][^>]*>", "") // <b>, </b>, <c.x>, <v Name>
      .replaceAll("<\\d{2}:[^>]*>", "") // inline cue timestamps

  /** Parse a WebVTT document. */
  def parseVtt(id: Long, text: String): Seq[Cue] = {
    val t = text.stripPrefix("\uFEFF")
    if (!t.startsWith("WEBVTT")) fail(id, "missing WEBVTT signature")
    val bs = blocks(t)
    // the first block is the signature (+ header metadata)
    val cueBlocks = bs.drop(1).filterNot { b =>
      val h = b.head.trim
      h.startsWith("NOTE") || h.startsWith("STYLE") || h.startsWith("REGION")
    }
    cueBlocks.zipWithIndex.map { case (b, i) =>
      val (idx, rest) =
        if (!b.head.contains("-->") && b.length > 1) {
          val declared = b.head.trim
          (if (declared.forall(_.isDigit)) declared.toInt else i + 1, b.tail)
        } else (i + 1, b)
      val arrow = rest.headOption.getOrElse(
        fail(id, s"WebVTT cue $idx has no timing line"))
      val parts = arrow.split("-->")
      if (parts.length != 2) fail(id, s"WebVTT cue $idx: bad timing '$arrow'")
      val start = vttMs(id, parts(0))
      // cue settings may follow the end timestamp on the same line
      val end = vttMs(id, parts(1).trim.split("\\s+").head)
      if (end < start) fail(id, s"WebVTT cue $idx ends before it starts")
      Cue(idx, start, end,
        stripVttMarkup(rest.tail.mkString("\n")).trim)
    }
  }

  /** Sniff + parse either format from raw bytes (UTF-8 text; a
    * leading BOM is tolerated in both formats).
    */
  def parse(id: Long, b: Array[Byte]): (String, Seq[Cue]) = {
    val text = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      .stripPrefix("\uFEFF")
    if (isWebVtt(b)) ("vtt", parseVtt(id, text))
    else ("srt", parseSrt(id, text))
  }

  // --- fixture writers ----------------------------------------------

  private def fmtSrt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"

  private def fmtVtt(ms: Long, withHours: Boolean): String =
    if (withHours)
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
    else f"${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"

  def writeSrt(cues: Seq[Cue]): Array[Byte] =
    cues.map(c =>
      s"${c.index}\n${fmtSrt(c.startMs)} --> ${fmtSrt(c.endMs)}\n${c.text}\n")
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Write WebVTT; `withHours=false` uses the short MM:SS.mmm form
    * (legal when under an hour), `decorate` wraps the first word of
    * each cue in bold markup the parser must strip.
    */
  def writeVtt(cues: Seq[Cue], withHours: Boolean = true,
      decorate: Boolean = false): Array[Byte] = {
    val body = cues.map { c =>
      val txt =
        if (decorate) {
          val parts = c.text.split(" ", 2)
          if (parts.length == 2) s"<b>${parts(0)}</b> ${parts(1)}"
          else s"<b>${c.text}</b>"
        } else c.text
      s"${c.index}\n${fmtVtt(c.startMs, withHours)} --> " +
        s"${fmtVtt(c.endMs, withHours)} align:start\n$txt\n"
    }.mkString("\n")
    (s"WEBVTT\n\nNOTE synthetic fixture\n\n$body")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
