package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Subtitles: SRT and WebVTT round-trips, format tolerance (dot
  * milliseconds in SRT, hourless VTT timestamps, BOM, cue settings,
  * NOTE blocks, markup stripping) and loud failures.
  */
class SubtitlesSpec extends AnyFunSuite {

  private val cues = Seq(
    Subtitles.Cue(1, 0L, 1200L, "hello world"),
    Subtitles.Cue(2, 2000L, 3500L, "two lines\nof text"),
    Subtitles.Cue(3, 3_600_000L + 500L, 3_600_000L + 2000L, "past the hour"))

  test("SRT round-trip") {
    val (fmt, got) = Subtitles.parse(1L, Subtitles.writeSrt(cues))
    assert(fmt == "srt")
    assert(got == cues)
  }

  test("SRT tolerates dot milliseconds and missing index lines") {
    val txt = "00:00:01.500 --> 00:00:02.750\nno index here\n"
    val got = Subtitles.parseSrt(2L, txt)
    assert(got == Seq(Subtitles.Cue(1, 1500L, 2750L, "no index here")))
  }

  test("WebVTT round-trip with settings, NOTE block and markup") {
    val (fmt, got) = Subtitles.parse(3L,
      Subtitles.writeVtt(cues, withHours = true, decorate = true))
    assert(fmt == "vtt")
    assert(got == cues) // markup stripped back to the original text
  }

  test("WebVTT short (hourless) timestamps and BOM") {
    val under = cues.take(2)
    val bytes = Subtitles.writeVtt(under, withHours = false)
    val bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ bytes
    assert(Subtitles.isWebVtt(bom))
    val (_, got) = Subtitles.parse(4L, bom)
    assert(got == under)
  }

  test("SRT with a leading BOM parses (common editor output)") {
    val bytes = Subtitles.writeSrt(cues.take(2))
    val bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ bytes
    val (fmt, got) = Subtitles.parse(7L, bom)
    assert(fmt == "srt" && got == cues.take(2))
  }

  test("inline cue timestamps and voice tags are stripped") {
    val txt = "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\n" +
      "<v Roger>Karaoke <00:00:01.000>middle</v> end\n"
    val got = Subtitles.parseVtt(5L, txt)
    assert(got.head.text == "Karaoke middle end")
  }

  test("failures are loud and id-tagged") {
    val e1 = intercept[IllegalArgumentException](
      Subtitles.parseSrt(6L, "1\n00:00:xx,000 --> 00:00:01,000\nt\n"))
    assert(e1.getMessage.contains("media 6"))
    val e2 = intercept[IllegalArgumentException](
      Subtitles.parseSrt(6L, "1\n00:00:05,000 --> 00:00:01,000\nt\n"))
    assert(e2.getMessage.contains("ends before it starts"))
    val e3 = intercept[IllegalArgumentException](
      Subtitles.parseVtt(6L, "not vtt"))
    assert(e3.getMessage.contains("WEBVTT"))
  }
}
