package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** OggCodec: page CRC verification, packet lacing, Vorbis/Opus
  * identification + comments, granule duration arithmetic, loud
  * failures on corruption.
  */
class OggSpec extends AnyFunSuite {

  test("Vorbis round-trip: channels, rate, comments, duration") {
    val b = OggCodec.synthesize("vorbis", channels = 2, rate = 44100,
      preSkip = 0, vendor = "graft-test",
      cs = Seq("TITLE" -> "Søng №1", "ARTIST" -> "Бэнд"),
      nAudioPages = 5, finalGranule = 441000L)
    val m = OggCodec.parse(1L, b)
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.vendor == "graft-test")
    assert(m.comments == Seq("TITLE" -> "Søng №1", "ARTIST" -> "Бэнд"))
    assert(m.nPages == 7) // id + comments + 5 audio
    assert(m.durationMs == 441000L * 1000 / 44100) // exactly 10 s
  }

  test("Opus round-trip: pre-skip, 48kHz granules, comments") {
    val b = OggCodec.synthesize("opus", channels = 1, rate = 16000,
      preSkip = 312, vendor = "v", cs = Seq("TITLE" -> "t"),
      nAudioPages = 3, finalGranule = 96000L + 312L)
    val m = OggCodec.parse(2L, b)
    assert(m.codec == "opus" && m.preSkip == 312 && m.sampleRate == 16000)
    assert(m.durationMs == 2000L) // (granule - preskip) / 48kHz
  }

  test("a comment key is case-normalized and values keep UTF-8") {
    val b = OggCodec.synthesize("vorbis", 1, 8000, 0, "v",
      Seq("title" -> "a=b=c"), 1, 8000L)
    val m = OggCodec.parse(3L, b)
    assert(m.comments == Seq("TITLE" -> "a=b=c")) // split on FIRST '='
  }

  test("long comment packets span lacing segments (> 255 bytes)") {
    val big = "x" * 700
    val b = OggCodec.synthesize("vorbis", 1, 8000, 0, "v",
      Seq("LYRICS" -> big), 1, 800L)
    assert(OggCodec.parse(4L, b).comments.head._2 == big)
  }

  test("corruption fails loudly: flipped byte, bad capture, no EOS") {
    val b = OggCodec.synthesize("vorbis", 1, 8000, 0, "v",
      Seq("TITLE" -> "t"), 2, 4000L)
    val bad = b.clone()
    bad(40) = (bad(40) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](OggCodec.parse(5L, bad))
    assert(e.getMessage.contains("media 5") && e.getMessage.contains("CRC"))
    val e2 = intercept[IllegalArgumentException](
      OggCodec.parse(5L, "OggX????".getBytes))
    assert(e2.getMessage.contains("media 5"))
    val e3 = intercept[IllegalArgumentException](
      OggCodec.parse(5L, b.take(80)))
    assert(e3.getMessage.contains("media 5"))
  }

  test("sniffModality routes Ogg and WebVTT") {
    val ogg = OggCodec.synthesize("opus", 1, 48000, 0, "v", Nil, 1, 480L)
    assert(Multimodal.sniffModality(ogg) == "audio/ogg")
    val vtt = Subtitles.writeVtt(Seq(Subtitles.Cue(1, 0, 1000, "t")))
    assert(Multimodal.sniffModality(vtt) == "text/vtt")
  }
}
