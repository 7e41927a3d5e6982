package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Id3: v2.3/v2.4 round-trips across all four text encodings,
  * TXXX/COMM structure, unsynchronisation, padding, loud failures;
  * Mp3Codec.vbrInfo Xing parsing and its absence.
  */
class Id3Spec extends AnyFunSuite {

  private val frames = Seq(
    "TIT2" -> "Søme Tïtle", "TPE1" -> "Ärtist", "TALB" -> "Album 1",
    "TXXX" -> "origin:crawl-3", "COMM" -> "eng/note:hello © world")

  test("v2.3 latin-1 and UTF-16 round-trip") {
    for (enc <- Seq(0, 1)) {
      val tag = Id3.synthesize(frames, v24 = false, encoding = enc)
      val p = Id3.parse(1L, tag).get
      assert(p.version == "2.3")
      assert(p.first("TIT2").contains("Søme Tïtle"))
      assert(p.first("TPE1").contains("Ärtist"))
      assert(p.first("TXXX").contains("origin:crawl-3"))
      assert(p.first("COMM").contains("eng/note:hello © world"))
    }
  }

  test("v2.4 UTF-8 and UTF-16BE round-trip (syncsafe frame sizes)") {
    val uf = frames ++ Seq("TDRC" -> "2021", "TPE2" -> "Группа №1")
    for (enc <- Seq(1, 3, 2)) {
      val tag = Id3.synthesize(uf, v24 = true, encoding = enc)
      val p = Id3.parse(2L, tag).get
      assert(p.version == "2.4")
      assert(p.first("TPE2").contains("Группа №1"))
      assert(p.first("TDRC").contains("2021"))
    }
  }

  test("a large frame really exercises multi-byte syncsafe sizes") {
    val big = "x" * 300 // > 127: v2.4 frame size needs 2 syncsafe bytes
    val tag = Id3.synthesize(Seq("TIT2" -> big), v24 = true, encoding = 3)
    assert(Id3.parse(3L, tag).get.first("TIT2").contains(big))
  }

  test("unsynchronised tag is resynced before frame parsing") {
    // craft: take a clean v2.3 tag body, apply FF -> FF 00, set flag
    val clean = Id3.synthesize(Seq("TIT2" -> "AÿB"), v24 = false,
      encoding = 1, padding = 0)
    val body = clean.drop(10)
    val unsynced = body.flatMap { x =>
      if ((x & 0xff) == 0xff) Seq(x, 0.toByte) else Seq(x)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0x80) // unsync flag
    val n = unsynced.length
    out.write((n >> 21) & 0x7f); out.write((n >> 14) & 0x7f)
    out.write((n >> 7) & 0x7f); out.write(n & 0x7f)
    out.write(unsynced, 0, n)
    val p = Id3.parse(4L, out.toByteArray).get
    assert(p.first("TIT2").contains("AÿB"))
  }

  test("v2.4 per-frame format flags: unsync, DLI, grouping unwind") {
    // values chosen so UTF-16's BOM (FF FE) forces real FF-stuffing
    val fs = Seq("TIT2" -> "Tÿtle ÿ", "TPE1" -> "Ärtist")
    // 0x42 = grouping + unsync: the 0xFF group byte gets stuffed,
    // so readers must de-unsync BEFORE stripping it (spec order)
    for (fmt <- Seq(0x02, 0x01, 0x03, 0x40, 0x42, 0x43)) {
      val tag = Id3.synthesize(fs, v24 = true, encoding = 1,
        v24Format = fmt)
      val p = Id3.parse(fmt.toLong, tag).get
      assert(p.first("TIT2").contains("Tÿtle ÿ"), s"fmt 0x$fmt%02x")
      assert(p.first("TPE1").contains("Ärtist"))
    }
    // a tag synthesized WITH flags differs on disk from a clean one
    assert(!java.util.Arrays.equals(
      Id3.synthesize(fs, v24 = true, encoding = 1, v24Format = 0x03),
      Id3.synthesize(fs, v24 = true, encoding = 1)))
  }

  test("compressed/encrypted frames fail loudly, never decode garbage") {
    val tag = Id3.synthesize(Seq("TIT2" -> "x"), v24 = true, encoding = 3,
      padding = 0)
    val bad = tag.clone()
    bad(10 + 9) = 0x08 // v2.4 compression format flag on frame 1
    val e = intercept[IllegalArgumentException](Id3.parse(9L, bad))
    assert(e.getMessage.contains("compressed/encrypted"))
    val bad23 = Id3.synthesize(Seq("TIT2" -> "x"), v24 = false,
      encoding = 0, padding = 0).clone()
    bad23(10 + 9) = 0x80.toByte // v2.3 compression flag
    val e2 = intercept[IllegalArgumentException](Id3.parse(9L, bad23))
    assert(e2.getMessage.contains("compressed/encrypted"))
  }

  test("no tag, truncation and corrupt frame ids fail appropriately") {
    assert(Id3.parse(5L, "not an mp3".getBytes).isEmpty)
    val tag = Id3.synthesize(frames, v24 = false, encoding = 0)
    val e = intercept[IllegalArgumentException](
      Id3.parse(5L, tag.take(tag.length / 2)))
    assert(e.getMessage.contains("media 5"))
    val bad = tag.clone()
    bad(10) = '!' // frame id must be A-Z0-9
    val e2 = intercept[IllegalArgumentException](Id3.parse(5L, bad))
    assert(e2.getMessage.contains("bad ID3 frame id"))
  }

  test("parse is total on adversarial tag bytes (fuzz, seeded)") {
    // real crawls carry truncated/bit-rotted tags: parse must return
    // or throw the module's loud IllegalArgumentException — never
    // hang, never throw anything unclassified
    val rnd = new scala.util.Random(1234)
    val base = Id3.synthesize(frames, v24 = true, encoding = 1,
      v24Format = 0x03)
    (0 until 800).foreach { i =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val cut = 3 + rnd.nextInt(mutated.length - 3)
      val sample = if (i % 3 == 0) mutated.take(cut) else mutated
      try { Id3.parse(i.toLong, sample); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("ID3v2.2: 3-char frame ids map into the v2.3 vocabulary") {
    val body = new java.io.ByteArrayOutputStream()
    def frame(fid: String, value: String): Unit = {
      val payload = Array(0.toByte) ++ value.getBytes("ISO-8859-1")
      body.write(fid.getBytes("ISO-8859-1"), 0, 3)
      body.write((payload.length >> 16) & 0xff)
      body.write((payload.length >> 8) & 0xff)
      body.write(payload.length & 0xff)
      body.write(payload, 0, payload.length)
    }
    frame("TT2", "Old Title")
    frame("TP1", "Old Artist")
    frame("TAL", "Old Album")
    frame("TYE", "1997")
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(2); out.write(0); out.write(0)
    out.write((bb.length >> 21) & 0x7f); out.write((bb.length >> 14) & 0x7f)
    out.write((bb.length >> 7) & 0x7f); out.write(bb.length & 0x7f)
    out.write(bb, 0, bb.length)
    val p = Id3.parse(8L, out.toByteArray).get
    assert(p.version == "2.2")
    assert(p.first("TIT2").contains("Old Title"))
    assert(p.first("TPE1").contains("Old Artist"))
    assert(p.first("TALB").contains("Old Album"))
    assert(p.first("TYER").contains("1997"))
  }

  test("Xing header: music-frame count and duration; absent => None") {
    val tag = Id3.synthesize(Seq("TIT2" -> "t"), v24 = true, encoding = 3)
    val withX = Mp3Codec.synthesizeVbr(Seq(3, 9, 14, 5), srIdx = 0,
      mpeg1 = true, withXing = true, id3 = tag)
    val info = Mp3Codec.vbrInfo(10L, withX).get
    assert(info.tag == "Xing" && info.nFrames == 4)
    assert(info.durationMs == 4L * 1152 * 1000 / 44100)
    // parse still walks every frame (header frame included)
    assert(Mp3Codec.parse(10L, withX).nFrames == 5)
    val noX = Mp3Codec.synthesizeVbr(Seq(3, 9), srIdx = 2, mpeg1 = false,
      withXing = false)
    assert(Mp3Codec.vbrInfo(11L, noX).isEmpty)
    assert(Mp3Codec.parse(11L, noX).nFrames == 2)
  }
}
