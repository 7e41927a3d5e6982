package graft.operators

/** MP3/FLAC container probes: header arithmetic, sniff routing,
  * decodeAuto metrics, loud corruption failures.
  */
class AudioContainersSpec extends graft.SparkSpec {

  test("MP3: frame walk across MPEG versions, bitrates, ID3 skip") {
    for (mpeg1 <- Seq(true, false); brIdx <- Seq(1, 9, 14);
         srIdx <- 0 to 2; id3 <- Seq(0, 77)) {
      val b = Mp3Codec.synthesize(nFrames = 12, brIdx, srIdx, mpeg1, id3)
      val f = Mp3Codec.parse(1L, b)
      assert(f.nFrames === 12)
      assert(f.hasId3 === (id3 > 0))
      assert(f.samplesPerFrame === (if (mpeg1) 1152 else 576))
      assert(f.durationMs ===
        12L * f.samplesPerFrame * 1000L / f.sampleRate)
    }
  }

  test("MP3: VBR frame sequence counts every frame") {
    // two different bitrates back to back: parse sizes each frame
    // from its own header
    val a = Mp3Codec.synthesize(3, brIdx = 3, srIdx = 0, mpeg1 = true, 0)
    val b = Mp3Codec.synthesize(2, brIdx = 11, srIdx = 0, mpeg1 = true, 0)
    val vbr = a ++ b
    val f = Mp3Codec.parse(2L, vbr)
    assert(f.nFrames === 5)
    assert(f.bitrateKbps === 48) // first frame's
  }

  test("MP3: corruption fails loudly with the id") {
    val good = Mp3Codec.synthesize(4, 5, 1, mpeg1 = true, 0)
    val truncated = good.take(good.length - 10)
    val e1 = intercept[IllegalArgumentException] {
      Mp3Codec.parse(31L, truncated)
    }
    assert(e1.getMessage.contains("31"))
    val badSync = good.clone()
    badSync(0) = 0x12 // not a sync, not ID3
    intercept[IllegalArgumentException] { Mp3Codec.parse(32L, badSync) }
    // ID3 size past EOF
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    val e3 = intercept[IllegalArgumentException] { Mp3Codec.parse(33L, id3) }
    assert(e3.getMessage.contains("overruns"))
  }

  test("FLAC: STREAMINFO bit layout round-trips, incl. 36-bit totals") {
    for (sr <- Seq(8000, 44100, 48000, 96000); ch <- Seq(1, 2, 8);
         bps <- Seq(16, 24); total <- Seq(0L, 12345L, 1L << 35)) {
      val md5 = Array.tabulate(16)(i => (i * 7 + 3).toByte)
      val b = FlacCodec.synthesize(sr, ch, bps, total, md5)
      val f = FlacCodec.parse(3L, b)
      assert(f.sampleRate === sr)
      assert(f.channels === ch)
      assert(f.bitsPerSample === bps)
      assert(f.totalSamples === total)
      assert(f.md5Hex === md5.map(x => f"${x & 0xff}%02x").mkString)
    }
  }

  test("FLAC: corruption fails loudly") {
    val good = FlacCodec.synthesize(44100, 2, 16, 1000L, new Array[Byte](16))
    intercept[IllegalArgumentException] { FlacCodec.parse(41L, good.take(20)) }
    val badType = good.clone()
    badType(4) = 0x01 // first block not STREAMINFO
    val e = intercept[IllegalArgumentException] { FlacCodec.parse(42L, badType) }
    assert(e.getMessage.contains("STREAMINFO"))
  }

  test("sniff routing and decodeAuto metrics") {
    import spark.implicits._
    val mp3 = Mp3Codec.synthesize(10, 9, 0, mpeg1 = true, 30)
    val flac = FlacCodec.synthesize(22050, 1, 16, 44100L, new Array[Byte](16))
    assert(Multimodal.sniffModality(mp3) === "audio/mpeg")
    assert(Multimodal.sniffModality(flac) === "audio/flac")
    // an MP3 without ID3 still sniffs (frame sync), and JPEG does NOT
    val bare = Mp3Codec.synthesize(2, 2, 2, mpeg1 = false, 0)
    assert(Multimodal.sniffModality(bare) === "audio/mpeg")
    val jpeg = JpegCodec.encodeGray(8, 8, new Array[Byte](64), 90)
    assert(Multimodal.sniffModality(jpeg) === "image/jpeg")
    val df = Seq((1L, mp3), (2L, flac)).toDF("media_id", "content")
    val rows = Multimodal.decodeAuto(df).collect().sortBy(_.media_id)
    assert(rows(0).modality === "audio/mpeg")
    assert(rows(0).n_units === 10L) // frames
    assert(rows(0).mean_val === (10L * 1152 * 1000 / 44100).toDouble)
    assert(rows(1).modality === "audio/flac")
    assert(rows(1).n_units === 44100L)
    assert(rows(1).mean_val === 2000.0) // 44100 samples at 22050 Hz
  }

  test("AIFF: round-trip at all depths, 80-bit rates, loud failures") {
    for ((bits, amp) <- Seq((8, 100), (16, 9000), (24, 4000000))) {
      val pcm = Array.tabulate(120)(i => ((i * 37) % (2 * amp + 1)) - amp)
      val aiff = AiffCodec.synthesize(11025, 1, bits, pcm)
      val a = AiffCodec.parse(1L, aiff)
      assert(a.sampleRate == 11025 && a.bits == bits && a.nFrames == 120)
      val want = pcm.map(v => math.abs(v.toLong)).sum.toDouble / 120
      assert(a.meanAbsAmp == want)
    }
    // stereo + the 44100 extended-float encoding
    val st = Array.tabulate(64)(i => if (i % 2 == 0) 500 else -300)
    val a2 = AiffCodec.parse(2L, AiffCodec.synthesize(44100, 2, 16, st))
    assert(a2.channels == 2 && a2.sampleRate == 44100 && a2.nFrames == 32)
    assert(a2.durationUs == 32L * 1000000 / 44100)
    // corruption: truncated SSND fails loudly
    val full = AiffCodec.synthesize(8000, 1, 16, Array.fill(50)(7))
    val e = intercept[IllegalArgumentException](
      AiffCodec.parse(3L, full.take(full.length - 10)))
    assert(e.getMessage.contains("media 3"))
    assert(!AiffCodec.isAiff("RIFFxxxxWAVE".getBytes))
  }
}
