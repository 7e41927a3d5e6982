package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FlacAudio: encode→decode bit-exactness across subframe types,
  * stereo decorrelation modes, bit depths, block shapes and rice
  * partitioning; CRC/MD5 verification really fires on corruption;
  * committed fixtures from the independent Python encoder decode to
  * the formula PCM.
  */
class FlacSpec extends AnyFunSuite {

  private def pcm(n: Int, ch: Int, amp: Int, salt: Int): Array[Int] =
    Array.tabulate(n * ch) { i =>
      ((i / ch + 7) * (salt + 3) * 2203 % (2 * amp + 1)) - amp
    }

  private def roundTrip(samples: Array[Int], ch: Int, bps: Int,
      blockSize: Int, stereo: String = "independent",
      subframe: String = "auto", po: Int = 0,
      lpc: Option[FlacAudio.LpcSpec] = None): Unit = {
    val enc = FlacAudio.encode(8000, ch, bps, samples,
      blockSize = blockSize, stereo = stereo, subframe = subframe,
      partitionOrder = po, lpc = lpc)
    val dec = FlacAudio.decode(1L, enc)
    assert(dec.channels == ch && dec.bps == bps)
    assert(dec.md5Ok, "STREAMINFO MD5 must verify")
    assert(java.util.Arrays.equals(dec.samples, samples),
      s"PCM mismatch (ch=$ch bps=$bps bs=$blockSize $stereo/$subframe)")
  }

  test("fixed-order round-trips, mono and stereo, partial last block") {
    for (sub <- Seq("fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "auto")) {
      roundTrip(pcm(130, 1, 900, 1), ch = 1, bps = 16, blockSize = 64,
        subframe = sub)
      roundTrip(pcm(200, 2, 120, 2), ch = 2, bps = 16, blockSize = 96,
        subframe = sub)
    }
  }

  test("verbatim and constant subframes") {
    roundTrip(pcm(100, 1, 31000, 3), ch = 1, bps = 16, blockSize = 50,
      subframe = "verbatim")
    roundTrip(Array.fill(120)(-417), ch = 1, bps = 16, blockSize = 48)
    // constant stereo: both channels flat at different levels
    val st = Array.tabulate(2 * 90)(i => if (i % 2 == 0) 1000 else -5)
    roundTrip(st, ch = 2, bps = 16, blockSize = 45, stereo = "independent")
  }

  test("all four stereo decorrelation modes are lossless") {
    val s = pcm(256, 2, 7000, 4)
    for (mode <- Seq("independent", "leftside", "rightside", "midside"))
      roundTrip(s, ch = 2, bps = 16, blockSize = 64, stereo = mode)
    // odd mid/side rounding: force odd sums
    val odd = Array.tabulate(2 * 64)(i => if (i % 2 == 0) i / 2 else -(i / 2) - 1)
    roundTrip(odd, ch = 2, bps = 16, blockSize = 32, stereo = "midside")
  }

  test("bit depths 8, 12, 16, 20, 24 and a 3-channel stream") {
    roundTrip(pcm(96, 1, 120, 5), ch = 1, bps = 8, blockSize = 48)
    roundTrip(pcm(96, 1, 2000, 6), ch = 1, bps = 12, blockSize = 48)
    roundTrip(pcm(96, 1, 500000, 7), ch = 1, bps = 20, blockSize = 48)
    roundTrip(pcm(96, 1, 8000000, 8), ch = 1, bps = 24, blockSize = 48)
    roundTrip(pcm(90, 3, 9000, 9), ch = 3, bps = 16, blockSize = 45)
  }

  test("rice partition orders and the raw escape") {
    roundTrip(pcm(256, 1, 3000, 10), ch = 1, bps = 16, blockSize = 128, po = 2)
    roundTrip(pcm(512, 2, 3000, 11), ch = 2, bps = 16, blockSize = 256,
      stereo = "midside", po = 3)
    // huge white-noise-ish residuals push the rice estimate past 15
    // -> escape partitions (verbatim would dodge it, so force fixed0)
    val loud = Array.tabulate(128)(i => (i * 2654435761L % 16000000).toInt - 8000000)
    roundTrip(loud, ch = 1, bps = 24, blockSize = 64, subframe = "fixed0")
  }

  test("LPC subframes reconstruct bit-exactly") {
    val s = Array.tabulate(300) { i =>
      (math.sin(i * 0.1) * 10000).toInt + (i % 7) - 3
    }
    roundTrip(s, ch = 1, bps = 16, blockSize = 100, subframe = "lpc",
      lpc = Some(FlacAudio.LpcSpec(Array(3, -1), shift = 1, precision = 4)))
    roundTrip(s, ch = 1, bps = 16, blockSize = 150, subframe = "lpc", po = 1,
      lpc = Some(FlacAudio.LpcSpec(Array(25, -14, 5, -1), shift = 4,
        precision = 6)))
  }

  test("multi-frame coded numbers and a 2-frame + short tail layout") {
    // enough frames to need a 2-byte UTF-8-style frame number (>= 128)
    val s = pcm(16 * 130 + 17, 1, 500, 12)
    roundTrip(s, ch = 1, bps = 16, blockSize = 16)
  }

  test("corruption fails loudly: flipped byte, bad CRC, bad MD5") {
    val enc = FlacAudio.encode(8000, 1, 16, pcm(130, 1, 900, 13),
      blockSize = 64)
    // flip a bit inside the first frame's audio payload
    val dec0 = FlacAudio.decode(9L, enc)
    assert(dec0.md5Ok)
    val headerLen = 4 + 4 + 34
    val corrupt = enc.clone()
    corrupt(headerLen + 12) = (corrupt(headerLen + 12) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](FlacAudio.decode(9L, corrupt))
    assert(e.getMessage.contains("media 9"))
    // corrupt the stored MD5 only: frames decode, MD5 check trips
    val badMd5 = enc.clone()
    badMd5(8 + 18) = (badMd5(8 + 18) ^ 0xff).toByte
    val e2 = intercept[IllegalArgumentException](FlacAudio.decode(9L, badMd5))
    assert(e2.getMessage.contains("MD5"))
    // truncation
    val e3 = intercept[IllegalArgumentException](
      FlacAudio.decode(9L, enc.take(enc.length - 3)))
    assert(e3.getMessage.contains("media 9"))
  }

  test("committed Python-encoder fixtures decode to the formula PCM") {
    val manifest = FlacFixtures.manifest
    assert(manifest.nonEmpty, "no committed FLAC fixtures found")
    manifest.foreach { fx =>
      val bytes = FlacFixtures.load(fx.name)
      val dec = FlacAudio.decode(100L, bytes)
      assert(dec.sampleRate == fx.sampleRate && dec.channels == fx.channels
        && dec.bps == fx.bps, s"${fx.name}: header mismatch")
      assert(dec.md5Ok, s"${fx.name}: MD5 did not verify")
      val want = FlacFixtures.formulaPcm(fx)
      assert(java.util.Arrays.equals(dec.samples, want),
        s"${fx.name}: decoded PCM != formula")
    }
  }
}
