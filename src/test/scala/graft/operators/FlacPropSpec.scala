package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property sweep for the FLAC centerpiece: on seeded-random PCM and
  * encoder configurations, decode(encode(pcm)) must be bit-exact with
  * every integrity channel (CRC-8/CRC-16/MD5) verifying — the
  * fuzz-shaped complement to FlacSpec's directed cases and the
  * Python-fixture interop pins.
  */
class FlacPropSpec extends AnyFunSuite {

  private val StereoModes =
    Array("independent", "leftside", "rightside", "midside")
  private val Subframes =
    Array("auto", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
      "fixed4", "lpc")

  test("random round-trips are bit-exact across the parameter space") {
    val rnd = new scala.util.Random(0x5eed13)
    var caseNo = 0
    while (caseNo < 120) {
      val channels = 1 + rnd.nextInt(2)
      val bps = Array(8, 12, 16, 20, 24)(rnd.nextInt(5))
      val amp = math.min(1 << (bps - 2), 1 << 22)
      val nFrames = 40 + rnd.nextInt(400)
      val blockSize = 16 + rnd.nextInt(140)
      val stereo =
        if (channels == 2) StereoModes(rnd.nextInt(4)) else "independent"
      val sub = Subframes(rnd.nextInt(Subframes.length))
      val po = rnd.nextInt(4)
      val shape = rnd.nextInt(4)
      val pcm = Array.tabulate(nFrames * channels) { i =>
        shape match {
          case 0 => rnd.nextInt(2 * amp + 1) - amp // white noise
          case 1 => // slow ramp (fixed predictors shine)
            ((i / channels) * 3 % (2 * amp + 1)) - amp
          case 2 => // near-silence with spikes (escape-ish partitions)
            if (rnd.nextInt(17) == 0) rnd.nextInt(2 * amp + 1) - amp
            else rnd.nextInt(5) - 2
          case _ => // sinusoid-ish integer wave
            ((math.sin(i * 0.07) * (amp / 2)).toInt + (i % 5) - 2)
        }
      }
      val lpc =
        if (sub == "lpc")
          Some(FlacAudio.LpcSpec(Array(3, -1), shift = 1, precision = 4))
        else None
      val enc = FlacAudio.encode(8000 + rnd.nextInt(40000), channels, bps,
        pcm, blockSize = blockSize, stereo = stereo, subframe = sub,
        partitionOrder = po, lpc = lpc)
      val dec = FlacAudio.decode(caseNo.toLong, enc)
      assert(dec.md5Ok, s"case $caseNo: MD5 failed " +
        s"(ch=$channels bps=$bps bs=$blockSize $stereo/$sub po=$po shape=$shape)")
      assert(java.util.Arrays.equals(dec.samples, pcm),
        s"case $caseNo: PCM drifted " +
          s"(ch=$channels bps=$bps bs=$blockSize $stereo/$sub po=$po shape=$shape)")
      caseNo += 1
    }
  }

  test("random single-byte corruption never passes silently") {
    val rnd = new scala.util.Random(0xc0ffee)
    val pcm = Array.tabulate(300)(i => ((i * 37) % 4001) - 2000)
    val enc = FlacAudio.encode(8000, 1, 16, pcm, blockSize = 64)
    var trial = 0
    while (trial < 40) {
      // corrupt a random byte PAST the metadata (frames only)
      val at = 42 + rnd.nextInt(enc.length - 42)
      val flip = (1 << rnd.nextInt(8)).toByte
      val bad = enc.clone()
      bad(at) = (bad(at) ^ flip).toByte
      // every outcome must be LOUD (CRC/MD5/structure error) or a
      // genuinely identical decode is impossible — the flip changed
      // a frame byte, so any clean return must still be caught by
      // one of the integrity channels producing the exact input
      try {
        val dec = FlacAudio.decode(900L + trial, bad)
        // if it decoded cleanly, MD5 verified — then the samples must
        // equal the original (the flip hit a bit the decoder never
        // reads, e.g. frame padding); anything else is a miss
        assert(java.util.Arrays.equals(dec.samples, pcm),
          s"trial $trial: corrupt byte $at decoded to DIFFERENT samples" +
            " without tripping any integrity check")
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("media"), s"untagged: ${e.getMessage}")
        case _: ArrayIndexOutOfBoundsException =>
          fail(s"trial $trial: corruption at $at escaped as AIOOBE")
      }
      trial += 1
    }
  }
}
