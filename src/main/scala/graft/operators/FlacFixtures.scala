package graft.operators

/** Committed FLAC fixtures from the INDEPENDENT pure-Python encoder
  * (tools/flac_fixtures.py) — the interop pin for [[FlacAudio]]: the
  * Python encoder re-derives the format from the public spec with no
  * shared code, so a correlated encode/decode misreading in the Scala
  * module cannot survive these (samples must equal the formula PCM
  * both writers share, and the STREAMINFO MD5 must verify).
  *
  * The manifest mirrors tools/flac_fixtures.py's FIXTURES table; the
  * PCM formula is
  * `((frame+7)*(salt+3)*2203 + ch*911) % (2*amp+1) - amp`, times
  * `scale` (scale>1 creates trailing zero bits, i.e. wasted-bits
  * subframes). Coverage across the files: fixed orders 0-4, LPC,
  * verbatim, constant-free noise, all four stereo modes, rice method
  * 1 (5-bit params), escape partitions, wasted bits, bps
  * 8/12/16/24, tabled + 8-bit + 16-bit block-size codes, end-of-header
  * sample-rate codes, and multi-byte UTF-8-style frame numbers.
  */
object FlacFixtures {

  final case class Fx(name: String, sampleRate: Int, channels: Int,
      bps: Int, nFrames: Int, amp: Int, salt: Int, scale: Int)

  val manifest: Seq[Fx] = Seq(
    Fx("fixture_0.flac", 8000, 1, 16, 600, 9000, 1, 1), // fixed2, bs 192
    Fx("fixture_1.flac", 16000, 2, 16, 500, 7000, 2, 1), // midside, po 2
    Fx("fixture_2.flac", 8000, 1, 8, 300, 120, 3, 1), // LPC, sr code 13
    Fx("fixture_3.flac", 44100, 2, 24, 256, 8000000, 4, 1), // leftside
    Fx("fixture_4.flac", 8000, 1, 16, 400, 4000, 5, 8), // wasted bits
    Fx("fixture_5.flac", 8000, 1, 16, 256, 32000, 6, 1), // escapes
    Fx("fixture_6.flac", 22050, 2, 16, 700, 5000, 7, 1), // rightside, rice2
    Fx("fixture_7.flac", 8000, 1, 12, 350, 1800, 8, 1), // 12-bit verbatim
    Fx("fixture_8.flac", 8000, 1, 16, 3000, 100, 9, 1)) // 188 frames

  def load(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/flac/$name")
    require(in != null, s"missing FLAC fixture $name")
    try in.readAllBytes() finally in.close()
  }

  /** The PCM both encoders committed to — interleaved. */
  def formulaPcm(fx: Fx): Array[Int] =
    Array.tabulate(fx.nFrames * fx.channels) { i =>
      val frame = i / fx.channels
      val ch = i % fx.channels
      val v = (((frame + 7).toLong * (fx.salt + 3) * 2203 + ch * 911)
        % (2L * fx.amp + 1)).toInt - fx.amp
      v * fx.scale
    }
}
