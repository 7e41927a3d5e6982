package graft.operators

import graft.SparkSpec

/** AVI container walk + MJPEG frame decode: synthesize/parse round
  * trips, corruption rejection, and the Spark frame-decode operator
  * against directly-computed expectations.
  */
class MjpegSpec extends SparkSpec {

  private def grayFrame(w: Int, h: Int, vOf: (Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = vOf(x / 16, y / 16) & 0xff
        val o = (y * w + x) * 3
        rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    JpegCodec.encodeRgb(w, h, rgb, quality = 100, subsample = true)
  }

  test("AVI synthesize/parse round-trips frames byte-for-byte (odd-length alignment)") {
    val frames = Seq(
      grayFrame(64, 48, (bx, by) => 20 + bx + by),
      grayFrame(64, 48, (bx, by) => 40 + 2 * bx + by),
      grayFrame(64, 48, (bx, by) => 60 + bx * by))
    // force an odd-length chunk too: append a raw odd-length frame
    val odd = frames.head :+ 0x00.toByte // still decodes (trailing pad after EOI ignored by storage)
    val avi = AviCodec.synthesize(64, 48, 33333, frames :+ odd)
    val meta = AviCodec.parse(1L, avi)
    assert(meta.width == 64 && meta.height == 48 && meta.usPerFrame == 33333L)
    assert(meta.declaredFrames == 4 && meta.frames.length == 4)
    (frames :+ odd).zip(meta.frames).zipWithIndex.foreach { case ((exp, got), i) =>
      assert(java.util.Arrays.equals(exp, got), s"frame $i bytes differ")
    }
  }

  test("AVI parse rejects corruption and foreign codecs loudly") {
    val avi = AviCodec.synthesize(32, 16, 40000, Seq(grayFrame(32, 16, (_, _) => 128)))
    // not RIFF
    assertThrows[IllegalArgumentException] { AviCodec.parse(2L, avi.drop(4)) }
    // truncated: RIFF size overruns
    assertThrows[IllegalArgumentException] { AviCodec.parse(3L, avi.take(avi.length / 2)) }
    // foreign codec fourcc in strh
    val hacked = avi.clone()
    val idx = {
      // find "MJPG" after "vids"
      val s = new String(hacked.map(b => (b & 0xff).toChar))
      s.indexOf("vids") + 4
    }
    "H264".zipWithIndex.foreach { case (c, i) => hacked(idx + i) = c.toByte }
    val e = intercept[IllegalArgumentException] { AviCodec.parse(4L, hacked) }
    assert(e.getMessage.contains("unsupported"))
  }

  test("decodeFrames samples every Nth frame and decodes exactly in the q=100 regime") {
    import spark.implicits._
    def vOf(m: Long, f: Int)(bx: Int, by: Int): Int =
      (22 + (m * 31 + f * 17 + bx * 41 + by * 59) % 211).toInt
    val vids = (0L to 2L).map { m =>
      val frames = (0 until 5).map(f => grayFrame(64, 48, vOf(m, f)))
      (m, AviCodec.synthesize(64, 48, 33333, frames))
    }
    val df = vids.toDF("media_id", "content")
    val rows = MjpegVideo.decodeFrames(df, everyN = 2).collect()
      .sortBy(r => (r.media_id, r.frame_no))
    assert(rows.length == 3 * 3) // frames 0, 2, 4
    rows.foreach { r =>
      assert(r.n_frames == 5 && r.width == 64 && r.height == 48)
      assert(r.frame_no % 2 == 0)
      // exact channel sum from the generator formula: 3 channels x
      // 16x16 pixels per block x 4x3 blocks
      val expSum = (for (bx <- 0 until 4; by <- 0 until 3)
        yield 3L * 256 * vOf(r.media_id, r.frame_no)(bx, by)).sum
      assert(r.channel_sum == expSum, s"media ${r.media_id} frame ${r.frame_no}")
      assert(r.n_channel_bytes == 64L * 48 * 3)
      assert(r.mean_intensity == expSum.toDouble / (64L * 48 * 3))
      // aHash replay: sample grid (8x8) hits block (j%8/2, (6*(j/8))/16)
      val lumas = (0 until 64).map { j =>
        3L * vOf(r.media_id, r.frame_no)((j % 8) * 8 / 16, (j / 8) * 6 / 16)
      }
      val total = lumas.sum
      val expHash = (0 until 64).foldLeft(0L) { (h, j) =>
        if (64L * lumas(j) > total) h | (1L << j) else h
      }
      assert(r.ahash == expHash, s"ahash media ${r.media_id} frame ${r.frame_no}")
    }
  }

  test("near-identical frames across videos land within a small hamming distance") {
    import spark.implicits._
    // two videos share content; the second perturbs one block slightly
    def frame(perturb: Boolean) = grayFrame(64, 48, (bx, by) =>
      30 + bx * 40 + by * 50 + (if (perturb && bx == 0 && by == 0) 6 else 0))
    val df = Seq(
      (10L, AviCodec.synthesize(64, 48, 33333, Seq(frame(false)))),
      (11L, AviCodec.synthesize(64, 48, 33333, Seq(frame(true))))).toDF("media_id", "content")
    val hashes = MjpegVideo.frameHashes(df, everyN = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val d = java.lang.Long.bitCount(hashes(10L) ^ hashes(11L))
    assert(d <= 3, s"perturbed near-dup at hamming $d")
  }
}
