package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BrotliCodec: fuzz interop against the system libbrotlienc (via
  * tools/brotli_probe.py, the libwebp-probe pattern) across the
  * quality range (q0-q11 exercise different stream features: simple
  * codes, context maps, static-dictionary references with transforms)
  * and window sizes, plus corruption and guard behavior.
  */
class BrotliSpec extends AnyFunSuite {

  private def det(i: Int, salt: Int): Int =
    (((i + 11) * (salt + 17) * 1103515245L + 12345) >>> 16).toInt & 0xff

  private lazy val python: Option[String] =
    graft.BinTool.resolve("python3").filter { py =>
      try {
        val p = new ProcessBuilder(py, "-c",
          "import ctypes; ctypes.CDLL('libbrotlienc.so.1')").start()
        p.waitFor() == 0
      } catch { case _: Exception => false }
    }

  private def encode(data: Array[Byte], quality: Int, lgwin: Int): Array[Byte] = {
    val pb = new ProcessBuilder(python.get, "tools/brotli_probe.py",
      "encode", quality.toString, lgwin.toString)
    val p = pb.start()
    p.getOutputStream.write(data); p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"brotli encode q=$quality: $err")
    out
  }

  // dictionary-heavy English text forces static-dictionary references
  // with transforms at high quality
  private val english =
    ("The quick brown fox jumps over the lazy dog. This is because " +
      "information about the public working of the development should " +
      "never have different included when the government particular " +
      "American community provides the description, the system also " +
      "received an international experience with The And of course. ") * 12

  private val samples: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](42),
    "english" -> english.getBytes("UTF-8"),
    "runs" -> Array.fill[Byte](9000)(7),
    "allbytes" -> Array.tabulate[Byte](8192)(i => det(i, 1).toByte),
    "binaryish" -> Array.tabulate[Byte](70000)(i =>
      if (i % 97 < 60) (i % 7).toByte else det(i, 3).toByte),
    "repetitive" -> ("abcabcabc" * 4000).getBytes,
    "utf8" -> ("naïve — “quoted” 日本語 текст ελληνικά " * 300).getBytes("UTF-8"),
    "mixedcase" -> ("The THE the tHe Information INFORMATION information " * 200).getBytes)

  test("decodes libbrotli output across the quality range") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    samples.foreach { case (name, data) =>
      for (q <- Seq(0, 1, 2, 4, 6, 9, 11)) {
        val enc = encode(data, q, 22)
        val dec = BrotliCodec.decompress(1L, enc)
        assert(java.util.Arrays.equals(dec, data), s"$name q=$q")
      }
    }
  }

  test("decodes across window sizes (10..24)") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    val data = samples.find(_._1 == "binaryish").get._2
    for (w <- Seq(10, 16, 18, 24)) {
      val enc = encode(data, 5, w)
      assert(java.util.Arrays.equals(BrotliCodec.decompress(2L, enc), data), s"w=$w")
    }
  }

  test("random fuzz across sizes and qualities") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    for (salt <- 0 until 12) {
      val n = 1 + (det(salt, 31) * 371) % 50000
      val data = Array.tabulate[Byte](n) { i =>
        // mix texty and binary regions to flip context modes
        if ((i / 700) % 2 == 0) ("etaoin shrdlu THE quick ".charAt(i % 24)).toByte
        else det(i, salt).toByte
      }
      val q = Seq(1, 5, 9, 11)(salt % 4)
      val enc = encode(data, q, 20)
      assert(java.util.Arrays.equals(BrotliCodec.decompress(3L, enc), data),
        s"fuzz salt=$salt q=$q n=$n")
    }
  }

  test("corruption fails loudly with the media id") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    val enc = encode(english.getBytes("UTF-8"), 9, 22)
    var loud = 0
    for (flip <- Seq(2, enc.length / 3, enc.length / 2, enc.length - 3)) {
      val bad = enc.clone()
      bad(flip) = (bad(flip) ^ 0x20).toByte
      try {
        val out = BrotliCodec.decompress(7L, bad)
        // a flip may land in literal payload and still decode to
        // DIFFERENT bytes — that is detectable corruption upstream
        // (checksums live in the transport); count loud failures only
        if (!java.util.Arrays.equals(out, english.getBytes("UTF-8"))) loud += 1
      } catch {
        case e: Exception =>
          assert(e.getMessage != null && e.getMessage.contains("media 7"))
          loud += 1
      }
    }
    assert(loud >= 3, "most bit flips must be detected or alter output")
  }

  test("truncation and garbage fail loudly") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    val enc = encode(english.getBytes("UTF-8"), 9, 22)
    val e = intercept[Exception](
      BrotliCodec.decompress(8L, java.util.Arrays.copyOf(enc, enc.length / 2)))
    assert(e.getMessage.contains("media 8"))
    val e2 = intercept[Exception](BrotliCodec.decompress(9L, Array[Byte]()))
    assert(e2.getMessage.contains("media 9"))
  }

  test("bomb guard bounds the output") {
    assume(python.nonEmpty, "python3/libbrotlienc unavailable")
    val enc = encode(Array.fill[Byte](300000)(0), 9, 22)
    val e = intercept[IllegalArgumentException](
      BrotliCodec.decompress(10L, enc, maxBytes = 1000))
    assert(e.getMessage.contains("media 10") && e.getMessage.contains("guard"))
  }
}
