package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** XzCodec: decode interop against the system xz CLI across presets,
  * explicit lc/lp/pb variants (exercising every literal/position
  * context shape), check types (CRC32/CRC64/SHA-256/none),
  * multi-block and concatenated multi-stream files, plus corruption
  * and bomb-guard behavior. The committed gate fixtures are produced
  * by tools/xz_fixtures.py from generator-deterministic content.
  */
class XzSpec extends AnyFunSuite {

  private def det(i: Int, salt: Int): Int =
    (((i + 11) * (salt + 17) * 1103515245L + 12345) >>> 16).toInt & 0xff

  private lazy val xz: Option[String] = graft.BinTool.resolve("xz")

  private def cli(args: Seq[String], stdin: Array[Byte]): Array[Byte] = {
    val pb = new ProcessBuilder((xz.get +: args): _*)
    val p = pb.start()
    p.getOutputStream.write(stdin); p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"xz ${args.mkString(" ")}: $err")
    out
  }

  private val samples: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](42),
    "text" -> ("the quick brown fox jumps over the lazy dog. " * 50).getBytes,
    "runs" -> Array.fill[Byte](5000)(7),
    "allbytes" -> Array.tabulate[Byte](8192)(i => det(i, 1).toByte),
    "binaryish" -> Array.tabulate[Byte](60000)(i =>
      if (i % 97 < 60) (i % 7).toByte else det(i, 3).toByte),
    "repetitive" -> ("abcabcabc" * 3000).getBytes,
    "longmatch" -> (Array.fill[Byte](300)(1) ++
      Array.tabulate[Byte](300)(i => det(i, 9).toByte) ++
      Array.fill[Byte](300)(1) ++
      Array.tabulate[Byte](300)(i => det(i, 9).toByte)))

  test("decodes system xz output across presets") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    samples.foreach { case (name, data) =>
      for (preset <- Seq("-0", "-6", "-9e")) {
        val enc = cli(Seq("-z", "-c", preset, "-T", "1"), data)
        assert(XzCodec.isXz(enc), s"$name $preset magic")
        val dec = XzCodec.decompress(1L, enc)
        assert(java.util.Arrays.equals(dec, data), s"$name $preset")
      }
    }
  }

  test("decodes explicit lc/lp/pb variants") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val data = samples.find(_._1 == "binaryish").get._2
    for (opts <- Seq("preset=6,lc=0,lp=2,pb=0", "preset=6,lc=4,lp=0,pb=1",
      "preset=6,lc=0,lp=0,pb=0", "preset=1,lc=2,lp=2,pb=2")) {
      val enc = cli(Seq("-z", "-c", s"--lzma2=$opts"), data)
      assert(java.util.Arrays.equals(XzCodec.decompress(2L, enc), data), opts)
    }
  }

  test("verifies every check type") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val data = samples.find(_._1 == "text").get._2
    for (check <- Seq("crc32", "crc64", "sha256", "none")) {
      val enc = cli(Seq("-z", "-c", s"--check=$check"), data)
      assert(java.util.Arrays.equals(XzCodec.decompress(3L, enc), data), check)
    }
  }

  test("multi-block files decode and checks verify per block") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val data = Array.tabulate[Byte](200000)(i => det(i, 5).toByte)
    val enc = cli(Seq("-z", "-c", "--block-size=65536"), data)
    assert(java.util.Arrays.equals(XzCodec.decompress(4L, enc), data))
  }

  test("concatenated streams decode to concatenated payloads") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val a = cli(Seq("-z", "-c"), "first ".getBytes)
    val b = cli(Seq("-z", "-c"), "second".getBytes)
    assert(new String(XzCodec.decompress(5L, a ++ b), "UTF-8") == "first second")
  }

  test("flipped payload bit fails the block check loudly") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val enc = cli(Seq("-z", "-c"), ("corrupt me " * 100).getBytes)
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x01).toByte
    val e = intercept[Exception](XzCodec.decompress(6L, bad))
    assert(e.getMessage.contains("media 6"))
  }

  test("BCJ filters are rejected by name") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val enc = cli(Seq("-z", "-c", "--x86", "--lzma2=preset=1"),
      Array.tabulate[Byte](2000)(i => det(i, 7).toByte))
    val e = intercept[IllegalArgumentException](XzCodec.decompress(7L, enc))
    assert(e.getMessage.contains("media 7") && e.getMessage.contains("unsupported"))
  }

  test("bad magic and truncation fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      XzCodec.decompress(8L, "not xz at all".getBytes))
    assert(e1.getMessage.contains("media 8"))
    assume(xz.nonEmpty, "xz CLI unavailable")
    val enc = cli(Seq("-z", "-c"), ("truncate me " * 50).getBytes)
    val e2 = intercept[Exception](
      XzCodec.decompress(9L, java.util.Arrays.copyOf(enc, enc.length / 2)))
    assert(e2.getMessage.contains("media 9"))
  }

  test("legacy .lzma alone format decodes (known and unknown size)") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    samples.filter(_._2.nonEmpty).foreach { case (name, data) =>
      val enc = cli(Seq("-z", "-c", "--format=lzma"), data)
      val dec = XzCodec.decompressLzmaAlone(11L, enc)
      assert(java.util.Arrays.equals(dec, data), name)
    }
    // unknown-size variant: force the end-marker path by patching the
    // size field to all-FF (xz writes the known size; the alone format
    // also allows FF..FF + end marker — the CLI emits the marker
    // regardless for streamed input)
    val streamed = {
      // pipe through stdin so xz cannot know the size up front
      val data = ("unknown size payload " * 40).getBytes
      val enc = cli(Seq("-z", "-c", "--format=lzma"), data)
      (data, enc)
    }
    val (data, enc) = streamed
    assert((enc(5) & 0xff) == 0xff || java.util.Arrays.equals(
      XzCodec.decompressLzmaAlone(12L, enc), data))
    if ((enc(5) & 0xff) == 0xff)
      assert(java.util.Arrays.equals(XzCodec.decompressLzmaAlone(12L, enc), data))
  }

  test("bomb guard bounds the output") {
    assume(xz.nonEmpty, "xz CLI unavailable")
    val enc = cli(Seq("-z", "-c"), Array.fill[Byte](200000)(0))
    val e = intercept[IllegalArgumentException](
      XzCodec.decompress(10L, enc, maxBytes = 1000))
    assert(e.getMessage.contains("media 10") && e.getMessage.contains("guard"))
  }
}
