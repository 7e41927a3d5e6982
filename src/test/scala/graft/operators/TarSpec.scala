package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ustar codec: round-trips, two-direction interop with the system
  * GNU tar binary (the foreign anchor, like gpg for the PGP codec),
  * and loud corruption failures.
  */
class TarSpec extends AnyFunSuite {

  private def members(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(i => (f"$i%06d.txt",
      s"payload $i ${"y" * (i * 13 % 700)}".getBytes("UTF-8")))

  test("round-trip preserves names, order, and bytes") {
    val ms = members(5)
    val back = TarCodec.parse(1L, TarCodec.write(ms, mtime = 1700000000L))
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("empty member and block-boundary sizes round-trip") {
    val ms = Seq(
      "empty.txt" -> Array.emptyByteArray,
      "block.txt" -> Array.fill[Byte](512)('a'),
      "blockminus.txt" -> Array.fill[Byte](511)('b'),
      "blockplus.txt" -> Array.fill[Byte](513)('c'))
    val back = TarCodec.parse(2L, TarCodec.write(ms))
    assert(back.map(m => m._1 -> m._2.length) ==
      Seq("empty.txt" -> 0, "block.txt" -> 512,
        "blockminus.txt" -> 511, "blockplus.txt" -> 513))
  }

  // resolve the binary by probing PATH + system bins so suite health
  // doesn't depend on the invoking shell's PATH
  private lazy val tarBin: Option[String] = graft.BinTool.resolve("tar")

  private def run(cmd0: Seq[String], cwd: java.io.File): String = {
    assume(tarBin.isDefined, "tar binary not reachable — skipping interop")
    val cmd = tarBin.get +: cmd0.tail
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), s"$cmd timed out")
    assert(p.exitValue() == 0, s"$cmd failed: $out")
    out
  }

  test("GNU tar extracts our archives byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toFile
    val ms = members(4)
    java.nio.file.Files.write(dir.toPath.resolve("ours.tar"),
      TarCodec.write(ms, mtime = 1700000000L))
    run(Seq("tar", "-xf", "ours.tar"), dir)
    ms.foreach { case (name, data) =>
      val got = java.nio.file.Files.readAllBytes(dir.toPath.resolve(name))
      assert(java.util.Arrays.equals(got, data), name)
    }
    // and tar -t agrees on the member list
    val listing = run(Seq("tar", "-tf", "ours.tar"), dir).trim.split("\n").toSeq
    assert(listing == ms.map(_._1))
  }

  test("we parse GNU tar output byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec2").toFile
    val ms = members(3)
    ms.foreach { case (name, data) =>
      java.nio.file.Files.write(dir.toPath.resolve(name), data)
    }
    run(Seq("tar", "--format=ustar", "-cf", "theirs.tar") ++ ms.map(_._1), dir)
    val bytes = java.nio.file.Files.readAllBytes(dir.toPath.resolve("theirs.tar"))
    val back = TarCodec.parse(3L, bytes)
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("corrupt archives fail loudly with the media id") {
    val good = TarCodec.write(members(3))
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](
        TarCodec.parse(99L, mutate(good.clone())))
      assert(e.getMessage.contains("media 99"), s"$what: ${e.getMessage}")
    }
    expectFail(b => { b(0) = (b(0) ^ 1).toByte; b }, "name flip breaks checksum")
    expectFail(b => { b(124) = '7'; b }, "size corruption")
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, 512), "no terminator")
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, 100), "not block-aligned")
    intercept[IllegalArgumentException](
      TarCodec.write(Seq(("x" * 101) -> Array.emptyByteArray)))
  }
}
