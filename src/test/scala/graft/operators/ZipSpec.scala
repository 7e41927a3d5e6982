package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP codec: round-trips, two-direction interop with the JDK's
  * independent java.util.zip implementation, and loud corruption /
  * unsupported-feature failures.
  */
class ZipSpec extends AnyFunSuite {

  private def members(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(i => (f"docs/$i%06d.txt",
      s"zip payload $i ${"q" * (i * 11 % 300)}".getBytes("UTF-8")))

  test("round-trip preserves names, order, bytes") {
    val ms = members(6) :+ ("empty.bin" -> Array.emptyByteArray)
    val back = ZipCodec.parse(1L, ZipCodec.write(ms))
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("JDK ZipFile reads our archives exactly") {
    val ms = members(4)
    val f = java.io.File.createTempFile("zipspec", ".zip")
    java.nio.file.Files.write(f.toPath, ZipCodec.write(ms))
    val zf = new java.util.zip.ZipFile(f)
    try {
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val en = zf.entries()
      while (en.hasMoreElements) {
        val e = en.nextElement()
        names += e.getName
        val got = zf.getInputStream(e).readAllBytes()
        val want = ms.find(_._1 == e.getName).get._2
        assert(java.util.Arrays.equals(got, want), e.getName)
      }
      assert(names.toSeq == ms.map(_._1))
    } finally zf.close()
  }

  test("we parse JDK ZipOutputStream output exactly (incl. stored entries)") {
    val ms = members(3)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    ms.zipWithIndex.foreach { case ((name, data), i) =>
      val e = new java.util.zip.ZipEntry(name)
      if (i == 1) { // one STORED entry exercises method 0
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length)
        val c = new java.util.zip.CRC32()
        c.update(data)
        e.setCrc(c.getValue)
      }
      zos.putNextEntry(e)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    val back = ZipCodec.parse(2L, bos.toByteArray)
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("corruption and unsupported features fail loudly with the media id") {
    val good = ZipCodec.write(members(3))
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](
        ZipCodec.parse(99L, mutate(good.clone())))
      assert(e.getMessage.contains("media 99"), s"$what: ${e.getMessage}")
    }
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, 10), "truncation")
    expectFail(b => { // flip a byte inside entry 0's deflate stream
      // (local header 30 + 15-byte name = data at 45)
      b(50) = (b(50) ^ 0x55).toByte; b
    }, "payload corruption")
    expectFail(b => { // set the encryption flag in the first CD entry
      var i = b.length - 22
      while (!(b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)) i -= 1
      val cd = ((b(i + 16) & 0xff) | ((b(i + 17) & 0xff) << 8) |
        ((b(i + 18) & 0xff) << 16) | ((b(i + 19) & 0xff) << 24))
      b(cd + 8) = (b(cd + 8) | 1).toByte; b
    }, "encryption flag")
    expectFail(_ => "PKstuff but not a zip at all".getBytes("UTF-8"), "no EOCD")
  }
}
