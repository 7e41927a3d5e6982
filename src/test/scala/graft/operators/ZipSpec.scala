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

  test("zip64 archives parse (EOCD64 + per-entry extended info)") {
    // build a classic archive, then rewrite it into a spec-valid
    // zip64 layout: central entries get saturated size/offset fields
    // with 0x0001 extras; EOCD64 + locator precede an EOCD whose
    // counts/offset are saturated — the layout >4GB archives use
    val ms = members(3)
    val classic = ZipCodec.write(ms)
    def u16le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32le(v: Long) = Array.tabulate[Byte](4)(i => ((v >> (8 * i)) & 0xff).toByte)
    def u64le(v: Long) = Array.tabulate[Byte](8)(i => ((v >> (8 * i)) & 0xff).toByte)
    // locate classic EOCD (our writer emits no comment)
    val eocd = classic.length - 22
    assert(classic(eocd) == 'P' && classic(eocd + 1) == 'K' &&
      classic(eocd + 2) == 5 && classic(eocd + 3) == 6)
    def cu16(o: Int) = (classic(o) & 0xff) | ((classic(o + 1) & 0xff) << 8)
    def cu32(o: Int) = (classic(o) & 0xffL) | ((classic(o + 1) & 0xffL) << 8) |
      ((classic(o + 2) & 0xffL) << 16) | ((classic(o + 3) & 0xffL) << 24)
    val n = cu16(eocd + 10)
    val cdOff = cu32(eocd + 16).toInt
    // rebuild the central directory with zip64 extras on every entry
    val out = new java.io.ByteArrayOutputStream()
    out.write(classic, 0, cdOff) // local headers + data unchanged
    val newCdOff = out.size()
    var pos = cdOff
    var e = 0
    while (e < n) {
      val nameLen = cu16(pos + 28)
      val extraLen = cu16(pos + 30)
      val commentLen = cu16(pos + 32)
      val csize = cu32(pos + 20)
      val usize = cu32(pos + 24)
      val lho = cu32(pos + 42)
      val hdr = classic.slice(pos, pos + 46 + nameLen)
      // saturate usize/csize/lho; append a zip64 extra with all three
      System.arraycopy(u32le(0xffffffffL), 0, hdr, 20, 4)
      System.arraycopy(u32le(0xffffffffL), 0, hdr, 24, 4)
      System.arraycopy(u32le(0xffffffffL), 0, hdr, 42, 4)
      val extra = u16le(0x0001) ++ u16le(24) ++
        u64le(usize) ++ u64le(csize) ++ u64le(lho)
      System.arraycopy(u16le(extraLen + extra.length), 0, hdr, 30, 2)
      out.write(hdr)
      out.write(classic, pos + 46 + nameLen, extraLen) // existing extras
      out.write(extra)
      pos += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    val cdSize = out.size() - newCdOff
    val e64Off = out.size()
    // EOCD64 (56 bytes)
    out.write(Array[Byte]('P', 'K', 6, 6))
    out.write(u64le(44))            // size of remainder
    out.write(u16le(45)); out.write(u16le(45)) // version made/needed
    out.write(u32le(0)); out.write(u32le(0))   // disk numbers
    out.write(u64le(n.toLong)); out.write(u64le(n.toLong))
    out.write(u64le(cdSize.toLong))
    out.write(u64le(newCdOff.toLong))
    // EOCD64 locator (20 bytes)
    out.write(Array[Byte]('P', 'K', 6, 7))
    out.write(u32le(0))
    out.write(u64le(e64Off.toLong))
    out.write(u32le(1))
    // saturated classic EOCD
    out.write(Array[Byte]('P', 'K', 5, 6))
    out.write(u16le(0)); out.write(u16le(0))
    out.write(u16le(0xffff)); out.write(u16le(0xffff))
    out.write(u32le(0xffffffffL)); out.write(u32le(0xffffffffL))
    out.write(u16le(0))
    val z64 = out.toByteArray
    val parsed = ZipCodec.parse(64L, z64)
    assert(parsed.map(_._1) == ms.map(_._1))
    ms.zip(parsed).foreach { case ((name, want), (_, got)) =>
      assert(java.util.Arrays.equals(got, want), name)
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
