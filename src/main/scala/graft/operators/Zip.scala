package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP container codec (APPNOTE.TXT / PKZIP 2.0 subset) — the other
  * archive format document dumps actually arrive in (source trees,
  * office formats, dataset bundles). The reader walks the CENTRAL
  * DIRECTORY — the authoritative index a robust reader must trust
  * over the streamable local headers — located via the end-of-
  * central-directory record, and verifies every member's CRC-32 and
  * sizes after inflation; stored (0) and deflate (8) methods are
  * supported, while encryption, zip64, and other methods are
  * rejected BY NAME rather than mis-read. The writer emits
  * deterministic archives (fixed DOS timestamp) with correct local +
  * central records, deflate-compressed.
  *
  * Same executor-side contract as [[TarCodec]]/[[WarcCodec]]: one
  * archive decodes per row inside a partition, corrupt inputs fail
  * loudly with the media id.
  */
object ZipCodec {

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  /** Parse members in central-directory order, CRC/size verified. */
  def parse(id: Long, bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes != null && bytes.length >= 22, s"media $id: not a ZIP archive")
    // EOCD: scan backwards (comment may follow) for PK\x05\x06
    var eocd = -1
    var i = bytes.length - 22
    val stop = math.max(0, bytes.length - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' &&
        bytes(i + 2) == 5 && bytes(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) fail(id, "no end-of-central-directory record")
    var nEntries: Long = u16(bytes, eocd + 10).toLong
    if (nEntries != u16(bytes, eocd + 8))
      fail(id, "multi-disk archives not supported")
    var cdOff = u32(bytes, eocd + 16)
    if (cdOff == 0xffffffffL || nEntries == 0xffffL) {
      // zip64: the EOCD64 locator (PK\x06\x07, 20 bytes) sits directly
      // before the EOCD and points at the EOCD64 record (PK\x06\x06)
      val loc = eocd - 20
      if (loc < 0 || !(bytes(loc) == 'P' && bytes(loc + 1) == 'K' &&
        bytes(loc + 2) == 6 && bytes(loc + 3) == 7))
        fail(id, "zip64 markers present but EOCD64 locator missing")
      if (u32(bytes, loc + 4) != 0 || u32(bytes, loc + 16) != 1)
        fail(id, "multi-disk zip64 archives not supported")
      val e64 = u64(bytes, loc + 8)
      if (e64 < 0 || e64 + 56 > loc)
        fail(id, s"zip64 EOCD64 offset $e64 out of range")
      val z = e64.toInt
      if (!(bytes(z) == 'P' && bytes(z + 1) == 'K' &&
        bytes(z + 2) == 6 && bytes(z + 3) == 6))
        fail(id, "bad EOCD64 record magic")
      nEntries = u64(bytes, z + 32)
      if (nEntries != u64(bytes, z + 24))
        fail(id, "multi-disk zip64 archives not supported")
      cdOff = u64(bytes, z + 48)
      if (nEntries > 1000000) fail(id, s"implausible zip64 entry count $nEntries")
    }
    if (cdOff > eocd) fail(id, s"central directory offset $cdOff past EOCD $eocd")

    val out = Vector.newBuilder[(String, Array[Byte])]
    var pos = cdOff.toInt
    var e = 0
    while (e < nEntries) {
      if (pos + 46 > bytes.length ||
        !(bytes(pos) == 'P' && bytes(pos + 1) == 'K' &&
          bytes(pos + 2) == 1 && bytes(pos + 3) == 2))
        fail(id, s"bad central-directory entry $e at $pos")
      val flags = u16(bytes, pos + 8)
      if ((flags & 0x1) != 0) fail(id, s"entry $e is encrypted")
      val method = u16(bytes, pos + 10)
      val crc = u32(bytes, pos + 16)
      var csize = u32(bytes, pos + 20)
      var usize = u32(bytes, pos + 24)
      val nameLen = u16(bytes, pos + 28)
      val extraLen = u16(bytes, pos + 30)
      val commentLen = u16(bytes, pos + 32)
      var lho = u32(bytes, pos + 42)
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL) {
        // zip64 extended-information extra (id 0x0001): u64 values in
        // fixed order, present only for the fields that saturated
        var eo = pos + 46 + nameLen
        val eEnd = eo + extraLen
        var found = false
        while (eo + 4 <= eEnd && !found) {
          val eid = u16(bytes, eo)
          val esz = u16(bytes, eo + 2)
          if (eid == 0x0001) {
            var vo = eo + 4
            if (usize == 0xffffffffL) { usize = u64(bytes, vo); vo += 8 }
            if (csize == 0xffffffffL) { csize = u64(bytes, vo); vo += 8 }
            if (lho == 0xffffffffL) { lho = u64(bytes, vo); vo += 8 }
            if (vo > eo + 4 + esz) fail(id, s"entry $e zip64 extra too short")
            found = true
          }
          eo += 4 + esz
        }
        if (!found) fail(id, s"entry $e saturated fields without a zip64 extra")
      }
      // sizes are u32: anything past the archive (or Int range) is
      // corrupt — guard BEFORE any toInt/allocation wraps negative
      if (csize > bytes.length || usize > (1L << 26))
        fail(id, s"entry $e sizes ($csize/$usize) exceed archive/decode bounds")
      if (pos + 46 + nameLen > bytes.length)
        fail(id, s"entry $e name overruns archive")
      val name = new String(bytes, pos + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header: its own name/extra lengths govern the data start
      if (lho > bytes.length - 30)
        fail(id, s"entry '$name': local header offset $lho outside archive")
      val lh = lho.toInt
      if (lh + 30 > bytes.length ||
        !(bytes(lh) == 'P' && bytes(lh + 1) == 'K' &&
          bytes(lh + 2) == 3 && bytes(lh + 3) == 4))
        fail(id, s"entry '$name': bad local header at $lh")
      val dataStart = lh + 30 + u16(bytes, lh + 26) + u16(bytes, lh + 28)
      if (dataStart + csize > bytes.length)
        fail(id, s"entry '$name' data ($csize bytes) overruns archive")
      val data = method match {
        case 0 => // stored
          if (csize != usize)
            fail(id, s"entry '$name': stored sizes disagree ($csize != $usize)")
          java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + csize.toInt)
        case 8 => // deflate
          val inf = new Inflater(true)
          inf.setInput(bytes, dataStart, csize.toInt)
          val buf = new Array[Byte](usize.toInt)
          var got = 0
          try {
            while (got < buf.length && !inf.finished()) {
              val n = inf.inflate(buf, got, buf.length - got)
              if (n == 0 && !inf.finished())
                fail(id, s"entry '$name': truncated deflate stream")
              got += n
            }
          } catch {
            case _: java.util.zip.DataFormatException =>
              fail(id, s"entry '$name': corrupt deflate stream")
          } finally inf.end()
          if (got != buf.length)
            fail(id, s"entry '$name': inflated $got of ${buf.length} bytes")
          buf
        case m => fail(id, s"entry '$name': unsupported compression method $m")
      }
      val check = new CRC32()
      check.update(data)
      if (check.getValue != crc)
        fail(id, s"entry '$name': CRC mismatch")
      out += name -> data
      pos += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    out.result()
  }

  /** Write a deterministic deflate ZIP (fixed DOS time 1980-01-01). */
  def write(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    final case class Entry(name: Array[Byte], crc: Long, csize: Int,
      usize: Int, offset: Int)
    val entries = members.map { case (name, data) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nb.length <= 0xffff, s"zip member name too long: $name")
      val crc = new CRC32()
      crc.update(data)
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data)
      d.finish()
      val z = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) z.write(buf, 0, d.deflate(buf))
      d.end()
      val offset = out.size()
      out.write(Array[Byte]('P', 'K', 3, 4), 0, 4)
      le16(20); le16(0); le16(8) // version, flags, deflate
      le16(0); le16(0x21) // DOS time 00:00, date 1980-01-01
      le32(crc.getValue); le32(z.size().toLong); le32(data.length.toLong)
      le16(nb.length); le16(0)
      out.write(nb, 0, nb.length)
      z.writeTo(out)
      Entry(nb, crc.getValue, z.size(), data.length, offset)
    }
    val cdStart = out.size()
    entries.foreach { en =>
      out.write(Array[Byte]('P', 'K', 1, 2), 0, 4)
      le16(20); le16(20); le16(0); le16(8)
      le16(0); le16(0x21)
      le32(en.crc); le32(en.csize.toLong); le32(en.usize.toLong)
      le16(en.name.length); le16(0); le16(0)
      le16(0); le16(0); le32(0); le32(en.offset.toLong)
      out.write(en.name, 0, en.name.length)
    }
    val cdSize = out.size() - cdStart
    out.write(Array[Byte]('P', 'K', 5, 6), 0, 4)
    le16(0); le16(0); le16(entries.length); le16(entries.length)
    le32(cdSize.toLong); le32(cdStart.toLong); le16(0)
    out.toByteArray
  }
}
