package graft.operators

/** TIFF privacy scrub — the [[JpegCodec.stripExif]] /
  * [[PngCodec.stripMetadata]] sibling for the scanned-document tier:
  * TIFFs carry creator strings and GPS directly in their IFDs
  * (Artist, ImageDescription, DateTime, Copyright, XMP, GPSInfo).
  * The scrub is SURGICAL — strip data must stay byte-identical, so
  * instead of a decode→re-encode round-trip each reachable IFD is
  * rewritten in place without the privacy entries, and every removed
  * entry's out-of-line value bytes (including the whole GPS sub-IFD
  * and the rationals it references) are ZEROED, not merely
  * unreferenced — a forensic read of the scrubbed file finds nothing.
  * Both byte orders, multi-page chains.
  */
object TiffScrub {

  /** ImageDescription, Make, Model, Software, DateTime, Artist,
    * HostComputer, Copyright, XMP, GPSInfo — the metadata classes a
    * compliance pass removes. Orientation (274) is NOT here: it
    * stays, like the JPEG scrub's orientation preservation.
    */
  private val PrivacyTags =
    Set(270, 271, 272, 305, 306, 315, 316, 33432, 700, 34853)

  private val GpsTag = 34853

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private final class Io(b: Array[Byte], val le: Boolean) {
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def set16(o: Int, v: Int): Unit =
      if (le) { b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte }
      else { b(o) = ((v >> 8) & 0xff).toByte; b(o + 1) = (v & 0xff).toByte }
    def set32(o: Int, v: Long): Unit =
      if (le) {
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
        b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
      } else {
        b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
        b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
      }
  }

  private val TypeSize =
    Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1, 7 -> 1,
      8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8)

  private def order(id: Long, b: Array[Byte]): Boolean = {
    require(TiffCodec.isTiff(b), s"media $id: not a TIFF")
    b(0) == 'I'
  }

  /** True when any reachable IFD carries a GPSInfo pointer. */
  def hasGps(id: Long, b: Array[Byte]): Boolean = {
    val io = new Io(b, order(id, b))
    var off = io.u32(4).toInt
    var hops = 0
    while (off != 0) {
      require(off + 2 <= b.length && hops < 1000,
        s"media $id: corrupt IFD chain")
      val n = io.u16(off)
      var i = 0
      while (i < n) {
        if (io.u16(off + 2 + i * 12) == GpsTag) return true
        i += 1
      }
      off = io.u32(off + 2 + n * 12).toInt
      hops += 1
    }
    false
  }

  private def zero(b: Array[Byte], from: Long, len: Long, id: Long): Unit = {
    require(from >= 0 && from + len <= b.length,
      s"media $id: privacy value overruns the file")
    java.util.Arrays.fill(b, from.toInt, (from + len).toInt, 0.toByte)
  }

  /** Zero a GPS sub-IFD: its out-of-line values first, then the IFD
    * block itself (count + entries + next pointer).
    */
  private def zeroGpsIfd(io: Io, b: Array[Byte], off: Long, id: Long): Unit = {
    require(off >= 8 && off + 2 <= b.length, s"media $id: bad GPS IFD offset")
    val o = off.toInt
    val n = io.u16(o)
    var i = 0
    while (i < n) {
      val e = o + 2 + i * 12
      val typ = io.u16(e + 2)
      val cnt = io.u32(e + 4)
      val sz = TypeSize.getOrElse(typ, 1).toLong * cnt
      if (sz > 4) zero(b, io.u32(e + 8), sz, id)
      i += 1
    }
    zero(b, off, 2L + n * 12 + 4, id)
  }

  /** Remove the privacy entries from every reachable IFD: kept
    * entries compact forward, the next-IFD pointer moves up, the gap
    * zeroes out, and every removed entry's out-of-line bytes zero.
    * Pixels and all other bytes stay identical.
    */
  def scrub(id: Long, b: Array[Byte]): Array[Byte] = {
    val out = b.clone()
    val io = new Io(out, order(id, b))
    var off = io.u32(4).toInt
    var hops = 0
    while (off != 0) {
      require(off + 2 <= out.length && hops < 1000,
        s"media $id: corrupt IFD chain")
      val n = io.u16(off)
      require(off + 2 + n * 12 + 4 <= out.length,
        s"media $id: IFD at $off overruns the file")
      val nextPtr = io.u32(off + 2 + n * 12)
      val keptOffsets = Seq.newBuilder[Int]
      var i = 0
      while (i < n) {
        val e = off + 2 + i * 12
        val tag = io.u16(e)
        if (PrivacyTags.contains(tag)) {
          val typ = io.u16(e + 2)
          val cnt = io.u32(e + 4)
          if (tag == GpsTag) zeroGpsIfd(io, out, io.u32(e + 8), id)
          else {
            val sz = TypeSize.getOrElse(typ, 1).toLong * cnt
            if (sz > 4) zero(out, io.u32(e + 8), sz, id)
          }
        } else keptOffsets += e
        i += 1
      }
      val kept = keptOffsets.result()
      io.set16(off, kept.length)
      kept.zipWithIndex.foreach { case (src, k) =>
        System.arraycopy(out, src, out, off + 2 + k * 12, 12)
      }
      io.set32(off + 2 + kept.length * 12, nextPtr)
      val gapFrom = off + 2 + kept.length * 12 + 4
      val gapTo = off + 2 + n * 12 + 4
      if (gapTo > gapFrom)
        java.util.Arrays.fill(out, gapFrom, gapTo, 0.toByte)
      off = nextPtr.toInt
      hops += 1
    }
    out
  }

  // --- fixture writer ------------------------------------------------

  /** Splice privacy entries into a TIFF's FIRST IFD — the scrub's
    * fixture face: the original IFD is re-written (appended at the
    * end with Artist/DateTime and optionally a GPS sub-IFD, entries
    * tag-sorted) and the header's first-IFD pointer repointed; the
    * old IFD block becomes unreferenced garbage, which the scrub
    * rightly ignores. Same byte order as the input.
    */
  def withPrivacyTags(id: Long, tiff: Array[Byte], artist: String,
      dateTime: String, gps: Option[(Int, Int)]): Array[Byte] = {
    val le = order(id, tiff)
    val ioIn = new Io(tiff, le)
    val firstIfd = ioIn.u32(4).toInt
    val n = ioIn.u16(firstIfd)
    val nextPtr = ioIn.u32(firstIfd + 2 + n * 12)
    val oldEntries = (0 until n).map { i =>
      java.util.Arrays.copyOfRange(tiff, firstIfd + 2 + i * 12,
        firstIfd + 2 + i * 12 + 12)
    }
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(tiff, 0, tiff.length)
    if (tiff.length % 2 == 1) buf.write(0) // word alignment
    def append(bytes: Array[Byte]): Long = {
      val at = buf.size().toLong
      buf.write(bytes, 0, bytes.length)
      if (bytes.length % 2 == 1) buf.write(0)
      at
    }
    def raw16(v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def raw32(v: Long): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def entry(tag: Int, typ: Int, cnt: Long, value: Array[Byte]): Array[Byte] =
      raw16(tag) ++ raw16(typ) ++ raw32(cnt) ++ value.padTo(4, 0.toByte)

    val artistBytes = (artist + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val artistOff = append(artistBytes)
    val dtBytes = (dateTime + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val dtOff = append(dtBytes)
    val gpsEntry = gps.map { case (latMilli, lonMilli) =>
      def dms(milli: Int): Array[Byte] = {
        val deg = milli / 1000
        val minTotal = (milli % 1000) * 60
        val min = minTotal / 1000
        val secMilli = (minTotal % 1000) * 60
        raw32(deg) ++ raw32(1) ++ raw32(min) ++ raw32(1) ++
          raw32(secMilli) ++ raw32(1000)
      }
      val latOff = append(dms(latMilli))
      val lonOff = append(dms(lonMilli))
      val gpsIfd =
        raw16(4) ++
          entry(1, 2, 2, Array('N'.toByte, 0)) ++
          entry(2, 5, 3, raw32(latOff)) ++
          entry(3, 2, 2, Array('E'.toByte, 0)) ++
          entry(4, 5, 3, raw32(lonOff)) ++
          raw32(0)
      val gpsOff = append(gpsIfd)
      entry(GpsTag, 4, 1, raw32(gpsOff))
    }
    val newEntries = (oldEntries ++ Seq(
      entry(306, 2, dtBytes.length.toLong, raw32(dtOff)),
      entry(315, 2, artistBytes.length.toLong, raw32(artistOff))) ++
      gpsEntry.toSeq)
      .sortBy(e => new Io(e, le).u16(0)) // TIFF requires ascending tags
    val newIfd = raw16(newEntries.length) ++
      newEntries.flatten.toArray ++ raw32(nextPtr)
    val newIfdOff = append(newIfd)
    val out = buf.toByteArray
    new Io(out, le).set32(4, newIfdOff)
    out
  }
}
