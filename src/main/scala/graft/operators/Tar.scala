package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** POSIX ustar TAR codec + WebDataset-style shard export — the
  * DELIVERY end of the pipeline: trained-on corpora ship as
  * fixed-size tar shards of per-sample files (the WebDataset
  * convention: one sample = consecutive members sharing a basename
  * stem, e.g. `000123.txt` + `000123.json`), streamed sequentially
  * by data loaders. Pure-JVM writer/reader over the ustar layout:
  * 512-byte headers (octal size/mtime, checksum over a
  * space-filled checksum field, `ustar\0` magic), data padded to
  * block size, two zero blocks as terminator. Checksums are
  * VERIFIED on read and corrupt archives fail loudly with the media
  * id; names longer than the 100-byte ustar field are rejected at
  * write time (no GNU longname extension) rather than truncated
  * silently.
  *
  * Scale shape: one shard = one task's output (groupByKey on a
  * deterministic shard id → one tar per group), the same
  * file-granular parallelism as the WARC ingest side; shards are
  * independently readable so loaders scale horizontally.
  *
  * Reference seam: the reference publishes directories of records
  * (FsDataWriter); WebDataset shards are the training-loader-native
  * publish format an LLM pipeline adds.
  */
object TarCodec {

  private val Block = 512

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  /** Serialize members in order as a ustar archive. `mtime` is
    * pinned by the caller (determinism: replays and oracles need
    * byte-stable shards).
    */
  def write(members: Seq[(String, Array[Byte])], mtime: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nb.length > 0 && nb.length <= 100,
        s"tar member name '$name' must be 1..100 bytes (no longname extension)")
      val h = new Array[Byte](Block)
      System.arraycopy(nb, 0, h, 0, nb.length)
      putOctal(h, 100, 8, 420L) // mode 0644
      putOctal(h, 108, 8, 0L) // uid
      putOctal(h, 116, 8, 0L) // gid
      putOctal(h, 124, 12, data.length.toLong)
      putOctal(h, 136, 12, mtime)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
      h(156) = '0' // typeflag: regular file
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(262) = 0
      h(263) = '0'; h(264) = '0' // version
      var sum = 0L
      var i = 0
      while (i < Block) { sum += (h(i) & 0xff); i += 1 }
      putOctal(h, 148, 7, sum)
      h(155) = ' '
      out.write(h, 0, Block)
      out.write(data, 0, data.length)
      val pad = (Block - data.length % Block) % Block
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](2 * Block), 0, 2 * Block)
    out.toByteArray
  }

  private def putOctal(h: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    require(v >= 0, s"negative octal field $v")
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-byte octal field")
    val padded = ("0" * (width - 1 - s.length)) + s
    var i = 0
    while (i < width - 1) { h(off + i) = padded.charAt(i).toByte; i += 1 }
    h(off + width - 1) = 0
  }

  private def parseOctal(id: Long, h: Array[Byte], off: Int, width: Int): Long = {
    var v = 0L
    var i = off
    val end = off + width
    while (i < end && (h(i) == ' ' || h(i) == '0')) i += 1 // leading pad
    while (i < end && h(i) != 0 && h(i) != ' ') {
      val c = h(i)
      if (c < '0' || c > '7') fail(id, s"bad octal digit in tar header at $off")
      v = v * 8 + (c - '0')
      i += 1
    }
    v
  }

  /** Parse a ustar archive: (name, bytes) members in order, checksums
    * verified, truncation and malformed headers loud.
    */
  def parse(id: Long, bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes != null && bytes.length >= 2 * Block && bytes.length % Block == 0,
      s"media $id: not a tar archive (${if (bytes == null) -1 else bytes.length} bytes)")
    val out = Vector.newBuilder[(String, Array[Byte])]
    var pos = 0
    var done = false
    while (!done) {
      if (pos + Block > bytes.length) fail(id, s"missing tar terminator at $pos")
      val h = java.util.Arrays.copyOfRange(bytes, pos, pos + Block)
      if (h.forall(_ == 0)) done = true // first zero block terminates
      else {
        // checksum: header with chksum field read as spaces
        var expect = 0L
        var i = 0
        while (i < Block) {
          expect += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
          i += 1
        }
        if (parseOctal(id, h, 148, 8) != expect)
          fail(id, s"tar header checksum mismatch at $pos")
        var nameEnd = 0
        while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
        val name = new String(h, 0, nameEnd, java.nio.charset.StandardCharsets.UTF_8)
        val size = parseOctal(id, h, 124, 12)
        val tf = h(156)
        if (tf != '0' && tf != 0)
          fail(id, s"unsupported tar member type '${tf.toChar}' for '$name'")
        val dataStart = pos + Block
        if (size < 0 || dataStart + size > bytes.length)
          fail(id, s"tar member '$name' ($size bytes) overruns archive")
        out += name -> java.util.Arrays.copyOfRange(
          bytes, dataStart, dataStart + size.toInt)
        pos = dataStart + ((size + Block - 1) / Block * Block).toInt
      }
    }
    out.result()
  }

  final case class ShardMember(shard_id: Long, member: String, n_bytes: Long,
      text: String)

  /** Export `(id, text)` docs as WebDataset shards: docs group by
    * `id / docsPerShard` (deterministic, id-ordered inside the
    * shard), each doc becomes `%012d.txt`. Returns (shard_id,
    * content) tar rows — write them wherever shards ship.
    */
  def exportWebDataset(docs: DataFrame, idCol: String, textCol: String,
      docsPerShard: Int): DataFrame = {
    require(docsPerShard >= 1, s"bad docsPerShard $docsPerShard")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .groupByKey(_._1 / docsPerShard)
      .mapGroups { (shard, rows) =>
        val members = rows.toSeq.sortBy(_._1).map { case (id, text) =>
          f"$id%012d.txt" -> text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (shard, TarCodec.write(members))
      }
      .toDF("shard_id", "content")
  }

  /** Read shards back: one row per member with its text payload —
    * the loader-side contract (and the round-trip verifier).
    */
  def readWebDataset(shards: DataFrame): Dataset[ShardMember] = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("shard_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sid, c) =>
        parse(sid, c).iterator.map { case (name, data) =>
          ShardMember(sid, name, data.length.toLong,
            new String(data, java.nio.charset.StandardCharsets.UTF_8))
        }
      })
  }
}
