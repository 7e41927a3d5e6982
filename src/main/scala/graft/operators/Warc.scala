package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container reader — the format the LLM-data
  * ecosystem's flagship source (Common Crawl) actually ships: a
  * sequence of records, each a CRLF-terminated header block
  * (`WARC/1.0`, named fields, mandatory Content-Length) followed by
  * exactly Content-Length body bytes and a blank-line separator.
  * `response` records nest an HTTP/1.1 message in the body; the
  * payload (HTML) starts after the HTTP header block. Crawl files
  * arrive gzipped with ONE GZIP MEMBER PER RECORD so readers can
  * split on member boundaries; the JDK inflater stops at each member
  * end, so [[gunzipAll]] walks members explicitly and decode handles
  * plain, whole-stream-gzip, and member-per-record layouts alike.
  *
  * Parsing is strict where corruption would poison downstream counts
  * (bad magic, missing Content-Length, body overruns fail loudly with
  * the media id) and lenient where real crawls are messy (unknown
  * WARC record types pass through typed; HTTP headers are parsed
  * case-insensitively).
  *
  * Scale shape: one WARC file = one record batch decoded per
  * partition via mapPartitions (the [[Multimodal]] codec contract);
  * a 100-TB crawl is millions of ~1 GB .warc.gz files —
  * embarrassingly parallel at file granularity, never splitting a
  * record across tasks.
  *
  * Reference seam: the reference ingests remote files as opaque
  * streams (gobblin-core/.../extract/filebased/FileBasedExtractor.java);
  * WARC decode is the container step a crawl-curation pipeline adds.
  */
object WarcCodec {

  /** One WARC record: protocol fields + (for `response` records with
    * an HTTP payload) status and the payload body after HTTP headers.
    * `httpStatus` is -1 and `payload` == `body` for non-HTTP records.
    */
  final case class WarcRecord(
      warcType: String, targetUri: String, recordId: String,
      contentType: String, contentLength: Long, httpStatus: Int,
      httpCharset: String, payload: Array[Byte],
      warcDate: String = "", httpMime: String = "")

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  /** Inflate every concatenated gzip member (Common Crawl writes one
    * member per record). Members are walked MANUALLY — header parse,
    * raw-deflate inflate, CRC-32 + ISIZE trailer verification —
    * because the JDK's GZIPInputStream treats a corrupt second member
    * as clean EOF, silently dropping every record after it; a truncated
    * or bit-flipped crawl file must fail loudly, not shrink.
    */
  private[operators] def gunzipAll(id: Long, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    gunzipMembers(id, bytes).foreach { case (_, m) => out.write(m, 0, m.length) }
    out.toByteArray
  }

  /** [[gunzipAll]] keeping member boundaries: (member start offset
    * within `bytes`, inflated member bytes) per gzip member. The
    * member offset is the record's addressable identity in the
    * Common Crawl layout (one member per record) — what a CDX index's
    * `offset` column stores, and therefore the unique join key range
    * fetches must carry back ([[CdxIndex.fetchRanges]]).
    */
  private[operators] def gunzipMembers(id: Long,
      bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
    val (members, consumed) = gunzipMembersPrefix(id, bytes)
    if (consumed != bytes.length)
      fail(id, s"gzip member ${members.length} at $consumed: truncated " +
        s"(${bytes.length - consumed} trailing bytes are not a complete member)")
    if (members.forall(_._3.isEmpty)) fail(id, "gzip stream inflated to nothing")
    members.map(m => (m._1, m._3))
  }

  /** Prefix walk for WINDOWED readers ([[CdxIndex.indexWarcs]]): parse
    * complete gzip members from the front of `bytes`, returning
    * `((start, end, inflated) per member, consumed)` where `end` is
    * the byte after the member's trailer and `consumed` is the offset
    * of the first un-walked byte — the start of a member the buffer
    * CUT SHORT (a window boundary), or `bytes.length` when the buffer
    * ends exactly on a member boundary. Running out of buffer is the
    * caller's signal to slide the window; CORRUPTION inside a complete
    * member (bad magic, CRC/ISIZE mismatch, corrupt deflate) still
    * fails loudly — a windowed walk must never quietly skip bytes.
    */
  private[operators] def gunzipMembersPrefix(id: Long,
      bytes: Array[Byte]): (Seq[(Long, Long, Array[Byte])], Int) = {
    val members = Seq.newBuilder[(Long, Long, Array[Byte])]
    var pos = 0
    var member = 0
    var truncated = false
    while (pos < bytes.length && !truncated) {
      val memberStart = pos
      // --- member header (RFC 1952) ---
      if (pos + 2 <= bytes.length &&
        ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b))
        fail(id, s"gzip member $member at $pos: bad magic")
      if (pos + 10 > bytes.length) truncated = true
      else {
        if ((bytes(pos + 2) & 0xff) != 8)
          fail(id, s"gzip member $member: unknown compression method ${bytes(pos + 2) & 0xff}")
        val flg = bytes(pos + 3) & 0xff
        var p = pos + 10
        if (!truncated && (flg & 0x04) != 0) { // FEXTRA
          if (p + 2 > bytes.length) truncated = true
          else p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
        }
        if (!truncated && (flg & 0x08) != 0) { // FNAME (NUL-terminated)
          while (p < bytes.length && bytes(p) != 0) p += 1
          if (p >= bytes.length) truncated = true else p += 1
        }
        if (!truncated && (flg & 0x10) != 0) { // FCOMMENT
          while (p < bytes.length && bytes(p) != 0) p += 1
          if (p >= bytes.length) truncated = true else p += 1
        }
        if (!truncated && (flg & 0x02) != 0) p += 2 // FHCRC
        if (p > bytes.length) truncated = true
        if (!truncated) {
          // --- raw deflate body ---
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, p, bytes.length - p)
          val crc = new java.util.zip.CRC32()
          val mout = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished() && !truncated) {
              val n = inf.inflate(buf)
              if (n == 0 && !inf.finished()) truncated = true
              else { crc.update(buf, 0, n); mout.write(buf, 0, n) }
            }
          } catch {
            case _: java.util.zip.DataFormatException =>
              fail(id, s"gzip member $member: corrupt deflate stream")
          } finally {
            p += inf.getBytesRead.toInt
            inf.end()
          }
          // --- trailer: CRC32 + ISIZE ---
          if (!truncated && p + 8 > bytes.length) truncated = true
          if (!truncated) {
            def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
              ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
            if (le32(p) != crc.getValue)
              fail(id, s"gzip member $member: CRC mismatch")
            if (le32(p + 4) != (mout.size().toLong & 0xffffffffL))
              fail(id, s"gzip member $member: ISIZE mismatch")
            pos = p + 8
            members += ((memberStart.toLong, pos.toLong, mout.toByteArray))
            member += 1
          }
        }
      }
      if (truncated) pos = memberStart
    }
    (members.result(), pos)
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Find the end of a CRLF-header block starting at `from`: returns
    * the index AFTER the blank line, or -1.
    */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i + 4
      i += 1
    }
    -1
  }

  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").drop(1) // drop the version / status line
      .filter(_.contains(":"))
      .map { line =>
        val i = line.indexOf(':')
        line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      }.toMap

  /** Parse every record of one WARC file (plain or gzipped). */
  def parse(id: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    require(bytes != null && bytes.length > 0, s"media $id: empty WARC")
    if (isGzip(bytes)) parseRawIndexed(id, gunzipAll(id, bytes)).map(_._2)
    else parseRawIndexed(id, bytes).map(_._2)
  }

  /** [[parse]] keeping each record's ADDRESSABLE offset within the
    * original (possibly gzipped) file slice: for the Common Crawl
    * layout the offset is the record's gzip MEMBER start — exactly
    * the `offset` a CDX index stores — so fetched records can be
    * joined back to index rows on a key that is unique even when a
    * coalesced range decodes neighbor captures of the same URL.
    * `base` is the slice's position within the whole file.
    */
  def parseIndexed(id: Long, bytes: Array[Byte],
      base: Long): Seq[(Long, WarcRecord)] = {
    require(bytes != null && bytes.length > 0, s"media $id: empty WARC")
    if (isGzip(bytes))
      gunzipMembers(id, bytes).flatMap { case (mOff, raw) =>
        parseRawIndexed(id, raw).map { case (_, r) => (base + mOff, r) }
      }
    else parseRawIndexed(id, bytes).map { case (o, r) => (base + o, r) }
  }

  private def parseRawIndexed(id: Long,
      raw: Array[Byte]): Seq[(Long, WarcRecord)] = {
    val records = Vector.newBuilder[(Long, WarcRecord)]
    var pos = 0
    while (pos < raw.length) {
      // tolerate trailing record separators
      while (pos < raw.length &&
        (raw(pos) == '\r' || raw(pos) == '\n')) pos += 1
      if (pos < raw.length) {
        val recStart = pos.toLong
        if (pos + 9 > raw.length ||
          new String(raw, pos, 5, java.nio.charset.StandardCharsets.US_ASCII) != "WARC/")
          fail(id, s"record at $pos lacks WARC/ magic")
        val hEnd = headerEnd(raw, pos)
        if (hEnd < 0) fail(id, s"unterminated WARC header block at $pos")
        val headers = parseHeaders(new String(raw, pos, hEnd - pos,
          java.nio.charset.StandardCharsets.UTF_8))
        val len = headers.getOrElse("content-length",
          fail(id, s"record at $pos missing Content-Length")).toLong
        if (len < 0 || hEnd + len > raw.length)
          fail(id, s"record at $pos body ($len bytes at $hEnd) overruns ${raw.length}")
        val body = java.util.Arrays.copyOfRange(raw, hEnd, hEnd + len.toInt)
        val warcType = headers.getOrElse("warc-type", "unknown")
        val contentType = headers.getOrElse("content-type", "")
        // response records carry an HTTP message: split status + payload
        var status = -1
        var payload = body
        var charset = "UTF-8"
        var mime = ""
        if (warcType == "response" && contentType.startsWith("application/http")) {
          val sEnd = headerEnd(body, 0)
          if (sEnd < 0) fail(id, s"response record at $pos has no HTTP header block")
          val httpHead = new String(body, 0, sEnd,
            java.nio.charset.StandardCharsets.US_ASCII)
          val statusLine = httpHead.takeWhile(_ != '\r')
          val parts = statusLine.split(" ")
          if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
            fail(id, s"response record at $pos: bad HTTP status line '$statusLine'")
          status = parts(1).toInt
          // transport-layer charset label (resolved through the
          // WHATWG sniff below, AFTER content-decoding — the meta
          // prescan must see the logical body, not gzip bytes)
          val ctLine = httpHead.split("\r\n").drop(1)
            .find(_.toLowerCase.startsWith("content-type:"))
          // parameter-stripped media type (the CDX `mime` column)
          mime = ctLine.map(_.split(":", 2)(1).split(";")(0).trim
            .toLowerCase).getOrElse("")
          val headerLabel = ctLine.flatMap { l =>
            "(?i)charset=\"?([A-Za-z0-9_.:-]+)\"?".r
              .findFirstMatchIn(l).map(_.group(1))
          }
          payload = java.util.Arrays.copyOfRange(body, sEnd, body.length)
          // HTTP Content-Encoding: hand downstream the LOGICAL body
          // (modern crawls carry br; legacy gzip/deflate), never the
          // wire bytes; unknown codings fail loudly
          val ceLine = httpHead.split("\r\n").drop(1)
            .find(_.toLowerCase.startsWith("content-encoding:"))
            .map(_.split(":", 2)(1).trim.toLowerCase)
          payload = ceLine match {
            case None | Some("identity") | Some("") => payload
            case Some("gzip") | Some("x-gzip") => gunzipAll(id, payload)
            case Some("br") => BrotliCodec.decompress(id, payload)
            case Some("deflate") =>
              // RFC 9110 deflate = zlib wrapper
              val inf = new java.util.zip.Inflater()
              inf.setInput(payload)
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              try {
                while (!inf.finished()) {
                  val n = inf.inflate(buf)
                  if (n == 0 && inf.needsInput())
                    fail(id, s"record at $pos: truncated deflate body")
                  out.write(buf, 0, n)
                }
              } catch {
                case _: java.util.zip.DataFormatException =>
                  fail(id, s"record at $pos: corrupt deflate body")
              } finally inf.end()
              out.toByteArray
            case Some(other) =>
              fail(id, s"record at $pos: Content-Encoding '$other' unsupported")
          }
          // WHATWG encoding sniff on the logical body: BOM > header
          // label > meta prescan > windows-1252 (real crawls are NOT
          // all UTF-8, and the header is often absent or wrong)
          charset = CharsetSniff.sniff(payload, headerLabel)
        }
        records += ((recStart, WarcRecord(warcType,
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-record-id", ""),
          contentType, len, status, charset, payload,
          headers.getOrElse("warc-date", ""), mime)))
        pos = hEnd + len.toInt
      }
    }
    val out = records.result()
    if (out.isEmpty) fail(id, "WARC file contains no records")
    out
  }

  // --- writer (fixture + export seam) --------------------------------

  /** Serialize `(targetUri, html)` pages as a WARC file of `response`
    * records (HTTP 200, text/html payloads). `gzipPerRecord` writes
    * the Common Crawl layout — one gzip member per record.
    */
  def writeResponses(pages: Seq[(String, Array[Byte])],
      gzipPerRecord: Boolean = false,
      charset: String = "UTF-8"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case ((uri, html), i) =>
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$charset\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val body = http ++ html
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      if (gzipPerRecord) {
        val gz = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(rec)
        g.close()
        out.write(gz.toByteArray, 0, gz.size())
      } else out.write(rec, 0, rec.length)
    }
    out.toByteArray
  }

  /** [[writeResponses]] in the Common Crawl layout (one gzip member
    * per record) that ALSO returns each record's (uri, member offset,
    * member length) — exactly what a CDX index stores, so fixtures
    * can build a faithful index over their own WARC bytes.
    */
  def writeResponsesIndexed(pages: Seq[(String, Array[Byte])])
      : (Array[Byte], Seq[(String, Long, Long)]) = {
    val out = new java.io.ByteArrayOutputStream()
    val index = Seq.newBuilder[(String, Long, Long)]
    pages.zipWithIndex.foreach { case ((uri, html), i) =>
      val start = out.size().toLong
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val body = http ++ html
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val gz = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(rec)
      g.close()
      out.write(gz.toByteArray, 0, gz.size())
      index += ((uri, start, out.size().toLong - start))
    }
    (out.toByteArray, index.result())
  }

  /** Like [[writeResponses]] but with a per-page HTTP Content-Type
    * header value (e.g. `text/html` with no charset parameter, or a
    * deliberately wrong `text/html; charset=shift_jis`) — the fixture
    * face of the WHATWG charset sniff: pages are (uri, body bytes,
    * full Content-Type value).
    */
  def writeResponsesWithContentType(
      pages: Seq[(String, Array[Byte], String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case ((uri, html, ct), i) =>
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val body = http ++ html
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(rec, 0, rec.length)
    }
    out.toByteArray
  }

  /** Like [[writeResponses]] but with per-page HTTP Content-Encoding:
    * pages are (uri, WIRE body, encoding token) — the caller encodes
    * (gzip via JDK, br via an external encoder); "identity" writes
    * no header. The parse side decodes transparently.
    */
  def writeResponsesEncoded(
      pages: Seq[(String, Array[Byte], String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case ((uri, wire, enc), i) =>
      val ceHeader =
        if (enc == "identity" || enc.isEmpty) ""
        else s"Content-Encoding: $enc\r\n"
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        ceHeader + s"Content-Length: ${wire.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val body = http ++ wire
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(rec, 0, rec.length)
    }
    out.toByteArray
  }

  /** (media_id, content) WARC rows → one row per contained record,
    * with the payload TEXT (UTF-8) for downstream html-clean /
    * quality stages. Per-partition decode, nothing on the driver.
    */
  def records(media: DataFrame): Dataset[WarcRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        parse(id, c).iterator.zipWithIndex.map { case (r, i) =>
          // httpCharset is a canonical WHATWG name for response
          // records (CharsetSniff) and "UTF-8" for the rest
          val cs = try CharsetSniff.javaCharset(r.httpCharset)
            catch {
              case _: Exception => throw new IllegalArgumentException(
                s"media $id record $i: unsupported charset '${r.httpCharset}'")
            }
          // a leading BOM is encoding metadata, not content
          val text = new String(r.payload, cs).stripPrefix("\uFEFF")
          WarcRow(id, i, r.warcType, r.targetUri, r.contentType,
            r.contentLength, r.httpStatus, r.payload.length.toLong, text)
        }
      })
  }

  final case class WarcRow(
      media_id: Long, record_no: Int, warc_type: String, target_uri: String,
      content_type: String, content_length: Long, http_status: Int,
      payload_bytes: Long, payload_text: String)

  final case class WarcBinRow(
      media_id: Long, record_no: Int, warc_type: String, target_uri: String,
      content_type: String, http_status: Int, payload: Array[Byte])

  /** Like [[records]] but with the RAW payload bytes — the seam for
    * the non-text payloads a real crawl carries (PDFs, images),
    * dispatched downstream by [[Multimodal.sniffModality]] rather
    * than by the HTTP Content-Type header (which the wild often gets
    * wrong). Per-partition decode, nothing on the driver.
    */
  def binaryRecords(media: DataFrame): Dataset[WarcBinRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        parse(id, c).iterator.zipWithIndex.map { case (r, i) =>
          WarcBinRow(id, i, r.warcType, r.targetUri, r.contentType,
            r.httpStatus, r.payload)
        }
      })
  }
}
