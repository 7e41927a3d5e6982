package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 operator gates: FLAC frame decode (in-gate round-trip
  * against the formula PCM the oracle replays, plus the committed
  * fixtures from the independent Python encoder).
  */
object OperatorGates15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared mini-crawl for the cdxfetch gates: 240 pages (content key
    * ck makes epoch-2/late batches mostly duplicate digests) across 4
    * member-per-record .warc.gz files written to `warcDir`, returning
    * CDX rows (url digest filename offset length seq) over the REAL
    * member offsets. Every url of a doc < 40 additionally gets a
    * RECAPTURE (fresh content, seq 240+d) written IMMEDIATELY after
    * its original member — so each epoch's coalesced byte ranges
    * decode the OTHER epoch's capture of the same URL as a neighbor,
    * and the fetched-row join-back is only correct when keyed on the
    * record's (filename, offset) identity, never on url. The oracle
    * replays ck + the min-d winner rule + the recapture rows.
    */
  private[graft] def buildMiniCrawl(s: SparkSession, dir: String,
      warcDir: String): DataFrame = {
    import s.implicits._
    import graft.operators.WarcCodec
    val ds = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < 240).as[Long].collect().sorted
    def ck(d: Long): Long =
      if (d >= 120 && d % 3 == 0) 40 + d % 40 else d % 40
    def payload(d: Long): String = {
      val c = ck(d)
      s"<html><p>page c$c body w${c * 7 % 50}</p></html>"
    }
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(warcDir))
    val rows = (0 until 4).flatMap { f =>
      val members = ds.filter(_ % 4 == f).toSeq
      val pages: Seq[(String, Array[Byte], Long)] = members.flatMap { d =>
        val orig = (s"https://site$d.example/p",
          payload(d).getBytes("UTF-8"), d)
        if (d < 40)
          Seq(orig, (s"https://site$d.example/p",
            s"<html><p>recrawl r$d body</p></html>".getBytes("UTF-8"),
            240 + d))
        else Seq(orig)
      }
      val (bytes, idx) = WarcCodec.writeResponsesIndexed(
        pages.map(p => (p._1, p._2)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$warcDir/crawl-$f.warc.gz"), bytes)
      pages.zip(idx).map { case ((uri, pl, seqv), (_, off, len)) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(pl).map(b => f"${b & 0xff}%02x").mkString
        (uri, digest, s"crawl-$f.warc.gz", off, len, seqv)
      }
    }
    rows.toDF("url", "digest", "filename", "offset", "length", "seq")
  }

  /** Full-recompute digest-ledger oracle shared by q_cdxfetch_job and
    * q_stream_cdxfetch: the ck winner rows (min-d per content key)
    * plus the recapture rows of [[buildMiniCrawl]].
    */
  private[graft] val cdxLedgerOracle: String =
    """WITH d AS (
      |  SELECT doc_id AS d FROM documents WHERE doc_id < 240),
      |c AS (
      |  SELECT d, CASE WHEN d >= 120 AND d % 3 = 0
      |    THEN 40 + d % 40 ELSE d % 40 END AS ck FROM d),
      |p AS (
      |  SELECT d, ck,
      |    '<html><p>page c' || ck || ' body w' || (ck * 7 % 50) ||
      |      '</p></html>' AS payload
      |  FROM c),
      |w AS (
      |  SELECT *, row_number() OVER (PARTITION BY ck ORDER BY d) AS rn
      |  FROM p),
      |orig AS (
      |  SELECT md5(payload) AS digest,
      |    'https://site' || d || '.example/p' AS url,
      |    CAST(d AS BIGINT) AS seq,
      |    CAST(length(payload) AS BIGINT) AS n_chars
      |  FROM w WHERE rn = 1),
      |rec AS (
      |  SELECT md5('<html><p>recrawl r' || d || ' body</p></html>')
      |      AS digest,
      |    'https://site' || d || '.example/p' AS url,
      |    CAST(240 + d AS BIGINT) AS seq,
      |    CAST(length('<html><p>recrawl r' || d || ' body</p></html>')
      |      AS BIGINT) AS n_chars
      |  FROM d WHERE d < 40)
      |SELECT digest, url, seq, n_chars
      |FROM (SELECT * FROM orig UNION ALL SELECT * FROM rec) u
      |ORDER BY digest""".stripMargin

  def queries15: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- REAL FLAC decode (FlacAudio): per-doc PCM from a formula
    //     the oracle replays, encoded in-gate sweeping stereo modes,
    //     subframe types (fixed 0-4 / verbatim / LPC), bit depths
    //     8/16/24 and rice partition orders, then decoded back —
    //     CRC-8/CRC-16 checked per frame and the STREAMINFO MD5 of
    //     the decoded PCM verified, so a row existing at all proves
    //     bit-exactness; the stats prove it to the oracle ------------
    "q_flac_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.FlacAudio
      t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0)
        .as[Long]
        .mapPartitions(_.map { d =>
          val k = d / 25
          val channels = (1 + k % 2).toInt
          val bps = (k % 3) match { case 0 => 8; case 1 => 16; case _ => 24 }
          val amp = bps match { case 8 => 120; case 16 => 9000; case _ => 4000000 }
          val nf = (150 + (k % 7) * 37).toInt
          val blockSize = (64 + (k % 3) * 32).toInt
          val pcm = Array.tabulate(nf * channels) { i =>
            val frame = i / channels
            val c = i % channels
            (((frame + 7).toLong * (k + 3) * 2203 + c * 911)
              % (2L * amp + 1)).toInt - amp
          }
          val stereoModes =
            Array("independent", "leftside", "rightside", "midside")
          val stereo: String =
            if (channels == 2) stereoModes((k % 4).toInt) else "independent"
          val (sub, lp) = (k % 5) match {
            case 0 => ("auto", None)
            case 1 => ("fixed1", None)
            case 2 => ("fixed3", None)
            case 3 => ("verbatim", None)
            case _ => ("lpc", Some(FlacAudio.LpcSpec(Array(3, -1), 1, 4)))
          }
          val enc = FlacAudio.encode(8000, channels, bps, pcm,
            blockSize = blockSize, stereo = stereo, subframe = sub,
            partitionOrder = (k % 3).toInt, lpc = lp)
          val dec = FlacAudio.decode(d, enc)
          require(dec.md5Ok, s"media $d: FLAC MD5 did not verify")
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          dec.samples.foreach { v =>
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          (d, dec.sampleRate.toLong, dec.channels.toLong, dec.bps.toLong,
            (dec.samples.length / dec.channels).toLong, sum,
            mn.toLong, mx.toLong, dec.md5Ok)
        })
        .toDF("media_id", "sample_rate", "channels", "bps", "n_samples",
          "sum_samples", "min_s", "max_s", "md5_ok")
        .orderBy(col("media_id"))
    }),

    // --- FLAC interop fixtures: files written by the INDEPENDENT
    //     pure-Python encoder (tools/flac_fixtures.py — LPC, rice2,
    //     escape partitions, wasted bits, all stereo modes, tabled +
    //     explicit block-size/sample-rate codes, multi-byte frame
    //     numbers) decoded by the Scala module; oracle replays the
    //     shared formula PCM per fixture, so a correlated Scala
    //     encode/decode misreading cannot pass --------------------
    "q_flac_fixtures" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{FlacAudio, FlacFixtures}
      val names = FlacFixtures.manifest.map(_.name)
      s.createDataset(names).repartition(3)
        .mapPartitions(_.map { name =>
          val fx = FlacFixtures.manifest.find(_.name == name).get
          val dec = FlacAudio.decode(fx.salt.toLong, FlacFixtures.load(name))
          require(dec.md5Ok, s"${fx.name}: FLAC MD5 did not verify")
          var sum = 0L
          dec.samples.foreach(sum += _)
          (name, dec.sampleRate.toLong, dec.channels.toLong, dec.bps.toLong,
            (dec.samples.length / dec.channels).toLong, sum)
        })
        .toDF("fixture", "sample_rate", "channels", "bps", "n_samples",
          "sum_samples")
        .orderBy(col("fixture"))
    }),

    // --- WHATWG charset sniff in the WARC chain (CharsetSniff): nine
    //     page shapes per doc — meta charset (quoted + unquoted),
    //     http-equiv, a latin1 header label that must resolve to
    //     windows-1252 (euro at 0x80), a BOM overriding a WRONG
    //     header, an undeclared cp1252 fallback, a commented-out
    //     decoy meta, plus the ATTRIBUTE-LEVEL decoys only a real
    //     prescan tokenizer survives: `charset=` inside an unrelated
    //     meta's content VALUE (no pragma -> ignored), a
    //     `data-charset` attribute NAME, a quoted `>` inside an
    //     earlier tag's attribute, and a pragma meta with its
    //     content= BEFORE http-equiv= — each round-tripped through a
    //     real WARC response record; the oracle replays the expected
    //     charset and the exact decoded text -------------------------
    "q_charset_sniff" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{CharsetSniff, WarcCodec}
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val k = (d % 9).toInt
          val (bodyBytes, ct) = k match {
            case 0 => (("<!-- <meta charset=\"koi8-r\"> -->" +
              s"<meta charset=\"utf-8\"><p>naïve café №$d</p>")
              .getBytes("UTF-8"), "text/html")
            case 1 => (s"<p>euro €$d</p>".getBytes("windows-1252"),
              "text/html; charset=iso-8859-1")
            case 2 => (("<meta http-equiv=\"Content-Type\" " +
              "content=\"text/html; charset=shift_jis\">" +
              s"<p>テスト$d</p>").getBytes("Shift_JIS"), "text/html")
            case 3 => (s"<meta charset=windows-1251><p>Привет$d</p>"
              .getBytes("windows-1251"), "text/html")
            case 4 => (Array(0xef, 0xbb, 0xbf).map(_.toByte) ++
              s"<p>bom wins ☃$d</p>".getBytes("UTF-8"),
              "text/html; charset=shift_jis")
            case 5 => (s"<p>fall™back$d</p>".getBytes("windows-1252"),
              "text/html")
            case 6 => (("<meta name=\"description\" " +
              "content=\"see charset=koi8-r docs\">" +
              s"<meta charset=\"utf-8\"><p>naïve №$d</p>")
              .getBytes("UTF-8"), "text/html")
            case 7 => (("<meta data-charset=\"koi8-r\" name=\"x\">" +
              s"<meta charset='greek'><p>αβγ$d</p>")
              .getBytes("ISO-8859-7"), "text/html")
            case _ => (("<img alt=\"a > charset=big5\" src=i>" +
              "<meta content=\"text/html; charset=ibm866\" " +
              s"http-equiv=\"content-type\"><p>Тест$d</p>")
              .getBytes("IBM866"), "text/html")
          }
          val warc = WarcCodec.writeResponsesWithContentType(
            Seq((s"https://ex.com/$d", bodyBytes, ct)))
          val rec = WarcCodec.parse(d, warc).head
          val txt = new String(rec.payload,
            CharsetSniff.javaCharset(rec.httpCharset)).stripPrefix("\uFEFF")
          (d, rec.httpCharset, txt)
        })
        .toDF("doc_id", "charset", "text")
        .orderBy(col("doc_id"))
    }),

    // --- EPUB extraction (EpubText): per-doc books with 1-3 chapters
    //     of formula paragraphs, written through the OCF/OPF fixture
    //     writer and extracted back through container.xml → OPF →
    //     spine-ordered XHTML; the oracle replays title, spine and
    //     the exact newline-joined text -----------------------------
    "q_epub_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.EpubText
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val nCh = (1 + d % 3).toInt
          val chapters = (0 until nCh).map { c =>
            (s"Chapter $c", Seq(
              s"c${c}p0 w${(d + 11 * c) % 50}",
              s"c${c}p1 w${(d + 11 * c + 7) % 50}"))
          }
          val book = EpubText.write(s"Book $d", chapters)
          val doc = EpubText.extract(d, book)
          (d, doc.title, doc.nSpine.toLong, doc.nParagraphs.toLong, doc.text)
        })
        .toDF("doc_id", "title", "n_spine", "n_paragraphs", "text")
        .orderBy(col("doc_id"))
    }),

    // --- Iceberg v2 POSITION DELETES (merge-on-read, content=1): a
    //     foreign engine's MERGE deletes rows by (data file, row
    //     position) rather than by key; the plan is computed
    //     distributedly from Spark's parquet _metadata columns, the
    //     snapshot emitted with a position-delete file, and the
    //     independent reader must purge exactly those rows — while a
    //     LATER rewrite of shard 0 outranks the delete's sequence
    //     number and un-masks it. Oracle replays both snapshots'
    //     visibility rules from the source table -------------------
    "q_iceberg_pos_deletes" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_iceposdel").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"))
      val v1 = table.commit(docs, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v1)
      // snapshot 2: purge doc_id % 7 == 3 by POSITION — the rows'
      // (file, pos) identities come from the current snapshot
      val plan = IcebergMeta.planPositionDeletes(s, s"$tmp/t",
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"),
        joinCols = Seq("doc_id"))
      // tiny maxRowsPerDeleteFile forces a MULTI-FILE delete snapshot:
      // the sharded (repartitionByRange) write path and the reader's
      // union over several delete files are what a mass purge uses
      IcebergMeta.mirrorPositionDeletes(s, table, plan,
        maxRowsPerDeleteFile = 8)
      // snapshot 3: shard 0 rewritten — its new files outrank the
      // delete's sequence number, so the purge no longer masks them
      val v2 = table.commit(docs.filter(col("shard") === 0),
        touched = Seq("0"))
      IcebergMeta.mirror(s, table, v2)
      def agg(snap: Option[Long], label: Int) =
        IcebergMeta.read(s, s"$tmp/t", snapshotId = snap)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
          .select(lit(label.toLong).as("snapshot"), col("shard"),
            col("n"), col("sum_id"))
      agg(Some(2L), 2).unionByName(agg(None, 3))
        .orderBy(col("snapshot"), col("shard"))
    }),

    // --- Avro logical DECIMAL round-trip (AvroFiles): money columns
    //     cast to DECIMAL, written as bytes+decimal(p,s) logical
    //     type, read back as DecimalType and aggregated with EXACT
    //     decimal arithmetic (cast DOUBLE only at the very end, the
    //     oracle-parity discipline every money gate uses) ------------
    "q_decimal_roundtrip" -> ((s, dir) => {
      import graft.sources.AvroFiles
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_decimal").toString
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("k"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(4,2)").as("disc"))
      AvroFiles.write(li, s"$tmp/a")
      val back = AvroFiles.read(s, s"$tmp/a")
      back.groupBy(pmod(col("k"), lit(7)).as("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"),
          sum(col("price") *
            (lit(1).cast("decimal(4,2)") - col("disc")))
            .cast("double").as("sum_disc_price"))
        .orderBy(col("g"))
    }),

    // --- incremental CDX-driven crawl consumption (job.type=cdxfetch):
    //     a mini-crawl of member-per-record .warc.gz files + a CDX
    //     index built from the writer's real member offsets; epoch 1
    //     ingests half the index, epoch 2 the rest — mostly duplicate
    //     digests the sharded ledger must skip WITHOUT refetching,
    //     plus genuinely new content range-read from only the needed
    //     byte ranges; a third run is a watermark no-op. Oracle =
    //     full recompute of the digest ledger ------------------------
    "q_cdxfetch_job" -> ((s, dir) => {
      import graft.runner.JobConfig
      val tmp = java.nio.file.Files.createTempDirectory("q_cdxfetch").toString
      val warcDir = s"$tmp/warc"
      val cdx = buildMiniCrawl(s, dir, warcDir)
      val props = JobConfig.parse(
        s"""job.type=cdxfetch
           |job.name=cdxfetch_gate
           |source.path=$tmp/src
           |cdx.warcDir=$warcDir
           |cdx.maxGap=512
           |cdx.shards=8
           |sink.output=$tmp/ledger
           |state.dir=$tmp/wm
           |""".stripMargin)
      cdx.filter(col("seq") < 120).write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      cdx.filter(col("seq") >= 120).write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      require(r2("published") == "true" && r2("highWatermark") == "279",
        s"epoch 2 failed: $r2")
      val r3 = JobConfig.runAny(s, props)
      require(r3("published") == "false", s"empty epoch must be a no-op: $r3")
      new graft.sink.ShardedTable(s"$tmp/ledger", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s)
        .select(col("digest"), col("url"), col("seq"), col("n_chars"))
        .orderBy(col("digest"))
    }),

    // --- fetch-time politeness in the cdxfetch chain (cdx.robotsPath
    //     -> Robots.filterAllowed BEFORE digest dedup): domains with
    //     d%9==7 publish Disallow:/ (their captures must never be
    //     fetched — not even as a digest winner another URL's content
    //     rides on, so ck winners SHIFT to the next allowed capture:
    //     the candidates ck/ck+40/ck+80 differ mod 9),
    //     d%9==3 publish a non-matching Disallow:/q (stays allowed —
    //     path matching, not domain blanket). One epoch carries
    //     originals AND recaptures, so the per-url winner and the
    //     (filename,offset) join-back are exercised together. Oracle
    //     replays the robots filter + the shifted winner rule --------
    "q_cdxfetch_robots" -> ((s, dir) => {
      import s.implicits._
      import graft.runner.JobConfig
      val tmp = java.nio.file.Files
        .createTempDirectory("q_cdxrobots").toString
      val warcDir = s"$tmp/warc"
      val cdx = buildMiniCrawl(s, dir, warcDir)
      (0L until 240L)
        .map(d => (s"site$d.example",
          if (d % 9 == 7) "User-agent: *\nDisallow: /"
          else if (d % 9 == 3) "User-agent: *\nDisallow: /q"
          else "User-agent: *\nAllow: /"))
        .toDF("domain", "content")
        .write.parquet(s"$tmp/robots")
      val props = JobConfig.parse(
        s"""job.type=cdxfetch
           |job.name=cdxfetch_robots_gate
           |source.path=$tmp/src
           |cdx.warcDir=$warcDir
           |cdx.maxGap=512
           |cdx.shards=8
           |cdx.robotsPath=$tmp/robots
           |sink.output=$tmp/ledger
           |state.dir=$tmp/wm
           |""".stripMargin)
      cdx.write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch failed: $r1")
      new graft.sink.ShardedTable(s"$tmp/ledger", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s)
        .select(col("digest"), col("url"), col("seq"), col("n_chars"))
        .orderBy(col("digest"))
    }),

    // --- ID3v2 metadata + Xing VBR headers (Id3, Mp3Codec.vbrInfo):
    //     per-doc MP3s with a real tag (v2.3/v2.4 x all four text
    //     encodings, COMM + TXXX structure) in front of a VBR frame
    //     stream, every third file without a Xing header (duration
    //     falls back to the full frame walk). Oracle replays the tag
    //     strings and the exact integer duration arithmetic ---------
    "q_id3_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Id3, Mp3Codec}
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val k = (d % 4).toInt
          val (v24, enc) = k match {
            case 0 => (false, 0)
            case 1 => (false, 1)
            case 2 => (true, 3)
            case _ => (true, 2)
          }
          val title = if (k == 0) s"Tîtle æ$d" else s"Tïtle №$d"
          val artist = if (k == 0) s"Ärtist $d" else s"Артист $d"
          val frames = Seq(
            "TIT2" -> title, "TPE1" -> artist,
            "TALB" -> s"Album ${d % 9}",
            (if (v24) "TDRC" else "TYER") -> (1990 + d % 30).toString,
            "COMM" -> s"eng/note:Comment ©$d",
            "TXXX" -> s"origin:crawl-${d % 5}")
          val tag = Id3.synthesize(frames, v24, enc)
          val withXing = d % 3 != 1
          val n = (3 + d % 4).toInt
          val brIdxs = (0 until n).map(i => 1 + ((d + i) % 14).toInt)
          val mp3 = Mp3Codec.synthesizeVbr(brIdxs, (d % 3).toInt,
            mpeg1 = d % 2 == 0, withXing = withXing, id3 = tag)
          val parsed = Id3.parse(d, mp3).get
          val info = Mp3Codec.parse(d, mp3)
          val duration = Mp3Codec.vbrInfo(d, mp3)
            .map(_.durationMs).getOrElse(info.durationMs)
          (d, parsed.version,
            parsed.first("TIT2").get, parsed.first("TPE1").get,
            parsed.first("TALB").get,
            parsed.first("TDRC").orElse(parsed.first("TYER")).get,
            parsed.first("COMM").get, parsed.first("TXXX").get,
            info.nFrames.toLong, duration)
        })
        .toDF("doc_id", "version", "title", "artist", "album", "yr",
          "comm", "txxx", "n_frames", "duration_ms")
        .orderBy(col("doc_id"))
    }),

    // --- subtitle extraction (Subtitles): per-doc SRT or WebVTT
    //     transcripts (hourless timestamps, cue settings, bold
    //     markup to strip, NOTE blocks) parsed to cues; the oracle
    //     replays cue timing arithmetic and the exact joined text ----
    "q_subtitle_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Subtitles
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val n = (2 + d % 4).toInt
          val cues = (0 until n).map { j =>
            val start = j * 2000L + d % 997
            val end = start + 800L + (j * 37 + d) % 1200
            Subtitles.Cue(j + 1, start, end, s"cue$j w${(d + j) % 50}")
          }
          val bytes =
            if (d % 2 == 0) Subtitles.writeSrt(cues)
            else Subtitles.writeVtt(cues,
              withHours = d % 4 == 1, decorate = d % 4 == 3)
          val (fmt, parsed) = Subtitles.parse(d, bytes)
          require(parsed == cues, s"media $d: subtitle round-trip drifted")
          (d, fmt, parsed.length.toLong,
            parsed.map(c => c.endMs - c.startMs).sum,
            parsed.map(_.text).mkString(" / "))
        })
        .toDF("doc_id", "fmt", "n_cues", "total_dur_ms", "all_text")
        .orderBy(col("doc_id"))
    }),

    // --- Ogg container metadata (OggCodec): per-doc Vorbis or Opus
    //     streams with CRC-valid pages, VorbisComment tags and
    //     granule-exact durations (Opus at 48 kHz minus pre-skip);
    //     the oracle replays the tag strings and the integer
    //     duration arithmetic --------------------------------------
    "q_ogg_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.OggCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val opus = d % 2 == 1
          val rate = Array(8000, 16000, 44100, 48000)((d % 4).toInt)
          val channels = (1 + d % 2).toInt
          val preSkip = if (opus) (300 + d % 50).toInt else 0
          val nAudio = (2 + d % 5).toInt
          val granule =
            if (opus) preSkip + 4800L * (1 + d % 7)
            else rate.toLong * (1 + d % 7) / 2
          val b = OggCodec.synthesize(
            if (opus) "opus" else "vorbis", channels, rate, preSkip,
            vendor = s"graft-$d",
            cs = Seq("TITLE" -> s"Trãck №$d", "ARTIST" -> s"Ensemble ${d % 9}"),
            nAudioPages = nAudio, finalGranule = granule)
          val m = OggCodec.parse(d, b)
          (d, m.codec, m.channels.toLong, m.sampleRate.toLong,
            m.comments.collectFirst { case ("TITLE", v) => v }.get,
            m.comments.collectFirst { case ("ARTIST", v) => v }.get,
            m.nPages.toLong, m.lastGranule, m.durationMs)
        })
        .toDF("doc_id", "codec", "channels", "sample_rate", "title",
          "artist", "n_pages", "last_granule", "duration_ms")
        .orderBy(col("doc_id"))
    }),

    // --- FLAGSHIP audio-corpus chain: one binary column carrying
    //     WAV, FLAC, MP3(+ID3) and Ogg Opus payloads; sniff dispatch
    //     routes each to its real parser, PCM containers dedup by
    //     the shared energy fingerprint (FLAC is lossless, so a
    //     WAV/FLAC pair of the same recording collapses), compressed
    //     containers dedup by their TITLE tag across MP3/Ogg, and
    //     every row reports its exact container-native duration.
    //     The oracle replays group membership and the duration
    //     arithmetic end to end ------------------------------------
    "q_audio_pipeline" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{FlacAudio, Id3, Mp3Codec, Multimodal, OggCodec}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val r = (d % 25).toInt
          val samples =
            Array.tabulate(130)(t => ((r + 1) * (t + 7) * 2203) % 2003 - 1001)
          val bytes = (d % 4) match {
            case 0 => Multimodal.WavCodec.synthesize(8000,
              samples.map(_.toShort))
            case 1 => FlacAudio.encode(8000, 1, 16, samples, blockSize = 64)
            case 2 =>
              val tag = Id3.synthesize(Seq("TIT2" -> s"track $r"),
                v24 = true, encoding = 3)
              Mp3Codec.synthesizeVbr(
                (0 until (3 + r % 4)).map(i => 1 + (r + i) % 14),
                (r % 3), mpeg1 = true, withXing = true, id3 = tag)
            case _ =>
              OggCodec.synthesize("opus", 1, 16000, 300, "v",
                Seq("TITLE" -> s"track $r"), nAudioPages = 2,
                finalGranule = 300L + 4800L * (1 + r % 5))
          }
          (d, bytes)
        }).toDF("media_id", "content")
      val keyed = media.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, c) =>
          Multimodal.sniffModality(c) match {
            case m @ "audio/wav" =>
              val f = Multimodal.WavCodec.parse(id, c)
              (id, m, "", f.duration_us / 1000)
            case m @ "audio/flac" =>
              val p = FlacAudio.decode(id, c)
              (id, m, "",
                (p.samples.length / p.channels).toLong * 1000 / p.sampleRate)
            case m @ "audio/mpeg" =>
              val title = Id3.parse(id, c).flatMap(_.first("TIT2"))
                .getOrElse(throw new IllegalArgumentException(
                  s"media $id: MP3 without a TIT2 tag"))
              (id, m, title, Mp3Codec.vbrInfo(id, c).get.durationMs)
            case m @ "audio/ogg" =>
              val g = OggCodec.parse(id, c)
              val title = g.comments.collectFirst { case ("TITLE", v) => v }
                .getOrElse(throw new IllegalArgumentException(
                  s"media $id: Ogg without a TITLE tag"))
              (id, m, title, g.durationMs)
            case other => throw new IllegalArgumentException(
              s"media $id: unexpected modality $other")
          }
        }).toDF("media_id", "modality", "tag_key", "duration_ms")
      // PCM containers: dedup by the shared 64-bit energy fingerprint
      val pcm = keyed.filter(col("modality").isin("audio/wav", "audio/flac"))
      val fp = Multimodal.fingerprintAudio(
        media.join(pcm.select("media_id"), "media_id")).toDF()
      val pcmRep = fp.join(
        fp.groupBy(col("ahash")).agg(min(col("media_id")).as("rep")),
        "ahash").select(col("media_id"), col("rep"))
      // compressed containers: dedup by TITLE across MP3 and Ogg
      val tagged = keyed.filter(!col("modality").isin("audio/wav", "audio/flac"))
      val tagRep = tagged.join(
        tagged.groupBy(col("tag_key")).agg(min(col("media_id")).as("rep")),
        "tag_key").select(col("media_id"), col("rep"))
      keyed.join(pcmRep.unionByName(tagRep), "media_id")
        .select(col("media_id"), col("modality"), col("rep"),
          col("duration_ms"))
        .orderBy(col("media_id"))
    }),

    // --- schema.org JSON-LD extraction (Text.jsonLd): pages carry
    //     NewsArticle/BlogPosting blocks with object or bare-string
    //     authors, or no block at all; pure codegen'd regexp +
    //     from_json, oracle replays every field --------------------
    "q_jsonld_meta" -> ((s, dir) => {
      import graft.functions.Text
      val k = pmod(col("doc_id"), lit(4))
      val ld = when(k === 0, concat(
        lit("""{"@context":"https://schema.org","@type":"NewsArticle","headline":"Headline """),
        col("doc_id"),
        lit("""","datePublished":"2026-07-"""),
        (lit(10) + pmod(col("doc_id"), lit(19))),
        lit("""","inLanguage":"en","author":{"@type":"Person","name":"Reporter """),
        pmod(col("doc_id"), lit(3)), lit("\"}}")))
        .when(k === 1, concat(
          lit("""{"@type":"BlogPosting","headline":"Post """),
          col("doc_id"),
          lit("""","author":{"@type":"Person","name":"Author """),
          pmod(col("doc_id"), lit(7)), lit("\"}}")))
        .when(k === 2, concat(
          lit("""{"@type":"Article","headline":"Piece """),
          col("doc_id"),
          lit("""","author":"Writer """),
          pmod(col("doc_id"), lit(5)), lit("\"}")))
        .otherwise(lit(""))
      val html = concat(lit("<html><head><title>t</title>"),
        when(k =!= 3, concat(
          lit("""<script type="application/ld+json">"""), ld,
          lit("</script>"))).otherwise(lit("")),
        lit("</head><body>b</body></html>"))
      t(s, dir, "documents").select(col("doc_id"),
          Text.jsonLd(html).as("ld"))
        .select(col("doc_id"),
          col("ld.ld_type").as("ld_type"),
          col("ld.headline").as("headline"),
          col("ld.date_published").as("date_published"),
          col("ld.in_language").as("in_language"),
          col("ld.author").as("author"),
          col("ld.author_raw").as("author_raw"))
        .orderBy(col("doc_id"))
    }),

    // --- PNG privacy scrub (PngCodec.stripMetadata): gray PNGs
    //     planted with tEXt author strings, tIME stamps and (every
    //     2nd) an eXIf block carrying GPS; the scrub must flag and
    //     remove ALL metadata classes while pixels decode identical
    //     — proven by re-decoding the scrubbed bytes against the
    //     pixel formula and asserting the planted strings are gone --
    "q_png_scrub" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{JpegCodec, Multimodal, PngCodec}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val w = 8 + (d % 5).toInt
          val h = 4 + (d % 3).toInt
          val plain = PngCodec.encode(w, h, 1,
            Array.tabulate(w * h)(i => ((d * 7 + i) % 256).toByte))
          val exif =
            if (d % 2 == 0)
              Some(JpegCodec.exifTiffBytesGps((1 + d % 8).toInt,
                latMilli = (40000 + d * 31 % 9000).toInt,
                lonMilli = (9000 + d * 17 % 7000).toInt,
                bigEndian = d % 4 < 2))
            else None
          (d, PngCodec.withMetadata(d, plain,
            texts = Seq("Author" -> s"secret-author-$d",
              "Comment" -> "shot at home"),
            exifTiff = exif, withTime = true))
        }).toDF("media_id", "content")
      val scrubbed = Multimodal.scrubExifGps(media).toDF()
        .select(col("media_id"), col("modality"), col("had_gps"),
          col("content"))
      scrubbed.as[(Long, String, Boolean, Array[Byte])]
        .mapPartitions(_.map { case (id, m, hadGps, c) =>
          val img = PngCodec.decode(id, c)
          var sum = 0L
          img.pixels.foreach(p => sum += (p & 0xff))
          val txt = new String(c,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          require(!txt.contains("secret-author") && !txt.contains("shot at"),
            s"media $id: scrub left metadata text behind")
          require(!PngCodec.exifHasGps(id, c),
            s"media $id: scrub left GPS behind")
          (id, m, hadGps, img.pixels.length.toLong,
            sum.toDouble / img.pixels.length)
        })
        .toDF("media_id", "modality", "had_gps", "n_pixels",
          "mean_intensity")
        .orderBy(col("media_id"))
    }),

    // --- MP4 track-level metadata (Mp4Codec.tracks): real trak/
    //     tkhd/mdhd/hdlr/stsd structure per doc — handler types,
    //     sample-entry codecs, packed ISO-639-2 languages and
    //     per-track timescale-exact durations; the probe a video
    //     pipeline runs before committing to decode. Oracle replays
    //     every field ---------------------------------------------
    "q_mp4_tracks" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { d =>
          val nT = (1 + d % 3).toInt
          val handlers = Array("vide", "soun", "text")
          val codecs = Array("avc1", "mp4a", "tx3g")
          val langs = Array("eng", "deu", "jpn", "und")
          val specs = (0 until nT).map { t =>
            val c = ((d + t) % 3).toInt
            val timescale = Array(600, 1000, 48000)(((d + t) % 3).toInt)
            val secs = (2 + (d + t) % 5).toInt
            (handlers(c), codecs(c), langs(((d + t) % 4).toInt),
              timescale, timescale * secs)
          }
          val mp4 = Multimodal.Mp4Codec.synthesizeTracks(1000, 5000, specs)
          Multimodal.Mp4Codec.tracks(d, mp4).zipWithIndex.map {
            case (tr, i) =>
              (d, i.toLong, tr.trackId, tr.handler, tr.codec,
                tr.language, tr.timescale, tr.durationMs)
          }
        })
        .toDF("media_id", "track_no", "track_id", "handler", "codec",
          "language", "timescale", "duration_ms")
        .orderBy(col("media_id"), col("track_no"))
    }),

    // --- STREAMING CDX consumption (foreachBatch + the same
    //     CdxIndex.ledgerMerge the batch job uses): three
    //     micro-batches of CDX rows in arrival order, each batch
    //     range-reading only its genuinely new content into the
    //     digest-sharded ledger — streaming delivery must converge to
    //     the identical ledger as a full recompute (same oracle as
    //     q_cdxfetch_job) -----------------------------------------
    "q_stream_cdxfetch" -> ((s, dir) => {
      import graft.operators.CdxIndex
      import graft.streaming.StreamingIngest
      val tmp = java.nio.file.Files
        .createTempDirectory("q_stream_cdxf").toString
      val warcDir = s"$tmp/warc"
      val cdx = buildMiniCrawl(s, dir, warcDir)
      val inDir = java.nio.file.Files.createTempDirectory("q_stream_cdxf_in")
      val now = System.currentTimeMillis()
      OperatorGates8.stageFile(cdx.filter(col("seq") < 80),
        inDir, "b1.parquet", now - 180000)
      OperatorGates8.stageFile(
        cdx.filter(col("seq") >= 80 && col("seq") < 160),
        inDir, "b2.parquet", now - 120000)
      OperatorGates8.stageFile(cdx.filter(col("seq") >= 160),
        inDir, "b3.parquet", now - 60000)
      val table = new graft.sink.ShardedTable(s"$tmp/ledger", "shard",
        s.sparkContext.hadoopConfiguration)
      val stream = StreamingIngest.readFileStream(s, cdx.schema,
        inDir.toString, maxFilesPerTrigger = Some(1))
      val q = stream.writeStream
        .foreachBatch { (delta: DataFrame, _: Long) =>
          val hasCurrent = table.currentVersion.isDefined
          val (merged, touched, cleanup) = CdxIndex.ledgerMerge(s, table,
            hasCurrent, delta, warcDir, "seq", maxGap = 512L, nShards = 8)
          // release the epoch's delta caches once the commit has
          // materialized them — a stream leaks one cache entry per
          // micro-batch otherwise
          try table.commit(merged, touched) finally cleanup()
          ()
        }
        .option("checkpointLocation", s"$tmp/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      table.readCurrent(s)
        .select(col("digest"), col("url"), col("seq"), col("n_chars"))
        .orderBy(col("digest"))
    }),

    // --- WAV bit depths (WavCodec): real corpora are not all 16-bit
    //     — 8-bit unsigned-centered, 24-bit and 32-bit little-endian
    //     PCM round-trip through the depth-generic writer/parser;
    //     the oracle replays the amplitude formula and the exact
    //     integer mean arithmetic per depth --------------------------
    "q_wav_depths" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val bits = Array(8, 16, 24, 32)((d % 4).toInt)
          val amp = bits match {
            case 8 => 100; case 16 => 9000; case 24 => 4000000
            case _ => 100000000
          }
          val channels = (1 + d % 2).toInt
          val n = (100 + (d % 7) * 13).toInt
          val pcm = Array.tabulate(n * channels) { i =>
            (((i / channels + 7).toLong * (d % 25 + 3) * 2203 + (i % channels) * 911)
              % (2L * amp + 1)).toInt - amp
          }
          val wav = Multimodal.WavCodec.synthesizeDepth(8000, channels,
            bits, pcm)
          val f = Multimodal.WavCodec.parse(d, wav)
          (d, f.bits.toLong, f.n_channels.toLong, f.n_samples,
            f.duration_us, f.mean_abs_amp)
        })
        .toDF("media_id", "bits", "channels", "n_samples", "duration_us",
          "mean_abs_amp")
        .orderBy(col("media_id"))
    }),

    // --- ASR-prep audio curation (WavCodec.trimSilence + segment):
    //     recordings padded with sub-threshold noise on both ends are
    //     trimmed to the loud middle by exact integer cuts, then
    //     chunked into fixed 25-frame windows (short tail kept);
    //     16- and 24-bit, mono and stereo. Oracle replays the cut
    //     indices, window arithmetic and the trimmed mean ----------
    "q_audio_trim_segment" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal.WavCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val padL = (10 + d % 7).toInt
          val padR = (5 + d % 4).toInt
          val loud = (60 + (d % 5) * 10).toInt
          val ch = (1 + d % 2).toInt
          val bits = if (d % 3 == 0) 24 else 16
          val n = padL + loud + padR
          def frameV(i: Int): Int =
            if (i < padL || i >= padL + loud) (i % 40) - 20
            else 100 + ((d + i * 13L) % 5000).toInt
          val pcm = Array.tabulate(n * ch)(k => frameV(k / ch))
          val wav = WavCodec.synthesizeDepth(8000, ch, bits, pcm)
          val trimmed = WavCodec.trimSilence(d, wav, threshold = 50)
          val f = WavCodec.parse(d, trimmed)
          val segs = WavCodec.segment(d, trimmed, windowFrames = 25)
          val lastFrames = WavCodec.parse(d, segs.last._2).n_samples
          (d, n.toLong, f.n_samples, segs.length.toLong, lastFrames,
            f.mean_abs_amp)
        })
        .toDF("media_id", "n_orig", "n_trimmed", "n_windows",
          "last_window_frames", "mean_abs")
        .orderBy(col("media_id"))
    }),

    // --- TIFF privacy scrub (TiffScrub): gray TIFFs planted with
    //     Artist/DateTime strings and a GPS sub-IFD in both byte
    //     orders; the surgical scrub must flag and remove all of it
    //     with pixels byte-identical — proven by re-decoding scrubbed
    //     bytes against the pixel formula and asserting the planted
    //     strings and GPS are gone --------------------------------
    "q_tiff_scrub" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Multimodal, TiffCodec, TiffScrub}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val w = 16 + (d % 3).toInt * 8
          val h = 8 + (d % 2).toInt * 4
          val px = Array.tabulate(w * h)(i => ((d * 11 + i) % 256).toByte)
          val plain = TiffCodec.encode(w, h, 1, px,
            compression = if (d % 2 == 0) 5 else 1,
            bigEndian = d % 4 < 2)
          (d, TiffScrub.withPrivacyTags(d, plain,
            artist = s"secret-artist-$d",
            dateTime = "2026:07:15 12:30:45",
            gps = if (d % 2 == 0) Some(((40000 + d * 31 % 9000).toInt,
              (9000 + d * 17 % 7000).toInt)) else None))
        }).toDF("media_id", "content")
      Multimodal.scrubExifGps(media).toDF()
        .select(col("media_id"), col("modality"), col("had_gps"),
          col("content"))
        .as[(Long, String, Boolean, Array[Byte])]
        .mapPartitions(_.map { case (id, m, hadGps, c) =>
          val img = TiffCodec.decode(id, c)
          var sum = 0L
          img.pixels.foreach(p => sum += (p & 0xff))
          val txt = new String(c,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          require(!txt.contains("secret-artist") && !txt.contains("2026:07"),
            s"media $id: scrub left metadata text behind")
          require(!TiffScrub.hasGps(id, c),
            s"media $id: scrub left GPS behind")
          (id, m, hadGps, img.pixels.length.toLong,
            sum.toDouble / img.pixels.length)
        })
        .toDF("media_id", "modality", "had_gps", "n_pixels",
          "mean_intensity")
        .orderBy(col("media_id"))
    }),

    // --- AIFF probe (AiffCodec): the big-endian PCM container older
    //     corpora carry beside WAV — 80-bit extended sample rates
    //     parsed exactly, signed samples at 8/16/24 bits; the oracle
    //     replays the amplitude formula and the integer duration ----
    "q_aiff_probe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.AiffCodec
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val bits = Array(8, 16, 24)((d % 3).toInt)
          val amp = bits match {
            case 8 => 100; case 16 => 9000; case _ => 4000000
          }
          val rate = Array(8000, 44100, 22050, 11025)((d % 4).toInt)
          val ch = (1 + d % 2).toInt
          val n = (90 + (d % 6) * 17).toInt
          val pcm = Array.tabulate(n * ch) { i =>
            (((i / ch + 7).toLong * (d % 25 + 3) * 2203 + (i % ch) * 911)
              % (2L * amp + 1)).toInt - amp
          }
          val aiff = AiffCodec.synthesize(rate, ch, bits, pcm)
          require(graft.operators.Multimodal.sniffModality(aiff)
            == "audio/aiff", s"media $d: AIFF not sniffed")
          val a = AiffCodec.parse(d, aiff)
          (d, a.sampleRate.toLong, a.channels.toLong, a.bits.toLong,
            a.nFrames, a.durationUs, a.meanAbsAmp)
        })
        .toDF("media_id", "sample_rate", "channels", "bits", "n_frames",
          "duration_us", "mean_abs_amp")
        .orderBy(col("media_id"))
    })
  )

  def oracleSql15: Map[String, String] = Map(

    "q_flac_decode" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 25 AS k FROM documents
        |  WHERE doc_id % 25 = 0),
        |p AS (
        |  SELECT doc_id, k,
        |    1 + k % 2 AS channels,
        |    CASE k % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS bps,
        |    CASE k % 3 WHEN 0 THEN 120 WHEN 1 THEN 9000
        |      ELSE 4000000 END AS amp,
        |    150 + (k % 7) * 37 AS nf
        |  FROM d),
        |s AS (
        |  SELECT doc_id, k, channels, bps, nf,
        |    list_transform(range(0, nf * channels), i ->
        |      ((i // channels + 7) * (k + 3) * 2203 + (i % channels) * 911)
        |        % (2 * amp + 1) - amp) AS pcm
        |  FROM p)
        |SELECT doc_id AS media_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(bps AS BIGINT) AS bps,
        |  CAST(nf AS BIGINT) AS n_samples,
        |  CAST(list_sum(pcm) AS BIGINT) AS sum_samples,
        |  CAST(list_min(pcm) AS BIGINT) AS min_s,
        |  CAST(list_max(pcm) AS BIGINT) AS max_s,
        |  TRUE AS md5_ok
        |FROM s ORDER BY media_id""".stripMargin,

    "q_flac_fixtures" ->
      """WITH m(fixture, rate, ch, bps, nf, amp, salt, scale) AS (VALUES
        |  ('fixture_0.flac', 8000, 1, 16, 600, 9000, 1, 1),
        |  ('fixture_1.flac', 16000, 2, 16, 500, 7000, 2, 1),
        |  ('fixture_2.flac', 8000, 1, 8, 300, 120, 3, 1),
        |  ('fixture_3.flac', 44100, 2, 24, 256, 8000000, 4, 1),
        |  ('fixture_4.flac', 8000, 1, 16, 400, 4000, 5, 8),
        |  ('fixture_5.flac', 8000, 1, 16, 256, 32000, 6, 1),
        |  ('fixture_6.flac', 22050, 2, 16, 700, 5000, 7, 1),
        |  ('fixture_7.flac', 8000, 1, 12, 350, 1800, 8, 1),
        |  ('fixture_8.flac', 8000, 1, 16, 3000, 100, 9, 1)),
        |s AS (
        |  SELECT fixture, rate, ch, bps, nf,
        |    list_transform(range(0, nf * ch), i ->
        |      (((i // ch + 7) * (salt + 3) * 2203 + (i % ch) * 911)
        |        % (2 * amp + 1) - amp) * scale) AS pcm
        |  FROM m)
        |SELECT fixture,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(ch AS BIGINT) AS channels,
        |  CAST(bps AS BIGINT) AS bps,
        |  CAST(nf AS BIGINT) AS n_samples,
        |  CAST(list_sum(pcm) AS BIGINT) AS sum_samples
        |FROM s ORDER BY fixture""".stripMargin,

    "q_charset_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 9 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252'
        |    WHEN 2 THEN 'shift_jis' WHEN 3 THEN 'windows-1251'
        |    WHEN 4 THEN 'utf-8' WHEN 5 THEN 'windows-1252'
        |    WHEN 6 THEN 'utf-8' WHEN 7 THEN 'iso-8859-7'
        |    ELSE 'ibm866' END AS charset,
        |  CASE doc_id % 9
        |    WHEN 0 THEN '<!-- <meta charset="koi8-r"> --><meta charset="utf-8"><p>naïve café №' || doc_id || '</p>'
        |    WHEN 1 THEN '<p>euro €' || doc_id || '</p>'
        |    WHEN 2 THEN '<meta http-equiv="Content-Type" content="text/html; charset=shift_jis"><p>テスト' || doc_id || '</p>'
        |    WHEN 3 THEN '<meta charset=windows-1251><p>Привет' || doc_id || '</p>'
        |    WHEN 4 THEN '<p>bom wins ☃' || doc_id || '</p>'
        |    WHEN 5 THEN '<p>fall™back' || doc_id || '</p>'
        |    WHEN 6 THEN '<meta name="description" content="see charset=koi8-r docs"><meta charset="utf-8"><p>naïve №' || doc_id || '</p>'
        |    WHEN 7 THEN '<meta data-charset="koi8-r" name="x"><meta charset=''greek''><p>αβγ' || doc_id || '</p>'
        |    ELSE '<img alt="a > charset=big5" src=i><meta content="text/html; charset=ibm866" http-equiv="content-type"><p>Тест' || doc_id || '</p>' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_epub_extract" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS n_ch FROM documents),
        |ch AS (
        |  SELECT doc_id, n_ch,
        |    array_to_string(list_transform(range(0, n_ch), c ->
        |      'c' || c || 'p0 w' || ((doc_id + 11 * c) % 50) || chr(10) ||
        |      'c' || c || 'p1 w' || ((doc_id + 11 * c + 7) % 50)),
        |      chr(10)) AS text
        |  FROM d)
        |SELECT doc_id, 'Book ' || doc_id AS title,
        |  CAST(n_ch AS BIGINT) AS n_spine,
        |  CAST(n_ch * 2 AS BIGINT) AS n_paragraphs, text
        |FROM ch ORDER BY doc_id""".stripMargin,

    "q_iceberg_pos_deletes" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS shard FROM documents
        |  WHERE doc_id < 300),
        |s2 AS (
        |  SELECT CAST(2 AS BIGINT) AS snapshot, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d WHERE doc_id % 7 <> 3 GROUP BY shard),
        |s3 AS (
        |  SELECT CAST(3 AS BIGINT) AS snapshot, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d WHERE shard = 0 OR doc_id % 7 <> 3 GROUP BY shard)
        |SELECT snapshot, shard, CAST(n AS BIGINT) AS n,
        |  CAST(sum_id AS BIGINT) AS sum_id
        |FROM (SELECT * FROM s2 UNION ALL SELECT * FROM s3)
        |ORDER BY snapshot, shard""".stripMargin,

    "q_decimal_roundtrip" ->
      """SELECT l_orderkey % 7 AS g, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS sum_disc_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cdxfetch_job" ->
      cdxLedgerOracle,

    "q_cdxfetch_robots" ->
      """WITH d AS (
        |  SELECT doc_id AS d FROM documents WHERE doc_id < 240),
        |a AS (SELECT d FROM d WHERE d % 9 <> 7),
        |c AS (
        |  SELECT d, CASE WHEN d >= 120 AND d % 3 = 0
        |    THEN 40 + d % 40 ELSE d % 40 END AS ck FROM a),
        |p AS (
        |  SELECT d, ck,
        |    '<html><p>page c' || ck || ' body w' || (ck * 7 % 50) ||
        |      '</p></html>' AS payload
        |  FROM c),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY ck ORDER BY d) AS rn
        |  FROM p)
        |SELECT md5(payload) AS digest,
        |  'https://site' || d || '.example/p' AS url,
        |  CAST(d AS BIGINT) AS seq,
        |  CAST(length(payload) AS BIGINT) AS n_chars
        |FROM w WHERE rn = 1 ORDER BY digest""".stripMargin,

    "q_wav_depths" ->
      """WITH d AS (
        |  SELECT doc_id AS d,
        |    CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24
        |      ELSE 32 END AS bits,
        |    CASE doc_id % 4 WHEN 0 THEN 100 WHEN 1 THEN 9000
        |      WHEN 2 THEN 4000000 ELSE 100000000 END AS amp,
        |    1 + doc_id % 2 AS ch,
        |    100 + (doc_id % 7) * 13 AS n
        |  FROM documents),
        |s AS (
        |  SELECT d, bits, ch, n,
        |    list_transform(range(0, n * ch), i ->
        |      abs(((i // ch + 7) * (d % 25 + 3) * 2203 + (i % ch) * 911)
        |        % (2 * amp + 1) - amp)) AS a
        |  FROM d)
        |SELECT d AS media_id, CAST(bits AS BIGINT) AS bits,
        |  CAST(ch AS BIGINT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 1000000 // 8000 AS BIGINT) AS duration_us,
        |  CAST(list_sum(a) AS DOUBLE) / (n * ch) AS mean_abs_amp
        |FROM s ORDER BY media_id""".stripMargin,

    "q_audio_trim_segment" ->
      """WITH d AS (
        |  SELECT doc_id AS d,
        |    10 + doc_id % 7 AS padl, 5 + doc_id % 4 AS padr,
        |    60 + (doc_id % 5) * 10 AS loud
        |  FROM documents),
        |s AS (
        |  SELECT d, padl, padr, loud,
        |    list_transform(range(padl, padl + loud), i ->
        |      100 + (d + i * 13) % 5000) AS a
        |  FROM d)
        |SELECT d AS media_id,
        |  CAST(padl + loud + padr AS BIGINT) AS n_orig,
        |  CAST(loud AS BIGINT) AS n_trimmed,
        |  CAST((loud + 24) // 25 AS BIGINT) AS n_windows,
        |  CAST(loud - ((loud + 24) // 25 - 1) * 25 AS BIGINT)
        |    AS last_window_frames,
        |  CAST(list_sum(a) AS DOUBLE) / loud AS mean_abs
        |FROM s ORDER BY media_id""".stripMargin,

    "q_tiff_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id % 3) * 8 AS w,
        |    8 + (doc_id % 2) * 4 AS h
        |  FROM documents)
        |SELECT doc_id AS media_id, 'image/tiff' AS modality,
        |  doc_id % 2 = 0 AS had_gps,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, w * h), i ->
        |    (doc_id * 11 + i) % 256)) AS DOUBLE) / (w * h)
        |    AS mean_intensity
        |FROM d ORDER BY media_id""".stripMargin,

    "q_aiff_probe" ->
      """WITH d AS (
        |  SELECT doc_id AS d,
        |    CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END
        |      AS bits,
        |    CASE doc_id % 3 WHEN 0 THEN 100 WHEN 1 THEN 9000
        |      ELSE 4000000 END AS amp,
        |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 44100
        |      WHEN 2 THEN 22050 ELSE 11025 END AS rate,
        |    1 + doc_id % 2 AS ch,
        |    90 + (doc_id % 6) * 17 AS n
        |  FROM documents),
        |s AS (
        |  SELECT d, bits, rate, ch, n,
        |    list_transform(range(0, n * ch), i ->
        |      abs(((i // ch + 7) * (d % 25 + 3) * 2203 + (i % ch) * 911)
        |        % (2 * amp + 1) - amp)) AS a
        |  FROM d)
        |SELECT d AS media_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(ch AS BIGINT) AS channels, CAST(bits AS BIGINT) AS bits,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
        |  CAST(list_sum(a) AS DOUBLE) / (n * ch) AS mean_abs_amp
        |FROM s ORDER BY media_id""".stripMargin,

    "q_stream_cdxfetch" ->
      cdxLedgerOracle,

    "q_id3_extract" ->
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |p AS (
        |  SELECT d, d % 4 AS k, d % 2 = 0 AS mpeg1, d % 3 AS sri,
        |    d % 3 <> 1 AS xing, 3 + d % 4 AS music
        |  FROM d),
        |q AS (
        |  SELECT *,
        |    CASE WHEN mpeg1
        |      THEN CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |        ELSE 32000 END
        |      ELSE CASE sri WHEN 0 THEN 22050 WHEN 1 THEN 24000
        |        ELSE 16000 END END AS sr,
        |    CASE WHEN mpeg1 THEN 1152 ELSE 576 END AS spf
        |  FROM p)
        |SELECT d AS doc_id,
        |  CASE WHEN k >= 2 THEN '2.4' ELSE '2.3' END AS version,
        |  CASE WHEN k = 0 THEN 'Tîtle æ' || d
        |    ELSE 'Tïtle №' || d END AS title,
        |  CASE WHEN k = 0 THEN 'Ärtist ' || d
        |    ELSE 'Артист ' || d END AS artist,
        |  'Album ' || (d % 9) AS album,
        |  CAST(1990 + d % 30 AS VARCHAR) AS yr,
        |  'eng/note:Comment ©' || d AS comm,
        |  'origin:crawl-' || (d % 5) AS txxx,
        |  CAST(music + CASE WHEN xing THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_frames,
        |  CAST(music * spf * 1000 // sr AS BIGINT) AS duration_ms
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_subtitle_extract" ->
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |c AS (
        |  SELECT d, j,
        |    800 + (j * 37 + d) % 1200 AS dur,
        |    'cue' || j || ' w' || ((d + j) % 50) AS txt
        |  FROM d, LATERAL (SELECT unnest(range(0, 2 + d % 4)) AS j))
        |SELECT d AS doc_id,
        |  CASE WHEN d % 2 = 0 THEN 'srt' ELSE 'vtt' END AS fmt,
        |  CAST(2 + d % 4 AS BIGINT) AS n_cues,
        |  CAST(sum(dur) AS BIGINT) AS total_dur_ms,
        |  string_agg(txt, ' / ' ORDER BY j) AS all_text
        |FROM c GROUP BY d ORDER BY doc_id""".stripMargin,

    "q_ogg_meta" ->
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |p AS (
        |  SELECT d, d % 2 = 1 AS opus,
        |    CASE d % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 44100 ELSE 48000 END AS rate,
        |    1 + d % 2 AS channels,
        |    CASE WHEN d % 2 = 1 THEN 300 + d % 50 ELSE 0 END AS preskip,
        |    2 + d % 5 AS n_audio
        |  FROM d),
        |q AS (
        |  SELECT *, CASE WHEN opus THEN preskip + 4800 * (1 + d % 7)
        |    ELSE rate * (1 + d % 7) // 2 END AS granule
        |  FROM p)
        |SELECT d AS doc_id,
        |  CASE WHEN opus THEN 'opus' ELSE 'vorbis' END AS codec,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  'Trãck №' || d AS title,
        |  'Ensemble ' || (d % 9) AS artist,
        |  CAST(2 + n_audio AS BIGINT) AS n_pages,
        |  CAST(granule AS BIGINT) AS last_granule,
        |  CAST(CASE WHEN opus THEN (granule - preskip) * 1000 // 48000
        |    ELSE granule * 1000 // rate END AS BIGINT) AS duration_ms
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_audio_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id AS d, doc_id % 25 AS r, doc_id % 4 AS k
        |  FROM documents),
        |en AS (
        |  SELECT r, list_transform(range(0, 65), w ->
        |    abs(((r + 1) * (2*w + 7) * 2203) % 2003 - 1001) +
        |    abs(((r + 1) * (2*w + 8) * 2203) % 2003 - 1001)) AS e
        |  FROM (SELECT DISTINCT r FROM d)),
        |bits AS (
        |  SELECT r, array_to_string(list_transform(range(0, 64), j ->
        |    CASE WHEN e[j + 2] > e[j + 1] THEN 1 ELSE 0 END), '') AS fp
        |  FROM en),
        |pcmrep AS (
        |  SELECT b.fp, min(d.d) AS rep
        |  FROM d JOIN bits b ON b.r = d.r WHERE d.k <= 1 GROUP BY b.fp),
        |tagrep AS (
        |  SELECT r, min(d) AS rep FROM d WHERE k >= 2 GROUP BY r)
        |SELECT d.d AS media_id,
        |  CASE d.k WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'audio/flac'
        |    WHEN 2 THEN 'audio/mpeg' ELSE 'audio/ogg' END AS modality,
        |  CASE WHEN d.k <= 1
        |    THEN (SELECT p.rep FROM pcmrep p JOIN bits b ON b.fp = p.fp
        |          WHERE b.r = d.r)
        |    ELSE (SELECT t.rep FROM tagrep t WHERE t.r = d.r) END AS rep,
        |  CAST(CASE WHEN d.k <= 1 THEN 16
        |    WHEN d.k = 2 THEN (3 + d.r % 4) * 1152 * 1000 //
        |      (CASE d.r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |        ELSE 32000 END)
        |    ELSE 100 * (1 + d.r % 5) END AS BIGINT) AS duration_ms
        |FROM d ORDER BY media_id""".stripMargin,

    "q_jsonld_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'NewsArticle' WHEN 1 THEN 'BlogPosting'
        |    WHEN 2 THEN 'Article' ELSE NULL END AS ld_type,
        |  CASE doc_id % 4 WHEN 0 THEN 'Headline ' || doc_id
        |    WHEN 1 THEN 'Post ' || doc_id
        |    WHEN 2 THEN 'Piece ' || doc_id ELSE NULL END AS headline,
        |  CASE doc_id % 4 WHEN 0 THEN '2026-07-' || (10 + doc_id % 19)
        |    ELSE NULL END AS date_published,
        |  CASE doc_id % 4 WHEN 0 THEN 'en' ELSE NULL END AS in_language,
        |  CASE doc_id % 4 WHEN 0 THEN 'Reporter ' || (doc_id % 3)
        |    WHEN 1 THEN 'Author ' || (doc_id % 7) ELSE NULL END AS author,
        |  CASE doc_id % 4 WHEN 2 THEN 'Writer ' || (doc_id % 5)
        |    ELSE '' END AS author_raw
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_png_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
        |  FROM documents)
        |SELECT doc_id AS media_id, 'image/png' AS modality,
        |  doc_id % 2 = 0 AS had_gps,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, w * h), i ->
        |    (doc_id * 7 + i) % 256)) AS DOUBLE) / (w * h)
        |    AS mean_intensity
        |FROM d ORDER BY media_id""".stripMargin,

    "q_mp4_tracks" ->
      """WITH d AS (SELECT doc_id AS d FROM documents),
        |t AS (
        |  SELECT d, j AS track_no, (d + j) % 3 AS c, (d + j) % 4 AS lg,
        |    2 + (d + j) % 5 AS secs
        |  FROM d, LATERAL (SELECT unnest(range(0, 1 + d % 3)) AS j))
        |SELECT d AS media_id, CAST(track_no AS BIGINT) AS track_no,
        |  CAST(track_no + 1 AS BIGINT) AS track_id,
        |  CASE c WHEN 0 THEN 'vide' WHEN 1 THEN 'soun' ELSE 'text' END
        |    AS handler,
        |  CASE c WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'tx3g' END
        |    AS codec,
        |  CASE lg WHEN 0 THEN 'eng' WHEN 1 THEN 'deu' WHEN 2 THEN 'jpn'
        |    ELSE 'und' END AS language,
        |  CAST(CASE c WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 48000 END
        |    AS BIGINT) AS timescale,
        |  CAST(secs * 1000 AS BIGINT) AS duration_ms
        |FROM t ORDER BY media_id, track_no""".stripMargin
  )
}
