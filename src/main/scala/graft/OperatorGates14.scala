package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 tier: EXIF orientation normalization for perceptual
  * dedup (real web JPEGs carry Orientation 2-8; a rotated duplicate
  * must hash identically to its upright copy — the reference's
  * dedup tier has no answer to this, see
  * gobblin-data-management/.../CopyableFile.java for the byte-level
  * fingerprints it stops at), and the round's corpus-payload gates.
  */
object OperatorGates14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Block value of the EXIF fixture's UPRIGHT image — keyed by
    * content group g = (d/25) % 5 so ids sharing g are true
    * duplicates stored under different orientations. The oracle
    * restates it (orientation-independent: that is the point).
    */
  private def exifValue(d: Long, bx: Int, by: Int): Int = {
    val g = (d / 25) % 5
    (16 + (g * 47 + bx * 31 + by * 67) % 224).toInt
  }

  /** A 64x48 constant-block gray image (JPEG-q100-exact regime; VP8L
    * is lossless) PHYSICALLY transformed by the inverse of
    * orientation o = 1 + (d/25) % 8 and tagged with EXIF Orientation
    * o — so the upright decode is the SAME base image for every
    * member of the group. Container alternates: every 4th member is
    * a VP8X WebP with an EXIF chunk, the rest JPEG with APP1. Byte
    * order alternates II/MM; the o=1 odd ids carry no Exif at all
    * (the missing-Exif default path).
    */
  private[graft] def synthExifJpeg(d: Long): Array[Byte] = {
    import graft.operators.{JpegCodec, Multimodal, WebpCodec}
    val k = d / 25
    val o = (1 + k % 8).toInt
    val inv = o match { case 6 => 8; case 8 => 6; case x => x }
    val rgb = new Array[Byte](64 * 48 * 3)
    var i = 0
    while (i < 64 * 48) {
      val b = exifValue(d, (i % 64) / 16, (i / 64) / 16).toByte
      rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
      i += 1
    }
    val upright = JpegCodec.DecodedImage(64, 48, 3, rgb)
    val stored = Multimodal.applyOrientation(upright, inv)
    if (k % 4 == 3) {
      val plain = WebpCodec.encodeLossless(stored.width, stored.height,
        3, stored.pixels)
      WebpCodec.withExifOrientation(d, plain, o, bigEndian = k % 2 == 0)
    } else {
      val enc = JpegCodec.encodeRgb(stored.width, stored.height,
        stored.pixels, quality = 100, subsample = true)
      if (o == 1 && k % 2 == 1) enc // no APP1: the missing-Exif default
      else JpegCodec.withExifOrientation(enc, o, bigEndian = k % 2 == 0)
    }
  }

  /** Normalize a doc's text to the single-space form both the PDF
    * writer and the oracle use.
    */
  private def normText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(coalesce(c, lit("")), "\\s+", " "))

  def queries14: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- PDF text extraction (PdfText over PdfCodec): each doc's text
    //     is typeset into a REAL PDF — variant doc%3 rotates classic
    //     xref / Flate+Differences+TJ-kern / xref-stream+ObjStm+Type0
    //     structures, 8 words per line, 6 lines per page — and the
    //     extractor must recover the text exactly (line/page breaks
    //     map back to the spaces they replaced). The oracle replays
    //     the page arithmetic and asserts the round-trip against the
    //     source column; real-world interop is pinned by PdfSpec's
    //     system-PDF fixtures -------------------------------------
    "q_pdf_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Multimodal, PdfWriter}
      val media = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 0 && col("doc_id") < 500)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, txt) =>
          (id, PdfWriter.write(id,
            PdfWriter.layout(txt, perLine = 8, linesPerPage = 6),
            (id % 3).toInt))
        })
        .toDF("media_id", "content")
      Multimodal.extractPdfText(media).toDF()
        .select(col("media_id"), col("n_pages"), col("n_chars"),
          regexp_replace(col("text"), "\n", " ").as("text"))
        .orderBy(col("media_id"))
    }),

    // --- crawl chain with MIXED payloads: WARC files carry HTML for
    //     even docs and real PDFs for odd docs; the pipeline sniffs
    //     each payload's magic bytes (never trusting Content-Type),
    //     routes PDFs through PdfText and HTML through stripHtml, and
    //     the shared token stats come out identical either way. The
    //     oracle replays both branches from the source column --------
    "q_crawl_pdf" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Text
      import graft.operators.{Multimodal, PdfText, PdfWriter, WarcCodec}
      val files = t(s, dir, "documents")
        .filter(col("doc_id") < 250)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
        .groupByKey(_._1 / 5)
        .mapGroups { (fid, docs) =>
          val pages = docs.toSeq.sortBy(_._1).map { case (id, txt) =>
            val payload =
              if (id % 2 == 0)
                s"<html>$txt</html>".getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)
              else PdfWriter.write(id,
                PdfWriter.layout(txt, perLine = 8, linesPerPage = 6),
                (id % 3).toInt)
            (s"https://example.com/doc/$id", payload)
          }
          (fid, WarcCodec.writeResponses(pages, gzipPerRecord = fid % 2 == 1))
        }
        .toDF("media_id", "content")
      val recs = WarcCodec.binaryRecords(files).toDF()
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("payload"))
      val dispatched = recs.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          Multimodal.sniffModality(p) match {
            case "application/pdf" =>
              (id, "application/pdf",
                PdfText.extract(id, p).text.replace('\n', ' '))
            case _ =>
              (id, "text/html",
                new String(p, java.nio.charset.StandardCharsets.UTF_8))
          }
        }).toDF("doc_id", "modality", "raw")
      dispatched
        .select(col("doc_id"), col("modality"),
          when(col("modality") === "text/html",
            Text.stripHtml(col("raw"))).otherwise(col("raw")).as("clean"))
        .select(col("doc_id"), col("modality"),
          Text.tokenCount(col("clean")).cast("long").as("n_tokens"),
          length(col("clean")).cast("long").as("clean_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- language ID as an exact-integer char-TRIGRAM naive-Bayes
    //     classifier (the fastText-style upgrade over marker votes:
    //     char distributions separate close pairs like es/pt that
    //     whole-word markers cannot): train on the labeled quarter,
    //     predict the rest with margins. The oracle RE-TRAINS in SQL —
    //     counts, quantized rational weights, additive scores, argmax
    //     and the best-minus-runner-up margin, bit for bit ------------
    "q_lang_id_nb" -> ((s, dir) => {
      import graft.functions.Text
      import graft.operators.TextClassifier
      val grams = (c: org.apache.spark.sql.Column) => Text.charNgrams(c, 3)
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"), col("text"), col("lang").as("label"))
      val (w, ci) = TextClassifier.train(train, "text", "label", grams)
      val heldOut = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
        .select("doc_id", "text")
      TextClassifier.predictWithMargin(heldOut, "doc_id", "text", w, ci, grams)
        .orderBy(col("doc_id"))
    }),

    // --- Iceberg v2 FORMAT interop: two native commits mirrored as
    //     real Iceberg snapshots (metadata.json + Avro manifest list
    //     + per-partition manifests, spec-pinned in IcebergMetaSpec),
    //     then read back THROUGH THE ICEBERG METADATA ONLY — current
    //     snapshot and time travel to snapshot 1 — and aggregated.
    //     The oracle replays both epochs from the source table -------
    "q_iceberg_meta" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_iceberg").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"))
      // epoch 1: all four shards from docs < 200
      val v1 = table.commit(docs.filter(col("doc_id") < 200),
        touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v1)
      // epoch 2: shards 0/1 rewritten with the full < 300 range
      val v2 = table.commit(docs.filter(col("shard") < 2),
        touched = Seq("0", "1"))
      IcebergMeta.mirror(s, table, v2)
      def agg(snap: Option[Long], label: Int) =
        IcebergMeta.read(s, s"$tmp/t", snapshotId = snap)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
          .select(lit(label.toLong).as("snapshot"), col("shard"),
            col("n"), col("sum_id"))
      agg(Some(1L), 1).unionByName(agg(None, 2))
        .orderBy(col("snapshot"), col("shard"))
    }),

    // --- FLAGSHIP document pipeline: one logical corpus stored as a
    //     MIX of plain text / HTML / real PDFs (groups of 3 ids share
    //     the leader's text) -> magic-byte dispatch + extraction ->
    //     cross-format exact dedup (min-id survivor per fingerprint)
    //     -> token/char stats -> ShardedTable publish -> Iceberg v2
    //     mirror -> read back THROUGH THE ICEBERG METADATA ONLY. The
    //     oracle replays the whole chain from the source table --------
    "q_document_pipeline" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Text
      import graft.operators.{Multimodal, PdfText, PdfWriter}
      import graft.sink.{IcebergMeta, ShardedTable}
      val media = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
        .groupByKey(_._1 / 3)
        .flatMapGroups { (g, it) =>
          val members = it.toSeq.sortBy(_._1)
          val leaderText = members.head._2
          members.map { case (id, _) =>
            val bytes = (id % 3) match {
              case 0 => leaderText.getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case 1 => s"<html>$leaderText</html>".getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case _ => PdfWriter.write(id,
                PdfWriter.layout(leaderText, perLine = 8, linesPerPage = 6),
                (g % 3).toInt)
            }
            (id, bytes)
          }
        }.toDF("media_id", "content")
      val extracted = media.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, c) =>
          Multimodal.sniffModality(c) match {
            case "application/pdf" =>
              (id, PdfText.extract(id, c).text.replace('\n', ' '))
            case _ => (id,
              new String(c, java.nio.charset.StandardCharsets.UTF_8))
          }
        }).toDF("media_id", "raw")
        .select(col("media_id"), Text.stripHtml(col("raw")).as("clean"))
      val survivors = extracted
        .groupBy(Text.fingerprint(col("clean")).as("fp"))
        .agg(min(col("media_id")).as("doc_id"),
          count(lit(1)).as("n_copies"),
          // min, not first: deterministic by construction — though
          // the group key IS fingerprint(clean), so every value in
          // the group is byte-identical, min makes that explicit
          min(col("clean")).as("clean"))
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
          col("n_copies"),
          Text.tokenCount(col("clean")).cast("long").as("n_tokens"),
          length(col("clean")).cast("long").as("clean_chars"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_docpipe").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val v = table.commit(survivors, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v)
      IcebergMeta.read(s, s"$tmp/t")
        .select(col("doc_id"), col("shard"), col("n_copies"),
          col("n_tokens"), col("clean_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- Iceberg file-level STATS pruning: partitions hold disjoint
    //     doc_id ranges, so the manifests' per-file lower/upper
    //     bounds (field-ids 125/128) let a range read skip whole
    //     files without opening them; rows come back THROUGH the
    //     Iceberg metadata only. The oracle is the plain range scan --
    "q_iceberg_stats_prune" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_icestats").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          (col("doc_id") / 75).cast("long").as("shard"))
      val v = table.commit(docs, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v)
      IcebergMeta.read(s, s"$tmp/t",
          range = Some(("doc_id", "100", "220")))
        .filter(col("doc_id").between(100, 220)) // exact cut inside kept files
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
        .select(col("shard"), col("n"), col("sum_id").cast("long").as("sum_id"))
        .orderBy(col("shard"))
    }),

    // --- STREAMING document ingest (the flagship's streaming face):
    //     two micro-batches of the mixed plain/HTML/PDF corpus are
    //     extracted per batch and merged into a fingerprint-sharded
    //     dedup LEDGER (min-id survivor, copy counts — both mergeable
    //     folds, so streaming == batch), committed partition-granular
    //     per epoch. The oracle deduplicates the union in one shot ---
    "q_stream_document" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Text
      import graft.operators.{Multimodal, PdfText, PdfWriter}
      import graft.streaming.StreamingIngest
      val media = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
        .groupByKey(_._1 / 3)
        .flatMapGroups { (g, it) =>
          val members = it.toSeq.sortBy(_._1)
          val leaderText = members.head._2
          members.map { case (id, _) =>
            val bytes = (id % 3) match {
              case 0 => leaderText.getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case 1 => s"<html>$leaderText</html>".getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case _ => PdfWriter.write(id,
                PdfWriter.layout(leaderText, perLine = 8, linesPerPage = 6),
                (g % 3).toInt)
            }
            (id, bytes)
          }
        }.toDF("media_id", "content")
      val inDir = java.nio.file.Files.createTempDirectory("q_stream_doc")
      val now = System.currentTimeMillis()
      OperatorGates8.stageFile(media.filter(col("media_id") < 150),
        inDir, "b1.parquet", now - 120000)
      OperatorGates8.stageFile(media.filter(col("media_id") >= 150),
        inDir, "b2.parquet", now - 60000)
      val root = java.nio.file.Files
        .createTempDirectory("q_stream_doc_out").toString
      val table = new graft.sink.ShardedTable(s"$root/dedup", "shard",
        s.sparkContext.hadoopConfiguration)
      val stream = StreamingIngest.readFileStream(s, media.schema,
        inDir.toString, maxFilesPerTrigger = Some(1))
      val q = stream.writeStream
        .foreachBatch { (delta: DataFrame, _: Long) =>
          val ext = delta.as[(Long, Array[Byte])]
            .mapPartitions(_.map { case (id, c) =>
              Multimodal.sniffModality(c) match {
                case "application/pdf" =>
                  (id, PdfText.extract(id, c).text.replace('\n', ' '))
                case _ => (id,
                  new String(c, java.nio.charset.StandardCharsets.UTF_8))
              }
            }).toDF("media_id", "raw")
            .select(col("media_id"),
              Text.stripHtml(col("raw")).as("clean"))
          val agg = ext
            .groupBy(Text.fingerprint(col("clean")).as("fp"))
            .agg(min(col("media_id")).as("keep_id"),
              count(lit(1)).as("n_copies"))
            .withColumn("shard",
              pmod(xxhash64(col("fp")), lit(8)).cast("long"))
          val touched = agg.select(col("shard").cast("string"))
            .distinct().as[String].collect().toSeq.sorted
          val hasCurrent = table.currentVersion.isDefined
          val merged =
            if (!hasCurrent) agg
            else table.readPartitions(s, touched)
              .select("fp", "keep_id", "n_copies", "shard")
              .unionByName(agg)
              .groupBy(col("fp"), col("shard"))
              .agg(min(col("keep_id")).as("keep_id"),
                sum(col("n_copies")).as("n_copies"))
          table.commit(merged, touched, full = !hasCurrent)
          ()
        }
        .option("checkpointLocation", s"$root/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      table.readCurrent(s)
        .select(col("fp").as("fingerprint"), col("keep_id"),
          col("n_copies").cast("long").as("n_copies"))
        .orderBy(col("fingerprint"))
    }),

    // --- MP3 container probe: ID3v2 skip + MPEG-1/2 Layer-III frame
    //     walk (bitrate/samplerate tables, padding-aware frame
    //     sizing) — compressed-audio corpus accounting without MDCT
    //     decode, the Mp4Codec contract. All header arithmetic
    //     replays in SQL from the fixture parameters ----------------
    "q_mp3_probe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Mp3Codec
      t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map { id =>
          val k = id / 25
          val bytes = Mp3Codec.synthesize(
            nFrames = (10 + k % 7).toInt,
            brIdx = (1 + k % 14).toInt,
            srIdx = ((k / 2) % 3).toInt,
            mpeg1 = k % 2 == 0,
            id3Bytes = if (k % 3 == 0) (50 + k).toInt else 0)
          val f = Mp3Codec.parse(id, bytes)
          (id, f.nFrames.toLong, f.bitrateKbps.toLong,
            f.sampleRate.toLong, f.samplesPerFrame.toLong,
            f.durationMs, f.hasId3)
        })
        .toDF("media_id", "n_frames", "bitrate_kbps", "sample_rate",
          "samples_per_frame", "duration_ms", "has_id3")
        .orderBy(col("media_id"))
    }),

    // --- FLAC STREAMINFO probe: the mandatory first metadata block's
    //     bit layout (20-bit sample rate straddling byte boundaries,
    //     36-bit total samples, the signature MD5) ------------------
    "q_flac_probe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.FlacCodec
      t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map { id =>
          val k = id / 25
          val rates = Array(8000, 16000, 22050, 32000, 44100, 48000)
          val bytes = FlacCodec.synthesize(
            sampleRate = rates((k % 6).toInt),
            channels = (1 + k % 4).toInt,
            bps = if (k % 2 == 0) 16 else 24,
            totalSamples = 1000 + k * 977,
            md5 = Array.tabulate(16)(i => ((k * 31 + i) % 256).toByte))
          val f = FlacCodec.parse(id, bytes)
          (id, f.sampleRate.toLong, f.channels.toLong,
            f.bitsPerSample.toLong, f.totalSamples, f.durationMs, f.md5Hex)
        })
        .toDF("media_id", "sample_rate", "channels", "bits_per_sample",
          "total_samples", "duration_ms", "md5_hex")
        .orderBy(col("media_id"))
    }),

    // --- HTML page metadata (crawl tier): <title> text and OpenGraph
    //     og:title / og:description in BOTH attribute orders, via
    //     codegen'd RE2-safe regexp columns — titles/descriptions are
    //     the page-ranking signals curation uses before any body-text
    //     stage. Planted HTML replayed by the oracle ------------------
    "q_html_meta" -> ((s, dir) => {
      import graft.functions.Text
      val d = t(s, dir, "documents").filter(col("doc_id") < 400)
      val html = concat(
        lit("<html><head><title> Doc "), col("doc_id"),
        lit(" \n of "), col("source"), lit("</title>"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("<meta property=\"og:title\" content=\""),
            col("source"), lit(" page\"/>")))
          .otherwise(concat(lit("<meta content='"), col("source"),
            lit(" page' property='og:title'/>"))),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("<meta property=\"og:description\" content=\""),
            substring(col("text"), 1, 40), lit("\"/>")))
          .otherwise(lit("")),
        lit("</head><body>"), col("text"), lit("</body></html>"))
      d.select(col("doc_id"),
        Text.htmlTitle(html).as("title"),
        Text.htmlMetaContent(html, "og:title").as("og_title"),
        Text.htmlMetaContent(html, "og:description").as("og_desc"))
        .orderBy(col("doc_id"))
    }),

    // --- CROSS-FORMAT TEXT dedup (the q_crossformat_neardup story in
    //     the text domain): one logical document stored as plain text
    //     / HTML / a real PDF must collapse to ONE fingerprint after
    //     sniff-dispatched extraction + normalization — byte-level
    //     dedup can never see these copies. Groups of 3 consecutive
    //     ids share the leader's text in three containers. The oracle
    //     fingerprints the leader text directly -----------------------
    "q_crossformat_textdedup" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Text
      import graft.operators.{EpubText, Multimodal, OfficeText, PdfText, PdfWriter}
      val media = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
        .groupByKey(_._1 / 3)
        .flatMapGroups { (g, it) =>
          val members = it.toSeq.sortBy(_._1)
          val leaderText = members.head._2
          members.map { case (id, _) =>
            val bytes = (id % 3) match {
              case 0 => leaderText.getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case 1 =>
                // alternate the HTML serialization with an EPUB book
                // carrying the same text (extraction is lossless, so
                // the fingerprint — and the oracle — are unchanged)
                if (g % 2 == 1)
                  EpubText.write(s"Book $g", Seq((s"c$g", Seq(leaderText))))
                else s"<html>$leaderText</html>".getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)
              case _ => PdfWriter.write(id,
                PdfWriter.layout(leaderText, perLine = 8, linesPerPage = 6),
                (g % 3).toInt)
            }
            (id, bytes)
          }
        }.toDF("media_id", "content")
      val extracted = media.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, c) =>
          Multimodal.sniffModality(c) match {
            case "application/pdf" =>
              (id, PdfText.extract(id, c).text.replace('\n', ' '))
            case "application/zip" =>
              (id, OfficeText.extract(id, c).text.replace('\n', ' '))
            case _ => (id,
              new String(c, java.nio.charset.StandardCharsets.UTF_8))
          }
        }).toDF("media_id", "raw")
      extracted
        .select(col("media_id"), Text.stripHtml(col("raw")).as("clean"))
        .groupBy(Text.fingerprint(col("clean")).as("fingerprint"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("fingerprint"))
    }),

    // --- Iceberg v2 EQUALITY DELETES (merge-on-read): a compliance
    //     purge deletes doc_ids WITHOUT rewriting any partition — a
    //     delete snapshot whose file removes matches from every data
    //     file with a smaller sequence number; a LATER data commit is
    //     untouched by the older delete. The oracle replays both
    //     snapshots' visibility rules from the source table ----------
    "q_iceberg_deletes" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_icedel").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"))
      val v1 = table.commit(docs, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v1)
      // snapshot 2: purge doc_id % 7 == 3 by equality delete
      IcebergMeta.mirrorDeletes(s, table,
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"),
        equalityCols = Seq("doc_id"))
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

    // --- Avro reader-schema RESOLUTION (the Avro spec's evolution
    //     contract): epoch-1 files carry an OLD schema (no lang
    //     column, int score, plus a junk column the new schema
    //     dropped); epoch-2 files the NEW one. Reading BOTH under the
    //     new reader schema must default-fill lang, promote int->long,
    //     and skip the dropped field — one frame, one schema. The
    //     oracle restates the resolved values from the source table --
    "q_avro_evolution" -> ((s, dir) => {
      import graft.sources.AvroFiles
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_avro_evo").toString
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val v1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), col("text"),
          length(col("text")).cast("int").as("score"),
          lit("dropped-by-v2").as("junk"))
      AvroFiles.write(v1, s"$tmp/epoch1")
      val v2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("score"), col("lang"))
      AvroFiles.write(v2, s"$tmp/epoch2")
      val readerJson = AvroFiles.avroSchema(v2.schema).toString
      AvroFiles.read(s, s"$tmp/epoch1", Some(readerJson))
        .unionByName(AvroFiles.read(s, s"$tmp/epoch2", Some(readerJson)))
        .select(col("doc_id"), col("score"),
          coalesce(col("lang"), lit("unknown")).as("lang"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- EXIF orientation normalization: JPEGs stored under all 8
    //     EXIF orientations (pixels physically counter-transformed,
    //     APP1 spliced in both TIFF byte orders, o=1 sometimes with
    //     no Exif at all) must decode through aHashAuto to the SAME
    //     upright hash — rotated duplicates stop defeating perceptual
    //     dedup. The oracle replays the UPRIGHT image's hash from the
    //     block formula, which no orientation may perturb ------------
    "q_exif_orient" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{JpegCodec, Multimodal}
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthExifJpeg(id))))
        .toDF("media_id", "content")
      // the planted orientation read back from the real container
      // bytes (JPEG APP1 or WebP EXIF chunk, both byte orders) and
      // the hash through the shared normalized decode
      val withO = media.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, c) =>
          val o = Multimodal.sniffModality(c) match {
            case "image/webp" => graft.operators.WebpCodec
              .exifOrientation(id, c)
            case _ => JpegCodec.exifOrientation(id, c)
          }
          (id, o.toLong)
        }).toDF("media_id", "exif_orientation")
      val hashes = Multimodal.aHashAuto(media).toDF()
      withO.join(hashes, "media_id")
        .select(col("media_id"), col("exif_orientation"), col("modality"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"))
    }),

    // --- REAL multi-page TIFF decode (TiffCodec): count-bounded
    //     fixtures (20 documents at every SF, 1-3 pages each) across
    //     none/LZW+predictor/Deflate/PackBits and both byte orders,
    //     strip-walked and fully decoded on executors; TIFF is
    //     lossless so the oracle replays per-page dims, exact mean
    //     and the 64-bit aHash analytically. CCITT fax + tiles are
    //     pinned against libtiff-encoded fixtures in TiffSpec --------
    "q_tiff_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthTiff(id))))
        .toDF("media_id", "content")
      Multimodal.decodeTiffPages(media).toDF()
        .select(col("media_id"),
          col("page_no").cast("long").as("page_no"),
          col("n_pages").cast("long").as("n_pages"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"), col("page_no"))
    }),

    // --- REAL DOCX/ODT text extraction (OfficeText): each document's
    //     normalized text chunked into 8-word paragraphs and written
    //     as a genuine office container (ZIP + WordprocessingML /
    //     OpenDocument XML, runs split mid-sentence, proofErr/rsid
    //     noise), then container-classified and StAX-extracted on
    //     executors. The oracle recomputes paragraph count and the
    //     reassembled text from documents.text alone ----------------
    "q_docx_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{OfficeText, RtfText}
      val docs = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5)) === 2 && col("doc_id") < 500)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
      val out = docs.mapPartitions(_.map { case (id, txt) =>
        val words = txt.split(" ", -1)
        val paras = words.grouped(8).map(_.mkString(" ")).toSeq
        val (kind, text) = id % 3 match {
          case 0 =>
            val d = OfficeText.extract(id, OfficeText.writeDocx(paras, salt = id))
            (d.kind, d.text)
          case 1 =>
            val d = OfficeText.extract(id, OfficeText.writeOdt(paras, salt = id))
            (d.kind, d.text)
          case _ =>
            ("rtf", RtfText.extract(id, RtfText.write(paras)))
        }
        (id, kind, text.split("\n", -1).length.toLong,
          text.replace('\n', ' '))
      }).toDF("doc_id", "kind", "n_paragraphs", "text")
      out.select(col("doc_id"), col("kind"), col("n_paragraphs"),
          length(col("text")).cast("long").as("n_chars"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // --- .tar.bz2 ingest (Bzip2Codec + TarCodec): documents packed
    //     10-per-shard into a ustar archive, bzip2-compressed with
    //     OUR encoder, then the ingest chain decompresses (CRCs
    //     verified), walks the tar and reassembles every document —
    //     the legacy corpus-drop shape. Oracle = the plain documents
    //     table; bzip2 is lossless so the chain must be exact --------
    "q_bzip2_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Bzip2Codec, TarCodec}
      val packed = t(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .groupByKey(_._1 / 10)
        .mapGroups { (fid, it) =>
          val members = it.toSeq.sortBy(_._1).map { case (id, text) =>
            s"docs/$id.txt" -> text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          (fid, Bzip2Codec.compress(TarCodec.write(members)))
        }
        .toDF("file_id", "content")
      packed.as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (fid, bz) =>
          val tar = Bzip2Codec.decompress(fid, bz)
          TarCodec.parse(fid, tar).iterator.map { case (name, data) =>
            val id = name.stripPrefix("docs/").stripSuffix(".txt").toLong
            (id, new String(data, java.nio.charset.StandardCharsets.UTF_8))
          }
        })
        .toDF("doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // --- JDBC state store (graft.state.JdbcStateStore, the
    //     reference's MysqlStateStore shape): put / transactional
    //     upsert / delete / listKeys against an embedded Derby, with
    //     the oracle replaying the final store contents from the id
    //     arithmetic. Rows here are per-dataset METADATA — the store
    //     is config-sized by design --------------------------------
    "q_state_store" -> ((s, dir) => {
      import s.implicits._
      import graft.state.JdbcStateStore
      val ids = t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200)
        .as[Long].collect().sorted
      val url = "jdbc:derby:memory:gst" +
        java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
      val store = new JdbcStateStore(url).init()
      ids.foreach { id =>
        store.put(s"s${id % 3}", s"t$id",
          Map("watermark" -> (id * 7).toString, "run" -> "1"))
      }
      ids.filter(_ % 4 == 0).foreach { id => // upsert path
        store.put(s"s${id % 3}", s"t$id",
          Map("watermark" -> (id * 7 + 1).toString, "run" -> "2"))
      }
      ids.filter(_ % 10 == 9).foreach(id => store.delete(s"s${id % 3}", s"t$id"))
      val rows = (0 until 3).flatMap { g =>
        val st = s"s$g"
        store.listKeys(st).map { k =>
          val m = store.get(st, k).getOrElse(sys.error(s"listed key $k missing"))
          (st, k, m("watermark").toLong, m("run").toLong)
        }
      }
      rows.toDF("store_name", "key", "watermark", "run")
        .orderBy(col("store_name"), col("key"))
    }),

    // --- Metric wire formats (graft.metrics.Reporters): corpus
    //     aggregates rendered as Graphite plaintext and InfluxDB line
    //     protocol by pure codegen'd column chains (no UDF, no driver
    //     loop); the oracle rebuilds every line with string concat in
    //     SQL. Escaping edge cases are spec-pinned ------------------
    "q_metrics_wire" -> ((s, dir) => {
      import graft.metrics.Reporters
      val m = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).cast("double").as("docs"),
          sum(col("n_chars")).as("total_chars"))
      val g = Reporters.graphiteLines(
        m.withColumn("metric", lit("docs")),
        "graft.corpus", Seq("source", "lang", "metric"), "docs",
        tsSeconds = 1723766400L)
      val i = Reporters.influxLines(m, "corpus_stats",
        tagCols = Seq("source", "lang"),
        longFields = Seq("total_chars"), doubleFields = Seq("docs"),
        tsMillis = 1723766400000L)
      g.toDF().withColumn("proto", lit("graphite"))
        .union(i.toDF().withColumn("proto", lit("influx")))
        .select(col("proto"), col("line"))
        .orderBy(col("proto"), col("line"))
    }),

    // --- FLAGSHIP mixed corpus drop: documents serialized across SIX
    //     formats (HTML / PDF / DOCX / ODT / RTF / plain), packed
    //     12-per-shard into .tar.bz2 archives (our bzip2 + ustar
    //     writers), then the ingest chain runs decompress -> tar walk
    //     -> magic-byte sniff -> per-format extraction and every
    //     document's text comes out EXACTLY equal to the source
    //     column. One gate proving the whole document tier composes --
    "q_mixed_corpus_drop" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Text
      import graft.operators.{Bzip2Codec, Multimodal, OfficeText, PdfText,
        PdfWriter, RtfText, TarCodec}
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < 240)
        .select(col("doc_id"), normText(col("text")).as("t"))
        .as[(Long, String)]
      val shards = docs.groupByKey(_._1 / 12).mapGroups { (fid, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, txt) =>
          val paras = txt.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
          (id % 6) match {
            case 0 => s"d$id.html" -> s"<html>$txt</html>".getBytes(
              java.nio.charset.StandardCharsets.UTF_8)
            case 1 => s"d$id.pdf" -> PdfWriter.write(id,
              PdfWriter.layout(txt, perLine = 8, linesPerPage = 6),
              (id % 3).toInt)
            case 2 => s"d$id.docx" -> OfficeText.writeDocx(paras, salt = id)
            case 3 => s"d$id.odt" -> OfficeText.writeOdt(paras, salt = id)
            case 4 => s"d$id.rtf" -> RtfText.write(paras)
            case _ => s"d$id.txt" -> txt.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)
          }
        }
        (fid, Bzip2Codec.compress(TarCodec.write(members)))
      }.toDF("file_id", "content")
      val extracted = shards.as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (fid, bz) =>
          TarCodec.parse(fid, Bzip2Codec.decompress(fid, bz))
            .iterator.map { case (name, data) =>
              val id = name.stripPrefix("d").takeWhile(_.isDigit).toLong
              Multimodal.sniffModality(data) match {
                case "application/pdf" =>
                  (id, "application/pdf",
                    PdfText.extract(id, data).text.replace('\n', ' '))
                case "application/zip" =>
                  val d = OfficeText.extract(id, data)
                  (id, s"application/${d.kind}",
                    d.text.replace('\n', ' ').replace('\t', ' '))
                case "text/rtf" =>
                  (id, "text/rtf", RtfText.extract(id, data)
                    .replace('\n', ' ').replace('\t', ' '))
                case _ => // plain text members: html vs txt by name
                  val raw = new String(data,
                    java.nio.charset.StandardCharsets.UTF_8)
                  if (name.endsWith(".html")) (id, "text/html", raw)
                  else (id, "text/plain", raw)
              }
            }
        }).toDF("doc_id", "modality", "raw")
      extracted
        .select(col("doc_id"), col("modality"),
          when(col("modality") === "text/html",
            Text.stripHtml(col("raw"))).otherwise(col("raw")).as("clean"))
        .select(col("doc_id"), col("modality"),
          trim(regexp_replace(col("clean"), "\\s+", " ")).as("text"))
        .orderBy(col("doc_id"))
    }),

    // --- .xz ingest (XzCodec, pure-JVM LZMA2): COMMITTED fixtures
    //     encoded by the system xz CLI (tools/xz_fixtures.py) over
    //     generator-deterministic content, sweeping presets, lc/lp/pb
    //     shapes, all four check types, forced multi-block and a
    //     concatenated two-stream file. Each decodes executor-side
    //     (checks verified) into lines the oracle rebuilds
    //     analytically — no pinned constants ------------------------
    "q_xz_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.XzCodec
      val fixtures = (0 until 13).map { k =>
        val ext = if (k == 12) "lzma" else "xz"
        val in = getClass.getResourceAsStream(s"/graft/xz/fixture_$k.$ext")
        require(in != null, s"missing xz fixture $k")
        try (k.toLong, in.readAllBytes()) finally in.close()
      }
      fixtures.toDF("fixture_id", "content")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (k, bz) =>
          // k=12 is the legacy .lzma "alone" container (routed by
          // NAME — the format has no magic); the rest are .xz
          val raw = if (k == 12) XzCodec.decompressLzmaAlone(k, bz)
            else XzCodec.decompress(k, bz)
          val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
          text.split("\n", -1).iterator.filter(_.nonEmpty)
            .zipWithIndex.map { case (l, i) => (k, i.toLong, l) }
        })
        .toDF("fixture_id", "line_no", "line")
        .orderBy(col("fixture_id"), col("line_no"))
    }),

    // --- Content-Encoding crawl ingest (BrotliCodec + WarcCodec):
    //     WARC response records whose HTTP bodies rotate br / gzip /
    //     identity / deflate — br bodies are COMMITTED libbrotli
    //     fixtures (quality 1..11, tools/brotli_probe.py) over
    //     generator-deterministic lines; gzip/deflate bodies are
    //     JDK-encoded from the same formula in-gate. The parse side
    //     decodes transparently per the header; the oracle rebuilds
    //     every line analytically ----------------------------------
    "q_brotli_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.WarcCodec
      def line(k: Int, i: Int): String = {
        val words = (0 until (4 + i % 5))
          .map(j => s"b${(k * 37 + i * 19 + j * 11) % 89}").mkString(" ")
        s"page${k * 100 + i} $words\n"
      }
      def content(k: Int): Array[Byte] =
        (0 until (15 + 3 * k)).map(i => line(k, i)).mkString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val files = (0 until 6).toDF("file_id")
        .as[Int]
        .mapPartitions(_.map { f =>
          val pages = (f * 4 until f * 4 + 4).map { k =>
            val (wire, enc) =
              if (k < 8) {
                val in = getClass.getResourceAsStream(s"/graft/brotli/fixture_$k.br")
                require(in != null, s"missing brotli fixture $k")
                (try in.readAllBytes() finally in.close(), "br")
              } else if (k < 16) {
                val bo = new java.io.ByteArrayOutputStream()
                val g = new java.util.zip.GZIPOutputStream(bo)
                g.write(content(k)); g.close()
                (bo.toByteArray, "gzip")
              } else if (k < 20) (content(k), "identity")
              else {
                val d = new java.util.zip.Deflater()
                d.setInput(content(k)); d.finish()
                val bo = new java.io.ByteArrayOutputStream()
                val buf = new Array[Byte](8192)
                while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
                d.end()
                (bo.toByteArray, "deflate")
              }
            (s"https://x.example/p/$k", wire, enc)
          }
          (f.toLong, WarcCodec.writeResponsesEncoded(pages))
        })
        .toDF("media_id", "content")
      WarcCodec.records(files).toDF()
        .select(
          regexp_extract(col("target_uri"), "/p/(\\d+)$", 1)
            .cast("long").as("k"),
          col("payload_text"))
        .as[(Long, String)]
        .flatMap { case (k, text) =>
          text.split("\n", -1).iterator.filter(_.nonEmpty)
            .zipWithIndex.map { case (l, i) => (k, i.toLong, l) }
        }
        .toDF("k", "line_no", "line")
        .orderBy(col("k"), col("line_no"))
    }),

    // --- ENCRYPTED-PDF ingest (PdfCrypt): committed fixtures built by
    //     an independent python implementation of the standard
    //     security handler (tools/pdf_encrypt.py) — R3 RC4-128,
    //     R4 AESV2, R6 AES-256, all opening with the EMPTY user
    //     password (the crawled-corpus case: permission-bit documents)
    //     and extracting exact text the oracle rebuilds analytically -
    "q_pdf_encrypted" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.PdfText
      val names = Seq((0L, "r3"), (1L, "r4aes"), (2L, "r6"))
      names.toDF("k", "name")
        .as[(Long, String)]
        .mapPartitions(_.map { case (k, name) =>
          val in = getClass.getResourceAsStream(s"/graft/pdf_enc/fixture_$name.pdf")
          require(in != null, s"missing encrypted-pdf fixture $name")
          val bytes = try in.readAllBytes() finally in.close()
          val t = PdfText.extract(k, bytes)
          (k, name, t.nPages.toLong, t.text.replace('\n', ' '))
        })
        .toDF("k", "revision", "n_pages", "text")
        .orderBy(col("k"))
    }),

    // --- CDX(J) index fetch planning (CdxIndex): the 100-TB crawl
    //     consumer's workflow — resolve target URLs through the
    //     per-crawl index (render -> parse round-trips the CDXJ line
    //     format in-gate) via SURT keys (case/port/param-order
    //     variants collapse), then coalesce per-file byte ranges
    //     under the gap bound with a windowed gaps-and-islands pass.
    //     The oracle replays SURT matching and the island arithmetic -
    "q_cdx_plan" -> ((s, dir) => {
      import graft.operators.CdxIndex
      val docs = t(s, dir, "documents").select(col("doc_id"))
      // hosts alternate www./www2. (both stripped, pywb-style) and
      // every 5th URL sits on a non-default :8080 port (KEPT in the
      // urlkey) — the wanted side must canonicalize to the same keys
      val wwwPfx = when(pmod(col("doc_id"), lit(2)) === 0,
        lit("https://www2.Ex")).otherwise(lit("https://www.Ex"))
      val portSeg = when(pmod(col("doc_id"), lit(5)) === 0,
        lit(".COM:8080/p")).otherwise(lit(".COM/p"))
      val url = concat(wwwPfx, pmod(col("doc_id"), lit(7)),
        portSeg, pmod(col("doc_id"), lit(5)),
        lit("?a="), col("doc_id"), lit("&z=9&m=1"))
      val index = docs.select(
        CdxIndex.surt(url).as("urlkey"),
        lit("20260815000000").as("ts"),
        url.as("url"),
        lit(200).as("status"), lit("text/html").as("mime"),
        concat(lit("sha1:"), md5(col("doc_id").cast("string"))).as("digest"),
        concat(lit("crawl-"), pmod(col("doc_id"), lit(4)),
          lit(".warc.gz")).as("filename"),
        (col("doc_id") * 120).as("offset"),
        (lit(100) + pmod(col("doc_id"), lit(7)) * 250).as("length"))
      // wire-format round-trip: render to CDXJ lines, parse back
      val parsed = CdxIndex.parseCdxj(CdxIndex.renderCdxj(index))
      // wanted URLs arrive in a DIFFERENT surface form (scheme/host
      // case, explicit default port, shuffled params, no www)
      val wantedPort = when(pmod(col("doc_id"), lit(5)) === 0,
        lit(".COM:8080/p")).otherwise(lit(".COM:80/p"))
      val wanted = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(concat(lit("HTTP://EX"), pmod(col("doc_id"), lit(7)),
          wantedPort, pmod(col("doc_id"), lit(5)),
          lit("?z=9&a="), col("doc_id"), lit("&m=1")).as("url"))
      CdxIndex.planFetch(parsed, wanted, "url", maxGap = 600)
        .orderBy(col("filename"), col("range_start"))
    }),

    // --- Digest-dedup fetch planning (CdxIndex.dedupByDigest): many
    //     URLs share identical bodies (the index's digest column
    //     exists for this); fetch each digest ONCE — deterministic
    //     winner by (filename, offset) — then coalesce ranges. The
    //     oracle replays the row_number winner and island arithmetic -
    "q_cdx_dedup_plan" -> ((s, dir) => {
      import graft.operators.CdxIndex
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val url = concat(lit("https://ex"), pmod(col("doc_id"), lit(7)),
        lit(".com/q"), col("doc_id"))
      val index = docs.select(
        CdxIndex.surt(url).as("urlkey"),
        lit("20260815000000").as("ts"), url.as("url"),
        lit(200).as("status"), lit("text/html").as("mime"),
        md5(pmod(col("doc_id"), lit(50)).cast("string")).as("digest"),
        concat(lit("crawl-"), pmod(col("doc_id"), lit(4)),
          lit(".warc.gz")).as("filename"),
        (col("doc_id") * 120).as("offset"),
        (lit(100) + pmod(col("doc_id"), lit(7)) * 250).as("length"))
      val deduped = CdxIndex.dedupByDigest(index)
      val wanted = docs.select(
        concat(lit("https://ex"), pmod(col("doc_id"), lit(7)),
          lit(".com/q"), col("doc_id")).as("url"))
      CdxIndex.planFetch(deduped, wanted, "url", maxGap = 150)
        .orderBy(col("filename"), col("range_start"))
    }),

    // --- Exif privacy scrub (Multimodal.scrubExifGps): JPEGs planted
    //     with GPS coordinates + orientations (both byte orders) and
    //     VP8X WebPs with EXIF chunks; the scrub must flag and remove
    //     GPS while pixels stay byte-identical and display
    //     orientation survives — proven by hashing the SCRUBBED bytes
    //     through the shared normalized decode and matching the
    //     upright formula hash in the oracle -------------------------
    "q_exif_scrub" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{JpegCodec, Multimodal, WebpCodec}
      def sv(d: Long, bx: Int, by: Int): Int =
        (18 + ((d / 25) * 53 + bx * 29 + by * 61) % 220).toInt
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map { d =>
          val k = d / 25
          val o = (1 + k % 8).toInt
          val inv = o match { case 6 => 8; case 8 => 6; case x => x }
          val rgb = new Array[Byte](64 * 48 * 3)
          var i = 0
          while (i < 64 * 48) {
            val b = sv(d, (i % 64) / 16, (i / 64) / 16).toByte
            rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
            i += 1
          }
          val upright = JpegCodec.DecodedImage(64, 48, 3, rgb)
          val stored = Multimodal.applyOrientation(upright, inv)
          val bytes =
            if (k % 4 == 3) {
              val plain = WebpCodec.encodeLossless(stored.width,
                stored.height, 3, stored.pixels)
              WebpCodec.withExifOrientation(d, plain, o)
            } else {
              val enc = JpegCodec.encodeRgb(stored.width, stored.height,
                stored.pixels, quality = 100, subsample = true)
              if (k % 2 == 0)
                JpegCodec.withExifGps(enc, o,
                  latMilli = (40000 + k * 97).toInt,
                  lonMilli = (9000 + k * 53).toInt,
                  bigEndian = k % 8 < 4)
              else if (o == 1) enc
              else JpegCodec.withExifOrientation(enc, o)
            }
          (d, bytes)
        })
        .toDF("media_id", "content")
      val scrubbed = Multimodal.scrubExifGps(media).toDF()
      val rehashed = Multimodal.aHashAuto(
        scrubbed.select(col("media_id"), col("content"))).toDF()
        .select(col("media_id"), col("ahash"))
      scrubbed.select(col("media_id"), col("modality"), col("had_gps"))
        .join(rehashed, "media_id")
        .select(col("media_id"), col("modality"), col("had_gps"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"))
    }),

    // --- page-level robots directives (Text.robotsMeta): meta robots
    //     in either attribute order and quote style, `none`/`all`
    //     semantics, X-Robots-Tag union — the indexing-consent checks
    //     a curation pipeline must run on FETCHED pages (robots.txt
    //     is only half the contract). Oracle replays the variants ----
    "q_robots_meta" -> ((s, dir) => {
      import graft.functions.Text
      val k = pmod(col("doc_id"), lit(6))
      val html = concat(lit("<html><head>"),
        when(k === 0, "<meta name=\"robots\" content=\"noindex, nofollow\">")
          .when(k === 1, "<meta content=nofollow name=robots>")
          .when(k === 2, "<meta name=robots content=none>")
          .when(k === 3, "<meta name=\"robots\" content=\"all\">")
          .otherwise(""),
        lit("<title>t</title></head><body>x</body></html>"))
      val header = when(k === 4, "noindex").otherwise(lit(null))
      t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .select(col("doc_id"),
          Text.robotsMeta(html, header).as("r"))
        .select(col("doc_id"),
          col("r.noindex").as("noindex"), col("r.nofollow").as("nofollow"))
        .orderBy(col("doc_id"))
    })
  )

  /** Multi-page gray TIFF for doc `d`: 64x48 constant 16x16 blocks,
    * 1-3 pages, variant (d/25) % 5 sweeps compression (none / LZW +
    * predictor in both byte orders / Deflate / PackBits). The oracle
    * replays the block formula; every variant is lossless.
    */
  private[graft] def synthTiff(d: Long): Array[Byte] = {
    import graft.operators.TiffCodec
    val k = (d / 25).toInt
    def tv(p: Int, bx: Int, by: Int): Int =
      (15 + (d * 41 + p * 29 + bx * 37 + by * 71) % 227).toInt
    val nPages = 1 + k % 3
    val pages = (0 until nPages).map { p =>
      Array.tabulate(64 * 48)(i => tv(p, (i % 64) / 16, (i / 64) / 16).toByte)
    }
    k % 5 match {
      case 0 => TiffCodec.encodeGrayPages(64, 48, pages, compression = 1,
        rowsPerStrip = 7)
      case 1 => TiffCodec.encodeGrayPages(64, 48, pages, compression = 5,
        predictor = true)
      case 2 => TiffCodec.encodeGrayPages(64, 48, pages, compression = 5,
        predictor = true, bigEndian = true)
      case 3 => TiffCodec.encodeGrayPages(64, 48, pages, compression = 8)
      case _ => TiffCodec.encodeGrayPages(64, 48, pages, compression = 32773)
    }
  }

  def oracleSql14: Map[String, String] = Map(

    "q_pdf_extract" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 500)
        |SELECT doc_id AS media_id,
        |  CAST(ceil(ceil(len(string_split(t, ' ')) / 8.0) / 6.0) AS BIGINT)
        |    AS n_pages,
        |  CAST(len(t) AS BIGINT) AS n_chars,
        |  t AS text
        |FROM d ORDER BY media_id""".stripMargin,

    "q_crawl_pdf" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id < 250)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'text/html'
        |       ELSE 'application/pdf' END AS modality,
        |  CAST(len(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(len(t) AS BIGINT) AS clean_chars
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_lang_id_nb" -> {
      val grams =
        "list_transform(range(1, greatest(length(text) - 1, 1)), " +
          "i -> substring(text, i, 3))"
      s"""WITH tr AS (
         |  SELECT doc_id, text, lang AS label
         |  FROM documents WHERE doc_id % 4 = 0),
         |toks AS (SELECT label, unnest($grams) AS token FROM tr),
         |counts AS (SELECT label, token, count(*) AS cnt
         |           FROM toks GROUP BY 1, 2),
         |totals AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot
         |           FROM counts GROUP BY 1),
         |vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
         |docsc AS (SELECT label, count(*) AS docs_c FROM tr GROUP BY 1),
         |nd AS (SELECT CAST(sum(docs_c) AS BIGINT) AS dt FROM docsc),
         |ci AS (SELECT d.label,
         |    CAST(floor(CAST(d.docs_c * 1048576 AS DOUBLE)
         |      / CAST(dt AS DOUBLE)) AS BIGINT) AS prior,
         |    CAST(floor(CAST(1048576 AS DOUBLE)
         |      / CAST(t.tot + v AS DOUBLE)) AS BIGINT) AS w0
         |  FROM docsc d JOIN totals t ON t.label = d.label, nd, vocab),
         |wt AS (SELECT c.label, c.token,
         |    CAST(floor(CAST((c.cnt + 1) * 1048576 AS DOUBLE)
         |      / CAST(t.tot + v AS DOUBLE)) AS BIGINT) AS w
         |  FROM counts c JOIN totals t ON c.label = t.label, vocab),
         |ho AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
         |occ AS (SELECT doc_id, unnest($grams) AS token FROM ho),
         |pc AS (SELECT o.doc_id, ci.label,
         |    CAST(sum(coalesce(w.w, ci.w0)) AS BIGINT) AS ts
         |  FROM occ o CROSS JOIN ci
         |  LEFT JOIN wt w ON w.token = o.token AND w.label = ci.label
         |  GROUP BY 1, 2),
         |scores AS (SELECT h.doc_id, ci.label,
         |    ci.prior + coalesce(pc.ts, 0) AS score
         |  FROM ho h CROSS JOIN ci
         |  LEFT JOIN pc ON pc.doc_id = h.doc_id AND pc.label = ci.label),
         |pred AS (SELECT doc_id,
         |    (max({'s': score, 'l': label})).l AS pred_label,
         |    CAST(max(score) AS BIGINT) AS best_score
         |  FROM scores GROUP BY doc_id),
         |sec AS (SELECT s.doc_id, CAST(max(s.score) AS BIGINT) AS s2
         |  FROM scores s JOIN pred p USING (doc_id)
         |  WHERE s.label <> p.pred_label GROUP BY s.doc_id)
         |SELECT p.doc_id, p.pred_label, p.best_score,
         |  p.best_score - sec.s2 AS margin
         |FROM pred p JOIN sec USING (doc_id)
         |ORDER BY p.doc_id""".stripMargin
    },

    "q_iceberg_meta" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS shard FROM documents
        |  WHERE doc_id < 300),
        |s1 AS (
        |  SELECT CAST(1 AS BIGINT) AS snapshot, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d WHERE doc_id < 200 GROUP BY shard),
        |s2 AS (
        |  SELECT CAST(2 AS BIGINT) AS snapshot, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d WHERE shard < 2 OR doc_id < 200 GROUP BY shard)
        |SELECT snapshot, shard, CAST(n AS BIGINT) AS n,
        |  CAST(sum_id AS BIGINT) AS sum_id
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
        |ORDER BY snapshot, shard""".stripMargin,

    "q_document_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id < 300),
        |m AS (
        |  SELECT a.doc_id AS media_id, l.t AS lt
        |  FROM d a JOIN d l ON l.doc_id = a.doc_id - a.doc_id % 3),
        |surv AS (
        |  SELECT min(media_id) AS doc_id, count(*) AS n_copies, lt
        |  FROM m GROUP BY lt)
        |SELECT doc_id, doc_id % 4 AS shard,
        |  CAST(n_copies AS BIGINT) AS n_copies,
        |  CAST(len(list_filter(string_split(lt, ' '),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(len(lt) AS BIGINT) AS clean_chars
        |FROM surv ORDER BY doc_id""".stripMargin,

    "q_iceberg_stats_prune" ->
      """SELECT doc_id // 75 AS shard, count(*) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM documents
        |WHERE doc_id BETWEEN 100 AND 220
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_document" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id < 300),
        |m AS (
        |  SELECT a.doc_id AS media_id, l.t AS lt
        |  FROM d a JOIN d l ON l.doc_id = a.doc_id - a.doc_id % 3)
        |SELECT md5(lt) AS fingerprint, min(media_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mp3_probe" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id // 25 AS k
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |f AS (
        |  SELECT doc_id, k,
        |    10 + k % 7 AS n_frames,
        |    k % 2 = 0 AS mpeg1,
        |    1 + k % 14 AS br_idx,
        |    (k // 2) % 3 AS sr_idx
        |  FROM p),
        |g AS (
        |  SELECT doc_id, n_frames,
        |    CASE WHEN mpeg1
        |      THEN [32,40,48,56,64,80,96,112,128,160,192,224,256,320][br_idx]
        |      ELSE [8,16,24,32,40,48,56,64,80,96,112,128,144,160][br_idx]
        |    END AS bitrate_kbps,
        |    CASE WHEN mpeg1 THEN [44100,48000,32000][sr_idx + 1]
        |         ELSE [22050,24000,16000][sr_idx + 1] END AS sample_rate,
        |    CASE WHEN mpeg1 THEN 1152 ELSE 576 END AS spf,
        |    (doc_id // 25) % 3 = 0 AS has_id3
        |  FROM f)
        |SELECT doc_id AS media_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(bitrate_kbps AS BIGINT) AS bitrate_kbps,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(spf AS BIGINT) AS samples_per_frame,
        |  CAST(n_frames * spf * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |  has_id3
        |FROM g ORDER BY media_id""".stripMargin,

    "q_flac_probe" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id // 25 AS k
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |f AS (
        |  SELECT doc_id, k,
        |    [8000,16000,22050,32000,44100,48000][CAST(k % 6 AS INT) + 1]
        |      AS sample_rate,
        |    1 + k % 4 AS channels,
        |    CASE WHEN k % 2 = 0 THEN 16 ELSE 24 END AS bits_per_sample,
        |    1000 + k * 977 AS total_samples
        |  FROM p)
        |SELECT doc_id AS media_id, CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(bits_per_sample AS BIGINT) AS bits_per_sample,
        |  CAST(total_samples AS BIGINT) AS total_samples,
        |  CAST(total_samples * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |  array_to_string(list_transform(range(0, 16),
        |    i -> printf('%02x', (k * 31 + i) % 256)), '') AS md5_hex
        |FROM f ORDER BY media_id""".stripMargin,

    "q_html_meta" ->
      """SELECT doc_id,
        |  'Doc ' || doc_id || ' of ' || source AS title,
        |  source || ' page' AS og_title,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN trim(regexp_replace(substring(coalesce(text, ''), 1, 40),
        |      '\s+', ' ', 'g'))
        |    ELSE '' END AS og_desc
        |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin,

    "q_crossformat_textdedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id < 300),
        |m AS (
        |  SELECT a.doc_id AS media_id, l.t AS lt
        |  FROM d a JOIN d l ON l.doc_id = a.doc_id - a.doc_id % 3)
        |SELECT md5(lt) AS fingerprint, min(media_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_iceberg_deletes" ->
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

    "q_avro_evolution" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS score,
        |  CASE WHEN doc_id % 2 = 0 THEN 'unknown' ELSE lang END AS lang,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "q_exif_orient" ->
      """WITH imgs AS (
        |  SELECT doc_id, (doc_id // 25) % 5 AS g,
        |    1 + (doc_id // 25) % 8 AS o
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |lum AS (
        |  SELECT doc_id, o, list_transform(range(0, 64), j ->
        |    3 * (16 + (g * 47 + ((j % 8) // 2) * 31
        |         + ((6 * (j // 8)) // 16) * 67) % 224)) AS lum
        |  FROM imgs)
        |SELECT doc_id AS media_id, CAST(o AS BIGINT) AS exif_orientation,
        |  CASE WHEN (doc_id // 25) % 4 = 3 THEN 'image/webp'
        |       ELSE 'image/jpeg' END AS modality,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM lum ORDER BY media_id""".stripMargin,

    "q_tiff_decode" ->
      """WITH tiffs AS (
        |  SELECT doc_id, CAST(1 + (doc_id // 25) % 3 AS BIGINT) AS np
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |pg AS (
        |  SELECT doc_id, np, unnest(range(0, np)) AS page_no FROM tiffs),
        |feat AS (
        |  SELECT doc_id, np, page_no,
        |    list_sum(list_transform(range(0, 12), b ->
        |      15 + (doc_id * 41 + page_no * 29 + (b % 4) * 37 + (b // 4) * 71) % 227)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      3 * (15 + (doc_id * 41 + page_no * 29 + ((j % 8) // 2) * 37
        |           + ((6 * (j // 8)) // 16) * 71) % 227)) AS lum
        |  FROM pg)
        |SELECT doc_id AS media_id, page_no, np AS n_pages,
        |  CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(256 * sv AS DOUBLE) / 3072 AS mean_intensity,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id, page_no""".stripMargin,

    "q_docx_extract" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 5 = 2 AND doc_id < 500)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'docx' WHEN 1 THEN 'odt'
        |       ELSE 'rtf' END AS kind,
        |  CAST(ceil(len(string_split(t, ' ')) / 8.0) AS BIGINT)
        |    AS n_paragraphs,
        |  CAST(len(t) AS BIGINT) AS n_chars,
        |  t AS text
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_bzip2_ingest" -> """
      SELECT doc_id, COALESCE(text, '') AS text FROM documents
      ORDER BY doc_id
    """,

    "q_state_store" ->
      """WITH d AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 200 AND doc_id % 10 != 9)
        |SELECT 's' || CAST(doc_id % 3 AS VARCHAR) AS store_name,
        |  't' || CAST(doc_id AS VARCHAR) AS key,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN doc_id * 7 + 1
        |            ELSE doc_id * 7 END AS BIGINT) AS watermark,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS BIGINT) AS run
        |FROM d ORDER BY store_name, key""".stripMargin,

    "q_metrics_wire" ->
      """WITH m AS (
        |  SELECT source, lang, COUNT(*) AS docs,
        |    SUM(n_chars) AS total_chars
        |  FROM documents GROUP BY source, lang),
        |g AS (
        |  SELECT 'graphite' AS proto,
        |    'graft.corpus.' ||
        |    regexp_replace(source, '[^A-Za-z0-9_-]', '_', 'g') || '.' ||
        |    regexp_replace(lang, '[^A-Za-z0-9_-]', '_', 'g') ||
        |    '.docs ' || printf('%.4f', CAST(docs AS DOUBLE)) ||
        |    ' 1723766400' AS line
        |  FROM m),
        |i AS (
        |  SELECT 'influx' AS proto,
        |    'corpus_stats,source=' || source || ',lang=' || lang ||
        |    ' total_chars=' || CAST(total_chars AS VARCHAR) || 'i,docs=' ||
        |    printf('%.4f', CAST(docs AS DOUBLE)) ||
        |    ' 1723766400000000000' AS line
        |  FROM m)
        |SELECT proto, line FROM g
        |UNION ALL SELECT proto, line FROM i
        |ORDER BY proto, line""".stripMargin,

    "q_mixed_corpus_drop" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id < 240)
        |SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'text/html' WHEN 1 THEN 'application/pdf'
        |    WHEN 2 THEN 'application/docx' WHEN 3 THEN 'application/odt'
        |    WHEN 4 THEN 'text/rtf' ELSE 'text/plain' END AS modality,
        |  t AS text
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_xz_ingest" ->
      """WITH f AS (SELECT unnest(range(0, 13)) AS k),
        |l AS (SELECT k, unnest(range(0, 20 + 5 * k)) AS i FROM f),
        |w AS (SELECT k, i, unnest(range(0, 5 + (i % 7))) AS j FROM l),
        |words AS (
        |  SELECT k, i,
        |    string_agg('w' || CAST((k * 31 + i * 17 + j * 13) % 101
        |      AS VARCHAR), ' ' ORDER BY j) AS ws
        |  FROM w GROUP BY k, i)
        |SELECT k AS fixture_id, i AS line_no,
        |  'doc' || CAST(k * 100 + i AS VARCHAR) || chr(9) || ws AS line
        |FROM words ORDER BY fixture_id, line_no""".stripMargin,

    "q_brotli_ingest" ->
      """WITH f AS (SELECT unnest(range(0, 24)) AS k),
        |l AS (SELECT k, unnest(range(0, 15 + 3 * k)) AS i FROM f),
        |w AS (SELECT k, i, unnest(range(0, 4 + (i % 5))) AS j FROM l),
        |words AS (
        |  SELECT k, i,
        |    string_agg('b' || CAST((k * 37 + i * 19 + j * 11) % 89
        |      AS VARCHAR), ' ' ORDER BY j) AS ws
        |  FROM w GROUP BY k, i)
        |SELECT k, i AS line_no,
        |  'page' || CAST(k * 100 + i AS VARCHAR) || ' ' || ws AS line
        |FROM words ORDER BY k, line_no""".stripMargin,

    "q_pdf_encrypted" ->
      """WITH f AS (SELECT unnest(range(0, 3)) AS k),
        |l AS (SELECT k, unnest(range(0, 8 + k)) AS i FROM f),
        |txt AS (
        |  SELECT k, string_agg(
        |    'enc' || CAST(k AS VARCHAR) || ' line' || CAST(i AS VARCHAR) ||
        |    ' w' || CAST((k * 7 + i * 3) % 50 AS VARCHAR),
        |    ' ' ORDER BY i) AS text
        |  FROM l GROUP BY k)
        |SELECT k,
        |  CASE k WHEN 0 THEN 'r3' WHEN 1 THEN 'r4aes' ELSE 'r6' END
        |    AS revision,
        |  CAST(1 AS BIGINT) AS n_pages, text
        |FROM txt ORDER BY k""".stripMargin,

    "q_cdx_plan" ->
      """WITH sel AS (
        |  SELECT doc_id,
        |    'crawl-' || CAST(doc_id % 4 AS VARCHAR) || '.warc.gz' AS filename,
        |    doc_id * 120 AS off, 100 + (doc_id % 7) * 250 AS len
        |  FROM documents WHERE doc_id % 3 = 0),
        |w AS (
        |  SELECT filename, off, len,
        |    MAX(off + len) OVER (PARTITION BY filename ORDER BY off
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM sel),
        |f AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR off > prev_end + 600
        |                 THEN 1 ELSE 0 END AS ni
        |  FROM w),
        |i AS (
        |  SELECT *, SUM(ni) OVER (PARTITION BY filename ORDER BY off)
        |    AS island
        |  FROM f)
        |SELECT filename, MIN(off) AS range_start,
        |  MAX(off + len) AS range_end,
        |  MAX(off + len) - MIN(off) AS range_bytes,
        |  COUNT(*) AS n_records
        |FROM i GROUP BY filename, island
        |ORDER BY filename, range_start""".stripMargin,

    "q_cdx_dedup_plan" ->
      """WITH idx AS (
        |  SELECT doc_id,
        |    'crawl-' || CAST(doc_id % 4 AS VARCHAR) || '.warc.gz' AS filename,
        |    doc_id * 120 AS off, 100 + (doc_id % 7) * 250 AS len,
        |    md5(CAST(doc_id % 50 AS VARCHAR)) AS digest
        |  FROM documents),
        |win AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY digest
        |    ORDER BY filename, off) AS rn FROM idx),
        |sel AS (SELECT filename, off, len FROM win WHERE rn = 1),
        |w AS (
        |  SELECT filename, off, len,
        |    MAX(off + len) OVER (PARTITION BY filename ORDER BY off
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM sel),
        |f AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR off > prev_end + 150
        |                 THEN 1 ELSE 0 END AS ni FROM w),
        |i AS (
        |  SELECT *, SUM(ni) OVER (PARTITION BY filename ORDER BY off)
        |    AS island FROM f)
        |SELECT filename, MIN(off) AS range_start,
        |  MAX(off + len) AS range_end,
        |  MAX(off + len) - MIN(off) AS range_bytes,
        |  COUNT(*) AS n_records
        |FROM i GROUP BY filename, island
        |ORDER BY filename, range_start""".stripMargin,

    "q_robots_meta" ->
      """SELECT doc_id,
        |  (doc_id % 6) IN (0, 2, 4) AS noindex,
        |  (doc_id % 6) IN (0, 1, 2) AS nofollow
        |FROM documents WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,

    "q_exif_scrub" ->
      """WITH imgs AS (
        |  SELECT doc_id, doc_id // 25 AS k
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |lum AS (
        |  SELECT doc_id, k, list_transform(range(0, 64), j ->
        |    3 * (18 + (k * 53 + ((j % 8) // 2) * 29
        |         + ((6 * (j // 8)) // 16) * 61) % 220)) AS lum
        |  FROM imgs)
        |SELECT doc_id AS media_id,
        |  CASE WHEN k % 4 = 3 THEN 'image/webp' ELSE 'image/jpeg' END
        |    AS modality,
        |  k % 2 = 0 AS had_gps,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM lum ORDER BY media_id""".stripMargin
  )
}
