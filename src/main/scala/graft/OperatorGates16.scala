package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 operator gates: Iceberg partition-spec evolution (the one
  * interop edge the r13 reader still threw on).
  */
object OperatorGates16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** [[OperatorGates15.buildMiniCrawl]] with the index's `mime`
    * column (all real captures are text/html; revisit rows add their
    * own `warc/revisit` marker).
    */
  private def buildMiniCrawlMime(s: SparkSession, dir: String,
      warcDir: String): DataFrame =
    OperatorGates15.buildMiniCrawl(s, dir, warcDir)
      .withColumn("mime", lit("text/html"))

  def queries16: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Iceberg PARTITION-SPEC EVOLUTION (spec v2): snapshot 1
    //     mirrors under spec 0 = identity(shard); snapshot 2 rewrites
    //     shard 1 and mirrors it under a NEW identity(region) spec
    //     (spec 2, fresh partition field-id) while the untouched
    //     manifests are carried under spec 0 — the mixed-spec
    //     manifest list a foreign writer's spec change produces. The
    //     independent reader resolves each manifest's partition type
    //     through its own partition_spec_id (probe 1: time travel to
    //     the pre-evolution snapshot; probe 2: current mixed-spec
    //     snapshot; probe 3: partition pruning across BOTH spec
    //     domains at once — native "0" and evolved "11"). Oracle
    //     replays all three visibilities --------------------------
    "q_iceberg_spec_evolution" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_specevo").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 240)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
          (lit(10) + pmod(col("doc_id"), lit(4))).cast("long").as("region"))
      val v1 = table.commit(docs, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v1) // spec 0: identity(shard)
      // evolution: shard 1 rewritten (ids shifted so visibility is
      // provable), its new manifest rides identity(region) — region
      // is shard-constant, satisfying the single-valued-file rule
      val v2 = table.commit(
        docs.filter(col("shard") === 1)
          .withColumn("doc_id", col("doc_id") + 1000),
        touched = Seq("1"))
      IcebergMeta.mirror(s, table, v2, specPartCol = Some("region"))
      def probe(snap: Option[Long], parts: Option[Seq[String]], label: Int) =
        IcebergMeta.read(s, s"$tmp/t", snapshotId = snap,
            partitions = parts)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
          .select(lit(label.toLong).as("probe"), col("shard"),
            col("n"), col("sum_id"))
      probe(Some(1L), None, 1)
        .unionByName(probe(None, None, 2))
        .unionByName(probe(None, Some(Seq("0", "11")), 3))
        .orderBy(col("probe"), col("shard"))
    }),

    // --- WARC `warc/revisit` semantics in cdxfetch: real Common
    //     Crawl indexes carry revisit rows — dedup'd captures whose
    //     digest names an ORIGINAL payload (usually in an EARLIER
    //     crawl's files). They must never be fetched and never win
    //     digest dedup. The planted revisits all point at a file that
    //     DOES NOT EXIST (and one sorts lexically before every real
    //     capture, so a missing mime filter would make it the dedup
    //     winner) — any wrong fetch fails loudly, and the ledger must
    //     equal the revisit-free recompute VERBATIM ----------------
    "q_cdxfetch_revisit" -> ((s, dir) => {
      import s.implicits._
      import graft.runner.JobConfig
      val tmp = java.nio.file.Files
        .createTempDirectory("q_cdxrevisit").toString
      val warcDir = s"$tmp/warc"
      val cdx = buildMiniCrawlMime(s, dir, warcDir)
      def md5(p: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(p.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      def payload(ck: Long): String =
        s"<html><p>page c$ck body w${ck * 7 % 50}</p></html>"
      val revisits =
        // re-captures of epoch-1 content arriving in epoch 2
        (0L until 40L).map { d =>
          (s"https://site$d.example/p", md5(payload(d)),
            "a-revisits-old-crawl.warc.gz", 1000L + d, 200L, 280L + d,
            "warc/revisit")
        } ++
        // revisits whose digest ALSO arrives as a fresh response in
        // the SAME delta: the response must win dedup
        (120L until 240L by 15L).map { d =>
          (s"https://site$d.example/p-re", md5(payload(40 + d % 40)),
            "a-revisits-old-crawl.warc.gz", 2000L + d, 200L, 320L + d,
            "warc/revisit")
        } ++
        // a digest visible ONLY through a revisit (original lives in
        // an older crawl): skipped, absent from the ledger
        Seq(("https://site9999.example/p", "00" * 16,
          "a-revisits-old-crawl.warc.gz", 9000L, 200L, 500L,
          "warc/revisit"))
      val all = cdx.unionByName(revisits
        .toDF("url", "digest", "filename", "offset", "length", "seq",
          "mime"))
      val props = JobConfig.parse(
        s"""job.type=cdxfetch
           |job.name=cdxfetch_revisit_gate
           |source.path=$tmp/src
           |cdx.warcDir=$warcDir
           |cdx.maxGap=512
           |cdx.shards=8
           |sink.output=$tmp/ledger
           |state.dir=$tmp/wm
           |""".stripMargin)
      all.filter(col("seq") < 120).write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      all.filter(col("seq") >= 120).write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      // max seq = 320 + 225 (the last same-delta revisit row)
      require(r2("published") == "true" && r2("highWatermark") == "545",
        s"epoch 2 failed: $r2")
      new graft.sink.ShardedTable(s"$tmp/ledger", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s)
        .select(col("digest"), col("url"), col("seq"), col("n_chars"))
        .orderBy(col("digest"))
    }),

    // --- CDX index GENERATION (job.type=cdxindex, the PRODUCER side
    //     of cdxfetch): a crawl with no published index becomes
    //     consumable by indexing its .warc.gz store once. The built
    //     index must agree with the WRITER's ground truth (url,
    //     digest, member length, WARC-Date ts, mime) at every
    //     (filename, offset) identity — and then DRIVE cdxfetch end
    //     to end: warc store -> cdxindex -> cdxfetch -> the exact
    //     ledger a full recompute produces ------------------------
    "q_cdx_index_build" -> ((s, dir) => {
      import graft.runner.JobConfig
      val tmp = java.nio.file.Files
        .createTempDirectory("q_cdxindex").toString
      val warcDir = s"$tmp/warc"
      val fixture = OperatorGates15.buildMiniCrawl(s, dir, warcDir)
      val r0 = JobConfig.runAny(s, JobConfig.parse(
        s"""job.type=cdxindex
           |job.name=cdxindex_gate
           |cdx.warcDir=$warcDir
           |cdx.digest=md5
           |sink.output=$tmp/index
           |""".stripMargin))
      require(r0("published") == "true", s"index build failed: $r0")
      val built = s.read.parquet(s"$tmp/index")
      val nF = fixture.count()
      require(r0("rowsWritten") == nF.toString,
        s"built ${r0("rowsWritten")} rows, writer ground truth has $nF")
      val joined = built.join(
        fixture.select(col("url").as("f_url"),
          col("digest").as("f_digest"), col("length").as("f_len"),
          col("seq"), col("filename"), col("offset")),
        Seq("filename", "offset"))
      require(joined.count() == nF, "identity join lost rows")
      require(joined.filter(col("url") =!= col("f_url") ||
        col("digest") =!= col("f_digest") ||
        col("length") =!= col("f_len") ||
        col("ts") =!= "20260101000000" ||
        col("mime") =!= "text/html" ||
        col("status") =!= 200 ||
        col("urlkey") =!= graft.operators.CdxIndex.surt(col("url")))
        .isEmpty, "built index disagrees with the writer's ground truth")
      // the built index (fixture seq attached per identity) now
      // drives the consumer job — self-indexing ingestion
      joined.select("url", "digest", "filename", "offset", "length",
        "seq").write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, JobConfig.parse(
        s"""job.type=cdxfetch
           |job.name=cdxindex_fetch_gate
           |source.path=$tmp/src
           |cdx.warcDir=$warcDir
           |cdx.maxGap=512
           |cdx.shards=8
           |sink.output=$tmp/ledger
           |state.dir=$tmp/wm
           |""".stripMargin))
      require(r1("published") == "true", s"fetch epoch failed: $r1")
      new graft.sink.ShardedTable(s"$tmp/ledger", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s)
        .select(col("digest"), col("url"), col("seq"), col("n_chars"))
        .orderBy(col("digest"))
    }),

    // --- PRODUCTION-SHAPED audio fingerprint (the toy gates use
    //     2-sample windows; real clips carry many samples per
    //     window): 4160-sample clips = 64 samples in EVERY one of the
    //     65 energy windows, minSamples enforcing exactly that floor,
    //     containers rotating WAV16 / FLAC16 / 24-bit FLAC (the
    //     archival depth — norm16 cancels its shift exactly, so the
    //     same recording collapses across depths at this shape too).
    //     Oracle replays samples → 64-sample window energies → bits →
    //     hash-equality groups ------------------------------------
    "q_audio_fp_production" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{FlacAudio, Multimodal}
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          val g = (d % 20).toInt
          val pcm = Array.tabulate(4160)(tt =>
            ((g + 1) * (tt + 11) * 131) % 4001 - 2000)
          val bytes = (d % 3) match {
            case 1 => FlacAudio.encode(8000, 1, 16, pcm, blockSize = 512)
            case 2 => FlacAudio.encode(8000, 1, 24, pcm.map(_ << 8),
              blockSize = 512)
            case _ => Multimodal.WavCodec.synthesizeDepth(8000, 1, 16, pcm)
          }
          (d, bytes)
        }).toDF("media_id", "content")
      val fp = Multimodal
        .fingerprintAudio(media, windows = 65, minSamples = 4160).toDF()
      // representative per ahash group via a window min — the previous
      // self-join (fp ⋈ fp.groupBy(ahash)) evaluated the whole
      // encode+fingerprint pipeline twice; same rows, one pass
      fp.select(col("media_id"),
          min(col("media_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("ahash")))
            .as("rep"))
        .orderBy(col("media_id"))
    }))

  def oracleSql16: Map[String, String] = Map(

    // revisits add NOTHING: the ledger equals the revisit-free
    // recompute verbatim
    "q_cdxfetch_revisit" -> OperatorGates15.cdxLedgerOracle,

    // the self-indexed SINGLE-epoch chain: originals and recaptures
    // share one delta, so the per-URL winner keeps only the original
    // capture — the ledger is exactly the ck winners
    "q_cdx_index_build" ->
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
        |  FROM p)
        |SELECT md5(payload) AS digest,
        |  'https://site' || d || '.example/p' AS url,
        |  CAST(d AS BIGINT) AS seq,
        |  CAST(length(payload) AS BIGINT) AS n_chars
        |FROM w WHERE rn = 1 ORDER BY digest""".stripMargin,

    "q_iceberg_spec_evolution" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS shard FROM documents
        |  WHERE doc_id < 240),
        |d2 AS (
        |  SELECT CASE WHEN shard = 1 THEN doc_id + 1000 ELSE doc_id END
        |    AS doc_id, shard
        |  FROM d),
        |p1 AS (
        |  SELECT CAST(1 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d GROUP BY shard),
        |p2 AS (
        |  SELECT CAST(2 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d2 GROUP BY shard),
        |p3 AS (
        |  SELECT CAST(3 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d2 WHERE shard IN (0, 1) GROUP BY shard)
        |SELECT probe, CAST(shard AS BIGINT) AS shard,
        |  CAST(n AS BIGINT) AS n, CAST(sum_id AS BIGINT) AS sum_id
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |  UNION ALL SELECT * FROM p3) u
        |ORDER BY probe, shard""".stripMargin,

    "q_audio_fp_production" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 20 AS g FROM documents),
        |en AS (
        |  SELECT doc_id, list_transform(range(0, 65), w ->
        |    list_sum(list_transform(range(0, 64), i ->
        |      abs(((g + 1) * ((w * 64 + i) + 11) * 131) % 4001 - 2000))))
        |    AS en
        |  FROM d),
        |bits AS (
        |  SELECT doc_id, list_transform(range(0, 64), j ->
        |    CASE WHEN en[j + 2] > en[j + 1] THEN 1 ELSE 0 END) AS b
        |  FROM en),
        |hh AS (SELECT doc_id, array_to_string(b, '') AS hs FROM bits),
        |rep AS (SELECT hs, min(doc_id) AS rep FROM hh GROUP BY hs)
        |SELECT h.doc_id AS media_id, r.rep AS rep
        |FROM hh h JOIN rep r USING (hs)
        |ORDER BY media_id""".stripMargin)
}
