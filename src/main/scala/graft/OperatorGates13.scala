package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 session-5 tier: multi-tenant dag scheduling (the
  * reference's DagManager/UserQuotaManager semantics as a
  * deterministic virtual-time engine whose full event trace a DuckDB
  * recursive CTE replays tick for tick), zone-map data skipping on
  * the sharded-table manifest, zstd-compressed text ingestion, URL
  * canonicalization, and the crawl-planning family: fetch-list
  * generation, crawl-delay-aware fetch scheduling, anchor-text
  * aggregation, redirect-chain resolution, full sitemap entries, the
  * incremental frontier job, a curriculum training order, and the
  * q_crawl_plan flagship chain.
  */
object OperatorGates13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Scheduler workload shared by the gate and (re-derived) by the
    * oracle: one diamond dag (a → {b, c} → d) per nation key < 8.
    * Users rotate mod 3 (u0/u1 own three dags each, so launches
    * overflow the user quota and quota-fail), groups alternate mod 2,
    * dag 4 submits first with a long root and a 4-tick SLA (its root
    * is killed MID-RUN, the rest cancel), task b fails once on
    * k%4==1 (retry succeeds) and always on k%4==3, task c always on
    * k%4==2 (attempt exhaustion → the failure options diverge:
    * FINISH_RUNNING cancels pending siblings, FINISH_ALL_POSSIBLE
    * finishes what it can).
    */
  private[graft] def dagWorkload(s: SparkSession, dir: String)
      : Seq[graft.runner.DagScheduler.DagTask] = {
    import graft.runner.DagScheduler.DagTask
    val keys = t(s, dir, "nation")
      .filter(col("n_nationkey") < 8)
      .select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq // 8 rows of metadata
    val shape = Seq(("a", Seq.empty[String], 0), ("b", Seq("a"), 1),
      ("c", Seq("a"), 2), ("d", Seq("b", "c"), 3))
    keys.flatMap { k =>
      shape.map { case (task, deps, pos) =>
        DagTask(
          dag = s"dag$k", task = task,
          user = s"u${k % 3}", group = s"g${k % 2}",
          dependsOn = deps,
          duration = if (k == 4 && task == "a") 4 else (1 + (k + pos) % 2).toInt,
          failAttempts =
            if (task == "b" && k % 4 == 1) 1
            else if (task == "b" && k % 4 == 3) 9
            else if (task == "c" && k % 4 == 2) 9
            else 0,
          maxAttempts = 2,
          submitTick = if (k == 4) 0 else k % 3,
          slaTicks = if (k == 4) 4 else -1,
          failureOption =
            if (k % 2 == 0) "FINISH_RUNNING" else "FINISH_ALL_POSSIBLE")
      }
    }
  }

  /** WebP fixture value: channel `c` of 16x16 block `(bx, by)` for
    * image `d` — the oracle restates it.
    */
  private def webpValue(d: Long, c: Int, bx: Int, by: Int): Int =
    (11 + (d * 31 + c * 59 + bx * 47 + by * 71) % 227).toInt

  /** Deterministic VP8L fixture for doc `d`: 64x48 RGB, constant
    * 16x16 blocks, encoded by [[graft.operators.WebpCodec.encodeLossless]]
    * (lossless, so the oracle replays dims, exact channel sums, and
    * the 64-bit aHash analytically).
    */
  private[graft] def synthWebp(d: Long): Array[Byte] = {
    val px = new Array[Byte](64 * 48 * 3)
    var y = 0
    while (y < 48) {
      var x = 0
      while (x < 64) {
        var c = 0
        while (c < 3) {
          px((y * 64 + x) * 3 + c) = webpValue(d, c, x / 16, y / 16).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    graft.operators.WebpCodec.encodeLossless(64, 48, 3, px)
  }

  /** Animated-WebP fixture value: gray level of 16x16 block `(bx, by)`
    * as painted by frame `f` (f = 0 is the full-canvas base) — the
    * oracle restates it.
    */
  private def webpAnimValue(d: Long, f: Int, bx: Int, by: Int): Int =
    (9 + (d * 23 + f * 29 + bx * 31 + by * 61) % 233).toInt

  /** Animated VP8L fixture for doc `d`: 64x48 canvas, 2-4 frames;
    * frame 0 paints the full canvas (constant 16x16 blocks), each
    * later frame overwrites ONE block-aligned 16x16 rect at
    * `((f*7 + d/25) % 4, (f*11) % 3)` — so composited frame f is the
    * base with the latest paint per block, which the oracle replays
    * with a last-painter scan.
    */
  private[graft] def synthAnimWebp(d: Long): Array[Byte] = {
    import graft.operators.WebpCodec
    val nf = (2 + (d / 25) % 3).toInt
    def gray(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val b = v(i % w, i / w).toByte
        px(i * 3) = b; px(i * 3 + 1) = b; px(i * 3 + 2) = b
        i += 1
      }
      px
    }
    val frames = (0 until nf).map { f =>
      if (f == 0)
        WebpCodec.AnimFrameSpec(0, 0, 64, 48, 40, noBlend = true,
          disposeBg = false,
          gray(64, 48, (x, y) => webpAnimValue(d, 0, x / 16, y / 16)))
      else {
        val bx = ((f * 7 + d / 25) % 4).toInt
        val by = (f * 11) % 3
        WebpCodec.AnimFrameSpec(bx * 16, by * 16, 16, 16, 40 + 10 * f,
          noBlend = true, disposeBg = false,
          gray(16, 16, (_, _) => webpAnimValue(d, f, bx, by)))
      }
    }
    WebpCodec.encodeAnim(64, 48, loopCount = 0, frames)
  }

  /** Shared synthetic two-level sitemap world over `docs`: per
    * (source, j = doc_id % 3) child `<urlset>` (optional lastmod by
    * doc_id % 5) + per-source `<sitemapindex>` listing the children
    * (optional lastmod by j % 2). Both q_sitemap_index and
    * q_sitemap_discovery's oracles restate the formulas.
    */
  private def sitemapWorld(docs: DataFrame): (DataFrame, DataFrame) = {
    val children = docs
      .withColumn("j", pmod(col("doc_id"), lit(3)).cast("int"))
      .groupBy(col("source"), col("j"))
      .agg(concat(
        lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
        concat_ws("\n", sort_array(collect_list(concat(
          lit("  <url><loc> https://www."), col("source"),
          lit(".example.com/p/"), col("doc_id"), lit("?a=1&amp;b=2 </loc>"),
          when(pmod(col("doc_id"), lit(5)) =!= 0,
            concat(lit("<lastmod>2024-0"),
              lit(1) + pmod(col("doc_id"), lit(9)),
              lit("-15</lastmod>"))).otherwise(lit("")),
          lit("</url>"))))),
        lit("\n</urlset>")).as("xml"))
      .withColumn("child_url",
        concat(lit("https://www."), col("source"),
          lit(".example.com/sitemap"), col("j"), lit(".xml")))
    val index = children.groupBy(col("source"))
      .agg(concat(
        lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
        concat_ws("\n", sort_array(collect_list(concat(
          lit("  <sitemap><loc> "), col("child_url"), lit(" </loc>"),
          when(pmod(col("j"), lit(2)) === 0,
            concat(lit("<lastmod>2024-1"), col("j"),
              lit("-01</lastmod>"))).otherwise(lit("")),
          lit("</sitemap>"))))),
        lit("\n</sitemapindex>")).as("index_xml"))
    (children, index)
  }

  def queries13: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- crawl DISCOVERY chain (Robots.sitemapsTable +
    //     sitemapIndexEntries + sitemapEntries): robots.txt `Sitemap:`
    //     lines seed the per-domain index fetch (domains whose robots
    //     carry no Sitemap line never enter), the index resolves to
    //     child urlsets, the children explode to URLs — the 3-level
    //     path a crawler actually walks. Oracle replays all levels -----
    "q_sitemap_discovery" -> ((s, dir) => {
      import graft.functions.Text
      import graft.operators.Robots
      val docs = t(s, dir, "documents").filter(col("doc_id") < 250)
      val srcs = docs.select(col("source")).distinct()
        .withColumn("i", substring(col("source"), 4, 10).cast("int"))
      val robots = srcs.select(
        concat(lit("www."), col("source"), lit(".example.com")).as("domain"),
        concat(
          lit("# crawl policy\nUser-agent: *\nDisallow: /private/\n" +
            "Crawl-delay: 2\n"),
          when(pmod(col("i"), lit(5)) =!= 0,
            concat(lit("Sitemap: https://www."), col("source"),
              lit(".example.com/sitemap_index.xml\n"))).otherwise(lit("")))
          .as("content"))
      val discovered = Robots.sitemapsTable(robots, "domain", "content")
      val (children, index) = sitemapWorld(docs)
      val indexed = index.withColumn("index_url",
        concat(lit("https://www."), col("source"),
          lit(".example.com/sitemap_index.xml")))
      val level1 = discovered
        .join(indexed, discovered("sitemap_url") === indexed("index_url"))
        .select(col("domain"),
          explode(Text.sitemapIndexEntries(col("index_xml"))).as("sm"))
        .select(col("domain"), col("sm.url").as("child_sitemap"))
      level1
        .join(children.select(col("child_url"), col("xml")),
          col("child_sitemap") === col("child_url"))
        .select(col("domain"), col("child_sitemap"),
          explode(Text.sitemapEntries(col("xml"))).as("e"))
        .select(col("domain"), col("child_sitemap"),
          col("e.url").as("url"), col("e.lastmod").as("lastmod"))
        .orderBy(col("domain"), col("url"))
    }),

    // --- REAL animated-WebP decode (WebpCodec.decodeAnim): ANMF
    //     sub-rect frames composited on executors (overwrite blend,
    //     even-aligned rects); lossless, so the oracle replays every
    //     composited frame's exact mean and 64-bit aHash by scanning
    //     for each block's LAST painter ---------------------------------
    "q_webp_anim" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthAnimWebp(id))))
        .toDF("media_id", "content")
      Multimodal.decodeWebpAnimFrames(media).toDF()
        .select(col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("duration_ms").cast("long").as("duration_ms"),
          col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"), col("frame_no"))
    }),

    // --- REAL lossy WebP (VP8 keyframe) decode (Vp8 via WebpCodec):
    //     committed libwebp-encoded fixtures (segmentation, token
    //     partitions, loop filter all exercised — Scala cannot encode
    //     VP8, so fixtures are checked-in bytes) fully decoded on
    //     executors; the oracle's plane sums are LIBWEBP's own
    //     WebPDecodeYUV output pinned at fixture-generation time, so
    //     a green row == byte-exact independent ground truth ----------
    "q_webp_lossy" -> ((s, dir) => {
      import s.implicits._
      val fixtures = (0 until 6).map { i =>
        val in = getClass.getResourceAsStream(s"/graft/vp8/fixture_$i.webp")
        require(in != null, s"missing vp8 fixture $i")
        val bytes = in.readAllBytes(); in.close()
        (i.toLong, bytes)
      }
      fixtures.toDF("fixture_id", "content")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, c) =>
          val f = graft.operators.WebpCodec.decodeYuv(id, c)
          def sum(a: Array[Byte]): Long = {
            var t = 0L
            var i = 0
            while (i < a.length) { t += (a(i) & 0xff); i += 1 }
            t
          }
          (id, f.width.toLong, f.height.toLong, sum(f.y), sum(f.u), sum(f.v))
        })
        .toDF("fixture_id", "width", "height", "y_sum", "u_sum", "v_sum")
        .orderBy(col("fixture_id"))
    }),

    // --- REAL WebP (VP8L lossless) decode (WebpCodec): count-bounded
    //     fixtures (20 images at every SF) sniffed and routed through
    //     the SAME decodeAuto/aHashAuto dispatch as the other image
    //     formats (the codec itself is interop-pinned against the
    //     system libwebp in WebpSpec, transforms and all); VP8L is
    //     lossless so the oracle replays dims, exact channel sums,
    //     IEEE mean division, and the 64-bit aHash analytically --------
    "q_webp_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthWebp(id))))
        .toDF("media_id", "content")
      Multimodal.decodeAuto(media).toDF()
        .join(Multimodal.aHashAuto(media).toDF()
          .select(col("media_id"), col("ahash")), Seq("media_id"))
        .select(col("media_id"), col("modality"),
          col("n_units"), col("mean_val"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"))
    }),


    // --- multi-tenant dag scheduling: 8 diamond dags through 3
    //     executor slots under user quota 2 / group quota 3, with
    //     retries, a permanent failure under each failure option, an
    //     SLA kill, and a launch-time quota failure. The oracle
    //     replays the synchronous-update transition rule tick for
    //     tick in a recursive CTE and derives the identical event
    //     trace from the state transitions ---------------------------
    "q_dag_schedule" -> ((s, dir) => {
      import graft.runner.DagScheduler
      DagScheduler.scheduleDF(s, dagWorkload(s, dir),
          DagScheduler.SchedulerConfig(slots = 3, userQuota = 2,
            groupQuota = 3, horizon = 40))
        .orderBy(col("tick"), col("dag"), col("task"), col("event"))
    }),

    // --- zone-map data skipping: documents committed to a
    //     ShardedTable in ingest-order shards (doc_id/64) with
    //     manifest-level min/max stats on doc_id and lang; a range
    //     read opens ONLY shards whose zone intersects [100, 300]
    //     (pruning proven file-level in ZoneMapSpec) and the residual
    //     filter makes the result exactly the SQL range scan ---------
    "q_zonemap_scan" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("q_zonemap").toString
      val table = new sink.ShardedTable(s"$tmp/zt", "shard",
        s.sparkContext.hadoopConfiguration)
      val sharded = t(s, dir, "documents")
        .withColumn("shard", (col("doc_id") / 64).cast("long"))
      val shards = sharded.select("shard").distinct()
        .collect().map(_.getLong(0).toString).toSeq // nDocs/64 shard ids
      table.commit(sharded, shards, statsCols = Seq("doc_id", "lang"))
      table.readRange(s, "doc_id", Some("100"), Some("300"))
        .filter(col("doc_id").between(100, 300))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- zone-map skipping on a TIMESTAMP column: events committed
    //     day-sharded with ts (epoch-micros stats) + value (double
    //     stats); a 3-day range read prunes to the intersecting day
    //     shards (typed pruning proven file-level in ZoneMapSpec) and
    //     the residual filter makes it exactly the SQL range scan ------
    "q_zonemap_ts" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("q_zonemap_ts").toString
      val table = new sink.ShardedTable(s"$tmp/zt", "shard",
        s.sparkContext.hadoopConfiguration)
      val sharded = t(s, dir, "events")
        .withColumn("shard", dayofmonth(col("ts")).cast("long"))
      val shards = sharded.select("shard").distinct()
        .collect().map(_.getLong(0).toString).toSeq // one id per day
      table.commit(sharded, shards, statsCols = Seq("ts", "value"))
      def mic(iso: String): Long =
        java.time.Instant.parse(iso).toEpochMilli * 1000L
      table.readRange(s, "ts",
          Some(mic("2024-01-10T00:00:00Z").toString),
          Some((mic("2024-01-13T00:00:00Z") - 1L).toString))
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // --- zstd ingestion: documents packed 10-per-file as
    //     "id\ttext" lines, zstd-compressed (zstd-jni — the codec on
    //     every Spark executor), then ingested back through the
    //     ZstdDecompress expression + line/field splits. The
    //     round-trip must be lossless; CLI interop is pinned in
    //     ZstdSpec against the system zstd binary ---------------------
    "q_zstd_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.{ZstdBytes, ZstdDecompress}
      val packed = t(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .groupByKey(_._1 / 10)
        .mapGroups { (fid, it) =>
          val lines = it.toSeq.sortBy(_._1)
            .map { case (id, text) => s"$id\t$text" }.mkString("\n")
          (fid, ZstdBytes.compress(
            lines.getBytes(java.nio.charset.StandardCharsets.UTF_8), 3))
        }
        .toDF("file_id", "content")
      packed
        .select(explode(split(ZstdDecompress(col("content")).cast("string"),
          "\n")).as("line"))
        .select(
          split(col("line"), "\t").getItem(0).cast("long").as("doc_id"),
          split(col("line"), "\t").getItem(1).as("text"))
        .orderBy(col("doc_id"))
    }),

    // --- URL canonicalization: deterministic variants (scheme/host
    //     case, default + explicit ports, missing paths, shuffled and
    //     tracking-polluted query strings, fragments) collapse to one
    //     canonical form per logical page; the dedup keys on it. The
    //     oracle rebuilds the SAME variants and replays every
    //     canonicalization rule in SQL --------------------------------
    "q_url_canonical" -> ((s, dir) => {
      import graft.functions.Text
      val k = col("doc_id")
      val url = concat(
        when(pmod(k, lit(2)) === 0, "HTTP").otherwise("https"), lit("://"),
        concat(lit("Ex"), pmod(k, lit(7)), lit(".CoM")),
        when(pmod(k, lit(3)) === 0,
            when(pmod(k, lit(2)) === 0, ":80").otherwise(":443"))
          .when(pmod(k, lit(3)) === 1,
            when(pmod(k, lit(2)) === 0, ":8080").otherwise(":8443"))
          .otherwise(""),
        when(pmod(k, lit(4)) === 0, "").otherwise(concat(lit("/P"), pmod(k, lit(5)))),
        when(pmod(k, lit(5)) === 0, "?b=2&a=1")
          .when(pmod(k, lit(5)) === 1, "?a=1&b=2")
          .when(pmod(k, lit(5)) === 2, "?utm_source=tw&a=1")
          .when(pmod(k, lit(5)) === 3, "?a=1&utm_campaign=x&")
          .otherwise(""),
        when(pmod(k, lit(2)) === 0, concat(lit("#sec"), pmod(k, lit(3)))).otherwise(""))
      t(s, dir, "documents").select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), Text.canonicalizeUrl(col("url")).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("canonical"))
    }),

    // --- Nutch-Generator fetch-list selection: scored frontier (one
    //     URL per doc, host = source), per-host politeness cap 10,
    //     global top-150 via the GlobalOrder range exchange (NOT
    //     orderBy.limit), post-selection per-host fetch slots. The
    //     oracle replays both windows and the truncation ---------------
    "q_fetch_list" -> ((s, dir) => {
      val f = t(s, dir, "documents").select(
        concat(lit("http://"), col("source"), lit("/p"), col("doc_id")).as("url"),
        col("source").as("host"),
        pmod(col("doc_id") * 37, lit(1000)).as("score"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=canonicalizeUrl,fetchList
          |op.canonicalizeUrl.column=url
          |op.fetchList.urlColumn=url
          |op.fetchList.hostColumn=host
          |op.fetchList.scoreColumn=score
          |op.fetchList.topN=150
          |op.fetchList.maxPerHost=10
          |""".stripMargin))
      ops.foldLeft(f)((d, op) => op(d))
        .select(col("url"), col("host"), col("score"),
          col("sel_rank"), col("fetch_slot"))
        .orderBy(col("sel_rank"))
    }),

    // --- LinkDb anchor-text aggregation over the corpus link graph
    //     (same head-block edge rule as q_link_rank; the anchor is the
    //     linking doc's first word): per target, total inlinks,
    //     distinct anchors, and the top-3 "anchor:count" string --------
    "q_anchor_text" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val heads = docs.select(col("doc_id").as("head_id"),
        col("source").as("dst"))
      val links = docs
        .withColumn("head_id", col("doc_id") -
          pmod(col("doc_id"), lit(2) + pmod(col("doc_id"), lit(5))))
        .join(heads, "head_id")
        .select(col("dst"), split(col("text"), " ").getItem(0).as("anchor"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=anchorText
          |op.anchorText.dstColumn=dst
          |op.anchorText.anchorColumn=anchor
          |op.anchorText.k=3
          |""".stripMargin))
      ops.foldLeft(links)((d, op) => op(d)).orderBy(col("dst"))
    }),

    // --- FLAGSHIP crawl-plan chain: tracking-polluted discovered URLs
    //     (3 variants per doc) → canonicalize → URL-dedup (first doc
    //     wins) → scored frontier (score = winning doc's n_chars %
    //     1000) → politeness fetch list (top-100, ≤5/host). One oracle
    //     replays the whole chain ------------------------------------
    "q_crawl_plan" -> ((s, dir) => {
      import graft.functions.Text
      import graft.operators.CrawlFrontier
      val k = col("doc_id")
      val base = concat(lit("http://h"), pmod(k, lit(23)), lit(".com/d"), k)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val discovered = docs.select(col("doc_id"), col("n_chars"),
          explode(array(
            concat(base, lit("?utm_source=a")),
            concat(base, lit("?ref=2&utm_medium=b#frag")),
            concat(lit("HTTP://H"), pmod(k, lit(23)), lit(".COM:80/d"), k,
              lit("?ref=2")))).as("url"))
      val canon = discovered
        .select(col("doc_id"), col("n_chars"),
          Text.canonicalizeUrl(col("url")).as("url"))
        .groupBy(col("url"))
        .agg(min_by(struct(col("doc_id"), col("n_chars")), col("doc_id")).as("w"))
        .select(col("url"), col("w.doc_id").as("doc_id"),
          pmod(col("w.n_chars"), lit(1000)).as("score"),
          regexp_extract(col("url"), "^http://([^/]*)", 1).as("host"))
      CrawlFrontier.generateFetchList(canon, "url", "host", "score",
          topN = 100, maxPerHost = 5)
        .select(col("url"), col("host"), col("doc_id"), col("score"),
          col("sel_rank"), col("fetch_slot"))
        .orderBy(col("sel_rank"))
    }),

    // --- outlink extraction (Text.outlinks): anchor hrefs with
    //     rel=nofollow detection across quote styles, attribute order,
    //     case, and multi-token rel values; nofollow must match as a
    //     whole TOKEN (rel="nofollowme" is follow); unquoted href/rel
    //     values parse; href-less anchors skipped. The link-graph
    //     feed (nofollow must not confer rank) -----------------------
    "q_outlinks" -> ((s, dir) => {
      import graft.functions.Text
      val k = col("doc_id")
      val html = concat(
        lit("<p>body</p><a href=\"http://t1/"), k, lit("\">a</a>"),
        lit("<a rel=\"nofollow\" href='http://t2/"), pmod(k, lit(7)),
        lit("'>b</a>"),
        lit("<A HREF=\"http://t3/"), pmod(k, lit(3)),
        lit("?x=1&amp;y=2\" REL=\"me nofollow\">c</A>"),
        lit("<a rel=\"nofollowme\" href=\"http://t4/"), pmod(k, lit(5)),
        lit("\">d</a>"),
        lit("<a href=http://t5/"), pmod(k, lit(11)),
        lit(" rel=nofollow>e</a>"),
        lit("<a rel=\"sponsored,nofollow\" href=\"http://t6/"),
        pmod(k, lit(2)), lit("\">f</a>"),
        lit("<a name=\"nohref\">skip</a>"),
        // hyphenated attrs must not alias: data-href is not an href
        // (anchor skipped), data-rel is not a rel (link stays follow)
        lit("<a data-href=\"http://bad/x\" name=\"g\">skip</a>"),
        lit("<a href=\"http://t7/"), pmod(k, lit(4)),
        lit("\" data-rel=\"nofollow\">h</a>"),
        // mixed quotes: a single-quoted value may CONTAIN a double
        // quote and must extract intact
        lit("<a href='http://t8/"), pmod(k, lit(9)), lit("\"q'>i</a>"))
      t(s, dir, "documents").select(col("doc_id"), html.as("html"))
        .select(col("doc_id"), explode(Text.outlinks(col("html"))).as("l"))
        .select(col("doc_id"), col("l.url").as("url"),
          col("l.nofollow").as("nofollow"))
        .orderBy(col("doc_id"), col("url"))
    }),

    // --- two-level sitemap INDEX resolution (Text.sitemapIndexEntries
    //     + sitemapEntries): per source a <sitemapindex> of 3 child
    //     urlsets (docs split by doc_id%3, optional lastmod both
    //     levels); the index explodes, JOINS to the fetched children,
    //     and each child urlset explodes — the real shape of large
    //     sites' 50k-URL-capped sitemaps. Oracle rebuilds both levels --
    "q_sitemap_index" -> ((s, dir) => {
      import graft.functions.Text
      val docs = t(s, dir, "documents").filter(col("doc_id") < 250)
      val (children, index) = sitemapWorld(docs)
      val level1 = index
        .select(col("source"),
          explode(Text.sitemapIndexEntries(col("index_xml"))).as("sm"))
        .select(col("source"), col("sm.url").as("sitemap_url"),
          col("sm.lastmod").as("sitemap_lastmod"))
      level1
        .join(children.select(col("child_url"), col("xml")),
          level1("sitemap_url") === col("child_url"))
        .select(col("source"), col("sitemap_url"), col("sitemap_lastmod"),
          explode(Text.sitemapEntries(col("xml"))).as("e"))
        .select(col("source"), col("sitemap_url"), col("sitemap_lastmod"),
          col("e.url").as("url"), col("e.lastmod").as("lastmod"))
        .orderBy(col("source"), col("url"))
    }),

    // --- RFC 9309 wildcard rules (Robots): `*` mid-pattern, trailing
    //     `$` end anchor, `$` elsewhere literal, %XX octets literal,
    //     most-specific-match by pattern OCTET count across prefix and
    //     wildcard rules, Allow on octet ties. The oracle rebuilds the
    //     rule table with the same anchored-regex translation and
    //     replays the max-by-octets resolution -------------------------
    "q_robots_wildcards" -> ((s, dir) => {
      import graft.operators.Robots
      val docs = t(s, dir, "documents")
      val srcs = docs.select(col("source")).distinct()
      val robots = srcs.select(
        concat(lit("www."), col("source"), lit(".example.com")).as("domain"),
        lit("""User-agent: *
              |Disallow: /pdf/*.pdf$
              |Allow: /pdf/open*.pdf$
              |Disallow: /a/*/b
              |Disallow: /li$t
              |Disallow: /%2F
              |Disallow: /dir/*
              |Allow: /dir/a
              |""".stripMargin).as("content"))
      val urls = docs.select(col("doc_id"), col("source"),
        concat(lit("https://www."), col("source"), lit(".example.com"),
          expr("""CASE CAST(doc_id % 8 AS INT)
                 |  WHEN 0 THEN '/pdf/doc' || doc_id || '.pdf'
                 |  WHEN 1 THEN '/pdf/doc' || doc_id || '.pdfx'
                 |  WHEN 2 THEN '/pdf/open' || doc_id || '.pdf'
                 |  WHEN 3 THEN '/a/' || doc_id || '/b'
                 |  WHEN 4 THEN '/a/' || doc_id || '/c'
                 |  WHEN 5 THEN '/li$t' || doc_id
                 |  WHEN 6 THEN '/%2Fx' || doc_id
                 |  ELSE '/dir/a' || doc_id END""".stripMargin)).as("url"))
      Robots.filterAllowed(urls,
          "url", Robots.rulesTable(robots, "domain", "content"), "GraftBot")
        .select(col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    }),

    // --- INCREMENTAL PageRank (LinkRank.pagerankFrom): epoch 1 cold-
    //     starts on the first crawl slice and commits the rank vector
    //     into a ShardedTable manifest; epoch 2 warm-starts 2
    //     iterations off the committed vector over the GROWN graph
    //     (new nodes join at cold mass Q). The saving at 10^10 edges
    //     is iterations, not writes. The oracle unrolls both epochs:
    //     3 cold iterations on the slice graph, then 2 warm ones on
    //     the full graph seeded by the first result ---------------------
    "q_link_rank_warm" -> ((s, dir) => {
      import graft.operators.LinkRank
      import graft.sink.ShardedTable
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      def graph(d: DataFrame): DataFrame = {
        val heads = d.select(col("doc_id").as("head_id"),
          col("source").as("dst"))
        d.withColumn("head_id", col("doc_id") -
            pmod(col("doc_id"), lit(2) + pmod(col("doc_id"), lit(5))))
          .join(heads, "head_id")
          .select(col("source").as("src"), col("dst"))
      }
      val tmp = java.nio.file.Files.createTempDirectory("q_link_rank_warm")
      val table = new ShardedTable(s"$tmp/ranks", "shard",
        s.sparkContext.hadoopConfiguration)
      val shards = (0 until 8).map(_.toString)
      def sharded(r: DataFrame): DataFrame = r.withColumn("shard",
        pmod(crc32(col("node").cast("string")), lit(8)).cast("int"))
      val r1 = LinkRank.pagerank(
        graph(docs.filter(col("doc_id") < 300)), "src", "dst", 3)
      table.commit(sharded(r1), shards, Map("epoch" -> "1"))
      val prev = table.readCurrent(s).select("node", "rank")
      val r2 = LinkRank.pagerankFrom(graph(docs), "src", "dst", prev, 2)
      table.commit(sharded(r2), shards, Map("epoch" -> "2"))
      table.readCurrent(s)
        .select(col("node").as("source"), col("rank"))
        .orderBy("source")
    }),

    // --- full sitemap entries (Text.sitemapEntries): per-<url> block
    //     loc + OPTIONAL lastmod/priority (the recrawl-scheduling
    //     inputs), entity-decoded; presence varies per doc so the
    //     NULL paths run. Oracle rebuilds every field ------------------
    "q_sitemap_entries" -> ((s, dir) => {
      import graft.functions.Text
      val docs = t(s, dir, "documents").filter(col("doc_id") < 250)
      val sitemaps = docs.groupBy(col("source"))
        .agg(concat(
          lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          concat_ws("\n", sort_array(collect_list(concat(
            lit("  <url><loc> https://www."), col("source"),
            lit(".example.com/p/"), col("doc_id"), lit("?a=1&amp;b=2 </loc>"),
            when(pmod(col("doc_id"), lit(3)) =!= 0,
              concat(lit("<lastmod>2024-0"), lit(1) + pmod(col("doc_id"), lit(9)),
                lit("-15</lastmod>"))).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4)) =!= 0,
              concat(lit("<priority>0."), pmod(col("doc_id"), lit(10)),
                lit("</priority>"))).otherwise(lit("")),
            lit("</url>"))))),
          lit("\n</urlset>")).as("xml"))
      sitemaps.select(col("source"),
          explode(Text.sitemapEntries(col("xml"))).as("e"))
        .select(col("source"), col("e.url").as("url"),
          col("e.lastmod").as("lastmod"), col("e.priority").as("priority"))
        .orderBy(col("source"), col("url"))
    }),

    // --- crawl-delay-aware fetch schedule: the q_fetch_list frontier
    //     joined against robots Crawl-delay directives (every domain
    //     declares a '*' delay; even-numbered domains add a stricter
    //     graftbot-specific one that must WIN for crawler GraftBot);
    //     fetch_at = fetch_slot * delay ------------------------------
    "q_fetch_schedule" -> ((s, dir) => {
      import graft.operators.{CrawlFrontier, Robots}
      val f = t(s, dir, "documents").select(
        concat(lit("http://"), col("source"), lit("/p"), col("doc_id")).as("url"),
        col("source").as("host"),
        pmod(col("doc_id") * 37, lit(1000)).as("score"))
      val srcs = f.select(col("host")).distinct()
        .withColumn("i", substring(col("host"), 4, 10).cast("int"))
      val robots = srcs.select(col("host").as("domain"),
        concat(
          lit("# politeness\nUser-agent: *\nCrawl-delay: "),
          (lit(1) + pmod(col("i"), lit(5))).cast("string"),
          when(pmod(col("i"), lit(2)) === 0,
            concat(lit("\nUser-agent: graftbot\nCrawl-delay: "),
              (lit(1) + pmod(col("i"), lit(3)) * 2).cast("string")))
            .otherwise(lit(""))).as("content"))
      val selected = CrawlFrontier.generateFetchList(f, "url", "host", "score",
        topN = 150, maxPerHost = 10)
      CrawlFrontier.scheduleFetch(selected, "host",
          Robots.delaysTable(robots, "domain", "content"), "GraftBot",
          defaultDelaySec = 30)
        .select(col("url"), col("host"), col("score"),
          col("sel_rank"), col("fetch_slot"), col("fetch_at"))
        .orderBy(col("sel_rank"))
    }),

    // --- redirect-chain resolution: a functional redirect graph over
    //     the corpus (u_k → u_{k-1} except k%50==1 flips forward,
    //     planting 2-cycles and their feeders; multiples of 7 are
    //     terminals) resolved by pointer DOUBLING to (terminal, exact
    //     hops, resolved); loops and >8-hop chains come back NULL +
    //     unresolved. The oracle walks the same graph step-by-step in
    //     a recursive CTE -------------------------------------------
    "q_resolve_redirects" -> ((s, dir) => {
      val e = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(concat(lit("u"), col("doc_id")).as("src"),
          concat(lit("u"),
            when(pmod(col("doc_id"), lit(50)) === 1, col("doc_id") + 1)
              .otherwise(col("doc_id") - 1)).as("dst"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=resolveRedirects
          |op.resolveRedirects.srcColumn=src
          |op.resolveRedirects.dstColumn=dst
          |op.resolveRedirects.maxHops=8
          |""".stripMargin))
      ops.foldLeft(e)((d, op) => op(d)).orderBy(col("src"))
    }),

    // --- incremental frontier maintenance (job.type=frontier): two
    //     watermark epochs of tracking-polluted discoveries (every doc
    //     discovers its head-block URL, decorated with a per-discoverer
    //     utm param + fragment) canonicalize and merge MERGEABLY
    //     (first-seen seq, best score, discovery count) into a
    //     canonical-hash-sharded versioned frontier; epoch 3 is a
    //     no-op. Oracle = the full recompute over all discoveries ----
    "q_frontier_job" -> ((s, dir) => {
      import graft.runner.JobConfig
      val disc = t(s, dir, "documents")
        .select(col("doc_id").as("seq"),
          (col("doc_id") - pmod(col("doc_id"), lit(5))).as("target"),
          pmod(col("n_chars"), lit(997)).as("score"))
        .withColumn("url", concat(
          lit("http://h"), pmod(col("target"), lit(13)),
          lit(".net/u"), col("target"),
          lit("?utm_campaign=c"), pmod(col("seq"), lit(3)),
          lit("#f"), pmod(col("seq"), lit(2))))
        .select(col("seq"), col("url"), col("score"))
      val maxSeq = disc.agg(max("seq")).head.getLong(0)
      val split = maxSeq / 2
      val tmp = java.nio.file.Files.createTempDirectory("q_frontier").toString
      val props = JobConfig.parse(
        s"""job.type=frontier
           |job.name=frontier_gate
           |source.path=$tmp/src
           |frontier.url=url
           |frontier.score=score
           |frontier.seq=seq
           |frontier.shards=16
           |sink.output=$tmp/front
           |state.dir=$tmp/wm
           |""".stripMargin)
      disc.filter(col("seq") <= split).write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      disc.filter(col("seq") > split).write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      require(r2("published") == "true" && r2("highWatermark") == maxSeq.toString,
        s"epoch 2 failed: $r2")
      require(r2("touchedPartitions").toInt <= 16, s"touched blew the shards: $r2")
      val r3 = JobConfig.runAny(s, props)
      require(r3("published") == "false", s"empty epoch must be a no-op: $r3")
      new graft.sink.ShardedTable(s"$tmp/front", "shard",
          s.sparkContext.hadoopConfiguration)
        .readCurrent(s).drop("shard")
        .select(col("url"), col("first_seq"), col("score"), col("n_seen"))
        .orderBy(col("url"))
    }),

    // --- curriculum training order: rank by difficulty (n_chars),
    //     4 contiguous stages via the exact (rank-1)*k div n cut,
    //     md5-shuffled within stages, global train_seq — every step
    //     an engine-replayable total order (no RNG), so the oracle
    //     rebuilds the identical sequence ----------------------------
    "q_curriculum" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=curriculum
          |op.curriculum.idColumn=doc_id
          |op.curriculum.difficultyColumn=n_chars
          |op.curriculum.stages=4
          |""".stripMargin))
      ops.foldLeft(docs)((d, op) => op(d))
        .select(col("doc_id"), col("n_chars"), col("stage"), col("train_seq"))
        .orderBy(col("train_seq"))
    })
  )

  def oracleSql13: Map[String, String] = Map(

    "q_webp_anim" -> {
      // value of block (bx, by) in composited frame f: the LAST
      // painter's value (frame 0 = base), found by scanning painters
      def vat(bx: String, by: String): String =
        s"9 + (doc_id * 23 + coalesce(list_max(list_filter(range(1, f + 1)," +
          s" x -> ((x * 7 + doc_id // 25) % 4) = ($bx)" +
          s" AND ((x * 11) % 3) = ($by))), 0) * 29" +
          s" + ($bx) * 31 + ($by) * 61) % 233"
      s"""WITH anims AS (
         |  SELECT doc_id, CAST(2 + (doc_id // 25) % 3 AS BIGINT) AS nf
         |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
         |fr AS (SELECT doc_id, nf, unnest(range(0, nf)) AS f FROM anims),
         |feat AS (
         |  SELECT doc_id, nf, f,
         |    list_sum(list_transform(range(0, 12), b ->
         |      ${vat("b % 4", "b // 4")})) AS sv,
         |    list_transform(range(0, 64), j ->
         |      3 * (${vat("(j % 8) // 2", "(6 * (j // 8)) // 16")})) AS lum
         |  FROM fr)
         |SELECT doc_id AS media_id, f AS frame_no, nf AS n_frames,
         |  CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
         |  CAST(40 + 10 * f AS BIGINT) AS duration_ms,
         |  CAST(256 * sv AS DOUBLE) / 3072 AS mean_intensity,
         |  array_to_string(list_transform(range(63, -1, -1), j ->
         |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
         |    AS ahash_bits
         |FROM feat ORDER BY media_id, frame_no""".stripMargin
    },

    "q_webp_lossy" -> """
      SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(64 AS BIGINT), CAST(48 AS BIGINT),
         CAST(383870 AS BIGINT), CAST(98486 AS BIGINT), CAST(98188 AS BIGINT)),
        (1, 48, 48, 289635, 73795, 74670),
        (2, 80, 64, 631232, 163840, 163840),
        (3, 33, 17, 70244, 19270, 19424),
        (4, 96, 80, 965635, 244451, 246056),
        (5, 56, 40, 284608, 71680, 71680))
        AS t(fixture_id, width, height, y_sum, u_sum, v_sum)
      ORDER BY fixture_id
    """,

    "q_webp_decode" ->
      """WITH imgs AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |feat AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 36), k ->
        |      11 + (doc_id * 31 + (k % 3) * 59 + ((k // 3) % 4) * 47
        |         + (k // 12) * 71) % 227)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      11 + (doc_id * 31 + ((j % 8) // 2) * 47
        |         + ((6 * (j // 8)) // 16) * 71) % 227
        |      + 11 + (doc_id * 31 + 59 + ((j % 8) // 2) * 47
        |         + ((6 * (j // 8)) // 16) * 71) % 227
        |      + 11 + (doc_id * 31 + 118 + ((j % 8) // 2) * 47
        |         + ((6 * (j // 8)) // 16) * 71) % 227) AS lum
        |  FROM imgs)
        |SELECT doc_id AS media_id, 'image/webp' AS modality,
        |  CAST(3072 AS BIGINT) AS n_units,
        |  CAST(256 * sv AS DOUBLE) / 9216 AS mean_val,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id""".stripMargin,


    "q_dag_schedule" -> """
      WITH RECURSIVE tasks AS (
        SELECT 'dag' || CAST(k AS VARCHAR) AS dag, tt.task,
               'u' || CAST(k % 3 AS VARCHAR) AS usr,
               'g' || CAST(k % 2 AS VARCHAR) AS grp,
               tt.deps,
               CAST(CASE WHEN k = 4 AND tt.task = 'a' THEN 4
                         ELSE 1 + (k + tt.pos) % 2 END AS BIGINT) AS dur,
               CAST(CASE WHEN tt.task = 'b' AND k % 4 = 1 THEN 1
                         WHEN tt.task = 'b' AND k % 4 = 3 THEN 9
                         WHEN tt.task = 'c' AND k % 4 = 2 THEN 9
                         ELSE 0 END AS BIGINT) AS fail_att,
               CAST(2 AS BIGINT) AS max_att,
               CAST(CASE WHEN k = 4 THEN 0 ELSE k % 3 END AS BIGINT) AS submit,
               CAST(CASE WHEN k = 4 THEN 4 ELSE -1 END AS BIGINT) AS sla,
               CASE WHEN k % 2 = 0 THEN 'FINISH_RUNNING'
                    ELSE 'FINISH_ALL_POSSIBLE' END AS fopt
        FROM (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 8) n
        CROSS JOIN (VALUES ('a', CAST([] AS VARCHAR[]), 0),
                           ('b', ['a'], 1),
                           ('c', ['a'], 2),
                           ('d', ['b','c'], 3)) tt(task, deps, pos)
      ),
      sched AS (
        SELECT CAST(0 AS BIGINT) AS tick, dag, task, usr, grp, deps, dur,
               fail_att, max_att, submit, sla, fopt,
               'P' AS state, CAST(1 AS BIGINT) AS attempt,
               CAST(-1 AS BIGINT) AS end_tick
        FROM tasks
        UNION ALL
        SELECT nt, dag, task, usr, grp, deps, dur, fail_att, max_att,
               submit, sla, fopt,
               CASE WHEN completes THEN
                      (CASE WHEN attempt > fail_att THEN 'S'
                            WHEN attempt >= max_att THEN 'F'
                            ELSE 'P' END)
                    WHEN sla_hit THEN (CASE WHEN state = 'R' THEN 'K' ELSE 'C' END)
                    WHEN cancels THEN 'C'
                    WHEN started THEN 'R'
                    WHEN qfail THEN 'Q'
                    ELSE state END AS state,
               CASE WHEN completes AND attempt <= fail_att AND attempt < max_att
                    THEN attempt + 1 ELSE attempt END AS attempt,
               CASE WHEN completes AND attempt <= fail_att AND attempt < max_att
                      THEN -1
                    WHEN completes THEN end_tick
                    WHEN sla_hit OR cancels OR qfail THEN -1
                    WHEN started THEN nt + dur
                    ELSE end_tick END AS end_tick
        FROM (
          SELECT d.*,
                 launched AND (run_usr + u_rank <= 2)
                          AND (run_grp + g_rank <= 3) AS started,
                 launched AND NOT ((run_usr + u_rank <= 2)
                                   AND (run_grp + g_rank <= 3)) AS qfail
          FROM (
            SELECT c.*,
                   COUNT(*) FILTER (WHERE launched) OVER
                     (PARTITION BY usr ORDER BY submit, dag, task
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u_rank,
                   COUNT(*) FILTER (WHERE launched) OVER
                     (PARTITION BY grp ORDER BY submit, dag, task
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_rank
            FROM (
              SELECT b.*,
                     is_cand AND run_tot + COUNT(*) FILTER (WHERE is_cand) OVER
                       (ORDER BY submit, dag, task
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       <= 3 AS launched
              FROM (
                SELECT a.*,
                       state = 'P' AND NOT sla_hit AND
                         (len(list_intersect(deps, dead_set)) > 0 OR
                          (fopt = 'FINISH_RUNNING' AND len(dead_set) > 0))
                         AS cancels,
                       state = 'P' AND NOT sla_hit AND
                         NOT (len(list_intersect(deps, dead_set)) > 0 OR
                              (fopt = 'FINISH_RUNNING' AND len(dead_set) > 0)) AND
                         submit <= nt AND list_has_all(succ_set, deps) AS is_cand
                FROM (
                  SELECT p.*, p.tick + 1 AS nt,
                         p.state = 'R' AND p.end_tick = p.tick + 1 AS completes,
                         NOT (p.state = 'R' AND p.end_tick = p.tick + 1)
                           AND p.sla >= 0 AND p.tick + 1 >= p.submit + p.sla
                           AND p.state IN ('P','R') AS sla_hit,
                         COALESCE(list(p.task) FILTER (WHERE p.state = 'S')
                           OVER (PARTITION BY p.dag), []) AS succ_set,
                         COALESCE(list(p.task)
                             FILTER (WHERE p.state IN ('F','Q','C','K'))
                           OVER (PARTITION BY p.dag), []) AS dead_set,
                         COUNT(*) FILTER (WHERE p.state = 'R') OVER () AS run_tot,
                         COUNT(*) FILTER (WHERE p.state = 'R')
                           OVER (PARTITION BY p.usr) AS run_usr,
                         COUNT(*) FILTER (WHERE p.state = 'R')
                           OVER (PARTITION BY p.grp) AS run_grp
                  FROM sched p
                ) a
              ) b
            ) c
          ) d
        )
        WHERE nt <= 40
      )
      SELECT tick, dag, task,
             CASE WHEN pstate = 'R' AND state = 'P' THEN pattempt
                  ELSE attempt END AS attempt,
             CASE WHEN pstate = 'P' AND state = 'R' THEN 'start'
                  WHEN pstate = 'R' AND state = 'S' THEN 'success'
                  WHEN pstate = 'R' AND state = 'F' THEN 'fail'
                  WHEN pstate = 'R' AND state = 'P' THEN 'fail'
                  WHEN pstate = 'P' AND state = 'Q' THEN 'quota_fail'
                  WHEN pstate = 'P' AND state = 'C' THEN 'cancelled'
                  WHEN pstate = 'R' AND state = 'K' THEN 'sla_kill' END AS event
      FROM (SELECT tick, dag, task, state, attempt,
                   lag(state) OVER w AS pstate, lag(attempt) OVER w AS pattempt
            FROM sched WINDOW w AS (PARTITION BY dag, task ORDER BY tick))
      WHERE pstate IS NOT NULL AND pstate <> state
      ORDER BY tick, dag, task, event
    """,

    "q_zonemap_scan" -> """
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id BETWEEN 100 AND 300
      ORDER BY doc_id
    """,

    "q_zstd_ingest" -> """
      SELECT doc_id, COALESCE(text, '') AS text FROM documents
      ORDER BY doc_id
    """,

    "q_url_canonical" -> """
      WITH u AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
          'Ex' || CAST(doc_id % 7 AS VARCHAR) || '.CoM' ||
          (CASE WHEN doc_id % 3 = 0 THEN
                  (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                WHEN doc_id % 3 = 1 THEN
                  (CASE WHEN doc_id % 2 = 0 THEN ':8080' ELSE ':8443' END)
                ELSE '' END) ||
          (CASE WHEN doc_id % 4 = 0 THEN ''
                ELSE '/P' || CAST(doc_id % 5 AS VARCHAR) END) ||
          (CASE doc_id % 5 WHEN 0 THEN '?b=2&a=1' WHEN 1 THEN '?a=1&b=2'
                WHEN 2 THEN '?utm_source=tw&a=1'
                WHEN 3 THEN '?a=1&utm_campaign=x&' ELSE '' END) ||
          (CASE WHEN doc_id % 2 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
                ELSE '' END) AS url
        FROM documents
      ),
      s1 AS (SELECT doc_id, string_split(url, '#')[1] AS nofrag FROM u),
      s2 AS (SELECT doc_id, nofrag, strpos(nofrag, '?') AS qp FROM s1),
      s3 AS (SELECT doc_id,
               CASE WHEN qp > 0 THEN substring(nofrag, 1, qp - 1)
                    ELSE nofrag END AS base,
               CASE WHEN qp > 0 THEN substring(nofrag, qp + 1) ELSE '' END AS qs
             FROM s2),
      s4 AS (SELECT doc_id, base, qs,
               regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1) AS sh
             FROM s3),
      s5 AS (SELECT doc_id, qs, sh, base,
               regexp_replace(
                 regexp_replace(lower(sh), '^(http://[^:]*):80$', '\1'),
                 '^(https://[^:]*):443$', '\1') AS ch,
               substring(base, length(sh) + 1) AS path
             FROM s4),
      s6 AS (SELECT doc_id,
               CASE WHEN sh = '' THEN base
                    ELSE ch || (CASE WHEN path = '' THEN '/' ELSE path END)
                    END AS cb,
               COALESCE(array_to_string(list_sort(list_filter(
                 string_split(qs, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                   '^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)='))), '&'), '')
                 AS cq
             FROM s5)
      SELECT CASE WHEN cq = '' THEN cb ELSE cb || '?' || cq END AS canonical,
             COUNT(*) AS n_variants, MIN(doc_id) AS first_doc
      FROM s6 GROUP BY 1 ORDER BY 1
    """,

    "q_fetch_list" -> """
      WITH f AS (
        SELECT 'http://' || source || '/p' || CAST(doc_id AS VARCHAR) AS url,
               source AS host, CAST(doc_id * 37 % 1000 AS BIGINT) AS score
        FROM documents),
      capped AS (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY score DESC, url) AS hr
        FROM f),
      sel AS (
        SELECT url, host, score,
               row_number() OVER (ORDER BY score DESC, url) AS sel_rank
        FROM capped WHERE hr <= 10)
      SELECT url, host, score, sel_rank,
             row_number() OVER (PARTITION BY host ORDER BY sel_rank) - 1
               AS fetch_slot
      FROM sel WHERE sel_rank <= 150
      ORDER BY sel_rank
    """,

    "q_anchor_text" -> """
      WITH l AS (
        SELECT b.source AS dst, string_split(a.text, ' ')[1] AS anchor
        FROM documents a JOIN documents b
          ON b.doc_id = a.doc_id - a.doc_id % (2 + a.doc_id % 5)),
      c AS (
        SELECT dst, anchor, count(*) AS cnt FROM l
        WHERE anchor IS NOT NULL AND anchor <> '' GROUP BY 1, 2),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY dst
                                     ORDER BY cnt DESC, anchor) AS rk
        FROM c)
      SELECT dst, CAST(sum(cnt) AS BIGINT) AS n_links,
             count(*) AS n_anchors,
             string_agg(CASE WHEN rk <= 3 THEN anchor || ':' || cnt END,
                        '|' ORDER BY rk) AS top_anchors
      FROM r GROUP BY dst ORDER BY dst
    """,

    "q_crawl_plan" -> """
      WITH u AS (
        SELECT doc_id, n_chars, unnest([
          'http://h' || (doc_id % 23) || '.com/d' || doc_id || '?utm_source=a',
          'http://h' || (doc_id % 23) || '.com/d' || doc_id ||
            '?ref=2&utm_medium=b#frag',
          'HTTP://H' || (doc_id % 23) || '.COM:80/d' || doc_id || '?ref=2']) AS url
        FROM documents),
      s1 AS (SELECT doc_id, n_chars, string_split(url, '#')[1] AS nofrag FROM u),
      s2 AS (SELECT *, strpos(nofrag, '?') AS qp FROM s1),
      s3 AS (SELECT doc_id, n_chars,
               CASE WHEN qp > 0 THEN substring(nofrag, 1, qp - 1)
                    ELSE nofrag END AS base,
               CASE WHEN qp > 0 THEN substring(nofrag, qp + 1) ELSE '' END AS qs
             FROM s2),
      s4 AS (SELECT *, regexp_extract(base,
               '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1) AS sh FROM s3),
      s5 AS (SELECT *, regexp_replace(regexp_replace(lower(sh),
               '^(http://[^:]*):80$', '\1'), '^(https://[^:]*):443$', '\1') AS ch,
               substring(base, length(sh) + 1) AS path FROM s4),
      s6 AS (SELECT doc_id, n_chars,
               CASE WHEN sh = '' THEN base
                    ELSE ch || (CASE WHEN path = '' THEN '/' ELSE path END)
                    END AS cb,
               COALESCE(array_to_string(list_sort(list_filter(
                 string_split(qs, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                   '^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)='))), '&'), '') AS cq
             FROM s5),
      canon0 AS (SELECT doc_id, n_chars,
                   CASE WHEN cq = '' THEN cb ELSE cb || '?' || cq END AS url
                 FROM s6),
      canon AS (
        SELECT url,
               (min({'d': doc_id, 'n': n_chars})).d AS doc_id,
               (min({'d': doc_id, 'n': n_chars})).n % 1000 AS score,
               regexp_extract(url, '^http://([^/]*)', 1) AS host
        FROM canon0 GROUP BY url),
      capped AS (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY score DESC, url) AS hr
        FROM canon),
      sel AS (
        SELECT url, host, doc_id, score,
               row_number() OVER (ORDER BY score DESC, url) AS sel_rank
        FROM capped WHERE hr <= 5)
      SELECT url, host, doc_id, score, sel_rank,
             row_number() OVER (PARTITION BY host ORDER BY sel_rank) - 1
               AS fetch_slot
      FROM sel WHERE sel_rank <= 100
      ORDER BY sel_rank
    """,

    "q_outlinks" -> """
      SELECT doc_id, url, nofollow FROM (
        SELECT doc_id, 'http://t1/' || CAST(doc_id AS VARCHAR) AS url,
               false AS nofollow FROM documents
        UNION ALL
        SELECT doc_id, 'http://t2/' || CAST(doc_id % 7 AS VARCHAR), true
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t3/' || CAST(doc_id % 3 AS VARCHAR) || '?x=1&y=2',
               true
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t4/' || CAST(doc_id % 5 AS VARCHAR), false
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t5/' || CAST(doc_id % 11 AS VARCHAR), true
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t6/' || CAST(doc_id % 2 AS VARCHAR), true
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t7/' || CAST(doc_id % 4 AS VARCHAR), false
        FROM documents
        UNION ALL
        SELECT doc_id, 'http://t8/' || CAST(doc_id % 9 AS VARCHAR) || '"q',
               false
        FROM documents)
      ORDER BY doc_id, url
    """,

    "q_sitemap_discovery" -> """
      WITH d AS (SELECT doc_id, source FROM documents WHERE doc_id < 250),
      s AS (SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS i
            FROM d),
      urls AS (
        SELECT d.source, doc_id % 3 AS j,
          'https://www.' || d.source || '.example.com/p/' ||
            CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url,
          CASE WHEN doc_id % 5 <> 0
               THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR) || '-15'
               END AS lastmod
        FROM d JOIN s ON s.source = d.source AND s.i % 5 <> 0)
      SELECT 'www.' || source || '.example.com' AS domain,
        'https://www.' || source || '.example.com/sitemap' ||
          CAST(j AS VARCHAR) || '.xml' AS child_sitemap,
        url, lastmod
      FROM urls ORDER BY domain, url
    """,

    "q_sitemap_index" -> """
      WITH d AS (SELECT doc_id, source FROM documents WHERE doc_id < 250),
      urls AS (
        SELECT source, doc_id % 3 AS j,
          'https://www.' || source || '.example.com/p/' ||
            CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url,
          CASE WHEN doc_id % 5 <> 0
               THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR) || '-15'
               END AS lastmod
        FROM d)
      SELECT source,
        'https://www.' || source || '.example.com/sitemap' ||
          CAST(j AS VARCHAR) || '.xml' AS sitemap_url,
        CASE WHEN j % 2 = 0 THEN '2024-1' || CAST(j AS VARCHAR) || '-01'
             END AS sitemap_lastmod,
        url, lastmod
      FROM urls ORDER BY source, url
    """,

    "q_robots_wildcards" ->
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |rules AS (
        |  SELECT source, FALSE AS allow, '/pdf/*.pdf$' AS path,
        |         '^/pdf/.*\.pdf$' AS rx FROM s
        |  UNION ALL SELECT source, TRUE, '/pdf/open*.pdf$',
        |         '^/pdf/open.*\.pdf$' FROM s
        |  UNION ALL SELECT source, FALSE, '/a/*/b', '^/a/.*/b' FROM s
        |  UNION ALL SELECT source, FALSE, '/li$t', NULL FROM s
        |  UNION ALL SELECT source, FALSE, '/%2F', NULL FROM s
        |  UNION ALL SELECT source, FALSE, '/dir/*', '^/dir/.*' FROM s
        |  UNION ALL SELECT source, TRUE, '/dir/a', NULL FROM s),
        |u AS (
        |  SELECT doc_id, source,
        |    CASE doc_id % 8
        |      WHEN 0 THEN '/pdf/doc' || doc_id || '.pdf'
        |      WHEN 1 THEN '/pdf/doc' || doc_id || '.pdfx'
        |      WHEN 2 THEN '/pdf/open' || doc_id || '.pdf'
        |      WHEN 3 THEN '/a/' || doc_id || '/b'
        |      WHEN 4 THEN '/a/' || doc_id || '/c'
        |      WHEN 5 THEN '/li$t' || doc_id
        |      WHEN 6 THEN '/%2Fx' || doc_id
        |      ELSE '/dir/a' || doc_id END AS p
        |  FROM documents),
        |m AS (
        |  SELECT u.doc_id, u.source, u.p,
        |    (max({'l': octet_length(encode(a.path)), 'a': a.allow})).a AS verdict,
        |    count(a.path) AS nm
        |  FROM u LEFT JOIN rules a
        |    ON a.source = u.source AND
        |       CASE WHEN a.rx IS NULL THEN starts_with(u.p, a.path)
        |            ELSE regexp_matches(u.p, a.rx) END
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |  'https://www.' || source || '.example.com' || p AS url
        |FROM m WHERE nm = 0 OR verdict ORDER BY doc_id""".stripMargin,

    "q_zonemap_ts" -> """
      SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-13 00:00:00'
      ORDER BY event_id
    """,

    "q_link_rank_warm" -> {
      def iter(prev: String, out: String, e: String, od: String,
          nodes: String): String =
        s"""$out AS (SELECT n.node, 157286 + coalesce(m.mass, 0) AS rank
           |  FROM $nodes n LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(sum((17 * r.rank) // (20 * od.outdeg)) AS BIGINT) AS mass
           |    FROM $e e JOIN $od od ON od.src = e.src
           |      JOIN $prev r ON r.node = e.src
           |    GROUP BY 1) m ON m.node = n.node)""".stripMargin
      s"""WITH d1 AS (SELECT doc_id, source FROM documents WHERE doc_id < 300),
         |e1 AS (SELECT DISTINCT a.source AS src, b.source AS dst
         |  FROM d1 a JOIN d1 b
         |    ON b.doc_id = a.doc_id - a.doc_id % (2 + a.doc_id % 5)),
         |nodes1 AS (SELECT src AS node FROM e1 UNION SELECT dst FROM e1),
         |od1 AS (SELECT src, count(*) AS outdeg FROM e1 GROUP BY 1),
         |r0 AS (SELECT node, CAST(1048576 AS BIGINT) AS rank FROM nodes1),
         |${iter("r0", "r1", "e1", "od1", "nodes1")},
         |${iter("r1", "r2", "e1", "od1", "nodes1")},
         |${iter("r2", "r3", "e1", "od1", "nodes1")},
         |e2 AS (SELECT DISTINCT a.source AS src, b.source AS dst
         |  FROM documents a JOIN documents b
         |    ON b.doc_id = a.doc_id - a.doc_id % (2 + a.doc_id % 5)),
         |nodes2 AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |od2 AS (SELECT src, count(*) AS outdeg FROM e2 GROUP BY 1),
         |w0 AS (SELECT n.node, coalesce(r.rank, CAST(1048576 AS BIGINT)) AS rank
         |  FROM nodes2 n LEFT JOIN r3 r ON r.node = n.node),
         |${iter("w0", "w1", "e2", "od2", "nodes2")},
         |${iter("w1", "w2", "e2", "od2", "nodes2")}
         |SELECT node AS source, CAST(rank AS BIGINT) AS rank FROM w2
         |ORDER BY source""".stripMargin
    },

    "q_sitemap_entries" -> """
      SELECT source,
             'https://www.' || source || '.example.com/p/' ||
               CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url,
             CASE WHEN doc_id % 3 <> 0
                  THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR) || '-15'
                  END AS lastmod,
             CASE WHEN doc_id % 4 <> 0
                  THEN CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE)
                  END AS priority
      FROM documents WHERE doc_id < 250
      ORDER BY source, url
    """,

    "q_fetch_schedule" -> """
      WITH f AS (
        SELECT 'http://' || source || '/p' || CAST(doc_id AS VARCHAR) AS url,
               source AS host, CAST(doc_id * 37 % 1000 AS BIGINT) AS score
        FROM documents),
      capped AS (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY score DESC, url) AS hr
        FROM f),
      sel AS (
        SELECT url, host, score,
               row_number() OVER (ORDER BY score DESC, url) AS sel_rank
        FROM capped WHERE hr <= 10),
      slotted AS (
        SELECT url, host, score, sel_rank,
               row_number() OVER (PARTITION BY host ORDER BY sel_rank) - 1
                 AS fetch_slot
        FROM sel WHERE sel_rank <= 150),
      delays AS (
        SELECT host,
               CAST(CASE WHEN i % 2 = 0 THEN 1 + (i % 3) * 2
                         ELSE 1 + i % 5 END AS BIGINT) AS delay_sec
        FROM (SELECT DISTINCT host,
                CAST(substring(host, 4) AS INT) AS i FROM f))
      SELECT s.url, s.host, s.score, s.sel_rank, s.fetch_slot,
             s.fetch_slot * d.delay_sec AS fetch_at
      FROM slotted s JOIN delays d ON d.host = s.host
      ORDER BY s.sel_rank
    """,

    "q_resolve_redirects" -> """
      WITH RECURSIVE e AS (
        SELECT 'u' || doc_id AS src,
               'u' || (CASE WHEN doc_id % 50 = 1 THEN doc_id + 1
                            ELSE doc_id - 1 END) AS dst
        FROM documents WHERE doc_id % 7 <> 0),
      walk AS (
        SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e
        UNION ALL
        SELECT w.src, e.dst, w.hops + 1
        FROM walk w JOIN e ON e.src = w.cur
        WHERE w.hops < 8),
      term AS (
        SELECT w.src, w.cur AS target, w.hops
        FROM walk w LEFT JOIN e t ON t.src = w.cur
        WHERE t.src IS NULL)
      SELECT e.src, t.target, t.hops, t.src IS NOT NULL AS resolved
      FROM e LEFT JOIN term t ON t.src = e.src
      ORDER BY e.src
    """,

    "q_frontier_job" -> """
      WITH disc AS (
        SELECT doc_id AS seq, doc_id - doc_id % 5 AS target,
               n_chars % 997 AS score
        FROM documents),
      urls AS (
        SELECT seq, score,
               'http://h' || (target % 13) || '.net/u' || target AS url
        FROM disc)
      SELECT url, CAST(min(seq) AS BIGINT) AS first_seq,
             CAST(max(score) AS BIGINT) AS score,
             count(*) AS n_seen
      FROM urls GROUP BY url ORDER BY url
    """,

    "q_curriculum" -> """
      WITH r AS (
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER () AS n
        FROM documents),
      s AS (SELECT doc_id, n_chars, (rk - 1) * 4 // n AS stage FROM r)
      SELECT doc_id, n_chars, stage,
             row_number() OVER (ORDER BY stage, md5('cur|' || doc_id), doc_id)
               AS train_seq
      FROM s ORDER BY train_seq
    """
  )
}
