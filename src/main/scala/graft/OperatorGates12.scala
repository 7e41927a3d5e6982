package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 tier: post-training data preparation (classifier-based
  * quality scoring, SFT thread assembly, preference pairs,
  * leakage-safe splits) and DCT perceptual-hash image near-dup. Every
  * oracle replays the full computation — the classifier oracle
  * re-trains in SQL, the pHash oracle runs the same quantized-integer
  * DCT with the SAME cosine table (interpolated from
  * `functions.PerceptualHash.dctSqlLiteral`, one source of truth).
  */
object OperatorGates12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared DuckDB tokenizer fragment == `functions.Text.tokens`. */
  private val SqlToks = "list_filter(string_split(text, ' '), x -> len(x) > 0)"

  /** Block value for the q_phash fixture: 64x64 BMP of constant 16x16
    * blocks (the oracle restates this formula).
    */
  private def phashBlockVal(d: Long, bx: Int, by: Int): Int =
    (20 + (d * 37 + bx * 53 + by * 77) % 200).toInt

  /** Near-dup fixture: content keyed by group (d/25)%5 (copies hash
    * identically); odd (d/25) images get a UNIFORM +17 brightness
    * shift — the re-grade pHash nearly ignores (only quantization
    * residue in even DCT rows moves) but aHash would scatter.
    */
  private def phashNeardupVal(d: Long, bx: Int, by: Int): Int = {
    val g = (d / 25) % 5
    (20 + (g * 41 + bx * 67 + by * 83) % 200).toInt +
      (if ((d / 25) % 2 == 1) 17 else 0)
  }

  private[graft] def synthPhashBmp(d: Long, v: (Long, Int, Int) => Int): Array[Byte] =
    operators.Multimodal.BmpCodec.synthesize(64, 64, { k =>
      val pix = k / 3
      v(d, (pix % 64) / 16, (pix / 64) / 16)
    })

  private def phashMedia(s: SparkSession, dir: String,
      v: (Long, Int, Int) => Int): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
      .as[Long]
      .mapPartitions(_.map(id => (id, synthPhashBmp(id, v))))
      .toDF("media_id", "content")
  }

  /** WARC fixture shared by q_warc_extract / q_crawl_ingest: docs
    * below 250 packed 5-per-file as HTTP response records wrapping
    * `<html>text</html>`, odd file ids in the Common Crawl
    * member-per-record gzip layout.
    */
  private def warcFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.WarcCodec
    t(s, dir, "documents")
      .filter(col("doc_id") < 250)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .groupByKey(_._1 / 5)
      .mapGroups { (fid, docs) =>
        val pages = docs.toSeq.sortBy(_._1).map { case (id, text) =>
          (s"https://example.com/doc/$id",
            s"<html>$text</html>".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        (fid, WarcCodec.writeResponses(pages, gzipPerRecord = fid % 2 == 1))
      }
      .toDF("media_id", "content")
  }

  def queries12: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- crawl-ingest chain: WARC container walk -> HTTP payload ->
    //     C4-style HTML strip -> per-page domain + text stats. The
    //     wrap/strip chain must be LOSSLESS on the fixture corpus, so
    //     the oracle asserts the round-trip against the source table
    //     directly (stripHtml itself is SQL-replayed in
    //     q_html_url_clean) -------------------------------------------
    "q_crawl_ingest" -> ((s, dir) => {
      import graft.functions.Text
      val recs = graft.operators.WarcCodec.records(warcFixture(s, dir)).toDF()
      recs.select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          Text.urlDomain(col("target_uri")).as("domain"),
          Text.stripHtml(col("payload_text")).as("clean"))
        .select(col("doc_id"), col("domain"),
          Text.tokenCount(col("clean")).cast("long").as("n_tokens"),
          length(col("clean")).cast("long").as("clean_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- corpus quality classifier: train an exact-arithmetic
    //     NB-family bag-of-words classifier on the doc_id%4==0 slice
    //     (labels = planted en-vs-rest split), score the held-out
    //     corpus. The oracle RE-TRAINS in SQL: counts, quantized
    //     rational weights, additive scores, argmax — bit for bit ----
    "q_text_classifier" -> ((s, dir) => {
      import operators.TextClassifier
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", "en").otherwise("xx").as("label"))
      val (weights, classInfo) = TextClassifier.train(train, "text", "label")
      val heldOut = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
        .select("doc_id", "text")
      TextClassifier.predictWithMargin(heldOut, "doc_id", "text", weights, classInfo)
        .orderBy("doc_id")
    }),

    // --- incremental classifier maintenance: counts are the model's
    //     sufficient statistics and they're ADDITIVE — train on half
    //     the corpus, train on the other half, merge counts, predict.
    //     The oracle retrains from scratch on the union: green =
    //     merge == rebuild, the same contract as Bm25.mergeIndex -----
    "q_classifier_incremental" -> ((s, dir) => {
      import operators.TextClassifier
      val docs = t(s, dir, "documents")
      def slice(m: Int, r: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === r)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", "en").otherwise("xx").as("label"))
      val merged = TextClassifier.mergeCounts(
        TextClassifier.trainCounts(slice(8, 0), "text", "label"),
        TextClassifier.trainCounts(slice(8, 4), "text", "label"))
      val (weights, classInfo) =
        TextClassifier.weightsFromCounts(merged._1, merged._2)
      val heldOut = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
        .select("doc_id", "text")
      TextClassifier.predictWithMargin(heldOut, "doc_id", "text", weights, classInfo)
        .orderBy("doc_id")
    }),

    // --- declarative incremental classifier job (job.type=classify):
    //     two watermark epochs train by count-merge into a token-hash
    //     ShardedTable, third epoch no-ops; predictions from the
    //     PUBLISHED model must equal the oracle's full retrain -------
    "q_classify_job" -> ((s, dir) => {
      import graft.runner.JobConfig
      import operators.TextClassifier
      val docs = t(s, dir, "documents")
      val labeled = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", "en").otherwise("xx").as("label"))
      val tmp = java.nio.file.Files.createTempDirectory("q_classify_job").toString
      val props = JobConfig.parse(
        s"""job.type=classify
           |job.name=docs_classify
           |source.path=$tmp/src
           |classify.text=text
           |classify.label=label
           |classify.seq=doc_id
           |sink.output=$tmp/model
           |state.dir=$tmp/state
           |""".stripMargin)
      val maxId = labeled.agg(max(col("doc_id"))).head.getLong(0)
      val split = maxId / 2
      labeled.filter(col("doc_id") <= split)
        .write.mode("append").parquet(s"$tmp/src")
      val r1 = JobConfig.runAny(s, props)
      require(r1("published") == "true", s"epoch 1 failed: $r1")
      labeled.filter(col("doc_id") > split)
        .write.mode("append").parquet(s"$tmp/src")
      val r2 = JobConfig.runAny(s, props)
      require(r2("published") == "true" && r2("highWatermark") == maxId.toString,
        s"epoch 2 failed: $r2")
      val r3 = JobConfig.runAny(s, props)
      require(r3("published") == "false" && r3("deltaRows") == "0",
        s"empty epoch must be a no-op: $r3")
      val table = new graft.sink.ShardedTable(s"$tmp/model", "shard",
        s.sparkContext.hadoopConfiguration)
      val (counts, docCounts) = TextClassifier.fromState(table.readCurrent(s))
      val (weights, classInfo) =
        TextClassifier.weightsFromCounts(counts, docCounts)
      val heldOut = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
        .select("doc_id", "text")
      TextClassifier.predictWithMargin(heldOut, "doc_id", "text", weights, classInfo)
        .orderBy("doc_id")
    }),

    // --- STREAMING classifier maintenance (foreachBatch +
    //     TextClassifier.shardedMerge): two micro-batches of labeled
    //     docs count-merge into the token-hash ShardedTable, one
    //     version per batch; predictions from the final model must
    //     equal the oracle's single full retrain ---------------------
    "q_stream_classify" -> ((s, dir) => {
      import operators.TextClassifier
      import streaming.StreamingIngest
      val docs = t(s, dir, "documents")
      val labeled = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", "en").otherwise("xx").as("label"))
      val maxId = labeled.agg(max(col("doc_id"))).head.getLong(0)
      val split = maxId / 2
      val inDir = java.nio.file.Files.createTempDirectory("q_stream_classify")
      val now = System.currentTimeMillis()
      OperatorGates8.stageFile(labeled.filter(col("doc_id") <= split),
        inDir, "b1.parquet", now - 120000)
      OperatorGates8.stageFile(labeled.filter(col("doc_id") > split),
        inDir, "b2.parquet", now - 60000)
      val root = java.nio.file.Files.createTempDirectory("q_stream_cls_out").toString
      val hconf = s.sparkContext.hadoopConfiguration
      val table = new sink.ShardedTable(s"$root/model", "shard", hconf)
      val stream = StreamingIngest.readFileStream(s, labeled.schema,
        inDir.toString, maxFilesPerTrigger = Some(1))
      val q = stream.writeStream
        .foreachBatch { (delta: DataFrame, _: Long) =>
          val hasCurrent = table.currentVersion.isDefined
          val (merged, touched) = TextClassifier.shardedMerge(
            table, hasCurrent, delta, "text", "label", nShards = 32)
          table.commit(merged, touched, full = !hasCurrent)
          ()
        }
        .option("checkpointLocation", s"$root/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (counts, docCounts) = TextClassifier.fromState(table.readCurrent(s))
      val (weights, classInfo) =
        TextClassifier.weightsFromCounts(counts, docCounts)
      val heldOut = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
        .select("doc_id", "text")
      TextClassifier.predictWithMargin(heldOut, "doc_id", "text", weights, classInfo)
        .orderBy("doc_id")
    }),

    // --- retrieval quality evaluation: recall@5 of the IVF index
    //     (nProbe=4 of 8 lists) against the exact brute-force top-5;
    //     the k-bounded hit join, never a re-scoring pass ------------
    "q_ann_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // id-bounded probe workload (the round-9 sf1 lesson: scale the
      // DATA, pin the WORKLOAD — an unbounded probe set makes the
      // exact side probes x corpus = quadratic at scale). No-op at the
      // driver SFs (vec_ids there sit below the bound).
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0 &&
        col("vec_id") < 50000)
      val exact = functions.Similarity.bruteForceTopK(probes, e, k = 5)
      val idx = functions.Ann.sampledIvf(e, k = 8)
      val approx = idx.search(probes, e, k = 5, nProbe = 4)
      operators.RetrievalEval.recallAtK(exact, approx, k = 5)
        .orderBy("query_id")
    }),

    // --- mixture epoch planning: integer repeat-factor plan per
    //     source under a token budget and a 4-epoch repeat cap, run
    //     through the DECLARATIVE op face (ops=mixturePlan) ----------
    "q_mixture_plan" -> ((s, dir) => {
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        s"""ops=mixturePlan
           |op.mixturePlan.groupColumn=source
           |op.mixturePlan.tokColumn=n_chars
           |op.mixturePlan.weights=${MixWeights.toSeq.sorted
             .map { case (g, w) => s"$g:$w" }.mkString(",")}
           |op.mixturePlan.budgetTokens=3000000
           |op.mixturePlan.maxEpochs=4
           |""".stripMargin))
      ops.foldLeft(t(s, dir, "documents").select(col("source"), col("n_chars")))(
          (d, op) => op(d))
        .orderBy("source")
    }),

    // --- SFT thread assembly: sessionize events per user on 2h
    //     silence, role'd turns, token-budget SUFFIX truncation
    //     (keep the most recent turns), role-alternation validation --
    "q_conversation_threads" -> ((s, dir) => {
      import operators.SftPrep
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type").isin("view", "click", "signup"), "user")
            .otherwise("assistant").as("role"),
          concat_ws(" ", col("event_type"), col("props")).as("turn_text"))
        .withColumn("tok", functions.Text.bpeishTokenCount(col("turn_text")))
      SftPrep.assembleThreads(ev, "user_id", "ts", "event_id",
          "role", "turn_text", "tok",
          gapMs = 2 * 3600 * 1000L, budgetTokens = 40L)
        .orderBy("user_id", "session_no")
    }),

    // --- WARC container extraction (WarcCodec): corpus pages packed
    //     5-per-file into real WARC response records (odd files in
    //     the Common Crawl member-per-record gzip layout), then
    //     record-walked + HTTP-split back out on executors. The
    //     oracle replays record numbering, exact HTTP/WARC lengths,
    //     and payload text from the same construction ----------------
    "q_warc_extract" -> ((s, dir) => {
      graft.operators.WarcCodec.records(warcFixture(s, dir)).toDF()
        .select(col("media_id"),
          col("record_no").cast("long").as("record_no"),
          col("warc_type"), col("target_uri"), col("content_type"),
          col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("payload_bytes"), col("payload_text"))
        .orderBy(col("media_id"), col("record_no"))
    }),

    // --- main-content extraction (Text.mainContent): body paragraphs
    //     survive, nav/ad/footer blocks drop on link density — the
    //     boilerplate-removal stage between raw HTML and C4 cleaning.
    //     Fixture wraps each doc's text halves in content <p> blocks
    //     between a link-farm nav, an ad block, and a footer; the
    //     oracle replays block split, per-block clean/link-char
    //     scoring, and reassembly --------------------------------------
    "q_main_content" -> ((s, dir) => {
      import graft.functions.Text
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      val half = (length(col("text")) / 2).cast("int")
      val html = concat(
        lit("<div><nav><a href=\"/h\">Home</a> <a href=\"/a\">About</a> " +
          "<a href=\"/c\">Contact</a></nav></div>"),
        lit("<p>"), col("text").substr(lit(1), half), lit("</p>"),
        lit("<div>ad: <a href=\"/x\">click here right now</a></div>"),
        lit("<p>"), col("text").substr(half + 1, length(col("text"))), lit("</p>"),
        lit("<footer><a href=\"/p\">Privacy</a></footer>"))
      docs.select(col("doc_id"),
          Text.mainContent(html, minChars = 15,
            maxLinkNum = 1, maxLinkDen = 3).as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // --- sitemap URL discovery (Text.sitemapUrls): per-source
    //     sitemap.xml bodies synthesized from the corpus (entity-
    //     escaped query strings), <loc> entries extracted + decoded,
    //     exploded to (source, url). Oracle replays the regexp and
    //     entity chain ------------------------------------------------
    "q_sitemap_urls" -> ((s, dir) => {
      import graft.functions.Text
      val docs = t(s, dir, "documents").filter(col("doc_id") < 250)
      val sitemaps = docs.groupBy(col("source"))
        .agg(concat(
          lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          concat_ws("\n", sort_array(collect_list(concat(
            lit("  <url><loc> https://www."), col("source"),
            lit(".example.com/p/"), col("doc_id"),
            lit("?a=1&amp;b=2 </loc></url>"))))),
          lit("\n</urlset>")).as("xml"))
      sitemaps.select(col("source"),
          explode(Text.sitemapUrls(col("xml"))).as("url"))
        .orderBy(col("source"), col("url"))
    }),

    // --- ZIP container round-trip (ZipCodec): docs packed 5-per-
    //     archive through the central-directory writer, extracted
    //     back via the CD walker with CRC verification — the third
    //     archive container (tar, warc, zip). Oracle replays names/
    //     sizes/text directly -----------------------------------------
    "q_zip_extract" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.ZipCodec
      val archives = t(s, dir, "documents")
        .filter(col("doc_id") < 250)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .groupByKey(_._1 / 5)
        .mapGroups { (fid, docs) =>
          val ms = docs.toSeq.sortBy(_._1).map { case (id, text) =>
            f"docs/$id%012d.txt" ->
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          (fid, ZipCodec.write(ms))
        }
        .toDF("media_id", "content")
      archives.as[(Long, Array[Byte])]
        .flatMap { case (id, c) =>
          ZipCodec.parse(id, c).map { case (name, data) =>
            (id, name, data.length.toLong,
              new String(data, java.nio.charset.StandardCharsets.UTF_8))
          }
        }
        .toDF("media_id", "member", "n_bytes", "text")
        .orderBy(col("media_id"), col("member"))
    }),

    // --- bitext margin mining (BitextMine, Artetxe & Schwenk): pairs
    //     across the label-0/label-1 embedding spaces scored by
    //     cosine RELATIVE to neighborhood density (hub suppression),
    //     quantized margins, mutual-best flags. kNN via brute force
    //     here; the IVF ladder supplies the same tables at scale.
    //     The oracle replays kNN, quantization, and the integer
    //     margin decision ---------------------------------------------
    "q_bitext_mine" -> ((s, dir) => {
      import graft.functions.Similarity
      import graft.operators.BitextMine
      val e = t(s, dir, "embeddings")
      // id-bounded A side (the sf1 lesson: pin the WORKLOAD while the
      // data scales — inactive at driver SFs, linearizes the brute
      // force at replica scale; the corpus-side B stays full)
      val a = e.filter(col("label") === 0 && col("vec_id") < 5000)
        .select("vec_id", "embedding")
      val b = e.filter(col("label") === 1).select("vec_id", "embedding")
      BitextMine.marginPairs(
          Similarity.bruteForceTopK(a, b, k = 4),
          Similarity.bruteForceTopK(b, a, k = 4),
          minMarginNum = 21, minMarginDen = 20)
        .orderBy(col("src_id"))
    }),

    // --- multi-phrase blocklist tagging (PhraseMatch, Aho-Corasick):
    //     ONE automaton pass per doc finds every phrase — the shape
    //     that survives 10^4-phrase blocklists where alternation
    //     regex / per-phrase contains are O(text x phrases). The
    //     oracle brute-forces contains() per phrase ------------------
    "q_phrase_blocklist" -> ((s, dir) => {
      import graft.functions.PhraseMatch
      val phrases = Seq("vector spark", "slow join", "customer data",
        "big hash", "merge batch", "the stream")
      PhraseMatch.tagMatches(
          t(s, dir, "documents").select(col("doc_id"),
            coalesce(col("text"), lit("")).as("text")),
          "text", phrases)
        .select(col("doc_id"),
          concat_ws("|", sort_array(col("matched"))).as("matched"),
          size(col("matched")).cast("long").as("n_matched"))
        .orderBy(col("doc_id"))
    }),

    // --- declarative WebDataset export job (job.type=webdataset):
    //     source parquet -> op chain (length filter) -> ustar shards
    //     staged as files -> ATOMIC snapshot publish; the published
    //     directory is read back through binaryFile + the loader
    //     contract. Oracle replays the filter + shard layout ---------
    "q_webdataset_job" -> ((s, dir) => {
      import graft.operators.TarCodec
      import graft.runner.JobConfig
      val tmp = java.nio.file.Files.createTempDirectory("q_webdataset_job").toString
      t(s, dir, "documents").filter(col("doc_id") < 250)
        .write.parquet(s"$tmp/src")
      val r = JobConfig.runAny(s, JobConfig.parse(
        s"""job.type=webdataset
           |job.name=wds_export
           |source.path=$tmp/src
           |ops=filter
           |op.filter.predicate=n_chars >= 150
           |export.id=doc_id
           |export.text=text
           |export.docsPerShard=5
           |sink.staging=$tmp/staging
           |sink.output=$tmp/out
           |""".stripMargin))
      require(r("published") == "true", s"export failed: $r")
      import org.apache.spark.sql.types._
      // read back the EXACT published paths from the job result — a
      // glob over $tmp/out can race the publish rename
      val published = r("files").split(",").toSeq
      require(published.nonEmpty, s"no shards published: $r")
      val shards = s.read.format("binaryFile").load(published: _*)
        .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("shard_id"), col("content"))
      TarCodec.readWebDataset(shards).toDF()
        .select(col("shard_id"), col("member"), col("n_bytes"), col("text"))
        .orderBy(col("shard_id"), col("member"))
    }),

    // --- FLAGSHIP crawl-curation chain: WARC ingest -> robots.txt
    //     policy gate -> HTML strip -> exact dedup (first id wins) ->
    //     token-count quality floor -> WebDataset shard packaging.
    //     Every stage is an already-gated operator; this chain proves
    //     they COMPOSE (the reference's end-to-end job semantics).
    //     The oracle replays the whole funnel ------------------------
    "q_crawl_curate" -> ((s, dir) => {
      import graft.functions.Text
      import graft.operators.{Robots, TarCodec, WarcCodec}
      // 1. container ingest
      val pages = WarcCodec.records(warcFixture(s, dir)).toDF()
        .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), col("payload_text"))
      // 2. robots policy over the SAME synthetic rule set as
      //    q_robots_filter, URLs keyed by doc_id % 5
      val docs = t(s, dir, "documents")
      val srcs = docs.select(col("source")).distinct()
        .withColumn("i", substring(col("source"), 4, 10).cast("int"))
      val robots = srcs.select(
        concat(lit("www."), col("source"), lit(".example.com")).as("domain"),
        concat(
          lit("User-agent: *\nDisallow: /blocked/\nAllow: /blocked/open\n"),
          when(pmod(col("i"), lit(2)) === 0,
            lit("\nUser-agent: graftbot\nDisallow: /beta/\n")).otherwise(lit("")))
          .as("content"))
      val withUrl = pages.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("crawl_url",
          concat(lit("https://www."), col("source"), lit(".example.com"),
            expr("""CASE CAST(doc_id % 5 AS INT)
                   |  WHEN 0 THEN '/blocked/a' || doc_id
                   |  WHEN 1 THEN '/blocked/open/' || doc_id
                   |  WHEN 2 THEN '/beta/x' || doc_id
                   |  WHEN 3 THEN '/ok/' || doc_id
                   |  ELSE '/' || doc_id END""".stripMargin)))
      val polite = Robots.filterAllowed(withUrl, "crawl_url",
        Robots.rulesTable(robots, "domain", "content"), "graftbot")
      // 3. HTML strip, 4. exact dedup (first doc_id per text wins),
      // 5. quality floor
      val cleaned = polite
        .select(col("doc_id"), Text.stripHtml(col("payload_text")).as("clean"))
      val deduped = cleaned
        .groupBy(col("clean")).agg(min(col("doc_id")).as("doc_id"))
        .filter(Text.tokenCount(col("clean")) >= 20)
      // 6. package for the loader
      TarCodec.readWebDataset(TarCodec.exportWebDataset(
          deduped, "doc_id", "clean", docsPerShard = 5)).toDF()
        .select(col("shard_id"), col("member"), col("n_bytes"))
        .orderBy(col("shard_id"), col("member"))
    }),

    // --- Unigram-LM tokenizer (functions.Unigram): Viterbi GLOBAL
    //     best segmentation (not greedy) under exact-integer piece
    //     evidence learned on the en dictionary; per-language
    //     fertility + total evidence reported. The oracle unrolls
    //     the DP position by position with the identical tie-break --
    "q_unigram_encode" -> ((s, dir) => {
      import functions.{Bpe, Text, Unigram}
      val docs = t(s, dir, "documents")
      val scores = Unigram.learnScores(
        Bpe.wordDict(docs.filter(col("lang") === "en"), "text")
          .select("w", "n"), k = 20, maxLen = 4)
      val enc = Unigram.viterbiEncode(
        Bpe.wordDict(docs, "text").select("w"), scores, maxLen = 4)
      docs.select(col("lang"),
          explode(Text.tokens(coalesce(col("text"), lit(""))))
            .as("w"))
        .join(enc, Seq("w"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).cast("long").as("n_pieces"),
          sum(col("score")).cast("long").as("evidence"))
        .select(col("lang"), col("n_words"), col("n_pieces"), col("evidence"),
          (col("n_pieces").cast("double") / col("n_words"))
            .as("pieces_per_word"))
        .orderBy(col("lang"))
    }),

    // --- WebDataset shard export (TarCodec): the corpus packed as
    //     real ustar shards (GNU-tar-interop-tested codec), 5 docs
    //     per shard with zero-padded member names, then read back
    //     through the loader-side contract — export and re-read must
    //     round-trip every byte. Oracle replays names/sizes/text ----
    "q_webdataset" -> ((s, dir) => {
      import graft.operators.TarCodec
      val docs = t(s, dir, "documents").filter(col("doc_id") < 250)
      val shards = TarCodec.exportWebDataset(docs, "doc_id", "text",
        docsPerShard = 5)
      TarCodec.readWebDataset(shards).toDF()
        .select(col("shard_id"), col("member"), col("n_bytes"), col("text"))
        .orderBy(col("shard_id"), col("member"))
    }),

    // --- WordPiece tokenizer (functions.WordPiece): vocab = corpus
    //     chars + top-20 substrings (len 2-4) by weighted frequency
    //     learned on the en dictionary, then greedy LONGEST-MATCH
    //     encode of the whole-corpus dictionary; per-language
    //     fertility reported (the q_bpe_encode shape, other
    //     algorithm). The oracle re-learns the vocab and unrolls the
    //     greedy match to the corpus' max word length ----------------
    "q_wordpiece" -> ((s, dir) => {
      import functions.{Bpe, Text, WordPiece}
      val docs = t(s, dir, "documents")
      val vocab = WordPiece.learnVocab(
        Bpe.wordDict(docs.filter(col("lang") === "en"), "text")
          .select("w", "n"), k = 20, maxLen = 4)
      val encoded = WordPiece.encode(
        Bpe.wordDict(docs, "text").select("w"), vocab, maxLen = 4)
      docs.select(col("lang"),
          explode(Text.tokens(coalesce(col("text"), lit("")))).as("w"))
        .join(encoded, Seq("w"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).cast("long").as("n_pieces"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          (col("n_pieces").cast("double") / col("n_words"))
            .as("pieces_per_word"))
        .orderBy(col("lang"))
    }),

    // --- robots.txt politeness filter (Robots): per-domain policies
    //     PARSED from real robots.txt text (group runs, comments,
    //     unknown directives), URLs resolved relationally — longest
    //     path match, Allow wins ties, exact-agent group beats * and
    //     SUPPRESSES it. Even-numbered sources publish a graftbot
    //     group, so the same path is blocked on some domains and
    //     allowed on others. The oracle rebuilds the rule table from
    //     the generator formula and replays the decision ------------
    "q_robots_filter" -> ((s, dir) => {
      import operators.Robots
      val docs = t(s, dir, "documents")
      val srcs = docs.select(col("source")).distinct()
        .withColumn("i", substring(col("source"), 4, 10).cast("int"))
      val robots = srcs.select(
        concat(lit("www."), col("source"), lit(".example.com")).as("domain"),
        concat(
          lit("# synthetic policy\nUser-agent: *\nDisallow: /blocked/\nAllow: /blocked/open\n"),
          when(pmod(col("i"), lit(2)) === 0,
            lit("\nUser-agent: graftbot\nDisallow: /beta/\n")).otherwise(lit("")))
          .as("content"))
      val urls = docs.select(col("doc_id"), col("source"),
        concat(lit("https://www."), col("source"), lit(".example.com"),
          expr("""CASE CAST(doc_id % 5 AS INT)
                 |  WHEN 0 THEN '/blocked/a' || doc_id
                 |  WHEN 1 THEN '/blocked/open/' || doc_id
                 |  WHEN 2 THEN '/beta/x' || doc_id
                 |  WHEN 3 THEN '/ok/' || doc_id
                 |  ELSE '/' || doc_id END""".stripMargin)).as("url"))
      Robots.filterAllowed(urls,
          "url", Robots.rulesTable(robots, "domain", "content"), "GraftBot")
        .select(col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    }),

    // --- exact PCA moment statistics (EmbeddingPca.momentStats): the
    //     distributed half of whitening — n, per-dim sums, and the
    //     full Gramian of 2^10-quantized coordinates, integer-exact
    //     and order-free so the oracle replays every entry; the d^3
    //     eigensolve on top is config-sized driver work (spec-tested) -
    "q_embed_covariance" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val (n, sums, gram) = operators.EmbeddingPca.momentStats(e, "embedding", 64)
      val rows = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long)]()
      var k = 0
      var i = 0
      while (i < 64) {
        var j = i
        while (j < 64) {
          rows += ((i, j, n, sums(i), sums(j), gram(k)))
          k += 1
          j += 1
        }
        i += 1
      }
      rows.toSeq.toDF("i", "j", "n", "sum_i", "sum_j", "gram")
        .select(col("i").cast("long"), col("j").cast("long"), col("n"),
          col("sum_i"), col("sum_j"), col("gram"))
        .orderBy("i", "j")
    }),

    // --- STREAMING WARC ingest (binaryFile source + AvailableNow):
    //     crawl files LAND in a directory and stream through the
    //     container walk — the reference's flagship file-ingest shape
    //     (FileBasedSource + streaming mode) over real WARC bytes.
    //     Same oracle as q_warc_extract: streaming == batch ----------
    "q_stream_warc" -> ((s, dir) => {
      import streaming.StreamingIngest
      val tmp = java.nio.file.Files.createTempDirectory("q_stream_warc")
      val inDir = tmp.resolve("in")
      java.nio.file.Files.createDirectories(inDir)
      val inPath = inDir.toString
      warcFixture(s, dir).foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(inPath, f"f${r.getLong(0)}%05d.warc"),
              r.getAs[Array[Byte]](1))
          }
      }
      import org.apache.spark.sql.types._
      val binSchema = StructType(Seq( // binaryFile's fixed schema
        StructField("path", StringType), StructField("modificationTime", TimestampType),
        StructField("length", LongType), StructField("content", BinaryType)))
      val stream = s.readStream.format("binaryFile").schema(binSchema)
        .load(s"$inPath/*.warc")
        .select(regexp_extract(col("path"), "f(\\d+)\\.warc", 1)
          .cast("long").as("media_id"), col("content"))
      val out = graft.operators.WarcCodec.records(stream).toDF()
      StreamingIngest.runAvailableNow(out,
        s"$tmp/out", s"$tmp/ckpt")
      s.read.parquet(s"$tmp/out")
        .select(col("media_id"),
          col("record_no").cast("long").as("record_no"),
          col("warc_type"), col("target_uri"), col("content_type"),
          col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("payload_bytes"), col("payload_text"))
        .orderBy(col("media_id"), col("record_no"))
    }),

    // --- link-graph ranking (LinkRank.pagerank): the crawl-curation
    //     domain-rank signal as 3 exact integer PageRank iterations
    //     over a source graph derived from the corpus — each doc links
    //     its source to the source of its VARIABLE-block head
    //     (block size 2 + doc_id%5), which skews in-links toward
    //     sources of highly-divisible ids so the ranking actually
    //     differentiates. The oracle unrolls the identical iterations
    //     in SQL — integer `div` both sides ---------------------------
    "q_link_rank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val heads = docs.select(col("doc_id").as("head_id"),
        col("source").as("dst"))
      val edges = docs
        .withColumn("head_id", col("doc_id") -
          pmod(col("doc_id"), lit(2) + pmod(col("doc_id"), lit(5))))
        .join(heads, "head_id")
        .select(col("source").as("src"), col("dst"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=linkRank
          |op.linkRank.srcColumn=src
          |op.linkRank.dstColumn=dst
          |op.linkRank.iterations=3
          |""".stripMargin))
      ops.foldLeft(edges)((d, op) => op(d))
        .select(col("node").as("source"), col("rank"))
        .orderBy("source")
    }),

    // --- FLAGSHIP SFT pipeline: a classify job publishes the model,
    //     then a declarative op chain filters the WHOLE corpus through
    //     it (classifyFilter: keep 'pos' predictions with margin >= 1)
    //     and assigns leakage-safe splits. The training label is a
    //     signal the text actually CARRIES (>= 2 occurrences of the
    //     token 'vector' — a class-BALANCED cut, so the linear pool's
    //     prior term can't drown the evidence) and the learned filter
    //     is non-degenerate on holdout docs. The oracle retrains the
    //     classifier, re-scores every doc, and replays the split ------
    "q_sft_pipeline" -> ((s, dir) => {
      import graft.runner.JobConfig
      val docs = t(s, dir, "documents")
      val labeled = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"), col("text"),
          when(size(filter(graft.functions.Text.tokens(col("text")),
            t => t === "vector")) >= 2, "pos").otherwise("neg").as("label"))
      val tmp = java.nio.file.Files.createTempDirectory("q_sft_pipeline").toString
      labeled.write.mode("append").parquet(s"$tmp/src")
      val model = JobConfig.parse(
        s"""job.type=classify
           |job.name=sft_model
           |source.path=$tmp/src
           |classify.text=text
           |classify.label=label
           |classify.seq=doc_id
           |sink.output=$tmp/model
           |state.dir=$tmp/state
           |""".stripMargin)
      require(JobConfig.runAny(s, model)("published") == "true",
        "model build failed")
      val ops = JobConfig.buildOps(JobConfig.parse(
        s"""ops=classifyFilter,assignSplit
           |op.classifyFilter.modelPath=$tmp/model
           |op.classifyFilter.idColumn=doc_id
           |op.classifyFilter.textColumn=text
           |op.classifyFilter.keepLabel=pos
           |op.classifyFilter.minMargin=1
           |op.assignSplit.groupColumn=source
           |op.assignSplit.splits=train:0.8,val:0.1,test:0.1
           |""".stripMargin))
      ops.foldLeft(docs)((d, op) => op(d))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id")
    }),

    // --- STREAMING thread assembly (flatMapGroupsWithState +
    //     EventTimeTimeout — the 1->N custom-state seam): per-user
    //     turn buffering, gap-split sessions, each ASSEMBLED thread
    //     emitted once the watermark strictly passes its end; open
    //     sessions at stream end never emit ---------------------------
    "q_stream_threads" -> ((s, dir) => {
      import streaming.{StreamingIngest, ThreadAssembly}
      StreamingIngest.withStatePartitions(s, 8) {
        val src = s"$dir/events.parquet"
        val rawSchema = s.read.parquet(src).schema
        val inDir = java.nio.file.Files.createTempDirectory("q_stream_threads")
        OperatorGates8.copyRaw(s, src, inDir, "events.parquet")
        import s.implicits._
        val stream = StreamingIngest.readFileStream(s, rawSchema, inDir.toString)
          .withColumn("ts", expr(Tables.tsMillisExpr(rawSchema("ts").dataType)))
          .withWatermark("ts", "0 seconds")
          .select(col("user_id"), col("ts"), expr("unix_millis(ts)").as("ms"),
            col("event_id"),
            when(col("event_type").isin("view", "click", "signup"), "user")
              .otherwise("assistant").as("role"),
            concat_ws(" ", col("event_type"), col("props")).as("text"))
          .as[ThreadAssembly.ThreadTurn]
        val out = ThreadAssembly.assemble(stream, gapMs = 1800000L)
        val tmp = java.nio.file.Files.createTempDirectory("q_stream_threads_out").toString
        StreamingIngest.runAvailableNow(out.toDF(), s"$tmp/data", s"$tmp/ck")
        s.read.parquet(s"$tmp/data")
          .orderBy(col("user_id"), col("session_no"))
      }
    }),

    // --- preference-pair construction: per prompt group (doc_id div
    //     8), chosen = best score, rejected = worst, ascending-id
    //     tie-breaks, groups without a positive margin dropped; run
    //     through the DECLARATIVE op face (ops=preferencePairs) ------
    "q_preference_pairs" -> ((s, dir) => {
      val cands = t(s, dir, "documents")
        .select((col("doc_id") / 8).cast("long").as("prompt_id"),
          col("doc_id"), pmod(col("n_chars"), lit(997)).as("score"))
      val ops = graft.runner.JobConfig.buildOps(graft.runner.JobConfig.parse(
        """ops=preferencePairs
          |op.preferencePairs.groupColumn=prompt_id
          |op.preferencePairs.idColumn=doc_id
          |op.preferencePairs.scoreColumn=score
          |""".stripMargin))
      ops.foldLeft(cands)((d, op) => op(d)).orderBy("prompt_id")
    }),

    // --- leakage-safe split: every SOURCE lands whole in one of
    //     train/val/test (0.8/0.1/0.1 by md5 of the group key) -------
    "q_group_split" -> ((s, dir) => {
      import operators.SftPrep
      SftPrep.assignSplit(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // --- REAL pHash: 20 synthesized 64x64 BMPs decoded pixel-by-pixel,
    //     box-summed to 32x32, quantized-integer DCT, median-threshold
    //     bits; the oracle repeats the transform with the shared table
    "q_phash" -> ((s, dir) => {
      operators.Multimodal.phashBmp(phashMedia(s, dir, phashBlockVal)).toDF()
        .select(col("media_id"),
          lpad(bin(col("phash")), 64, "0").as("phash_bits"))
        .orderBy("media_id")
    }),

    // --- pHash near-dup: group-keyed content (copies → hamming 0),
    //     uniform re-grade on odd images (tiny hamming), banded
    //     hamming join; oracle brute-forces the pair definition ------
    "q_phash_neardup" -> ((s, dir) => {
      val hashes = operators.Multimodal
        .phashBmp(phashMedia(s, dir, phashNeardupVal)).toDF()
        .withColumn("block", lit("all"))
      functions.Similarity.hammingPairs64(hashes, "media_id", "phash", "block",
          maxHamming = 10, collapseIdentical = false)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    })
  )

  /** DuckDB DCT pHash replay over a fixture formula `vSql(doc)` giving
    * the 16x16-block value as SQL over `doc_id` and block coords
    * `bx`/`by` — shared by both pHash oracles.
    */
  private def phashOracleCte(vSql: String): String =
    s"""imgs AS (SELECT doc_id FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
       |dct AS (SELECT ${functions.PerceptualHash.dctSqlLiteral} AS D),
       |g AS (SELECT doc_id, list_transform(range(0, 1024), i ->
       |        12 * ($vSql)) AS gg
       |      FROM imgs),
       |tt AS (SELECT doc_id, list_transform(range(0, 256), k ->
       |        list_sum(list_transform(range(0, 32), x ->
       |          gg[(k % 32) * 32 + x + 1] * D[(k // 32) + 1][x + 1]))) AS tv
       |      FROM g, dct),
       |ff AS (SELECT doc_id, list_transform(range(0, 64), k ->
       |        list_sum(list_transform(range(0, 32), y ->
       |          tv[(k // 8) * 32 + y + 1] * D[(k % 8) + 1][y + 1]))) AS fv
       |      FROM tt, dct),
       |bits AS (SELECT doc_id, fv, list_sort(fv[2:])[32] AS med FROM ff)""".stripMargin

  // fixture block coords from the 32x32 cell index i: pixel x = 2*(i%32),
  // block bx = x/16 = (i%32)//8; same for by
  private val PhashVal =
    "20 + (doc_id * 37 + ((i % 32) // 8) * 53 + ((i // 32) // 8) * 77) % 200"
  private val PhashNeardupVal =
    """20 + (((doc_id // 25) % 5) * 41 + ((i % 32) // 8) * 67 + ((i // 32) // 8) * 83) % 200
      | + CASE WHEN (doc_id // 25) % 2 = 1 THEN 17 ELSE 0 END""".stripMargin

  /** Fixed mixture weights for q_mixture_plan (weight = (i%3)+1 per
    * srcN) — enumerated into the oracle CASE from this same map.
    */
  private[graft] val MixWeights: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> ((i % 3) + 1).toLong).toMap

  /** The classifier train+score replay, parameterized by the held-out
    * filter — q_text_classifier scores everything outside the train
    * slice, q_classifier_incremental scores the %4==1 slice against a
    * model built by count-merge (oracle retrains on the union: green
    * proves merge == rebuild).
    */
  private def classifierOracle(scoreFilter: String): String =
    s"""WITH ${classifierCtes(scoreFilter)}
       |SELECT doc_id, (max({'s': score, 'l': label})).l AS pred_label,
       |  CAST(max(score) AS BIGINT) AS best_score,
       |  CAST(max(score) - min(score) AS BIGINT) AS margin
       |FROM scores GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The train+score CTE chain up to `scores(doc_id, label, score)`,
    * reusable by oracles that post-process predictions.
    */
  private def classifierCtes(scoreFilter: String,
      labelCase: String = "CASE WHEN lang = 'en' THEN 'en' ELSE 'xx' END")
      : String =
    s"""tr AS (
       |  SELECT doc_id, text,
       |    $labelCase AS label
       |  FROM documents WHERE doc_id % 4 = 0),
       |toks AS (SELECT label, unnest($SqlToks) AS token FROM tr),
       |counts AS (SELECT label, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |totals AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot FROM counts GROUP BY 1),
       |vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
       |docsc AS (SELECT label, count(*) AS docs_c FROM tr GROUP BY 1),
       |nd AS (SELECT CAST(sum(docs_c) AS BIGINT) AS dt FROM docsc),
       |ci AS (SELECT d.label,
       |         CAST(floor(CAST(d.docs_c * 1048576 AS DOUBLE) / CAST(dt AS DOUBLE)) AS BIGINT) AS prior,
       |         CAST(floor(CAST(1048576 AS DOUBLE) / CAST(t.tot + v AS DOUBLE)) AS BIGINT) AS w0
       |       FROM docsc d JOIN totals t ON t.label = d.label, nd, vocab),
       |wt AS (SELECT c.label, c.token,
       |         CAST(floor(CAST((c.cnt + 1) * 1048576 AS DOUBLE) / CAST(t.tot + v AS DOUBLE)) AS BIGINT) AS w
       |       FROM counts c JOIN totals t ON c.label = t.label, vocab),
       |ho AS (SELECT doc_id, text FROM documents WHERE $scoreFilter),
       |occ AS (SELECT doc_id, unnest($SqlToks) AS token FROM ho),
       |pc AS (SELECT o.doc_id, ci.label, CAST(sum(coalesce(w.w, ci.w0)) AS BIGINT) AS ts
       |       FROM occ o CROSS JOIN ci
       |       LEFT JOIN wt w ON w.token = o.token AND w.label = ci.label
       |       GROUP BY 1, 2),
       |scores AS (SELECT h.doc_id, ci.label,
       |             ci.prior + coalesce(pc.ts, 0) AS score
       |           FROM ho h CROSS JOIN ci
       |           LEFT JOIN pc ON pc.doc_id = h.doc_id AND pc.label = ci.label)""".stripMargin

  /** Shared WARC-record oracle (q_warc_extract and its streaming
    * face — streaming == batch).
    */
  private val WarcOracle: String =
    """WITH d AS (
      |  SELECT doc_id, coalesce(text, '') AS t, doc_id // 5 AS fid
      |  FROM documents WHERE doc_id < 250),
      |r AS (
      |  SELECT fid, doc_id, t,
      |    row_number() OVER (PARTITION BY fid ORDER BY doc_id) - 1 AS rn
      |  FROM d)
      |SELECT fid AS media_id, CAST(rn AS BIGINT) AS record_no,
      |  'response' AS warc_type,
      |  'https://example.com/doc/' || doc_id AS target_uri,
      |  'application/http;msgtype=response' AS content_type,
      |  CAST(77 + len(CAST(strlen(t) + 13 AS VARCHAR))
      |    + strlen(t) + 13 AS BIGINT) AS content_length,
      |  CAST(200 AS BIGINT) AS http_status,
      |  CAST(strlen(t) + 13 AS BIGINT) AS payload_bytes,
      |  '<html>' || t || '</html>' AS payload_text
      |FROM r ORDER BY media_id, record_no""".stripMargin

  def oracleSql12: Map[String, String] = Map(

    "q_stream_warc" -> WarcOracle,

    "q_main_content" -> {
      val blockRe =
        """</?(?:p|div|nav|footer|header|section|article|li|ul|ol|h[1-6]|table|tr|td)[^>]*>"""
      // fixture is entity-free, so clean = strip tags + collapse
      def clean(e: String): String =
        s"trim(regexp_replace(regexp_replace($e, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
      s"""WITH d AS (
         |  SELECT doc_id, coalesce(text, '') AS t FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    '<div><nav><a href="/h">Home</a> <a href="/a">About</a> '
         |      || '<a href="/c">Contact</a></nav></div>'
         |      || '<p>' || substr(t, 1, len(t) // 2) || '</p>'
         |      || '<div>ad: <a href="/x">click here right now</a></div>'
         |      || '<p>' || substr(t, len(t) // 2 + 1) || '</p>'
         |      || '<footer><a href="/p">Privacy</a></footer>' AS html
         |  FROM d),
         |b AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(html, '$blockRe'), x ->
         |      len(${clean("x")}) >= 15
         |      AND coalesce(list_sum(list_transform(
         |            regexp_extract_all(x, '(?s)<a[^>]*>(.*?)</a>', 1),
         |            a -> len(${clean("a")}))), 0) * 3
         |          <= len(${clean("x")}) * 1) AS kept
         |  FROM h)
         |SELECT doc_id,
         |  trim(regexp_replace(array_to_string(
         |    list_transform(kept, x -> ${clean("x")}), ' '),
         |    '\\s+', ' ', 'g')) AS extracted
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "q_sitemap_urls" ->
      """SELECT source,
        |  'https://www.' || source || '.example.com/p/' || doc_id
        |    || '?a=1&b=2' AS url
        |FROM documents WHERE doc_id < 250
        |ORDER BY source, url""".stripMargin,

    "q_zip_extract" ->
      """SELECT doc_id // 5 AS media_id,
        |  'docs/' || printf('%012d.txt', doc_id) AS member,
        |  CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
        |  coalesce(text, '') AS text
        |FROM documents WHERE doc_id < 250
        |ORDER BY media_id, member""".stripMargin,

    "q_bitext_mine" ->
      """WITH ea AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE label = 0 AND vec_id < 5000),
        |eb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE label = 1),
        |simab AS (
        |  SELECT a.vec_id AS qa, b.vec_id AS nb,
        |    list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e))
        |      * sqrt(list_dot_product(b.e, b.e))) AS sim
        |  FROM ea a CROSS JOIN eb b WHERE a.vec_id <> b.vec_id),
        |simba AS (
        |  SELECT b.vec_id AS qb, a.vec_id AS na,
        |    list_dot_product(b.e, a.e) / (sqrt(list_dot_product(b.e, b.e))
        |      * sqrt(list_dot_product(a.e, a.e))) AS sim
        |  FROM eb b CROSS JOIN ea a WHERE b.vec_id <> a.vec_id),
        |tab AS (
        |  SELECT qa, nb, CAST(floor(sim * 1048576) AS BIGINT) AS qsim,
        |    row_number() OVER (PARTITION BY qa ORDER BY sim DESC, nb) AS rn
        |  FROM simab QUALIFY rn <= 4),
        |tba AS (
        |  SELECT qb, na, CAST(floor(sim * 1048576) AS BIGINT) AS qsim,
        |    row_number() OVER (PARTITION BY qb ORDER BY sim DESC, na) AS rn
        |  FROM simba QUALIFY rn <= 4),
        |da AS (SELECT qa, CAST(sum(qsim) AS BIGINT) AS sum_a,
        |         count(*) AS n_a FROM tab GROUP BY qa),
        |db AS (SELECT qb, CAST(sum(qsim) AS BIGINT) AS sum_b,
        |         count(*) AS n_b FROM tba GROUP BY qb),
        |fwd AS (SELECT qa AS src_id, nb AS dst_id, qsim FROM tab WHERE rn = 1),
        |back AS (SELECT qb AS dst_id, na AS best_src FROM tba WHERE rn = 1)
        |SELECT f.src_id, f.dst_id, f.qsim,
        |  CAST((2 * f.qsim * da.n_a * db.n_b * 1048576)
        |    // (da.sum_a * db.n_b + db.sum_b * da.n_a) AS BIGINT) AS margin_q,
        |  coalesce(b2.best_src = f.src_id, FALSE) AS mutual
        |FROM fwd f
        |JOIN da ON da.qa = f.src_id
        |JOIN db ON db.qb = f.dst_id
        |LEFT JOIN back b2 ON b2.dst_id = f.dst_id
        |WHERE f.qsim > 0 AND (da.sum_a * db.n_b + db.sum_b * da.n_a) > 0
        |  AND 2 * f.qsim * da.n_a * db.n_b * 20
        |      >= 21 * (da.sum_a * db.n_b + db.sum_b * da.n_a)
        |ORDER BY f.src_id""".stripMargin,

    "q_phrase_blocklist" ->
      """WITH ph AS (
        |  SELECT unnest(['vector spark', 'slow join', 'customer data',
        |                 'big hash', 'merge batch', 'the stream']) AS phrase)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list(phrase)
        |      FILTER (phrase IS NOT NULL)), '|'), '') AS matched,
        |  CAST(count(phrase) AS BIGINT) AS n_matched
        |FROM (
        |  SELECT d.doc_id,
        |    CASE WHEN contains(coalesce(d.text, ''), p.phrase)
        |         THEN p.phrase END AS phrase
        |  FROM documents d CROSS JOIN ph p)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_webdataset_job" ->
      """SELECT doc_id // 5 AS shard_id, printf('%012d.txt', doc_id) AS member,
        |  CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
        |  coalesce(text, '') AS text
        |FROM documents WHERE doc_id < 250 AND n_chars >= 150
        |ORDER BY shard_id, member""".stripMargin,

    "q_crawl_curate" ->
      """WITH base AS (
        |  SELECT doc_id, source, coalesce(text, '') AS t
        |  FROM documents WHERE doc_id < 250),
        |s AS (
        |  SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS i
        |  FROM documents),
        |rules AS (
        |  SELECT source, '*' AS agent, FALSE AS allow, '/blocked/' AS path FROM s
        |  UNION ALL SELECT source, '*', TRUE, '/blocked/open' FROM s
        |  UNION ALL SELECT source, 'graftbot', FALSE, '/beta/' FROM s WHERE i % 2 = 0),
        |u AS (
        |  SELECT b.*, CASE doc_id % 5
        |      WHEN 0 THEN '/blocked/a' || doc_id
        |      WHEN 1 THEN '/blocked/open/' || doc_id
        |      WHEN 2 THEN '/beta/x' || doc_id
        |      WHEN 3 THEN '/ok/' || doc_id
        |      ELSE '/' || doc_id END AS p
        |  FROM base b),
        |grp AS (
        |  SELECT source, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS hx
        |  FROM rules GROUP BY 1),
        |appl AS (
        |  SELECT r.source, r.allow, r.path
        |  FROM rules r JOIN grp g ON g.source = r.source
        |  WHERE (g.hx = 1 AND r.agent = 'graftbot')
        |     OR (g.hx = 0 AND r.agent = '*')),
        |polite AS (
        |  SELECT u.doc_id, u.t,
        |    (max({'l': len(a.path), 'a': a.allow})).a AS verdict,
        |    count(a.path) AS nm
        |  FROM u LEFT JOIN appl a
        |    ON a.source = u.source AND starts_with(u.p, a.path)
        |  GROUP BY 1, 2),
        |dedup AS (
        |  SELECT t, min(doc_id) AS doc_id FROM polite
        |  WHERE nm = 0 OR verdict GROUP BY t),
        |kept AS (
        |  SELECT doc_id, t FROM dedup
        |  WHERE len(list_filter(string_split(t, ' '), x -> len(x) > 0)) >= 20)
        |SELECT doc_id // 5 AS shard_id, printf('%012d.txt', doc_id) AS member,
        |  CAST(strlen(t) AS BIGINT) AS n_bytes
        |FROM kept ORDER BY shard_id, member""".stripMargin,

    "q_unigram_encode" -> {
      // Viterbi unroll to max word length 8: layer p computes the
      // best (score, np) ending at position p from candidates
      // j = p-1 (single char, score-0 fallback) and j = p-2..p-4
      // (vocab pieces); ties prefer smaller j via mj = -j in the
      // comparison struct. One LEFT JOIN per candidate (piece keys
      // unique), greatest() ignores NULL candidates.
      val layers = (2 to 8).map { p =>
        val joins = (math.max(0, p - 4) until p).map { j =>
          val l = p - j
          s"""LEFT JOIN sc a${p}_$j
             |  ON len(v.w) >= $p AND a${p}_$j.piece = substr(v.w, ${j + 1}, $l)"""
            .stripMargin
        }.mkString("\n")
        val cands = (math.max(0, p - 4) until p).map { j =>
          // position 0 is the DP base: score 0, zero pieces; the
          // struct compares lexicographically (fewest pieces via mn =
          // -np, then evidence, then longest final piece via mj = -j)
          val (sj, nj) = if (j == 0) ("0", "0") else (s"v.s$j", s"v.n$j")
          if (p - j == 1)
            s"{'mn': -($nj + 1), 's': $sj + coalesce(a${p}_$j.score, 0), 'mj': ${-j}}"
          else
            s"""CASE WHEN a${p}_$j.piece IS NOT NULL
               | THEN {'mn': -($nj + 1), 's': $sj + a${p}_$j.score, 'mj': ${-j}}
               | END""".stripMargin
        }.mkString(",\n      ")
        s"""v$p AS (
           |  SELECT v.*, CASE WHEN len(v.w) >= $p THEN list_aggregate([
           |      $cands], 'max') END AS b$p
           |  FROM v${p - 1} v
           |$joins),
           |w$p AS (SELECT * EXCLUDE (b$p), (b$p).s AS s$p, -((b$p).mn) AS n$p
           |        FROM v$p)""".stripMargin
      }
      // rename: layer p reads from w{p-1} except p=2 reads v1-as-w1
      val chain = layers.zipWithIndex.map { case (sql, idx) =>
        val p = idx + 2
        sql.replace(s"FROM v${p - 1} v", s"FROM w${p - 1} v")
      }.mkString(",\n")
      val pick = (c: String) => (1 to 8).map(p =>
        s"WHEN $p THEN $c$p").mkString(" ")
      s"""WITH dtoks AS (
         |  SELECT lang, list_filter(string_split(coalesce(text, ''), ' '),
         |                           x -> len(x) > 0) AS l
         |  FROM documents),
         |words AS (
         |  SELECT w, count(*) AS n
         |  FROM (SELECT unnest(l) AS w FROM dtoks WHERE lang = 'en') GROUP BY w),
         |subs AS (
         |  SELECT piece, CAST(sum(n) AS BIGINT) AS score FROM (
         |    SELECT n, substr(w, p, q) AS piece
         |    FROM words, range(1, 9) r1(p), range(1, 5) r2(q)
         |    WHERE p + q - 1 <= len(w)) GROUP BY piece),
         |sc AS (
         |  SELECT piece, score FROM subs WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, score FROM (
         |    SELECT piece, score FROM subs WHERE len(piece) >= 2
         |    ORDER BY score DESC, piece LIMIT 20)),
         |aw AS (SELECT DISTINCT unnest(l) AS w FROM dtoks),
         |w1 AS (
         |  SELECT aw.w, coalesce(c1.score, 0) AS s1, 1 AS n1
         |  FROM aw LEFT JOIN sc c1 ON c1.piece = substr(aw.w, 1, 1)),
         |$chain,
         |enc AS (
         |  SELECT w, CASE len(w) ${pick("n")} END AS np,
         |            CASE len(w) ${pick("s")} END AS sco
         |  FROM w8),
         |toklang AS (SELECT lang, unnest(l) AS w FROM dtoks)
         |SELECT lang, count(*) AS n_words,
         |  CAST(sum(e.np) AS BIGINT) AS n_pieces,
         |  CAST(sum(e.sco) AS BIGINT) AS evidence,
         |  CAST(sum(e.np) AS DOUBLE) / count(*) AS pieces_per_word
         |FROM toklang t JOIN enc e ON t.w = e.w
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q_webdataset" ->
      """SELECT doc_id // 5 AS shard_id, printf('%012d.txt', doc_id) AS member,
        |  CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
        |  coalesce(text, '') AS text
        |FROM documents WHERE doc_id < 250
        |ORDER BY shard_id, member""".stripMargin,

    "q_wordpiece" -> {
      // greedy longest-match unrolled to the corpus' max word length
      // (8): each layer advances active words by the longest matching
      // piece (vocab pieces are len 2-4; no match = consume 1 char)
      val layers = (1 to 8).map { i =>
        s"""e$i AS (
           |  SELECT e.w, CASE WHEN e.pos <= len(e.w)
           |      THEN e.pos + coalesce(max(len(v.piece)), 1) ELSE e.pos END AS pos,
           |    CASE WHEN e.pos <= len(e.w) THEN e.np + 1 ELSE e.np END AS np
           |  FROM e${i - 1} e LEFT JOIN topv v
           |    ON v.piece = substr(e.w, e.pos, len(v.piece))
           |  GROUP BY e.w, e.pos, e.np)""".stripMargin
      }.mkString(",\n")
      s"""WITH dtoks AS (
         |  SELECT lang, list_filter(string_split(coalesce(text, ''), ' '),
         |                           x -> len(x) > 0) AS l
         |  FROM documents),
         |words AS (
         |  SELECT w, count(*) AS n
         |  FROM (SELECT unnest(l) AS w FROM dtoks WHERE lang = 'en') GROUP BY w),
         |subs AS (
         |  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |    SELECT n, substr(w, p, q) AS piece
         |    FROM words, range(1, 9) r1(p), range(2, 5) r2(q)
         |    WHERE p + q - 1 <= len(w)) GROUP BY piece),
         |topv AS (SELECT piece FROM subs ORDER BY cnt DESC, piece LIMIT 20),
         |aw AS (SELECT DISTINCT unnest(l) AS w FROM dtoks),
         |e0 AS (SELECT w, 1 AS pos, 0 AS np FROM aw),
         |$layers,
         |enc AS (SELECT w, np FROM e8),
         |toklang AS (SELECT lang, unnest(l) AS w FROM dtoks)
         |SELECT lang, count(*) AS n_words,
         |  CAST(sum(e.np) AS BIGINT) AS n_pieces,
         |  CAST(sum(e.np) AS DOUBLE) / count(*) AS pieces_per_word
         |FROM toklang t JOIN enc e ON t.w = e.w
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q_robots_filter" ->
      """WITH s AS (
        |  SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS i
        |  FROM documents),
        |rules AS (
        |  SELECT source, '*' AS agent, FALSE AS allow, '/blocked/' AS path FROM s
        |  UNION ALL SELECT source, '*', TRUE, '/blocked/open' FROM s
        |  UNION ALL SELECT source, 'graftbot', FALSE, '/beta/' FROM s WHERE i % 2 = 0),
        |u AS (
        |  SELECT doc_id, source,
        |    CASE doc_id % 5
        |      WHEN 0 THEN '/blocked/a' || doc_id
        |      WHEN 1 THEN '/blocked/open/' || doc_id
        |      WHEN 2 THEN '/beta/x' || doc_id
        |      WHEN 3 THEN '/ok/' || doc_id
        |      ELSE '/' || doc_id END AS p
        |  FROM documents),
        |grp AS (
        |  SELECT source, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS hx
        |  FROM rules GROUP BY 1),
        |appl AS (
        |  SELECT r.source, r.allow, r.path
        |  FROM rules r JOIN grp g ON g.source = r.source
        |  WHERE (g.hx = 1 AND r.agent = 'graftbot')
        |     OR (g.hx = 0 AND r.agent = '*')),
        |m AS (
        |  SELECT u.doc_id, u.source, u.p,
        |    (max({'l': len(a.path), 'a': a.allow})).a AS verdict,
        |    count(a.path) AS nm
        |  FROM u LEFT JOIN appl a
        |    ON a.source = u.source AND starts_with(u.p, a.path)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |  'https://www.' || source || '.example.com' || p AS url
        |FROM m WHERE nm = 0 OR verdict ORDER BY doc_id""".stripMargin,

    "q_embed_covariance" ->
      """WITH x AS (
        |  SELECT list_transform(embedding, v ->
        |    CAST(floor(CAST(v AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (SELECT unnest(range(0, 64)) AS i),
        |s AS (SELECT i, CAST(sum(q[i + 1]) AS BIGINT) AS sm
        |      FROM x, dims GROUP BY i),
        |n AS (SELECT count(*) AS n FROM x),
        |g AS (SELECT d1.i AS i, d2.i AS j,
        |        CAST(sum(x.q[d1.i + 1] * x.q[d2.i + 1]) AS BIGINT) AS gram
        |      FROM x, dims d1, dims d2 WHERE d1.i <= d2.i GROUP BY 1, 2)
        |SELECT g.i, g.j, n.n, si.sm AS sum_i, sj.sm AS sum_j, g.gram
        |FROM g, n
        |JOIN s si ON si.i = g.i
        |JOIN s sj ON sj.i = g.j
        |ORDER BY g.i, g.j""".stripMargin,

    "q_text_classifier" -> classifierOracle("doc_id % 4 <> 0"),

    "q_classifier_incremental" -> classifierOracle("doc_id % 4 = 1"),

    // the job and streaming faces share the incremental oracle: the
    // published model was built by count-merge epochs/batches, the
    // oracle retrains once
    "q_classify_job" -> classifierOracle("doc_id % 4 = 1"),
    "q_stream_classify" -> classifierOracle("doc_id % 4 = 1"),

    "q_crawl_ingest" ->
      """SELECT doc_id, 'example.com' AS domain,
        |  CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(len(coalesce(text, '')) AS BIGINT) AS clean_chars
        |FROM documents WHERE doc_id < 250 ORDER BY doc_id""".stripMargin,

    "q_warc_extract" -> WarcOracle,

    "q_link_rank" -> {
      def iter(prev: String, out: String): String =
        s"""$out AS (SELECT n.node, 157286 + coalesce(m.mass, 0) AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(sum((17 * r.rank) // (20 * od.outdeg)) AS BIGINT) AS mass
           |    FROM e JOIN od ON od.src = e.src JOIN $prev r ON r.node = e.src
           |    GROUP BY 1) m ON m.node = n.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT a.source AS src, b.source AS dst
         |  FROM documents a JOIN documents b
         |    ON b.doc_id = a.doc_id - a.doc_id % (2 + a.doc_id % 5)),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, CAST(1048576 AS BIGINT) AS rank FROM nodes),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node AS source, CAST(rank AS BIGINT) AS rank FROM r3
         |ORDER BY source""".stripMargin
    },

    "q_sft_pipeline" -> {
      import operators.Converters.fractionCut
      s"""WITH ${classifierCtes("1 = 1",
             s"CASE WHEN len(list_filter($SqlToks, x -> x = 'vector')) >= 2 THEN 'pos' ELSE 'neg' END")},
         |pred AS (SELECT doc_id, (max({'s': score, 'l': label})).l AS pl,
         |    CAST(max(score) - min(score) AS BIGINT) AS mg
         |  FROM scores GROUP BY doc_id),
         |keep AS (SELECT doc_id FROM pred WHERE pl = 'pos' AND mg >= 1)
         |SELECT d.doc_id, d.source,
         |  CASE WHEN substring(md5('graft|' || d.source), 1, 4) < '${fractionCut(0.8)}' THEN 'train'
         |       WHEN substring(md5('graft|' || d.source), 1, 4) < '${fractionCut(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d JOIN keep USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_ann_recall" -> OracleSql.annRecall(k = 5, nProbe = 4,
      nCentroids = 8, probeMod = 100, probeBound = 50000L),

    "q_mixture_plan" -> {
      val wsum = MixWeights.values.sum
      val cases = MixWeights.toSeq.sortBy(_._1)
        .map { case (g, w) => s"WHEN '$g' THEN ${w}" }.mkString(" ")
      s"""WITH m AS (
         |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
         |  FROM documents GROUP BY 1),
         |w AS (SELECT source, mass,
         |    CAST(CASE source $cases ELSE 0 END AS BIGINT) AS weight FROM m),
         |c AS (SELECT *, (3000000 * weight) // $wsum AS target FROM w),
         |d AS (SELECT *, CASE WHEN mass = 0 THEN 0
         |    ELSE (target * 1024 + mass - 1) // mass END AS eq FROM c),
         |e AS (SELECT *, least(eq, 4 * 1024) AS epochs_q FROM d)
         |SELECT source, mass, weight, target, CAST(epochs_q AS BIGINT) AS epochs_q,
         |  CAST((mass * epochs_q) // 1024 AS BIGINT) AS planned_tokens,
         |  CAST(greatest(target - (mass * epochs_q) // 1024, 0) AS BIGINT) AS shortfall
         |FROM e ORDER BY source""".stripMargin
    },

    "q_conversation_threads" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms,
        |    CASE WHEN event_type IN ('view', 'click', 'signup')
        |         THEN 'user' ELSE 'assistant' END AS role,
        |    event_type || ' ' || props AS turn_text,
        |    CAST(len(regexp_extract_all(event_type || ' ' || props,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS tok
        |  FROM events),
        |s1 AS (SELECT *,
        |    CASE WHEN ms - lag(ms) OVER w > 7200000
        |           OR lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s2 AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM s1),
        |s3 AS (SELECT *,
        |    row_number() OVER tw AS turn_no,
        |    sum(tok) OVER (PARTITION BY user_id, session_no ORDER BY ms, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suffix_toks
        |  FROM s2 WINDOW tw AS (PARTITION BY user_id, session_no ORDER BY ms, event_id)),
        |kept AS (SELECT *, lag(role) OVER (PARTITION BY user_id, session_no
        |    ORDER BY turn_no) AS prev_role
        |  FROM s3 WHERE suffix_toks <= 40),
        |ka AS (SELECT user_id, session_no,
        |    CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(tok) AS BIGINT) AS kept_tokens,
        |    string_agg(role || ': ' || turn_text, chr(10) ORDER BY turn_no) AS thread_text,
        |    ((min({'t': turn_no, 'r': role})).r = 'user'
        |      AND coalesce(bool_and(role <> prev_role), TRUE)) AS roles_ok
        |  FROM kept GROUP BY 1, 2),
        |alln AS (SELECT user_id, session_no, CAST(count(*) AS BIGINT) AS n_turns
        |  FROM s3 GROUP BY 1, 2)
        |SELECT a.user_id, a.session_no, a.n_turns,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.kept_tokens, 0) AS kept_tokens,
        |  coalesce(k.roles_ok, FALSE) AS roles_ok,
        |  coalesce(k.thread_text, '') AS thread_text
        |FROM alln a LEFT JOIN ka k USING (user_id, session_no)
        |ORDER BY user_id, session_no""".stripMargin,

    "q_stream_threads" ->
      // gap sessionization + thread assembly; append mode emitted
      // exactly the sessions whose end (last turn + gap) is STRICTLY
      // below the final watermark (max ms-truncated event time, 0s
      // delay) — the documented ThreadAssembly contract
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms,
        |    CASE WHEN event_type IN ('view', 'click', 'signup')
        |         THEN 'user' ELSE 'assistant' END AS role,
        |    event_type || ' ' || props AS txt
        |  FROM events),
        |mx AS (SELECT max(ms) AS max_ms FROM ev),
        |brk AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS b
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sess AS (SELECT *, SUM(b) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM brk),
        |agg AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_turns,
        |    min(ms) AS start_ms, max(ms) + 1800000 AS end_ms,
        |    string_agg(role || ': ' || txt, chr(10) ORDER BY ms, event_id) AS thread_text
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_ms) AS BIGINT) AS session_no,
        |  n_turns, start_ms, end_ms, thread_text
        |FROM agg, mx WHERE end_ms < max_ms
        |ORDER BY user_id, session_no""".stripMargin,

    "q_preference_pairs" ->
      """WITH c AS (
        |  SELECT doc_id // 8 AS prompt_id, doc_id, n_chars % 997 AS score
        |  FROM documents),
        |a AS (SELECT prompt_id,
        |    (max({'s': score, 'ni': -doc_id})).ni AS cni,
        |    max(score) AS chosen_score,
        |    (min({'s': score, 'i': doc_id})).i AS rejected_id,
        |    min(score) AS rejected_score,
        |    CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM c GROUP BY 1)
        |SELECT prompt_id, -cni AS chosen_id, chosen_score, rejected_id,
        |  rejected_score, n_candidates,
        |  chosen_score - rejected_score AS margin
        |FROM a
        |WHERE n_candidates >= 2 AND chosen_score - rejected_score >= 1
        |ORDER BY prompt_id""".stripMargin,

    "q_group_split" -> {
      import operators.Converters.fractionCut
      s"""SELECT source,
         |  CASE WHEN substring(md5('graft|' || source), 1, 4) < '${fractionCut(0.8)}' THEN 'train'
         |       WHEN substring(md5('graft|' || source), 1, 4) < '${fractionCut(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY source""".stripMargin
    },

    "q_phash" ->
      s"""WITH ${phashOracleCte(PhashVal)}
         |SELECT doc_id AS media_id,
         |  array_to_string(list_transform(range(0, 64), i ->
         |    CASE WHEN i >= 1 AND fv[i + 1] > med THEN 1 ELSE 0 END), '') AS phash_bits
         |FROM bits ORDER BY media_id""".stripMargin,

    "q_phash_neardup" ->
      s"""WITH ${phashOracleCte(PhashNeardupVal)},
         |hb AS (SELECT doc_id, list_transform(range(0, 64), i ->
         |    CASE WHEN i >= 1 AND fv[i + 1] > med THEN 1 ELSE 0 END) AS b
         |  FROM bits),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(list_sum(list_transform(range(0, 64), i ->
         |      CASE WHEN a.b[i + 1] <> b.b[i + 1] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
         |  FROM hb a JOIN hb b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs
         |WHERE hamming <= 10 ORDER BY id_a, id_b""".stripMargin
  )
}
