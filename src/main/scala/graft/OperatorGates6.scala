package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Converters

/** Round-4 wave 6: the config-management subsystem (dataset config
  * store with import/inheritance resolution — the reference's
  * `gobblin-config-management` module) and the n-gram LM quality
  * scorer for the training-data pipeline. Query side runs the real
  * machinery; the oracle replays the resolution/arithmetic
  * independently in DuckDB.
  */
object OperatorGates6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 16 out-of-vocabulary tokens planted on every 7th document by the
    * governed-pipeline gate (single source of truth for both engines).
    */
  val Garble: String = Seq.fill(8)("zzq qzz").mkString(" ", " ", "")

  /** 4-token variant: a milder corruption, so tercile bucketing has a
    * genuine middle band to find.
    */
  val GarbleShort: String = " zzq qzz qzz zzq"

  def queries6: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- config store resolve (ref gobblin-config-management:
    //     ConfigStoreBackedValueInspector.java:111-141 precedence,
    //     SimpleHadoopFilesystemConfigStore.java:87-128 FS layout):
    //     deploy TWO store versions to a temp FS tree — a stale decoy
    //     and the real one — open the CURRENT version, and batch-
    //     resolve one dataset node per nation. Per-nation import sets
    //     exercise every precedence rule: own > first import (and its
    //     whole ancestor chain) > second import > parent > root. The
    //     oracle restates the expected winner of every (path, key)
    //     from the nation table alone ------------------------------
    "q_config_resolve" -> ((s, dir) => {
      import graft.runner.ConfigStore
      import graft.runner.ConfigStore.Node
      val tmp = tmpDir("graft_cfgstore")
      // nation is a fixed-size dimension (25 rows at every SF):
      // bounded driver metadata, same class as seeds/offsets elsewhere
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .collect().map(r => (r.get(0).toString.toLong, r.getString(1)))
        .sortBy(_._1)
      val stale = Map(
        "/" -> Node(Vector("retention.days" -> "1", "owner" -> "stale")))
      val shared = Map(
        "/" -> Node(Vector("retention.days" -> "365", "owner" -> "root-team")),
        "/datasets" -> Node(Vector("owner" -> "data-team")),
        "/tags" -> Node(),
        "/tags/hot" -> Node(Vector(
          "retention.days" -> "30", "priority" -> "high")),
        "/tags/cold" -> Node(Vector(
          "retention.days" -> "3650", "tier" -> "archive")))
      val dsNodes = nations.map { case (k, name) =>
        val imports = (k % 3) match {
          case 0 => Vector("/tags/hot")
          case 1 => Vector("/tags/cold", "/tags/hot")
          case _ => Vector.empty[String]
        }
        s"/datasets/${name.toLowerCase}" ->
          Node(Vector("nation.key" -> k.toString), imports)
      }.toMap
      ConfigStore.deployFs(tmp, "v0.9", stale)
      ConfigStore.deployFs(tmp, "v1.0", shared ++ dsNodes)
      val cs = ConfigStore.openFs(tmp) // must pick v1.0, not the decoy
      cs.resolveAll(s, dsNodes.keys.toSeq.sorted)
        .orderBy(col("path"), col("key"))
    }),

    // --- dataset lineage events (ref gobblin-metrics-base
    //     LineageInfo.java:86-311): a REAL forked pipeline — events
    //     split into two branches, each staged+published through the
    //     Publisher with its row count observed on the write — records
    //     source + per-branch destinations in the state store; the
    //     lineage events load back as a DataFrame. The oracle recomputes
    //     each branch's row count from the events table -------------
    "q_lineage" -> ((s, dir) => {
      import graft.metrics.Lineage
      import graft.metrics.Lineage.Descriptor
      import graft.sink.{Publisher, SinkSpec}
      import graft.state.FsStateStore
      val tmp = tmpDir("graft_lineage")
      val store = new FsStateStore(s"$tmp/state")
      val publisher = new Publisher(s.sparkContext.hadoopConfiguration)
      val events = t(s, dir, "events")
      Lineage.setSource(store, "lineage_job", "events",
        Descriptor("file", "events"))
      Seq(
        ("purchase", col("event_type") === "purchase"),
        ("other", col("event_type") =!= "purchase")
      ).zipWithIndex.foreach { case ((name, pred), i) =>
        val obs = org.apache.spark.sql.Observation()
        val spec = SinkSpec(s"$tmp/stg_$name", s"$tmp/out_$name")
        publisher.writeStaged(
          events.filter(pred).observe(obs, count(lit(1)).as("rows")), spec)
        publisher.publish(spec)
        Lineage.putDestination(store, "lineage_job", i,
          Descriptor("file", s"events_$name"),
          obs.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L))
      }
      Lineage.load(s, store, Seq("lineage_job")).orderBy(col("branch"))
    }),

    // --- mergeable HLL sketches (Datasketches via Spark natives):
    //     per-type user sketches UNION into a global estimate without
    //     re-scanning — the property that lets 1000 executors sketch
    //     independently. Gate checks each estimate against the exact
    //     count within the sketch's error bound ---------------------
    "q_sketch_union" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
      // no persist: perType is a 5-row aggregate, recomputing beats
      // pinning cache blocks in the shared gate session
      val perType = e.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count_distinct(col("user_id")).as("n_exact"))
      val typeRows = perType
        .select(col("event_type").as("scope"), col("n_exact"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_exact"))
            <= col("n_exact") * 0.05).as("est_in_bound"))
      val allRow = perType
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(e.agg(count_distinct(col("user_id")).as("n_exact")))
        .select(lit("__all__").as("scope"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("est_in_bound"))
      typeRows.unionAll(allRow).orderBy(col("scope"))
    }),

    // --- job lock (ref gobblin-runtime FileBasedJobLock.java:40):
    //     one run of a named job at a time — attempt 1 runs under the
    //     lock, attempt 2 is denied while a second holder has it,
    //     attempt 3 runs after release. n_rows is real work done
    //     under the lock --------------------------------------------
    "q_job_lock" -> ((s, dir) => {
      import graft.runner.JobLock
      import s.implicits._
      val dir0 = tmpDir("graft_joblock")
      val runner = new JobLock(dir0, "agg_job")
      val other = new JobLock(dir0, "agg_job")
      def runJob(): Long =
        t(s, dir, "events").filter(col("event_type") === "purchase").count()
      val r1 = runner.withLock(runJob())
      require(other.tryAcquire(), "second holder must acquire after release")
      val r2 = runner.withLock(runJob())
      require(r2.isEmpty, "run must be denied while the lock is held")
      other.release()
      val r3 = runner.withLock(runJob())
      Seq(
        (1, r1.isDefined, r1.getOrElse(0L)),
        (2, r2.isDefined, r2.getOrElse(0L)),
        (3, r3.isDefined, r3.getOrElse(0L)))
        .toDF("attempt", "acquired", "n_rows").orderBy(col("attempt"))
    }),

    // --- inverted index build (decontamination/search substrate):
    //     token -> (document frequency, first-k posting list). The
    //     posting list is MinKLongs — a deterministic bounded collect,
    //     so a stopword token costs O(k) aggregation memory instead of
    //     O(corpus), and the oracle replays it as sorted-list-prefix -
    "q_inverted_index" -> ((s, dir) => {
      import graft.functions.{MinKLongs, Text}
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(Text.tokens(coalesce(col("text"), lit("")))))
            .as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"), MinKLongs(col("doc_id"), 8).as("p"))
        .filter(col("df") >= 50)
        .select(col("token"), col("df"),
          concat_ws(",", transform(col("p"), _.cast("string"))).as("postings"))
        .orderBy(col("token"))
    }),

    // --- Z-order layout keys (data skipping at 100 TB): Morton-
    //     interleave two 16-bit dimensions with native bit columns,
    //     bucket by key prefix, and report each bucket's span in BOTH
    //     dimensions — the per-bucket min/max that row-group pruning
    //     would use. Oracle replays the interleave with integer bit
    //     ops ------------------------------------------------------
    "q_zorder_layout" -> ((s, dir) => {
      import graft.functions.ZOrder
      val x = pmod(col("user_id"), lit(65536)).cast("long")
      val y = pmod(floor(col("value") * 1000).cast("long"), lit(65536))
      t(s, dir, "events")
        .select(ZOrder.zkey16(x, y).as("z"), x.as("x"), y.as("y"))
        .withColumn("zbucket", shiftright(col("z"), 22))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("zbucket"))
    }),

    // --- streaming exactly-once (6th streaming gate): foreachBatch
    //     ingest with atomic partition overwrite, run TWICE — the
    //     second run replays the whole stream from a fresh checkpoint
    //     (a crash that lost the checkpoint after publish). Counts
    //     must match a single batch pass: replay converges instead of
    //     duplicating. Oracle = the batch aggregation over events ----
    "q_stream_exactly_once" -> ((s, dir) => {
      import graft.state.FsStateStore
      import graft.streaming.StreamingIngest
      val tmp = tmpDir("graft_feb")
      val events = t(s, dir, "events")
      events.write.parquet(s"$tmp/in")
      val schema = s.read.parquet(s"$tmp/in").schema
      val store = new FsStateStore(s"$tmp/state")
      def runOnce(ckpt: String): Unit = {
        val stream = StreamingIngest.readFileStream(s, schema, s"$tmp/in")
        val q = StreamingIngest.ingestForeachBatch(stream, schema, store,
          "events_eo", ops = Seq(Converters.withTimePartition("ts")),
          stagingDir = s"$tmp/staging", outputDir = s"$tmp/out",
          partitionBy = Seq("date_key"))
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }
      runOnce(s"$tmp/ckpt1")
      runOnce(s"$tmp/ckpt2") // full replay, fresh checkpoint
      s.read.parquet(s"$tmp/out")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("sum_v_milli"))
        .orderBy(col("event_type"))
    }),

    // --- temperature mixture weights (UniMax/T5 α=0.5): per-language
    //     sampling weights and epochs from one corpus aggregation;
    //     sqrt + order-pinned running-sum normalization keep every
    //     double bit-reproducible in DuckDB ------------------------
    "q_mix_temperature" -> ((s, dir) =>
      Converters.mixtureTemperature(t(s, dir, "documents"), "lang")
        .orderBy(col("domain"))),

    // --- temperature resampling MATERIALIZED: every doc emitted
    //     floor(epochs) times + a deterministic fractional copy —
    //     rare languages repeat (epochs > 1), over-represented ones
    //     thin out. The gate aggregates the EXPLODED corpus; the
    //     oracle replays epochs, per-doc copy counts, and the same
    //     aggregates analytically (never expanding rows) -------------
    "q_temperature_resample" -> ((s, dir) => {
      val out = Converters.temperatureResample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id")
      out.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_out"),
          sum(col("doc_id")).as("id_weighted_sum"))
        .join(t(s, dir, "documents").groupBy(col("lang"))
          .agg(count(lit(1)).as("n_in")), Seq("lang"))
        .select(col("lang"), col("n_in"), col("n_out"),
          col("id_weighted_sum"))
        .orderBy(col("lang"))
    }),

    // --- column profiling (quality.Profile): the dataset health
    //     report — per-column nulls/distinct/range in ONE aggregation
    //     pass, melted to long; integer/string columns only so value
    //     renderings are engine-stable. NULLs planted so the null
    //     counter provably fires -------------------------------------
    "q_profile" -> ((s, dir) => {
      import graft.quality.Profile
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        when(pmod(col("event_id"), lit(11)) === 0, lit(null))
          .otherwise(col("event_type")).as("event_type"),
        floor(col("value") * 1000).cast("long").as("v_milli"))
      Profile.profile(e, Seq("event_id", "user_id", "event_type", "v_milli"))
        .orderBy(col("column"))
    }),

    // --- packing efficiency report (Packing.packStats): per-sequence
    //     document counts, token fill, and fill ratio over the greedy
    //     packing — the waste metric a training pipeline watches. The
    //     oracle replays the greedy recurrence then aggregates ------
    "q_pack_stats" -> ((s, dir) => {
      import graft.functions.Text
      import graft.operators.Packing
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          Text.tokenCount(col("text")).as("n_tok"))
      val packed = Packing.packGreedy(docs, "shard", "doc_id", "n_tok",
        budget = 256)
      Packing.packStats(packed, budget = 256)
        .orderBy(col("shard"), col("seq_id"))
    }),

    // --- config impact analysis (ref InMemoryTopology.getImportedBy):
    //     "who breaks if this tag changes" — direct importers and the
    //     transitive closure for every tag in a deployed store whose
    //     tags themselves import a shared base tag -----------------
    "q_config_impact" -> ((s, dir) => {
      import graft.runner.ConfigStore
      import graft.runner.ConfigStore.Node
      import s.implicits._
      val tmp = tmpDir("graft_cfgimpact")
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .collect().map(r => (r.get(0).toString.toLong, r.getString(1)))
        .sortBy(_._1)
      val shared = Map(
        "/" -> Node(),
        "/datasets" -> Node(),
        "/tags" -> Node(),
        "/tags/base" -> Node(Vector("audit" -> "on")),
        "/tags/hot" -> Node(Vector("retention.days" -> "2"),
          imports = Vector("/tags/base")),
        "/tags/cold" -> Node(Vector("retention.days" -> "365"),
          imports = Vector("/tags/base")))
      val ds = nations.map { case (k, name) =>
        val imp = (k % 3) match {
          case 0 => Vector("/tags/hot")
          case 1 => Vector("/tags/cold")
          case _ => Vector.empty[String]
        }
        s"/datasets/${name.toLowerCase}" -> Node(Vector.empty, imp)
      }.toMap
      ConfigStore.deployFs(tmp, "v1", shared ++ ds)
      val cs = ConfigStore.openFs(tmp)
      Seq("/tags/base", "/tags/cold", "/tags/hot")
        .map(tag => (tag,
          cs.importedBy(tag).size.toLong,
          cs.importedByRecursively(tag).size.toLong))
        .toDF("tag", "n_direct", "n_transitive")
        .orderBy(col("tag"))
    }),

    // --- config-driven retention: the reference's PRIMARY use of the
    //     config store — per-dataset retention.days resolved through
    //     tag imports, then broadcast-joined onto the fact table to
    //     select deletable records. Config is metadata; the data path
    //     sees one broadcast hash join -----------------------------
    "q_config_retention" -> ((s, dir) => {
      import graft.runner.ConfigStore
      import graft.runner.ConfigStore.Node
      val tmp = tmpDir("graft_cfgret")
      val nations = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .collect().map(r => (r.get(0).toString.toLong, r.getString(1)))
        .sortBy(_._1)
      val shared = Map(
        "/" -> Node(Vector("retention.days" -> "14")),
        "/datasets" -> Node(),
        "/tags" -> Node(),
        "/tags/hot" -> Node(Vector("retention.days" -> "2")),
        "/tags/cold" -> Node(Vector("retention.days" -> "365")))
      val ds = nations.map { case (k, name) =>
        val imp = (k % 3) match {
          case 0 => Vector("/tags/hot")
          case 1 => Vector("/tags/cold")
          case _ => Vector.empty[String]
        }
        s"/datasets/${name.toLowerCase}" -> Node(Vector.empty, imp)
      }.toMap
      ConfigStore.deployFs(tmp, "v1", shared ++ ds)
      val cfg = ConfigStore.openFs(tmp).resolveAll(s, ds.keys.toSeq.sorted)
        .filter(col("key") === "retention.days")
        .select(regexp_extract(col("path"), "/datasets/(.*)", 1).as("dataset"),
          col("value").cast("long").as("days"))
      val events = t(s, dir, "events")
      val nationDim = t(s, dir, "nation")
        .select(col("n_nationkey"), lower(col("n_name")).as("dataset"))
      val tagged = events.join(broadcast(nationDim),
        pmod(col("user_id"), lit(nations.length)) === col("n_nationkey"))
      val maxUs = events.agg(max(unix_micros(col("ts"))).as("max_us"))
      tagged.crossJoin(broadcast(maxUs))
        .join(broadcast(cfg), Seq("dataset"))
        .filter(unix_micros(col("ts")) <
          col("max_us") - col("days") * lit(86400000000L))
        .groupBy(col("dataset")).agg(count(lit(1)).as("n_deletable"))
        .orderBy(col("dataset"))
    }),

    // --- value audit (ref gobblin-audit: ValueAuditGenerator,
    //     row-selection + column-projection policies, FsAuditSink):
    //     snapshot the same deterministic row sample at two pipeline
    //     phases — the second with planted corruptions (bumped
    //     values, case-mangled types, dropped records) — and diff the
    //     snapshots. The oracle replays sample, corruption, and diff -
    "q_value_audit" -> ((s, dir) => {
      import graft.quality.ValueAudit
      val tmp = tmpDir("graft_audit")
      val events = t(s, dir, "events").select(col("event_id"),
        col("event_type"),
        floor(col("value") * 1000).cast("long").as("v_milli"))
      val policy = ValueAudit.rowSample(col("event_id"), 0.25)
      val cols = Seq("event_id", "event_type", "v_milli")
      ValueAudit.snapshot(events, tmp, "events", "extract", policy, cols)
      val corrupted = events
        .withColumn("v_milli",
          when(pmod(col("event_id"), lit(97)) === 0, col("v_milli") + 1)
            .otherwise(col("v_milli")))
        .withColumn("event_type",
          when(pmod(col("event_id"), lit(101)) === 0, upper(col("event_type")))
            .otherwise(col("event_type")))
        .filter(pmod(col("event_id"), lit(499)) =!= 0)
      ValueAudit.snapshot(corrupted, tmp, "events", "convert", policy, cols)
      ValueAudit.compare(s, tmp, "events", "extract", "convert", "event_id")
        .orderBy(col("column"))
    }),

    // --- BPE merge induction (tokenizer training): the first six
    //     merges learned over the en word dictionary — pair counting
    //     is a weighted hash agg over the vocab-sized dict, the merge
    //     fold is the left-greedy aggregate HOF, the argmax is O(1)
    //     driver metadata. The oracle replays all six layers ---------
    "q_bpe_merges" -> ((s, dir) => {
      import graft.functions.Bpe
      import s.implicits._
      val dict = Bpe.wordDict(
        t(s, dir, "documents").filter(col("lang") === "en"), "text")
      Bpe.learnMerges(dict, 6)
        .map(m => (m.step, m.pair, m.count))
        .toDF("step", "pair", "cnt")
        .orderBy(col("step"))
    }),

    // --- HTML strip + URL canonicalization (C4-style pre-cleaning):
    //     markup planted around real text is stripped (tags, the five
    //     entities, whitespace collapse); messy URLs built from data
    //     columns canonicalize (case, default port, fragment, utm_*,
    //     trailing slash). The oracle replays both regexp pipelines --
    "q_html_url_clean" -> ((s, dir) => {
      import graft.functions.Text
      val raw = concat(lit("<p>"), substring(col("text"), 1, 40),
        lit("</p> <a href=\"x\">"), col("lang"),
        lit("</a> &amp; <br/> done"))
      val messyUrl = concat(lit("HTTPS://WWW."), col("source"), lit("."),
        col("lang"), lit(".Example.COM:443/P/"), col("doc_id").cast("string"),
        lit("/?utm_source=s&id="), col("doc_id").cast("string"),
        lit("&utm_campaign=c#frag"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Text.stripHtml(raw).as("clean_text"),
          Text.normalizeUrl(messyUrl).as("clean_url"))
        .orderBy(col("doc_id"))
    }),

    // --- streaming LM quality filter (7th streaming gate): the LM is
    //     fit OFFLINE on the clean en slice, then applied per
    //     micro-batch to a garble-planted document stream — score,
    //     filter against the floor, publish survivors. The offline-
    //     fit / online-apply split is the production shape for model-
    //     based stream filtering. Oracle replays LM + floor in batch -
    "q_stream_quality" -> ((s, dir) => {
      import graft.functions.NgramLm
      import graft.streaming.StreamingIngest
      val tmp = tmpDir("graft_streamlm")
      val docs = t(s, dir, "documents")
      docs.withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(OperatorGates6.Garble)))
            .otherwise(col("text")))
        .select(col("doc_id"), col("lang"), col("text"))
        .repartition(4).write.parquet(s"$tmp/in")
      val lm = NgramLm.train(docs.filter(col("lang") === "en"), "text")
      val schema = s.read.parquet(s"$tmp/in").schema
      val stream = StreamingIngest.readFileStream(s, schema, s"$tmp/in",
        maxFilesPerTrigger = Some(2)) // several micro-batches
      val q = stream.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          NgramLm.score(batch, "doc_id", "text", lm)
            .withColumnRenamed("id", "doc_id")
            .join(batch.select(col("doc_id"), col("lang")), Seq("doc_id"))
            .filter(col("hit_ratio") >= 0.9)
            .select(col("doc_id"), col("lang"))
            .write.mode("append").parquet(s"$tmp/out")
          ()
      }.option("checkpointLocation", s"$tmp/ckpt").start()
      q.processAllAvailable(); q.stop()
      s.read.parquet(s"$tmp/out")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_passed"), sum(col("doc_id")).as("sum_id"))
        .orderBy(col("lang"))
    }),

    // --- audio resample (nearest-neighbor rate conversion over real
    //     PCM16 WAVs): per-doc audio at 8/12/16 kHz converted to
    //     6 kHz through the codec (parse -> index-map -> re-encode ->
    //     re-parse); the oracle replays the index arithmetic --------
    "q_wav_resample" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, n) =>
          val rate = 8000 + (id % 3).toInt * 4000
          val samples = Array.tabulate(n.toInt)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          (id, Multimodal.WavCodec.synthesize(rate, samples))
        }).toDF("media_id", "content")
      Multimodal.resampleWav(media, 6000).toDF()
        .orderBy(col("media_id"))
    }),

    // --- multimodal resize (nearest-neighbor over real BMP bytes):
    //     synthesize per-doc images, resize through the codec
    //     (decode -> integer-floor resample -> re-encode -> re-parse),
    //     report the RESIZED image's features. The oracle replays the
    //     resample index arithmetic analytically from the generator --
    "q_bmp_resize" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 8 + (id % 5).toInt
          val h = 4 + (id % 3).toInt
          (id, Multimodal.BmpCodec.synthesize(w, h,
            i => ((id * 7 + i) % 256).toInt))
        }).toDF("media_id", "content")
      Multimodal.resizeBmp(media, 6, 4).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("mean_intensity"))
        .orderBy(col("media_id"))
    }),

    // --- CCNet head/middle/tail bucketing: per-language TERCILES of
    //     the LM score split each language's corpus into quality
    //     bands with DATA-DRIVEN boundaries. Scores quantize to
    //     integers first (floor(ratio * 2^20)) because interpolated
    //     percentile is only proven bit-identical across engines over
    //     BIGINT inputs (NOTES rule 8) ---------------------------
    "q_ccnet_buckets" -> ((s, dir) => {
      import graft.functions.NgramLm
      val docs = t(s, dir, "documents")
      // three planted corruption levels -> three genuine score bands
      val planted = docs.withColumn("text2",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(OperatorGates6.Garble)))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(col("text"), lit(OperatorGates6.GarbleShort)))
          .otherwise(col("text")))
      val lm = NgramLm.train(docs.filter(col("lang") === "en"), "text")
      // materialize scores once: both the tercile aggregation and the
      // bucket join read them, and recomputing means running the LM
      // scoring pipeline twice (same hygiene as q_governed_pipeline)
      val tmp = tmpDir("graft_ccnet")
      NgramLm.score(planted, "doc_id", "text2", lm)
        .withColumnRenamed("id", "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"),
          floor(coalesce(col("hit_ratio"), lit(0.0)) * 1048576)
            .cast("long").as("score_q"))
        .write.parquet(s"$tmp/scored")
      val scored = s.read.parquet(s"$tmp/scored")
      val terciles = scored.groupBy(col("lang")).agg(
        percentile(col("score_q"), lit(1.0 / 3)).as("p33"),
        percentile(col("score_q"), lit(2.0 / 3)).as("p66"))
      scored.join(broadcast(terciles), Seq("lang"))
        .withColumn("bucket",
          when(col("score_q") <= col("p33"), "tail")
            .when(col("score_q") <= col("p66"), "middle")
            .otherwise("head"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("score_q")).as("min_q"), max(col("score_q")).as("max_q"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // --- wave-6 flagship: GOVERNED corpus pipeline — per-language
    //     quality floors come from the CONFIG STORE (strict tag
    //     imported by en/de, root default for the rest), documents are
    //     scored by the bigram LM, filtered against their language's
    //     resolved floor, and the survivors rebalanced to a uniform
    //     mix. Each stage is the real operator; one oracle replays
    //     resolution, LM arithmetic, filter, and sampling ------------
    "q_governed_pipeline" -> ((s, dir) => {
      import graft.functions.NgramLm
      import graft.runner.ConfigStore
      import graft.runner.ConfigStore.Node
      val tmp = tmpDir("graft_gov")
      val docs = t(s, dir, "documents")
      val langs = docs.select(col("lang")).distinct()
        .collect().map(_.getString(0)).sorted // language registry: bounded
      val nodes = Map(
        "/" -> Node(Vector("lm.min_hit_ratio" -> "0.05")),
        "/tags" -> Node(),
        "/tags/strict" -> Node(Vector("lm.min_hit_ratio" -> "0.9")),
        "/corpora" -> Node()) ++ langs.map { l =>
        val imp = if (l == "en" || l == "de") Vector("/tags/strict")
                  else Vector.empty[String]
        s"/corpora/$l" -> Node(Vector.empty, imp)
      }.toMap
      ConfigStore.deployFs(tmp, "v1", nodes)
      val thr = ConfigStore.openFs(tmp)
        .resolveAll(s, langs.map(l => s"/corpora/$l").toSeq)
        .filter(col("key") === "lm.min_hit_ratio")
        .select(regexp_extract(col("path"), "/corpora/(.*)", 1).as("lang"),
          col("value").cast("double").as("thr"))
      // plant garble on every 7th doc: the LM trains on CLEAN en text
      // (CCNet's clean reference corpus), so planted docs score a low
      // hit ratio and the strict floor actually BITES on en/de
      val docsScored = docs.withColumn("text2",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(OperatorGates6.Garble)))
          .otherwise(col("text")))
      val lm = NgramLm.train(docs.filter(col("lang") === "en"), "text")
      val scored = NgramLm.score(docsScored, "doc_id", "text2", lm)
        .withColumnRenamed("id", "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      // materialize survivors to a temp tree instead of persist():
      // rebalance collects survivor counts AND the returned plan joins
      // the set three times — parquet re-reads are cheap and leave no
      // cache blocks pinned in the shared gate session
      scored.join(broadcast(thr), Seq("lang"))
        .filter(col("hit_ratio") >= col("thr"))
        .select(col("doc_id"), col("lang"))
        .write.parquet(s"$tmp/passed")
      val passed = s.read.parquet(s"$tmp/passed")
      val sampled = Converters.rebalanceToTargetMix(passed, "lang", "doc_id")
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
        .join(passed.groupBy(col("lang")).agg(count(lit(1)).as("np")), Seq("lang"), "left")
        .join(sampled.groupBy(col("lang")).agg(count(lit(1)).as("ns")), Seq("lang"), "left")
        .select(col("lang"), col("n_total"),
          coalesce(col("np"), lit(0L)).as("n_passed"),
          coalesce(col("ns"), lit(0L)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // --- BPE encode (the tokenizer's other half): merges learned on
    //     the en dictionary applied to the WHOLE corpus dictionary,
    //     per-language fertility (pieces per word) reported. Encoding
    //     joins tokens to the vocab-sized encoded dict — one shuffle
    //     over the corpus, merges never touch it --------------------
    "q_bpe_encode" -> ((s, dir) => {
      import graft.functions.Bpe
      val docs = t(s, dir, "documents")
      val merges = Bpe.learnMerges(
        Bpe.wordDict(docs.filter(col("lang") === "en"), "text"), 6)
      val encoded = Bpe.applyMerges(Bpe.wordDict(docs, "text"), merges)
        .select(col("w"), size(col("syms")).as("pieces"))
      docs.select(col("lang"),
          explode(graft.functions.Text.tokens(coalesce(col("text"), lit(""))))
            .as("w"))
        .join(encoded, Seq("w"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          (col("n_pieces").cast("double") / col("n_words"))
            .as("pieces_per_word"))
        .orderBy(col("lang"))
    }),

    // --- n-gram LM quality scoring (CCNet-style filter): bigram LM
    //     trained on the lang='en' slice, every document scored by
    //     token OOV, bigram hit rate, and the conditional-probability
    //     floor. The oracle refits the LM and rescores from scratch --
    "q_lm_quality" -> ((s, dir) => {
      import graft.functions.NgramLm
      val docs = t(s, dir, "documents")
      val lm = NgramLm.train(docs.filter(col("lang") === "en"), "text")
      NgramLm.score(docs, "doc_id", "text", lm)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql6: Map[String, String] = Map(

    "q_config_resolve" ->
      """WITH d AS (
        |  SELECT '/datasets/' || lower(n_name) AS path,
        |         n_nationkey % 3 AS m, n_nationkey AS k
        |  FROM nation)
        |SELECT path, key, value, origin FROM (
        |  SELECT path, 'nation.key' AS key, CAST(k AS VARCHAR) AS value,
        |         path AS origin FROM d
        |  UNION ALL
        |  -- an import's RESOLUTION includes its own ancestor chain
        |  -- (ref recursion: imports before parent, shared visited
        |  -- set) — so for importing nodes root's owner lands before
        |  -- the parent /datasets ever gets a turn
        |  SELECT path, 'owner',
        |    CASE WHEN m IN (0, 1) THEN 'root-team' ELSE 'data-team' END,
        |    CASE WHEN m IN (0, 1) THEN '/' ELSE '/datasets' END FROM d
        |  UNION ALL
        |  SELECT path, 'retention.days',
        |    CASE m WHEN 0 THEN '30' WHEN 1 THEN '3650' ELSE '365' END,
        |    CASE m WHEN 0 THEN '/tags/hot' WHEN 1 THEN '/tags/cold'
        |           ELSE '/' END FROM d
        |  UNION ALL
        |  SELECT path, 'priority', 'high', '/tags/hot' FROM d WHERE m IN (0, 1)
        |  UNION ALL
        |  SELECT path, 'tier', 'archive', '/tags/cold' FROM d WHERE m = 1
        |) ORDER BY path, key""".stripMargin,

    "q_bpe_merges" -> OracleSql.bpeMerges(6),

    "q_bpe_encode" -> OracleSql.bpeEncode(6),

    "q_html_url_clean" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    '<p>' || substring(text, 1, 40) || '</p> <a href="x">' || lang
        |      || '</a> &amp; <br/> done' AS h,
        |    'HTTPS://WWW.' || source || '.' || lang || '.Example.COM:443/P/'
        |      || CAST(doc_id AS VARCHAR) || '/?utm_source=s&id='
        |      || CAST(doc_id AS VARCHAR) || '&utm_campaign=c#frag' AS m
        |  FROM documents),
        |st AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(h, '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', CHR(39)), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean_text,
        |    regexp_replace(m, '#.*', '') AS nf
        |  FROM raw),
        |parts AS (
        |  SELECT doc_id, clean_text,
        |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |    regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1) AS rest
        |  FROM st)
        |SELECT doc_id, clean_text,
        |  regexp_replace(rtrim(
        |    scheme || '://'
        |      || CASE WHEN scheme = 'http'
        |              THEN regexp_replace(host, ':80$', '')
        |              WHEN scheme = 'https'
        |              THEN regexp_replace(host, ':443$', '')
        |              ELSE host END
        |      || regexp_replace(rest,
        |           '([?&])utm_[A-Za-z]+=[^&]*(&utm_[A-Za-z]+=[^&]*)*&?',
        |           '\1', 'g'),
        |    '?&'), '/$', '') AS clean_url
        |FROM parts ORDER BY doc_id""".stripMargin,

    "q_stream_quality" ->
      s"""WITH ${OracleSql.lmCtes(
        s"text || CASE WHEN doc_id % 7 = 0 THEN '${OperatorGates6.Garble}' ELSE '' END")},
        |sc AS (
        |  SELECT d.doc_id, d.lang,
        |    CASE WHEN coalesce(h.n_bigrams, 0) > 0
        |         THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / h.n_bigrams
        |    END AS hit_ratio
        |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
        |SELECT lang, count(*) AS n_passed,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM sc WHERE hit_ratio >= 0.9
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_wav_resample" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    8000 + (doc_id % 3) * 4000 AS sr,
        |    (n_chars * 6000) // (8000 + (doc_id % 3) * 4000) AS n_out
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(6000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        |  CAST(n_out AS BIGINT) AS n_samples,
        |  CAST((n_out * 1000000) // 6000 AS BIGINT) AS duration_us,
        |  CASE WHEN n_out = 0 THEN 0.0 ELSE
        |    CAST(list_sum(list_transform(range(0, n_out), j ->
        |      abs((doc_id * 31 + ((j * sr) // 6000) * 17) % 65536 - 32768)))
        |      AS DOUBLE) / n_out
        |  END AS mean_abs_amp
        |FROM p ORDER BY media_id""".stripMargin,

    "q_bmp_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(24 AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, 72), j ->
        |    (doc_id * 7 + (
        |      ((((j // 3) // 6) * (4 + doc_id % 3)) // 4
        |        * (8 + doc_id % 5)
        |       + (((j // 3) % 6) * (8 + doc_id % 5)) // 6) * 3
        |      + j % 3)) % 256)) AS DOUBLE) / 72 AS mean_intensity
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_ccnet_buckets" ->
      s"""WITH ${OracleSql.lmCtes(
        s"text || CASE WHEN doc_id % 3 = 0 THEN '${OperatorGates6.Garble}' " +
          s"WHEN doc_id % 3 = 1 THEN '${OperatorGates6.GarbleShort}' " +
          "ELSE '' END")},
        |sc AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(floor(coalesce(
        |      CASE WHEN coalesce(h.n_bigrams, 0) > 0
        |           THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / h.n_bigrams
        |      END, 0.0) * 1048576) AS BIGINT) AS score_q
        |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id),
        |q AS (
        |  SELECT lang, quantile_cont(score_q, 1.0 / 3) AS p33,
        |         quantile_cont(score_q, 2.0 / 3) AS p66
        |  FROM sc GROUP BY lang)
        |SELECT s.lang,
        |  CASE WHEN s.score_q <= q.p33 THEN 'tail'
        |       WHEN s.score_q <= q.p66 THEN 'middle'
        |       ELSE 'head' END AS bucket,
        |  count(*) AS n, min(s.score_q) AS min_q, max(s.score_q) AS max_q
        |FROM sc s JOIN q ON s.lang = q.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_governed_pipeline" ->
      s"""WITH ${OracleSql.lmCtes(
        s"text || CASE WHEN doc_id % 7 = 0 THEN '${OperatorGates6.Garble}' ELSE '' END")},
        |sc AS (
        |  SELECT d.doc_id, d.lang,
        |    CASE WHEN coalesce(h.n_bigrams, 0) > 0
        |         THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / h.n_bigrams
        |    END AS hit_ratio
        |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id),
        |thr AS (
        |  SELECT lang,
        |    CASE WHEN lang IN ('en', 'de') THEN CAST('0.9' AS DOUBLE)
        |         ELSE CAST('0.05' AS DOUBLE) END AS thr
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |passed AS (
        |  SELECT s.doc_id, s.lang FROM sc s JOIN thr ON s.lang = thr.lang
        |  WHERE s.hit_ratio >= thr.thr),
        |c AS (SELECT lang, count(*) AS n FROM passed GROUP BY lang),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total, count(*) AS k FROM c),
        |f AS (
        |  SELECT lang, least(CAST(1.0 AS DOUBLE),
        |    (CAST(1.0 AS DOUBLE) / k) / (CAST(n AS DOUBLE) / total)) AS frac
        |  FROM c, tot),
        |cuts AS (
        |  SELECT lang, CASE WHEN frac >= 1.0 THEN 'g'
        |    ELSE printf('%04x',
        |      CAST(least(round(frac * 65536), 65535) AS BIGINT)) END AS cut
        |  FROM f),
        |sampled AS (
        |  SELECT p.lang, count(*) AS n FROM passed p
        |  JOIN cuts ON p.lang = cuts.lang
        |  WHERE substring(md5('graft' || '|' || CAST(p.doc_id AS VARCHAR)), 1, 4)
        |        < cuts.cut
        |  GROUP BY p.lang)
        |SELECT b.lang, b.n_total,
        |  coalesce(c.n, 0) AS n_passed,
        |  coalesce(sampled.n, 0) AS n_sampled
        |FROM (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang) b
        |LEFT JOIN c ON b.lang = c.lang
        |LEFT JOIN sampled ON b.lang = sampled.lang
        |ORDER BY b.lang""".stripMargin,

    "q_sketch_union" ->
      """SELECT scope, n_exact, est_in_bound FROM (
        |  SELECT event_type AS scope,
        |         count(DISTINCT user_id) AS n_exact,
        |         true AS est_in_bound
        |  FROM events GROUP BY event_type
        |  UNION ALL
        |  SELECT '__all__', count(DISTINCT user_id), true FROM events
        |) ORDER BY scope""".stripMargin,

    "q_job_lock" ->
      """WITH p AS (
        |  SELECT count(*) AS n FROM events WHERE event_type = 'purchase')
        |SELECT attempt, acquired, n_rows FROM (
        |  SELECT 1 AS attempt, true AS acquired, n AS n_rows FROM p
        |  UNION ALL SELECT 2, false, 0
        |  UNION ALL SELECT 3, true, n FROM p
        |) ORDER BY attempt""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_filter(string_split(coalesce(text, ''), ' '),
        |                x -> len(x) > 0))) AS token
        |  FROM documents)
        |SELECT token, count(*) AS df,
        |  array_to_string(list_sort(list(doc_id))[1:8], ',') AS postings
        |FROM tok GROUP BY token HAVING count(*) >= 50
        |ORDER BY token""".stripMargin,

    "q_zorder_layout" ->
      """WITH b0 AS (
        |  SELECT (CAST(user_id AS BIGINT) % 65536) AS x,
        |         (CAST(floor(value * 1000) AS BIGINT) % 65536) AS y
        |  FROM events),
        |s1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xs,
        |                    (y | (y << 8)) & 16711935 AS ys FROM b0),
        |s2 AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs,
        |                    (ys | (ys << 4)) & 252645135 AS ys FROM s1),
        |s3 AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs,
        |                    (ys | (ys << 2)) & 858993459 AS ys FROM s2),
        |s4 AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs,
        |                    (ys | (ys << 1)) & 1431655765 AS ys FROM s3),
        |z AS (SELECT x, y, (xs | (ys << 1)) AS z FROM s4)
        |SELECT (z >> 22) AS zbucket, count(*) AS n,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,

    "q_stream_exactly_once" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS sum_v_milli
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_mix_temperature" ->
      """WITH c AS (
        |  SELECT lang AS domain, count(*) AS n FROM documents GROUP BY lang),
        |w AS (
        |  SELECT domain, n,
        |    CAST(n AS DOUBLE) / (SELECT sum(n) FROM c) AS share,
        |    (SELECT sum(n) FROM c) AS total
        |  FROM c),
        |r AS (
        |  SELECT domain, n, share, total,
        |    CAST(floor(sqrt(share) * 1099511627776.0) AS BIGINT) AS swq
        |  FROM w),
        |d AS (SELECT sum(swq) AS denomq FROM r)
        |SELECT domain, n, share,
        |  CAST(swq AS DOUBLE) / CAST((SELECT denomq FROM d) AS DOUBLE) AS weight,
        |  CAST(swq AS DOUBLE) / CAST((SELECT denomq FROM d) AS DOUBLE)
        |    * CAST(total AS DOUBLE) / n AS epochs
        |FROM r ORDER BY domain""".stripMargin,

    "q_temperature_resample" ->
      """WITH c AS (
        |  SELECT lang AS domain, count(*) AS n FROM documents GROUP BY lang),
        |w AS (
        |  SELECT domain, n,
        |    CAST(n AS DOUBLE) / (SELECT sum(n) FROM c) AS share,
        |    (SELECT sum(n) FROM c) AS total
        |  FROM c),
        |r AS (
        |  SELECT domain, n, share, total,
        |    CAST(floor(sqrt(share) * 1099511627776.0) AS BIGINT) AS swq
        |  FROM w),
        |d0 AS (SELECT sum(swq) AS denomq FROM r),
        |e AS (
        |  SELECT domain, n AS n_in,
        |    CAST(swq AS DOUBLE) / CAST((SELECT denomq FROM d0) AS DOUBLE)
        |      * CAST(total AS DOUBLE) / n AS epochs
        |  FROM r),
        |d AS (
        |  SELECT doc_id, lang,
        |    CAST(floor(e.epochs) AS BIGINT)
        |      + CASE WHEN substring(md5('graft' || '|' ||
        |                 CAST(doc_id AS VARCHAR)), 1, 4)
        |              < printf('%04x', CAST(least(floor(
        |                  (e.epochs - floor(e.epochs)) * 65536), 65535)
        |                AS BIGINT))
        |        THEN 1 ELSE 0 END AS n_copies
        |  FROM documents JOIN e ON lang = e.domain)
        |SELECT d.lang, e2.n_in,
        |  CAST(sum(d.n_copies) AS BIGINT) AS n_out,
        |  CAST(sum(d.doc_id * d.n_copies) AS BIGINT) AS id_weighted_sum
        |FROM d JOIN e e2 ON d.lang = e2.domain
        |GROUP BY d.lang, e2.n_in ORDER BY d.lang""".stripMargin,

    "q_profile" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_id % 11 = 0 THEN NULL
        |         ELSE event_type END AS event_type,
        |    CAST(floor(value * 1000) AS BIGINT) AS v_milli
        |  FROM events)
        |SELECT "column", n_rows, n_nulls, n_distinct, min_repr, max_repr
        |FROM (
        |  SELECT 'event_id' AS "column", count(*) AS n_rows,
        |    count(*) FILTER (event_id IS NULL) AS n_nulls,
        |    count(DISTINCT event_id) AS n_distinct,
        |    CAST(min(event_id) AS VARCHAR) AS min_repr,
        |    CAST(max(event_id) AS VARCHAR) AS max_repr FROM e
        |  UNION ALL
        |  SELECT 'event_type', count(*),
        |    count(*) FILTER (event_type IS NULL),
        |    count(DISTINCT event_type),
        |    min(event_type), max(event_type) FROM e
        |  UNION ALL
        |  SELECT 'user_id', count(*),
        |    count(*) FILTER (user_id IS NULL),
        |    count(DISTINCT user_id),
        |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        |  FROM e
        |  UNION ALL
        |  SELECT 'v_milli', count(*),
        |    count(*) FILTER (v_milli IS NULL),
        |    count(DISTINCT v_milli),
        |    CAST(min(v_milli) AS VARCHAR), CAST(max(v_milli) AS VARCHAR)
        |  FROM e
        |) ORDER BY "column"""".stripMargin,

    "q_pack_stats" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> len(x) > 0)) AS INT) AS n_tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec(shard, doc_id, n_tok, rn, seq_id, fill) AS (
        |  SELECT shard, doc_id, n_tok, rn, CAST(0 AS BIGINT),
        |         CAST(n_tok AS BIGINT)
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.doc_id, d.n_tok, d.rn,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.seq_id
        |         ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.fill + d.n_tok
        |         ELSE CAST(d.n_tok AS BIGINT) END
        |  FROM rec r JOIN docs d ON d.shard = r.shard AND d.rn = r.rn + 1
        |)
        |SELECT shard, seq_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
        |  CAST(sum(n_tok) AS DOUBLE) / 256 AS fill_ratio
        |FROM rec GROUP BY shard, seq_id
        |ORDER BY shard, seq_id""".stripMargin,

    "q_config_impact" ->
      """WITH c AS (
        |  SELECT count(*) FILTER (n_nationkey % 3 = 0) AS nh,
        |         count(*) FILTER (n_nationkey % 3 = 1) AS nc
        |  FROM nation)
        |SELECT tag, n_direct, n_transitive FROM (
        |  SELECT '/tags/base' AS tag, CAST(2 AS BIGINT) AS n_direct,
        |         CAST(2 + nh + nc AS BIGINT) AS n_transitive FROM c
        |  UNION ALL
        |  SELECT '/tags/cold', CAST(nc AS BIGINT), CAST(nc AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT '/tags/hot', CAST(nh AS BIGINT), CAST(nh AS BIGINT) FROM c
        |) ORDER BY tag""".stripMargin,

    "q_config_retention" ->
      """WITH cfg AS (
        |  SELECT lower(n_name) AS dataset, n_nationkey AS k,
        |    CASE n_nationkey % 3 WHEN 0 THEN 2 WHEN 1 THEN 365
        |         ELSE 14 END AS days
        |  FROM nation),
        |mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
        |tagged AS (
        |  SELECT c.dataset, c.days, epoch_us(e.ts) AS us
        |  FROM events e JOIN cfg c
        |    ON e.user_id % (SELECT count(*) FROM nation) = c.k)
        |SELECT dataset, count(*) AS n_deletable
        |FROM tagged, mx
        |WHERE us < max_us - days * 86400000000
        |GROUP BY dataset ORDER BY dataset""".stripMargin,

    "q_value_audit" ->
      """WITH src AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(value * 1000) AS BIGINT) AS v_milli
        |  FROM events
        |  WHERE substr(md5('audit|' || CAST(event_id AS VARCHAR)), 1, 4)
        |        < '4000'),
        |conv AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 101 = 0 THEN upper(event_type)
        |         ELSE event_type END AS event_type,
        |    CASE WHEN event_id % 97 = 0 THEN v_milli + 1
        |         ELSE v_milli END AS v_milli
        |  FROM src WHERE event_id % 499 <> 0),
        |j AS (
        |  SELECT s.event_id AS ida, c.event_id AS idb,
        |         s.event_type AS a_et, c.event_type AS b_et,
        |         s.v_milli AS a_v, c.v_milli AS b_v
        |  FROM src s FULL OUTER JOIN conv c ON s.event_id = c.event_id),
        |agg AS (SELECT
        |  count(*) FILTER (ida IS NOT NULL AND idb IS NOT NULL) AS n_common,
        |  count(*) FILTER (ida IS NOT NULL AND idb IS NOT NULL
        |                   AND a_et IS DISTINCT FROM b_et) AS mm_et,
        |  count(*) FILTER (ida IS NOT NULL AND idb IS NOT NULL
        |                   AND a_v IS DISTINCT FROM b_v) AS mm_v,
        |  count(*) FILTER (idb IS NULL) AS only_a,
        |  count(*) FILTER (ida IS NULL) AS only_b
        |  FROM j)
        |SELECT 'event_type' AS "column", n_common, mm_et AS n_mismatch,
        |       only_a AS n_only_a, only_b AS n_only_b FROM agg
        |UNION ALL
        |SELECT 'v_milli', n_common, mm_v, only_a, only_b FROM agg
        |ORDER BY "column"""".stripMargin,

    "q_lineage" ->
      """SELECT * FROM (
        |  SELECT 'lineage_job' AS job, 'events' AS dataset, 0 AS branch,
        |    'file:events' AS src, 'file:events_purchase' AS dst,
        |    count(*) FILTER (event_type = 'purchase') AS n_rows
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineage_job', 'events', 1, 'file:events',
        |    'file:events_other',
        |    count(*) FILTER (event_type <> 'purchase')
        |  FROM events
        |) ORDER BY branch""".stripMargin,

    "q_lm_quality" ->
      s"""WITH ${OracleSql.lmCtes()}
        |SELECT d.doc_id,
        |  coalesce(o.n_tokens, 0) AS n_tokens,
        |  coalesce(o.n_oov, 0) AS n_oov,
        |  coalesce(h.n_bigrams, 0) AS n_bigrams,
        |  coalesce(h.n_hits, 0) AS n_hits,
        |  CASE WHEN coalesce(h.n_bigrams, 0) > 0
        |       THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / h.n_bigrams
        |  END AS hit_ratio,
        |  h.min_prob AS min_prob
        |FROM documents d
        |LEFT JOIN oov o ON d.doc_id = o.doc_id
        |LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
