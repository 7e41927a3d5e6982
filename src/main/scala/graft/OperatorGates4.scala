package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NormalizeNfc, Similarity, StripAccents, TermStats, Text}
import graft.operators.{Converters, Dedup, Packing}

/** Round-3 wave 4: the training-data corpus-preparation operators —
  * benchmark decontamination, greedy sequence packing, sliding-window
  * context chunking, and Unicode normalization. As with every gate
  * wave: the query side executes the real operator machinery and the
  * oracle replays the SEMANTICS (greedy recurrence, shingle overlap,
  * slice arithmetic, Unicode normal forms) independently in DuckDB.
  */
object OperatorGates4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries4: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- benchmark decontamination (Similarity.benchmarkOverlap): the
    //     GPT-3-style contamination check — fraction of each corpus
    //     doc's distinct 3-grams that appear in the benchmark/eval set
    //     (here: docs with doc_id % 19 == 0). The benchmark shingle set
    //     is gated-broadcast (eval sets are small by nature); corpus
    //     docs too short to shingle surface with ratio 0 ---------------
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val benchmark = docs.filter(pmod(col("doc_id"), lit(19)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(19)) =!= 0)
      Similarity.benchmarkOverlap(corpus, benchmark, "doc_id", "text",
          n = 3, threshold = 0.05)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // --- greedy sequence packing (Packing.packGreedy): documents
    //     packed into 256-token training sequences, greedy in (shard,
    //     doc_id) order, one linear pass per shard. The oracle replays
    //     the greedy recurrence with a per-shard recursive CTE — the
    //     strongest possible check of an order-sensitive fold ----------
    "q_pack_sequences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          Text.tokenCount(col("text")).as("n_tok"))
      Packing.packGreedy(docs, "shard", "doc_id", "n_tok", budget = 256)
        .orderBy(col("shard"), col("doc_id"))
    }),

    // --- sliding-window context chunking (Text.chunkTokens): doc ->
    //     overlapping 32-token chunks at stride 24, the standard
    //     context-window split before tokenization. Pure codegen'd
    //     sequence/slice composition; the oracle replays the exact
    //     integer chunk-count ceil and list slices ---------------------
    "q_chunk_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        // tokens materialized as a column: the chunk lambda then
        // captures a cheap array attribute, not the tokenizer tree
        .select(col("doc_id"), Text.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          posexplode(Text.chunkTokensOfTokens(col("_toks"), chunkSize = 32, stride = 24))
            .as(Seq("chunk_id", "chunk_text")))
        .select(col("doc_id"), col("chunk_id"),
          size(Text.tokens(col("chunk_text"))).as("n_chunk_tokens"), col("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // --- Unicode normalization (NormalizeNfc / StripAccents native
    //     expressions): accents planted via translate() so the strip
    //     path actually fires on the ASCII corpus; restored text must
    //     round-trip to the original. DuckDB's nfc_normalize /
    //     strip_accents replay both normal forms --------------------
    "q_normalize_text" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          translate(col("text"), "aeiou", "áéíóú").as("planted"))
        .withColumn("restored", StripAccents(NormalizeNfc(col("planted"))))
        .withColumn("roundtrip", col("restored") === col("text"))
        .select(col("doc_id"), col("planted"), col("restored"), col("roundtrip"))
        .orderBy(col("doc_id"))
    }),

    // --- duplicate-shingle saturation (Similarity.
    //     duplicateShingleSaturation): the Dolma/CCNet boilerplate
    //     signal — fraction of a doc's distinct 3-grams with corpus
    //     doc-freq > 2. Count-only doc-freq agg (hot shingle = one
    //     counter); the oracle replays it with a window count ---------
    "q_dup_saturation" -> ((s, dir) => {
      Similarity.duplicateShingleSaturation(t(s, dir, "documents"),
          "doc_id", "text", n = 3, maxDocFreq = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // --- URL extraction + domain blocklist (Text.extractUrls/domains/
    //     hasBlockedDomain): the C4/RefinedWeb source filter. URLs are
    //     planted deterministically from table columns so extraction
    //     actually fires; patterns are RE2-safe so DuckDB replays them
    //     verbatim --------------------------------------------------
    "q_url_blocklist" -> ((s, dir) => {
      val raw = concat(
        substring(col("text"), 1, 30), lit(" see https://"), col("source"), lit("."),
        col("lang"), lit(".example.com/p/"), col("doc_id").cast("string"),
        lit(" and http://ads.tracker"), pmod(col("doc_id"), lit(3)).cast("string"),
        lit(".net/x?id="), col("doc_id").cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          size(Text.extractUrls(col("raw"))).as("n_urls"),
          array_join(array_sort(Text.domains(col("raw"))), ",").as("domain_list"),
          Text.hasBlockedDomain(col("raw"),
            Seq("ads.tracker0.net", "ads.tracker2.net")).as("blocked"))
        .orderBy(col("doc_id"))
    }),

    // --- packed-sequence materialization (Packing.
    //     materializeSequences): the rows a tokenizer consumes — member
    //     docs concatenated in doc_id order. The per-group collect is
    //     bounded by the token budget BY CONSTRUCTION; the oracle
    //     replays pack assignment (recursive CTE) + ordered string_agg -
    "q_pack_texts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          Text.tokenCount(col("text")).as("n_tok"))
      val packed = Packing.packGreedy(docs, "shard", "doc_id", "n_tok", budget = 256)
      Packing.materializeSequences(packed, t(s, dir, "documents"),
          "doc_id", "text", " <|doc|> ")
        .orderBy(col("shard"), col("seq_id"))
    }),

    // --- TF-IDF-ish top terms (TermStats.topTerms): per-doc salience
    //     = tf * N / df (log dropped — monotone in df, so top-k is
    //     identical and the arithmetic stays exact-rational / IEEE
    //     portable instead of depending on two libm ln()s) ------------
    "q_top_terms" -> ((s, dir) => {
      TermStats.topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("weight").desc, col("term"))
    }),

    // --- product-quantized ANN (Ann.sampledPq + PqIndex.search): the
    //     corpus compressed to 8 one-byte codes (32x vs float32), ADC
    //     scan on codes only, float vectors fetched for the re-rank
    //     survivors. Deterministic sampled codebooks -> the oracle
    //     replays encode + ADC + re-rank bit-for-bit -----------------
    "q_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      val idx = graft.functions.Ann.sampledPq(e, nSub = 8, nCents = 16)
      idx.search(probes, e, k = 5, prefilter = 20)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- IVF-PQ composition (Ann.ivfPqSearch): coarse lists bound
    //     WHICH codes are scanned, PQ bounds the BYTES per code — the
    //     full FAISS-IVFPQ shape, deterministic end-to-end ------------
    "q_ann_ivf_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      val ivf = graft.functions.Ann.sampledIvf(e, k = 8)
      val pq = graft.functions.Ann.sampledPq(e, nSub = 8, nCents = 16)
      graft.functions.Ann.ivfPqSearch(ivf, pq, probes, e,
          k = 5, nProbe = 4, prefilter = 20)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- IVF + residual PQ (Ann.ivfResidualPqSearch): codes quantize
    //     x - c_list (a tighter cloud than x), approx dot = exact
    //     list-centroid term + quantized residual correction ----------
    "q_ann_ivf_rpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      val ivf = graft.functions.Ann.sampledIvf(e, k = 8)
      val rpq = graft.functions.Ann.sampledResidualPq(ivf, e, nSub = 8, nCents = 16)
      graft.functions.Ann.ivfResidualPqSearch(ivf, rpq, probes, e,
          k = 5, nProbe = 4, prefilter = 20)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- line-level dedup (Dedup.dropDuplicateLines): CCNet-style
    //     boilerplate removal — lines occurring > 15 times corpus-wide
    //     dropped, documents reassembled in order. Lines are planted as
    //     2-token chunks (word-soup vocab ≈ 900 distinct bigrams over
    //     ~12k lines — the cap splits the corpus ~50/50, exercising
    //     both the drop and ordered-reassembly paths); cardinality
    //     preserved -------------------------------------------------
    "q_line_dedup" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        array_join(Text.chunkTokens(col("text"), 2, 2), "\n").as("text"))
      Dedup.dropDuplicateLines(planted, "doc_id", "text", maxOccurrences = 15)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // --- corpus health report (per-language distribution stats): the
    //     dataset card a corpus release ships with. Percentiles are
    //     Spark's exact `percentile` (sort + linear interpolation —
    //     same formula as DuckDB quantile_cont); variance is EXACT
    //     integer arithmetic (n*Σx² - (Σx)²) / n² cast to double at
    //     the end — never an accumulation-order-dependent float agg --
    "q_corpus_report" -> ((s, dir) => {
      val n = Text.tokenCount(col("text")).cast("long")
      val agg = t(s, dir, "documents")
        .select(col("lang"), n.as("n"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n")).as("min_tok"), max(col("n")).as("max_tok"),
          percentile(col("n"), lit(0.5)).as("median_tok"),
          percentile(col("n"), lit(0.9)).as("p90_tok"),
          sum(col("n")).as("_s"), sum(col("n") * col("n")).as("_ss"))
      agg.select(col("lang"), col("n_docs"), col("min_tok"), col("max_tok"),
          col("median_tok"), col("p90_tok"),
          (col("_s").cast("double") / col("n_docs")).as("mean_tok"),
          ((col("n_docs") * col("_ss") - col("_s") * col("_s")).cast("double") /
            (col("n_docs").cast("double") * col("n_docs"))).as("var_tok"))
        .orderBy(col("lang"))
    }),

    // --- pivot (relational-adjacent, beyond the reference): per-source
    //     event-type matrix — count + exact-decimal value sum per cell.
    //     Spark `pivot` with explicit values (no extra distinct scan);
    //     the oracle is the portable FILTER-aggregation spelling ------
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(10)).as("user_bucket"),
          col("event_type"), col("value"))
        .groupBy(col("user_bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("v_milli"))
      // pivot count yields NULL for an empty (bucket, type) cell; the
      // oracle's count(*) FILTER yields 0 — align by construction, not
      // by corpus density (sum stays NULL-on-empty on both sides)
      pivoted.select(col("user_bucket") +:
          types.map(tp => coalesce(col(s"${tp}_n"), lit(0L)).as(s"${tp}_n")) ++:
          types.map(tp => col(s"${tp}_v_milli")): _*)
        .orderBy(col("user_bucket"))
    }),

    // --- FLAGSHIP corpus pipeline: the full pre-tokenizer chain in one
    //     oracle-checked run — quality gate -> exact dedup (min-id
    //     survivor) -> benchmark decontamination -> per-language
    //     stratified rebalance -> greedy sequence packing. Every stage
    //     is the REAL operator; the oracle replays the whole chain,
    //     including the final greedy fold over exactly the surviving
    //     docs ------------------------------------------------------
    "q_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val benchmark = docs.filter(pmod(col("doc_id"), lit(19)) === 0)
      // 1. quality floor
      val quality = docs.filter(Text.qualityScore(col("text")) >= 0.7)
      // 2. exact dedup, deterministic min-id survivor
      val deduped = graft.operators.Dedup.keepMaxBy(
        quality.withColumn("_fp", Text.fingerprint(col("text")))
          .withColumn("_negid", -col("doc_id")),
        keys = Seq("_fp"), delta = Seq("_negid"))
        .drop("_fp", "_negid")
      // 3. drop benchmark members + contaminated docs
      val corpus = deduped.filter(pmod(col("doc_id"), lit(19)) =!= 0)
      val clean = corpus.join(
        Similarity.benchmarkOverlap(corpus, benchmark, "doc_id", "text",
            n = 3, threshold = 0.15)
          .filter(!col("contaminated"))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      // 4. rebalance languages
      val balanced = Converters.sampleFractionPerGroup("lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 1.0)(clean)
      // 5. pack into training sequences
      val counted = balanced.select(col("doc_id"),
        pmod(col("doc_id"), lit(8)).as("shard"),
        Text.tokenCount(col("text")).as("n_tok"))
      Packing.packGreedy(counted, "shard", "doc_id", "n_tok", budget = 256)
        .orderBy(col("shard"), col("doc_id"))
    }),

    // --- REAL audio decode (Multimodal.WavCodec): valid RIFF/WAVE
    //     PCM16 containers are synthesized per row from table
    //     parameters, then the actual chunk-walking parser extracts
    //     rate/bits/samples and computes mean |amplitude| from the LE
    //     sample bytes. The oracle replays the expected features from
    //     the SAME parameters — a header misread or endianness slip
    //     mismatches immediately ------------------------------------
    "q_wav_decode" -> ((s, dir) => {
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
      Multimodal.decodeWav(media).toDF().orderBy(col("media_id"))
    }),

    // --- REAL image decode (Multimodal.BmpCodec): uncompressed 24-bpp
    //     BMPs synthesized per row (width varies with doc_id so the
    //     4-byte row stride padding actually varies), parsed by the
    //     real header/stride walker; oracle replays mean intensity
    //     from the linear channel formula -----------------------------
    "q_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 8 + (id % 5).toInt
          val h = 4 + (id % 3).toInt
          (id, Multimodal.BmpCodec.synthesize(w, h, i => ((id * 7 + i) % 256).toInt))
        }).toDF("media_id", "content")
      Multimodal.decodeBmp(media).toDF().orderBy(col("media_id"))
    }),

    // --- mixed-modality dispatch (Multimodal.decodeAuto): a single
    //     binary column carrying WAVs, PNGs, BMPs, GIFs, ZIPs and
    //     TARs keyed by id % 6; magic-byte sniffing routes each
    //     payload to its REAL codec (archives probe member counts +
    //     payload means). The oracle replays all six formulas --------
    "q_media_dispatch" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{GifCodec, Multimodal, PngCodec, TarCodec, ZipCodec}
      val media = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, n) =>
          val w = 8 + (id % 5).toInt
          val h = 4 + (id % 3).toInt
          def archiveMembers: Seq[(String, Array[Byte])] = {
            val nm = 1 + (id % 3).toInt
            val len = 50 + (id % 20).toInt
            (0 until nm).map(k => (f"m$k.bin",
              Array.tabulate(len)(i => ((id * 13 + k * 7 + i) % 256).toByte)))
          }
          val bytes = (id % 6) match {
            case 0L =>
              val rate = 8000 + (id % 3).toInt * 4000
              Multimodal.WavCodec.synthesize(rate, Array.tabulate(n.toInt)(i =>
                (((id * 31 + i * 17) % 65536) - 32768).toShort))
            case 1L =>
              PngCodec.encode(w, h, 1,
                Array.tabulate(w * h)(i => ((id * 7 + i) % 256).toByte))
            case 2L =>
              Multimodal.BmpCodec.synthesize(w, h, i => ((id * 7 + i) % 256).toInt)
            case 3L =>
              val pal = new Array[Byte](768)
              var j = 0
              while (j < 256) {
                pal(j * 3) = j.toByte; pal(j * 3 + 1) = j.toByte
                pal(j * 3 + 2) = j.toByte
                j += 1
              }
              GifCodec.encode(w, h, pal,
                Seq(Array.tabulate(w * h)(i => ((id * 11 + i) % 256).toByte)))
            case 4L => ZipCodec.write(archiveMembers)
            case _ => TarCodec.write(archiveMembers)
          }
          (id, bytes)
        }).toDF("media_id", "content")
      Multimodal.decodeAuto(media).toDF().orderBy(col("media_id"))
    }),

    // --- REAL video-container probe (Multimodal.Mp4Codec): minimal
    //     ISO BMFF files synthesized per row (ftyp + moov/mvhd/trak),
    //     probed by the big-endian box walker; only codec FRAME decode
    //     remains a fake (no decoder in container) -------------------
    "q_mp4_probe" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, n) =>
          (id, Multimodal.Mp4Codec.synthesize(
            timescale = 600 + (id % 4).toInt * 300,
            duration = (n * 100).toInt,
            nTracks = 1 + (id % 3).toInt))
        }).toDF("media_id", "content")
      Multimodal.probeMp4(media).toDF().orderBy(col("media_id"))
    }),

    // --- stratified per-group fraction sampling (Converters.
    //     sampleFractionPerGroup): rebalance the corpus by language —
    //     en halved, de quartered, everything else at 10%. md5-prefix
    //     thresholds, so membership is stable under growth and the
    //     oracle replays the exact compare --------------------------
    "q_stratified_sample" -> ((s, dir) => {
      Converters.sampleFractionPerGroup("lang", "doc_id",
          Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)(
          t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql4: Map[String, String] = Map(

    "q_decontaminate" ->
      """WITH docsh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        |    ELSE [] END)) AS s
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
        |        FROM documents)
        |), bench AS (
        |  SELECT DISTINCT s FROM docsh WHERE doc_id % 19 = 0
        |), hits AS (
        |  SELECT d.doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap
        |  FROM docsh d LEFT JOIN bench b ON d.s = b.s
        |  WHERE d.doc_id % 19 <> 0
        |  GROUP BY d.doc_id
        |)
        |SELECT doc.doc_id,
        |  coalesce(h.n_shingles, 0) AS n_shingles,
        |  coalesce(h.n_overlap, 0) AS n_overlap,
        |  CAST(coalesce(h.n_overlap, 0) AS DOUBLE) /
        |    CAST(greatest(coalesce(h.n_shingles, 0), 1) AS DOUBLE) AS overlap_ratio,
        |  CAST(coalesce(h.n_overlap, 0) AS DOUBLE) /
        |    CAST(greatest(coalesce(h.n_shingles, 0), 1) AS DOUBLE) >= 0.05 AS contaminated
        |FROM documents doc LEFT JOIN hits h ON doc.doc_id = h.doc_id
        |WHERE doc.doc_id % 19 <> 0
        |ORDER BY doc.doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS INT) AS n_tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec(shard, doc_id, n_tok, rn, seq_id, fill) AS (
        |  SELECT shard, doc_id, n_tok, rn, CAST(0 AS BIGINT), CAST(n_tok AS BIGINT)
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.doc_id, d.n_tok, d.rn,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.seq_id ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.fill + d.n_tok ELSE CAST(d.n_tok AS BIGINT) END
        |  FROM rec r JOIN docs d ON d.shard = r.shard AND d.rn = r.rn + 1
        |)
        |SELECT shard, doc_id, n_tok, seq_id FROM rec
        |ORDER BY shard, doc_id""".stripMargin,

    "q_chunk_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents
        |)
        |SELECT doc_id, CAST(ch.k AS INT) AS chunk_id,
        |  CAST(len(t[ch.k * 24 + 1 : ch.k * 24 + 32]) AS INT) AS n_chunk_tokens,
        |  array_to_string(t[ch.k * 24 + 1 : ch.k * 24 + 32], ' ') AS chunk_text
        |FROM toks, LATERAL (
        |  SELECT unnest(range(0, (greatest(len(t) - 32, 0) + 23) // 24 + 1)) AS k) ch
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_normalize_text" ->
      """WITH p AS (
        |  SELECT doc_id, text, translate(text, 'aeiou', 'áéíóú') AS planted
        |  FROM documents
        |)
        |SELECT doc_id, planted,
        |  strip_accents(nfc_normalize(planted)) AS restored,
        |  strip_accents(nfc_normalize(planted)) = text AS roundtrip
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_dup_saturation" ->
      """WITH docsh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        |    ELSE [] END)) AS s
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
        |        FROM documents)
        |), freq AS (
        |  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS dfc FROM docsh
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN dfc > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles
        |  FROM freq GROUP BY doc_id
        |)
        |SELECT doc.doc_id,
        |  coalesce(a.n_shingles, 0) AS n_shingles,
        |  coalesce(a.n_dup_shingles, 0) AS n_dup_shingles,
        |  CAST(coalesce(a.n_dup_shingles, 0) AS DOUBLE) /
        |    CAST(greatest(coalesce(a.n_shingles, 0), 1) AS DOUBLE) AS dup_saturation
        |FROM documents doc LEFT JOIN agg a ON doc.doc_id = a.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    "q_url_blocklist" -> {
      s"""WITH r AS (
         |  SELECT doc_id,
         |    substring(text, 1, 30) || ' see https://' || source || '.' || lang ||
         |    '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' and http://ads.tracker' ||
         |    CAST(doc_id % 3 AS VARCHAR) || '.net/x?id=' || CAST(doc_id AS VARCHAR) AS raw
         |  FROM documents
         |), u AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_transform(
         |      regexp_extract_all(raw, '${Text.UrlRe}', 0),
         |      x -> lower(regexp_extract(x, 'https?://([A-Za-z0-9.-]+)', 1))))) AS doms,
         |    CAST(len(regexp_extract_all(raw, '${Text.UrlRe}', 0)) AS INT) AS n_urls
         |  FROM r
         |)
         |SELECT doc_id, n_urls, array_to_string(doms, ',') AS domain_list,
         |  len(list_filter(doms, d -> d IN ('ads.tracker0.net', 'ads.tracker2.net'))) > 0 AS blocked
         |FROM u ORDER BY doc_id""".stripMargin
    },

    "q_pack_texts" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS INT) AS n_tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec(shard, doc_id, n_tok, rn, seq_id, fill) AS (
        |  SELECT shard, doc_id, n_tok, rn, CAST(0 AS BIGINT), CAST(n_tok AS BIGINT)
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.doc_id, d.n_tok, d.rn,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.seq_id ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.fill + d.n_tok ELSE CAST(d.n_tok AS BIGINT) END
        |  FROM rec r JOIN docs d ON d.shard = r.shard AND d.rn = r.rn + 1
        |)
        |SELECT r.shard, r.seq_id, count(*) AS n_docs,
        |  CAST(sum(r.n_tok) AS BIGINT) AS seq_tokens,
        |  string_agg(d.text, ' <|doc|> ' ORDER BY r.doc_id) AS seq_text
        |FROM rec r JOIN documents d ON r.doc_id = d.doc_id
        |GROUP BY r.shard, r.seq_id
        |ORDER BY shard, seq_id""".stripMargin,

    "q_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        |), dfq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), n AS (SELECT count(*) AS nn FROM documents)
        |SELECT doc_id, term, tf, df,
        |  CAST(tf * nn AS DOUBLE) / CAST(df AS DOUBLE) AS weight
        |FROM tf JOIN dfq USING (term) CROSS JOIN n
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) <= 3
        |ORDER BY doc_id, weight DESC, term""".stripMargin,

    "q_ann_pq" ->
      OracleSql.annPq(k = 5, prefilter = 20, probeMod = 100),

    "q_ann_ivf_pq" ->
      OracleSql.annIvfPq(k = 5, nProbe = 4, prefilter = 20, probeMod = 100),

    "q_ann_ivf_rpq" ->
      OracleSql.annIvfResidualPq(k = 5, nProbe = 4, prefilter = 20, probeMod = 100),

    "q_line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents
        |), lines AS (
        |  SELECT doc_id, CAST(ch.k AS INT) AS pos,
        |    array_to_string(t[ch.k * 2 + 1 : ch.k * 2 + 2], ' ') AS line
        |  FROM toks, LATERAL (
        |    SELECT unnest(range(0, (greatest(len(t) - 2, 0) + 1) // 2 + 1)) AS k) ch
        |), freq AS (
        |  SELECT doc_id, pos, line, count(*) OVER (PARTITION BY line) AS lf FROM lines
        |), reb AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
        |  FROM freq WHERE lf <= 15 GROUP BY doc_id
        |), tot AS (
        |  SELECT doc_id,
        |    CAST((greatest(len(t) - 2, 0) + 1) // 2 + 1 AS BIGINT) AS n_lines
        |  FROM toks
        |)
        |SELECT tot.doc_id, tot.n_lines,
        |  coalesce(reb.n_kept, 0) AS n_kept,
        |  coalesce(reb.cleaned_text, '') AS cleaned_text
        |FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    "q_corpus_pipeline" -> {
      import graft.operators.Converters.fractionCut
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, lang, text,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, lang, text, tk FROM toks
        |  WHERE (CASE WHEN len(tk) BETWEEN 20 AND 10000 THEN 0.5 ELSE 0.0 END
        |    + CASE WHEN (CAST(len(list_filter(tk, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
        |        / CAST(greatest(len(tk), 1) AS DOUBLE)) > 0.0 THEN 0.3 ELSE 0.0 END)
        |    + CASE WHEN (CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |        / CAST(greatest(length(text), 1) AS DOUBLE)) < 0.1 THEN 0.2 ELSE 0.0 END >= 0.7
        |), dd AS (
        |  SELECT doc_id, lang, tk FROM q
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        |), benchsh AS (
        |  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
        |    ELSE [] END)) AS s
        |  FROM toks WHERE doc_id % 19 = 0
        |), docsh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
        |    ELSE [] END)) AS s
        |  FROM dd WHERE doc_id % 19 <> 0
        |), hits AS (
        |  SELECT d.doc_id, count(*) AS n_sh,
        |    sum(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS n_ov
        |  FROM docsh d LEFT JOIN benchsh b ON d.s = b.s GROUP BY d.doc_id
        |), clean AS (
        |  SELECT dd.doc_id, dd.lang, dd.tk FROM dd
        |  LEFT JOIN hits h ON h.doc_id = dd.doc_id
        |  WHERE dd.doc_id % 19 <> 0
        |    AND CAST(coalesce(h.n_ov, 0) AS DOUBLE)
        |      / CAST(greatest(coalesce(h.n_sh, 0), 1) AS DOUBLE) < 0.15
        |), bal AS (
        |  SELECT doc_id, tk FROM clean
        |  WHERE substring(md5('graft' || '|' || CAST(doc_id AS VARCHAR)), 1, 4) <
        |""".stripMargin +
      s"""    CASE WHEN lang = 'de' THEN '${fractionCut(0.25)}'
         |         WHEN lang = 'en' THEN '${fractionCut(0.5)}' ELSE 'g' END
         |""".stripMargin +
      """), pdocs AS (
        |  SELECT doc_id % 8 AS shard, doc_id, CAST(len(tk) AS INT) AS n_tok,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM bal
        |), rec(shard, doc_id, n_tok, rn, seq_id, fill) AS (
        |  SELECT shard, doc_id, n_tok, rn, CAST(0 AS BIGINT), CAST(n_tok AS BIGINT)
        |  FROM pdocs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.doc_id, d.n_tok, d.rn,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.seq_id ELSE r.seq_id + 1 END,
        |    CASE WHEN r.fill + d.n_tok <= 256 THEN r.fill + d.n_tok ELSE CAST(d.n_tok AS BIGINT) END
        |  FROM rec r JOIN pdocs d ON d.shard = r.shard AND d.rn = r.rn + 1
        |)
        |SELECT shard, doc_id, n_tok, seq_id FROM rec
        |ORDER BY shard, doc_id""".stripMargin
    },

    "q_wav_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS n_channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(n_chars AS BIGINT) AS n_samples,
        |  CAST(n_chars AS BIGINT) * 1000000 // (8000 + (doc_id % 3) * 4000) AS duration_us,
        |  CAST(list_sum(list_transform(range(0, n_chars),
        |    i -> abs((doc_id * 31 + i * 17) % 65536 - 32768))) AS DOUBLE)
        |    / CAST(n_chars AS DOUBLE) AS mean_abs_amp
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_bmp_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 5 AS INT) AS width,
        |  CAST(4 + doc_id % 3 AS INT) AS height,
        |  CAST(24 AS INT) AS bpp,
        |  (8 + doc_id % 5) * (4 + doc_id % 3) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, (8 + doc_id % 5) * (4 + doc_id % 3) * 3),
        |    i -> (doc_id * 7 + i) % 256)) AS DOUBLE)
        |    / CAST((8 + doc_id % 5) * (4 + doc_id % 3) * 3 AS DOUBLE) AS mean_intensity
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_media_dispatch" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    (8 + doc_id % 5) * (4 + doc_id % 3) AS np,
        |    1 + doc_id % 3 AS nm, 50 + doc_id % 20 AS ml FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/png'
        |    WHEN 2 THEN 'image/bmp' WHEN 3 THEN 'image/gif'
        |    WHEN 4 THEN 'application/zip' ELSE 'application/x-tar'
        |  END AS modality,
        |  CASE doc_id % 6 WHEN 0 THEN CAST(n_chars AS BIGINT)
        |    WHEN 3 THEN 1 WHEN 4 THEN nm WHEN 5 THEN nm ELSE np END AS n_units,
        |  CASE doc_id % 6
        |  WHEN 0 THEN
        |    CAST(list_sum(list_transform(range(0, n_chars),
        |      i -> abs((doc_id * 31 + i * 17) % 65536 - 32768))) AS DOUBLE)
        |      / CAST(n_chars AS DOUBLE)
        |  WHEN 1 THEN
        |    CAST(list_sum(list_transform(range(0, np),
        |      i -> (doc_id * 7 + i) % 256)) AS DOUBLE) / CAST(np AS DOUBLE)
        |  WHEN 2 THEN
        |    CAST(list_sum(list_transform(range(0, np * 3),
        |      i -> (doc_id * 7 + i) % 256)) AS DOUBLE) / CAST(np * 3 AS DOUBLE)
        |  WHEN 3 THEN
        |    CAST(list_sum(list_transform(range(0, np),
        |      i -> (doc_id * 11 + i) % 256)) AS DOUBLE) / CAST(np AS DOUBLE)
        |  ELSE
        |    CAST(list_sum(list_transform(range(0, nm * ml), j ->
        |      (doc_id * 13 + (j // ml) * 7 + j % ml) % 256)) AS DOUBLE)
        |      / CAST(nm * ml AS DOUBLE)
        |  END AS mean_val
        |FROM d ORDER BY media_id""".stripMargin,

    "q_mp4_probe" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
        |  CAST(600 + (doc_id % 4) * 300 AS BIGINT) AS timescale,
        |  CAST(n_chars * 100 AS BIGINT) AS duration_units,
        |  (n_chars * 100) * 1000 // (600 + (doc_id % 4) * 300) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_corpus_report" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs, min(n) AS min_tok, max(n) AS max_tok,
        |  quantile_cont(n, 0.5) AS median_tok, quantile_cont(n, 0.9) AS p90_tok,
        |  CAST(sum(n) AS DOUBLE) / count(*) AS mean_tok,
        |  CAST(count(*) * sum(n * n) - sum(n) * sum(n) AS DOUBLE) /
        |    (CAST(count(*) AS DOUBLE) * count(*)) AS var_tok
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q_pivot" -> {
      val cells = Seq("click", "error", "purchase", "signup", "view").map { t =>
        s"""  count(*) FILTER (event_type = '$t') AS ${t}_n,
           |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) FILTER (event_type = '$t') AS BIGINT) AS ${t}_v_milli"""
          .stripMargin
      }.mkString(",\n")
      s"""SELECT user_id % 10 AS user_bucket,
         |$cells
         |FROM events GROUP BY user_id % 10 ORDER BY user_bucket""".stripMargin
    },

    "q_stratified_sample" -> {
      import graft.operators.Converters.fractionCut
      s"""SELECT doc_id, lang FROM documents
         |WHERE substring(md5('graft' || '|' || CAST(doc_id AS VARCHAR)), 1, 4) <
         |  CASE WHEN lang = 'de' THEN '${fractionCut(0.25)}'
         |       WHEN lang = 'en' THEN '${fractionCut(0.5)}'
         |       ELSE '${fractionCut(0.1)}' END
         |ORDER BY doc_id""".stripMargin
    }
  )
}
