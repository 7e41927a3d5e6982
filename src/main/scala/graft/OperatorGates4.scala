package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NormalizeNfc, Similarity, StripAccents, Text}
import graft.operators.Packing

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
        .select(col("doc_id"),
          posexplode(Text.chunkTokens(col("text"), chunkSize = 32, stride = 24))
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
        |FROM p ORDER BY doc_id""".stripMargin
  )
}
