package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing for training-batch preparation: concatenate
  * documents (in a deterministic order) into fixed-token-budget
  * training sequences, opening a new sequence whenever the next
  * document would overflow the budget. This is the standard packing
  * pass between dedup/filtering and the tokenizer — unpacked batches
  * waste the padded tail of every short document.
  *
  * Packing is inherently sequential WITHIN a sequence stream, so the
  * unit of parallelism is the shard: all rows of a shard are hashed to
  * one partition (`repartition(shard)`), ordered by id
  * (`sortWithinPartitions`), and packed by a single linear pass per
  * partition — the honest `mapPartitions` seam. Shards are the same
  * deterministic id-hash shards the split/shuffle operators use, so at
  * 100 TB the pass runs as thousands of independent shard streams, one
  * executor task each, no driver involvement and no shuffle beyond the
  * one hash repartition.
  *
  * Determinism: (shard, doc_id) ordering fixes the greedy outcome
  * regardless of partition count or input order — reruns and retries
  * produce identical assignments (and the DuckDB oracle replays the
  * same greedy recurrence per shard).
  */
object Packing {

  /** One packed document: its shard, id, token count, and the sequence
    * ordinal it was packed into (0-based within the shard).
    */
  case class PackedDoc(shard: Long, doc_id: Long, n_tok: Int, seq_id: Long)

  /** Assign each document to a training sequence: greedy first-fit in
    * (shard, id) order. A document larger than the budget gets a
    * sequence of its own (it is the trainer's job to truncate).
    *
    * Input columns: `shardCol` (integral), `idCol` (integral),
    * `tokensCol` (integral token count — e.g. `Text.tokenCount`).
    * Output: (shard, doc_id, n_tok, seq_id).
    */
  /** Shard-count sizing for [[packGreedy]]: a shard is both the
    * packing parallelism unit and the greedy fold's sequential extent,
    * so its size must track the CORPUS, not the cluster — 32 shards
    * over a 100 TB corpus means 32 stragglers folding billions of docs
    * each. ceil(nDocs / targetDocsPerShard) keeps every shard's fold a
    * bounded linear pass regardless of total scale (the same sizing
    * discipline as `withStatePartitions`).
    */
  def shardsFor(nDocs: Long, targetDocsPerShard: Long): Int = {
    require(nDocs >= 0 && targetDocsPerShard > 0,
      s"need nDocs >= 0 and targetDocsPerShard > 0, got $nDocs / $targetDocsPerShard")
    math.max(1L,
      math.min(Int.MaxValue.toLong,
        (nDocs + targetDocsPerShard - 1) / targetDocsPerShard)).toInt
  }

  def packGreedy(docs: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("int").as("n_tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Int)]
    prepared.mapPartitions { it =>
      // linear pass; state resets at shard boundaries (a partition may
      // carry several whole shards, never a fragment of one)
      var curShard = 0L
      var seq = 0L
      var fill = 0L
      var first = true
      it.map { case (shard, id, nTok) =>
        if (first || shard != curShard) {
          curShard = shard; seq = 0L; fill = nTok.toLong; first = false
        } else if (fill + nTok <= budget) {
          fill += nTok
        } else {
          seq += 1L; fill = nTok.toLong
        }
        PackedDoc(shard, id, nTok, seq)
      }
    }.toDF()
  }

  /** Per-sequence fill summary over a [[packGreedy]] result — the
    * packing-efficiency report (sequences, docs per sequence, fill
    * fraction against the budget).
    */
  def packStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"))
      .withColumn("fill_ratio", col("seq_tokens").cast("double") / budget.toDouble)

  /** Materialize the packed sequences as text: one row per (shard,
    * seq_id) with member documents concatenated in doc_id order,
    * `separator` between them — the row a tokenizer actually consumes.
    *
    * One join (assignment → text) and one hash aggregation. The
    * per-group `collect_list` here is SAFE at scale, unlike a hot
    * shingle list: group payload is bounded by the token budget BY
    * CONSTRUCTION (a sequence never exceeds `budget` tokens except a
    * single oversized document, which forms a singleton group), so no
    * cap machinery is needed. Ordering inside the group is imposed by
    * `sort_array` over (doc_id, text) structs — deterministic
    * regardless of aggregation arrival order.
    */
  def materializeSequences(packed: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, separator: String): DataFrame = {
    val joined = packed.join(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("_text")), Seq("doc_id"))
    joined.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"),
        array_join(
          transform(sort_array(collect_list(struct(col("doc_id"), col("_text")))),
            s => s.getField("_text")),
          separator).as("seq_text"))
  }
}
