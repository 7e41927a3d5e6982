package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fnv64, Text}

/** T5/UL2-style span-corruption data synthesis: turn each document
  * into a (input, target) denoising pair by masking token spans —
  *
  *   input  = unmasked tokens with each masked RUN collapsed to one
  *            sentinel `<extra_id_k>`;
  *   target = for each run, its sentinel followed by the tokens it
  *            removed (runs in order).
  *
  * Masking is deterministic (the repo's seedless-determinism rule):
  * token positions group into fixed-size BLOCKS and a block masks iff
  * FNV64(docId|blockId) % maskMod == 0 — consecutive masked blocks
  * merge into one span, so span lengths vary (geometric-ish) while
  * reruns and the DuckDB oracle reproduce the exact same pairs.
  *
  * 100 TB shape: one posexplode, per-doc windows over BLOCK rows
  * (tokens/blockSize cardinality, partitioned by doc — no global
  * window), and two sorted-collect assemblies per doc (bounded by doc
  * length, the same device as the substring-dedup text rebuild).
  */
object SpanCorruption {

  /** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022,
    * arXiv:2207.14255; the StarCoder/code-model pretraining transform):
    * deterministically split each doc's token stream into
    * (prefix, middle, suffix) and emit the PSM reordering
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` — the model learns
    * infilling from plain next-token prediction. Split points are
    * FNV-derived fractions of the token count (seedless determinism):
    * cut1 = fnv(id|a) % (n+1), cut2 = fnv(id|b) % (n+1), ordered.
    * Pure projection + one tokens pass — no shuffle at all beyond the
    * scan.
    */
  def fim(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Text.tokens(coalesce(col(textCol), lit("")))
    val n = size(toks).cast("long")
    def cut(salt: String) =
      pmod(Fnv64(concat_ws("|", col(idCol), lit(salt))), n + 1L)
    // empty segments become NULL so concat_ws skips them (no double
    // spaces between adjacent sentinels)
    def seg(c: org.apache.spark.sql.Column) = nullif(concat_ws(" ", c), lit(""))
    docs
      .withColumn("_t", toks)
      .withColumn("_c1", least(cut("fimA"), cut("fimB")))
      .withColumn("_c2", greatest(cut("fimA"), cut("fimB")))
      .select(col(idCol),
        concat_ws(" ",
          lit("<fim_prefix>"),
          seg(slice(col("_t"), lit(1), col("_c1").cast("int"))),
          lit("<fim_suffix>"),
          seg(slice(col("_t"), col("_c2").cast("int") + 1,
            (size(col("_t")).cast("long") - col("_c2")).cast("int"))),
          lit("<fim_middle>"),
          seg(slice(col("_t"), col("_c1").cast("int") + 1,
            (col("_c2") - col("_c1")).cast("int")))).as("psm_text"),
        col("_c1").as("n_prefix"),
        (col("_c2") - col("_c1")).as("n_middle"),
        (size(col("_t")).cast("long") - col("_c2")).as("n_suffix"))
  }

  /** One row per input doc: (id, input_text, target_text, n_spans,
    * n_masked_tokens). Docs with nothing masked keep their full text
    * and an empty target.
    */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 3, maskMod: Int = 4): DataFrame = {
    require(blockSize >= 1 && maskMod >= 1, "blockSize and maskMod must be >= 1")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(Text.tokens(coalesce(col(textCol), lit("")))).as(Seq("pos", "tok")))
      .withColumn("block", expr(s"pos div $blockSize"))
      .withColumn("masked",
        pmod(Fnv64(concat_ws("|", col("id"), col("block"))), lit(maskMod)) === 0)
    // blocks are consecutive integers per doc (every block holds >= 1
    // token), so run detection is plain lag-adjacency
    val wb = Window.partitionBy(col("id")).orderBy(col("block"))
    val blocks = toks.select(col("id"), col("block"), col("masked")).distinct()
      .withColumn("run_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(wb), lit(false)))
      .withColumn("run_id",
        sum(when(col("run_start"), 1L).otherwise(0L))
          .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
    // `t` feeds FOUR assembly branches below (2 input + 2 target) plus
    // their aggregations; checkpoint it so the tokenize + window +
    // join subtree evaluates ONCE, not once per branch (same device as
    // BudgetSelect's frozen range exchange)
    val t = toks.join(blocks.select(col("id"), col("block"), col("run_id")),
      Seq("id", "block")).localCheckpoint(true)
    def sentinel(run: org.apache.spark.sql.Column) =
      concat(lit("<extra_id_"), run.cast("string"), lit(">"))
    // input pieces: unmasked tokens at their position; one sentinel per
    // run at the run's first token position
    val inputPieces = t.filter(!col("masked"))
      .select(col("id"), col("pos").cast("long").as("k"), col("tok").as("piece"))
      .unionByName(
        t.filter(col("masked")).groupBy(col("id"), col("run_id"))
          .agg(min(col("pos")).cast("long").as("k"))
          .select(col("id"), col("k"), sentinel(col("run_id")).as("piece")))
    val input = inputPieces.groupBy(col("id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("k"), col("piece")))),
        x => x.getField("piece"))).as("input_text"))
    // target pieces: per run its sentinel (sort key pos=-1) + tokens
    val targetPieces = t.filter(col("masked"))
      .select(col("id"), col("run_id"), col("pos").cast("long").as("p"),
        col("tok").as("piece"))
      .unionByName(
        t.filter(col("masked")).select(col("id"), col("run_id")).distinct()
          .select(col("id"), col("run_id"), lit(-1L).as("p"),
            sentinel(col("run_id")).as("piece")))
    val target = targetPieces.groupBy(col("id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("run_id"), col("p"), col("piece")))),
          x => x.getField("piece"))).as("target_text"),
        countDistinct(col("run_id")).as("n_spans"),
        count(when(col("p") >= 0, lit(1))).as("n_masked_tokens"))
    docs.select(col(idCol).as("id"))
      .join(input, Seq("id"), "left")
      .join(target, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked_tokens"), lit(0L)).as("n_masked_tokens"))
  }
}
