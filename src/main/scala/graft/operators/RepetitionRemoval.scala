package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Repetition REMOVAL — the action step behind the Gopher repetition
  * quality signals ("Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", Rae et al. 2021, §A1.1: documents
  * exceeding duplicate-n-gram thresholds are filtered; Dolma and
  * RefinedWeb apply the same family with trim variants). The signals
  * themselves live in [[graft.functions.Text]] (dupNgramRatio et al.);
  * this operator turns them into per-document dispositions:
  *
  *   - `drop` — the duplicate-n-gram ratio exceeds `dropAbove`: the
  *     document is dominated by repetition (scrape loops, chat spam)
  *     and is removed outright;
  *   - `trim` — the ratio exceeds `trimAbove` but not `dropAbove`:
  *     salvageable. Every WITHIN-document repeated token span of
  *     >= trimK tokens is deleted (all occurrences, the ExactSubstr
  *     policy) via the same gaps-and-islands machinery as
  *     [[SubstringDedup]] — only the duplication scope differs
  *     (grams repeated inside one doc, not across the corpus);
  *   - `keep` — below both thresholds: untouched.
  *
  * Scale shape: the classify pass is one codegen'd projection (no
  * shuffle); the trim pass runs only over the trim slice and its
  * gram aggregate is keyed by (doc, fingerprint) — per-document
  * cardinality, so there is no corpus-wide hot-gram key the way the
  * cross-doc dedup aggregate has, and the islands window is bounded
  * by document. Nothing here is corpus-quadratic.
  */
object RepetitionRemoval {

  /** Maximal token spans repeated WITHIN each document: a gram
    * fingerprint counts as duplicated only when it occurs at more
    * than one position inside the SAME document (cross-document
    * duplication is [[SubstringDedup.duplicatedSpans]]'s scope).
    * Returns (idCol, span_start, span_end, span_len), same contract
    * as the cross-doc variant.
    */
  def repeatedSpansWithinDoc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minSpanTokens: Int = 0): DataFrame = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    val minSpan = math.max(minSpanTokens, k)
    val grams = SubstringDedup.gramsOf(df, idCol, textCol, k)
    // (doc, fp) keyed — bounded by one document's gram count, so no
    // corpus-wide hot key (the reason the CROSS-doc variant must stay
    // an aggregate + join-back does not apply here), which makes a
    // count window safe: ONE pass over one gram projection instead of
    // aggregate + semi-join over two of them — gramsOf re-tokenizes
    // its input, so the saved scan is the expensive half
    val dupPos = grams
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol), col("fp"))))
      .where(col("cnt") > 1)
      .select(col(idCol), col("i"))
    SubstringDedup.islandsToSpans(dupPos, idCol, k, minSpan)
  }

  /** Classify + act. Output = input columns plus:
    *   dup_ratio     duplicate-`dupN`-gram fraction (the signal),
    *   action        'drop' | 'trim' | 'keep',
    *   n_tokens      raw token count,
    *   n_dup_tokens  tokens removed (all for drops, span tokens for
    *                 trims, 0 for keeps),
    *   clean_text    surviving text (null for drops).
    * Cardinality accounting is a groupBy(action) away; the row set is
    * the input's (drops stay as rows so the ledger balances —
    * filtering them out is the caller's one-line decision).
    */
  def clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dupN: Int = 3,
      dropAbove: Double = 0.5,
      trimK: Int = 10,
      trimAbove: Double = 0.1): DataFrame = {
    require(dupN >= 1, s"dupN must be >= 1, got $dupN")
    require(dropAbove > trimAbove && trimAbove >= 0.0,
      s"need dropAbove > trimAbove >= 0, got $dropAbove / $trimAbove")
    val flagged = df
      .withColumn("dup_ratio", Text.dupNgramRatio(col(textCol), dupN))
      .withColumn("action",
        when(col("dup_ratio") > dropAbove, "drop")
          .when(col("dup_ratio") > trimAbove, "trim")
          .otherwise("keep"))
    val rawTokens = size(split(coalesce(col(textCol), lit("")), " ")).cast("long")
    // keeps and drops are row-wise transforms of the same scan — one
    // branch with when() instead of two union arms, so the (expensive,
    // whole-corpus) dup-ratio projection above runs once for both
    val keptOrDropped = flagged.filter(col("action") =!= "trim")
      .withColumn("n_tokens", rawTokens)
      .withColumn("n_dup_tokens",
        when(col("action") === "drop", rawTokens).otherwise(lit(0L)))
      .withColumn("clean_text",
        when(col("action") === "drop", lit(null).cast("string"))
          .otherwise(col(textCol)))
    // the trim slice feeds the gram aggregate, the dup-key semi-join,
    // and the span removal — materialize it once (bounded by the trim
    // slice, typically a small fraction of the corpus) so those passes
    // don't each re-run the dup-ratio classify over everything. A lazy
    // localCheckpoint, NOT persist: this is a library operator whose
    // result the caller materializes later, so there is no in-operator
    // release point, and persist would pin the plan in the SQL
    // CacheManager forever (one leaked cache entry per call). The
    // checkpoint blocks are GC-reclaimed with the plan, and each call
    // materializes its own blocks (no cross-run cache reuse).
    val toTrim = flagged.filter(col("action") === "trim")
      .localCheckpoint(false)
    val trimmed = SubstringDedup.applySpanRemoval(toTrim, idCol, textCol,
      repeatedSpansWithinDoc(toTrim, idCol, textCol, trimK))
    keptOrDropped.unionByName(trimmed)
  }
}
