package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication — the suffix-array dedup of
  * "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2021), re-expressed for Spark.
  *
  * The paper builds one giant suffix array over the concatenated
  * corpus and scans it for repeated substrings of >= N tokens. A
  * monolithic suffix array does not distribute; the standard scale-out
  * equivalent is k-gram anchoring: a substring of >= k tokens repeats
  * iff every one of its k-token windows repeats, so
  *
  *   1. emit every k-token window (gram) of every document once, as
  *      (doc, pos, fingerprint) — a single projection, no shuffle;
  *   2. an aggregate over the fingerprint finds grams occurring at
  *      more than one (doc, pos) site, joined back to the gram
  *      positions — shuffles #1/#2. Deliberately a groupBy + join and
  *      NOT a count window: dedup corpora have ULTRA-HOT grams (a
  *      boilerplate k-gram present in most documents), and a window
  *      would sort every occurrence of a hot gram in one partition —
  *      the hot-shingle failure mode. The aggregate combines map-side
  *      (hot gram => one row per map partition crosses the wire) and
  *      the join-back's skew is AQE-splittable;
  *   3. per document, merge the surviving positions into maximal
  *      token spans (gaps-and-islands over a running max of span
  *      ends) — shuffle #3, keyed and bounded by document.
  *
  * Every duplicated token run of length >= k is covered by duplicated
  * grams, so the merged islands are exactly the maximal duplicated
  * spans — the same spans the suffix-array scan reports, without any
  * global sort. All shuffles are linear in corpus token count; the
  * fingerprint is a 128-bit md5 of the gram text (engine-portable,
  * collision odds ~n^2/2^128), so the gram shuffles carry 32-byte
  * keys instead of k-token strings.
  *
  * Removal semantics follow the paper's ExactSubstr policy: ALL
  * occurrences of a duplicated span are dropped (no canonical-copy
  * election, which would need a global tiebreak join). Callers who
  * want keep-one semantics should run document-level dedup first.
  */
object SubstringDedup {

  /** Maximal duplicated token spans per document.
    *
    * Returns (idCol, span_start, span_end, span_len): 0-based token
    * indices, both ends inclusive. Spans that overlap or abut
    * (next start <= prev end + 1) merge into one row. Only spans of
    * at least `max(minSpanTokens, k)` tokens are reported.
    *
    * Tokenization is single-space split — callers normalize upstream
    * (Text.normalize) just as the paper tokenizes before suffix
    * construction.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minSpanTokens: Int = 0): DataFrame = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    val minSpan = math.max(minSpanTokens, k)

    // 1. one row per k-token window; docs shorter than k have none.
    //    (sequence(0, n-k) would COUNT DOWN for n < k — gramsOf guards.)
    val grams = gramsOf(df, idCol, textCol, k)

    // 2. grams occurring at more than one (doc, pos) site. See the
    //    class doc for why this is an aggregate + join-back and not a
    //    count window (hot-gram skew).
    val dupFps = grams.groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .select(col("fp"))
    val dupPos = grams.join(dupFps, Seq("fp"))
      .select(col(idCol), col("i"))

    // 3. gaps-and-islands per document
    islandsToSpans(dupPos, idCol, k, minSpan)
  }

  /** Duplicated-position runs → maximal spans (a new span starts
    * where the gram no longer overlaps/abuts the running max end).
    * The window is keyed and bounded by document.
    */
  private[operators] def islandsToSpans(dupPos: DataFrame, idCol: String, k: Int,
      minSpan: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("i")
    val prev = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    dupPos
      .withColumn("prev_end", max(col("i") + lit(k - 1)).over(prev))
      .withColumn(
        "starts",
        when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("grp", sum(col("starts")).over(byDoc))
      .groupBy(col(idCol), col("grp"))
      .agg(
        min(col("i")).cast("long").as("span_start"),
        (max(col("i")) + lit(k - 1)).cast("long").as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .where(col("span_len") >= minSpan)
      .select(col(idCol), col("span_start"), col("span_end"), col("span_len"))
  }

  /** Gram projection shared by the batch and incremental paths. */
  private[operators] def gramsOf(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") >= k)
      .select(
        col(idCol),
        col("toks"),
        explode(sequence(lit(0), col("n") - k)).as("i"))
      .select(
        col(idCol),
        col("i"),
        md5(concat_ws(" ", slice(col("toks"), col("i") + 1, lit(k)))).as("fp"))

  /** Incremental exact-substring dedup — the ongoing-ingest face of
    * [[duplicatedSpans]]: a new batch's spans count as duplicated when
    * their grams repeat WITHIN the batch or appear in the LEDGER of
    * previously-ingested gram fingerprints, without rescanning the
    * corpus (the ledger is one 32-byte fingerprint column). Returns
    * (spans, ledger additions) — callers append the additions for the
    * next batch, the same contract as Dedup's incremental ledger.
    *
    * Scale: the ledger join is an fp-keyed shuffle join (linear,
    * AQE-splittable); additions are the batch's distinct fingerprints
    * anti-joined against the ledger — never corpus-sized in memory.
    */
  def duplicatedSpansIncremental(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      ledger: DataFrame,
      minSpanTokens: Int = 0): (DataFrame, DataFrame) = {
    require(k >= 2, s"gram size k must be >= 2, got $k")
    val minSpan = math.max(minSpanTokens, k)
    val grams = gramsOf(batch, idCol, textCol, k)
    val withinDup = grams.groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .select(col("fp"))
    // ONE semi join against both duplication sources: a semi join
    // tolerates duplicate keys on the build side, so no distinct and
    // no second scan of the gram projection
    val dupPos = grams
      .join(withinDup.union(ledger.select(col("fp"))), Seq("fp"), "left_semi")
      .select(col(idCol), col("i"))
    val spans = islandsToSpans(dupPos, idCol, k, minSpan)
    val additions = grams.select(col("fp")).distinct()
      .join(ledger.select(col("fp")), Seq("fp"), "left_anti")
    (spans, additions)
  }

  /** Drop every duplicated span from every document (ExactSubstr
    * removal). Returns the input plus:
    *   n_tokens      total tokens,
    *   n_dup_tokens  tokens inside duplicated spans,
    *   clean_text    the remaining tokens, space-joined.
    *
    * The per-document span list is collected into an array column —
    * bounded by doc_len / k per document, never corpus-sized.
    */
  def removeSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minSpanTokens: Int = 0): DataFrame =
    applySpanRemoval(df, idCol, textCol,
      duplicatedSpans(df, idCol, textCol, k, minSpanTokens))

  /** Span-removal mechanics shared with callers that supply their own
    * span frame (e.g. within-document repetition removal): drops every
    * (span_start, span_end) token range and appends the accounting
    * columns documented on [[removeSpans]].
    */
  private[operators] def applySpanRemoval(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanFrame: DataFrame): DataFrame = {
    val spans = spanFrame
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_spans"))
    df.join(spans, Seq(idCol), "left")
      // null text tokenizes like empty text (one empty token) instead
      // of poisoning size()/sequence() with -1
      .withColumn("_toks", split(coalesce(col(textCol), lit("")), " "))
      .withColumn(
        "_keep",
        filter(
          // (token, position) pairs not covered by any span
          zip_with(
            col("_toks"),
            sequence(lit(0), size(col("_toks")) - 1),
            (t, p) => struct(t.as("t"), p.as("p"))),
          pt =>
            !exists(
              coalesce(col("_spans"), array()),
              s => pt("p") >= s("span_start") && pt("p") <= s("span_end"))))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn(
        "n_dup_tokens",
        (size(col("_toks")) - size(col("_keep"))).cast("long"))
      .withColumn(
        "clean_text",
        concat_ws(" ", transform(col("_keep"), pt => pt("t"))))
      .drop("_spans", "_toks", "_keep")
  }
}
