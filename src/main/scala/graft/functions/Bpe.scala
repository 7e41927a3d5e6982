package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge induction — the tokenizer-training step of an
  * LLM data pipeline. Classic byte-pair encoding learns merges over
  * the WORD-FREQUENCY DICTIONARY, not the raw corpus, which is exactly
  * what makes it distribute: the corpus collapses to a vocabulary-
  * sized (word, count) table in one hash aggregation, and each merge
  * iteration is then a pair-count aggregation over that small table
  * plus an O(1) driver decision (the argmax pair — bounded metadata,
  * same class as seeds/offsets elsewhere).
  *
  * Per iteration: explode adjacent symbol pairs (weighted by word
  * count) → hash agg → top-1 by (count DESC, pair ASC) → apply the
  * merge to every word's symbol array with a left-greedy fold. The
  * fold is an `aggregate` HOF over arrays that average a handful of
  * symbols — interpreted, but over vocab rows, not corpus rows.
  *
  * 100 TB shape: one corpus-sized shuffle total (the word dict);
  * everything after is O(vocab × merges).
  */
object Bpe {

  final case class Merge(step: Int, pair: String, count: Long)

  private val EndMark = "</w>"

  /** (w, syms, n): one row per distinct corpus word — the word itself,
    * its chars + end-of-word marker, and its occurrence count.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(coalesce(col(textCol), lit(""))))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"),
        concat(split(col("w"), ""), array(lit(EndMark))).as("syms"),
        col("n"))

  /** Left-greedy single-pair merge over a symbol array. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply an ordered merge list to a dictionary's symbol arrays —
    * the ENCODE side of BPE: any corpus segments through the learned
    * merges without refitting.
    */
  def applyMerges(dict: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(dict) { (df, m) =>
      val Array(a, b) = m.pair.split(" ", 2)
      df.withColumn("syms", applyMerge(col("syms"), a, b))
    }

  /** Learn the first `k` merges. Returns them in order. */
  def learnMerges(dict: DataFrame, k: Int): Seq[Merge] = {
    var cur = dict.persist()
    val merges = Seq.newBuilder[Merge]
    try {
      for (step <- 1 to k) {
        val top = cur
          .select(col("n"),
            explode(Text.shinglesOfTokens(col("syms"), 2)).as("pair"))
          .groupBy("pair").agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1).collect()
        require(top.nonEmpty, s"no pairs left at merge step $step")
        val pair = top.head.getString(0)
        val c = top.head.getLong(1)
        merges += Merge(step, pair, c)
        val Array(a, b) = pair.split(" ", 2)
        val next = cur.select(applyMerge(col("syms"), a, b).as("syms"),
          col("n")).persist()
        next.count() // materialize before dropping the parent
        cur.unpersist()
        cur = next
      }
      merges.result()
    } finally cur.unpersist()
  }
}
