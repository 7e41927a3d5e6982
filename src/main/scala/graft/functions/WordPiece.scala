package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style greedy subword tokenizer — the BERT-family
  * counterpart to [[Bpe]]'s merge-list tokenizer, giving the
  * tokenizer tier both of the field's dominant algorithms. Two
  * halves, split like every model op in the repo:
  *
  *  - VOCAB INDUCTION (distributed): all single characters of the
  *    corpus plus the top-`k` most frequent substrings of length
  *    2..`maxLen`, frequency weighted by word count. One explode of
  *    the word DICTIONARY (distinct words × O(maxLen²) substrings —
  *    dictionary-sized, never corpus-sized), one hash aggregation,
  *    one k-bounded top-k. Deterministic tie-break: (count desc,
  *    piece asc).
  *  - ENCODE (distributed, vocab broadcast): greedy LONGEST-MATCH
  *    from the left — at each position consume the longest vocab
  *    piece that prefixes the remainder; single characters are
  *    always in vocab, so encoding is total. The vocab is k-bounded
  *    (config-sized) and rides the task closure, the same division
  *    of labor as the ANN codebooks.
  *
  * Greedy longest-match is SQL-replayable by unrolling the match
  * loop to the corpus' max word length — the oracle discipline BPE's
  * merge layers already follow.
  *
  * Reference seam: none (the reference moves records); tokenizer
  * tooling is core LLM-pipeline capability alongside Bpe/NgramLm.
  */
object WordPiece {

  /** `words(w, n)` dictionary → vocabulary pieces: every distinct
    * single character, plus the top-`k` substrings of length
    * 2..`maxLen` by occurrence-weighted frequency.
    */
  def learnVocab(words: DataFrame, k: Int, maxLen: Int): DataFrame = {
    require(k >= 0 && maxLen >= 2, s"bad vocab params k=$k maxLen=$maxLen")
    val subs = words.select(col("n"),
        explode(substrings(col("w"), maxLen)).as("piece"))
      .filter(length(col("piece")) >= 2)
      .groupBy("piece").agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(k)
      .select("piece")
    val chars = words
      .select(explode(split(col("w"), "")).as("piece"))
      .filter(length(col("piece")) === 1)
      .distinct()
    chars.unionByName(subs).distinct()
  }

  /** All substrings of `w` up to length `maxLen`, as a codegen'd
    * expression (no UDF): positions × lengths via nested transforms.
    */
  private def substrings(w: org.apache.spark.sql.Column, maxLen: Int) =
    flatten(transform(sequence(lit(1), length(w)), p =>
      transform(sequence(lit(1), least(lit(maxLen), length(w) - p + 1)), l =>
        w.substr(p, l))))

  /** Greedy longest-match encode of the word dictionary: `words(w)`
    * (+ any carried columns) → (w, pieces, n_pieces). The vocab is
    * collected ONCE (k-bounded by construction) and broadcast via
    * the closure.
    */
  def encode(words: DataFrame, vocab: DataFrame, maxLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val pieces: Set[String] =
      vocab.select(col("piece").cast("string")).as[String].collect().toSet
    words.select(col("w").cast("string")).distinct().as[String]
      .mapPartitions(_.map { w =>
        val out = Vector.newBuilder[String]
        var pos = 0
        while (pos < w.length) {
          var l = math.min(maxLen, w.length - pos)
          while (l > 1 && !pieces.contains(w.substring(pos, pos + l))) l -= 1
          // single chars are always vocab; an absent char still
          // consumes one position as itself (open-vocab fallback)
          out += w.substring(pos, pos + l)
          pos += l
        }
        val ps = out.result()
        (w, ps, ps.length)
      })
      .toDF("w", "pieces", "n_pieces")
  }
}
