package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM-style tokenizer (the SentencePiece family's third
  * algorithm, after [[Bpe]]'s merge list and [[WordPiece]]'s greedy
  * match): encoding picks the GLOBALLY optimal segmentation of each
  * word by Viterbi dynamic programming, not a greedy scan. The
  * objective is exact-integer and LEXICOGRAPHIC — fewest pieces
  * first, then maximal summed piece evidence (occurrence-weighted
  * substring counts), then the longest final piece — because a sum
  * of POSITIVE per-piece weights would reward fragmentation (real
  * unigram LMs avoid that with negative log-probabilities; the
  * no-float-log discipline substitutes the piece-count rank, which
  * is what the log penalty effectively enforces). This is the
  * concrete win over [[WordPiece]]'s greedy scan: greedy can strand
  * itself into MORE pieces than necessary; Viterbi provably cannot,
  * and the q_unigram_encode fertility sits at-or-below
  * q_wordpiece's on every language for exactly this reason.
  *
  * Scale split mirrors WordPiece: piece scoring explodes the word
  * DICTIONARY (never the corpus) into length-bounded substrings with
  * one hash aggregation; the vocabulary is k-bounded and rides the
  * encode closure. Viterbi is O(len × maxLen) per distinct word.
  */
object Unigram {

  /** Occurrence-weighted substring scores of the dictionary: ALL
    * single characters plus the top-`k` pieces of length 2..`maxLen`
    * (ties: count desc, piece asc). Returns (piece, score) where
    * score = the weighted count — integer evidence.
    */
  def learnScores(words: DataFrame, k: Int, maxLen: Int): DataFrame = {
    require(k >= 0 && maxLen >= 2, s"bad vocab params k=$k maxLen=$maxLen")
    val subs = words.select(col("n"),
        explode(substrings(col("w"), maxLen)).as("piece"))
      .groupBy("piece").agg(sum(col("n")).as("score"))
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("score").desc, col("piece").asc)
      .limit(k)
    subs.filter(length(col("piece")) === 1).unionByName(multi)
  }

  private def substrings(w: org.apache.spark.sql.Column, maxLen: Int) =
    flatten(transform(sequence(lit(1), length(w)), p =>
      transform(sequence(lit(1), least(lit(maxLen), length(w) - p + 1)), l =>
        w.substr(p, l))))

  /** Viterbi encode of the word dictionary against `scores` (piece,
    * score): best[p] minimizes piece count, then maximizes summed
    * evidence, over splits with piece length ≤ maxLen; multi-char
    * pieces must be in vocab, single chars fall back to score 0 when
    * unseen (open vocabulary). Remaining ties prefer the smaller j
    * (the LONGER final piece). Returns (w, n_pieces, score).
    */
  def viterbiEncode(words: DataFrame, scores: DataFrame, maxLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val table: Map[String, Long] = scores
      .select(col("piece").cast("string"), col("score").cast("long"))
      .as[(String, Long)].collect().toMap
    words.select(col("w").cast("string")).distinct().as[String]
      .mapPartitions(_.map { w =>
        val n = w.length
        val bs = new Array[Long](n + 1)
        val bn = new Array[Int](n + 1)
        var p = 1
        while (p <= n) {
          var bestS = Long.MinValue
          var bestN = Int.MaxValue
          var j = math.max(0, p - maxLen)
          while (j < p) {
            val piece = w.substring(j, p)
            val sc: Long =
              if (p - j == 1) table.getOrElse(piece, 0L)
              else table.getOrElse(piece, Long.MinValue)
            if (sc != Long.MinValue) {
              val candN = bn(j) + 1
              val candS = bs(j) + sc
              // lexicographic (fewer pieces, higher evidence); j
              // ascends, strict improvement keeps the SMALLEST j
              // among full ties (longest final piece)
              if (candN < bestN || (candN == bestN && candS > bestS)) {
                bestN = candN
                bestS = candS
              }
            }
            j += 1
          }
          bs(p) = bestS
          bn(p) = bestN
          p += 1
        }
        (w, bn(n), bs(n))
      })
      .toDF("w", "n_pieces", "score")
  }
}
