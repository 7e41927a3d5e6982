package graft.functions

import graft.SparkSpec

/** Unigram Viterbi tokenizer: the global-optimality contract (greedy
  * traps resolved), the lexicographic objective, and open-vocab
  * fallback.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def scoresDf(pieces: (String, Long)*) =
    pieces.toSeq.toDF("piece", "score")

  private def encode(w: String, scores: org.apache.spark.sql.DataFrame,
      maxLen: Int = 4): (Int, Long) = {
    val r = Unigram.viterbiEncode(Seq(w).toDF("w"), scores, maxLen)
      .collect().head
    (r.getInt(1), r.getLong(2))
  }

  test("resolves the greedy trap: fewest pieces beats longest first match") {
    // greedy longest-match takes 'abc' then strands 'd','e' (3 pieces);
    // Viterbi finds 'ab' + 'cde' (2 pieces)
    val sc = scoresDf("abc" -> 100L, "ab" -> 50L, "cde" -> 40L,
      "a" -> 5L, "b" -> 5L, "c" -> 5L, "d" -> 5L, "e" -> 5L)
    assert(encode("abcde", sc) == (2, 90L))
    // and greedy WordPiece really does fall into the trap on the
    // same vocabulary — the contrast is the point of this operator
    val greedy = WordPiece.encode(Seq("abcde").toDF("w"),
        sc.select("piece"), maxLen = 4)
      .collect().head.getInt(2)
    assert(greedy == 3)
  }

  test("among equal piece counts, evidence decides") {
    // both 'ab'+'cd' and 'abc'+'d' are 2 pieces; evidence picks the max
    val sc = scoresDf("ab" -> 10L, "cd" -> 10L, "abc" -> 25L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    assert(encode("abcd", sc) == (2, 26L)) // abc(25) + d(1) > ab+cd(20)
  }

  test("open vocabulary: unknown chars consume at score 0") {
    val sc = scoresDf("ab" -> 10L)
    assert(encode("abzz", sc) == (3, 10L)) // ab + z + z
    assert(encode("zz", sc) == (2, 0L))
  }

  test("single known char scores count") {
    val sc = scoresDf("x" -> 7L)
    assert(encode("xx", sc) == (2, 14L))
  }

  test("corpus gate property: viterbi fertility never exceeds greedy") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    import org.apache.spark.sql.functions._
    val dict = Bpe.wordDict(docs, "text").select("w", "n")
    val scores = Unigram.learnScores(dict, k = 20, maxLen = 4)
    val vit = Unigram.viterbiEncode(dict.select("w"), scores, maxLen = 4)
      .select(col("w"), col("n_pieces").as("np_v"))
    val grd = WordPiece.encode(dict.select("w"),
        scores.select("piece").filter(length(col("piece")) >= 2), maxLen = 4)
      .select(col("w"), col("n_pieces").as("np_g"))
    val worse = vit.join(grd, "w").filter(col("np_v") > col("np_g")).count()
    assert(worse == 0, s"$worse words where Viterbi used MORE pieces than greedy")
  }
}
