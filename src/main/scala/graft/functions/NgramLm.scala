package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring: train a bigram
  * LM over a reference slice of the corpus with two hash aggregations,
  * then score every document by how well the LM predicts it. Documents
  * whose bigrams the reference LM has never seen (low hit ratio, high
  * OOV) are boilerplate/garble candidates; the conditional-probability
  * floor (`min_prob`) flags single pathological transitions.
  *
  * Everything is exact-arithmetic so the DuckDB oracle can replay it:
  * integer counts, one IEEE division per ratio (never summed across
  * rows), `min` over per-bigram probabilities (order-free). No
  * perplexity logarithms — `ln` is not bit-reproducible across
  * engines, and the hit/OOV/floor trio carries the same filtering
  * signal.
  *
  * 100 TB shape: train = two explode + hash-agg passes over the
  * reference slice (map-side partial aggregation bounds the shuffle by
  * vocabulary, not corpus). The (bigram → probability) join table is
  * vocabulary-sized; scoring is one explode + one equi-join per
  * n-gram order + a per-doc hash agg. No driver-side state at all.
  */
object NgramLm {

  /** Trained model: `probs` = (bg, cb, cu, p) one row per distinct
    * training bigram, `uni` = (w, cu) one row per training token.
    */
  final case class Lm(uni: DataFrame, probs: DataFrame)

  private def toks(c: Column): Column =
    Text.tokens(coalesce(c, lit("")))

  private def bigrams(l: Column): Column =
    Text.shinglesOfTokens(l, 2)

  /** Fit the bigram LM on `train` (two aggregations; the w1-join to
    * attach unigram denominators runs over the MODEL, not the corpus).
    */
  def train(train: DataFrame, textCol: String): Lm = {
    val l = train.select(toks(col(textCol)).as("l"))
    val uni = l.select(explode(col("l")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val bi = l.select(explode(bigrams(col("l"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val probs = bi
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .select(col("bg"), col("cb"), col("cu"),
        (col("cb").cast("double") / col("cu")).as("p"))
    Lm(uni, probs)
  }

  /** Score each document: token counts, OOV tokens, bigram hit rate
    * against the LM, and the minimum conditional probability among the
    * bigrams the LM knows. NULL `hit_ratio`/`min_prob` mean "no
    * bigrams" / "no known bigrams".
    */
  def score(docs: DataFrame, idCol: String, textCol: String, lm: Lm): DataFrame = {
    val base = docs.select(col(idCol).as("id"), toks(col(textCol)).as("l"))
    val oov = base.select(col("id"), explode(col("l")).as("w"))
      .join(lm.uni, Seq("w"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("cu").isNull, lit(1))).as("n_oov"))
    val hits = base.select(col("id"), explode(bigrams(col("l"))).as("bg"))
      .join(lm.probs, Seq("bg"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        count(col("p")).as("n_hits"),
        min(col("p")).as("min_prob"))
    docs.select(col(idCol).as("id"))
      .join(oov, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_bigrams"))
          .as("hit_ratio"),
        col("min_prob"))
  }
}
