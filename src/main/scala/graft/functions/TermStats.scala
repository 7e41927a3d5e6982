package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: per-document term frequency, corpus
  * document frequency, and TF-IDF-style salience — the keyword /
  * topic-signal extraction pass of a training-data pipeline (and the
  * inputs to domain-mix reporting).
  *
  * The salience weight is `tf * N / df` — the exact-rational core of
  * TF-IDF with the log dropped: log() is monotone in df, so top-k per
  * document is IDENTICAL, and exact integer inputs with one IEEE
  * division stay bit-reproducible across engines (a natural log would
  * tie correctness to two engines' libm rounding).
  */
object TermStats {

  /** (doc, term, tf, df, weight): one row per distinct (doc, term).
    * Two hash aggregations (tf, then df over the tf table — one scan
    * feeds both) and one keyed join. The corpus size N rides in as a
    * 1-row broadcast cross join, not a driver-side constant, so the
    * whole thing stays one lazy plan.
    */
  def termWeights(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("weight",
        (col("tf") * col("_n")).cast("double") / col("df").cast("double"))
      .select(col("id"), col("term"), col("tf"), col("df"), col("weight"))
  }

  /** Top-k salient terms per document (weight desc, term asc). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("weight").desc, col("term"))
    termWeights(docs, idCol, textCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Per-document most-frequent word n-gram and the fraction of the
    * document's characters its occurrences cover (occurrence count ×
    * n-gram length / doc length; overlaps uncounted — the standard
    * approximation) — the Gopher-style "fraction of characters in the
    * most common n-gram" repetition signal. Ties break to the
    * lexicographically smallest gram. Docs too short for any n-gram
    * surface with ('', 0, 0.0).
    *
    * Shape: explode + one (doc, gram) hash aggregation + a per-doc
    * window — O(total n-grams) work keyed on the doc, never a per-row
    * quadratic scan; at 100 TB the (doc, gram) aggregation map-side
    * combines because grams repeat WITHIN docs (that repetition is the
    * signal itself).
    */
  def topNgramPerDoc(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      Text.charCount(col(textCol)).as("_chars"),
      Text.shingles(col(textCol), n).as("_grams"))
    val counts = base
      .select(col("id"), col("_chars"), explode(col("_grams")).as("gram"))
      .groupBy(col("id"), col("_chars"), col("gram"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col("id")).orderBy(col("n_occ").desc, col("gram"))
    val top = counts.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("id"), col("gram").as("top_gram"), col("n_occ"),
        when(col("_chars") > 0,
          (col("n_occ") * length(col("gram"))).cast("double") / col("_chars").cast("double"))
          .otherwise(lit(0.0)).as("char_frac"))
    docs.select(col(idCol).as("id")).join(top, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("top_gram"), lit("")).as("top_gram"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("char_frac"), lit(0.0)).as("char_frac"))
  }
}
