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
}
