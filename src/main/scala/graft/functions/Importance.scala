package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed n-gram importance weighting for data selection — the DSIR
  * recipe ("Data Selection for Language Models via Importance
  * Resampling", Xie et al. 2023), in an exact-integer variant:
  *
  *   1. featurize text into word n-grams hashed to `nBuckets` buckets
  *      (FNV shingle hashes — engine-portable, codegen'd, no gram
  *      strings materialized);
  *   2. per bucket, weight = ((target_count + 1) * 2^20) integer-div
  *      (raw_count + 1) — the Laplace-smoothed target/raw likelihood
  *      ratio, quantized to integers so document scores are EXACT
  *      sums (float log-likelihood folds are order-dependent and not
  *      reproducible across engines);
  *   3. a document's importance score = the sum of its n-gram bucket
  *      weights. Select by threshold or top-k; high scores read like
  *      the target distribution, boilerplate/garble scores low.
  *
  * Scale shape: two hash aggregations over gram streams (map-side
  * combined, linear in corpus tokens) and ONE broadcast join — the
  * weight table is bounded by `nBuckets` (<= 2^20 rows) by
  * construction, never corpus-sized. Weight arithmetic fits a long
  * for target gram counts up to 2^43 (~8e12); beyond that, fit the
  * weights on a sample of the target, as DSIR does.
  */
object Importance {

  val WeightScale: Long = 1L << 20

  private def bucketCounts(df: DataFrame, textCol: String, n: Int,
      nBuckets: Int, as: String): DataFrame =
    df.select(explode(FnvShingleHashes(col(textCol), n)).as("h"))
      .groupBy(pmod(col("h"), lit(nBuckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as(as))

  /** (bucket, w) weights fitted from a target (what the data SHOULD
    * look like) and a raw corpus (what it does look like).
    */
  def bucketWeights(target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String, n: Int, nBuckets: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets in (0, 2^20], got $nBuckets")
    val t = bucketCounts(target, targetTextCol, n, nBuckets, "tc")
    val r = bucketCounts(raw, rawTextCol, n, nBuckets, "rc")
    t.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        expr(s"((coalesce(tc, 0) + 1) * $WeightScale) div (coalesce(rc, 0) + 1)")
          .as("w"))
  }

  /** Per-document importance: (idCol, n_grams, score). Documents with
    * fewer than n tokens surface with n_grams = 0 and score = 0. A
    * gram whose bucket is absent from `weights` (never seen in target
    * or raw) takes the neutral smoothed weight 2^20.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, n: Int, nBuckets: Int): DataFrame = {
    val scored = docs
      .select(col(idCol), explode(FnvShingleHashes(col(textCol), n)).as("h"))
      .withColumn("bucket", pmod(col("h"), lit(nBuckets.toLong)))
      .join(broadcast(weights), Seq("bucket"), "left")
      .withColumn("w", coalesce(col("w"), lit(WeightScale)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("score"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** The DSIR SELECTION step: keep the top-k documents per domain by
    * importance score (ties broken by ascending id — fully
    * deterministic, engine-portable). One shuffle on the domain
    * column; the constant rank bound lets Spark's WindowGroupLimit
    * keep only k rows per domain per map partition BEFORE the
    * exchange, so a skewed domain never materializes its full sort.
    */
  def selectTopK(scored: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.withColumn("_imp_rank", row_number().over(w))
      .filter(col("_imp_rank") <= k)
      .drop("_imp_rank")
  }

  /** Keep the top `fraction` of each domain by importance score
    * (at least `minPerDomain` docs, so rare domains survive — the
    * stratification DSIR needs to avoid collapsing the mixture).
    * Domain sizes come from a pre-aggregated broadcast join (one
    * row per domain), so the only corpus-wide shuffle is the
    * window's partition-by-domain exchange.
    */
  def selectTopFraction(scored: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, fraction: Double, minPerDomain: Int = 1): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction in (0, 1], got $fraction")
    require(minPerDomain >= 0, s"minPerDomain must be >= 0, got $minPerDomain")
    val sizes = scored.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_imp_m"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.join(broadcast(sizes), Seq(domainCol))
      .withColumn("_imp_rank", row_number().over(w))
      .filter(col("_imp_rank") <=
        greatest(lit(minPerDomain.toLong), ceil(col("_imp_m") * fraction)))
      .select(scored.columns.map(col).toIndexedSeq: _*) // join put the key first
  }
}
