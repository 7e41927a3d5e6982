package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus quality / domain classifier — a bag-of-words linear
  * classifier in the multinomial naive-Bayes family, trained and
  * applied entirely as Spark aggregations. This is the
  * classifier-based filtering stage of an LLM curation pipeline
  * (CCNet / GPT-3-style "quality classifier" pass) expressed with the
  * repo's exact-arithmetic discipline: like BM25's `idfq`
  * (operators/Bm25.scala), there are NO floating-point logarithms —
  * per-token evidence is the Laplace-smoothed likelihood quantized to
  * a 2^20 fixed-point rational,
  *
  *   w(t,c)  = ((cnt(t,c) + 1) * 2^20) div (tot_c + V)
  *   w0(c)   = (2^20)                  div (tot_c + V)     (unseen)
  *   prior(c)= (docs_c * 2^20)         div (docs_total)
  *
  * and a document's class score is `prior(c) + Σ w(token_i, c)` over
  * token OCCURRENCES (a linear — additive — opinion pool rather than
  * NB's logarithmic pool: per-token evidence points the same
  * direction, sums replace products, and every weight is an exact
  * integer so the oracle replays training AND scoring bit-for-bit).
  * Prediction is `max(struct(score, label))` — deterministic
  * lexicographically-largest-label tie-break on equal scores.
  *
  * Scale shape: training is one explode + hash aggregation on
  * (label, token) plus O(classes) totals — map-side partial-agg
  * collapses hot tokens before the shuffle. Scoring is one explode,
  * one equi-join on token against a vocab×k weight table (AQE
  * broadcasts it when small; hot-token skew lands on the same AQE
  * skew-split path as every token join in the repo), and two hash
  * aggregations. Nothing touches the driver; class count k is
  * configuration-sized.
  */
object TextClassifier {

  val Q: Long = 1L << 20

  /** The classifier's sufficient statistics: per-(label, token)
    * occurrence counts and per-label doc counts. Counts are ADDITIVE,
    * which makes the model incrementally maintainable — training on a
    * delta corpus and [[mergeCounts]]-ing equals retraining from
    * scratch on the union (the repo's merge == rebuild contract), and
    * weights re-derive from merged counts in vocab-sized work, never
    * a corpus rescan.
    */
  def trainCounts(labeled: DataFrame, textCol: String, labelCol: String,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Text.tokens)
      : (DataFrame, DataFrame) = {
    val toks = labeled.select(col(labelCol).as("label"),
      explode(tokenizer(col(textCol))).as("token"))
    (toks.groupBy("label", "token").agg(count(lit(1)).as("cnt")),
      labeled.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("docs_c")))
  }

  /** Pointwise-additive merge of two count snapshots (either side may
    * hold labels/tokens the other lacks). Shuffles O(vocab), not
    * O(corpus).
    */
  def mergeCounts(a: (DataFrame, DataFrame), b: (DataFrame, DataFrame))
      : (DataFrame, DataFrame) =
    (a._1.unionByName(b._1).groupBy("label", "token")
        .agg(sum("cnt").as("cnt")),
      a._2.unionByName(b._2).groupBy("label")
        .agg(sum("docs_c").as("docs_c")))

  /** Derive the quantized weight tables from count statistics. */
  def weightsFromCounts(counts: DataFrame, docs: DataFrame)
      : (DataFrame, DataFrame) = {
    val totals = counts.groupBy("label").agg(sum("cnt").as("tot"))
    val vocab = counts.select("token").distinct().agg(count(lit(1)).as("v"))
    val nDocs = docs.agg(sum("docs_c").as("docs_total"))
    // floor(double division) with exact-long operands — the idfq
    // discipline (operators/Bm25.scala:54): both engines run the
    // identical IEEE op, exact while numerator < 2^53
    def fdiv(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      floor(num.cast("double") / den.cast("double")).cast("long")
    val classInfo = docs.crossJoin(broadcast(nDocs))
      .join(totals, "label").crossJoin(broadcast(vocab))
      .select(col("label"),
        fdiv(col("docs_c") * Q, col("docs_total")).as("prior"),
        fdiv(lit(Q), col("tot") + col("v")).as("w0"))
    val weights = counts.join(totals, "label").crossJoin(broadcast(vocab))
      .select(col("label"), col("token"),
        fdiv((col("cnt") + 1) * Q, col("tot") + col("v")).as("w"))
    (weights, classInfo)
  }

  /** Train on labeled text: returns (tokenWeights(label, token, w),
    * classInfo(label, prior, w0)). Both outputs are data-bounded
    * (vocab × k and k rows) and feed `score`/`predict` as plain
    * DataFrames — persistable like any model table.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Text.tokens)
      : (DataFrame, DataFrame) = {
    val (counts, docs) = trainCounts(labeled, textCol, labelCol, tokenizer)
    weightsFromCounts(counts, docs)
  }

  /** Incremental merge of a labeled delta into a token-hash-sharded
    * state table (the `job.type=classify` / streaming-maintenance
    * engine): the delta's counts are additive, so the merge reads
    * ONLY the shards the delta's tokens hash into, adds, and returns
    * (merged rows, touched shards) for a partition-granular
    * ShardedTable commit. Per-label doc counts ride as
    * `token IS NULL` rows in the dedicated shard `nShards` (touched
    * on every non-empty delta), making the whole state one uniform
    * additive groupBy. Contract: the delta is APPEND-ONLY — a
    * re-delivered document doubles its counts.
    */
  def shardedMerge(table: graft.sink.ShardedTable, hasCurrent: Boolean,
      delta: DataFrame, textCol: String, labelCol: String,
      nShards: Int): (DataFrame, Seq[String]) = {
    val spark = delta.sparkSession
    val (dCounts, dDocs) = trainCounts(delta, textCol, labelCol)
    val deltaRows = dCounts
      .withColumn("shard", pmod(hash(col("token")), lit(nShards)).cast("int"))
      .unionByName(dDocs.select(col("label"),
        lit(null).cast("string").as("token"),
        col("docs_c").as("cnt"),
        lit(nShards).as("shard")))
    val touched = deltaRows.select(col("shard")).distinct()
      .collect().map(_.getInt(0).toString).toSeq.sorted
    val merged =
      if (!hasCurrent) deltaRows
      else table.readPartitions(spark, touched)
        .unionByName(deltaRows)
        .groupBy("label", "token", "shard")
        .agg(sum("cnt").as("cnt"))
        .select("label", "token", "cnt", "shard")
    (merged, touched)
  }

  /** Split a persisted unified state table — token-count rows plus
    * doc-count rows marked by `token IS NULL` (the layout the
    * `job.type=classify` sharded table commits) — back into the
    * (counts, docs) pair [[weightsFromCounts]] consumes.
    */
  def fromState(state: DataFrame): (DataFrame, DataFrame) =
    (state.filter(col("token").isNotNull).select("label", "token", "cnt"),
      state.filter(col("token").isNull)
        .select(col("label"), col("cnt").as("docs_c")))

  /** Per-(doc, class) additive scores for every document — documents
    * with zero tokens keep their prior-only row (a quality filter must
    * not silently drop empty docs).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      tokenWeights: DataFrame, classInfo: DataFrame,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Text.tokens): DataFrame = {
    val occurrences = docs.select(col(idCol).as("_id"),
      explode(tokenizer(col(textCol))).as("token"))
    // every token occurrence × every class, unseen → w0
    val perClass = occurrences
      .crossJoin(broadcast(classInfo.select("label", "w0")))
      .join(tokenWeights, Seq("token", "label"), "left")
      .groupBy(col("_id"), col("label"))
      .agg(sum(coalesce(col("w"), col("w0"))).as("_tokscore"))
    docs.select(col(idCol).as("_id"))
      .crossJoin(broadcast(classInfo.select("label", "prior")))
      .join(perClass, Seq("_id", "label"), "left")
      .select(col("_id").as(idCol), col("label"),
        (col("prior") + coalesce(col("_tokscore"), lit(0L))).as("score"))
  }

  /** Argmax prediction with margin over the runner-up — the margin is
    * the filter knob (small margin = uncertain doc). Deterministic:
    * equal scores break to the lexicographically larger label. One
    * pass: best and second-best come from a single sorted k-array
    * (k = class count, configuration-bounded).
    */
  def predictWithMargin(docs: DataFrame, idCol: String, textCol: String,
      tokenWeights: DataFrame, classInfo: DataFrame,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Text.tokens): DataFrame =
    score(docs, idCol, textCol, tokenWeights, classInfo, tokenizer)
      .groupBy(col(idCol))
      .agg(reverse(sort_array(collect_list(
        struct(col("score"), col("label"))))).as("_ranked"))
      .select(col(idCol),
        col("_ranked")(0)("label").as("pred_label"),
        col("_ranked")(0)("score").as("best_score"),
        (col("_ranked")(0)("score") -
          coalesce(col("_ranked")(1)("score"), lit(0L))).as("margin"))
}
