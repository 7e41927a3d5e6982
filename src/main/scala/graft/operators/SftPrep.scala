package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation — the post-curation steps
  * that turn raw interaction logs and scored documents into training
  * pairs. These extend the reference's converter/selection tier
  * (gobblin-core `Converter` 1→N reshaping; the sampling/selection
  * family in `SamplingConverter`) with the operations an LLM
  * post-training pipeline needs: thread assembly, context-budget
  * truncation, preference pairing, and leakage-safe splits.
  *
  * Scale shape: every operator here is one hash shuffle on its
  * grouping key plus per-group windows whose partitions are bounded
  * by real-world group sizes (a user's session, a prompt's candidate
  * set) — never a global window, never a driver collect.
  */
object SftPrep {

  /** Conversation-thread assembly: sessionize per `keyCol` on
    * `>gapMs` silence gaps (the standard gaps-and-islands split, same
    * definition as the streaming session gate), order turns within a
    * thread, validate role alternation, and keep the longest SUFFIX
    * of turns that fits `budgetTokens` (chat fine-tuning truncates
    * from the front — the most recent turns carry the supervision
    * signal).
    *
    * Input columns: `keyCol` (conversation owner), `tsCol`
    * (timestamp), `idCol` (deterministic tie-break within equal
    * timestamps), `roleCol`, `textCol`, `tokCol` (per-turn token
    * count, exact integer).
    *
    * Output one row per thread: key, session_no, n_turns, n_kept,
    * kept_tokens, roles_ok (no two consecutive kept turns share a
    * role AND the kept thread starts with `firstRole`), thread_text
    * (kept turns joined as "role: text" lines).
    *
    * Two windows, both partitioned by the owner key (session split)
    * or (owner, session) (suffix sums) — partition size is one user's
    * history, the same bound every sessionization operator in the
    * repo rides; no global ordering anywhere.
    */
  def assembleThreads(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, roleCol: String, textCol: String, tokCol: String,
      gapMs: Long, budgetTokens: Long, firstRole: String = "user"): DataFrame = {
    // exact integer millis (micros are non-negative, so cast == floor);
    // every window orders by (_ms, id) — the SAME truncated key an
    // oracle replays, so sub-ms timestamp ties can't reorder turns
    // between engines
    val tsMs = (unix_micros(col(tsCol)) / lit(1000)).cast("long")
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col("_ms"), col(idCol))
    val withGap = df.withColumn("_ms", tsMs)
      .withColumn("_new",
        when(col("_ms") - lag(col("_ms"), 1).over(byKey) > gapMs || lag(col("_ms"), 1).over(byKey).isNull, 1L)
          .otherwise(0L))
    val sessioned = withGap
      .withColumn("session_no", sum(col("_new")).over(byKey))
    val byThread = Window.partitionBy(col(keyCol), col("session_no"))
      .orderBy(col("_ms"), col(idCol))
    val suffix = Window.partitionBy(col(keyCol), col("session_no"))
      .orderBy(col("_ms"), col(idCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val turns = sessioned
      .withColumn("turn_no", row_number().over(byThread))
      .withColumn("_suffix_toks", sum(col(tokCol)).over(suffix))
      .withColumn("_keep", col("_suffix_toks") <= budgetTokens)
    turns.groupBy(col(keyCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("_keep"), col(tokCol))), lit(0L)).as("kept_tokens"),
        // kept turns sorted by turn_no; struct comparison is
        // lexicographic so the first field orders the array
        sort_array(collect_list(when(col("_keep"),
          struct(col("turn_no"), col(roleCol).as("r"), col(textCol).as("t"))))).as("_kept"))
      .withColumn("roles_ok",
        when(size(col("_kept")) === 0, lit(false)).otherwise(
          col("_kept")(0)("r") === firstRole &&
          coalesce(aggregate(
            zip_with(col("_kept"), slice(col("_kept"), lit(2), greatest(size(col("_kept")) - 1, lit(0))),
              (a, b) => a("r") =!= b("r")),
            lit(true), (acc, x) => acc && coalesce(x, lit(true))), lit(true))))
      .withColumn("thread_text",
        array_join(transform(col("_kept"), x => concat_ws(": ", x("r"), x("t"))), "\n"))
      .drop("_kept")
  }

  /** Preference-pair construction: within each prompt group, chosen =
    * the highest-scoring candidate, rejected = the lowest, both with
    * ascending-id tie-breaks, kept only when the margin clears
    * `minMargin` (equal-scored groups carry no preference signal).
    * One hash aggregation on the group key — `max_by`/`min_by` over a
    * lexicographic struct key, no window, no per-group materialization
    * beyond two candidates.
    */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Long = 1L): DataFrame = {
    val id = col(idCol)
    val score = col(scoreCol)
    df.groupBy(col(groupCol))
      .agg(
        max_by(id, struct(score, -id)).as("chosen_id"),
        max(score).as("chosen_score"),
        min_by(id, struct(score, id)).as("rejected_id"),
        min(score).as("rejected_score"),
        count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= 2 &&
        col("chosen_score") - col("rejected_score") >= minMargin)
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
  }

  /** Leakage-safe split assignment: every row of a GROUP lands in the
    * same split (train/val/test by the md5 of the group key, the same
    * `Converters.fractionCut` %04x-prefix discipline every sampling
    * operator in the repo uses), so near-duplicate or same-source
    * documents can never straddle train and eval. `splits` are
    * (name, fraction) with fractions summing to ≤ 1; any remainder
    * falls to the last split. Pure projection — zero shuffle.
    */
  def assignSplit(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)], seed: String = "graft"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    val fracs = splits.map(_._2)
    require(fracs.forall(f => f > 0 && f <= 1) && fracs.sum <= 1.0 + 1e-9,
      s"split fractions must be positive and sum to <=1: $splits")
    val prefix = substring(md5(concat_ws("|", lit(seed), col(groupCol))), 1, 4)
    val cuts = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(Converters.fractionCut)
    val expr = splits.init.map(_._1).zip(cuts)
      .foldRight(lit(splits.last._1): Column) {
        case ((name, cut), acc) => when(prefix < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }
}
