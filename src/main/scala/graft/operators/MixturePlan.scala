package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture epoch planning — the step between measuring per-source
  * token masses and launching training: given target mixture weights
  * and a total token budget, how many EPOCHS (repeat passes) of each
  * source does the run consume, and where does the plan hit the
  * repeat ceiling (data-constrained scaling caps useful repetition at
  * a few epochs — Muennighoff et al. 2023)?
  *
  * Complements the sampling-side mixture operators
  * (`Converters.mixtureTemperature` draws rows; this PLANS repeats):
  * all exact integer arithmetic —
  *
  *   target_i = (budget * weight_i) div weightSum
  *   epochs_q = ceil-div(target_i * QUANT, mass_i)   (QUANT = 2^10)
  *   capped   = min(epochs_q, maxEpochs * QUANT)
  *   planned  = (mass_i * capped) div QUANT
  *   shortfall= target_i - planned  (> 0 ⇔ the cap bound this source)
  *
  * One aggregation over the corpus for masses; the plan itself is
  * O(sources). Weights are exact integers (parts, not floats) so the
  * oracle replays the plan bit-for-bit. QUANT = 2^10 (milli-epoch
  * precision) keeps `target * QUANT` inside exact longs for budgets
  * up to ~8e15 tokens — orders past any current training run.
  */
object MixturePlan {

  val Quant: Long = 1L << 10

  /** `corpus` must carry `groupCol` and `tokCol` (exact integer token
    * counts); `weights` maps group → integer weight parts. Groups in
    * the corpus but not in `weights` get weight 0 (planned out);
    * weights naming absent groups are ignored (nothing to repeat).
    */
  def plan(corpus: DataFrame, groupCol: String, tokCol: String,
      weights: Map[String, Long], budgetTokens: Long,
      maxEpochs: Long = 4L): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    require(weights.values.sum > 0, "at least one positive weight")
    require(budgetTokens > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    val wsum = weights.values.sum
    val wexpr = weights.foldLeft(lit(0L)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val masses = corpus.groupBy(col(groupCol))
      .agg(sum(col(tokCol)).as("mass"))
      .withColumn("weight", wexpr)
    // exact integer arithmetic throughout: *_q values are 2^20-scaled
    masses
      .withColumn("target",
        expr(s"(${budgetTokens}L * weight) div ${wsum}L"))
      .withColumn("epochs_q",
        when(col("mass") === 0L, lit(0L))
          .otherwise(expr(s"(target * ${Quant}L + mass - 1L) div mass")))
      .withColumn("epochs_capped_q",
        least(col("epochs_q"), lit(maxEpochs * Quant)))
      .withColumn("planned_tokens",
        expr(s"(mass * epochs_capped_q) div ${Quant}L"))
      .withColumn("shortfall",
        greatest(col("target") - col("planned_tokens"), lit(0L)))
      .select(col(groupCol), col("mass"), col("weight"), col("target"),
        col("epochs_capped_q").as("epochs_q"), col("planned_tokens"),
        col("shortfall"))
  }
}
