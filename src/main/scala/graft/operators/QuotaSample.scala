package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota sampling: split ONE global sample budget across groups in
  * exact proportion to group sizes — the largest-remainder (Hare)
  * method — then draw each group's quota deterministically. This is
  * the missing third face of the sampling family: `sampleKPerGroup`
  * takes per-group k as input, `stratifiedSample` takes fractions;
  * this COMPUTES the per-group allocation from a global budget with
  * quotas that sum to exactly k (floor + top-up by largest remainder,
  * ties to the smaller group key — all integer arithmetic, no
  * float apportionment drift).
  *
  * The draw is md5-keyed smallest-first (same deterministic-uniform
  * device as the stratified sampler), so reruns and engines agree.
  *
  * 100 TB shape: group counts are one map-side-combined aggregation,
  * materialized once (localCheckpoint) so every later pass is
  * groups-sized; total/deficit are O(1) driver scalars off that
  * checkpoint; the largest-remainder rank runs through
  * [[GlobalOrder.withRowNumber]] — range exchange + per-partition
  * window + prefix offsets, NO single-partition window even at 10M+
  * registrable-domain group counts; the draw is one quota join + one
  * per-group rank window, rank bound pushed as WindowGroupLimit.
  */
object QuotaSample {

  /** Select exactly `k` rows (requires k <= total rows), allocated
    * across `groupCol` by largest remainder. Output: the selected rows'
    * (group, id) plus that group's size `n_g` and allocation `quota`.
    */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String, k: Long,
      salt: String = "quota"): DataFrame = {
    require(k >= 0, s"budget must be >= 0, got $k")
    // ONE corpus scan, materialized: the allocation below re-reads the
    // domain-sized groups table, never the corpus
    val counts = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n_g"))
      .localCheckpoint(true)
    // O(1) driver scalar off the checkpoint (coalesce: empty corpus)
    val total = counts.agg(coalesce(sum(col("n_g")), lit(0L))).head.getLong(0)
    // the in-plan quota>n_g guard below can't fire on an EMPTY corpus
    // (no group rows to evaluate) — enforce the k<=N contract here
    if (total == 0 && k > 0) throw new IllegalArgumentException(
      s"budget k=$k exceeds the corpus size — corpus is empty")
    val based = counts
      .withColumn("_nk", col("n_g") * k)
      // SQL `div`: true integer division on longs (no double round-trip)
      .withColumn("base", expr(s"_nk div CAST(${math.max(total, 1L)} AS BIGINT)"))
      .withColumn("rem", col("_nk") % lit(math.max(total, 1L)))
    // largest-remainder rank over the groups table WITHOUT a global
    // single-partition sort (10M+ domains stay parallel); ranks over
    // the total order (rem DESC, g) are partition-invariant
    val ranked0 = GlobalOrder.withRowNumber(based,
      Seq(col("rem").desc, col("g")), "rr")
    // deficit = k - Σ base: O(1) driver scalar off the rank checkpoint
    val deficit =
      k - ranked0.agg(coalesce(sum(col("base")), lit(0L))).head.getLong(0)
    val ranked = ranked0
      .withColumn("quota", col("base") + when(col("rr") <= lit(deficit), 1L).otherwise(0L))
      // contract enforcement IN-PLAN on the domain-sized groups table
      // (no extra corpus scan, no second evaluation of the aggregate):
      // quota > n_g happens exactly when k > N (largest-remainder
      // property) — error, never silently under-deliver.
      .withColumn("quota",
        when(col("quota") > col("n_g"), raise_error(concat(
          lit(s"budget k=$k exceeds the corpus size — group "),
          coalesce(col("g").cast("string"), lit("<null>")),
          lit(" allocated "), col("quota"), lit(" of "), col("n_g"), lit(" rows"))))
          .otherwise(col("quota")))
      .select(col("g"), col("n_g"), col("quota"))
    val keyed = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      md5(concat_ws("|", lit(salt), col(idCol))).as("_key"))
    val wg = Window.partitionBy(col("g")).orderBy(col("_key"), col("id"))
    // NULL-SAFE join: groupBy keeps a null group, so the draw must too
    // (a plain equi-join would silently drop its whole allocation)
    keyed.join(ranked.withColumnRenamed("g", "_rg"),
        col("g") <=> col("_rg")).drop("_rg")
      .withColumn("_rn", row_number().over(wg))
      .filter(col("_rn") <= col("quota"))
      .select(col("g").as(groupCol), col("id").as(idCol), col("n_g"), col("quota"))
  }
}
