package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the memory/bandwidth lever for ANN at
  * 100 TB. A float32 embedding column is 4 bytes/dim; symmetric int8
  * quantization (per-vector max-abs scale) cuts that 4x, which at
  * 100 TB is the difference between an embedding table that fits the
  * cluster page cache and one that doesn't. Candidate scoring then
  * runs on exact int arithmetic (sum of int8*int8 products — no
  * float rounding during the scan) and only the final re-rank needs
  * the float vectors.
  *
  * Determinism contract (so a DuckDB oracle can replay it bit-for-bit):
  *   - scale = 127.0 / maxAbs(vec), computed in IEEE double;
  *   - quantized value = floor(x * scale + 0.5) — explicit round-half-
  *     up toward +inf, NOT engine round() (engines disagree on
  *     half-even vs half-away);
  *   - all-zero vectors quantize to all zeros (scale defined as 0);
  *   - dot products are exact BIGINT sums.
  *
  * All column expressions are native HOFs (transform/zip_with/
  * aggregate) — whole-stage codegen, no UDFs.
  */
object Quantize {

  /** max(|x|) over the vector, in double. 0.0 for empty vectors. */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Per-vector symmetric scale: 127 / maxAbs, or 0 for a zero vector. */
  def scaleFor(vec: Column): Column = {
    val ma = maxAbs(vec)
    when(ma === 0.0, lit(0.0)).otherwise(lit(127.0) / ma)
  }

  /** Quantize to int in [-127, 127] with an explicit, engine-portable
    * rounding rule. Emitted as array<int> for arithmetic convenience;
    * values always fit int8 (a storage layer would cast to tinyint).
    */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** Exact integer dot product of two quantized vectors. Native
    * codegen'd expression; `aggregate(zip_with(_*_))` computes the
    * same values but interpreted with per-element boxing (asserted
    * equal in QuantizeSpec).
    */
  def intDot(a: Column, b: Column): Column = VectorExprs.longDot(a, b)

  /** Reconstructed (approximate) cosine from the int dot and the two
    * scales + norms of the quantized vectors — exact ints until the
    * final double divisions.
    */
  def approxCosine(qdot: Column, aNormSq: Column, bNormSq: Column): Column =
    qdot.cast("double") / (sqrt(aNormSq.cast("double")) * sqrt(bNormSq.cast("double")))

  /** ||q||^2 as an exact BIGINT. */
  def intNormSq(q: Column): Column = intDot(q, q)

  /** Per-group quantized centroid sums: one row per (key, dim) with
    * the exact integer sum of the int8-quantized component and the
    * group size — the domain-level embedding profile ("how far apart
    * are my sources?") with all arithmetic exact until a consumer
    * divides. posexplode × dim then hash agg: map-side combine bounds
    * the shuffle by keys × dim, never corpus size.
    */
  def groupedQuantizedSums(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    withQuantized(df.select(col(keyCol).as("key"), col(vecCol).as("_v")), "_v", "q")
      .select(col("key"), posexplode(col("q")).as(Seq("dim", "qx")))
      .groupBy(col("key"), col("dim"))
      .agg(sum(col("qx")).as("qsum"), count(lit(1)).as("n_vecs"))

  /** Add `<as>_q` (array<long> int8-valued) and `<as>_scale` columns. */
  def withQuantized(df: DataFrame, vecCol: String, as: String = "q"): DataFrame = {
    val sc = scaleFor(col(vecCol))
    df.withColumn(s"${as}_scale", sc)
      .withColumn(as, quantize(col(vecCol), col(s"${as}_scale")))
  }

  /** Brute-force top-k neighbors under the quantized integer dot —
    * the in-bucket scoring pass of a quantized ANN scan. Quantization
    * happens once per side (projected, narrow), the candidate scan
    * carries only (id, q); ties broken by neighbor id. At scale the
    * probe side is small (broadcast); the base side streams.
    */
  def quantizedTopK(probes: DataFrame, base: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val p = withQuantized(probes.select(col(idCol).as("query_id"), col(vecCol).as("_v")), "_v", "q")
      .select(col("query_id"), col("q").as("_qa"))
    val b = withQuantized(base.select(col(idCol).as("neighbor_id"), col(vecCol).as("_v")), "_v", "q")
      .select(col("neighbor_id"), col("q").as("_qb"))
    val scored = Similarity.gatedBroadcast(p).crossJoin(b)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), intDot(col("_qa"), col("_qb")).as("qdot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }
}
