package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor scale paths over an embedding column
  * (`array<float>`): [[Ann.hyperplaneLsh]] (random-hyperplane signatures
  * → bucket join) and [[Ann.IvfIndex]] (k-means coarse quantizer →
  * probe-nearest-partitions). `Similarity.bruteForceTopK` is the exact
  * baseline both are measured against.
  *
  * At 100 TB the shape is: candidate generation is an equi-join on
  * bucket ids (shuffle on small keys, never a cross join), exact
  * cosine rescoring touches only candidates. Hyperplanes/centroids are
  * driver-computed small artifacts broadcast to executors.
  */
object Ann {

  /** Deterministic unit-free hyperplanes via SplitMix64 — stable across
    * runs/JVMs (same requirement as MinHash seeds).
    */
  private def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // Box-Muller from uniform bits for gaussian-ish planes
    Array.fill(nPlanes) {
      Array.fill(dim) {
        val u1 = (next() >>> 11).toDouble / (1L << 53).toDouble
        val u2 = (next() >>> 11).toDouble / (1L << 53).toDouble
        math.sqrt(-2 * math.log(u1 + 1e-300)) * math.cos(2 * math.Pi * u2)
      }
    }
  }

  /** Sign-bit signature column: bit i = sign(v . plane_i). Built as a
    * codegen'd expression sum over zip_with — no UDF.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val v = vec.cast("array<double>")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(VectorExprs.dotProduct(v, lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: same-signature vectors are candidates; exact
    * cosine rescoring; top-k per probe. Multi-table (nTables) repeats
    * with independent planes to recover recall lost to bucket splits.
    *
    * Parameter math: per-bit agreement for neighbors at angle θ is
    * 1-θ/π; recall ≈ 1-(1-p^nPlanes)^nTables. Moderate-similarity
    * neighbors (cos ~0.5, p ~0.63) need FEW planes and MANY tables —
    * e.g. 4 planes x 8 tables ≈ 0.75 recall; 12 planes x 4 tables is
    * ~4%. Tune nPlanes to the similarity profile of the corpus.
    */
  def hyperplaneLsh(probes: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, nTables: Int = 8, dim: Int = 64,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val planes = hyperplanes(dim, nPlanes, seed = 0x5EED + t * 7919L)
      val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"),
        hyperplaneSignature(col(vec), planes).as("bucket"))
      val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
        hyperplaneSignature(col(vec), planes).as("bucket"))
      p.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("_qv"), col("_cv"))
    }
    val cands = tables.reduce(_ union _)
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** IVF index: k-means coarse quantizer. `fit` computes centroids
    * (driver-held, tiny); `search` scores probes against centroids,
    * keeps the nProbe nearest inverted lists, and rescores exactly
    * within them. The corpus-side assignment is computed once and can
    * be persisted as a column (re-used across queries).
    */
  final case class IvfIndex(centroids: Array[(Int, Array[Double])]) {

    private def centroidSim(vec: Column): Seq[(Int, Column)] =
      centroids.toSeq.map { case (cid, ctr) =>
        cid -> VectorExprs.dotProduct(vec.cast("array<double>"), lit(ctr))
      }

    /** Nearest centroid id (by dot product — centroids are from
      * normalized-ish data; exact metric only affects partitioning).
      */
    def assignColumn(vec: Column): Column = {
      val sims = centroidSim(vec)
      val best = sims.map(_._2).reduce((a, b) => greatest(a, b))
      sims.foldRight(lit(-1): Column) { case ((cid, s), acc) =>
        when(s === best, lit(cid)).otherwise(acc)
      }
    }

    /** Array of the nProbe highest-scoring centroid ids. */
    def probeColumn(vec: Column, nProbe: Int): Column = {
      val sims = centroidSim(vec)
      val arr = array(sims.map { case (cid, s) =>
        struct(s.as("s"), lit(cid).as("cid")) }: _*)
      slice(reverse(array_sort(arr)), 1, nProbe).getField("cid")
    }

    def search(probes: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
        id: String = "vec_id", vec: String = "embedding"): DataFrame = {
      val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
        assignColumn(col(vec)).as("list_id"))
      val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"),
        explode(probeColumn(col(vec), nProbe)).as("list_id"))
      val cands = p.join(c, Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cands.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
        .select(col("query_id"), col("neighbor_id"), col("sim"))
    }
  }

  /** Fit the coarse quantizer with spark.ml KMeans (distributed; the
    * only driver-side artifact is k centroid vectors).
    */
  def fitIvf(corpus: DataFrame, k: Int, vec: String = "embedding", seed: Long = 42L): IvfIndex = {
    val features = corpus.select(
      array_to_vector(col(vec).cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(features)
    IvfIndex(model.clusterCenters.zipWithIndex.map { case (v: Vector, i) => (i, v.toArray) })
  }
}
