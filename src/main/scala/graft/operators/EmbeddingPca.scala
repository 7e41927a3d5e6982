package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the standard preprocessing
  * that decorrelates dimensions before IVF/PQ indexing (whitened
  * residuals quantize measurably better) and the backbone of
  * dimensionality reduction for cheap first-pass dedup.
  *
  * Split along the repo's exact-arithmetic seam:
  *
  *  - the DISTRIBUTED part — one pass computing `n`, per-dimension
  *    sums, and the full Gramian `Σ q qᵀ` of 2^10-quantized
  *    coordinates — is integer-exact (order-free sums of longs), so
  *    the driver's oracle replays it bit-for-bit; the cross-partition
  *    combine moves O(partitions × d²) longs, never the corpus;
  *  - the DRIVER part — a d×d cyclic Jacobi eigensolver over the
  *    covariance derived from those stats — is O(d³) on
  *    configuration-sized data (d ≈ 64-4096), the same division of
  *    labor as the ANN codebook steps (`functions/Ann.scala`).
  *
  * Quantization bound: |x| ≤ 2^21 keeps q² ≤ 2^62/n for corpora to
  * ~2^31 rows per partition-combine; embedding coordinates live in
  * [-1, 1] in practice, far inside.
  *
  * Reference seam: no analog — the reference moves records; this is
  * net-new numeric-pipeline capability alongside Quantize/Ann.
  */
object EmbeddingPca {

  val Q: Long = 1L << 10

  /** Exact sufficient statistics of the Q-quantized embedding column:
    * (row count, per-dim sums, upper-triangular Gramian flattened
    * row-major). One mapPartitions pass + a config-sized reduce.
    */
  def momentStats(embs: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Long], Array[Long]) = {
    require(dim >= 1 && dim <= 4096, s"dim $dim outside [1, 4096]")
    val spark = embs.sparkSession
    import spark.implicits._
    val nTri = dim * (dim + 1) / 2
    val parts: Dataset[(Long, Array[Long], Array[Long])] = embs
      .select(col(vecCol)).as[Array[Float]]
      .mapPartitions { rows =>
        var n = 0L
        val sums = new Array[Long](dim)
        val gram = new Array[Long](nTri)
        val q = new Array[Long](dim)
        rows.foreach { v =>
          require(v != null && v.length == dim,
            s"embedding of length ${if (v == null) -1 else v.length}, expected $dim")
          var i = 0
          while (i < dim) {
            q(i) = math.floor(v(i).toDouble * Q + 0.5).toLong
            sums(i) += q(i)
            i += 1
          }
          var k = 0
          i = 0
          while (i < dim) {
            var j = i
            while (j < dim) {
              gram(k) += q(i) * q(j)
              k += 1
              j += 1
            }
            i += 1
          }
          n += 1
        }
        Iterator.single((n, sums, gram))
      }
    parts.reduce { (a, b) =>
      val sums = new Array[Long](dim)
      val gram = new Array[Long](nTri)
      var i = 0
      while (i < dim) { sums(i) = a._2(i) + b._2(i); i += 1 }
      i = 0
      while (i < nTri) { gram(i) = a._3(i) + b._3(i); i += 1 }
      (a._1 + b._1, sums, gram)
    }
  }

  /** The fitted transform: mean (original units), eigenvalues
    * descending (covariance units), and eigenvectors as rows of
    * `components` (components(k) is the k-th principal axis).
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Covariance from the integer stats, then a cyclic Jacobi
    * eigendecomposition — all driver-side O(d³) on config-sized data.
    */
  def fit(n: Long, sums: Array[Long], gram: Array[Long]): PcaModel = {
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    val d = sums.length
    val mean = sums.map(_.toDouble / n / Q)
    // cov[i][j] = (Σ q_i q_j / n - mean_i mean_j Q²) / Q²
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gram(k).toDouble / n / (Q * Q) - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        k += 1
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // sort descending by eigenvalue
    val order = vals.zipWithIndex.sortBy(-_._1).map(_._2)
    PcaModel(mean,
      order.map(vals(_)),
      order.map(o => Array.tabulate(d)(r => vecs(r)(o))))
  }

  /** Cyclic Jacobi for symmetric matrices: rotate away the largest
    * off-diagonal elements until convergence. O(d³) per sweep,
    * numerically robust for the well-conditioned covariance sizes
    * this pipeline fits (d ≤ 4096).
    */
  private[operators] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1e-300, frobenius(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2x2 rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sgn(0) must be 1, not 0 — equal diagonal entries still
            // need a real 45-degree rotation, not a silent identity
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Project embeddings onto the top `k` whitened components:
    * y = diag(λ+eps)^{-1/2} · V_k · (x - μ). Per-partition mat-vec
    * with the config-sized model in the task closure — no shuffle.
    */
  def whiten(embs: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, k: Int, eps: Double = 1e-9): DataFrame = {
    val d = model.mean.length
    require(k >= 1 && k <= d, s"k $k outside [1, $d]")
    val spark = embs.sparkSession
    import spark.implicits._
    val mean = model.mean
    val scale = model.eigenvalues.take(k).map(l => 1.0 / math.sqrt(l + eps))
    val comps = model.components.take(k)
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, x) =>
        require(x != null && x.length == d,
          s"vector $id has length ${if (x == null) -1 else x.length}, expected $d")
        val y = new Array[Float](k)
        var c = 0
        while (c < k) {
          var s = 0.0
          var i = 0
          while (i < d) {
            s += comps(c)(i) * (x(i) - mean(i))
            i += 1
          }
          y(c) = (s * scale(c)).toFloat
          c += 1
        }
        (id, y)
      })
      .toDF(idCol, "whitened")
  }
}
