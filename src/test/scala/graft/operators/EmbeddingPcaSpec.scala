package graft.operators

import graft.SparkSpec

/** PCA/whitening: the Jacobi eigensolver against analytic cases, the
  * exact-integer moment statistics, and the property the operator
  * exists for — whitened data has (near-)identity covariance and the
  * top component captures the dominant direction.
  */
class EmbeddingPcaSpec extends SparkSpec {

  test("jacobi: diagonal matrix returns its diagonal") {
    val (vals, _) = EmbeddingPca.jacobiEigen(
      Array(Array(3.0, 0.0), Array(0.0, 1.0)))
    assert(vals.sorted.sameElements(Array(1.0, 3.0)))
  }

  test("jacobi: 2x2 analytic eigenvalues") {
    // [[2,1],[1,2]] -> eigenvalues 3 and 1
    val (vals, vecs) = EmbeddingPca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-10 })
    // eigenvector for 3 is (1,1)/sqrt(2) up to sign
    val i3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-10)
    assert(math.abs(math.abs(vecs(0)(i3)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(vecs(0)(i3) - vecs(1)(i3)) < 1e-10)
  }

  test("moment stats are exact and partition-order independent") {
    import spark.implicits._
    val vecs = (0 until 97).map(i =>
      (i.toLong, Array((i % 7 - 3) * 0.125f, (i % 5 - 2) * 0.25f)))
    val df1 = vecs.toDF("vec_id", "embedding").repartition(13)
    val df2 = vecs.toDF("vec_id", "embedding").repartition(1)
    val a = EmbeddingPca.momentStats(df1, "embedding", 2)
    val b = EmbeddingPca.momentStats(df2, "embedding", 2)
    assert(a._1 == b._1 && a._1 == 97)
    assert(a._2.sameElements(b._2) && a._3.sameElements(b._3))
    // hand-check sum of dim 0: q = round(x * 1024); x = (i%7-3)/8
    val expect0 = (0 until 97).map(i => ((i % 7 - 3) * 128).toLong).sum
    assert(a._2(0) == expect0)
  }

  test("fit + whiten: identity covariance and dominant axis recovered") {
    import spark.implicits._
    // anisotropic cloud: dim0 spread 16x dim1, correlated 45-degree tilt
    val rows = (0 until 400).map { i =>
      val t = (i * 2654435761L % 1000) / 1000.0 - 0.5
      val u = (i * 40503 % 997) / 997.0 - 0.5
      (i.toLong, Array((t * 0.8 + u * 0.05).toFloat, (t * 0.8 - u * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (n, sums, gram) = EmbeddingPca.momentStats(df, "embedding", 2)
    val model = EmbeddingPca.fit(n, sums, gram)
    // dominant axis is (1,1)/sqrt(2) up to sign
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.02, c0.toSeq.toString)
    assert(math.abs(c0(0) - c0(1)) < 0.02)
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
    // whitened covariance ~ identity
    val w = EmbeddingPca.whiten(df, "vec_id", "embedding", model, k = 2)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("whitened").toArray)
    val m = Array(w.map(_(0).toDouble).sum / w.length, w.map(_(1).toDouble).sum / w.length)
    def cov(a: Int, b: Int): Double =
      w.map(v => (v(a) - m(a)) * (v(b) - m(b))).sum / w.length
    assert(math.abs(cov(0, 0) - 1.0) < 0.05, s"var0 ${cov(0, 0)}")
    assert(math.abs(cov(1, 1) - 1.0) < 0.05, s"var1 ${cov(1, 1)}")
    assert(math.abs(cov(0, 1)) < 0.05, s"cov01 ${cov(0, 1)}")
  }

  test("whitening improves ANN-style residual energy balance on real table") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val (n, sums, gram) = EmbeddingPca.momentStats(e, "embedding", 64)
    val model = EmbeddingPca.fit(n, sums, gram)
    assert(model.eigenvalues.head >= model.eigenvalues.last)
    assert(model.eigenvalues.forall(_ > -1e-9), "covariance must be PSD")
    val w = EmbeddingPca.whiten(e, "vec_id", "embedding", model, k = 16)
    assert(w.count() == e.count())
    assert(w.select(size(col("whitened"))).distinct().head().getInt(0) == 16)
  }

  test("bad geometry fails loudly") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[org.apache.spark.SparkException](
      EmbeddingPca.momentStats(df, "embedding", 2))
    intercept[IllegalArgumentException](
      EmbeddingPca.fit(1, Array(1L), Array(1L)))
  }
}
