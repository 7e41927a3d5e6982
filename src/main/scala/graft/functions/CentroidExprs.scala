package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Coarse-quantizer scoring as ONE native expression: the n
  * highest-dot-product centroid ids for a vector, against a broadcast
  * centroid table held in the expression (driver-computed artifact,
  * like LSH hyperplanes).
  *
  * Why not compose columns: an argmax over k centroids as a
  * `when`-chain is O(k) nested expressions — it breaks whole-stage
  * codegen's 64KB method limit around k≈100 and re-evaluates dot
  * products per branch; IVF at 100 TB wants k≈4096. Here scoring is a
  * single static call: O(k·dim) multiply-adds plus an O(k·n) insertion
  * into the running top-n (n = nProbe ≤ 64 in practice), no codegen
  * blowup, centroids resident as one double[][].
  *
  * Ties: higher dot first; equal dots -> smaller centroid id
  * (deterministic under retries).
  */
object CentroidOps {

  /** ids of the n best centroids by dot(vec, centroid), descending. */
  def topK(vec: ArrayData, centroids: Array[Array[Double]], n: Int, floats: Boolean): ArrayData = {
    val k = centroids.length
    val keep = math.min(n, k)
    val bestIds = new Array[Int](keep)
    val bestDots = new Array[Double](keep)
    var filled = 0
    var c = 0
    while (c < k) {
      val ctr = centroids(c)
      var dot = 0.0
      var i = 0
      val dim = ctr.length
      if (floats) {
        while (i < dim) { dot += vec.getFloat(i).toDouble * ctr(i); i += 1 }
      } else {
        while (i < dim) { dot += vec.getDouble(i) * ctr(i); i += 1 }
      }
      // insertion into the running top-n (descending dot, id tiebreak)
      var pos = filled
      while (pos > 0 && (bestDots(pos - 1) < dot ||
          (bestDots(pos - 1) == dot && bestIds(pos - 1) > c))) pos -= 1
      if (pos < keep) {
        val stop = math.min(filled, keep - 1)
        var j = stop
        while (j > pos) { bestDots(j) = bestDots(j - 1); bestIds(j) = bestIds(j - 1); j -= 1 }
        bestDots(pos) = dot
        bestIds(pos) = c
        if (filled < keep) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestIds, filled))
  }
}

case class CentroidTopK(child: Expression, centroids: Array[Array[Double]], n: Int)
  extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_topk"

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CentroidOps.topK(input.asInstanceOf[ArrayData], centroids, n, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // centroids ride along as a referenced object — one double[][] per
    // task, not k×dim literals in generated source
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidOps.topK($c, $ref, $n, $elementIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}

object CentroidTopK {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnShim.toColumn(CentroidTopK(ColumnShim.toExpression(vec), centroids, n))
}
