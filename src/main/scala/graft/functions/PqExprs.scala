package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Asymmetric-distance (ADC) scoring for product quantization: the
  * approximate dot product between a FULL-precision query vector and a
  * PQ-ENCODED corpus vector — sum over subspaces of
  * dot(query_subvector_j, codebook_j(code_j)).
  *
  * One native expression per (probe, code) pair: O(dim) multiply-adds
  * against task-resident codebooks (an 8×256×8 codebook is 16 KB —
  * rides along like CentroidTopK's table). Accumulation order is
  * fixed — element order within a subspace, subspace order across —
  * so the score is bit-reproducible and the SQL oracle can replay it
  * as an explicit addition chain.
  */
object PqOps {

  def adcScore(vec: ArrayData, codes: ArrayData,
      codebooks: Array[Array[Array[Double]]], floats: Boolean): Double = {
    var total = 0.0
    var j = 0
    val nSub = codebooks.length
    var off = 0
    while (j < nSub) {
      val ctr = codebooks(j)(codes.getInt(j))
      val subDim = ctr.length
      var d = 0.0
      var i = 0
      if (floats) {
        while (i < subDim) { d += vec.getFloat(off + i).toDouble * ctr(i); i += 1 }
      } else {
        while (i < subDim) { d += vec.getDouble(off + i) * ctr(i); i += 1 }
      }
      total += d
      off += subDim
      j += 1
    }
    total
  }
}

case class PqAdcScore(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  require(codebooks.nonEmpty, "need at least one subspace codebook")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    right.dataType match {
      case ArrayType(IntegerType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"codes must be array<int>, got $other")
    }
  }

  override protected def nullSafeEval(vec: Any, codes: Any): Any =
    PqOps.adcScore(vec.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebooks, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqOps.adcScore($v, $c, $ref, $vecIsFloat)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore = copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(vec: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnShim.toColumn(PqAdcScore(
      ColumnShim.toExpression(vec), ColumnShim.toExpression(codes), codebooks))
}
