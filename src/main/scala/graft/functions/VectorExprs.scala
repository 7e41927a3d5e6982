package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector math over embedding columns. The higher-order-function
  * composition (`aggregate(zip_with(...))`) evaluates interpreted with
  * per-element boxing; these expressions read the unsafe array data
  * directly in one pass and participate in whole-stage codegen via a
  * static call.
  *
  * Numerics contract (oracle parity): elements are widened to double
  * and accumulated in array order — bitwise-identical to the
  * `aggregate`-fold definition and to DuckDB's list_dot_product over
  * DOUBLE[].
  */
object VectorOps {

  /** cos(a, b) with one traversal accumulating ab, aa, bb. */
  def cosine(a: ArrayData, b: ArrayData, floats: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    if (floats) {
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        ab += x * y; aa += x * x; bb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        ab += x * y; aa += x * x; bb += y * y
        i += 1
      }
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Exact integer dot product over array<long> (int8-quantized
    * vectors ride in long arrays) — no FP rounding anywhere.
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var ab = 0L
    var i = 0
    while (i < n) { ab += a.getLong(i) * b.getLong(i); i += 1 }
    ab
  }

  def dot(a: ArrayData, b: ArrayData, floats: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var ab = 0.0
    var i = 0
    if (floats) {
      while (i < n) { ab += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { ab += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    ab
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.cosine($a, $b, $elementIsFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, $elementIsFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class LongDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "long_dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDotProduct =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.sql.graftshim.ColumnShim
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.toColumn(CosineSimilarity(ColumnShim.toExpression(a), ColumnShim.toExpression(b)))
  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.toColumn(DotProduct(ColumnShim.toExpression(a), ColumnShim.toExpression(b)))
  def longDot(a: Column, b: Column): Column =
    ColumnShim.toColumn(LongDotProduct(ColumnShim.toExpression(a), ColumnShim.toExpression(b)))
}
