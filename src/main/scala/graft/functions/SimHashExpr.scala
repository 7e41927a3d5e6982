package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as a native Catalyst
  * expression: one pass over the bytes, imperative bit voting — the
  * preference-order-(b) path from the build guidelines (a composed
  * higher-order-function version would allocate a 64-element array per
  * token).
  *
  * Semantics: tokens = maximal runs of non-space bytes; each token
  * hashed with xxhash64 (Spark's XXH64, seed 42 — same family as the
  * built-in xxhash64 function); per bit sum +1/-1 votes; bit set iff
  * votes > 0.
  *
  * Codegen: doGenCode emits a static call into [[SimHash64]] — the
  * expression participates in whole-stage codegen with no per-row
  * virtual dispatch or boxing.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

object SimHash64 {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column = ColumnShim.toColumn(SimHash64(ColumnShim.toExpression(c)))

  /** Static hot path, called from generated code and eval alike. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
