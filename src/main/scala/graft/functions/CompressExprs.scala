package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (the RefinedWeb/Gopher-family
  * "too compressible = boilerplate, incompressible = garble" proxy):
  * DEFLATE the UTF-8 text at a fixed level and report
  * ceil(compressed·1000 / original) permille. Deterministic for a
  * fixed JDK zlib (level pinned), executor-local, no state — but the
  * byte count is codec-implementation-specific, so this is
  * spec-verified (monotonicity + determinism) rather than
  * DuckDB-oracle-gated; treat thresholds as per-deployment
  * calibration, not portable constants.
  */
object CompressExprs {

  private[graft] def permille(bytes: Array[Byte]): Long = {
    if (bytes.isEmpty) return 1000L
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    (out * 1000L + bytes.length - 1) / bytes.length
  }
}

/** permille(deflate(text)) as a LongType column; null text -> null. */
case class DeflatePermille(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_permille"
  override protected def nullSafeEval(input: Any): Any =
    CompressExprs.permille(input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(newChild: Expression): DeflatePermille =
    copy(newChild)
}

object DeflatePermille {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.toColumn(DeflatePermille(ColumnShim.toExpression(c)))
}
