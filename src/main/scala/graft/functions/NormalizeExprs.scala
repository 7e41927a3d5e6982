package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for training-data pipelines: canonical
  * composition (NFC) and diacritic stripping — the cleanup pass a
  * corpus gets before fingerprinting/dedup so that visually-identical
  * strings ("é" composed vs "e"+U+0301) hash identically.
  *
  * Spark ships no Unicode-normalization function, so these are native
  * Catalyst expressions (`doGenCode` via static helpers) rather than
  * UDFs — they stay inside WholeStageCodegen like the rest of the text
  * stack. Semantics match DuckDB's `nfc_normalize` / `strip_accents`
  * on Latin diacritics, which is what the driver oracle replays.
  */
object NormalizeOps {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Canonical composition (NFC). `isNormalized` is a cheap scan that
    * short-circuits the common all-ASCII corpus row (ASCII is always
    * NFC) without re-allocating the string.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Decompose (NFD), drop combining marks, recompose: "á" -> "a",
    * "ö" -> "o". Matches DuckDB `strip_accents` on Latin-script
    * diacritics. ASCII rows take the no-alloc path (already NFD, no
    * marks to replace).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    val stripped = Marks.matcher(decomposed).replaceAll("")
    if (stripped eq str) s
    else UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}

case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"
  override protected def nullSafeEval(input: Any): Any =
    NormalizeOps.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeOps.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.toColumn(NormalizeNfc(ColumnShim.toExpression(c)))
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    NormalizeOps.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeOps.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.toColumn(StripAccents(ColumnShim.toExpression(c)))
}
