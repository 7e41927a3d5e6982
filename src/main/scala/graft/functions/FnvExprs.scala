package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hashing as native Catalyst expressions.
  *
  * Why a second hash family next to the XXH64 ones (SimHash64 /
  * ShingleHashes): FNV-1a is a two-ops-per-byte fold, which a SQL
  * engine can reproduce literally (DuckDB: list_reduce over character
  * codes with HUGEINT mod-2^64 arithmetic). That makes every query
  * built on it *oracle-checkable end-to-end* by the driver's DuckDB
  * gate — signature generation included — where the XXH64 variants
  * could only ever get rows-only checks. Throughput is within ~2× of
  * XXH64 on the short tokens/shingles these paths hash, and both
  * variants stay available; the oracle-checked queries use FNV.
  *
  * Reference analog: compaction/dedup key hashing must be stable
  * across runs (gobblin-compaction/.../avro/AvroKeyDedupReducer.java
  * derives keys purely from record content for the same reason).
  */
object Fnv64Ops {
  final val Init = 0xcbf29ce484222325L // FNV-1a 64 offset basis
  final val Prime = 0x100000001b3L

  /** FNV-1a 64 of the string's UTF-8 bytes (signed-long bit pattern). */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Init
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  /** FNV-1a 64 of each word n-gram shingle, where the hashed bytes are
    * exactly the shingle STRING (n non-empty space-separated tokens
    * joined by one 0x20) — i.e. hash(array_to_string(tokens[i:i+n-1]))
    * without materializing the strings. Cross-engine reproducible.
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val st = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > st) { starts += st; ends += i }
    }
    val nTok = starts.length
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      var h = Init
      var k = 0
      while (k < n) {
        var j = starts(w + k)
        val e = ends(w + k)
        while (j < e) { h = (h ^ (bytes(j) & 0xffL)) * Prime; j += 1 }
        if (k < n - 1) h = (h ^ 0x20L) * Prime // the joining space
        k += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash with FNV-1a token hashing — same bit-voting
    * semantics as [[SimHash64.hash]], reproducible token hash.
    */
  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      if (i > start) {
        var h = Init
        var j = start
        while (j < i) { h = (h ^ (bytes(j) & 0xffL)) * Prime; j += 1 }
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

case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"
  override protected def nullSafeEval(input: Any): Any =
    Fnv64Ops.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64Ops.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(newChild)
}

object Fnv64 {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column = ColumnShim.toColumn(Fnv64(ColumnShim.toExpression(c)))
}

case class FnvShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fnv_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Fnv64Ops.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64Ops.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): FnvShingleHashes =
    copy(child = newChild)
}

object FnvShingleHashes {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, n: Int): Column =
    ColumnShim.toColumn(FnvShingleHashes(ColumnShim.toExpression(c), n))
}

case class SimHashFnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fnv64"
  override protected def nullSafeEval(input: Any): Any =
    Fnv64Ops.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64Ops.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashFnv64 = copy(newChild)
}

object SimHashFnv64 {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column = ColumnShim.toColumn(SimHashFnv64(ColumnShim.toExpression(c)))
}
