package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word-n-gram shingles in one pass: tokenize on spaces, hash
  * each token (XXH64 over its byte span, zero copies), combine the
  * last n token hashes with a polynomial mix per window position.
  *
  * This is the MinHash ingestion hot path — the column-composed
  * version (transform + slice + array_join + xxhash64) allocates a
  * joined string per shingle and evaluates interpreted. Hash VALUES
  * differ from the composed version (token-hash mixing instead of
  * joined-string hashing) — fine for MinHash/LSH, whose guarantees
  * only need a uniform deterministic hash family.
  */
object ShingleHashOps {
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val ring = new Array[Long](n)
    var filled = 0
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val start = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 7L)
        ring(filled % n) = h
        filled += 1
        if (filled >= n) {
          // polynomial mix of the window's token hashes, oldest first
          var acc = 1125899906842597L
          var k = filled - n
          while (k < filled) {
            acc = acc * 31L + ring(k % n)
            k += 1
          }
          out += acc
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** String word-n-gram shingles in one pass — exact semantics of the
  * composed `transform(sequence…, slice+array_join)` version (non-empty
  * space-separated tokens, shingle = n tokens joined by one space), so
  * Jaccard oracles comparing shingle STRINGS are unaffected; this is
  * just the allocation-lean evaluation (token spans copied once per
  * shingle, no per-step array slices).
  */
object StringShingleOps {
  def shingles(s: UTF8String, n: Int): ArrayData = {
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
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      var size = n - 1
      var k = 0
      while (k < n) { size += ends(w + k) - starts(w + k); k += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < n) {
        val l = ends(w + k) - starts(w + k)
        System.arraycopy(bytes, starts(w + k), buf, pos, l)
        pos += l
        if (k < n - 1) { buf(pos) = ' '; pos += 1 }
        k += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class StringShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "string_shingles"
  override protected def nullSafeEval(input: Any): Any =
    StringShingleOps.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringShingleOps.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): StringShingles =
    copy(child = newChild)
}

object StringShingles {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, n: Int): Column =
    ColumnShim.toColumn(StringShingles(ColumnShim.toExpression(c), n))
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHashOps.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashOps.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, n: Int): Column =
    ColumnShim.toColumn(ShingleHashes(ColumnShim.toExpression(c), n))
}
