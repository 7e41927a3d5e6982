package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprinting (Rabin-Karp polynomial hash,
  * base 257, mod 2^61-1) as native Catalyst expressions:
  *
  *  - [[RollingHash64]]: one 64-bit fingerprint of the whole document —
  *    O(n), single pass, whole-stage codegen via static call.
  *  - [[ContentChunkHashes]]: content-defined chunking — a boundary is
  *    cut where the rolling hash of the last `window` bytes matches
  *    `mask` (hash & mask == mask); returns the array of chunk hashes.
  *    Because boundaries depend on CONTENT, not offsets, an insertion
  *    near the top of a document changes only the chunks it touches —
  *    downstream exact-dedup on chunk hashes is shift-resistant
  *    (the rsync/LBFS fingerprinting idea, applied to text dedup).
  */
object RollingHashOps {
  final val Base = 257L
  final val Mod = (1L << 61) - 1

  /** Multiplication mod 2^61-1 via the full 128-bit product
    * (Math.multiplyHigh) and the Mersenne fold: with M = 2^61-1,
    * 2^64 ≡ 8 (mod M), so hi*2^64 + lo ≡ (hi << 3) + (lo & M) + (lo >>> 61).
    * For a, b < 2^61 the product is < 2^122, so hi < 2^58 and every
    * intermediate stays below 2^63 — no signed overflow anywhere.
    * (Package-visible so the spec can cross-check against BigInteger.)
    */
  @inline private[functions] def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (hi << 3) + (lo & Mod) + (lo >>> 61)
    r = (r & Mod) + (r >>> 61)
    if (r >= Mod) r - Mod else r
  }

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (mulmod(h, Base) + (bytes(i) & 0xffL) + 1L) % Mod
      i += 1
    }
    h
  }

  /** Content-defined chunk hashes; window w, boundary when the rolling
    * window hash has its low `maskBits` bits set. Average chunk size
    * ~2^maskBits bytes. Returns LongArray ArrayData for codegen use.
    */
  def chunkHashes(s: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val bytes = s.getBytes
    val mask = (1L << maskBits) - 1
    // precompute Base^(w-1) for the rolling window removal
    var basePow = 1L
    var k = 0
    while (k < w - 1) { basePow = mulmod(basePow, Base); k += 1 }
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var winHash = 0L
    var chunkHash = 0L
    var i = 0
    while (i < bytes.length) {
      val b = (bytes(i) & 0xffL) + 1L
      winHash = (mulmod(winHash, Base) + b) % Mod
      if (i >= w) {
        val old = (bytes(i - w) & 0xffL) + 1L
        winHash = (winHash - mulmod(old, mulmod(basePow, Base)) % Mod + Mod) % Mod
      }
      chunkHash = (mulmod(chunkHash, Base) + b) % Mod
      if (i >= w - 1 && (winHash & mask) == mask) {
        out += chunkHash
        chunkHash = 0L
      }
      i += 1
    }
    if (chunkHash != 0L) out += chunkHash
    new GenericArrayData(out.toArray)
  }
}

case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"
  override protected def nullSafeEval(input: Any): Any =
    RollingHashOps.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashOps.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 = copy(newChild)
}

case class ContentChunkHashes(child: Expression, window: Int, maskBits: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_chunk_hashes"
  override protected def nullSafeEval(input: Any): Any =
    RollingHashOps.chunkHashes(input.asInstanceOf[UTF8String], window, maskBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHashOps.chunkHashes($c, $window, $maskBits)")
  override protected def withNewChildInternal(newChild: Expression): ContentChunkHashes =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftshim.ColumnShim
  def rollingHash64(c: Column): Column =
    ColumnShim.toColumn(RollingHash64(ColumnShim.toExpression(c)))
  def contentChunkHashes(c: Column, window: Int = 16, maskBits: Int = 6): Column =
    ColumnShim.toColumn(ContentChunkHashes(ColumnShim.toExpression(c), window, maskBits))
}
