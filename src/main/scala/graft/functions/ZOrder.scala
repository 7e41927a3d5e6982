package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data layout — the
  * data-skipping tool for 100 TB scans: sort/range-partition by the
  * interleaved key and BOTH dimensions cluster, so parquet row-group
  * min/max stats prune selective predicates on either column. (The
  * same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY;
  * nothing engine-specific — just a sort key.)
  *
  * Built from native shift/and/or columns only (codegen'd, and
  * replayable bit-for-bit by any engine with integer bit ops). Keys
  * are 16 bits per dimension — row-group-level pruning needs layout
  * locality, not full-precision ordering.
  */
object ZOrder {

  val Bits = 16
  val DimMask = (1L << Bits) - 1 // 0xFFFF

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * magic-mask doubling: 8,4,2,1).
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(DimMask))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions: x on even bits, y on
    * odd. Inputs must already be in [0, 65535] (mod/bucketize first —
    * a silent mask of wider values would fold distant points together).
    */
  def zkey16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
