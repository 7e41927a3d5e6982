package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnShim

/** Bloom-filter sketch surface — Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expression
  * pair behind spark.sql.optimizer.runtime.bloomFilter.*) exposed as
  * columns. The 100 TB use: build the filter over the SMALL side's
  * join keys (one tiny aggregate), broadcast the serialized bits, and
  * semi-filter the big side BEFORE its shuffle — rows that can't join
  * never enter the exchange. No false negatives by construction; the
  * false-positive rate is set by numBits/expectedItems (~8 bits/item
  * ≈ 2%).
  *
  * Keys must be LONG — hash wide keys with xxhash64 first (the same
  * contract as Spark's injected runtime filters).
  */
object Bloom {

  def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.toColumn(new BloomFilterAggregate(
      ColumnShim.toExpression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Aggregate the small side's keys into serialized filter bits.
    * Driver-held like the IVF centroids/PQ codebooks: the sketch is
    * numBits/8 bytes by construction (8 bits/item ≈ 2% FPR), so a
    * 20M-key build ship as ~20 MB of plan literal — the same size
    * regime Spark's own InjectRuntimeFilter caps at. One tiny
    * aggregate job, no shuffle of the big side.
    */
  def buildBloom(df: org.apache.spark.sql.DataFrame, keyHash: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val bits = df.agg(bloomAgg(keyHash, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    require(bits != null,
      "bloom built over an empty key set — a null filter would silently drop every row")
    bits
  }

  /** Membership test against built filter bits. `might_contain`
    * requires a CONSTANT filter (Spark enforces it), which is exactly
    * what [[buildBloom]] returns — the literal rides the closure like
    * a broadcast.
    */
  def mightContain(bloomBits: Array[Byte], keyHash: Column): Column =
    ColumnShim.toColumn(BloomFilterMightContain(
      Literal(bloomBits, org.apache.spark.sql.types.BinaryType),
      ColumnShim.toExpression(keyHash)))
}
