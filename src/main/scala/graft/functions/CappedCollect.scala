package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard element cap: the aggregation buffer never
  * holds more than cap+1 elements — update and merge both stop
  * appending at the bound, so a hot group costs O(cap) memory instead
  * of O(group size). The ONE extra element (cap+1) makes overflow
  * observable downstream (`size(ids) > cap` ⇒ the group exceeded the
  * cap and its list is truncated/arbitrary; `size(ids) <= cap` ⇒ the
  * list is complete).
  *
  * This is the scale guard for doc-frequency-capped set operations
  * (see [[Similarity.ngramJaccardPairs]]): a stopword-ish shingle in a
  * 10^9-doc block would otherwise materialize every doc id in ONE
  * unsplittable aggregation row — AQE skew handling cannot divide a
  * single group, so the cap has to live inside the aggregate itself.
  *
  * Which elements survive an overflowing group is partition-order
  * dependent (like collect_list's element order) — callers must treat
  * overflowed groups as "too hot, drop", never as data.
  */
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, "cap must be >= 1")

  private def limit = cap + 1

  override lazy val bufferElementType: DataType = child.dataType
  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty
  override def prettyName: String = "collect_list_capped"

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length < limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(n: Int): CollectListCapped =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectListCapped =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)
}

object CollectListCapped {
  /** Column form: `collect_list_capped(c, cap)` as an aggregate. */
  def apply(c: Column, cap: Int): Column =
    ColumnShim.toColumn(
      new CollectListCapped(ColumnShim.toExpression(c), cap).toAggregateExpression())
}
