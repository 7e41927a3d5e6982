package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** The k smallest longs of a group, as a sorted array — a DETERMINISTIC
  * bounded collect (unlike [[CollectListCapped]], whose survivors are
  * partition-order dependent): min-k is a pure function of the group's
  * value set, so any engine replays it exactly.
  *
  * The buffer never exceeds k elements in update OR merge — a hot
  * group (a stopword token's posting list over 10^9 docs) costs O(k),
  * and AQE never needs to split the group. This is the aggregation
  * that makes inverted-index builds skew-safe.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override lazy val bufferElementType: DataType = LongType
  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty
  override def prettyName: String = "min_k_longs"

  private def insert(buffer: mutable.ArrayBuffer[Any], v: Long): Unit =
    if (buffer.length < k) buffer += v
    else {
      var maxIdx = 0
      var i = 1
      while (i < buffer.length) {
        if (buffer(i).asInstanceOf[Long] > buffer(maxIdx).asInstanceOf[Long]) maxIdx = i
        i += 1
      }
      if (v < buffer(maxIdx).asInstanceOf[Long]) buffer(maxIdx) = v
    }

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    other.foreach(v => insert(buffer, v.asInstanceOf[Long]))
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray.map(_.asInstanceOf[Long]).sorted)

  override def withNewMutableAggBufferOffset(n: Int): MinKLongs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinKLongs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}

object MinKLongs {
  /** Column form: the k smallest values of `c` (LongType), sorted. */
  def apply(c: Column, k: Int): Column =
    ColumnShim.toColumn(
      new MinKLongs(ColumnShim.toExpression(c), k).toAggregateExpression())
}
