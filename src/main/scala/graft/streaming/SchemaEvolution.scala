package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.state.{FsStateStore, StateStore}

/** Mid-stream schema evolution (SURVEY §1.3 / §7 hard-parts): the
  * reference injects MetadataUpdateControlMessage when a record's
  * schema id changes (KafkaSchemaChangeInjector.java:48); the Spark
  * pattern is a per-micro-batch schema check inside foreachBatch with
  * a query-restart protocol for incompatible change.
  *
  * Policy (same as the reference's converters):
  *  - ADDITIVE change (new nullable columns): conform the batch to the
  *    target schema — missing columns null-filled, new columns recorded
  *    to the state store so the NEXT run can restart with the widened
  *    schema. No data loss, no restart mid-run.
  *  - INCOMPATIBLE change (type change / dropped non-null column):
  *    raise [[SchemaChangedException]] — the stream stops, the new
  *    schema is recorded, and the operator restarts the query against
  *    the recorded schema (checkpoint resumes offsets).
  */
object SchemaEvolution {

  final class SchemaChangedException(val observed: StructType, msg: String)
    extends RuntimeException(msg)

  private val Store = "schemas"

  def recordSchema(store: StateStore, stream: String, schema: StructType): Unit =
    store.put(Store, stream, Map("ddl" -> schema.toDDL))

  def loadSchema(store: StateStore, stream: String): Option[StructType] =
    store.get(Store, stream).flatMap(_.get("ddl")).map(StructType.fromDDL)

  /** Conform one micro-batch to `target`. Returns the conformed frame;
    * records widened schema / throws per the policy above.
    */
  def conform(batch: DataFrame, target: StructType, store: StateStore,
      stream: String): DataFrame = {
    val observed = batch.schema
    val byName = observed.fields.map(f => f.name -> f).toMap
    // incompatible: same-name column with different type
    target.fields.foreach { tf =>
      byName.get(tf.name).foreach { of =>
        if (of.dataType != tf.dataType) {
          val widened = StructType(observed.fields)
          recordSchema(store, stream, widened)
          throw new SchemaChangedException(widened,
            s"column ${tf.name}: ${of.dataType} != ${tf.dataType}; restart with recorded schema")
        }
      }
    }
    // incompatible: a non-nullable target column absent from the batch
    // means an upstream column DROP — null-filling it would be silent
    // data loss; stop the query per the documented restart protocol.
    val droppedNonNull = target.fields.filter(tf => !byName.contains(tf.name) && !tf.nullable)
    if (droppedNonNull.nonEmpty) {
      recordSchema(store, stream, observed)
      throw new SchemaChangedException(observed,
        s"non-nullable column(s) dropped upstream: ${droppedNonNull.map(_.name).mkString(", ")}; " +
          "restart with recorded schema")
    }
    val extra = observed.fields.filterNot(f => target.fieldNames.contains(f.name))
    if (extra.nonEmpty) {
      // additive: widen the recorded schema for the next restart. New
      // columns are recorded NULLABLE — batches predating the widening
      // legitimately lack them (only a column present as non-nullable
      // in the target and then dropped is data loss, handled above).
      recordSchema(store, stream, StructType(target.fields ++ extra.map(_.copy(nullable = true))))
    }
    // conform: target columns in order, null-fill what the batch lacks
    batch.select(target.fields.map { tf =>
      if (byName.contains(tf.name)) col(tf.name)
      else lit(null).cast(tf.dataType).as(tf.name)
    }.toSeq: _*)
  }
}
