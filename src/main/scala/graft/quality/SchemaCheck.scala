package graft.quality

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.types._

import graft.functions.JsonSchema._

/** Schema parity checking — the reference's copy-time schema guard
  * (gobblin-data-management/.../util/schema_check/
  * AvroSchemaCheckDefaultStrategy.java:34-105,
  * SchemaCheckedCopySource.java): a dataset file whose schema does not
  * structurally match the expected schema must not be copied/published.
  *
  * Parity = structural equality modulo docs, field order, and
  * nullability: record names and field SETS match (same size, each
  * expected field present by name with parity type), arrays/maps
  * recurse, unions match branch-for-branch as a multiset, primitives
  * match exactly (no promotions — parity is a COPY guard, not an
  * evolution rule; evolution lives in streaming.SchemaEvolution).
  */
object SchemaCheck {

  /** Parity over the JSON-intermediate schema model (the Avro-shaped
    * SType tree).
    */
  def parity(expected: SType, toValidate: SType): Boolean =
    (expected, toValidate) match {
      case (SRecord(en, efs), SRecord(tn, tfs)) =>
        en == tn && efs.size == tfs.size && {
          val tm = tfs.toMap
          efs.forall { case (n, t) => tm.get(n).exists(tv => parity(t, tv)) }
        }
      case (SArray(e), SArray(t)) => parity(e, t)
      case (SMap(e), SMap(t)) => parity(e, t)
      case (SUnion(es), SUnion(ts)) =>
        es.size == ts.size && {
          val remaining = scala.collection.mutable.ArrayBuffer(es: _*)
          ts.forall { t =>
            val i = remaining.indexWhere(e => parity(e, t))
            if (i < 0) false
            else { remaining.remove(i); true }
          }
        }
      case (e, t) => e == t
    }

  /** Parity over Spark StructTypes (StructType has no record name;
    * everything else follows the same rules — by-name field match,
    * equal sizes, nullability and metadata ignored).
    */
  def parity(expected: StructType, toValidate: StructType): Boolean =
    parityType(expected, toValidate)

  private def parityType(e: DataType, t: DataType): Boolean = (e, t) match {
    case (es: StructType, ts: StructType) =>
      es.fields.length == ts.fields.length && {
        val tm = ts.fields.map(f => f.name -> f.dataType).toMap
        es.fields.forall(f => tm.get(f.name).exists(parityType(f.dataType, _)))
      }
    case (ea: ArrayType, ta: ArrayType) =>
      parityType(ea.elementType, ta.elementType)
    case (em: MapType, tm: MapType) =>
      parityType(em.keyType, tm.keyType) && parityType(em.valueType, tm.valueType)
    case _ => e == t
  }

  final case class FileCheck(file: String, ok: Boolean, schema: String)

  /** Check every parquet file in a directory against the expected
    * StructType — the SchemaCheckedCopySource veto, Spark-first: the
    * file list is driver metadata, the footer schema reads run
    * EXECUTOR-side (no data scan, no driver I/O loop), and the result
    * is a per-file verdict the copy/publish planner can veto on.
    */
  def checkParquetTree(spark: SparkSession, dir: String,
      expected: StructType): Seq[FileCheck] = {
    // session conf merged in: the footer->StructType converter reads
    // SQL conf keys (binaryAsString, nanosAsLong, ...) from it
    val conf = org.apache.spark.sql.graftshim.ColumnShim.sessionHadoopConf(spark)
    graft.sources.ParquetFooters.scan(spark, dir, conf) { (reader, c) =>
      new ParquetToSparkSchemaConverter(c)
        .convert(reader.getFooter.getFileMetaData.getSchema)
    }.map { case (file, struct) =>
      FileCheck(file, parity(expected, struct), struct.simpleString)
    }
  }

  /** Aggregated verdict for a whole (possibly million-file) tree:
    * (files checked, files failing, up to `maxExamples` failing
    * relative paths). Parity evaluates executor-side and only the
    * bounded summary reaches the driver — the scale variant of
    * [[checkParquetTree]] for trees where a per-file Seq would not
    * fit driver memory.
    */
  final case class TreeCheck(nFiles: Long, nBad: Long, badExamples: Seq[String])

  def checkParquetTreeSummary(spark: SparkSession, dir: String,
      expected: StructType, maxExamples: Int = 10): TreeCheck = {
    val conf = org.apache.spark.sql.graftshim.ColumnShim.sessionHadoopConf(spark)
    graft.sources.ParquetFooters.scanAggregate(spark, dir, conf) { (reader, c) =>
      parity(expected,
        new ParquetToSparkSchemaConverter(c)
          .convert(reader.getFooter.getFileMetaData.getSchema))
    }(TreeCheck(0L, 0L, Nil))(
      (acc, fileOk) => fileOk match {
        case (rel, ok) => TreeCheck(
          acc.nFiles + 1,
          acc.nBad + (if (ok) 0 else 1),
          if (ok) acc.badExamples
          else (acc.badExamples :+ rel).take(maxExamples))
      },
      (a, b) => TreeCheck(a.nFiles + b.nFiles, a.nBad + b.nBad,
        (a.badExamples ++ b.badExamples).sorted.take(maxExamples)))
  }
}
