package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The JSON-intermediate schema language → Spark StructType, covering
  * the full type matrix of the reference's JsonElementConversionFactory
  * (gobblin-core/.../converter/avro/JsonElementConversionFactory.java:66-84):
  * DATE, TIMESTAMP, TIME, FIXED, STRING, BYTES, INT, LONG, FLOAT,
  * DOUBLE, BOOLEAN, ARRAY, MAP, ENUM, RECORD, NULL, UNION — nested
  * arbitrarily.
  *
  * Mapping decisions (SURVEY.md §1.2):
  *  - ENUM → StringType; FIXED/BYTES → BinaryType; TIME → TimestampType
  *  - UNION[T, null] → nullable T
  *  - general UNION → tagged struct {tag: string, <branch>: T, ...}
  *    (Spark has no native union type)
  *  - recursive RECORDs are rejected with an error — StructType cannot
  *    represent recursion; the reference itself ships a recursion
  *    eliminator (AvroRecursionEliminatingConverter.java:42) that must
  *    run on ingest. [[eliminateRecursion]] is that eliminator: it
  *    prunes the recursive reference at the configured depth.
  *
  * Schema syntax here is a minimal JSON-ish descriptor tree:
  *   Field(name, Type) where Type is one of the SchemaType cases.
  */
object JsonSchema {

  sealed trait SType
  case object SDate extends SType
  case object STimestamp extends SType
  case object STime extends SType
  case object SFixed extends SType
  case object SString extends SType
  case object SBytes extends SType
  case object SInt extends SType
  case object SLong extends SType
  case object SFloat extends SType
  case object SDouble extends SType
  case object SBoolean extends SType
  case object SNull extends SType
  case object SEnum extends SType
  /** Avro logical decimal (bytes + precision/scale) — the reference
    * passes these through opaquely (SURVEY §1.2); Spark has an exact
    * DecimalType, so money columns stay money.
    */
  final case class SDecimal(precision: Int, scale: Int) extends SType
  final case class SArray(items: SType) extends SType
  final case class SMap(values: SType) extends SType
  final case class SRecord(name: String, fields: Seq[(String, SType)]) extends SType
  final case class SUnion(branches: Seq[SType]) extends SType

  def toSpark(t: SType): DataType = toSpark(t, Set.empty)

  private def toSpark(t: SType, seen: Set[String]): DataType = t match {
    case SDate => DateType
    case STimestamp | STime => TimestampType
    case SFixed | SBytes => BinaryType
    case SString | SEnum => StringType
    case SInt => IntegerType
    case SLong => LongType
    case SFloat => FloatType
    case SDouble => DoubleType
    case SBoolean => BooleanType
    case SDecimal(p, sc) => DecimalType(p, sc)
    case SNull => NullType
    case SArray(items) => ArrayType(toSpark(items, seen))
    case SMap(values) => MapType(StringType, toSpark(values, seen))
    case SRecord(name, fields) =>
      if (seen.contains(name))
        throw new IllegalArgumentException(
          s"recursive record '$name' cannot map to StructType; run eliminateRecursion first")
      StructType(fields.map { case (fn, ft) =>
        StructField(fn, toSpark(ft, seen + name), nullable = isNullable(ft))
      })
    case SUnion(branches) =>
      val nonNull = branches.filter(_ != SNull)
      if (nonNull.size == 1) toSpark(nonNull.head, seen) // [T, null] -> nullable T
      else StructType(
        StructField("tag", StringType, nullable = false) +:
          nonNull.zipWithIndex.map { case (b, i) =>
            StructField(s"u$i", toSpark(b, seen), nullable = true)
          })
  }

  private def isNullable(t: SType): Boolean = t match {
    case SUnion(branches) => branches.contains(SNull)
    case SNull => true
    case _ => false
  }

  /** The mandatory ingest-time recursion eliminator: any record
    * re-referencing an ancestor record name is replaced by SNull
    * (dropping the recursive subtree, the reference's behavior).
    */
  def eliminateRecursion(t: SType): SType = eliminate(t, Set.empty)

  private def eliminate(t: SType, seen: Set[String]): SType = t match {
    case SRecord(name, _) if seen.contains(name) => SNull
    case SRecord(name, fields) =>
      SRecord(name, fields.map { case (fn, ft) => fn -> eliminate(ft, seen + name) })
    case SArray(items) => SArray(eliminate(items, seen))
    case SMap(values) => SMap(eliminate(values, seen))
    case SUnion(branches) => SUnion(branches.map(eliminate(_, seen)))
    case other => other
  }

  /** Parse-ready schema: eliminate recursion, then REMOVE the pruned
    * (now-SNull) fields entirely — matching the reference converter,
    * which drops the recursive field from the output schema
    * (AvroRecursionEliminatingConverter.java:42). Removal (not a
    * NullType placeholder) matters for JSON parsing: a NullType field
    * in a `from_json` schema desyncs Jackson's token stream on a
    * non-null payload, leaking nested values into sibling fields.
    */
  def toParseStruct(t: SType): StructType = {
    def dropNull(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.flatMap(f => dropNull(f.dataType) match {
        case NullType => None
        case d => Some(f.copy(dataType = d))
      }))
      case ArrayType(et, n) => ArrayType(dropNull(et), n)
      case MapType(k, v, n) => MapType(k, dropNull(v), n)
      case other => other
    }
    dropNull(toSpark(eliminateRecursion(t))) match {
      case st: StructType => st
      case other =>
        throw new IllegalArgumentException(s"top-level schema must be a record, got $other")
    }
  }

  /** Timestamp/date parsing with the reference's configured-format
    * semantics (JsonElementConversionFactory.java:107 —
    * CONVERTER_AVRO_DATE_FORMAT, default "yyyy-MM-dd HH:mm:ss", UTC).
    */
  val DefaultDateFormat = "yyyy-MM-dd HH:mm:ss"

  def parseTimestamp(c: Column, fmt: String = DefaultDateFormat): Column =
    to_timestamp(c, fmt)

  def parseDate(c: Column, fmt: String = "yyyy-MM-dd"): Column = to_date(c, fmt)
}
