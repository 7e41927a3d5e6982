package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.Schema.Type
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Avro container files end-to-end — the reference's dominant on-disk
  * format (gobblin-core/.../writer/AvroHdfsDataWriter.java:51 writes
  * DataFileWriter blocks; BytesToAvroConverter and the envelope
  * decoders read datum-encoded payloads).
  *
  * Built directly on avro-core (present in the Spark jars); the
  * spark-avro CONNECTOR is not on this classpath and the build is
  * zero-egress, so `from_avro`/`to_avro` are unavailable — this module
  * supplies the same surface: schema translation both ways, a
  * distributed container-file reader/writer, and a binary-datum decode
  * for envelope payloads. Parallelism is per-file (the reference's
  * writers produce bounded-size files; split-by-block would need the
  * connector's sync-marker seek).
  */
object AvroFiles {

  // ---------------------------------------------------------- schema ---

  /** Avro schema → Spark type. ENUM/FIXED and logical date/timestamp
    * map exactly like the JSON-intermediate matrix (JsonSchema.toSpark).
    */
  def sparkType(s: Schema): DataType = s.getType match {
    case Type.BOOLEAN => BooleanType
    case Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] ||
        s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis]) TimestampType
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] ||
        s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMillis]) TimestampNTZType
      else LongType
    case Type.FLOAT => FloatType
    case Type.DOUBLE => DoubleType
    case Type.STRING | Type.ENUM => StringType
    case Type.BYTES | Type.FIXED => s.getLogicalType match {
      // Avro logical decimal (bytes/fixed + precision/scale) maps to
      // DecimalType — money columns from JDBC ingest stay exact
      // instead of passing through as opaque binary
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Type.NULL => NullType
    case Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), sparkType(f.schema()), nullable = isNullable(f.schema()))))
    case Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Type.NULL)
      require(nonNull.size == 1,
        s"general unions need the tagged-struct converter (JsonSchema.SUnion): $s")
      sparkType(nonNull.head)
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Type.NULL ||
      (s.getType == Type.UNION && s.getTypes.asScala.exists(_.getType == Type.NULL))

  /** Spark schema → Avro record schema (nullable fields become
    * [null, T] unions — AvroHdfsDataWriter's field shape).
    */
  def avroSchema(st: StructType, name: String = "record", namespace: String = "graft"): Schema =
    avroType(st, name, namespace, nullable = false)

  private def avroType(dt: DataType, name: String, ns: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Type.INT)
      case DateType => LogicalTypes.date().addToSchema(Schema.create(Type.INT))
      case LongType => Schema.create(Type.LONG)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Type.LONG))
      case FloatType => Schema.create(Type.FLOAT)
      case DoubleType => Schema.create(Type.DOUBLE)
      case StringType => Schema.create(Type.STRING)
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Type.BYTES))
      case BinaryType => Schema.create(Type.BYTES)
      case NullType => Schema.create(Type.NULL)
      case ArrayType(et, containsNull) =>
        Schema.createArray(avroType(et, s"${name}_item", ns, containsNull))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(avroType(vt, s"${name}_value", ns, valueContainsNull))
      case s: StructType =>
        val rec = Schema.createRecord(name, null, ns, false)
        rec.setFields(s.fields.map(f =>
          new Schema.Field(f.name, avroType(f.dataType, s"${name}_${f.name}", ns, f.nullable),
            null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)).toList.asJava)
        rec
      case other => throw new IllegalArgumentException(s"unsupported Avro mapping: $other")
    }
    if (nullable && base.getType != Type.NULL)
      Schema.createUnion(Schema.create(Type.NULL), base)
    else base
  }

  // ------------------------------------------------------ conversion ---

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Type.UNION) s.getTypes.asScala.find(_.getType != Type.NULL).getOrElse(s)
    else s

  /** Avro datum → Spark external row value. */
  def toRowValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = nonNullBranch(s)
    sch.getType match {
      case Type.STRING | Type.ENUM => v.toString
      case (Type.BYTES | Type.FIXED)
        if sch.getLogicalType.isInstanceOf[LogicalTypes.Decimal] =>
        // unscaled two's-complement big-endian bytes, per the spec
        val scale = sch.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale
        val bytes = v match {
          case b: ByteBuffer =>
            val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
          case f: GenericData.Fixed => f.bytes().clone()
          case a: Array[Byte] => a
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
      case Type.BYTES => v match {
        case b: ByteBuffer =>
          val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
        case a: Array[Byte] => a
      }
      case Type.FIXED => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Type.INT if sch.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(v.asInstanceOf[Long], 1000000L),
          Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L))
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        new java.sql.Timestamp(v.asInstanceOf[Long])
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        // NTZ external type is LocalDateTime; micros carry naive wall-clock
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.asInstanceOf[Long], 1000000L),
          (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMillis] =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.asInstanceOf[Long], 1000L),
          (Math.floorMod(v.asInstanceOf[Long], 1000L) * 1000000L).toInt,
          java.time.ZoneOffset.UTC)
      case Type.ARRAY =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq
          .map(toRowValue(_, sch.getElementType))
      case Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> toRowValue(mv, sch.getValueType)
        }.toMap
      case Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(sch.getFields.asScala.toSeq.map(f =>
          toRowValue(rec.get(f.pos()), f.schema())))
      case _ => v // boolean / int / long / float / double pass through
    }
  }

  /** Spark external row value → Avro datum. */
  def toAvroValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = nonNullBranch(s)
    sch.getType match {
      case Type.BYTES
        if sch.getLogicalType.isInstanceOf[LogicalTypes.Decimal] =>
        val scale = sch.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Type.INT if sch.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        val i = v.asInstanceOf[java.sql.Timestamp].toInstant
        Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
      case Type.LONG if sch.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        Math.addExact(Math.multiplyExact(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), ldt.getNano / 1000L)
      case Type.ARRAY => // runtime shape is collection.Seq (ArraySeq from Spark rows)
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvroValue(_, sch.getElementType))
          .toSeq.asJava
      case Type.MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map {
          case (k, mv) => k -> toAvroValue(mv, sch.getValueType)
        }.toMap.asJava
      case Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(sch)
        sch.getFields.asScala.foreach(f =>
          rec.put(f.pos(), toAvroValue(row.get(f.pos()), f.schema())))
        rec
      case _ => v
    }
  }

  // -------------------------------------------------------- read/write ---

  /** Read a directory (or single file) of Avro container files. The
    * READER schema comes from the NEWEST file's header (by mtime;
    * driver-side, bytes of one header only) — a directory whose latest
    * writes added a field keeps that field, where first-file selection
    * silently dropped it. Older files resolve against it through
    * Avro's standard schema resolution (each DataFileStream hands its
    * own writer schema to the reader), so added fields need defaults —
    * the usual Avro evolution contract. Record decoding runs on
    * executors, one task per file batch.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, path, readerSchemaJson = None)

  /** Read with an explicit READER schema: every file's writer schema
    * is resolved against it per the Avro spec (missing fields fill
    * their defaults, int→long / float→double promotions apply, extra
    * writer fields are skipped) — so a directory holding files from
    * two schema epochs comes back as ONE frame under the new schema,
    * the reference's schema-evolution contract
    * (gobblin-core/.../converter/avro/AvroSchemaFieldRemover and the
    * AvroHdfsDataWriter's reader-schema resolution). `None` keeps the
    * newest file's schema as the reader schema (files written by an
    * OLDER version resolve forward to it).
    */
  def read(spark: SparkSession, path: String,
      readerSchemaJson: Option[String]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
    require(statuses.nonEmpty, s"no .avro files under $path")
    val files = statuses.map(_.getPath.toString).sorted
    val newest = statuses.maxBy(s => (s.getModificationTime, s.getPath.toString)).getPath
    val schemaJson = readerSchemaJson.getOrElse {
      val in = fs.open(newest)
      try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema.toString
      finally in.close()
    }
    val sparkSchema = sparkType(new Schema.Parser().parse(schemaJson)).asInstanceOf[StructType]
    val serConf = new SerializableConfiguration(conf)
    val rows = spark.sparkContext.parallelize(files, math.min(files.size,
        spark.sparkContext.defaultParallelism)).mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.flatMap { file =>
        val fp = new Path(file)
        val in = fp.getFileSystem(serConf.value).open(fp)
        val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = stream.hasNext; if (!h) { stream.close() }; h }
          def next(): Row = toRowValue(stream.next(), schema).asInstanceOf[Row]
        }
      }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Write the frame as Avro container files, one part file per Spark
    * partition (AvroHdfsDataWriter shape: staging-friendly part names,
    * deflate block compression).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val serConf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).mkdirs(dir)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = new Path(path, f"part-${TaskContext.getPartitionId()}%05d.avro")
        val out = part.getFileSystem(serConf.value).create(part, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          .setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
          .create(schema, out)
        try it.foreach(r => w.append(toAvroValue(r, schema).asInstanceOf[GenericRecord]))
        finally w.close()
      }
    }
  }

  /** Decode binary-datum payloads (the schema-registry envelope body —
    * BytesToAvroConverter semantics) into a typed frame. The writer
    * schema is the registry-resolved schema text.
    */
  def decodeDatums(spark: SparkSession, payloads: DataFrame, bytesCol: String,
      writerSchemaJson: String): DataFrame =
    payloads
      .select(AvroDatumDecode(org.apache.spark.sql.functions.col(bytesCol),
        writerSchemaJson).as("_r"))
      .select("_r.*")
}

/** Binary Avro datum -> Spark struct as a Catalyst expression — the
  * `from_avro` equivalent for this connector-less classpath, same
  * design as spark-avro's AvroDataToCatalyst (an eval-mode
  * UnaryExpression with CodegenFallback: datum decoding is inherently
  * object work; the surrounding projection stays codegen'd). Reader
  * and converter are per-task lazies; the BinaryDecoder is reused
  * across rows.
  */
case class AvroDatumDecode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    schemaJson: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](avroSchema)
  @transient private lazy val toCatalyst =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dataType)
  @transient private var decoder: org.apache.avro.io.BinaryDecoder = _

  override def dataType: DataType = AvroFiles.sparkType(new Schema.Parser().parse(schemaJson))
  override def prettyName: String = "avro_datum_decode"

  override protected def nullSafeEval(input: Any): Any = {
    decoder = DecoderFactory.get().binaryDecoder(input.asInstanceOf[Array[Byte]], decoder)
    toCatalyst(AvroFiles.toRowValue(reader.read(null, decoder), avroSchema))
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): AvroDatumDecode =
    copy(child = newChild)
}

object AvroDatumDecode {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(bytes: org.apache.spark.sql.Column, schemaJson: String): org.apache.spark.sql.Column =
    ColumnShim.toColumn(AvroDatumDecode(ColumnShim.toExpression(bytes), schemaJson))
}

/** Spark struct -> binary Avro datum — the `to_avro` /
  * AvroToBytesConverter direction (gobblin-core/.../converter/avro/
  * AvroToBytesConverter.java), same CodegenFallback design as
  * [[AvroDatumDecode]]. The writer schema is derived from the child's
  * struct type unless an explicit schema JSON is given.
  */
case class AvroDatumEncode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    schemaJsonOpt: Option[String])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private def schemaJson: String = schemaJsonOpt.getOrElse(
    AvroFiles.avroSchema(child.dataType.asInstanceOf[StructType]).toString)

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](avroSchema)
  @transient private lazy val toScala =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter(child.dataType)
  @transient private var encoder: org.apache.avro.io.BinaryEncoder = _

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_datum_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val row = toScala(input)
    val datum = AvroFiles.toAvroValue(row, avroSchema).asInstanceOf[GenericRecord]
    val bos = new java.io.ByteArrayOutputStream()
    encoder = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, encoder)
    writer.write(datum, encoder)
    encoder.flush()
    bos.toByteArray
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): AvroDatumEncode =
    copy(child = newChild)
}

object AvroDatumEncode {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(struct: org.apache.spark.sql.Column, schemaJson: Option[String] = None): org.apache.spark.sql.Column =
    ColumnShim.toColumn(AvroDatumEncode(ColumnShim.toExpression(struct), schemaJson))
}
