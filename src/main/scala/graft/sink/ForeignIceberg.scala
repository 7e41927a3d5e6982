package graft.sink

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A deliberately INDEPENDENT, minimal Apache Iceberg v2 table writer
  * used only by gates and specs to synthesize the metadata shapes that
  * OTHER engines produce — so [[IcebergMeta.read]] is exercised against
  * layouts the native mirror never writes: identity specs on
  * `date`/`timestamptz` sources, `bucket[N]`/`truncate[W]` transforms,
  * unpartitioned specs, non-zero spec/schema ids, multi-element
  * `schemas` arrays, snapshots without a `schema-id`, all three
  * `file_path` scheme forms, manifests that omit every OPTIONAL
  * `data_file` field (no stats, no equality_ids), and — via
  * [[writeHistory]] — schema-EVOLUTION histories: renames, name
  * swaps, drop+re-add, int→long/float→double promotions, and
  * equality-delete files keyed under pre-rename names, each with or
  * without parquet footer field ids and per-snapshot schema-ids.
  * Everything written
  * here follows the published Apache Iceberg Table Spec v2 (field
  * names, field-ids, single-value bound serialization: numbers
  * little-endian, date = LE int epoch days, timestamptz = LE long
  * micros, strings UTF-8) but shares NO code with [[IcebergMeta]] —
  * reader bugs can't be masked by a common serializer. Reference
  * surface: gobblin-iceberg/.../writer/IcebergMetadataWriter.java
  * writes these artifacts through the Iceberg library; here the point
  * is the shapes that library (driven by engines other than ours)
  * legitimately emits.
  *
  * Fixture-scale by design: one parquet file per partition value, the
  * distinct-value collect is gate-bounded (≤ dozens of partitions).
  */
object ForeignIceberg {

  private val M = new ObjectMapper()

  /** Knobs for the foreign shapes under test. `transform` is the
    * spec's transform string verbatim ("identity", "bucket[4]",
    * "truncate[3]", or "" for an unpartitioned spec). `pathForm`
    * renders each data file's manifest `file_path`: "plain" = /p,
    * "file" = file:/p, "file3" = file:///p. `historicalSchema`
    * prepends a narrower schema-id-(n-1) entry so `schemas` is
    * multi-element; `snapshotSchemaId` = false omits the snapshot's
    * optional `schema-id` (an older writer), forcing the
    * current-schema-id fallback.
    */
  final case class Shape(
      transform: String = "identity",
      specId: Int = 0,
      schemaId: Int = 0,
      pathForm: String = "plain",
      historicalSchema: Boolean = false,
      snapshotSchemaId: Boolean = true,
      rangeSummary: Boolean = false,
      // metadata schema names that DIFFER from the data files'
      // parquet columns (the imported-table-renamed shape); a
      // name-mapping property declares both names per field id, so a
      // reader must rename-resolve AND partition-prune together
      metaNames: Map[String, String] = Map.empty)

  private def iceType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case other => throw new IllegalArgumentException(
      s"foreign fixture: unmapped type $other")
  }

  /** Iceberg single-value serialization of a partition value. */
  private def boundBytes(dt: DataType, v: Any): Array[Byte] = {
    def le4(i: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le8(l: Long) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    (dt, v) match {
      case (DateType, d: java.sql.Date) => le4(d.toLocalDate.toEpochDay.toInt)
      case (DateType, d: java.time.LocalDate) => le4(d.toEpochDay.toInt)
      case (TimestampType, t: java.sql.Timestamp) =>
        le8(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
      case (TimestampType, t: java.time.Instant) =>
        le8(t.getEpochSecond * 1000000L + t.getNano / 1000L)
      case (LongType, l: Long) => le8(l)
      case (IntegerType, i: Int) => le4(i)
      case (StringType, s: String) => s.getBytes(StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(
        s"foreign fixture: unserializable partition value $other")
    }
  }

  /** Avro type of the partition field inside the manifest's
    * `partition` record (dates are int days, timestamps long micros
    * per the spec's Avro mapping).
    */
  private def partAvro(transform: String, dt: DataType): String =
    if (transform.startsWith("bucket")) "int"
    else if (transform.startsWith("truncate")) "string"
    else dt match {
      case LongType | TimestampType | TimestampNTZType => "long"
      case IntegerType | DateType => "int"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"foreign fixture: no partition Avro mapping for $other")
    }

  /** The partition value as stored in the manifest's partition record
    * and summarized in the manifest list: the TRANSFORMED value.
    * Bucket ids here are NOT Iceberg's murmur3 bucketing — they don't
    * need to be: a conservative reader must never prune on a bucket
    * spec at all, which is exactly what the fixtures prove.
    */
  private def transformed(transform: String, dt: DataType, v: Any)
      : (Array[Byte], Any) = {
    if (transform.startsWith("bucket")) {
      val n = transform.stripPrefix("bucket[").stripSuffix("]").toInt
      val b = math.floorMod(v.hashCode(), n)
      (boundBytes(IntegerType, b), b)
    } else if (transform.startsWith("truncate")) {
      val w = transform.stripPrefix("truncate[").stripSuffix("]").toInt
      val t = v.toString.take(w)
      (boundBytes(StringType, t), t)
    } else {
      val avroVal: Any = (dt, v) match {
        case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
        case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
        case (TimestampType, t: java.sql.Timestamp) =>
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        case (TimestampType, t: java.time.Instant) =>
          t.getEpochSecond * 1000000L + t.getNano / 1000L
        case (_, x) => x
      }
      (boundBytes(dt, v), avroVal)
    }
  }

  private def renderPath(form: String, p: String): String = form match {
    case "plain" => p
    case "file" => s"file:$p"
    case "file3" => s"file://$p"
    case other => throw new IllegalArgumentException(s"pathForm $other")
  }

  /** Minimal manifest_entry: ONLY the spec's required data_file fields
    * — no stats maps, no sort_order_id, and equality_ids ONLY when the
    * manifest carries equality deletes. A reader that assumes the
    * optional fields exist breaks on real foreign files.
    */
  private def entrySchema(partField: Option[(String, String, Int)],
      withEqIds: Boolean = false): Schema = {
    val pf = partField.map { case (name, typ, fid) =>
      s"""{"name":"$name","type":["null","$typ"],"default":null,"field-id":$fid}"""
    }.getOrElse("")
    val eq = if (!withEqIds) ""
      else """,{"name":"equality_ids","field-id":135,"default":null,
             |"type":["null",{"type":"array","element-id":136,"items":"int"}]}"""
        .stripMargin.replace("\n", "")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$pf]}},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}$eq
         |]}}]}""".stripMargin.replace("\n", ""))
  }

  /** manifest_file without `contains_nan` (a pre-NaN-summary writer)
    * and without key_metadata — spec-required fields only.
    */
  private val listSchema: Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_file","fields":[
       |{"name":"manifest_path","type":"string","field-id":500},
       |{"name":"manifest_length","type":"long","field-id":501},
       |{"name":"partition_spec_id","type":"int","field-id":502},
       |{"name":"content","type":"int","field-id":517},
       |{"name":"sequence_number","type":"long","field-id":515},
       |{"name":"min_sequence_number","type":"long","field-id":516},
       |{"name":"added_snapshot_id","type":"long","field-id":503},
       |{"name":"added_files_count","type":"int","field-id":504},
       |{"name":"existing_files_count","type":"int","field-id":505},
       |{"name":"deleted_files_count","type":"int","field-id":506},
       |{"name":"added_rows_count","type":"long","field-id":512},
       |{"name":"existing_rows_count","type":"long","field-id":513},
       |{"name":"deleted_rows_count","type":"long","field-id":514},
       |{"name":"partitions","field-id":507,"default":null,"type":["null",
       |{"type":"array","element-id":508,"items":{"type":"record","name":"r508","fields":[
       |{"name":"contains_null","type":"boolean","field-id":509},
       |{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
       |{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
       |]}}]}]}""".stripMargin.replace("\n", ""))

  /** Write `df` at `root` as a complete foreign-shaped Iceberg v2
    * table: one parquet data file per distinct `partCol` value (or one
    * file total when unpartitioned), one manifest per file, one
    * manifest list, one metadata.json + version-hint. Rows within each
    * data file sort by all columns so positions are deterministic —
    * what `posDeletes` addresses: `(file ordinal in partition-value
    * order, row position)` pairs become a POSITION-delete file +
    * manifest, and `eqDeletes` `(rows, key column names)` an
    * EQUALITY-delete file + manifest, both riding sequence number 2
    * under a second snapshot exactly the way a foreign engine's
    * MERGE/DELETE lands next to older data manifests in one manifest
    * list. Returns the table root (= `root`).
    */
  /** Exact row count from a just-written parquet footer — driver
    * metadata IO instead of a whole count() Spark job per file.
    */
  private def footerRowCount(conf: org.apache.hadoop.conf.Configuration,
      p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  def write(spark: SparkSession, root: String, df: DataFrame,
      partCol: Option[String], shape: Shape = Shape(),
      posDeletes: Seq[(Int, Long)] = Nil,
      eqDeletes: Option[(DataFrame, Seq[String])] = None): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val metaDir = new Path(s"$root/metadata")
    fs.mkdirs(metaDir)
    val hasDeletes = posDeletes.nonEmpty || eqDeletes.nonEmpty

    // ---- data files: one parquet per partition value (gate-bounded).
    //      Row counts come from the just-written footer (driver
    //      metadata IO) — a per-file count() job doubled the fixture's
    //      Spark-job count for a number the footer already holds.
    def onePartFile(d: DataFrame, dir: String): (String, Long, Long) = {
      d.coalesce(1)
        .sortWithinPartitions(d.columns.map(col).toSeq: _*)
        .write.mode("overwrite").parquet(dir)
      val part = fs.listStatus(new Path(dir))
        .filter(st => st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one part file under $dir")
      (part.head.getPath.toUri.getPath, part.head.getLen,
        footerRowCount(conf, part.head.getPath))
    }
    // (bound bytes, avro partition value, path, length, rows) per file
    val files: Seq[(Option[(Array[Byte], Any)], String, Long, Long)] =
      partCol match {
        case None =>
          val (p, len, n) = onePartFile(df, s"$root/data/all")
          Seq((None, p, len, n))
        case Some(pc) =>
          val dt = df.schema(pc).dataType
          val vals = df.select(col(pc)).distinct().collect().map(_.get(0))
            .sortBy(_.toString)
          if (vals.isEmpty) Seq.empty // repartition(0) below would throw
          else {
          // ONE write job for every partition value: route each value
          // to its ordinal via an exact when-chain (no dir-name value
          // escaping to decode back), one task per value so each dir
          // holds exactly one sorted file — previously a write + count
          // job pair PER VALUE re-ran over the base for each of them
          val ord = vals.zipWithIndex.foldLeft(lit(-1)) { case (acc, (v, i)) =>
            when(col(pc) === lit(v), lit(i)).otherwise(acc) }
          // sort leads with _p so the dynamic-partition writer's
          // required ordering is already satisfied (no extra sort
          // inserted that could disturb the within-value row order);
          // _p is constant within a value, so per-file order stays
          // exactly "sorted by all original columns"
          df.withColumn("_p", ord)
            .repartition(vals.length, col("_p"))
            .sortWithinPartitions((col("_p") +: df.columns.map(col)).toSeq: _*)
            .write.mode("overwrite").partitionBy("_p")
            .parquet(s"$root/data/byval")
          vals.zipWithIndex.toSeq.map { case (v, i) =>
            val dir = s"$root/data/byval/_p=$i"
            val part = fs.listStatus(new Path(dir))
              .filter(st => st.getPath.getName.startsWith("part-") &&
                st.getPath.getName.endsWith(".parquet"))
            require(part.length == 1, s"expected one part file under $dir")
            (Some(transformed(shape.transform, dt, v)),
              part.head.getPath.toUri.getPath, part.head.getLen,
              footerRowCount(conf, part.head.getPath))
          }
          }
      }

    // ---- one manifest per data file
    val partFieldId = 1000
    val specFieldName = partCol.map(pc =>
      if (shape.transform == "identity") pc else s"${pc}_${shape.transform
        .takeWhile(_ != '[')}").getOrElse("")
    val eSchema = entrySchema(partCol.map { pc =>
      (specFieldName, partAvro(shape.transform, df.schema(pc).dataType),
        partFieldId)
    }.filter(_ => shape.transform.nonEmpty))
    def writeManifest(mPath: Path, schema: Schema, content: Int,
        entries: Seq[(String, Long, Long, Option[Any])],
        eqIds: Option[Seq[Int]]): Long = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setMeta("format-version", "2")
      w.setMeta("content", if (content == 0) "data" else "deletes")
      w.create(schema, fs.create(mPath, true))
      try entries.foreach { case (filePath, rows, len, partVal) =>
        val r = new GenericData.Record(schema)
        r.put("status", 1) // ADDED
        r.put("snapshot_id", if (content == 0) 1L else 2L)
        val d = new GenericData.Record(
          schema.getField("data_file").schema())
        d.put("content", content)
        d.put("file_path", renderPath(shape.pathForm, filePath))
        d.put("file_format", "PARQUET")
        val pRec = new GenericData.Record(
          d.getSchema.getField("partition").schema())
        if (shape.transform.nonEmpty) partVal.foreach { av =>
          pRec.put(specFieldName, av match {
            case s: String => new org.apache.avro.util.Utf8(s)
            case x => x
          })
        }
        d.put("partition", pRec)
        d.put("record_count", rows)
        d.put("file_size_in_bytes", len)
        eqIds.foreach { ids =>
          val l = new java.util.ArrayList[Integer](ids.length)
          ids.foreach(i => l.add(Integer.valueOf(i)))
          d.put("equality_ids", l)
        }
        r.put("data_file", d)
        w.append(r)
      } finally w.close()
      fs.getFileStatus(mPath).getLen
    }

    // (path, len, summary lower, summary upper, rows) per manifest:
    // one single-file manifest per partition normally; under
    // rangeSummary ONE multi-entry manifest whose summary spans
    // [min, max] — lower != upper, the shape engines write when a
    // manifest covers several partitions (never prunable here)
    val manifests: Seq[(Path, Long, Option[Array[Byte]], Option[Array[Byte]], Long)] =
      if (shape.rangeSummary) {
        val mPath = new Path(metaDir, "foreign-m-range.avro")
        val mLen = writeManifest(mPath, eSchema, content = 0,
          files.map { case (pv, path, len, rows) =>
            (path, rows, len, pv.map(_._2)) }, eqIds = None)
        Seq((mPath, mLen, files.head._1.map(_._1), files.last._1.map(_._1),
          files.map(_._4).sum))
      } else files.zipWithIndex.map { case ((pv, path, len, rows), i) =>
        val mPath = new Path(metaDir, f"foreign-m$i%03d.avro")
        val mLen = writeManifest(mPath, eSchema, content = 0,
          Seq((path, rows, len, pv.map(_._2))), eqIds = None)
        (mPath, mLen, pv.map(_._1), pv.map(_._1), rows)
      }

    // ---- delete files (sequence 2, the foreign MERGE/DELETE shape):
    //      positions address (file ordinal, row pos); equality rows
    //      carry the key columns, ids resolved by schema position
    val delSchema = entrySchema(None, withEqIds = true)
    def oneDeleteFile(d: DataFrame, dir: String): (String, Long, Long) = {
      d.coalesce(1).write.mode("overwrite").parquet(dir)
      val part = fs.listStatus(new Path(dir))
        .filter(st => st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one part file under $dir")
      (part.head.getPath.toUri.getPath, part.head.getLen,
        footerRowCount(conf, part.head.getPath))
    }
    val posManifest = if (posDeletes.isEmpty) None else {
      import spark.implicits._
      val rows = posDeletes.map { case (ord, pos) =>
        require(ord >= 0 && ord < files.length,
          s"posDeletes ordinal $ord out of range (${files.length} files)")
        (renderPath(shape.pathForm, files(ord)._2), pos)
      }
      val (p, len, n) = oneDeleteFile(
        rows.toDF("file_path", "pos").sort(col("file_path"), col("pos")),
        s"$root/data/del_pos")
      val mPath = new Path(metaDir, "foreign-del-pos.avro")
      val mLen = writeManifest(mPath, delSchema, content = 1,
        Seq((p, n, len, None)), eqIds = None)
      Some((mPath, mLen))
    }
    val eqManifest = eqDeletes.map { case (rowsDf, keyCols) =>
      val ids = keyCols.map(c => df.schema.fieldIndex(c) + 1)
      val (p, len, n) = oneDeleteFile(
        rowsDf.select(keyCols.map(col): _*), s"$root/data/del_eq")
      val mPath = new Path(metaDir, "foreign-del-eq.avro")
      val mLen = writeManifest(mPath, delSchema, content = 2,
        Seq((p, n, len, None)), eqIds = Some(ids))
      (mPath, mLen, n)
    }

    // ---- manifest lists: snapshot 1 = data only; when deletes exist,
    //      snapshot 2's list carries the SAME data manifests (their
    //      original sequence number 1) plus the delete manifests at
    //      sequence 2 — exactly how a foreign engine's second commit
    //      lays out mixed-snapshot manifests in one list
    def writeList(listPath: Path, withDeletes: Boolean): Unit = {
      val lw = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
      lw.setMeta("format-version", "2")
      lw.create(listSchema, fs.create(listPath, true))
      def entry(mPath: Path, mLen: Long, content: Int, seqNum: Long,
          snapId: Long, rows: Long, boundLo: Option[Array[Byte]],
          boundHi: Option[Array[Byte]]): Unit = {
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", mPath.toString)
        r.put("manifest_length", mLen)
        r.put("partition_spec_id", shape.specId)
        r.put("content", content)
        r.put("sequence_number", seqNum)
        r.put("min_sequence_number", seqNum)
        r.put("added_snapshot_id", snapId)
        r.put("added_files_count", 1)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", rows)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        val sumSchema = listSchema.getField("partitions").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val summaries = (boundLo, boundHi) match {
          case (Some(lo), Some(hi)) =>
            val s = new GenericData.Record(sumSchema.getElementType)
            s.put("contains_null", false)
            s.put("lower_bound", java.nio.ByteBuffer.wrap(lo))
            s.put("upper_bound", java.nio.ByteBuffer.wrap(hi))
            java.util.List.of[GenericRecord](s)
          case _ => java.util.List.of[GenericRecord]()
        }
        r.put("partitions",
          new GenericData.Array[GenericRecord](sumSchema, summaries))
        lw.append(r)
      }
      try {
        manifests.foreach { case (mPath, mLen, lo, hi, rows) =>
          entry(mPath, mLen, content = 0, seqNum = 1L, snapId = 1L,
            rows, lo, hi)
        }
        if (withDeletes) {
          posManifest.foreach { case (mPath, mLen) =>
            entry(mPath, mLen, content = 1, seqNum = 2L, snapId = 2L,
              posDeletes.length.toLong, None, None)
          }
          eqManifest.foreach { case (mPath, mLen, n) =>
            entry(mPath, mLen, content = 1, seqNum = 2L, snapId = 2L,
              n, None, None)
          }
        }
      } finally lw.close()
    }
    val listPath = new Path(metaDir, "snap-1-foreign.avro")
    writeList(listPath, withDeletes = false)
    val listPath2 =
      if (!hasDeletes) listPath
      else {
        val p2 = new Path(metaDir, "snap-2-foreign.avro")
        writeList(p2, withDeletes = true)
        p2
      }

    // ---- metadata.json (v00001) + version-hint
    val rootNode = M.createObjectNode()
    rootNode.put("format-version", 2)
    rootNode.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(root.getBytes(StandardCharsets.UTF_8)).toString)
    rootNode.put("location", root)
    rootNode.put("last-sequence-number", if (hasDeletes) 2L else 1L)
    rootNode.put("last-updated-ms", System.currentTimeMillis())
    rootNode.put("last-column-id", df.schema.length)
    rootNode.put("current-schema-id", shape.schemaId)
    val schemas = rootNode.putArray("schemas")
    if (shape.historicalSchema) {
      // a narrower, older schema under a lower id — multi-element array
      val h = schemas.addObject()
      h.put("type", "struct"); h.put("schema-id", shape.schemaId - 1)
      val hf = h.putArray("fields")
      df.schema.fields.take(1).zipWithIndex.foreach { case (f, i) =>
        val n = hf.addObject()
        n.put("id", i + 1); n.put("name", f.name)
        n.put("required", false); n.put("type", iceType(f.dataType))
      }
    }
    val cur = schemas.addObject()
    cur.put("type", "struct"); cur.put("schema-id", shape.schemaId)
    val cf = cur.putArray("fields")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val n = cf.addObject()
      n.put("id", i + 1)
      n.put("name", shape.metaNames.getOrElse(f.name, f.name))
      n.put("required", false); n.put("type", iceType(f.dataType))
    }
    if (shape.metaNames.nonEmpty) {
      // declare BOTH names per renamed field — the spec's standard
      // mechanism for id-less data files under a renamed schema
      val arr = M.createArrayNode()
      df.schema.fields.zipWithIndex.foreach { case (f, i) =>
        val o = arr.addObject()
        o.put("field-id", i + 1)
        val na = o.putArray("names")
        na.add(shape.metaNames.getOrElse(f.name, f.name))
        if (shape.metaNames.contains(f.name)) na.add(f.name)
      }
      rootNode.putObject("properties")
        .put("schema.name-mapping.default", M.writeValueAsString(arr))
    }
    rootNode.put("default-spec-id", shape.specId)
    val specs = rootNode.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", shape.specId)
    val sf = spec.putArray("fields")
    if (shape.transform.nonEmpty) partCol.foreach { pc =>
      val f = sf.addObject()
      f.put("name", specFieldName)
      f.put("transform", shape.transform)
      f.put("source-id", df.schema.fieldIndex(pc) + 1)
      f.put("field-id", partFieldId)
    }
    rootNode.put("last-partition-id", partFieldId)
    rootNode.put("default-sort-order-id", 0)
    rootNode.set("sort-orders", M.readTree("""[{"order-id":0,"fields":[]}]"""))
    rootNode.put("current-snapshot-id", if (hasDeletes) 2L else 1L)
    val snaps = rootNode.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", 1L)
    snap.put("sequence-number", 1L)
    snap.put("timestamp-ms", System.currentTimeMillis())
    if (shape.snapshotSchemaId) snap.put("schema-id", shape.schemaId)
    snap.put("manifest-list", listPath.toString)
    snap.putObject("summary").put("operation", "append")
    if (hasDeletes) {
      val snap2 = snaps.addObject()
      snap2.put("snapshot-id", 2L)
      snap2.put("sequence-number", 2L)
      snap2.put("timestamp-ms", System.currentTimeMillis())
      if (shape.snapshotSchemaId) snap2.put("schema-id", shape.schemaId)
      snap2.put("manifest-list", listPath2.toString)
      snap2.putObject("summary").put("operation", "overwrite")
    }
    val out = fs.create(new Path(metaDir, "v00001.metadata.json"), true)
    out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(rootNode))
    out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    hint.write("1".getBytes(StandardCharsets.UTF_8))
    hint.close()
    root
  }

  /** One snapshot of a column-EVOLUTION history: `df`'s column names
    * and types are the schema AT THIS SNAPSHOT, `fieldIds` maps each
    * column to its stable Iceberg field id (a RENAME keeps the id and
    * changes the name between snapshots; a legal PROMOTION keeps both
    * and widens the type int→long / float→double), and
    * `parquetFieldIds` controls whether the data file's footer
    * records those ids (engines driving the Iceberg library do;
    * name-mapping tables don't).
    */
  final case class HistSnap(df: DataFrame, fieldIds: Map[String, Int],
      parquetFieldIds: Boolean = true,
      metaNames: Map[String, String] = Map.empty)

  /** Write an UNPARTITIONED foreign v2 table whose snapshots evolved
    * the schema — rename and/or type promotion — one data file +
    * manifest per snapshot, each manifest list accumulating all prior
    * manifests at their original sequence numbers, one `schemas`
    * entry per snapshot with per-snapshot `schema-id`s. This is the
    * fixture [[IcebergMeta.read]]'s per-file rename resolution is
    * gated against: pre-rename files carry the OLD column name (and
    * optionally parquet field ids), and a correct reader returns
    * their VALUES under the current name — never silent nulls.
    */
  /** Write one HistSnap's rows as a single parquet file under `dir`,
    * with parquet field ids in the footer iff the snap asks for them
    * (conf saved/restored around the write). Returns (path, bytes,
    * rows).
    */
  private def writeSnapParquet(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, sn: HistSnap, dir: String,
      sorted: Boolean): (String, Long, Long) = {
    sn.fieldIds.keys.foreach(c => require(
      sn.df.columns.contains(c), s"fieldIds names unknown column $c"))
    require(sn.df.columns.forall(sn.fieldIds.contains),
      "every column needs a field id")
    val tagged =
      if (!sn.parquetFieldIds) sn.df
      else sn.df.select(sn.df.schema.fields.map { f =>
        col(f.name).as(f.name, new MetadataBuilder()
          .putLong("parquet.field.id", sn.fieldIds(f.name).toLong)
          .build())
      }.toSeq: _*)
    val writeIdsKey = "spark.sql.parquet.fieldId.write.enabled"
    val prev = spark.conf.getOption(writeIdsKey)
    spark.conf.set(writeIdsKey, sn.parquetFieldIds.toString)
    try {
      val one = tagged.coalesce(1)
      (if (sorted) one.sortWithinPartitions(tagged.columns.map(col).toSeq: _*)
       else one).write.mode("overwrite").parquet(dir)
      val part = fs.listStatus(new Path(dir))
        .filter(st => st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one part file under $dir")
      (part.head.getPath.toUri.getPath, part.head.getLen,
        footerRowCount(spark.sparkContext.hadoopConfiguration,
          part.head.getPath))
    } finally prev match {
      case Some(v) => spark.conf.set(writeIdsKey, v)
      case None => spark.conf.unset(writeIdsKey)
    }
  }

  def writeHistory(spark: SparkSession, root: String,
      snaps: Seq[HistSnap],
      eqDelete: Seq[HistSnap] = Nil,
      snapshotSchemaIds: Boolean = true,
      nameMapping: Option[Seq[(Int, Seq[String])]] = None,
      compactManifests: Boolean = false,
      refs: Map[String, Long] = Map.empty): String = {
    require(snaps.nonEmpty, "writeHistory needs at least one snapshot")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val metaDir = new Path(s"$root/metadata")
    fs.mkdirs(metaDir)
    val eSchema = entrySchema(None)

    // ---- one data file + manifest per snapshot, under ITS schema
    val files: Seq[(String, Long, Long)] = snaps.zipWithIndex.map {
      case (sn, i) =>
        writeSnapParquet(spark, fs, sn, s"$root/data/s$i", sorted = true)
    }
    def writeDataManifest(mPath: Path,
        entries: Seq[(String, Long, Long, Long, Option[Long], Int)])
        : Long = {
      // entries: (path, bytes, rows, snapshotId, explicitSeq, status)
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](eSchema))
      w.setMeta("format-version", "2")
      w.setMeta("content", "data")
      w.create(eSchema, fs.create(mPath, true))
      try entries.foreach { case (path, len, rows, snapId, seq, status) =>
        val r = new GenericData.Record(eSchema)
        r.put("status", status)
        r.put("snapshot_id", snapId)
        seq.foreach(s => r.put("sequence_number", s))
        val d = new GenericData.Record(
          eSchema.getField("data_file").schema())
        d.put("content", 0)
        d.put("file_path", path)
        d.put("file_format", "PARQUET")
        d.put("partition", new GenericData.Record(
          d.getSchema.getField("partition").schema()))
        d.put("record_count", rows)
        d.put("file_size_in_bytes", len)
        r.put("data_file", d)
        w.append(r)
      } finally w.close()
      fs.getFileStatus(mPath).getLen
    }
    val manifests: Seq[(Path, Long, Long)] = files.zipWithIndex.map {
      case ((path, len, rows), i) =>
        val mPath = new Path(metaDir, f"hist-m$i%03d.avro")
        val mLen = writeDataManifest(mPath, Seq(
          (path, len, rows, (i + 1).toLong, None, 1))) // fresh ADDED
        (mPath, mLen, rows)
    }
    // manifest REWRITE shape (e.g. Iceberg's RewriteManifests): ONE
    // manifest holding every data file as an EXISTING entry with its
    // ORIGINAL commit's explicit sequence_number, referenced by the
    // LAST list at the rewrite's own (newer) seq — a reader keying
    // files off the list seq would shield old files from
    // strictly-newer equality deletes
    val rewriteManifest: Option[(Path, Long, Long)] =
      if (!compactManifests) None
      else {
        val mPath = new Path(metaDir, "hist-rewrite.avro")
        val mLen = writeDataManifest(mPath,
          files.zipWithIndex.map { case ((path, len, rows), i) =>
            (path, len, rows, (i + 1).toLong, Some((i + 1).toLong), 0)
          })
        Some((mPath, mLen, files.map(_._3).sum))
      }

    // ---- optional EQUALITY-delete files + ONE manifest: key rows
    //      under the names/ids of the schema the deleting engine saw
    //      (e.g. PRE-rename names — the reader must resolve them
    //      too). equality_ids is a per-data_file field, so SEVERAL
    //      delete files keyed on DIFFERENT column sets legally share
    //      one manifest — the shape that catches a reader applying
    //      the head file's ids to every file. All ride sequence
    //      snaps.length (apply to strictly older data), attached to
    //      the LAST snapshot's manifest list.
    val eqDelManifest: Option[(Path, Long, Long)] =
      if (eqDelete.isEmpty) None
      else {
        val written = eqDelete.zipWithIndex.map { case (del, i) =>
          val ids = del.df.columns.map(del.fieldIds).toSeq
          val (path, len, rows) = writeSnapParquet(spark, fs, del,
            s"$root/data/del_hist$i", sorted = false)
          (path, len, rows, ids)
        }
        val delSchema = entrySchema(None, withEqIds = true)
        val mPath = new Path(metaDir, "hist-del-eq.avro")
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](delSchema))
        w.setMeta("format-version", "2")
        w.setMeta("content", "deletes")
        w.create(delSchema, fs.create(mPath, true))
        try written.foreach { case (path, len, rows, ids) =>
          val r = new GenericData.Record(delSchema)
          r.put("status", 1)
          r.put("snapshot_id", snaps.length.toLong)
          val d = new GenericData.Record(
            delSchema.getField("data_file").schema())
          d.put("content", 2)
          d.put("file_path", path)
          d.put("file_format", "PARQUET")
          d.put("partition", new GenericData.Record(
            d.getSchema.getField("partition").schema()))
          d.put("record_count", rows)
          d.put("file_size_in_bytes", len)
          val l = new java.util.ArrayList[Integer](ids.length)
          ids.foreach(i => l.add(Integer.valueOf(i)))
          d.put("equality_ids", l)
          r.put("data_file", d)
          w.append(r)
        } finally w.close()
        Some((mPath, fs.getFileStatus(mPath).getLen,
          written.map(_._3).sum))
      }

    // ---- manifest list i carries manifests 0..i at original seqs
    val listPaths = snaps.indices.map { i =>
      val listPath = new Path(metaDir, s"snap-${i + 1}-hist.avro")
      val lw = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](listSchema))
      lw.setMeta("format-version", "2")
      lw.create(listSchema, fs.create(listPath, true))
      def entry(mPath: Path, mLen: Long, content: Int, seqNum: Long,
          snapId: Long, rows: Long): Unit = {
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", mPath.toString)
        r.put("manifest_length", mLen)
        r.put("partition_spec_id", 0)
        r.put("content", content)
        r.put("sequence_number", seqNum)
        r.put("min_sequence_number", seqNum)
        r.put("added_snapshot_id", snapId)
        r.put("added_files_count", 1)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", rows)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        val sumSchema = listSchema.getField("partitions").schema()
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        r.put("partitions", new GenericData.Array[GenericRecord](
          sumSchema, java.util.List.of[GenericRecord]()))
        lw.append(r)
      }
      try {
        if (i == snaps.length - 1 && rewriteManifest.isDefined)
          rewriteManifest.foreach { case (mPath, mLen, rows) =>
            entry(mPath, mLen, content = 0,
              seqNum = snaps.length.toLong,
              snapId = snaps.length.toLong, rows)
          }
        else (0 to i).foreach { j =>
          val (mPath, mLen, rows) = manifests(j)
          entry(mPath, mLen, content = 0, seqNum = (j + 1).toLong,
            snapId = (j + 1).toLong, rows)
        }
        if (i == snaps.length - 1) eqDelManifest.foreach {
          case (mPath, mLen, rows) =>
            entry(mPath, mLen, content = 1,
              seqNum = snaps.length.toLong,
              snapId = snaps.length.toLong, rows)
        }
      } finally lw.close()
      listPath
    }

    // ---- metadata.json: one schemas entry per snapshot
    val rootNode = M.createObjectNode()
    rootNode.put("format-version", 2)
    rootNode.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(root.getBytes(StandardCharsets.UTF_8)).toString)
    rootNode.put("location", root)
    rootNode.put("last-sequence-number", snaps.length.toLong)
    rootNode.put("last-updated-ms", System.currentTimeMillis())
    rootNode.put("last-column-id",
      snaps.flatMap(_.fieldIds.values).max)
    rootNode.put("current-schema-id", snaps.length - 1)
    val schemasArr = rootNode.putArray("schemas")
    snaps.zipWithIndex.foreach { case (sn, i) =>
      val o = schemasArr.addObject()
      o.put("type", "struct"); o.put("schema-id", i)
      val ff = o.putArray("fields")
      sn.df.schema.fields.foreach { f =>
        val n = ff.addObject()
        // metaNames lets the METADATA schema use a different name
        // than the data file carries — the "imported id-less parquet
        // under a name-mapping" shape
        n.put("id", sn.fieldIds(f.name))
        n.put("name", sn.metaNames.getOrElse(f.name, f.name))
        n.put("required", false); n.put("type", iceType(f.dataType))
      }
    }
    nameMapping.foreach { nm =>
      val arr = M.createArrayNode()
      nm.foreach { case (fid, names) =>
        val o = arr.addObject()
        o.put("field-id", fid)
        val na = o.putArray("names")
        names.foreach(na.add)
      }
      rootNode.putObject("properties")
        .put("schema.name-mapping.default", M.writeValueAsString(arr))
    }
    rootNode.put("default-spec-id", 0)
    val specs = rootNode.putArray("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 0)
    spec.putArray("fields")
    rootNode.put("last-partition-id", 999)
    rootNode.put("default-sort-order-id", 0)
    rootNode.set("sort-orders", M.readTree("""[{"order-id":0,"fields":[]}]"""))
    rootNode.put("current-snapshot-id", snaps.length.toLong)
    val snapsArr = rootNode.putArray("snapshots")
    snaps.indices.foreach { i =>
      val sNode = snapsArr.addObject()
      sNode.put("snapshot-id", (i + 1).toLong)
      sNode.put("sequence-number", (i + 1).toLong)
      sNode.put("timestamp-ms", System.currentTimeMillis())
      if (snapshotSchemaIds) sNode.put("schema-id", i)
      sNode.put("manifest-list", listPaths(i).toString)
      sNode.putObject("summary").put("operation", "append")
    }
    if (refs.nonEmpty) {
      // branch/tag refs: "main" as a branch on the current snapshot
      // plus the caller's named tags — the spec's refs map shape
      val rNode = rootNode.putObject("refs")
      val main = rNode.putObject("main")
      main.put("snapshot-id", snaps.length.toLong)
      main.put("type", "branch")
      refs.foreach { case (name, snapId) =>
        val t = rNode.putObject(name)
        t.put("snapshot-id", snapId)
        t.put("type", "tag")
      }
    }
    val out = fs.create(new Path(metaDir, "v00001.metadata.json"), true)
    out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(rootNode))
    out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    hint.write("1".getBytes(StandardCharsets.UTF_8))
    hint.close()
    root
  }
}
