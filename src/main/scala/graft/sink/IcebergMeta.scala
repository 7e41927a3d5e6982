package graft.sink

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Iceberg v2 TABLE-FORMAT interop for [[ShardedTable]]: each
  * native commit can be mirrored as a real Iceberg snapshot —
  * `vN.metadata.json`, an Avro manifest LIST (`snap-*.avro`), and one
  * Avro manifest per touched partition, all laid out per the
  * published Apache Iceberg Table Spec v2 (field names, field-ids,
  * Avro file metadata keys, single-value bound serialization) — so an
  * external Iceberg reader can consume the table without this
  * library. The reference writes the same artifacts through the
  * Iceberg library (gobblin-iceberg/.../writer/IcebergMetadataWriter
  * .java: per-flush AppendFiles + metadata pointer); that jar is not
  * on this classpath, so the format is emitted from scratch on
  * avro-core and verified by this module's own independent reader.
  *
  * Scale contract: a mirror costs O(touched partitions) — one new
  * manifest per touched partition (counts from ONE distributed Spark
  * job over the touched dirs), untouched partitions' manifests are
  * carried BY PATH from the previous snapshot's manifest list, and
  * the manifest list itself is O(partitions) — exactly Iceberg's own
  * cost model. Spark writes parquet without Iceberg field-ids, so
  * the metadata carries the spec's `schema.name-mapping.default`
  * property, the standard mechanism for exactly this case.
  *
  * Since each manifest covers ONE partition, its manifest-list entry's
  * `partitions` field summary has lower == upper == the partition
  * value — the reader maps manifests to partitions from the list
  * alone, and partition-pruned scans never open unrelated manifests.
  */
object IcebergMeta {

  private val M = new ObjectMapper()

  // ------------------------------------------------------ type mapping

  private def iceType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no Iceberg mapping for Spark type $other")
  }

  /** Avro type of a partition value inside a manifest. */
  private def partAvroType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType | ShortType | ByteType => "int"
    case StringType => "string"
    case other => throw new IllegalArgumentException(
      s"partition column type $other not supported (long/int/string)")
  }

  /** Iceberg single-value binary serialization of a partition bound:
    * numbers little-endian, strings UTF-8.
    */
  private def boundBytes(dt: DataType, v: String): Array[Byte] = dt match {
    case LongType =>
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v.toLong).array()
    case IntegerType | ShortType | ByteType =>
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    case _ => v.getBytes(StandardCharsets.UTF_8)
  }

  private def boundValue(dt: DataType, b: Array[Byte]): String = dt match {
    case LongType =>
      java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toString
    case IntegerType | ShortType | ByteType =>
      java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toString
    case _ => new String(b, StandardCharsets.UTF_8)
  }

  // --------------------------------------------------- schema renders

  /** Iceberg schema JSON: positional field ids 1..n. */
  private def schemaJson(schema: StructType): String = {
    val root = M.createObjectNode()
    root.put("type", "struct").put("schema-id", 0)
    val fields = root.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fo = fields.addObject()
      fo.put("id", i + 1).put("name", f.name)
        .put("required", !f.nullable).put("type", iceType(f.dataType))
    }
    M.writeValueAsString(root)
  }

  private def nameMappingJson(schema: StructType): String = {
    val arr = M.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val o = arr.addObject()
      o.put("field-id", i + 1)
      o.putArray("names").add(f.name)
    }
    M.writeValueAsString(arr)
  }

  private def specFieldsJson(schema: StructType, partCol: String): String = {
    val srcId = schema.fieldIndex(partCol) + 1
    val arr = M.createArrayNode()
    val o = arr.addObject()
    o.put("name", partCol).put("transform", "identity")
      .put("source-id", srcId).put("field-id", 1000)
    M.writeValueAsString(arr)
  }

  /** manifest_entry Avro schema (spec v2 field names + field-ids;
    * required data_file fields + the optional ones we fill).
    */
  private def manifestEntrySchema(schema: StructType, partCol: String): Schema = {
    val pType = partAvroType(schema(schema.fieldIndex(partCol)).dataType)
    val json =
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[
         |{"name":"$partCol","type":["null","$pType"],"default":null,"field-id":1000}]}},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}
         |]}}]}""".stripMargin.replace("\n", "")
    new Schema.Parser().parse(json)
  }

  /** manifest_file Avro schema — the manifest list's entry record. */
  private val manifestFileSchema: Schema = new Schema.Parser().parse(
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
       |{"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
       |{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
       |{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
       |]}}]}]}""".stripMargin.replace("\n", ""))

  // -------------------------------------------------------- the mirror

  private final case class ListEntry(
      manifestPath: String, manifestLength: Long, sequenceNumber: Long,
      minSequenceNumber: Long, addedSnapshotId: Long, addedFiles: Int,
      addedRows: Long, partitionValue: String)

  /** Mirror `version` of the native table as the NEXT Iceberg
    * snapshot. Mirrors must be applied in native-version order
    * (snapshot K mirrors version K) — enforced loudly. Idempotent on
    * re-run of the same version (the snapshot is rewritten).
    */
  def mirror(spark: SparkSession, table: ShardedTable, version: Long): Unit = {
    val conf = table.conf
    val metaDir = new Path(s"${table.root}/metadata")
    val fs = metaDir.getFileSystem(conf)
    fs.mkdirs(metaDir)

    val prevN = currentMetaVersion(fs, metaDir)
    require(prevN == version - 1,
      s"Iceberg mirror of ${table.root} is at snapshot $prevN; " +
        s"mirror versions in order (got $version)")

    val schema = table.read(spark, version).schema
    val partType = schema(schema.fieldIndex(table.partCol)).dataType
    val cur = table.manifest(version)
    val prevManifest =
      if (version > 1) table.manifest(version - 1) else Map.empty[String, String]
    val touched = cur.filter { case (p, d) => !prevManifest.get(p).contains(d) }
    val snapshotId = version
    val seqNum = version

    // one distributed job for per-file record counts over touched dirs
    val fileCounts: Map[String, Long] =
      if (touched.isEmpty) Map.empty
      else spark.read.parquet(touched.values.toSeq: _*)
        .groupBy(input_file_name().as("f")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val entrySchema = manifestEntrySchema(schema, table.partCol)
    val newEntries: Seq[ListEntry] = touched.toSeq.sortBy(_._1).map {
      case (part, dir) =>
        val dirPath = new Path(dir)
        val dfs = dirPath.getFileSystem(conf)
        val files = dfs.listStatus(dirPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        val mPath = new Path(metaDir,
          s"${java.util.UUID.randomUUID()}-m$part.avro")
        val out = dfs.create(mPath, true)
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](entrySchema))
        w.setMeta("schema", schemaJson(schema))
        w.setMeta("partition-spec", specFieldsJson(schema, table.partCol))
        w.setMeta("partition-spec-id", "0")
        w.setMeta("format-version", "2")
        w.setMeta("content", "data")
        w.create(entrySchema, out)
        var rows = 0L
        try files.foreach { f =>
          val uri = f.getPath.toString
          val matchKey = fileCounts.keys.find(k =>
            k.endsWith(f.getPath.toUri.getPath) || k == uri)
          val count = matchKey.map(fileCounts).getOrElse(
            throw new IllegalStateException(
              s"no record count for data file $uri"))
          rows += count
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1) // ADDED
          e.put("snapshot_id", snapshotId)
          val df = new GenericData.Record(
            entrySchema.getField("data_file").schema())
          df.put("content", 0)
          df.put("file_path", uri)
          df.put("file_format", "PARQUET")
          val ps = df.getSchema.getField("partition").schema()
          val pr = new GenericData.Record(ps)
          pr.put(table.partCol, partType match {
            case LongType => java.lang.Long.valueOf(part)
            case IntegerType | ShortType | ByteType =>
              java.lang.Integer.valueOf(part)
            case _ => part
          })
          df.put("partition", pr)
          df.put("record_count", count)
          df.put("file_size_in_bytes", f.getLen)
          e.put("data_file", df)
          w.append(e)
        } finally w.close()
        val len = dfs.getFileStatus(mPath).getLen
        ListEntry(mPath.toString, len, seqNum, seqNum, snapshotId,
          files.length, rows, part)
    }

    // carry untouched partitions' manifests BY PATH from the previous
    // snapshot's list; drop entries for partitions no longer present
    val carried: Seq[ListEntry] =
      if (version == 1) Seq.empty
      else readManifestList(fs, metadataJsonAt(fs, metaDir, version - 1),
        partType)
        .filter(e => cur.contains(e.partitionValue) &&
          !touched.contains(e.partitionValue))

    val listPath = new Path(metaDir, f"snap-$snapshotId%d.avro")
    val lw = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    lw.setMeta("format-version", "2")
    lw.create(manifestFileSchema, fs.create(listPath, true))
    try (newEntries ++ carried).sortBy(_.partitionValue).foreach { e =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", e.manifestPath)
      r.put("manifest_length", e.manifestLength)
      r.put("partition_spec_id", 0)
      r.put("content", 0) // data
      r.put("sequence_number", e.sequenceNumber)
      r.put("min_sequence_number", e.minSequenceNumber)
      r.put("added_snapshot_id", e.addedSnapshotId)
      r.put("added_files_count", e.addedFiles)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", e.addedRows)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      val sumSchema = manifestFileSchema.getField("partitions").schema()
        .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
      val summary = new GenericData.Record(sumSchema.getElementType)
      summary.put("contains_null", false)
      summary.put("contains_nan", false)
      val b = java.nio.ByteBuffer.wrap(boundBytes(partType, e.partitionValue))
      summary.put("lower_bound", b.duplicate())
      summary.put("upper_bound", b.duplicate())
      val arr = new GenericData.Array[GenericRecord](sumSchema,
        java.util.List.of[GenericRecord](summary))
      r.put("partitions", arr)
      lw.append(r)
    } finally lw.close()

    // table metadata JSON + version hint (temp + rename = the flip)
    val root = M.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", java.util.UUID
      .nameUUIDFromBytes(table.root.getBytes(StandardCharsets.UTF_8))
      .toString)
    root.put("location", table.root)
    root.put("last-sequence-number", seqNum)
    root.put("last-updated-ms", System.currentTimeMillis())
    root.put("last-column-id", schema.fields.length)
    root.put("current-schema-id", 0)
    root.set("schemas", M.readTree(s"[${schemaJson(schema)}]"))
    root.put("default-spec-id", 0)
    root.set("partition-specs", M.readTree(
      s"""[{"spec-id":0,"fields":${specFieldsJson(schema, table.partCol)}}]"""))
    root.put("last-partition-id", 1000)
    root.put("default-sort-order-id", 0)
    root.set("sort-orders", M.readTree("""[{"order-id":0,"fields":[]}]"""))
    val props = root.putObject("properties")
    props.put("schema.name-mapping.default", nameMappingJson(schema))
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    // carry the full snapshot history forward
    if (version > 1) {
      val prevJson = M.readTree(readBytes(fs,
        metadataJsonAt(fs, metaDir, version - 1)))
      prevJson.get("snapshots").elements().asScala.foreach(s =>
        snaps.add(s))
    }
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId)
    snap.put("sequence-number", seqNum)
    snap.put("timestamp-ms", System.currentTimeMillis())
    snap.put("manifest-list", listPath.toString)
    snap.putObject("summary").put("operation", "overwrite")
    val mdPath = new Path(metaDir, f"v$version%05d.metadata.json")
    writeAtomic(fs, mdPath, M.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    writeAtomic(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes(StandardCharsets.UTF_8))
  }

  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    out.write(bytes); out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
  }

  private def readBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def currentMetaVersion(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path): Long = {
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint)) 0L
    else new String(readBytes(fs, hint), StandardCharsets.UTF_8).trim.toLong
  }

  private def metadataJsonAt(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path, version: Long): Path =
    new Path(metaDir, f"v$version%05d.metadata.json")

  private def readManifestList(fs: org.apache.hadoop.fs.FileSystem,
      mdPath: Path, partType: DataType): Seq[ListEntry] = {
    val md = M.readTree(readBytes(fs, mdPath))
    val snapId = md.get("current-snapshot-id").asLong()
    val listPath = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .map(_.get("manifest-list").asText())
      .getOrElse(throw new IllegalStateException(
        s"current snapshot $snapId not in $mdPath"))
    val in = fs.open(new Path(listPath))
    val stream = new DataFileStream(in,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[ListEntry]
      while (stream.hasNext) {
        val r = stream.next()
        val parts = r.get("partitions")
          .asInstanceOf[java.util.List[GenericRecord]]
        require(parts != null && parts.size() == 1,
          s"manifest ${r.get("manifest_path")} should cover one partition")
        val lo = parts.get(0).get("lower_bound")
          .asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](lo.remaining())
        lo.duplicate().get(bytes)
        out += ListEntry(
          r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long],
          r.get("sequence_number").asInstanceOf[Long],
          r.get("min_sequence_number").asInstanceOf[Long],
          r.get("added_snapshot_id").asInstanceOf[Long],
          r.get("added_files_count").asInstanceOf[Int],
          r.get("added_rows_count").asInstanceOf[Long],
          boundValue(partType, bytes))
      }
      out.result()
    } finally stream.close()
  }

  // ------------------------------------------------------- the reader

  final case class SnapshotInfo(snapshotId: Long, sequenceNumber: Long,
      manifestList: String)

  /** The snapshot log of an Iceberg table (current metadata.json). */
  def snapshots(spark: SparkSession, tableRoot: String): Seq[SnapshotInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(s"$tableRoot/metadata")
    val fs = metaDir.getFileSystem(conf)
    val v = currentMetaVersion(fs, metaDir)
    require(v > 0, s"no Iceberg metadata under $tableRoot")
    val md = M.readTree(readBytes(fs, metadataJsonAt(fs, metaDir, v)))
    md.get("snapshots").elements().asScala.map(s =>
      SnapshotInfo(s.get("snapshot-id").asLong(),
        s.get("sequence-number").asLong(),
        s.get("manifest-list").asText())).toSeq
  }

  /** Read an Iceberg table THROUGH ITS METADATA ONLY — version hint →
    * metadata.json → manifest list → manifests → data files. The
    * verification path: nothing here consults the native manifest.
    * `snapshotId = None` reads the current snapshot; `partitions`
    * prunes manifests from the list's partition summaries without
    * opening them.
    */
  def read(spark: SparkSession, tableRoot: String,
      snapshotId: Option[Long] = None,
      partitions: Option[Seq[String]] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(s"$tableRoot/metadata")
    val fs = metaDir.getFileSystem(conf)
    val v = currentMetaVersion(fs, metaDir)
    require(v > 0, s"no Iceberg metadata under $tableRoot")
    val md = M.readTree(readBytes(fs, metadataJsonAt(fs, metaDir, v)))
    val wantSnap = snapshotId.getOrElse(md.get("current-snapshot-id").asLong())
    val listPath = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == wantSnap)
      .map(_.get("manifest-list").asText())
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $wantSnap not found under $tableRoot"))
    // partition type from the schema + spec
    val schemas = md.get("schemas").elements().asScala.toSeq
    val schemaNode = schemas.find(
      _.get("schema-id").asInt() == md.get("current-schema-id").asInt())
      .getOrElse(schemas.head)
    val spec = md.get("partition-specs").elements().asScala.toSeq.head
      .get("fields").elements().asScala.toSeq.head
    val srcId = spec.get("source-id").asInt()
    val partTypeName = schemaNode.get("fields").elements().asScala
      .find(_.get("id").asInt() == srcId)
      .map(_.get("type").asText()).getOrElse("string")
    val partType: DataType = partTypeName match {
      case "long" => LongType
      case "int" => IntegerType
      case _ => StringType
    }
    // manifest list -> (manifest, partitionValue)
    val manifests = {
      val in = fs.open(new Path(listPath))
      val stream = new DataFileStream(in,
        new GenericDatumReader[GenericRecord]())
      try {
        val out = Seq.newBuilder[(String, String)]
        while (stream.hasNext) {
          val r = stream.next()
          val parts = r.get("partitions")
            .asInstanceOf[java.util.List[GenericRecord]]
          val lo = parts.get(0).get("lower_bound")
            .asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](lo.remaining())
          lo.duplicate().get(bytes)
          out += r.get("manifest_path").toString ->
            boundValue(partType, bytes)
        }
        out.result()
      } finally stream.close()
    }
    val pruned = partitions match {
      case Some(ps) => manifests.filter { case (_, p) => ps.contains(p) }
      case None => manifests
    }
    // manifests -> live data files
    val files = pruned.flatMap { case (mPath, _) =>
      val in = fs.open(new Path(mPath))
      val stream = new DataFileStream(in,
        new GenericDatumReader[GenericRecord]())
      try {
        val out = Seq.newBuilder[String]
        while (stream.hasNext) {
          val e = stream.next()
          val status = e.get("status").asInstanceOf[Int]
          if (status != 2) { // not DELETED
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            require(df.get("file_format").toString == "PARQUET",
              s"unsupported file format in $mPath")
            out += df.get("file_path").toString
          }
        }
        out.result()
      } finally stream.close()
    }
    require(files.nonEmpty, s"snapshot $wantSnap has no data files")
    spark.read.parquet(files: _*)
  }
}
