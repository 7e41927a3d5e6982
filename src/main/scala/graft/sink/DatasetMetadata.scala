package graft.sink

import java.security.MessageDigest

import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.SparkSession

/** Dataset/file-level metadata envelope that rides along a published
  * dataset — the reference's gobblin-metadata module
  * (gobblin-modules/gobblin-metadata/.../types/GlobalMetadata.java:
  * 60-80 well-known keys, 355-380 id, 214-233 mergeWithDefaults;
  * GlobalMetadataCollector.java:40-100; GlobalMetadataJsonMerger.java).
  *
  * Semantics kept:
  *   - two levels: dataset-wide properties + per-output-file properties;
  *   - id = "0" when empty, else an md5 of the serialized body, so
  *     identical metadata dedups by value;
  *   - addAll: the other record's entries overwrite;
  *   - mergeWithDefaults: Transfer-Encoding LISTS CONCATENATE
  *     (mine first, then defaults); every other dataset key fills in
  *     only if absent;
  *   - collector: bounded LRU keyed by id (an unchanged upstream
  *     metadata stream adds nothing), defaults merged on admission;
  *   - merger: fold many records plus per-file write metrics into one
  *     record carrying Num-Records / Num-Files totals.
  *
  * Deviation (improvement): the reference hashes Jackson's map
  * iteration order, which is not deterministic for equal maps built in
  * different orders; here the body serializes with SORTED keys, so
  * equal metadata always has an equal id.
  *
  * Spark seam: [[parquetFileMetrics]] recovers the reference's
  * FsWriterMetrics (file name, record count) from parquet FOOTERS,
  * executor-side over the file list — no data scan, no driver I/O loop.
  */
object DatasetMetadata {

  val DatasetUrnKey = "Dataset-URN"
  val TransferEncodingKey = "Transfer-Encoding"
  val ContentTypeKey = "Content-Type"
  val InnerContentTypeKey = "Inner-Content-Type"
  val NumRecordsKey = "Num-Records"
  val NumFilesKey = "Num-Files"

  private val mapper = new ObjectMapper()
  private val nodes = JsonNodeFactory.instance

  final case class GlobalMeta(
      dataset: SortedMap[String, JsonNode],
      file: SortedMap[String, SortedMap[String, JsonNode]]) {

    def isEmpty: Boolean = dataset.isEmpty && file.isEmpty

    /** Canonical body JSON (sorted keys at every level). */
    def bodyJson: String = {
      val root = nodes.objectNode()
      val ds = root.putObject("dataset")
      dataset.foreach { case (k, v) => ds.set[JsonNode](k, v) }
      val fl = root.putObject("file")
      file.foreach { case (f, m) =>
        val fo = fl.putObject(f)
        m.foreach { case (k, v) => fo.set[JsonNode](k, v) }
      }
      mapper.writeValueAsString(root)
    }

    /** "0" for empty metadata, else md5 of the canonical body. */
    def id: String =
      if (isEmpty) "0"
      else MessageDigest.getInstance("MD5")
        .digest(bodyJson.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString

    def toJson: String = {
      val root = nodes.objectNode()
      root.put("id", id)
      val body = mapper.readTree(bodyJson)
      root.set[JsonNode]("dataset", body.get("dataset"))
      root.set[JsonNode]("file", body.get("file"))
      mapper.writeValueAsString(root)
    }

    def withDataset(key: String, value: JsonNode): GlobalMeta =
      copy(dataset = dataset.updated(key, value))
    def withDataset(key: String, value: String): GlobalMeta =
      withDataset(key, nodes.textNode(value))
    def withDataset(key: String, value: Long): GlobalMeta =
      withDataset(key, nodes.numberNode(value))
    def withDatasetList(key: String, values: Seq[String]): GlobalMeta = {
      val arr = nodes.arrayNode()
      values.foreach(arr.add)
      withDataset(key, arr: JsonNode)
    }
    def withFile(fileName: String, key: String, value: JsonNode): GlobalMeta =
      copy(file = file.updated(fileName,
        file.getOrElse(fileName, SortedMap.empty[String, JsonNode])
          .updated(key, value)))

    def datasetUrn: Option[String] =
      dataset.get(DatasetUrnKey).map(_.asText())
    def transferEncoding: Option[List[String]] =
      dataset.get(TransferEncodingKey)
        .map(n => n.elements().asScala.map(_.asText()).toList)
    def numRecords: Long =
      dataset.get(NumRecordsKey).map(_.asLong()).getOrElse(0L)
    def numFiles: Int =
      dataset.get(NumFilesKey).map(_.asInt()).getOrElse(0)

    /** ref addAll: the other record overwrites. */
    def addAll(other: GlobalMeta): GlobalMeta =
      GlobalMeta(dataset ++ other.dataset, file ++ other.file)

    /** ref mergeWithDefaults: Transfer-Encoding concatenates (this
      * record's encodings first), everything else fills-if-absent.
      */
    def mergeWithDefaults(defaults: GlobalMeta): GlobalMeta = {
      val enc = (transferEncoding, defaults.transferEncoding) match {
        case (Some(mine), Some(d)) => Some(mine ++ d)
        case (None, Some(d)) => Some(d)
        case (mine, None) => mine
      }
      val filled = defaults.dataset.foldLeft(dataset) {
        case (acc, (k, v)) if !acc.contains(k) => acc.updated(k, v)
        case (acc, _) => acc
      }
      val withEnc = enc.fold(filled) { e =>
        val arr = nodes.arrayNode()
        e.foreach(arr.add)
        filled.updated(TransferEncodingKey, arr: JsonNode)
      }
      GlobalMeta(withEnc, file)
    }
  }

  val empty: GlobalMeta =
    GlobalMeta(SortedMap.empty, SortedMap.empty)

  /** Integral numbers normalize to long nodes so a parsed record
    * equals the record that produced it (Jackson reads 42 back as an
    * IntNode, which is not equals() to the LongNode that wrote it).
    */
  private def canonical(n: JsonNode): JsonNode = n match {
    case num if num.isIntegralNumber => nodes.numberNode(num.asLong())
    case arr if arr.isArray =>
      val out = nodes.arrayNode()
      arr.elements().asScala.foreach(e => out.add(canonical(e)))
      out
    case obj if obj.isObject =>
      val out = nodes.objectNode()
      obj.fields().asScala.foreach(e => out.set[JsonNode](e.getKey, canonical(e.getValue)))
      out
    case other => other
  }

  def fromJson(json: String): GlobalMeta = {
    val root = mapper.readTree(json)
    def toSorted(n: JsonNode): SortedMap[String, JsonNode] =
      if (n == null) SortedMap.empty
      else SortedMap.from(n.fields().asScala.map(e => e.getKey -> canonical(e.getValue)))
    val fileLevel = Option(root.get("file")) match {
      case Some(f) if f.isObject =>
        SortedMap.from(f.fields().asScala.map(e => e.getKey -> toSorted(e.getValue)))
      case _ => SortedMap.empty[String, SortedMap[String, JsonNode]]
    }
    GlobalMeta(toSorted(root.get("dataset")), fileLevel)
  }

  /** ref GlobalMetadataCollector: bounded by-id LRU with a last-seen
    * fast path; defaults merge on admission. Driver state is
    * O(cacheSize) regardless of how many metadata records stream by.
    */
  final class Collector(
      default: Option[GlobalMeta] = None,
      cacheSize: Int = -1) {
    require(cacheSize == -1 || cacheSize > 0,
      s"cacheSize must be -1 or > 0, got $cacheSize")

    private val records =
      new java.util.LinkedHashMap[String, GlobalMeta](16, 0.75f, true)
    private var lastSeenId = ""

    /** Returns the admitted record when NEW, None for duplicates. */
    def process(metadata: Option[GlobalMeta]): Option[GlobalMeta] =
      synchronized {
        val candidate = metadata match {
          case None => default
          case Some(m) if m.id == lastSeenId => None
          case Some(m) =>
            lastSeenId = m.id
            Some(default.fold(m)(m.mergeWithDefaults))
        }
        candidate.flatMap { rec =>
          val isNew = !records.containsKey(rec.id)
          records.put(rec.id, rec) // touch refreshes LRU position
          if (cacheSize != -1 && records.size > cacheSize) {
            val it = records.keySet().iterator()
            it.next(); it.remove()
          }
          if (isNew) Some(rec) else None
        }
      }

    def all: List[GlobalMeta] = synchronized {
      records.values().asScala.toList
    }
  }

  /** ref GlobalMetadataJsonMerger: fold metadata records and per-file
    * write metrics into one dataset-level record.
    */
  final class JsonMerger {
    private var merged = empty

    def update(json: String): Unit =
      merged = merged.addAll(fromJson(json))

    /** (fileName, numRecords) per output file. */
    def updateFiles(fileInfos: Seq[(String, Long)]): Unit = {
      var numRecords = merged.numRecords
      var numFiles = merged.numFiles
      fileInfos.foreach { case (name, n) =>
        numRecords += n
        numFiles += 1
        merged = merged.withFile(name, NumRecordsKey, nodes.numberNode(n))
      }
      merged = merged
        .withDataset(NumRecordsKey, numRecords)
        // Long, not Int: fromJson canonicalizes integrals to LongNode,
        // and IntNode(2) != LongNode(2) would break round-trip equality
        .withDataset(NumFilesKey, numFiles.toLong)
    }

    def mergedMeta: GlobalMeta = merged
    def mergedJson: String = merged.toJson
  }

  /** Per-file record counts for a parquet tree, from footers only —
    * see [[graft.sources.ParquetFooters]] for the scan shape.
    */
  def parquetFileMetrics(spark: SparkSession, dir: String): Seq[(String, Long)] =
    graft.sources.ParquetFooters.scan(
      spark, dir, spark.sparkContext.hadoopConfiguration)(
      (reader, _) => reader.getRecordCount)
}
