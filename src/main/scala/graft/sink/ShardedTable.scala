package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.FsStateStore

/** Partition-manifest versioned table — the Iceberg-style commit
  * surface for PARTITION-GRANULAR incremental maintenance, unifying
  * [[VersionedTable]]'s snapshot isolation / time travel / rollback
  * with partition-level rewrites (ref gobblin-iceberg/.../writer/
  * IcebergMetadataWriter.java: file-level snapshot commits + a
  * metadata pointer flip — here re-expressed as partition-dir-level
  * manifests, the granularity Spark writes at).
  *
  * Layout:
  * {{{
  *   root/_meta/manifests/vNNNNN.json   partValue -> data dir (+ user meta)
  *   root/_meta/pointer/current.json    the committed version
  *   root/data/<uuid>/_part=<value>/    immutable partition-version dirs
  * }}}
  *
  * A commit stages ONLY the partitions its delta touches into a fresh
  * UUID directory, then writes a manifest that references the new dirs
  * for touched partitions and the PREVIOUS version's dirs for
  * everything else, and flips the pointer (temp+rename JSON — the
  * commit point). Consequences, all load-bearing at 100 TB:
  *
  *  - an epoch's write cost is O(touched partitions), not O(table) —
  *    the fix for the full-snapshot-rewrite incremental-index publish;
  *  - untouched partitions are SHARED between versions byte-for-byte
  *    (same directory, never copied), so history is delta-priced;
  *  - readers resolve the pointer once and read immutable dirs —
  *    snapshot isolation without locks; time travel = read an old
  *    manifest; rollback = pointer flip;
  *  - a crash before the pointer flip leaves orphaned UUID dirs that
  *    no manifest references (reclaimed by [[expireVersions]]) and the
  *    table on its previous version — never a torn table. User
  *    metadata (e.g. the incremental jobs' high watermark) rides the
  *    manifest, so state and data commit ATOMICALLY.
  *
  * The partition column stays a DATA column in the files (the write
  * path partitions by a `_part` string copy), so reading a manifest's
  * directories needs no partition-discovery and a partition-pruned
  * read ([[readPartitions]]) is a manifest lookup, not a listing.
  *
  * Contract: partition values must render to filesystem-safe strings
  * (ints in practice — IVF list ids, doc-hash shards) and be non-null.
  */
final class ShardedTable(root: String, partCol: String,
    conf: Configuration = new Configuration()) {

  private val meta = new FsStateStore(s"$root/_meta", conf)
  private def vKey(v: Long): String = f"v$v%05d"

  def currentVersion: Option[Long] =
    meta.get("pointer", "current").flatMap(_.get("version")).map(_.toLong)

  def history: Seq[Long] =
    meta.listKeys("manifests").map(_.stripPrefix("v").toLong).sorted

  /** partValue -> data directory for `version`. */
  def manifest(version: Long): Map[String, String] =
    meta.get("manifests", vKey(version))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown version $version of $root"))
      .collect { case (k, v) if k.startsWith("p:") => k.stripPrefix("p:") -> v }

  /** User metadata committed with `version` (watermarks etc.). */
  def metaOf(version: Long): Map[String, String] =
    meta.get("manifests", vKey(version))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown version $version of $root"))
      .collect { case (k, v) if k.startsWith("m:") => k.stripPrefix("m:") -> v }

  def currentMeta: Map[String, String] =
    currentVersion.map(metaOf).getOrElse(Map.empty)

  /** Commit `df` as the next version, rewriting ONLY the partitions in
    * `touched`: df must hold the full replacement content for those
    * partitions (and nothing else — enforced); every other partition
    * is carried over from the previous manifest untouched. A touched
    * value with no rows in df leaves the manifest (partition delete).
    * `full = true` drops ALL carry-over — the full-rebuild commit
    * (e.g. after the data dirs were deleted out from under the
    * metadata, where carrying forward would reference dead paths).
    * Returns the committed version.
    */
  def commit(df: DataFrame, touched: Seq[String],
      userMeta: Map[String, String] = Map.empty,
      full: Boolean = false): Long = {
    val id = java.util.UUID.randomUUID().toString
    val dataDir = s"$root/data/$id"
    df.withColumn("_part", col(partCol).cast("string"))
      .write.partitionBy("_part").mode("overwrite").parquet(dataDir)
    val fs = new Path(root).getFileSystem(conf)
    val staged = fs.listStatus(new Path(dataDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_part="))
      .map(s => s.getPath.getName.stripPrefix("_part=") -> s.getPath.toString)
      .toMap
    val stray = staged.keySet -- touched.toSet
    require(stray.isEmpty,
      s"commit carries rows outside its declared touched partitions: " +
        s"${stray.toSeq.sorted.take(5).mkString(", ")}")
    val prev =
      if (full) Map.empty[String, String]
      else currentVersion.map(manifest).getOrElse(Map.empty)
    val next = (prev -- touched) ++ staged
    val version = history.lastOption.getOrElse(0L) + 1L
    meta.put("manifests", vKey(version),
      next.map { case (k, d) => s"p:$k" -> d } ++
        userMeta.map { case (k, v) => s"m:$k" -> v })
    // the commit point: readers see the new version only after this
    meta.put("pointer", "current", Map("version" -> version.toString))
    version
  }

  /** Time travel: read an explicit version (union of its manifest's
    * immutable partition dirs; the partition column is a data column).
    */
  def read(spark: SparkSession, version: Long): DataFrame = {
    val dirs = manifest(version).values.toSeq.sorted
    require(dirs.nonEmpty, s"version $version of $root has no partitions")
    spark.read.parquet(dirs: _*)
  }

  def readCurrent(spark: SparkSession): DataFrame =
    read(spark, currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed version in $root")))

  /** Manifest-pruned read: only the named partitions' directories are
    * opened — no listing, no footer reads outside the selection. The
    * scale seam for probe-list ANN search (read nProbe lists, not the
    * corpus) and for touched-shard maintenance reads. Unknown values
    * (never-committed partitions) resolve to nothing, matching an
    * empty-partition read.
    */
  def readPartitions(spark: SparkSession, values: Seq[String],
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no committed version in $root"))
    val m = manifest(v)
    val dirs = values.distinct.flatMap(m.get).sorted
    if (dirs.isEmpty) {
      // preserve schema from any existing partition; a table with NO
      // partitions at all cannot answer a schemaful empty read
      val all = m.values.toSeq.sorted
      require(all.nonEmpty, s"version $v of $root has no partitions")
      spark.read.parquet(all.head).limit(0)
    } else spark.read.parquet(dirs: _*)
  }

  /** Roll the pointer to an existing version; history untouched. */
  def rollback(version: Long): Unit = {
    require(history.contains(version), s"unknown version $version of $root")
    meta.put("pointer", "current", Map("version" -> version.toString))
  }

  /** Reclaim history: drop all but the newest `keepLast` manifests
    * (the current version always survives) and delete every partition
    * directory no kept manifest references — including orphans from
    * crashed commits. The expire-snapshots division of labor. Returns
    * the number of partition dirs deleted.
    */
  def expireVersions(keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least one version")
    val all = history
    val keep = (all.takeRight(keepLast) ++ currentVersion).distinct
    val dropped = all.filterNot(keep.contains)
    val referenced = keep.flatMap(v => manifest(v).values).toSet
    dropped.foreach(v => meta.delete("manifests", vKey(v)))
    val fs = new Path(root).getFileSystem(conf)
    val dataRoot = new Path(s"$root/data")
    var deleted = 0
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).filter(_.isDirectory).foreach { uuidDir =>
        fs.listStatus(uuidDir.getPath).filter(_.isDirectory).foreach { part =>
          if (!referenced.contains(part.getPath.toString)) {
            fs.delete(part.getPath, true)
            deleted += 1
          }
        }
        if (fs.listStatus(uuidDir.getPath).isEmpty)
          fs.delete(uuidDir.getPath, true)
      }
    }
    deleted
  }
}
