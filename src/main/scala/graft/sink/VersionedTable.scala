package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.state.FsStateStore

/** Versioned table with snapshot isolation, time travel, and rollback —
  * the table-format commit surface the reference writes through
  * Iceberg (ref gobblin-iceberg/.../writer/IcebergMetadataWriter.java:
  * snapshot commits + metadata pointer flips), re-expressed natively:
  * each commit lands a complete immutable version directory, then
  * flips an atomic current-version pointer (temp+rename JSON via
  * [[graft.state.FsStateStore]] — the same discipline the flow catalog
  * uses for spec versions). Readers resolve the pointer once and read
  * an immutable directory, so they never observe a half-written
  * commit; rollback is a pointer flip, history is retained.
  *
  * Scale: commits move data once (staging rename); the pointer and
  * version listing are O(1) metadata. Old versions are reclaimed by
  * the retention operator over `versions/` like any versioned dataset
  * (operators/Retention.scala) — the same division of labor as
  * Iceberg's expire-snapshots.
  */
final class VersionedTable(root: String, conf: Configuration = new Configuration()) {

  private val meta = new FsStateStore(s"$root/_meta", conf)
  private def versionDir(v: Long): String = f"$root/versions/v$v%05d"

  def currentVersion: Option[Long] =
    meta.get("pointer", "current").flatMap(_.get("version")).map(_.toLong)

  def history: Seq[Long] = {
    val p = new Path(s"$root/versions")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted.toSeq
  }

  /** Write `df` as the next version and flip the pointer to it.
    * The version directory is complete and immutable BEFORE the
    * pointer moves, so a crash mid-commit leaves the table on the
    * previous version with an orphaned (never-referenced, retention-
    * reclaimable) directory — never a torn table.
    *
    * Concurrent committers serialize optimistically: each stages under
    * a UUID (no shared staging path to clobber), claims the lowest
    * free version number by rename, and DETECTS a lost race — Hadoop's
    * rename into an existing directory nests the source inside it, so
    * the claim is verified by the absence of the nested UUID dir; a
    * loser un-nests its staging and retries on the next number. Last
    * pointer write wins, both versions exist in history.
    */
  def commit(df: DataFrame): Long = {
    val id = java.util.UUID.randomUUID().toString
    val staging = new Path(s"$root/_staging/$id")
    df.write.mode("overwrite").parquet(staging.toString)
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(s"$root/versions"))
    var next = history.lastOption.getOrElse(0L) + 1L
    var attempts = 0
    while (attempts < 1000) {
      attempts += 1
      val dest = new Path(versionDir(next))
      val nested = new Path(dest, id)
      if (!fs.exists(dest) && fs.rename(staging, dest) && !fs.exists(nested)) {
        meta.put("pointer", "current", Map("version" -> next.toString))
        return next
      }
      // lost the race: if our staging got nested INSIDE the winner's
      // version dir, pull it back out and try the next number
      if (fs.exists(nested) && !fs.rename(nested, staging))
        throw new java.io.IOException(s"cannot recover staging for $root v$next")
      next += 1
    }
    throw new java.io.IOException(s"cannot land a version in $root after $attempts attempts")
  }

  /** Time travel: read an explicit version. */
  def read(spark: SparkSession, version: Long): DataFrame = {
    require(history.contains(version), s"unknown version $version of $root")
    spark.read.parquet(versionDir(version))
  }

  /** Read the version the pointer currently references. */
  def readCurrent(spark: SparkSession): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed version in $root"))
    read(spark, v)
  }

  /** Roll the pointer back (or forward) to an existing version.
    * History is untouched — a later commit continues the sequence.
    */
  def rollback(version: Long): Unit = {
    require(history.contains(version), s"unknown version $version of $root")
    meta.put("pointer", "current", Map("version" -> version.toString))
  }
}
