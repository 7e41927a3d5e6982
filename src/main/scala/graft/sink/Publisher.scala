package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Staged write + atomic-rename publish (SURVEY.md §2.5/§2.7).
  *
  * Reference semantics: writers write to writer.staging.dir, task
  * commit() renames into writer.output.dir, then BaseDataPublisher
  * moves writer output into the final dir, one rename per branch/task
  * (FsDataWriter.java:58, BaseDataPublisher.java:97,332-377).
  *
  * Spark's committer already gives task-level staging inside one
  * `df.write`; what it does NOT give is *dataset-level* atomicity
  * across multiple writes/branches — data becomes visible the moment
  * its job finishes. Publisher restores that: every sink writes under
  * a staging root; `publish()` renames staged outputs into the final
  * root only after ALL branches + task-level policies pass — the
  * COMMIT_ON_FULL_SUCCESS policy (JobCommitPolicy.java:31-54).
  *
  * Renames are per-directory-entry (partition dirs / files), preserving
  * partition subpaths like TimePartitionedDataPublisher. On HDFS a
  * rename is atomic per entry; publish is therefore atomic per
  * partition, all-or-nothing per dataset given same-FS staging.
  */
final case class SinkSpec(
    stagingDir: String,
    outputDir: String,
    format: String = "parquet",
    partitionBy: Seq[String] = Nil)

final class Publisher(conf: Configuration = new Configuration()) {

  /** Write df into the staging dir (overwriting stale staging). */
  def writeStaged(df: DataFrame, spec: SinkSpec): Unit = {
    val w = df.write.mode("overwrite").format(spec.format)
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .save(spec.stagingDir)
  }

  /** Idempotent re-publish: REPLACE each staged partition dir in the
    * output (dynamic-partition-overwrite semantics) instead of merging
    * files into it. A retried run that re-processes the same watermark
    * range then converges to the same output — the exactly-once option
    * (CommitSequencePublisher, gobblin-core/.../publisher/
    * CommitSequencePublisher.java) without a commit-sequence store.
    */
  def publishOverwritePartitions(spec: SinkSpec): Int = {
    val staging = new Path(spec.stagingDir)
    val out = new Path(spec.outputDir)
    val fs = staging.getFileSystem(conf)
    if (!fs.exists(staging)) return 0
    fs.mkdirs(out)
    var moved = 0
    fs.listStatus(staging).foreach { entry =>
      val name = entry.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val dest = new Path(out, name)
        // Crash-safe replace: park the old partition aside first, so a
        // failure between the two renames can never lose the previous
        // data (delete-then-rename would). The tombstone is dot-named,
        // so readers listing the output never pick it up.
        val tomb = new Path(out, s".${name}.replaced")
        if (fs.exists(tomb)) fs.delete(tomb, true)
        val existed = fs.exists(dest)
        if (existed) rename(fs, dest, tomb)
        try rename(fs, entry.getPath, dest)
        catch {
          case e: java.io.IOException =>
            if (existed) fs.rename(tomb, dest) // restore previous data
            throw e
        }
        if (existed) fs.delete(tomb, true)
        moved += 1
      }
    }
    fs.delete(staging, true)
    moved
  }

  /** Snapshot publish: the staged dir REPLACES the output dir whole —
    * SnapshotOnly table semantics (a compacted snapshot supersedes the
    * previous one; the reference's compactor swaps directories rather
    * than merging). Crash-safe like [[publishOverwritePartitions]]:
    * the previous output parks as a dot-tombstone before the swap and
    * is restored if the swap rename fails. Replaying the publish
    * converges to the same output — never merges, never duplicates.
    */
  def publishSnapshot(spec: SinkSpec): Int = {
    val staging = new Path(spec.stagingDir)
    val out = new Path(spec.outputDir)
    val fs = staging.getFileSystem(conf)
    if (!fs.exists(staging)) return 0
    if (out.getParent != null) fs.mkdirs(out.getParent)
    val tomb = new Path(out.getParent, s".${out.getName}.replaced")
    if (fs.exists(tomb)) fs.delete(tomb, true)
    val existed = fs.exists(out)
    if (existed) rename(fs, out, tomb)
    try rename(fs, staging, out)
    catch {
      case e: java.io.IOException =>
        if (existed) fs.rename(tomb, out) // restore previous snapshot
        throw e
    }
    if (existed) fs.delete(tomb, true)
    1
  }

  /** Recover from a crash INSIDE [[publishSnapshot]]'s swap window: if
    * the output is missing but the parked previous snapshot (the
    * dot-tombstone) survives, restore it. Returns true if a restore
    * happened. When the output EXISTS, any leftover tombstone (crash
    * after the swap rename, before the tomb delete) is deleted instead
    * — otherwise it would outlive the run and later resurrect a stale
    * snapshot after an operator deliberately deletes the output to
    * force a full rebuild. Callers doing incremental maintenance run
    * this before reading the published state, so the crash window
    * between the two renames degrades to "previous snapshot +
    * re-derived delta", never to an empty output.
    */
  def recoverSnapshot(spec: SinkSpec): Boolean = {
    val out = new Path(spec.outputDir)
    val fs = out.getFileSystem(conf)
    val tomb = new Path(out.getParent, s".${out.getName}.replaced")
    if (!fs.exists(out) && fs.exists(tomb)) { rename(fs, tomb, out); true }
    else {
      if (fs.exists(out) && fs.exists(tomb)) fs.delete(tomb, true)
      false
    }
  }

  /** Move every staged entry into the output dir. Partition dirs are
    * merged one level deep (new files slot into existing partition
    * dirs); data files move whole. Returns moved file count.
    */
  def publish(spec: SinkSpec): Int = {
    val staging = new Path(spec.stagingDir)
    val out = new Path(spec.outputDir)
    val fs = staging.getFileSystem(conf)
    if (!fs.exists(staging)) return 0
    fs.mkdirs(out)
    var moved = 0
    fs.listStatus(staging).foreach { entry =>
      val name = entry.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        if (entry.isDirectory) {
          val destDir = new Path(out, name)
          if (!fs.exists(destDir)) {
            rename(fs, entry.getPath, destDir); moved += 1
          } else {
            fs.listStatus(entry.getPath).foreach { f =>
              if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
                rename(fs, f.getPath, new Path(destDir, f.getPath.getName)); moved += 1
              }
            }
          }
        } else {
          rename(fs, entry.getPath, new Path(out, name)); moved += 1
        }
      }
    }
    fs.delete(staging, true)
    moved
  }

  /** All-or-nothing publish across fork branches: every staging dir
    * must exist (i.e. every branch write succeeded) before ANY entry
    * moves — the dataset-atomic multi-sink fork commit
    * (stage-all-then-publish-all; SafeDatasetCommit semantics).
    */
  def publishAll(specs: Seq[SinkSpec]): Int = {
    val missing = specs.filterNot { s =>
      val p = new Path(s.stagingDir); p.getFileSystem(conf).exists(p)
    }
    if (missing.nonEmpty) {
      specs.foreach(abort)
      throw new IllegalStateException(
        s"missing staged branches: ${missing.map(_.stagingDir).mkString(", ")}")
    }
    specs.map(publish).sum
  }

  /** COMMIT_ON_PARTIAL_SUCCESS: publish every branch that staged,
    * report the ones that did not (caller re-runs just those).
    */
  def publishPartial(specs: Seq[SinkSpec]): (Seq[SinkSpec], Seq[SinkSpec]) = {
    val (staged, missing) = specs.partition { s =>
      val p = new Path(s.stagingDir); p.getFileSystem(conf).exists(p)
    }
    staged.foreach(publish)
    (staged, missing)
  }

  /** Abort: drop staged output, leave published data untouched. */
  def abort(spec: SinkSpec): Unit = {
    val staging = new Path(spec.stagingDir)
    val fs = staging.getFileSystem(conf)
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  private def rename(fs: FileSystem, src: Path, dest: Path): Unit =
    if (!fs.rename(src, dest))
      throw new java.io.IOException(s"publish rename failed: $src -> $dest")
}
