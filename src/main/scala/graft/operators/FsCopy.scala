package graft.operators

import org.apache.hadoop.fs.{CommonPathCapabilities, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Distributed file copy / replication — distcp-ng re-expressed
  * (SURVEY.md §2.6; reference gobblin-data-management/copy:
  * CopySource.java:108,161 enumerates CopyableFiles, DistcpFileSplitter
  * splits large files by block, FileAwareInputStreamDataWriter.java:304,
  * 344,370 preserves permissions/timestamps on commit).
  *
  * Spark shape: the file list is a Dataset (driver lists metadata only,
  * never content); ALL byte I/O runs on executors via the Hadoop FS
  * API. Large files are split into ranged chunk copies (one task each),
  * then each multi-chunk destination is stitched by ONE executor task —
  * a metadata-only `FileSystem.concat` where the store supports it
  * (HDFS), a streamed in-order merge otherwise. Nothing streams through
  * the driver: a 1 TB file costs its chunk tasks plus one stitch task,
  * and stitches of different files run in parallel.
  */
object FsCopy {

  final case class CopyableFile(src: String, dest: String, length: Long,
      offset: Long = 0L, chunkLen: Long = -1L, chunkIdx: Int = 0, nChunks: Int = 1,
      perm: Short = -1, mtime: Long = -1L)

  final case class CopyResult(files: Long, bytes: Long)

  /** Enumerate files under srcDir (recursive), mirroring the tree under
    * destDir; files larger than splitSize become ranged chunks.
    * preserveAttrs captures source permission + mtime so the copy can
    * re-apply them on commit (reference PreserveAttributes; owner is
    * intentionally not preserved — setOwner needs superuser).
    */
  def plan(spark: SparkSession, srcDir: String, destDir: String,
      splitSize: Long = 128L * 1024 * 1024,
      preserveAttrs: Boolean = true): Dataset[CopyableFile] = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val rawBase = new Path(srcDir)
    val fs = rawBase.getFileSystem(conf)
    // qualify so relativize sees matching schemes (file:///… vs /…)
    val base = fs.makeQualified(rawBase)
    val out = scala.collection.mutable.ArrayBuffer[CopyableFile]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = base.toUri.relativize(f.getPath.toUri).getPath
      require(!rel.startsWith("/"), s"failed to relativize ${f.getPath} against $base")
      val dest = s"$destDir/$rel"
      val perm: Short = if (preserveAttrs) f.getPermission.toShort else -1
      val mtime = if (preserveAttrs) f.getModificationTime else -1L
      if (f.getLen <= splitSize) {
        out += CopyableFile(f.getPath.toString, dest, f.getLen,
          perm = perm, mtime = mtime)
      } else {
        val n = math.ceil(f.getLen.toDouble / splitSize).toInt
        (0 until n).foreach { i =>
          val off = i.toLong * splitSize
          out += CopyableFile(f.getPath.toString, dest, f.getLen,
            off, math.min(splitSize, f.getLen - off), i, n, perm, mtime)
        }
      }
    }
    // one chunk per task slot; repartition spreads hot files
    spark.createDataset(out.toSeq).repartition(
      math.max(1, math.min(out.size, spark.sparkContext.defaultParallelism)))
  }

  private def applyAttrs(fs: FileSystem, p: Path, cf: CopyableFile): Unit = {
    if (cf.perm >= 0) fs.setPermission(p, new FsPermission(cf.perm))
    if (cf.mtime >= 0) fs.setTimes(p, cf.mtime, -1L)
  }

  /** Execute the copy plan: ranged chunk copies in parallel, then one
    * stitch task per multi-chunk destination (executor-side; the
    * groupByKey shuffles only plan METADATA rows, never bytes).
    */
  def execute(plan: Dataset[CopyableFile]): CopyResult = {
    val spark = plan.sparkSession
    import spark.implicits._
    val serConf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val copied = plan.mapPartitions { files =>
      val conf = serConf.value
      files.map { cf =>
        val srcPath = new Path(cf.src)
        val destPath = if (cf.nChunks == 1) new Path(cf.dest)
          else new Path(cf.dest + f".chunk-${cf.chunkIdx}%05d")
        val srcFs = srcPath.getFileSystem(conf)
        val destFs = destPath.getFileSystem(conf)
        destFs.mkdirs(destPath.getParent)
        val in = srcFs.open(srcPath)
        val out = destFs.create(destPath, true)
        val toCopy = if (cf.chunkLen >= 0) cf.chunkLen else cf.length
        try {
          in.seek(cf.offset)
          val buf = new Array[Byte](1 << 20)
          var remaining = toCopy
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            if (n < 0) throw new java.io.EOFException(s"${cf.src} at ${cf.offset}")
            out.write(buf, 0, n); remaining -= n
          }
        } finally { in.close(); out.close() }
        if (cf.nChunks == 1) applyAttrs(destFs, destPath, cf)
        (1L, toCopy)
      }
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))

    // deterministic second pass: one task per chunked destination.
    // concat-capable stores (HDFS) stitch via a metadata-only block
    // move; elsewhere the task streams chunks in order. Either way the
    // bytes stay on executors and destinations stitch in parallel.
    plan.filter(_.nChunks > 1).groupByKey(_.dest).mapGroups { (dest, it) =>
      val conf = serConf.value
      val chunks = it.toArray.sortBy(_.chunkIdx)
      val destPath = new Path(dest)
      val fs = destPath.getFileSystem(conf)
      val parts = chunks.map(cf => new Path(dest + f".chunk-${cf.chunkIdx}%05d"))
      if (parts.length > 1 &&
          fs.hasPathCapability(destPath.getParent, CommonPathCapabilities.FS_CONCAT)) {
        fs.rename(parts.head, destPath)
        fs.concat(destPath, parts.tail)
      } else {
        val out = fs.create(destPath, true)
        try parts.foreach { part =>
          val in = fs.open(part)
          try {
            val buf = new Array[Byte](1 << 20)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          fs.delete(part, false)
        } finally out.close()
      }
      applyAttrs(fs, destPath, chunks.head)
      dest
    }.count() // drives the stitch stage; zero groups when nothing is chunked

    CopyResult(copied._1, copied._2)
  }

  /** Post-copy verification: every planned dest exists with the source
    * length (the reference's copy verifiers). The FS stats run on
    * EXECUTORS — a 100 TB replication plan has millions of entries, and
    * a driver-side loop would serialize the job tail on per-file RPC
    * latency. One stat per destination (chunk rows dedup first); the
    * driver collects only the failure strings.
    */
  def verify(plan: Dataset[CopyableFile]): Seq[String] = {
    val spark = plan.sparkSession
    import spark.implicits._
    val serConf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    plan.map(cf => (cf.dest, cf.length)).distinct()
      .mapPartitions { it =>
        val conf = serConf.value
        it.flatMap { case (dest, want) =>
          val p = new Path(dest)
          val fs = p.getFileSystem(conf)
          val st = try Some(fs.getFileStatus(p))
            catch { case _: java.io.FileNotFoundException => None }
          st match {
            case None => Some(s"missing: $dest")
            case Some(s) if s.getLen != want =>
              Some(s"length mismatch: $dest (${s.getLen} != $want)")
            case _ => None
          }
        }
      }.collect().toSeq.sorted
  }
}
