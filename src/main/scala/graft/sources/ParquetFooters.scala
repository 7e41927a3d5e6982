package graft.sources

import scala.reflect.ClassTag

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet FOOTER scans over a dataset directory: the
  * file list is driver-side metadata (paths only — same class as
  * FsCopy's plan), the footer reads distribute over it — no row scan,
  * no driver I/O loop, linear in file count. Listing is RECURSIVE, so
  * partitioned trees (`dt=2024-01-01/part-*.parquet`) are covered;
  * results key by the path RELATIVE to the scanned root (identical to
  * the bare file name for flat directories, unique for nested ones
  * where every partition repeats `part-00000.parquet`).
  *
  * Shared by dataset-metadata collection (record counts) and the
  * schema parity guard (file schemas). [[scan]] collects one result
  * per file — fine for the usual thousands-of-files datasets; for
  * million-file trees use [[scanAggregate]], which folds results
  * executor-side and ships only the combined value to the driver.
  */
object ParquetFooters {

  /** Recursive `*.parquet` listing under `root`, as (relativePath,
    * fullPath), sorted by relative path.
    */
  private def listParquet(root: Path, conf: Configuration): Seq[(String, String)] = {
    val fs = root.getFileSystem(conf)
    val rootUri = fs.getFileStatus(root).getPath.toUri
    val out = Seq.newBuilder[(String, String)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val rel = rootUri.relativize(st.getPath.toUri).getPath
        out += ((rel, st.getPath.toString))
      }
    }
    out.result().sortBy(_._1)
  }

  private def openAndApply[T](full: String, conf: Configuration)(
      f: (ParquetFileReader, Configuration) => T): T = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(full), conf))
    try f(reader, conf)
    finally reader.close()
  }

  /** Apply `f(reader, executorConf)` to every `*.parquet` file's open
    * footer under `dir` (recursive); returns (relativePath, result)
    * sorted by path. `f` must be serializable (it runs in tasks).
    */
  def scan[T](spark: SparkSession, dir: String, conf: Configuration)(
      f: (ParquetFileReader, Configuration) => T): Seq[(String, T)] = {
    val files = listParquet(new Path(dir), conf)
    if (files.isEmpty) return Nil
    val serConf = new SerializableConfiguration(conf)
    spark.sparkContext
      .parallelize(files, math.min(files.length, 32))
      .map { case (rel, full) =>
        (rel, openAndApply(full, serConf.value)(f))
      }
      .collect()
      .toSeq
      .sortBy(_._1)
  }

  /** The scale path: per-file results fold into `zero` with `seq` on
    * executors and partials merge with `comb` — the driver receives
    * ONE `A` (a verdict/summary), never a per-file collection. The
    * path list itself remains driver-side metadata (strings), which
    * is the floor for a filesystem without a manifest.
    */
  def scanAggregate[T, A: ClassTag](spark: SparkSession, dir: String,
      conf: Configuration)(f: (ParquetFileReader, Configuration) => T)(
      zero: A)(seq: (A, (String, T)) => A, comb: (A, A) => A): A = {
    val files = listParquet(new Path(dir), conf)
    if (files.isEmpty) return zero
    val serConf = new SerializableConfiguration(conf)
    spark.sparkContext
      .parallelize(files, math.min(files.length, 32))
      .map { case (rel, full) => (rel, openAndApply(full, serConf.value)(f)) }
      .aggregate(zero)(seq, comb)
  }
}
