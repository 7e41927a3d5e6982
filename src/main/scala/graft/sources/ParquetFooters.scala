package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet FOOTER scans over a dataset directory: the
  * file list is driver-side metadata (same class as FsCopy's plan),
  * the footer reads distribute over it — no row scan, no driver I/O
  * loop, linear in file count. Shared by dataset-metadata collection
  * (record counts) and the schema parity guard (file schemas).
  */
object ParquetFooters {

  /** Apply `f(reader, executorConf)` to every `*.parquet` file's open
    * footer in `dir`; returns (fileName, result) sorted by file name.
    * `f` must be serializable (it runs in tasks).
    */
  def scan[T](spark: SparkSession, dir: String, conf: Configuration)(
      f: (ParquetFileReader, Configuration) => T): Seq[(String, T)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
    if (files.isEmpty) return Nil
    val serConf = new SerializableConfiguration(conf)
    spark.sparkContext
      .parallelize(files.toSeq, math.min(files.length, 32))
      .map { p =>
        val path = new Path(p)
        val reader =
          ParquetFileReader.open(HadoopInputFile.fromPath(path, serConf.value))
        try (path.getName, f(reader, serConf.value))
        finally reader.close()
      }
      .collect()
      .toSeq
      .sortBy(_._1)
  }
}
