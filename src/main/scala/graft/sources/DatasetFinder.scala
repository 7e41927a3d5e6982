package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{FsCopy, Retention}

/** Multi-dataset selection for copy/retention jobs — the layer above
  * [[graft.operators.FsCopy]] / [[graft.operators.Retention]] that the
  * reference configures per replication job:
  *
  *  - glob dataset discovery (gobblin-data-management/.../retention/
  *    profile/ConfigurableGlobDatasetFinder.java:* and copy/
  *    CopyableGlobDatasetFinder.java): every glob match is one dataset;
  *  - time-aware version selection (copy/
  *    TimeAwareRecursiveCopyableDataset.java:43-80): date-patterned
  *    subdirectories inside a lookback window are the copy/retain set.
  *
  * All listing here is driver-side METADATA (dataset/version counts,
  * never file contents); the byte work stays in FsCopy's executor
  * tasks. At 100 TB the dataset census is thousands of entries — a
  * driver Seq is the right home, same as the reference's finder.
  */
object DatasetFinder {

  final case class FoundDataset(name: String, root: String)

  /** Glob dataset discovery: every directory matching `globPattern` is
    * a dataset (CopyableGlobDatasetFinder semantics).
    */
  def findDatasets(spark: SparkSession, globPattern: String): Seq[FoundDataset] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(globPattern)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).getOrElse(Array.empty).toSeq
      .filter(_.isDirectory)
      .map(s => FoundDataset(s.getPath.getName, s.getPath.toString))
      .sortBy(_.root)
  }

  /** Version listing across found datasets: one row per direct child
    * directory — (dataset, version, path, mod_time), the same shape as
    * [[Retention.listVersions]] so the retention policies compose.
    */
  def versions(spark: SparkSession, datasets: Seq[FoundDataset]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = datasets.flatMap { ds =>
      val root = new Path(ds.root)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory).map { v =>
        (ds.name, v.getPath.getName, v.getPath.toString,
          new java.sql.Timestamp(v.getModificationTime))
      }
    }
    import spark.implicits._
    rows.toDF("dataset", "version", "path", "mod_time")
  }

  /** Time-aware selection: parse each version's time from its NAME
    * with `pattern` (TimeAwareRecursiveCopyableDataset's date.pattern)
    * and keep versions with time ∈ [from, to). Unparseable names drop
    * out (null version_time), like the reference skipping non-dated
    * paths.
    */
  def inWindow(versions: DataFrame, pattern: String, from: Column, to: Column): DataFrame =
    Retention.withPathTime(versions, pattern)
      .filter(col("version_time").isNotNull &&
        col("version_time") >= from && col("version_time") < to)

  /** Copy plans for the selected versions: each selected version dir is
    * planned under destRoot/<dataset>/<version> (layout-preserving
    * replication). Plans union into ONE Dataset so the chunk copies of
    * every dataset share the same executor wave.
    */
  def planCopies(spark: SparkSession, selected: Seq[(String, String, String)],
      destRoot: String, splitSize: Long = 128L * 1024 * 1024): Dataset[FsCopy.CopyableFile] = {
    val plans = selected.map { case (dataset, version, srcPath) =>
      FsCopy.plan(spark, srcPath, s"$destRoot/$dataset/$version", splitSize)
    }
    plans.reduceOption(_ union _)
      .getOrElse(spark.emptyDataset(org.apache.spark.sql.Encoders.product[FsCopy.CopyableFile]))
  }
}
