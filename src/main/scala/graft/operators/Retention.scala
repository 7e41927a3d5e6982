package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention / lifecycle policies over a "versions" DataFrame
  * (SURVEY.md §2.6; reference gobblin-data-management/retention).
  *
  * The reference walks the filesystem with VersionFinders
  * (retention/version/finder/DateTimeDatasetVersionFinder.java:37 etc.)
  * and applies RetentionPolicy implementations
  * (TimeBasedRetentionPolicy.java:48, NewestKRetentionPolicy.java:39,
  * CombineRetentionPolicy.java:67) to pick deletable versions.
  *
  * Here a version listing is just a DataFrame (dataset key columns +
  * a version-ordering column), and each policy marks SURVIVORS; the
  * deletable set is the anti-join of versions against survivors.
  * Policies compose like the reference's CombineRetentionPolicy via
  * plain intersect/union on the survivor sets.
  */
object Retention {

  /** NewestKRetentionPolicy: keep the newest k versions per dataset. */
  def newestK(versions: DataFrame, datasetCols: Seq[String], versionOrder: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(datasetCols.map(col): _*).orderBy(versionOrder.map(_.desc): _*)
    versions.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** TimeBasedRetentionPolicy: keep versions newer than the cutoff. */
  def newerThan(versions: DataFrame, tsCol: String, cutoff: java.sql.Timestamp): DataFrame =
    versions.filter(col(tsCol) > lit(cutoff))

  /** Column-cutoff overload (e.g. a TIMESTAMP_NTZ literal — a
    * java.sql.Timestamp literal would force a session-TZ cast).
    */
  def newerThan(versions: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    versions.filter(col(tsCol) > cutoff)

  /** CombineRetentionPolicy(INTERSECT): survivors kept by all policies. */
  def keepIntersect(survivorSets: Seq[DataFrame]): DataFrame =
    survivorSets.reduce(_.intersect(_))

  /** CombineRetentionPolicy(UNION): survivors kept by any policy. */
  def keepUnion(survivorSets: Seq[DataFrame]): DataFrame =
    survivorSets.reduce(_.union(_)).distinct()

  /** Deletable = versions - survivors (what DatasetCleaner would rm). */
  def deletable(versions: DataFrame, survivors: DataFrame): DataFrame =
    versions.except(survivors)

  /** Version finder: FS listing → versions DataFrame (dataset = parent
    * dir, version = leaf dir name, ts = mtime) — the
    * DateTimeDatasetVersionFinder / GlobModTimeDatasetVersionFinder
    * family (retention/version/finder/) collapsed into one listing.
    * Driver-side metadata only.
    */
  def listVersions(spark: org.apache.spark.sql.SparkSession, baseDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(baseDir)
    val fs = base.getFileSystem(conf)
    val rows = if (!fs.exists(base)) Seq.empty else
      fs.listStatus(base).toSeq.filter(_.isDirectory).flatMap { ds =>
        fs.listStatus(ds.getPath).toSeq.filter(_.isDirectory).map { v =>
          (ds.getPath.getName, v.getPath.getName, v.getPath.toString,
            new java.sql.Timestamp(v.getModificationTime))
        }
      }
    import spark.implicits._
    rows.toDF("dataset", "version", "path", "mod_time")
  }

  /** DateTimeDatasetVersionFinder semantics
    * (retention/version/finder/DateTimeDatasetVersionFinder.java:37):
    * the version TIMESTAMP comes from the directory NAME, not mtime —
    * parse it with the dataset's layout pattern (e.g. `yyyy-MM-dd-HH`).
    * Unparseable names get a null `version_time` (callers decide:
    * protect or treat as deletable).
    */
  def withPathTime(versions: DataFrame, format: String): DataFrame =
    versions.withColumn("version_time",
      org.apache.spark.sql.functions.try_to_timestamp( // ANSI-safe null
        org.apache.spark.sql.functions.col("version"),
        org.apache.spark.sql.functions.lit(format)))

  /** Execute deletion of selected version paths (with the reference's
    * empty-parent cleanup, CleanableDatasetBase.java:82-119). Driver-
    * side: version counts are small; the data deleted is not.
    * `trashDir` mirrors the reference's Trash option: versions move
    * (rename — O(1) on HDFS-likes) under trash keeping their
    * dataset/version layout instead of being destroyed.
    */
  def deleteVersions(spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      trashDir: Option[String] = None): Int = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    var n = 0
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val removed = trashDir match {
        case Some(trash) if fs.exists(path) =>
          val dest = new Path(trash, s"${path.getParent.getName}/${path.getName}")
          fs.mkdirs(dest.getParent)
          fs.rename(path, dest)
        case None if fs.exists(path) => fs.delete(path, true)
        case _ => false
      }
      if (removed) {
        n += 1
        val parent = path.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty) fs.delete(parent, false)
      }
    }
    n
  }
}
