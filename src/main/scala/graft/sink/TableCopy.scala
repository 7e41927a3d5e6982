package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.ColumnShim

import graft.operators.FsCopy

/** Catalog-to-catalog table replication — the metadata half of distcp
  * (ref gobblin-data-management/.../copy/hive/HiveCopyEntityHelper
  * .java: table DDL replication + per-partition registration riding a
  * file copy; HiveDatasetFinder selects the tables). Spark-first: the
  * file copy is [[FsCopy]]'s executor chunk tasks, the DDL is built
  * from the SOURCE table's catalog metadata (schema + partition
  * columns + format), and partition registration is RECOVER PARTITIONS
  * over the copied layout — the same calls work on the in-memory
  * catalog locally and a Hive metastore in production.
  */
object TableCopy {

  final case class TableCopyResult(files: Long, bytes: Long, destTable: String)

  /** Replicate `srcTable` (data + definition + partitions) to
    * `destTable` at `destLocation`. `copyData=false` does a
    * metadata-only copy (both tables over the same files — the
    * reference's same-cluster "register elsewhere" mode).
    */
  def copyTable(spark: SparkSession, srcTable: String, destTable: String,
      destLocation: String, copyData: Boolean = true,
      splitSize: Long = 128L * 1024 * 1024): TableCopyResult = {
    val meta = ColumnShim.tableMetadata(spark, srcTable)
    val srcLoc = meta.location.toString
    val result =
      if (copyData) FsCopy.execute(FsCopy.plan(spark, srcLoc, destLocation, splitSize))
      else FsCopy.CopyResult(0L, 0L)
    val loc = if (copyData) destLocation else srcLoc
    val provider = meta.provider.getOrElse("parquet")
    val partCols = meta.partitionColumnNames
    // replicate the DEFINITION explicitly (schema incl. partition
    // columns + PARTITIONED BY), not schema-on-read inference — the
    // copy must match the source even over an empty directory
    val colsDdl = meta.schema.toDDL
    val partClause =
      if (partCols.isEmpty) "" else partCols.mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $destTable ($colsDdl) " +
      s"USING $provider$partClause LOCATION '$loc'")
    if (partCols.nonEmpty) spark.catalog.recoverPartitions(destTable)
    spark.catalog.refreshTable(destTable)
    TableCopyResult(result.files, result.bytes, destTable)
  }
}
