package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writes for co-located joins: both sides bucketed and
  * sorted by the join key join with ZERO exchange — the pre-shuffle is
  * paid once at write time and amortized over every downstream join /
  * aggregation on that key. At 100 TB this converts the nightly
  * fact-to-fact join from the dominant shuffle into a local zip of
  * sorted buckets.
  *
  * Uses the session catalog (`saveAsTable` — bucket metadata must live
  * in a catalog; a path-based `save` silently drops bucketing).
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      // An earlier SESSION may have left the managed location on disk
      // with no entry in this session's catalog; saveAsTable then
      // refuses with LOCATION_ALREADY_EXISTS. Drop both halves.
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
