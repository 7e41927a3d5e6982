package graft.sink

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** TableCopy: a partitioned table created in one database is fully
  * queryable (schema, partitions, data) after copy into another.
  */
class TableCopySpec extends SparkSpec {

  test("cross-database table copy replicates definition, partitions, and data") {
    val root = tmpDir("tcopy")
    spark.sql("CREATE DATABASE IF NOT EXISTS src_db")
    spark.sql("CREATE DATABASE IF NOT EXISTS dst_db")
    spark.sql("DROP TABLE IF EXISTS src_db.ev")
    spark.sql("DROP TABLE IF EXISTS dst_db.ev_copy")

    // source table: partitioned external table in src_db
    Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.partitionBy("event_type").parquet(s"$root/src_data")
    val spec = SinkSpec(s"$root/unused_staging", s"$root/src_data",
      partitionBy = Seq("event_type"))
    new CatalogPublisher(spark).register(spec, "src_db.ev")
    val srcCount = spark.table("src_db.ev").count()
    assert(srcCount > 0)

    val res = TableCopy.copyTable(spark, "src_db.ev", "dst_db.ev_copy", s"$root/dst_data")
    assert(res.files > 0)

    val copy = spark.table("dst_db.ev_copy")
    assert(copy.count() == srcCount)
    assert(copy.schema.fieldNames.sorted.toSeq ==
      spark.table("src_db.ev").schema.fieldNames.sorted.toSeq)
    // partitions replicated in the catalog, not just on disk
    val parts = spark.sql("SHOW PARTITIONS dst_db.ev_copy").count()
    assert(parts == spark.sql("SHOW PARTITIONS src_db.ev").count() && parts > 0)
    // value-exact replica
    assert(copy.exceptAll(spark.table("src_db.ev")).isEmpty)
    assert(spark.table("src_db.ev").exceptAll(copy).isEmpty)
  }

  test("metadata-only copy registers a second table over the same files") {
    val root = tmpDir("tcopy_meta")
    spark.sql("CREATE DATABASE IF NOT EXISTS src_db")
    spark.sql("DROP TABLE IF EXISTS src_db.docs")
    spark.sql("DROP TABLE IF EXISTS src_db.docs_alias")
    Tables.load(spark, sf(), "documents").select("doc_id", "n_chars")
      .write.parquet(s"$root/docs")
    new CatalogPublisher(spark).register(
      SinkSpec(s"$root/x", s"$root/docs"), "src_db.docs")
    val res = TableCopy.copyTable(spark, "src_db.docs", "src_db.docs_alias",
      destLocation = "ignored", copyData = false)
    assert(res.files == 0)
    assert(spark.table("src_db.docs_alias").count() ==
      spark.table("src_db.docs").count())
  }
}
