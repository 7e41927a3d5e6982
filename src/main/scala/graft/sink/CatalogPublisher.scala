package graft.sink

import org.apache.spark.sql.SparkSession

/** Publish-and-register: after files land in the output dir, make them
  * queryable by NAME — create/update the table in the Spark session
  * catalog and sync its partitions. This is the reference's Hive
  * registration seam (gobblin-hive-registration/.../hive/HiveRegister
  * .java:61 createOrAlterTable + addOrAlterPartition;
  * HiveRegistrationPublisher runs it after BaseDataPublisher), rebuilt
  * on the catalog Spark already ships: the same calls register into
  * the in-memory catalog locally and into a real Hive metastore when
  * the session has one — no Thrift client of our own.
  *
  * Idempotent by construction: CREATE IF NOT EXISTS + RECOVER
  * PARTITIONS + refresh; re-registering after every publish is safe
  * and cheap (partition listing only — the reference's repeated
  * register-per-publish behaves the same way).
  */
final class CatalogPublisher(spark: SparkSession) {

  /** Register (or re-sync) `table` as an external table over the
    * spec's output dir. Safe to call after every publish.
    */
  def register(spec: SinkSpec, table: String): Unit = {
    if (!spark.catalog.tableExists(table)) {
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING ${spec.format} " +
        s"LOCATION '${spec.outputDir}'")
    }
    // partitions added by later publishes aren't in the catalog until
    // recovered (MSCK REPAIR semantics); unpartitioned tables just
    // need the file-index refresh
    if (spec.partitionBy.nonEmpty) spark.catalog.recoverPartitions(table)
    spark.catalog.refreshTable(table)
  }

  /** Publish staged data, then register: the full
    * HiveRegistrationPublisher flow in one call. Returns moved entries.
    */
  def publishAndRegister(publisher: Publisher, spec: SinkSpec, table: String,
      overwritePartitions: Boolean = false): Int = {
    val moved =
      if (overwritePartitions) publisher.publishOverwritePartitions(spec)
      else publisher.publish(spec)
    register(spec, table)
    moved
  }
}
