package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and catalyst `Expression` for custom
  * expressions. Spark 4 made this conversion `private[sql]`
  * (columnNodeSupport.scala), so the shim lives under the
  * org.apache.spark.sql package namespace — the same technique Spark
  * connector libraries use.
  */
object ColumnShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session function registry (private[sql] from the outside) — lets
    * GraftExtensions also register into an ALREADY-built session.
    */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  /** Hadoop conf with the session's SQL confs merged in (sessionState
    * is private[sql]) — what datasource readers ship to executors, so
    * executor-side footer/schema readers see the same settings.
    * newHadoopConf copies only EXPLICITLY-SET sql confs, while
    * ParquetToSparkSchemaConverter(conf) reads several keys with a
    * bare .toBoolean — plant their effective session values too.
    */
  def sessionHadoopConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.hadoop.conf.Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
    val conf = ss.newHadoopConf()
    Seq(SQLConf.PARQUET_BINARY_AS_STRING, SQLConf.PARQUET_INT96_AS_TIMESTAMP,
        SQLConf.CASE_SENSITIVE, SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
        SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
        SQLConf.PARQUET_FIELD_ID_READ_ENABLED)
      .foreach(e => conf.set(e.key, ss.conf.getConf(e).toString))
    conf
  }

  /** Catalog metadata for a (possibly db-qualified) table — location,
    * schema, partition columns; the session catalog is private[sql].
    */
  def tableMetadata(spark: org.apache.spark.sql.SparkSession, table: String)
      : org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val id = cs.sessionState.sqlParser.parseTableIdentifier(table)
    cs.sessionState.catalog.getTableMetadata(id)
  }
}
