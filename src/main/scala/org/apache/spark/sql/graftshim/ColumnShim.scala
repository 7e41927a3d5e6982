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
