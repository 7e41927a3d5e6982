package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Metric wire-format reporters: Graphite plaintext and InfluxDB line
  * protocol — the reference ships both as pluggable metric reporters
  * (gobblin-modules/gobblin-metrics-graphite/.../GraphiteReporter.java,
  * gobblin-metrics-influxdb/.../InfluxDBReporter.java). Here the
  * renderers are pure codegen'd column expressions producing one wire
  * line per metric row, so a metrics DataFrame of any size sinks
  * through the normal distributed writers (files, client sinks) —
  * no driver-side formatting loop, no UDF.
  *
  * Formats follow the public specs:
  *  - Graphite plaintext: `path value unix_seconds`, path segments
  *    sanitized to [A-Za-z0-9_-].
  *  - InfluxDB line protocol: `measurement,t=v f=v ns`, with comma /
  *    space / equals escaping in identifiers, string field values
  *    quoted with backslash escapes, integer fields suffixed `i`,
  *    nanosecond timestamps.
  */
object Reporters {

  /** One dotted-path segment, sanitized the way the Graphite daemon
    * expects (anything outside [A-Za-z0-9_-] becomes '_').
    */
  def graphiteSegment(c: Column): Column =
    regexp_replace(c.cast("string"), "[^A-Za-z0-9_-]", "_")

  /** `prefix.seg1.seg2... value ts` — value rendered with a fixed
    * decimal format so lines are deterministic across engines.
    */
  def graphiteLines(df: DataFrame, prefix: String, pathCols: Seq[String],
      valueCol: String, tsSeconds: Long, decimals: Int = 4): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val path = concat_ws(".",
      (lit(prefix) +: pathCols.map(c => graphiteSegment(col(c)))): _*)
    df.select(concat_ws(" ", path,
        format_string(s"%.${decimals}f", col(valueCol).cast("double")),
        lit(tsSeconds.toString)).as("line"))
      .as[String]
  }

  private def escTag(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c.cast("string"),
      ",", "\\\\,"), "=", "\\\\="), " ", "\\\\ ")

  private def escMeasurement(s: String): String =
    s.replace(",", "\\,").replace(" ", "\\ ")

  /** InfluxDB line protocol over a metrics DataFrame: tag columns in
    * the given (deterministic) order, long fields `i`-suffixed,
    * double fields fixed-decimal, string fields quoted.
    */
  def influxLines(df: DataFrame, measurement: String, tagCols: Seq[String],
      longFields: Seq[String], doubleFields: Seq[String],
      tsMillis: Long, decimals: Int = 4,
      stringFields: Seq[String] = Nil): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val tagPart = tagCols.map(t =>
      concat(lit("," + escMeasurement(t) + "="), escTag(col(t))))
    val fieldParts =
      longFields.map(f => concat(lit(escMeasurement(f) + "="),
        col(f).cast("long").cast("string"), lit("i"))) ++
      doubleFields.map(f => concat(lit(escMeasurement(f) + "="),
        format_string(s"%.${decimals}f", col(f).cast("double")))) ++
      stringFields.map(f => concat(lit(escMeasurement(f) + "=\""),
        regexp_replace(regexp_replace(col(f).cast("string"),
          "\\\\", "\\\\\\\\"), "\"", "\\\\\""), lit("\"")))
    require(fieldParts.nonEmpty, "influx line needs at least one field")
    val fields = concat_ws(",", fieldParts: _*)
    val line = concat(
      concat(lit(escMeasurement(measurement)) +: tagPart: _*),
      lit(" "), fields, lit(" "), lit((tsMillis * 1000000L).toString))
    df.select(line.as("line")).as[String]
  }
}
