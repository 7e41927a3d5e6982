package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  * One parquet file per table under a scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft session needs. `nanosAsLong`: the
    * events table carries parquet TIMESTAMP(NANOS), which Spark only
    * reads via this legacy conf (as a nanos long); [[load]] converts it
    * back to a microsecond timestamp, matching engines (DuckDB,
    * pyarrow→us) that truncate ns→us on read.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer div, not double (ns since epoch exceeds double's 2^53)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
