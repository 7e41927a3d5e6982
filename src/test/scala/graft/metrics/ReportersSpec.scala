package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reporters: exact wire lines for Graphite plaintext and InfluxDB
  * line protocol, including the escaping rules the gate's plain
  * values never exercise (spaces/commas/equals in tags, quotes and
  * backslashes in string fields, path sanitization).
  */
class ReportersSpec extends graft.SparkSpec {

  test("graphite lines sanitize path segments and fix the timestamp") {
    import spark.implicits._
    val df = Seq(
      ("web crawl/1", "en", 42.0),
      ("wiki.dump", "pt-BR", 7.25)).toDF("source", "lang", "value")
    val lines = Reporters.graphiteLines(df, "graft.corpus",
      Seq("source", "lang"), "value", tsSeconds = 1700000000L)
      .collect().sorted
    assert(lines.toSeq == Seq(
      "graft.corpus.web_crawl_1.en 42.0000 1700000000",
      "graft.corpus.wiki_dump.pt-BR 7.2500 1700000000"))
  }

  test("influx lines escape tags and quote string fields") {
    import spark.implicits._
    val df = Seq(
      ("us west,zone=1", "ok", 5L, 1.5, """says "hi" \ bye"""))
      .toDF("region", "status", "hits", "ratio", "note")
    val lines = Reporters.influxLines(df, "my metric",
      tagCols = Seq("region", "status"),
      longFields = Seq("hits"), doubleFields = Seq("ratio"),
      tsMillis = 1700000000000L, stringFields = Seq("note"))
      .collect()
    assert(lines.length == 1)
    assert(lines.head ==
      """my\ metric,region=us\ west\,zone\=1,status=ok """ +
        """hits=5i,ratio=1.5000,note="says \"hi\" \\ bye" """.trim +
        " 1700000000000000000")
  }

  test("influx requires at least one field") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("t", "v")
    val e = intercept[IllegalArgumentException](
      Reporters.influxLines(df, "m", Seq("t"), Nil, Nil, 0L))
    assert(e.getMessage.contains("field"))
  }

  test("lines are a distributed dataset, not a driver loop") {
    import spark.implicits._
    val df = spark.range(1000).select(
      concat(lit("s"), pmod(col("id"), lit(7))).as("source"),
      col("id").cast("double").as("value"))
    val ds = Reporters.graphiteLines(df, "p", Seq("source"), "value", 1L)
    assert(ds.rdd.getNumPartitions >= 1)
    assert(ds.count() == 1000)
  }
}
