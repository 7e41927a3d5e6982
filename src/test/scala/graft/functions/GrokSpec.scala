package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Converters

class GrokSpec extends SparkSpec {
  import spark.implicits._

  test("compile expands refs into ordered captures; unnamed refs don't capture") {
    val c = Grok.compile("^%{IP:client} %{WORD} %{NOTSPACE:path} %{INT:code:int}$")
    assert(c.groups == Seq(("client", 1, "string"), ("path", 2, "string"), ("code", 3, "int")))
    val m = java.util.regex.Pattern.compile(c.regex)
      .matcher("10.1.2.3 GET /idx?q=1 404")
    assert(m.matches())
    assert(m.group(1) == "10.1.2.3" && m.group(2) == "/idx?q=1" && m.group(3) == "404")
  }

  test("nested dictionary refs expand recursively (IPORHOST, TIMESTAMP_ISO8601)") {
    val c = Grok.compile("%{IPORHOST:host} %{TIMESTAMP_ISO8601:when}")
    val m = java.util.regex.Pattern.compile(c.regex)
      .matcher("db-01.example.com 2024-03-05T10:20:30Z")
    assert(m.matches() && m.group(1) == "db-01.example.com")
    val ip = java.util.regex.Pattern.compile(c.regex)
      .matcher("192.168.0.9 2024-03-05 10:20:30")
    assert(ip.matches() && ip.group(1) == "192.168.0.9")
  }

  test("errors: unknown pattern, unknown cast type, cycle") {
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
    intercept[IllegalArgumentException](Grok.compile("%{WORD:x:varchar}"))
    intercept[IllegalArgumentException](
      Grok.compile("%{A:x}", patterns = Map("A" -> "%{B}", "B" -> "%{A}")))
  }

  test("grok converter parses typed columns from log lines") {
    val logs = Seq(
      "10.0.0.1 GET /a 200",
      "10.0.0.2 POST /b 503",
      "not a log line").toDF("line")
    val out = Converters.grok("line",
      "^%{IP:client} %{WORD:method} %{NOTSPACE:path} %{INT:status:int}$")(logs)
    val rows = out.collect()
    assert(out.schema("status").dataType.typeName == "integer")
    assert(rows(0).getString(0) == "10.0.0.1" && rows(0).getInt(3) == 200)
    // non-matching lines -> null fields across all types
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(0))
  }
}
