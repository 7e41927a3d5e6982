package graft.runner

import graft.SparkSpec
import graft.runner.FlowCompiler.{DatasetDescriptor, FlowSpec}

class FlowCatalogSpec extends SparkSpec {

  private def spec(n: String, maxval: String) = FlowSpec(
    n, "landing", "mart",
    input = DatasetDescriptor(format = "parquet"),
    output = DatasetDescriptor(format = "table", platform = "hive"),
    config = Map("work" -> "/tmp/w", "maxval" -> maxval))

  test("put assigns monotone versions; get returns the current one") {
    val cat = new FlowCatalog(tmpDir("flowcat"))
    assert(cat.list().isEmpty && cat.get("f").isEmpty)
    assert(cat.put(spec("f", "100")) === "v1")
    assert(cat.put(spec("f", "200")) === "v2")
    assert(cat.versions("f") === Seq("v1", "v2"))
    assert(cat.currentVersion("f").contains("v2"))
    assert(cat.get("f").map(_.config("maxval")).contains("200"))
    // history stays readable; descriptors and config round-trip exactly
    assert(cat.get("f", "v1").contains(spec("f", "100")))
  }

  test("multiple flows are isolated; remove drops history") {
    val cat = new FlowCatalog(tmpDir("flowcat2"))
    cat.put(spec("a", "1")); cat.put(spec("b", "2")); cat.put(spec("b", "3"))
    assert(cat.list() === Seq("a", "b"))
    assert(cat.versions("a") === Seq("v1"))
    assert(cat.remove("b") && cat.get("b").isEmpty && cat.versions("b").isEmpty)
    assert(cat.get("a").map(_.config("maxval")).contains("1"))
  }

  test("render/parse round-trips every field, rejects malformed input") {
    val s = spec("rt", "42")
    assert(FlowCatalog.parse(FlowCatalog.render(s)) === s)
    intercept[IllegalArgumentException](FlowCatalog.parse("flow.name only"))
    intercept[IllegalArgumentException](FlowCatalog.parse("flow.name=x\n"))
  }

  test("flow names must be plain path segments") {
    val cat = new FlowCatalog(tmpDir("flowcat3"))
    intercept[IllegalArgumentException](cat.put(spec("a/b", "1")))
    intercept[IllegalArgumentException](cat.put(spec("_meta", "1")))
    intercept[IllegalArgumentException](cat.put(spec("", "1")))
  }
}
