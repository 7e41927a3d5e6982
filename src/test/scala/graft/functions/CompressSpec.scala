package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below prose, prose below noise") {
    val rnd = new scala.util.Random(11)
    val docs = Seq(
      ("rep", "the same phrase again " * 200),
      ("prose", Seq.fill(200)(Seq("spark", "join", "scan", "merge", "data",
        "table", "query", "filter")(rnd.nextInt(8))).mkString(" ")),
      ("noise", Array.fill(4000)((33 + rnd.nextInt(94)).toChar).mkString)
    ).toDF("kind", "text")
    val r = docs.select(col("kind"), DeflatePermille(col("text")).as("p"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r("rep") < r("prose"), s"$r")
    assert(r("prose") < r("noise"), s"$r")
    assert(r("rep") < 100 && r("noise") > 600, s"$r")
  }

  test("deterministic across evaluations; empty is 1000; null is null") {
    val docs = Seq(Some("abc abc abc"), Some(""), None).toDF("text")
    def run() = docs.select(DeflatePermille(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    val a = run()
    assert(a === run())
    assert(a(1) === 1000L && a(2) === -1L)
  }
}
