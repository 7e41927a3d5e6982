package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CrawlFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(rows: (String, String, Long)*) =
    rows.toDF("url", "host", "score")

  test("per-host cap binds before the global top-N") {
    // host a has the 4 best scores but only 2 may go; b and c fill up
    val sel = CrawlFrontier.generateFetchList(frontier(
      ("a/1", "a", 100), ("a/2", "a", 99), ("a/3", "a", 98), ("a/4", "a", 97),
      ("b/1", "b", 50), ("b/2", "b", 40), ("c/1", "c", 30)),
      "url", "host", "score", topN = 5, maxPerHost = 2)
      .orderBy("sel_rank")
      .select("url", "sel_rank", "fetch_slot")
      .as[(String, Long, Long)].collect().toSeq
    assert(sel == Seq(("a/1", 1L, 0L), ("a/2", 2L, 1L), ("b/1", 3L, 0L),
      ("b/2", 4L, 1L), ("c/1", 5L, 0L)))
  }

  test("global top-N truncates by score with url tie-break; slots follow selection") {
    val sel = CrawlFrontier.generateFetchList(frontier(
      ("h/z", "h", 10), ("h/a", "h", 10), ("g/m", "g", 10), ("g/n", "g", 5)),
      "url", "host", "score", topN = 3, maxPerHost = 9)
      .orderBy("sel_rank")
      .select("url", "fetch_slot").as[(String, Long)].collect().toSeq
    // score ties break url-ascending: g/m, h/a, h/z; g/n (score 5) cut
    assert(sel == Seq(("g/m", 0L), ("h/a", 0L), ("h/z", 1L)))
  }

  test("fetch list is deterministic across evaluations and partitionings") {
    val rnd = new scala.util.Random(3)
    val big = (0 until 2000).map(i =>
      (s"h${i % 37}/p$i", s"h${i % 37}", rnd.nextInt(100).toLong))
    def run(parts: Int) = CrawlFrontier.generateFetchList(
        frontier(big: _*).repartition(parts), "url", "host", "score",
        topN = 200, maxPerHost = 8)
      .select("url", "sel_rank", "fetch_slot")
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    val a = run(3)
    assert(a == run(17))
    assert(a.size == 200)
    assert(a.map(_._1).distinct.size == 200)
    // per-host politeness: slots within a host are 0..n-1, no gaps
    a.groupBy(_._1.takeWhile(_ != '/')).foreach { case (_, urls) =>
      assert(urls.map(_._3).sorted == (0L until urls.size).toSeq)
    }
  }

  test("a 150k-URL hot host contributes exactly maxPerHost; selection order total") {
    // the spam-domain shape: one host dominates discovery. The cap
    // must bound its contribution (WindowGroupLimit keeps the work
    // sort-bounded) and selection stays a total order.
    import spark.implicits._
    val hot = (0 until 150000).map(i => (s"hot/p$i", "hot", (i % 1000).toLong))
    val rest = (0 until 5000).map(i => (s"h${i % 500}/p$i", s"h${i % 500}",
      (i % 900).toLong))
    val sel = CrawlFrontier.generateFetchList(
        (hot ++ rest).toDF("url", "host", "score"),
        "url", "host", "score", topN = 1000, maxPerHost = 5)
      .select("url", "host", "score", "sel_rank")
      .as[(String, String, Long, Long)].collect().sortBy(_._4)
    assert(sel.length == 1000)
    assert(sel.count(_._2 == "hot") == 5)
    assert(sel.map(_._4).toSeq == (1L to 1000L))
    // strictly ordered by (score desc, url asc)
    sel.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
  }

  test("anchor text: top-k by frequency, anchor tie-break, totals over ALL anchors") {
    val links = Seq(
      ("s1", "d", "home"), ("s2", "d", "home"), ("s3", "d", "home"),
      ("s4", "d", "docs"), ("s5", "d", "docs"),
      ("s6", "d", "api"), ("s7", "d", "blog"),
      ("s8", "e", "x")).toDF("src", "dst", "anchor")
    val r = CrawlFrontier.anchorText(links, "dst", "anchor", k = 2)
      .orderBy("dst")
      .select("dst", "n_links", "n_anchors", "top_anchors")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(r == Seq(("d", 7L, 4L, "home:3|docs:2"), ("e", 1L, 1L, "x:1")))
  }

  test("anchor text drops null/empty anchors and ties break alphabetically") {
    val links = Seq(
      ("s1", "d", "b"), ("s2", "d", "a"), ("s3", "d", null), ("s4", "d", ""))
      .toDF("src", "dst", "anchor")
    val r = CrawlFrontier.anchorText(links, "dst", "anchor", k = 1)
      .select("n_links", "n_anchors", "top_anchors")
      .as[(Long, Long, String)].collect().toSeq
    assert(r == Seq((2L, 2L, "a:1")))
  }
}
