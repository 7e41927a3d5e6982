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

  test("fetch schedule: exact agent delay beats *, default fills gaps, last directive wins") {
    val robots = Seq(
      ("a", "User-agent: *\nCrawl-delay: 7\nUser-agent: bot\nCrawl-delay: 2"),
      ("b", "User-agent: *\nCrawl-delay: 4"),
      // two delays in ONE group: the last wins
      ("d", "User-agent: bot\nCrawl-delay: 9\nCrawl-delay: 3"))
      .toDF("domain", "content")
    val fl = Seq(
      ("a/1", "a", 9L, 1L, 0L), ("a/2", "a", 8L, 2L, 1L),
      ("b/1", "b", 7L, 3L, 0L), ("c/1", "c", 6L, 4L, 0L),
      ("c/2", "c", 5L, 5L, 1L), ("d/1", "d", 4L, 6L, 0L),
      ("d/2", "d", 3L, 7L, 1L))
      .toDF("url", "host", "score", "sel_rank", "fetch_slot")
    val r = CrawlFrontier.scheduleFetch(fl, "host",
        Robots.delaysTable(robots, "domain", "content"), "Bot",
        defaultDelaySec = 30)
      .select("url", "fetch_at").as[(String, Long)].collect().toMap
    assert(r == Map("a/1" -> 0L, "a/2" -> 2L, // exact agent: 2, not 7
      "b/1" -> 0L, "c/1" -> 0L, "c/2" -> 30L, // no robots: default
      "d/1" -> 0L, "d/2" -> 3L)) // last directive in group wins
  }

  test("scheduleFetch preserves a caller-supplied 'domain' column") {
    import spark.implicits._
    val robots = Seq(("a", "User-agent: *\nCrawl-delay: 2"))
      .toDF("domain", "content")
    val fl = Seq(("a/1", "a", "keep-me", 1L, 1L))
      .toDF("url", "host", "domain", "sel_rank", "fetch_slot")
    val out = CrawlFrontier.scheduleFetch(fl, "host",
      Robots.delaysTable(robots, "domain", "content"), "bot",
      defaultDelaySec = 30)
    assert(out.columns.count(_ == "domain") == 1,
      "the caller's domain column must survive, the join side's must not")
    assert(out.select("domain", "fetch_at").as[(String, Long)]
      .collect().toSeq == Seq(("keep-me", 2L)))
  }

  test("crawl-delay parsing is resilient: fractional ceils, junk skipped") {
    // fractional values (common in the wild) round UP to whole seconds
    assert(Robots.parseDelays("h", "User-agent: *\nCrawl-delay: 0.5") ==
      Seq("*" -> 1L))
    assert(Robots.parseDelays("h", "User-agent: *\nCrawl-delay: 2.0") ==
      Seq("*" -> 2L))
    // non-numeric, orphaned, and negative directives are SKIPPED (one
    // messy host must not fail a corpus-wide scheduling job) — other
    // directives in the same file survive
    assert(Robots.parseDelays("h",
      "User-agent: *\nCrawl-delay: soon").isEmpty)
    assert(Robots.parseDelays("h", "Crawl-delay: 5").isEmpty)
    assert(Robots.parseDelays("h",
      "User-agent: *\nCrawl-delay: -1").isEmpty)
    assert(Robots.parseDelays("h",
      "User-agent: a\nCrawl-delay: NaN\n\nUser-agent: b\nCrawl-delay: 3") ==
      Seq("b" -> 3L))
    // consecutive UA lines share the group; unrelated directives ignored
    assert(Robots.parseDelays("h",
      "User-agent: a\nUser-agent: b\nSitemap: x\nUser-agent: c\nCrawl-delay: 5") ==
      Seq("c" -> 5L))
  }

  test("redirect chains resolve to their terminal with exact hop counts") {
    // chains: a1->a2->a3->T (T has no out-edge), b1->T
    val edges = Seq(("a1", "a2"), ("a2", "a3"), ("a3", "T"), ("b1", "T"))
      .toDF("src", "dst")
    val r = CrawlFrontier.resolveRedirects(edges, "src", "dst", maxHops = 8)
      .select("src", "target", "hops", "resolved")
      .as[(String, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r == Seq(("a1", "T", 3L, true), ("a2", "T", 2L, true),
      ("a3", "T", 1L, true), ("b1", "T", 1L, true)))
  }

  test("loops and over-long chains come back unresolved with NULL target") {
    // 2-cycle c1<->c2; a feeder into the cycle; a 10-hop chain past cap 8
    val longChain = (0 until 10).map(i => (s"n$i", s"n${i + 1}"))
    val edges = (Seq(("c1", "c2"), ("c2", "c1"), ("feed", "c1")) ++ longChain)
      .toDF("src", "dst")
    val r = CrawlFrontier.resolveRedirects(edges, "src", "dst", maxHops = 8)
      .collect().map(x => x.getString(0) -> ((Option(x.getString(1)),
        if (x.isNullAt(2)) -1L else x.getLong(2), x.getBoolean(3))))
      .toMap
    assert(r("c1") == ((None, -1L, false)))
    assert(r("c2") == ((None, -1L, false)))
    assert(r("feed") == ((None, -1L, false)))
    // n0 needs 10 hops > 8: unresolved; n3 needs 7: resolved
    assert(r("n0") == ((None, -1L, false)))
    assert(r("n3") == ((Some("n10"), 7L, true)))
    assert(r("n9") == ((Some("n10"), 1L, true)))
  }

  test("redirect resolution equals a reference step-walk on 20 random functional graphs") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 20) {
      val n = 20 + rnd.nextInt(40)
      // ~70% of nodes redirect somewhere (self-loops and cycles allowed)
      val edges = (0 until n).filter(_ => rnd.nextInt(10) < 7)
        .map(i => (s"v$i", s"v${rnd.nextInt(n)}"))
      if (edges.nonEmpty) {
        val maxHops = 4 + rnd.nextInt(12)
        val m = edges.toMap
        def walk(src: String): (Option[String], Option[Long], Boolean) = {
          var cur = m(src)
          var hops = 1L
          while (hops < maxHops && m.contains(cur)) { cur = m(cur); hops += 1 }
          if (m.contains(cur)) (None, None, false) // still redirecting past cap
          else (Some(cur), Some(hops), true)
        }
        val got = CrawlFrontier.resolveRedirects(
            edges.toDF("src", "dst"), "src", "dst", maxHops)
          .collect().map(x => x.getString(0) -> ((Option(x.getString(1)),
            if (x.isNullAt(2)) None else Some(x.getLong(2)), x.getBoolean(3))))
          .toMap
        edges.foreach { case (src, _) =>
          assert(got(src) == walk(src),
            s"trial $trial src $src: ${got(src)} != ${walk(src)} (maxHops=$maxHops)")
        }
      }
    }
  }

  test("a src with two redirect targets is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      CrawlFrontier.resolveRedirects(
        Seq(("a", "b"), ("a", "c")).toDF("src", "dst"), "src", "dst")
    }
    assert(e.getMessage.contains("multiple"))
  }

  test("resolution is partitioning-invariant on a 5k-chain forest") {
    val edges = (0 until 5000).filter(_ % 9 != 0)
      .map(i => (s"u$i", s"u${i - 1}"))
    def run(parts: Int) = CrawlFrontier.resolveRedirects(
        edges.toDF("src", "dst").repartition(parts), "src", "dst",
        maxHops = 16)
      .select("src", "target", "hops", "resolved")
      .as[(String, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = run(2)
    assert(a == run(11))
    assert(a.forall(_._4)) // chains of length <= 8 all resolve
    // spot-check an exact chain: u17 -> ... -> u9 (terminal: 9 % 9 == 0)
    assert(a.find(_._1 == "u17").get == (("u17", "u9", 8L, true)))
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
