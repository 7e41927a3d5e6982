package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** canonicalizeUrl edge matrix: every rule, the documented
  * contract boundaries, and idempotence.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Text.canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq

  test("scheme/host lower-case, default ports stripped, others kept") {
    assert(canon(
      "HTTP://Ex.COM/Path", "http://ex.com:80/Path", "https://ex.com:443/Path",
      "http://ex.com:8080/Path", "https://ex.com:8443/Path") ==
      Seq("http://ex.com/Path", "http://ex.com/Path", "https://ex.com/Path",
        "http://ex.com:8080/Path", "https://ex.com:8443/Path"))
  }

  test("path case is PRESERVED; missing path becomes /") {
    assert(canon("http://ex.com", "http://ex.com/", "http://EX.com/MiXeD") ==
      Seq("http://ex.com/", "http://ex.com/", "http://ex.com/MiXeD"))
  }

  test("fragments are stripped") {
    assert(canon("http://ex.com/a#sec", "http://ex.com/a?x=1#sec") ==
      Seq("http://ex.com/a", "http://ex.com/a?x=1"))
  }

  test("query params: tracking dropped, empties dropped, survivors sorted, bare ? dropped") {
    assert(canon(
      "http://ex.com/a?b=2&a=1",
      "http://ex.com/a?a=1&b=2",
      "http://ex.com/a?utm_source=tw&a=1&gclid=xyz",
      "http://ex.com/a?a=1&utm_campaign=x&",
      "http://ex.com/a?utm_medium=email",
      "http://ex.com/a?fbclid=1&msclkid=2&mc_eid=3") ==
      Seq("http://ex.com/a?a=1&b=2",
        "http://ex.com/a?a=1&b=2",
        "http://ex.com/a?a=1",
        "http://ex.com/a?a=1",
        "http://ex.com/a",
        "http://ex.com/a"))
  }

  test("a param merely CONTAINING a tracking name survives; only prefixes match") {
    // sutm_source / autm_x are not tracking params; utm_anything= is
    assert(canon("http://ex.com/a?sutm_source=1&utm_x=2") ==
      Seq("http://ex.com/a?sutm_source=1"))
  }

  test("schemeless strings keep body but still lose fragment/query decoration") {
    assert(canon("relative/path#frag", "no-scheme?utm_source=x&k=v") ==
      Seq("relative/path", "no-scheme?k=v"))
  }

  test("sitemapEntries: optional fields NULL when absent, loc-less blocks skipped, entities decoded") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> https://a.com/x?p=1&amp;q=2 </loc><lastmod>2024-01-02</lastmod><priority>0.8</priority></url>
        |<url><loc>https://a.com/y</loc></url>
        |<url><lastmod>2024-05-05</lastmod></url>
        |<url><priority>not-a-number</priority><loc>https://a.com/z</loc></url>
        |</urlset>""".stripMargin
    val r = Seq(xml).toDF("xml")
      .select(explode(Text.sitemapEntries(col("xml"))).as("e"))
      .select(col("e.url"), col("e.lastmod"), col("e.priority"))
      .as[(String, Option[String], Option[Double])].collect().toSeq
    assert(r == Seq(
      ("https://a.com/x?p=1&q=2", Some("2024-01-02"), Some(0.8)),
      ("https://a.com/y", None, None),
      ("https://a.com/z", None, None))) // junk priority -> NULL cast
  }

  test("sitemapIndexEntries: loc + optional lastmod; root tag never matches") {
    val xml =
      """<?xml version="1.0"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc> https://a.com/s1.xml?x=1&amp;y=2 </loc>
        |    <lastmod>2024-03-01</lastmod></sitemap>
        |  <sitemap><loc>https://a.com/s2.xml</loc></sitemap>
        |  <sitemap><lastmod>2024-01-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val r = Seq(xml).toDF("xml")
      .select(explode(Text.sitemapIndexEntries(col("xml"))).as("e"))
      .select(col("e.url"), col("e.lastmod"))
      .as[(String, Option[String])].collect().toSeq
    assert(r == Seq(
      ("https://a.com/s1.xml?x=1&y=2", Some("2024-03-01")),
      ("https://a.com/s2.xml", None))) // loc-less block skipped
  }

  test("outlinks: quote styles, attribute order/case, multi-token rel, href-less skipped") {
    val html =
      """<a href="http://a/1">x</a>
        |<a rel='nofollow' href='http://a/2'>y</a>
        |<A HREF="http://a/3?p=1&amp;q=2" REL="ugc NoFollow">z</A>
        |<a rel="noopener" href="http://a/4">w</a>
        |<a name="anchor-only">skip</a>
        |<a href="">empty-skip</a>""".stripMargin
    val r = Seq(html).toDF("html")
      .select(explode(Text.outlinks(col("html"))).as("l"))
      .select(col("l.url"), col("l.nofollow"))
      .as[(String, Boolean)].collect().toSeq
    assert(r == Seq(
      ("http://a/1", false), ("http://a/2", true),
      ("http://a/3?p=1&q=2", true), ("http://a/4", false)))
  }

  test("outlinks: hyphenated attrs don't alias; mixed quotes stay intact") {
    val html =
      """<a data-href="http://bad/1" name="x">no-href-skip</a>
        |<a href="http://a/1" data-rel="nofollow">follow</a>
        |<a href='http://a/2"q'>double-quote-in-value</a>
        |<a href="http://a/3'q">single-quote-in-value</a>""".stripMargin
    val r = Seq(html).toDF("html")
      .select(explode(Text.outlinks(col("html"))).as("l"))
      .select(col("l.url"), col("l.nofollow"))
      .as[(String, Boolean)].collect().toSeq
    assert(r == Seq(
      ("http://a/1", false), // data-href is not an href, data-rel not a rel
      ("http://a/2\"q", false),
      ("http://a/3'q", false)))
  }

  test("idempotent: canonicalizing a canonical URL is a no-op") {
    val raw = Seq(
      "HTTP://Ex.COM:80?b=2&a=1#f", "https://h.io:8443/P?utm_source=t",
      "http://ex.com/a", "plain")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("fuzz: idempotent on 800 random URL-ish strings") {
    val rnd = new scala.util.Random(31337)
    val alphabet = "abcXYZ019:/?#&=._-%~ " + "://" + "utm_"
    val fuzz = (0 until 800).map { i =>
      val n = rnd.nextInt(60)
      val core = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      // bias half toward real-URL shapes so the deep branches run
      if (i % 2 == 0) s"HtTp://Ex$i.COM:${Seq("80", "443", "8080")(i % 3)}/$core"
      else core
    }
    val df = fuzz.toDF("url")
      .select(Text.canonicalizeUrl(col("url")).as("once"))
      .select(col("once"), Text.canonicalizeUrl(col("once")).as("twice"))
    val bad = df.filter(col("once") =!= col("twice")).collect()
    assert(bad.isEmpty,
      s"not idempotent: ${bad.take(3).map(_.toString).mkString("; ")}")
  }

  test("variants of one logical page collapse to a single key") {
    val variants = Seq(
      "HTTP://Site.Com/page?b=2&a=1#top",
      "http://site.com:80/page?a=1&b=2",
      "http://site.com/page?utm_source=x&a=1&b=2&")
    assert(canon(variants: _*).distinct.size == 1)
  }
}
