package graft.operators

import graft.SparkSpec

/** robots.txt parsing and RFC 9309 decision semantics: group
  * selection, longest-match, Allow-wins-ties, fallbacks, and the
  * relational filter's row-preservation contract.
  */
class RobotsSpec extends SparkSpec {

  test("parse: groups, shared agent runs, comments, unknown directives") {
    val rules = Robots.parseRules(1L,
      """# a comment
        |User-agent: GoodBot
        |User-agent: OtherBot
        |Disallow: /private/
        |Allow: /private/ok
        |Crawl-delay: 10
        |Sitemap: https://x/sitemap.xml
        |
        |User-agent: *
        |Disallow: /all/
        |Disallow:
        |""".stripMargin)
    assert(rules.toSet == Set(
      ("goodbot", false, "/private/"), ("otherbot", false, "/private/"),
      ("goodbot", true, "/private/ok"), ("otherbot", true, "/private/ok"),
      ("*", false, "/all/")))
  }

  test("parse: wildcard rules and orphan rules fail loudly") {
    intercept[IllegalArgumentException](
      Robots.parseRules(9L, "User-agent: *\nDisallow: /a*"))
    intercept[IllegalArgumentException](
      Robots.parseRules(9L, "User-agent: *\nDisallow: /a$"))
    intercept[IllegalArgumentException](
      Robots.parseRules(9L, "Disallow: /a"))
  }

  private def runFilter(robotsText: String, urls: Seq[(Long, String)],
      crawler: String): Set[Long] = {
    import spark.implicits._
    val robots = Seq(("ex.com", robotsText)).toDF("domain", "content")
    val rules = Robots.rulesTable(robots, "domain", "content")
    Robots.filterAllowed(urls.toDF("id", "url"), "url", rules, crawler)
      .collect().map(_.getLong(0)).toSet
  }

  test("longest match wins; Allow wins length ties; no rule = allowed") {
    val txt = "User-agent: *\nDisallow: /p/\nAllow: /p/ok\nAllow: /q/\nDisallow: /q/"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/p/blocked",
      2L -> "https://ex.com/p/ok/fine",
      3L -> "https://ex.com/other",
      4L -> "https://ex.com/q/tie-allow",
      5L -> "https://ex.com"), "anybot")
    assert(allowed == Set(2L, 3L, 4L, 5L))
  }

  test("exact agent group beats *, and then * rules do NOT apply") {
    val txt = "User-agent: *\nDisallow: /a/\n\nUser-agent: me\nDisallow: /b/"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/a/x", // * blocks, but 'me' group wins -> allowed
      2L -> "https://ex.com/b/x"), "Me")
    assert(allowed == Set(1L))
    val other = runFilter(txt, Seq(
      1L -> "https://ex.com/a/x",
      2L -> "https://ex.com/b/x"), "stranger")
    assert(other == Set(2L))
  }

  test("domains without rules pass; duplicate URL rows are preserved") {
    import spark.implicits._
    val robots = Seq(("ex.com", "User-agent: *\nDisallow: /x/"))
      .toDF("domain", "content")
    val rules = Robots.rulesTable(robots, "domain", "content")
    val urls = Seq((1L, "https://nowhere.com/x/a"), (2L, "https://ex.com/ok"),
      (2L, "https://ex.com/ok")).toDF("id", "url")
    val out = Robots.filterAllowed(urls, "url", rules, "bot").collect()
    assert(out.length == 3, "duplicates must survive the verdict join")
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
