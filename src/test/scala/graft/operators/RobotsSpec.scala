package graft.operators

import graft.SparkSpec

/** robots.txt parsing and RFC 9309 decision semantics: group
  * selection, longest-match, Allow-wins-ties, fallbacks, and the
  * relational filter's row-preservation contract.
  */
class RobotsSpec extends SparkSpec {

  test("parse: groups, shared agent runs, comments, unknown directives") {
    val rules = Robots.parseRules("ex.com",
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

  test("parse: wildcard rules kept verbatim; orphan rules fail loudly") {
    assert(Robots.parseRules("ex.com", "User-agent: *\nDisallow: /a*") ==
      Seq(("*", false, "/a*")))
    assert(Robots.parseRules("ex.com", "User-agent: *\nDisallow: /a$") ==
      Seq(("*", false, "/a$")))
    val e = intercept[IllegalArgumentException](
      Robots.parseRules("ex.com", "Disallow: /a"))
    assert(e.getMessage.contains("ex.com"), "domain must be in the error")
  }

  test("pattern→regex translation: *, trailing $, metachars, inner $") {
    assert(Robots.patternRegex("/a*/b") == "^/a.*/b")
    assert(Robots.patternRegex("/x.php$") == "^/x\\.php$")
    assert(Robots.patternRegex("/*?session") == "^/.*\\?session")
    // inner $ is a literal octet, only the trailing one anchors
    assert(Robots.patternRegex("/a$b$") == "^/a\\$b$")
    assert(Robots.patternRegex("/p(1)[2]{3}|x") == "^/p\\(1\\)\\[2\\]\\{3\\}\\|x")
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

  test("wildcard rules: * spans octets, $ anchors, specificity by pattern octets") {
    // Disallow /pdf/*.pdf$ (10 octets) vs Allow /pdf/open (9): the
    // Disallow is MORE specific wherever both match
    val txt = "User-agent: *\nDisallow: /pdf/*.pdf$\nAllow: /pdf/open"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/pdf/a.pdf",        // wildcard blocks
      2L -> "https://ex.com/pdf/a.pdf?x",      // $ anchor: not end -> allowed
      3L -> "https://ex.com/pdf/open/x.html",  // Allow prefix, no .pdf end
      4L -> "https://ex.com/pdf/open/x.pdf",   // both match; Disallow longer
      5L -> "https://ex.com/pdf/sub/dir/deep.pdf", // * spans octets
      6L -> "https://ex.com/docs/a.pdf"), "anybot")
    assert(allowed == Set(2L, 3L, 6L))
  }

  test("wildcard rules: mid-path *, overlapping patterns, Allow tie-break") {
    // /*?session (9) blocks any path carrying ?session; Allow
    // /login*?session (15) carves the login flow back out; a 9-octet
    // Allow /fight*ok ties a 9-octet Disallow -> Allow wins
    val txt = "User-agent: *\nDisallow: /*?session\nAllow: /login*?session\n" +
      "Disallow: /fight*ok\nAllow: /fight*ok"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/cart?session=9",
      2L -> "https://ex.com/login?session=9",
      3L -> "https://ex.com/login/two?session=9",
      4L -> "https://ex.com/fight/ok",
      5L -> "https://ex.com/plain"), "anybot")
    assert(allowed == Set(2L, 3L, 4L, 5L))
  }

  test("parseSitemaps: global directive, any case, value keeps its colons") {
    val txt =
      """User-agent: a
        |Disallow: /x
        |SITEMAP: https://ex.com/s1.xml  # trailing comment
        |User-agent: b
        |sitemap: https://ex.com/s2.xml?k=v:w
        |Sitemap:
        |NotASitemap: https://ex.com/no
        |""".stripMargin
    assert(Robots.parseSitemaps(txt) ==
      Seq("https://ex.com/s1.xml", "https://ex.com/s2.xml?k=v:w"))
    assert(Robots.parseSitemaps("") == Seq.empty)
  }

  test("specificity ranks by OCTETS, not UTF-16 chars") {
    // Allow /éé = 3 chars but 5 UTF-8 octets; Disallow /*bc = 4 chars
    // and 4 octets. On path /éébc both match: char ranking would pick
    // the Disallow (4 > 3), the RFC's octet ranking picks the Allow
    // (5 > 4) — the URL must survive.
    val txt = "User-agent: *\nAllow: /éé\nDisallow: /*bc"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/éébc",
      2L -> "https://ex.com/xxbc"), "anybot") // only the Disallow matches
    assert(allowed == Set(1L))
  }

  test("percent-encoded octets match literally: %2F is not a slash") {
    val txt = "User-agent: *\nDisallow: /a%2Fb"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com/a%2Fb/x", // encoded form blocked
      2L -> "https://ex.com/a/b/x"),  // decoded form is a DIFFERENT path
      "anybot")
    assert(allowed == Set(2L))
  }

  test("URL with no path component matches as / per the RFC") {
    val txt = "User-agent: *\nDisallow: /$\nAllow: /home"
    val allowed = runFilter(txt, Seq(
      1L -> "https://ex.com",        // path "/" -> blocked by /$
      2L -> "https://ex.com/",       // explicit "/" -> blocked
      3L -> "https://ex.com/home"), "anybot")
    assert(allowed == Set(3L))
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
