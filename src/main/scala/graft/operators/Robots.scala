package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt politeness filtering (RFC 9309) — the compliance gate a
  * crawl-curation pipeline applies before a URL enters the corpus (or
  * retroactively, when a host's policy changes and already-crawled
  * pages must be purged). Semantics per the RFC / Google reference
  * implementation:
  *
  *  - group selection: the MOST SPECIFIC matching `User-agent` group
  *    (longest agent token that prefixes the crawler's name; `*` is
  *    the 0-length fallback), all of that group's rules;
  *  - rule matching: `*` matches any run of octets (including empty),
  *    a trailing `$` anchors the pattern at the end of the path
  *    (RFC 9309 §2.2.3); `$` anywhere else is a literal octet, like
  *    the Google reference matcher. Paths compare percent-ENCODED —
  *    `/a%2Fb` only matches the encoded form, never `/a/b`;
  *  - precedence: the most specific match wins, where specificity is
  *    the rule pattern's octet count (RFC "the match that has the
  *    most octets"); on equal specificity Allow wins; no matching
  *    rule = allowed.
  *
  * The decision is expressed RELATIONALLY: rules become a
  * `(domain, agent, allow, path, rx)` table (parsed once, O(hosts) —
  * config-sized next to the URL corpus; `rx` is the pre-translated
  * anchored regex, NULL for plain prefix rules), the URL table joins
  * on domain, prefix/regex match + most-specific-match resolve with
  * one `max_by` aggregation — a broadcast join + hash agg at 100 TB.
  * The wildcard regex only evaluates for the minority of rules that
  * carry one (`rx IS NULL` guards the fast `startsWith` path).
  *
  * Reference seam: the reference's compliance tier purges by dataset
  * descriptor (gobblin-compliance/.../HivePurgerSource.java); this is
  * the crawl-native analog keyed by robots policy.
  */
object Robots {

  /** Translate one RFC 9309 rule pattern to an anchored Java regex:
    * `*` → `.*`, trailing `$` → end anchor, everything else literal
    * (regex metacharacters escaped, inner `$` included). Only called
    * for patterns that actually carry a wildcard.
    */
  private[operators] def patternRegex(p: String): String = {
    val anchored = p.endsWith("$")
    val body = if (anchored) p.dropRight(1) else p
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c.toInt) >= 0 =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  private def isWild(p: String): Boolean =
    p.indexOf('*') >= 0 || p.endsWith("$")

  /** Parse one robots.txt body into (agent, allow, pattern) rows.
    * Rules attach to every agent of the preceding User-agent run
    * (consecutive User-agent lines share the group, per the RFC).
    * Comments (#) and unknown directives (Crawl-delay, Sitemap) are
    * ignored; `*`/`$` wildcard patterns are kept verbatim (they
    * translate to regexes in [[rulesTable]]). Rules before any
    * User-agent line are structurally invalid and fail loudly with
    * `ctx` (the domain) in the message.
    */
  def parseRules(ctx: String, text: String): Seq[(String, Boolean, String)] = {
    val out = Vector.newBuilder[(String, Boolean, String)]
    var agents: List[String] = Nil
    var inAgentRun = false
    text.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (inAgentRun) agents ::= value.toLowerCase
              else { agents = List(value.toLowerCase); inAgentRun = true }
            case "allow" | "disallow" =>
              inAgentRun = false
              if (agents.isEmpty)
                throw new IllegalArgumentException(
                  s"robots[$ctx]: $key rule before any User-agent line")
              // empty Disallow = allow everything (no rule)
              if (value.nonEmpty)
                agents.foreach(a => out += ((a, key == "allow", value)))
            case _ => inAgentRun = false // Sitemap, Crawl-delay, ...
          }
        }
      }
    }
    out.result()
  }

  /** Parse one robots.txt body into (agent, crawl-delay seconds)
    * rows — the politeness directive [[parseRules]] deliberately
    * skips (it is not part of RFC 9309, but real crawlers honor it).
    * Group semantics match [[parseRules]]: a delay attaches to every
    * agent of the preceding User-agent run; the LAST delay in a group
    * wins. Real-world robots.txt are messy, so this parser is
    * RESILIENT where [[parseRules]] is structural: fractional delays
    * (`Crawl-delay: 0.5`) round UP to whole seconds, and malformed
    * directives (non-numeric, negative, orphaned before any
    * User-agent line) are skipped for that directive only — one messy
    * host must not fail a corpus-wide scheduling job.
    */
  def parseDelays(ctx: String, text: String): Seq[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    var agents: List[String] = Nil
    var inAgentRun = false
    text.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (inAgentRun) agents ::= value.toLowerCase
              else { agents = List(value.toLowerCase); inAgentRun = true }
            case "crawl-delay" =>
              inAgentRun = false
              val d = try {
                val v = value.toDouble
                if (v.isNaN || v.isInfinite || v < 0) None
                else Some(math.ceil(v).toLong)
              } catch { case _: NumberFormatException => None }
              // skip malformed/orphaned directives: resilience beats
              // loudness for wild-content politeness hints
              if (agents.nonEmpty) d.foreach { sec =>
                agents.foreach(a => out += ((a, sec)))
              }
            case _ => inAgentRun = false
          }
        }
      }
    }
    // last directive per agent wins (stable order preserved otherwise)
    val all = out.result()
    val last = all.groupBy(_._1).map { case (a, xs) => a -> xs.last._2 }
    all.map(_._1).distinct.map(a => a -> last(a))
  }

  /** `Sitemap:` directive values of one robots.txt body — the crawl
    * DISCOVERY seeds (per the sitemaps.org convention the directive is
    * global, not part of any User-agent group, and may repeat). The
    * value keeps its own colons (`https://...`); malformed/empty lines
    * are skipped — discovery hints share [[parseDelays]]' resilience,
    * not [[parseRules]]' structural loudness.
    */
  def parseSitemaps(text: String): Seq[String] =
    text.split("\n").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(ci + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }

  /** `robots(domain, content)` rows → `(domain, sitemap_url)` rows —
    * the discovery table a crawl planner joins against fetched
    * sitemap content (see q_sitemap_discovery's 3-level chain:
    * robots → sitemap index → urlset).
    */
  def sitemapsTable(robots: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(domainCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (domain, text) =>
        parseSitemaps(if (text == null) "" else text).iterator
          .map(u => (domain, u))
      })
      .toDF("domain", "sitemap_url")
  }

  /** `robots(domain, content)` rows → `(domain, agent, delay_sec)`
    * rows (the relational form [[graft.operators.CrawlFrontier.scheduleFetch]]
    * joins).
    */
  def delaysTable(robots: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(domainCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (domain, text) =>
        parseDelays(domain, if (text == null) "" else text).iterator.map {
          case (agent, d) => (domain, agent, d)
        }
      })
      .toDF("domain", "agent", "delay_sec")
  }

  /** `robots(domain, content)` text rows → `(domain, agent, allow,
    * path, rx)` rule rows (the relational form [[filterAllowed]]
    * joins). `path` is the verbatim rule pattern; `rx` is its
    * anchored regex translation when the pattern carries `*`/`$`
    * wildcards, NULL for plain prefix rules (the common case, which
    * keeps the fast `startsWith` match path).
    */
  def rulesTable(robots: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(domainCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (domain, text) =>
        parseRules(domain, if (text == null) "" else text).iterator.map {
          case (agent, allow, path) =>
            (domain, agent, allow, path,
              if (isWild(path)) patternRegex(path) else null)
        }
      })
      .toDF("domain", "agent", "allow", "path", "rx")
  }

  /** Filter `urls` to those the `crawler` may fetch under `rules`
    * (for the exact-match agent group or the `*` fallback — longest
    * agent name wins; then the most specific rule by pattern octet
    * count, Allow on ties; URLs with no matching group or rule pass).
    * `rules` is a [[rulesTable]] frame; a URL with no path component
    * matches as `/` per the RFC. `urls` needs (urlCol); the url's
    * domain and path derive via the shared Text helpers.
    */
  def filterAllowed(urls: DataFrame, urlCol: String, rules: DataFrame,
      crawler: String): DataFrame = {
    import graft.functions.Text
    val crawlerLc = crawler.toLowerCase
    // the crawler's group per domain: exact name beats *, per RFC
    val groups = rules
      .filter(col("agent") === crawlerLc || col("agent") === "*")
      .groupBy("domain")
      .agg(max(when(col("agent") === crawlerLc, 1).otherwise(0)).as("has_exact"))
    val applicable = rules
      .filter(col("agent") === crawlerLc || col("agent") === "*")
      .join(groups, "domain")
      .filter((col("has_exact") === 1 && col("agent") === crawlerLc) ||
        (col("has_exact") === 0 && col("agent") === "*"))
      .select(col("domain"), col("allow"), col("path"), col("rx"))
    val withParts = urls
      .withColumn("_domain", Text.urlDomain(col(urlCol)))
      .withColumn("_path",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)?", 1))
      // regexp_extract yields "" when the URL has no path component;
      // the RFC matches such URLs as "/"
      .withColumn("_path",
        when(col("_path") === "", lit("/")).otherwise(col("_path")))
    // the decision depends only on (domain, path): resolve per
    // DISTINCT pair (most specific matching rule by pattern octets;
    // Allow wins ties — true > false in the max_by struct), then join
    // verdicts back so duplicate URL rows are preserved. The match
    // test rides the equi-join on domain as a join condition —
    // startsWith for plain prefix rules, the pre-translated anchored
    // regex for wildcard rules; a URL whose domain has rules but none
    // matching stays unmatched -> allowed.
    val ruleMatches =
      when(col("rx").isNull, col("_path").startsWith(col("path")))
        .otherwise(regexp_like(col("_path"), col("rx")))
    val decisions = withParts.select(col("_domain"), col("_path")).distinct()
      .join(applicable,
        col("_domain") === col("domain") && ruleMatches,
        "left")
      .groupBy("_domain", "_path")
      // specificity is the pattern's OCTET count (RFC 9309 "most
      // octets"), not UTF-16 chars — they differ for non-ASCII bytes
      .agg(max_by(col("allow"),
        struct(octet_length(col("path")), col("allow"))).as("_verdict"))
    withParts
      .join(decisions, Seq("_domain", "_path"), "left")
      .filter(col("_verdict").isNull || col("_verdict"))
      .drop("_verdict", "_path", "_domain")
  }
}
