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
  *  - rule matching: longest-PATH-match wins across Allow+Disallow;
  *    on equal length Allow wins; no matching rule = allowed;
  *  - only path-prefix rules (no wildcards) — the subset the vast
  *    majority of real files use; `$`/`*` patterns are rejected
  *    loudly rather than mis-matched silently.
  *
  * The decision is expressed RELATIONALLY: rules become a
  * `(domain, agent, allow, path)` table (parsed once, O(hosts) —
  * config-sized next to the URL corpus), the URL table joins on
  * domain, prefix-match + longest-match resolve with one `max_by`
  * aggregation — a broadcast join + hash agg at 100 TB, no UDF in
  * the match path.
  *
  * Reference seam: the reference's compliance tier purges by dataset
  * descriptor (gobblin-compliance/.../HivePurgerSource.java); this is
  * the crawl-native analog keyed by robots policy.
  */
object Robots {

  /** Parse one robots.txt body into (agent, allow, path) rows.
    * Rules attach to every agent of the preceding User-agent run
    * (consecutive User-agent lines share the group, per the RFC).
    * Comments (#) and unknown directives (Crawl-delay, Sitemap) are
    * ignored; `*`/`$` pattern rules fail loudly.
    */
  def parseRules(id: Long, text: String): Seq[(String, Boolean, String)] = {
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
                  s"media $id: $key rule before any User-agent line")
              if (value.exists(c => c == '*' || c == '$'))
                throw new IllegalArgumentException(
                  s"media $id: wildcard rule '$value' not supported")
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
    * wins. Non-integer or negative values fail loudly with the id.
    */
  def parseDelays(id: Long, text: String): Seq[(String, Long)] = {
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
              if (agents.isEmpty)
                throw new IllegalArgumentException(
                  s"media $id: Crawl-delay before any User-agent line")
              val d = try value.toLong catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"media $id: non-integer Crawl-delay '$value'")
              }
              if (d < 0) throw new IllegalArgumentException(
                s"media $id: negative Crawl-delay $d")
              agents.foreach(a => out += ((a, d)))
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
        parseDelays(0L, if (text == null) "" else text).iterator.map {
          case (agent, d) => (domain, agent, d)
        }
      })
      .toDF("domain", "agent", "delay_sec")
  }

  /** `robots(domain, content)` text rows → `(domain, agent, allow,
    * path)` rule rows (the relational form [[filterAllowed]] joins).
    */
  def rulesTable(robots: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(domainCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (domain, text) =>
        parseRules(0L, if (text == null) "" else text).iterator.map {
          case (agent, allow, path) => (domain, agent, allow, path)
        }
      })
      .toDF("domain", "agent", "allow", "path")
  }

  /** Filter `urls` to those the `crawler` may fetch under `rules`
    * (for the exact-match agent group or the `*` fallback — longest
    * agent name wins, then longest path, Allow on ties; URLs with no
    * matching group or rule pass). `urls` needs (urlCol); the url's
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
      .select(col("domain"), col("allow"), col("path"))
    val withParts = urls
      .withColumn("_domain", Text.urlDomain(col(urlCol)))
      .withColumn("_path",
        regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)?", 1))
    // the decision depends only on (domain, path): resolve per
    // DISTINCT pair (longest matching rule; Allow wins length ties —
    // true > false in the max_by struct), then join verdicts back so
    // duplicate URL rows are preserved. The prefix test rides the
    // equi-join on domain as a join condition: a URL whose domain has
    // rules but none matching stays unmatched -> allowed.
    val decisions = withParts.select(col("_domain"), col("_path")).distinct()
      .join(applicable,
        col("_domain") === col("domain") && col("_path").startsWith(col("path")),
        "left")
      .groupBy("_domain", "_path")
      .agg(max_by(col("allow"),
        struct(length(col("path")), col("allow"))).as("_verdict"))
    withParts
      .join(decisions, Seq("_domain", "_path"), "left")
      .filter(col("_verdict").isNull || col("_verdict"))
      .drop("_verdict", "_path", "_domain")
  }
}
