package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristic, fingerprinting, shingling.
  *
  * All pure `org.apache.spark.sql.functions` compositions (higher-order
  * array functions included) — fully codegen'd, no UDFs, so they stay
  * inside WholeStageCodegen at 100 TB.
  */
object Text {

  /** Whitespace tokens (single-space collapse; empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * other non-space chars — a deterministic stand-in for a real BPE
    * tokenizer's piece count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  def charCount(text: Column): Column = length(text)

  /** Ratio of punctuation chars to total chars. Plain IEEE division of
    * exact integer counts — deterministic, so no rounding is needed (and
    * rounding would *add* oracle risk at half-way points).
    */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val sw = stopwords.map(lit(_))
    size(filter(tokens(text), t => t.isin(sw: _*))).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")
  }

  /** Mean token length — long-token soup and single-char soup both score
    * as low-quality signals downstream.
    */
  def meanTokenLen(text: Column): Column =
    (length(text) - size(tokens(text)) + lit(1)).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length band + stopword presence +
    * punctuation sanity. Deterministic, SQL-expressible (oracle-checked).
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lengthOk = when(n.between(20, 10000), lit(0.5)).otherwise(lit(0.0))
    val swOk = when(stopwordRatio(text) > 0.0, lit(0.3)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.1, lit(0.2)).otherwise(lit(0.0))
    lengthOk + swOk + punctOk
  }

  /** Language-ID heuristic: count marker-stopword hits per language,
    * pick the max (deterministic preference order on ties). N-gram-free
    * but the same shape as real fastText-style votes; langs without
    * votes return 'und'.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "de", "que", "los", "es"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
    // foldRight means earlier langs in LangMarkers win ties.
  }

  /** Character n-grams (sliding, stride 1): the language-ID feature —
    * char distributions separate close language pairs (es/pt, da/no)
    * that word-marker votes cannot. Shorter-than-n text yields an
    * empty array. Character-indexed on BMP code units, matching
    * DuckDB's substring/length on the corpora this repo gates
    * (ASCII + BMP).
    */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"charNgrams needs n >= 1, got $n")
    val t = coalesce(text, lit(""))
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - lit(n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Document fingerprint: stable 128-bit content hash (hex). Matches
    * DuckDB md5() byte-for-byte, so it doubles as the oracle-checkable
    * exact-dedup key.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit fingerprint for compact storage / sort keys. */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Built with
    * sequence+transform so it stays codegen'd; empty when fewer than n
    * tokens.
    */
  def shingles(text: Column, n: Int): Column =
    // coalesce: NULL text yields an EMPTY shingle set (the old
    // when-guard's behavior), never a null array
    shinglesOfTokens(coalesce(tokens(text), array().cast("array<string>")), n)

  /** n-grams over a token array column. Built as a zip_with fold over
    * n shifted slices — every slice is a TOP-LEVEL child evaluated
    * once per row, where the earlier `transform(sequence(i) =>
    * slice(tokens, i, n))` spelling re-touched the captured token
    * array per output element inside the interpreted lambda (HOFs
    * don't codegen; measured ~40% slower on the bigram explode path).
    * Short inputs yield an empty array (slice of length 0).
    */
  def shinglesOfTokens(t: Column, n: Int): Column = {
    val m = greatest(size(t) - lit(n - 1), lit(0))
    (1 until n).foldLeft(slice(t, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(t, lit(k + 1), m), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Hashed shingle set (distinct) — input to MinHash. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

  // --- PII scrubbing -------------------------------------------------

  /** Conservative, engine-portable patterns (no lookarounds, no
    * backreferences — valid in both java.util.regex and RE2-family
    * engines, so a SQL oracle can replay the scrub verbatim). Order
    * matters: emails first (their local part may contain digits), then
    * IPs (dotted digits), then bare phone fragments.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redact emails / IPv4s / phone-shaped digit runs — the compliance
    * scrub a training-data pipeline runs before anything ships to a
    * tokenizer. Pure regexp_replace chain: codegen'd, one pass per
    * pattern over the already-in-cache string.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // --- repetition signals (Gopher/Dolma-style quality filters) -------

  /** Fraction of word n-grams that are duplicates of an earlier one —
    * the standard "excess repetition" document-quality signal. Exact
    * integer counts; the ratio is one IEEE division (engine-portable).
    * 0.0 for documents shorter than n tokens.
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val g = shingles(text, n)
    when(size(g) <= 0, lit(0.0))
      .otherwise((size(g) - size(array_distinct(g))).cast("double") / size(g).cast("double"))
  }

  /** (n_grams, n_unique) as separate exact counts, for thresholding
    * without re-deriving the ratio.
    */
  def ngramCounts(text: Column, n: Int): (Column, Column) = {
    val g = shingles(text, n)
    (size(g), size(array_distinct(g)))
  }

  /** Symbol marker pattern shared with SQL oracles: hash marks and
    * ellipses, the Gopher symbol set. RE2-safe (no lookarounds).
    */
  val SymbolRe = "#|\\.\\.\\."

  /** Symbol-to-word ratio (Gopher): occurrences of boilerplate symbol
    * markers per word. High values flag nav bars, code gutters, and
    * truncated scrapes. Exact counts, one IEEE division.
    */
  def symbolWordRatio(text: Column): Column =
    when(size(tokens(text)) <= 0, lit(0.0))
      .otherwise(regexp_count(text, lit(SymbolRe)).cast("double") /
        size(tokens(text)).cast("double"))

  // --- URL / domain filtering (C4/RefinedWeb-style) ------------------

  /** Conservative URL pattern — no lookarounds/backreferences, so it is
    * valid verbatim in java.util.regex AND RE2-family engines (same
    * portability contract as the PII patterns above, which is what
    * lets a SQL oracle replay the extraction).
    */
  val UrlRe = "https?://[A-Za-z0-9.-]+(/[^ ]*)?"
  private val DomainRe = "https?://([A-Za-z0-9.-]+)"

  /** All URLs in a document, in order of appearance. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Lower-cased host of one URL string ("" for non-URLs). */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, DomainRe, 1))

  /** Query parameters dropped by [[canonicalizeUrl]]: the tracking
    * decorations that make one logical page crawl as many URLs
    * (the URL-dedup false-negative source in every web corpus).
    */
  val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)="

  /** Crawl-grade URL canonicalization — the normalize-before-dedup
    * step of a URL frontier (ref: the reference's extract/restapi URL
    * assembly normalizes before keying; public crawler convention —
    * e.g. Nutch BasicURLNormalizer — beyond it):
    *
    *   - strip the fragment (`#...`);
    *   - lower-case scheme and host, strip default ports
    *     (http :80, https :443);
    *   - an absent path becomes "/" (path case is PRESERVED);
    *   - drop tracking query params ([[TrackingParamRe]]) and empty
    *     params, SORT the survivors (order never distinguishes
    *     pages), drop the '?' when none survive.
    *
    * Deliberately NOT done (documented contract boundary):
    * percent-encoding normalization and `..`/`.` path resolution —
    * both require a stateful pass; apply them upstream if inputs need
    * them. Strings without a `scheme://host` prefix keep everything
    * but fragment/query handling.
    *
    * Pure functions-composition (split/filter/sort_array/array_join)
    * — codegen'd, no UDF, replayable in any engine with list lambdas.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = split(url, "#").getItem(0)
    val qpos = instr(noFrag, "?")
    val base = when(qpos > 0, noFrag.substr(lit(1), qpos - 1))
      .otherwise(noFrag)
    val query = when(qpos > 0, noFrag.substr(qpos + 1, length(noFrag)))
      .otherwise(lit(""))
    val schemeHost = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    val path = base.substr(length(schemeHost) + 1, lit(1 << 24))
    val canonHost = regexp_replace(
      regexp_replace(lower(schemeHost), "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$", "$1")
    val canonBase = when(schemeHost === "", base)
      .otherwise(concat(canonHost, when(path === "", "/").otherwise(path)))
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val joined = array_join(sort_array(params), "&")
    when(joined === "", canonBase)
      .otherwise(concat(canonBase, lit("?"), joined))
  }

  /** Main-content extraction (trafilatura/readability-style
    * boilerplate removal — the stage between raw HTML and the C4
    * pipeline): split the document into BLOCKS on block-level tags,
    * score each block by length and LINK DENSITY (anchor-text chars
    * over clean chars, the classic nav/footer discriminator), keep
    * only long-enough low-link blocks, and reassemble in order.
    * Navigation bars, "click here" ad blocks, and link-farm footers
    * drop; body paragraphs survive. Entirely regexp/array
    * expressions — codegen'd, no UDF, replayable in any engine with
    * global regex + list lambdas. The link-ratio threshold is the
    * rational `maxLinkNum/maxLinkDen` compared in exact integers.
    */
  def mainContent(html: Column, minChars: Int,
      maxLinkNum: Int, maxLinkDen: Int): Column = {
    val blockTags = "</?(?:p|div|nav|footer|header|section|article|li|ul|ol|h[1-6]|table|tr|td)[^>]*>"
    val blocks = split(html, blockTags)
    def linkChars(b: Column): Column = aggregate(
      regexp_extract_all(b, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(stripHtml(x)))
    val kept = filter(blocks, b => {
      val clean = length(stripHtml(b))
      clean >= minChars &&
        linkChars(b) * maxLinkDen <= clean * maxLinkNum
    })
    trim(regexp_replace(
      concat_ws(" ", transform(kept, b => stripHtml(b))), "\\s+", " "))
  }

  /** URLs listed in a sitemap.xml / sitemap-index body: the trimmed
    * text of every `<loc>` element, XML entities decoded (`&amp;`
    * LAST, the [[stripHtml]] discipline — sitemap URLs escape `&`).
    * Pure regexp chain, codegen'd, replayable in any engine with a
    * global regexp extractor — the crawl-DISCOVERY counterpart to
    * the robots.txt policy gate.
    */
  def sitemapUrls(xml: Column): Column = {
    val locs = regexp_extract_all(xml,
      lit("<loc>\\s*([^<]*?)\\s*</loc>"), lit(1))
    transform(locs, u => Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(u) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) })
  }

  /** Full sitemap entries: one struct per `<url>` block with the
    * decoded `url` (from `<loc>`), `lastmod` (ISO date/datetime text,
    * NULL when absent) and `priority` (double, NULL when absent) — the
    * recrawl-scheduling inputs [[sitemapUrls]] drops. Blocks without a
    * `<loc>` are skipped. Same pure split/regexp/transform chain:
    * codegen'd, engine-replayable.
    */
  def sitemapEntries(xml: Column): Column = {
    def field(b: Column, tag: String): Column =
      trim(regexp_extract(b, s"(?s)<$tag>\\s*([^<]*?)\\s*</$tag>", 1))
    val decode = (u: Column) => Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(u) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    val blocks = filter(split(xml, "<url>"),
      b => b.contains("</url>") && field(b, "loc") =!= "")
    transform(blocks, b => {
      val body = split(b, "</url>").getItem(0)
      struct(
        decode(field(body, "loc")).as("url"),
        when(field(body, "lastmod") === "", lit(null).cast("string"))
          .otherwise(field(body, "lastmod")).as("lastmod"),
        // regex-guard the cast: ANSI mode (Spark 4 default) throws on
        // junk numerics, and a malformed sitemap must not kill the scan
        when(field(body, "priority").rlike("^[0-9]+(\\.[0-9]+)?$"),
          field(body, "priority").cast("double"))
          .otherwise(lit(null).cast("double")).as("priority"))
    })
  }

  /** Per-<sitemap> block entries of a sitemap INDEX file — the
    * two-level form large sites actually serve (an index pointing at
    * child urlsets, each capped at 50k URLs): `(url, lastmod)`
    * structs, entity-decoded, lastmod optional. Resolving the index
    * (fetch each child, explode its urlset via [[sitemapEntries]]) is
    * an ordinary JOIN in the pipeline — see q_sitemap_index. Same
    * codegen'd split/regexp chain as the urlset parser; `<sitemap>`
    * does not match the `<sitemapindex>` root tag.
    */
  def sitemapIndexEntries(xml: Column): Column = {
    def field(b: Column, tag: String): Column =
      trim(regexp_extract(b, s"(?s)<$tag>\\s*([^<]*?)\\s*</$tag>", 1))
    val decode = (u: Column) => Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(u) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    val blocks = filter(split(xml, "<sitemap>"),
      b => b.contains("</sitemap>") && field(b, "loc") =!= "")
    transform(blocks, b => {
      val body = split(b, "</sitemap>").getItem(0)
      struct(
        decode(field(body, "loc")).as("url"),
        when(field(body, "lastmod") === "", lit(null).cast("string"))
          .otherwise(field(body, "lastmod")).as("lastmod"))
    })
  }

  /** Anchor outlinks of an HTML document with rel=nofollow detection —
    * the link-graph extraction step (nofollow links must not confer
    * PageRank mass and usually stay out of the frontier). One struct
    * per `<a ...>` tag carrying an href: decoded `url` + `nofollow`
    * (true when the tag's rel attribute contains nofollow as a WHOLE
    * token — bounded by whitespace/comma or the value edges, any
    * case; `rel="nofollowme"` is NOT nofollow). href/rel values may
    * be double-quoted, single-quoted, or unquoted. Anchors without an
    * href are skipped. Pure regexp/transform chain, codegen'd,
    * engine-replayable.
    */
  def outlinks(html: Column): Column = {
    val decode = (u: Column) => Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(u) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    // quoted forms first; an unquoted value runs to whitespace/>/quote
    // (the quoted regexes can't false-positive there: after `=` an
    // unquoted value's first char is not a quote, and vice versa).
    // Each quote style terminates on its OWN quote char, so
    // href='a"b' extracts a"b intact. The (?<![\w-]) lookbehind stops
    // hyphenated attributes from aliasing: `data-href` is not an
    // href, `data-rel="nofollow"` is not a nofollow (a plain \b
    // boundary exists inside `data-href` because '-' is a non-word
    // char).
    def attr(t: Column, name: String): Column = {
      val dq = regexp_extract(t,
        s"(?is)(?<![\\w-])$name\\s*=\\s*\"([^\"]*)\"", 1)
      val sq = regexp_extract(t,
        s"(?is)(?<![\\w-])$name\\s*=\\s*'([^']*)'", 1)
      val uq = regexp_extract(t,
        s"(?is)(?<![\\w-])$name\\s*=\\s*([^\\s>\"']+)", 1)
      when(dq =!= "", dq).otherwise(when(sq =!= "", sq).otherwise(uq))
    }
    val tags = regexp_extract_all(html, lit("(?is)<a\\s[^>]*>"), lit(0))
    filter(
      transform(tags, t => struct(
        decode(trim(attr(t, "href"))).as("url"),
        attr(t, "rel")
          .rlike("(?i)(^|[\\s,])nofollow($|[\\s,])").as("nofollow"))),
      s => s.getField("url") =!= "")
  }

  /** Distinct lower-cased domains mentioned in a document — the join
    * key for blocklist filtering. Codegen'd array composition.
    */
  def domains(text: Column): Column =
    array_distinct(transform(extractUrls(text), u => urlDomain(u)))

  /** Strip HTML markup (C4-style pre-cleaning): tags removed, the five
    * standard entities decoded (`&amp;` LAST so entity-encoded
    * entities don't double-decode), whitespace collapsed. Pure
    * regexp/replace chain — codegen'd, replayable in any engine with
    * global regexp_replace.
    */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    // \s+, not ' +': real HTML is full of tabs/newlines
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Page metadata out of raw HTML — the crawl tier's title/
    * description signals (curation ranks and labels pages by them
    * before any body-text stage). Pure codegen'd regexp columns,
    * RE2-safe (no backtracking constructs): `<title>` text, and
    * OpenGraph `og:title` / `og:description` meta content in either
    * attribute order. Missing pieces come back as empty strings.
    */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?i)<title[^>]*>([^<]*)</title>", 1),
      "\\s+", " "))

  def htmlMetaContent(html: Column, prop: String): Column = {
    // property before content, or content before property
    val a = regexp_extract(html,
      s"""(?i)<meta[^>]*property\\s*=\\s*["']$prop["'][^>]*content\\s*=\\s*["']([^"']*)["']""", 1)
    val b = regexp_extract(html,
      s"""(?i)<meta[^>]*content\\s*=\\s*["']([^"']*)["'][^>]*property\\s*=\\s*["']$prop["']""", 1)
    trim(regexp_replace(when(length(a) > 0, a).otherwise(b), "\\s+", " "))
  }

  /** Structured page metadata from the FIRST embedded JSON-LD block
    * (`<script type="application/ld+json">`) — the schema.org layer
    * modern pages carry and curation ranks by: article type,
    * headline, publication date, author and language. Pure codegen'd
    * regexp + from_json (no UDF); a page without a block (or with
    * unparsable JSON) yields a null struct the caller can police.
    * Nested `author` may be an object (`{"name": ...}`); string
    * authors land in `author_raw`.
    */
  def jsonLd(html: Column): Column = {
    val block = regexp_extract(html,
      "(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>",
      1)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("@type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("headline",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("datePublished",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("inLanguage",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("author",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("@type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType))))))
    val parsed = from_json(block, schema)
    struct(
      parsed.getField("@type").as("ld_type"),
      parsed.getField("headline").as("headline"),
      parsed.getField("datePublished").as("date_published"),
      parsed.getField("inLanguage").as("in_language"),
      parsed.getField("author").getField("name").as("author"),
      // a bare-string author fails the struct parse; recover it with
      // a targeted extraction over the same block
      regexp_extract(block,
        "\"author\"\\s*:\\s*\"([^\"]*)\"", 1).as("author_raw"))
  }

  /** Canonicalize one URL string — the dedup/blocklist key
    * normalization: fragment stripped, scheme+host lowercased,
    * default :80/:443 port dropped, utm_* tracking params removed
    * (dangling separators trimmed), single trailing slash dropped.
    * Deterministic regexp pipeline, identical semantics in RE2 and
    * Java regex.
    */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1)
    // default-port strip is SCHEME-CONDITIONAL: :80 on https (or :443
    // on http) is a real, distinct origin and must survive
    val noPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    // a RUN of utm params collapses in one match (global regex can't
    // re-scan its own replacement, so consecutive params need the run
    // form); the leading separator is kept via $1, and a separator
    // orphaned at the end is rtrim'd below. Anchored on [?&]: a param
    // or path segment merely CONTAINING "utm_" is untouched
    val noUtm = regexp_replace(rest,
      "([?&])utm_[A-Za-z]+=[^&]*(&utm_[A-Za-z]+=[^&]*)*&?", "$1")
    // order matters: drop utm-orphaned separators FIRST, then the
    // trailing slash ("p/?utm_x=1" -> "p/?" -> "p/" -> "p")
    val tidy = regexp_replace(
      rtrim(concat(scheme, lit("://"), noPort, noUtm), "?&"), "/$", "")
    // non-URLs (no scheme) pass through untouched
    when(scheme === "", u).otherwise(tidy)
  }

  /** True when the document mentions any blocklisted domain. For a
    * literal blocklist (config-sized) this is a pure projection; a
    * TABLE-sized blocklist should instead explode [[domains]] and
    * anti-join, which scales with the corpus.
    */
  def hasBlockedDomain(text: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "empty blocklist")
    val set = blocklist.map(d => lit(d.toLowerCase))
    exists(domains(text), d => d.isin(set: _*))
  }

  // --- context-window chunking ---------------------------------------

  /** Overlapping fixed-size token chunks with a stride — the standard
    * document→training-context split (chunk k covers tokens
    * [k*stride, k*stride+chunkSize)). The last chunk may be shorter;
    * chunk count = ceil(max(nTok - chunkSize, 0) / stride) + 1, so
    * every token is covered and a short document still yields exactly
    * one chunk. Pure sequence/slice composition — codegen'd, and the
    * exact-integer ceil keeps it engine-portable for the oracle.
    */
  def chunkTokens(text: Column, chunkSize: Int, stride: Int): Column =
    chunkTokensOfTokens(tokens(text), chunkSize, stride)

  /** Chunking over a token array column. Chunks overlap, so (unlike
    * [[shinglesOfTokens]]) the slice must live inside the transform
    * lambda — per-element capture of an ATTRIBUTE is a cheap array
    * reference, but capture of an expression tree re-evaluates it per
    * chunk. Long-document corpora (many chunks/doc) should therefore
    * materialize the token array as a column first and call this
    * variant; [[chunkTokens]] stays for short-doc convenience.
    */
  def chunkTokensOfTokens(t: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    val nChunks = floor((greatest(size(t) - chunkSize, lit(0)) + lit(stride - 1))
      .cast("double") / lit(stride)).cast("int") + lit(1)
    transform(sequence(lit(0), nChunks - 1),
      k => array_join(slice(t, k * stride + 1, lit(chunkSize)), " "))
  }

  /** Page-level robots directives (RFC 9309's meta/header companion):
    * union of `<meta name=robots content=...>` (either attribute
    * order, any quote style) and the `X-Robots-Tag` HTTP header.
    * Returns struct(noindex, nofollow); `none` implies both, `all`
    * neither. A curation pipeline must honor these before indexing a
    * fetched page — robots.txt alone is not the whole contract.
    */
  def robotsMeta(html: Column, xRobotsTag: Column): Column = {
    // content value: quoted (group 1) or HTML-legal unquoted token
    // (group 2) — the spec allows unquoted attribute values, so
    // <meta name=robots content=noindex> must be honored too
    val contentVal = "content\\s*=\\s*(?:[\"']([^\"']*)[\"']|([^\\s\"'>]+))"
    val metaNameFirst = "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*" + contentVal
    val metaContentFirst = "(?is)<meta[^>]*" + contentVal + "[^>]*name\\s*=\\s*[\"']?robots[\"']?"
    val all = lower(concat_ws(",",
      regexp_extract(html, metaNameFirst, 1),
      regexp_extract(html, metaNameFirst, 2),
      regexp_extract(html, metaContentFirst, 1),
      regexp_extract(html, metaContentFirst, 2),
      coalesce(xRobotsTag, lit(""))))
    val toks = transform(split(all, ","), t => trim(t))
    struct(
      (array_contains(toks, "noindex") || array_contains(toks, "none"))
        .as("noindex"),
      (array_contains(toks, "nofollow") || array_contains(toks, "none"))
        .as("nofollow"))
  }
}
