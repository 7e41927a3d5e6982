package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier planning — the two standard relational operations a
  * crawler runs between link discovery and fetching (public semantics:
  * Apache Nutch's Generator and LinkDb; the reference itself ingests
  * pre-crawled inputs, so this extends the crawl tier LinkRank /
  * Robots / Warc began).
  *
  * Both operations are pure joins/aggregations/windows — no UDFs, no
  * driver-side data paths — and every ordering is total (unique
  * tie-break), so the outputs are bit-replayable by a SQL oracle and
  * invariant to partitioning.
  */
object CrawlFrontier {

  /** Nutch-Generator fetch-list selection: from a scored frontier,
    * keep at most `maxPerHost` URLs per host (politeness — one host
    * must not dominate a fetch cycle), then the global `topN` by
    * score. Returns one row per selected URL with
    *
    *   - `sel_rank`: 1-based global priority (score desc, url asc);
    *   - `fetch_slot`: 0-based stagger within the host AFTER selection
    *     — a fetcher honoring crawl-delay d schedules the URL at
    *     `host_first_fetch + fetch_slot * d`.
    *
    * Scale shape: the per-host cap is a `row_number` window with a
    * CONSTANT bound (Spark's WindowGroupLimit pushes the cap into the
    * sort, so no host's full URL list ever materializes); the global
    * top-N rides [[GlobalOrder.withRowNumber]]'s range exchange — a
    * distributed rank, NOT `orderBy.limit` (TakeOrdered funnels N rows
    * through one task; fetch lists are millions of URLs). The final
    * slot window re-partitions by host — bounded at `maxPerHost` rows
    * per host by construction.
    *
    * Ordering is (score desc, url asc) everywhere; `urlCol` must be
    * unique (canonicalize + dedup upstream — [[graft.functions.Text.canonicalizeUrl]]).
    */
  def generateFetchList(frontier: DataFrame, urlCol: String, hostCol: String,
      scoreCol: String, topN: Long, maxPerHost: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(maxPerHost >= 1, s"maxPerHost must be >= 1, got $maxPerHost")
    val url = col(urlCol)
    val order = Seq(col(scoreCol).desc, url.asc)
    val perHost = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    val capped = frontier
      .withColumn("_host_rank", row_number().over(perHost))
      .filter(col("_host_rank") <= maxPerHost)
      .drop("_host_rank")
    val selected = GlobalOrder
      .withRowNumber(capped, order, "sel_rank")
      .filter(col("sel_rank") <= topN)
    selected
      .withColumn("fetch_slot",
        row_number().over(Window.partitionBy(col(hostCol))
          .orderBy(col("sel_rank"))).cast("long") - 1L)
  }

  /** Crawl-delay-aware fetch schedule: join a [[generateFetchList]]
    * result against per-domain Crawl-delay directives
    * ([[Robots.delaysTable]] shape: domain, agent, delay_sec) and turn
    * each URL's politeness slot into a concrete per-host time offset:
    *
    *   fetch_at = fetch_slot * delay_sec   (seconds after the host's
    *                                        first fetch of the cycle)
    *
    * Agent resolution matches [[Robots.filterAllowed]]: the crawler's
    * exact agent group beats `*`; hosts with no directive use
    * `defaultDelaySec`. The join is O(hosts) against O(selected URLs)
    * — AQE broadcasts the delay side at real scale.
    */
  def scheduleFetch(fetchList: DataFrame, hostCol: String, delays: DataFrame,
      crawler: String, defaultDelaySec: Long): DataFrame = {
    require(defaultDelaySec >= 0, s"negative default delay $defaultDelaySec")
    val crawlerLc = crawler.toLowerCase
    val perHost = delays
      .filter(col("agent") === crawlerLc || col("agent") === "*")
      .groupBy(col("domain"))
      .agg(max_by(col("delay_sec"),
        when(col("agent") === crawlerLc, 1).otherwise(0)).as("_delay"))
    // drop via the delays-side column REFERENCES (not by name): a
    // caller-supplied fetch list may legitimately carry its own
    // 'domain' column, and drop-by-name would remove that too
    fetchList
      .join(perHost, fetchList(hostCol) === perHost("domain"), "left")
      .withColumn("fetch_at",
        col("fetch_slot") * coalesce(perHost("_delay"), lit(defaultDelaySec)))
      .drop(perHost("domain")).drop(perHost("_delay"))
  }

  /** Redirect-chain resolution: follow `src → dst` redirect edges (a
    * FUNCTIONAL graph — at most one out-edge per src, enforced) to the
    * terminal target every alias ultimately lands on — the step a
    * crawler runs between fetching (301/308, rel=canonical) and URL
    * dedup, so mirror aliases collapse before content ever compares.
    * Returns one row per src: `target` (the terminal), `hops` (exact
    * chain length walked), `resolved` (false when no terminal exists
    * within `maxHops` — a longer chain or a redirect LOOP; those rows
    * carry NULL target/hops, because "how far the walk got" depends on
    * the walk strategy and is not a property of the graph).
    *
    * Scale shape: pointer DOUBLING — ceil(log2(maxHops)) self-joins,
    * each a plain equi-join of the O(srcs) mapping against itself
    * (after round k every src points 2^k hops ahead, or at its
    * terminal sooner), with `localCheckpoint` truncating lineage per
    * round. A per-step walk would be maxHops joins and maxHops× the
    * wall-clock; anything recursive-CTE-shaped on the driver would
    * not distribute at all. Cycles never reach a terminal, so they
    * fall out of the hop cap with `resolved = false` — no cycle
    * detection pass needed.
    */
  def resolveRedirects(redirects: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 32): DataFrame = {
    require(maxHops >= 1 && maxHops <= 1024,
      s"maxHops must be in [1, 1024], got $maxHops")
    val edges = redirects
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val dups = edges.groupBy("src").count().filter(col("count") > 1).limit(1)
      .collect()
    require(dups.isEmpty,
      s"src '${if (dups.nonEmpty) dups(0).get(0) else ""}' has multiple " +
        "redirect targets — resolve the conflict upstream (a functional " +
        "graph has at most one out-edge per node)")
    // mapping: src -> (target so far, hops walked, done = target is
    // terminal). A src whose target has no out-edge is done.
    var m = edges
      .join(edges.select(col("src").as("_t")), col("dst") === col("_t"),
        "left")
      .select(col("src"), col("dst").as("target"), lit(1L).as("hops"),
        col("_t").isNull.as("done"))
      .localCheckpoint(true)
    var span = 1L // after each round, pending rows walked `span` hops
    while (span < maxHops) {
      val next = m.as("a")
        .join(m.select(col("src").as("_s"), col("target").as("_t2"),
          col("hops").as("_h2"), col("done").as("_d2")).as("b"),
          col("a.target") === col("_s") && !col("a.done"), "left")
        .select(col("a.src"),
          when(col("_s").isNotNull, col("_t2")).otherwise(col("target"))
            .as("target"),
          when(col("_s").isNotNull, col("hops") + col("_h2"))
            .otherwise(col("hops")).as("hops"),
          // done if already done, or the jump landed on a done row, or
          // the target had no mapping row at all (terminal)
          (col("done") || col("_s").isNull || col("_d2")).as("done"))
      m = next.localCheckpoint(true)
      span *= 2
    }
    val ok = col("done") && col("hops") <= maxHops
    m.select(col("src"),
      when(ok, col("target")).as("target"),
      when(ok, col("hops")).as("hops"),
      ok.as("resolved"))
  }

  /** LinkDb-style anchor-text aggregation: collapse the inlink set of
    * each target into its top-`k` anchor strings by frequency (count
    * desc, anchor asc) — the classic relevance signal ("what the web
    * calls this page") and a dedup key for mirror detection. Returns
    * per `dstCol`:
    *
    *   - `n_links`: total inlinks (with anchors);
    *   - `n_anchors`: distinct anchor strings;
    *   - `top_anchors`: the top-k as "anchor:count" joined by "|",
    *     frequency-ordered — a flat string so downstream engines (and
    *     the oracle hash) need no array cells.
    *
    * Scale shape: one hash aggregation to (dst, anchor) counts —
    * map-side partials absorb hub targets' repeated anchors — then a
    * constant-bound row_number (WindowGroupLimit) and one final
    * aggregation by dst. Null/empty anchors are dropped first.
    */
  def anchorText(links: DataFrame, dstCol: String, anchorCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = links
      .filter(col(anchorCol).isNotNull && col(anchorCol) =!= "")
      .groupBy(col(dstCol), col(anchorCol).as("_anchor"))
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(col(dstCol))
      .orderBy(col("_cnt").desc, col("_anchor").asc)
    counts
      .withColumn("_rank", row_number().over(w))
      .groupBy(col(dstCol))
      .agg(
        sum(col("_cnt")).as("n_links"),
        count(lit(1)).as("n_anchors"),
        array_join(transform(
          array_sort(collect_list(when(col("_rank") <= k,
            struct(col("_rank").as("r"),
              concat(col("_anchor"), lit(":"), col("_cnt")).as("s"))))),
          x => x.getField("s")), "|").as("top_anchors"))
  }
}
