package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking for crawl curation — PageRank over the
  * domain/host graph, the standard signal for crawl prioritization
  * and source-quality weighting (and one leg of CCNet-style corpus
  * weighting). Expressed in the repo's exact-arithmetic discipline:
  * ranks are 2^20 fixed-point integers and the damping factor is the
  * rational 17/20 (= 0.85), so every iteration is
  *
  *   rank'(v) = floor(0.15 * 2^20)
  *            + Σ_{u→v} floor(17 * rank(u) / (20 * outdeg(u)))
  *
  * — integer-exact, order-free (a SUM of per-edge integers), and
  * therefore bit-replayable by an oracle that unrolls the same
  * iterations in SQL. Semantics pinned deliberately:
  *
  *  - UNNORMALIZED ranks (every node starts at 2^20); only relative
  *    order matters for prioritization, and normalization would
  *    reintroduce floats;
  *  - dangling nodes (no out-edges) leak their mass instead of
  *    teleporting it — the crawl-frontier convention (a page with no
  *    links confers nothing), and the choice that keeps each
  *    iteration a single join + aggregate;
  *  - parallel edges are collapsed first (`distinct`), self-loops
  *    kept (a self-link is still a link).
  *
  * Scale shape: each iteration is one equi-join of the rank table
  * (O(nodes)) against the edge table (O(edges)) on `src` and one hash
  * aggregation by `dst` — the Pregel message pattern as plain Spark
  * joins. AQE broadcasts the rank side when small (domain graphs:
  * ~10^7 hosts vs ~10^10 edges); hot destinations (everyone links to
  * wikipedia) land on the partial-agg map-side combine, and hub
  * SOURCES fan out as an ordinary skewed join handled by AQE skew
  * split. `localCheckpoint` truncates lineage each round so the plan
  * doesn't grow exponentially with iterations.
  *
  * Reference seam: the reference has no graph operator — its crawl
  * inputs arrive pre-ranked. This is net-new pipeline capability,
  * same tier as the dedup/ANN families.
  */
object LinkRank {

  val Q: Long = 1L << 20

  /** `edges(src, dst)` → `(node, rank)` after `iterations` exact
    * integer PageRank steps. Nodes = every endpoint of any edge.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame =
    run(edges, srcCol, dstCol, iterations, None)

  /** WARM-START variant for incremental epochs: iterate from a
    * previously computed `(node, rank)` vector (e.g. the last epoch's
    * ranks committed in a [[graft.sink.ShardedTable]] manifest)
    * instead of the uniform cold start. Nodes of the current graph
    * missing from `init` (newly discovered) start at the cold-start
    * mass Q; `init` rows for nodes that left the graph are dropped.
    * The per-epoch saving is ITERATIONS: a few warm steps track the
    * rank drift of a slowly-growing crawl graph where a cold start
    * would re-run the full schedule — at 10^10 edges each saved
    * iteration is a join+agg over the edge table. Deterministic by
    * construction (k exact integer steps from a pinned vector), so an
    * oracle replays it bit-for-bit.
    */
  def pagerankFrom(edges: DataFrame, srcCol: String, dstCol: String,
      init: DataFrame, iterations: Int): DataFrame =
    run(edges, srcCol, dstCol, iterations, Some(init))

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, init: Option[DataFrame]): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // outdeg rides the edge table so the per-iteration join stays a
    // single equi-join (edges change never; ranks change per round)
    val eDeg = e.join(outdeg, "src").localCheckpoint(true)
    val start = init match {
      case None => nodes.withColumn("rank", lit(Q))
      case Some(prev) =>
        nodes.join(prev.select(col("node"), col("rank")), Seq("node"), "left")
          .select(col("node"), coalesce(col("rank"), lit(Q)).as("rank"))
    }
    var ranks = start.localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      ranks = step(nodes, eDeg, ranks).localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** One un-checkpointed PageRank iteration — exposed so plan guards
    * can assert the join/aggregate shape the loop hides behind its
    * eager checkpoints.
    */
  private[graft] def step(nodes: DataFrame, eDeg: DataFrame,
      ranks: DataFrame): DataFrame = {
    val base = (3L * Q) / 20L // floor(0.15 * 2^20)
    val contrib = eDeg.join(ranks, eDeg("src") === ranks("node"))
      .select(col("dst"),
        // TRUE integer division (`div`), not IEEE: both engines
        // floor-divide longs, no 2^53 proximity caveat
        expr("(17 * rank) div (20 * outdeg)").as("c"))
    nodes
      .join(contrib.groupBy("dst").agg(sum("c").as("in_mass")),
        nodes("node") === contrib("dst"), "left")
      .select(col("node"),
        (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank"))
  }
}
