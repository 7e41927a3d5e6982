package graft.operators

import graft.SparkSpec

/** Exact-integer PageRank: hand-computed small graphs, the pinned
  * dangling/parallel-edge/self-loop semantics, and the ranking
  * property the operator exists for (hubs outrank leaves).
  */
class LinkRankSpec extends SparkSpec {

  private val Q = LinkRank.Q // 1048576
  private val Base = (3L * Q) / 20L // 157286

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    LinkRank.pagerank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("one iteration matches the hand computation on a 3-cycle") {
    // a->b->c->a, all outdeg 1: rank1(v) = base + floor(17*Q/20)
    val r = ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a"), 1)
    val contrib = (17L * Q) / 20L
    assert(r == Map("a" -> (Base + contrib), "b" -> (Base + contrib),
      "c" -> (Base + contrib)))
  }

  test("split mass: outdeg 2 halves each contribution (exact floor)") {
    // a->b, a->c: rank1(b) = rank1(c) = base + floor(17*Q/40)
    val r = ranks(Seq("a" -> "b", "a" -> "c"), 1)
    val half = (17L * Q) / 40L
    assert(r("b") == Base + half && r("c") == Base + half)
    // a is dangling-IN (no in-edges): pure base
    assert(r("a") == Base)
  }

  test("dangling nodes leak mass (no teleport back)") {
    // a->b; b has no out-edges: after 2 iters b's only income is from
    // a's CURRENT rank (which decayed to base), total mass shrinks
    val r1 = ranks(Seq("a" -> "b"), 1)
    val r2 = ranks(Seq("a" -> "b"), 2)
    assert(r2("b") == Base + (17L * r1("a")) / 20L)
    assert(r2.values.sum < r1.values.sum)
  }

  test("parallel edges collapse, self-loops count") {
    val dup = ranks(Seq("a" -> "b", "a" -> "b"), 1)
    val single = ranks(Seq("a" -> "b"), 1)
    assert(dup == single)
    // self-loop: a->a keeps feeding itself
    val self = ranks(Seq("a" -> "a"), 3)
    assert(self("a") > Base)
  }

  test("hub outranks leaves on a star after convergence-ish iterations") {
    val spokes = (1 to 10).map(i => s"leaf$i" -> "hub")
    val back = (1 to 10).map(i => "hub" -> s"leaf$i")
    val r = ranks(spokes ++ back, 5)
    assert((1 to 10).forall(i => r("hub") > r(s"leaf$i")))
  }

  test("warm start: k steps from a pinned vector equal cold n+k steps; new nodes join at Q") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    // warm-starting from the cold 2-iteration vector and stepping 1
    // more == cold 3 iterations (the vector IS the state)
    val cold2 = LinkRank.pagerank(edges, "src", "dst", 2)
    val warm = LinkRank.pagerankFrom(edges, "src", "dst", cold2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cold3 = ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a"), 3)
    assert(warm == cold3)
    // a grown graph: node d is new -> starts at Q; node absent from
    // the graph drops out even if present in init
    val grown = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
      .toDF("src", "dst")
    val init = cold2.unionByName(Seq(("ghost", 999L)).toDF("node", "rank"))
    val w2 = LinkRank.pagerankFrom(grown, "src", "dst", init, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!w2.contains("ghost"))
    val c2 = cold2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d's first warm rank: base + floor(17*rank2(c) / (20*outdeg(c)=40))
    assert(w2("d") == Base + (17L * c2("c")) / 40L)
  }

  test("iteration bound is enforced") {
    import spark.implicits._
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](LinkRank.pagerank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](LinkRank.pagerank(e, "src", "dst", 51))
  }
}
