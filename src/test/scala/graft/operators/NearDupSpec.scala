package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalExact: ledger rows drop, batch dedups to min id, additions = kept fps") {
    val batch = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "aaa"),   // in-batch dup of fp(aaa)
      (4L, "ccc"), (5L, "seen"), (6L, "seen")  // 'seen' already in the ledger
    ).toDF("id", "fp")
    val ledger = Seq("seen", "zzz").toDF("fp")
    val (kept, additions) = Dedup.incrementalExact(batch, ledger, "fp", "id")
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L),
      "ledger hits drop entirely; in-batch dup keeps min id")
    assert(additions.as[String].collect().sorted.toSeq == Seq("aaa", "bbb", "ccc"))
    // next batch against the grown ledger: everything already seen drops
    val (kept2, _) = Dedup.incrementalExact(batch, ledger.union(additions), "fp", "id")
    assert(kept2.count() == 0)
  }

  test("clusterPairs finds connected components incl. chains (both solver paths)") {
    // chain 1-2-3-4 (diameter 3) + pair 10-11 + isolated nothing;
    // threshold 0 forces the distributed label-propagation path, the
    // default takes the driver union-find fast path — same contract
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    for (threshold <- Seq(Dedup.LocalSolveMaxEdges, 0L)) {
      val clusters = Dedup.clusterPairs(pairs, localSolveThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L), s"threshold=$threshold")
      assert(clusters(10L) == 10L && clusters(11L) == 10L, s"threshold=$threshold")
    }
  }

  test("resolveNearDups keeps best-scored doc per cluster, singletons survive") {
    val docs = Seq(
      (1L, "a", 0.5), (2L, "a", 0.9), (3L, "a", 0.7),   // cluster {1,2,3} -> keep 2
      (4L, "b", 0.1),                                   // singleton -> survives
      (5L, "c", 0.3), (6L, "c", 0.3))                   // tie -> max id = 6
      .toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.resolveNearDups(docs, pairs, "doc_id", "q", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(2L, 4L, 6L))
  }

  test("clusterPairs converges under maxIter on a long chain (distributed path)") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.clusterPairs(chain, maxIter = 10, localSolveThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-label propagation halves distance per round -> 40-chain needs ~6
    assert(clusters.values.toSet == Set(1L))
  }

  test("local and distributed solvers agree on a random 3k-edge graph") {
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(3000)((rng.nextInt(2000).toLong, rng.nextInt(2000).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
      .localCheckpoint(true) // freeze the random data for both runs
    val local = Dedup.clusterPairs(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.clusterPairs(edges, maxIter = 15, localSolveThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }
}
