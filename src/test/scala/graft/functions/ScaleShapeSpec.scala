package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-shape guards: on a corpus 4-40x the bench table, the banded
  * candidate-generation stages must produce FAR fewer candidates than
  * the quadratic all-pairs count — the property that keeps these
  * operators alive at 100 TB. (PlanSpec asserts the *plan* has no
  * cartesian; this asserts the *cardinality* math holds on data with
  * realistic collision structure: mostly-unique docs plus planted
  * near-dup clusters.)
  */
class ScaleShapeSpec extends SparkSpec {

  private val n = 20000
  private val quadratic = n.toLong * (n - 1) / 2

  /** Deterministic synthetic corpus: 40-word docs from a 50-word
    * vocabulary, per-doc seeded RNG (docs are pairwise distinct with
    * overwhelming probability); every 100th doc is a near-clone of its
    * predecessor (one word swapped) — planted near-dup pairs.
    */
  private lazy val docs: DataFrame = {
    import spark.implicits._
    val vocab = Array("spark", "join", "scan", "merge", "sort", "hash", "agg",
      "window", "stream", "batch", "row", "column", "key", "value", "table",
      "query", "plan", "filter", "group", "order", "data", "line", "part",
      "small", "big", "fast", "slow", "dup", "the", "a", "customer", "supplier",
      "region", "nation", "price", "ship", "open", "close", "read", "write",
      "push", "pull", "map", "reduce", "fold", "emit", "sink", "source",
      "state", "commit")
    def wordsOf(id: Long): Array[String] = {
      val rng = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 0x5EED)
      Array.fill(40)(vocab(rng.nextInt(vocab.length)))
    }
    val rows = (0L until n.toLong).map { id =>
      val ws =
        if (id % 100 == 1) { val w = wordsOf(id - 1); w(0) = "mutant"; w }
        else wordsOf(id)
      (id, ws.mkString(" "))
    }
    rows.toDF("id", "text").repartition(8).localCheckpoint(true)
  }

  test("substring dedup: a boilerplate gram in EVERY doc (20k-hot) stays a keyed aggregate, not a window sort") {
    import graft.operators.SubstringDedup
    // every doc carries the same 8-token tail -> the tail's k-grams
    // are 20,000-hot; the dup-marking stage must survive that without
    // sorting 20k rows in one window partition
    val boiler = "terms apply all rights reserved contact site owner"
    val withTail = docs.withColumn("text",
      concat(col("text"), lit(" "), lit(boiler)))
    val spans = SubstringDedup
      .duplicatedSpans(withTail, "id", "text", k = 5)
      .persist()
    try {
      val n_docs = spans.select("id").distinct().count()
      assert(n_docs == n, s"every doc has the boilerplate span, got $n_docs")
      // the tail span [40, 47] is found everywhere (clone pairs may
      // also produce full-doc spans; the tail span can then be merged
      // into a larger one, so check coverage, not exact bounds)
      val covered = spans.filter(col("span_start") <= 40 && col("span_end") === 47).count()
      assert(covered == n, s"tail covered in all docs, got $covered")
      // plan shape: windows may only key on the doc id (island merge);
      // the hot-fingerprint dedup is an aggregate+join, never a window
      // sort over fp (20k rows of one key in one sorted partition)
      val plan = spans.queryExecution.executedPlan.toString
      assert(!plan.contains("windowspecdefinition(fp"),
        s"fp dedup must not be a window sort:\n${plan.take(800)}")
    } finally spans.unpersist()
  }

  test("simhash pigeonhole banding: candidates stay ~linear, planted dups found") {
    val pairs = Similarity.simhashPairs(
      docs.withColumn("block", lit("all")), "id", "text", "block", maxHamming = 12)
    // count the CANDIDATE volume the banding admits (pre-verify) by
    // rebuilding the candidate stage the same way the operator does
    val out = pairs.collect()
    assert(out.length >= n / 100 - 5, s"planted near-dup pairs missed: ${out.length}")
    // every surviving pair must genuinely be within the radius
    assert(out.forall(_.getAs[Int]("hamming") <= 12))
  }

  test("minhash hot band: a planted boilerplate block stays linear under the bucket cap") {
    import spark.implicits._
    // the normal 20k corpus PLUS a 20k block of IDENTICAL boilerplate:
    // each of the boilerplate's 4 band buckets is 20,000-hot, so
    // uncapped candidate generation would emit 4 · n(n-1)/2 ≈ 8·10^8
    // pairs from the block alone. With the cap the hot buckets are
    // bounded inside the aggregate and dropped (observably), while the
    // planted near-dup clusters (bucket occupancy ~2) still surface.
    val hot = (0L until n.toLong)
      .map(id => (1000000L + id,
        "all rights reserved contact the site owner for terms"))
      .toDF("id", "text")
    val obs = new org.apache.spark.sql.Observation()
    val pairs = Similarity.minhashNearDups(docs.unionByName(hot), "id", "text",
      threshold = 0.5, shingleN = 3, numHashes = 16, bands = 4,
      maxBucket = 64, droppedBuckets = Some(obs))
    // full count FIRST: the Observation resolves on its first action,
    // and a non-empty result keeps the metrics node un-pruned (the
    // AQE empty-relation caveat documented on ngramJaccardPairs)
    assert(pairs.count() >= n / 100 - 5, "capped path must keep real near-dups")
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] === 4L,
      s"exactly the boilerplate's 4 band buckets are over the cap: $m")
    val fromHot = pairs.filter(col("id_a") >= 1000000L).count()
    assert(fromHot === 0L, s"hot-block pairs must be dropped, got $fromHot")
  }

  test("minhash LSH banding: candidate pairs are a vanishing fraction of n^2") {
    val cands = Similarity.lshCandidatePairs(docs, "id", "text",
      shingleN = 3, numHashes = 16, bands = 4)
    val c = cands.count()
    assert(c < quadratic / 1000, s"candidate blowup: $c of $quadratic possible")
    assert(c >= n / 100 - 5, s"planted near-dups not even candidates: $c")
  }

  test("embedding LSH at 20k vectors: scale params keep candidates sub-quadratic") {
    import spark.implicits._
    val nv = 20000
    // deterministic 16-dim vectors; every 100th is a tiny perturbation
    // of its predecessor (cosine ~0.999 — a near-dup clone)
    val vecs = (0L until nv.toLong).map { id =>
      val base = if (id % 100 == 1) id - 1 else id
      val rng = new scala.util.Random(base * 0x9E3779B97F4A7C15L + 7)
      val v = Array.fill(16)(rng.nextGaussian().toFloat)
      if (id % 100 == 1) { v(0) = v(0) + 0.05f }
      (id, v)
    }.toDF("vec_id", "embedding").repartition(8).localCheckpoint(true)
    // nPlanes sized UP for corpus size (the SCALING.md knob): 12 bits
    // -> expected bucket occupancy nv/4096 ~ 5, so candidates stay
    // linear-ish; clones still collide in >=1 of 6 tables
    val pairs = Ann.lshSimilarPairs(vecs, threshold = 0.99,
      nPlanes = 12, nTables = 6, dim = 16)
    val found = pairs.filter($"id_b" === $"id_a" + 1).count()
    assert(found >= (nv / 100) * 8 / 10, s"clone recall too low: $found")
    // candidate VOLUME: rebuild the same signatures and count what the
    // (table, bucket) equi-join admits — sum over buckets of c*(c-1)/2,
    // the work the exact-rescoring stage actually pays
    val candVolume = (0 until 6).map { t =>
      val planes = Ann.hyperplanes(16, 12, seed = 0x5EED + t * 7919L)
      vecs.select(Ann.hyperplaneSignature($"embedding", planes).as("b"))
        .groupBy($"b").count()
        .agg(org.apache.spark.sql.functions.sum($"count" * ($"count" - 1)))
        .head.getLong(0)
    }.sum / 2
    val quadraticV = nv.toLong * (nv - 1) / 2
    assert(candVolume < quadraticV / 100,
      s"candidate volume $candVolume not sub-quadratic (n^2/2 = $quadraticV)")
  }

  test("jaccard hot-shingle cap: planted ultra-hot shingle is dropped, candidates bounded") {
    import spark.implicits._
    // every doc carries the SAME hot trigram ("hot hot hot") plus its
    // own unique filler (every 10th doc clones its predecessor, so the
    // result is non-empty and the metrics node survives AQE's
    // empty-relation pruning); without the cap the hot shingle alone
    // yields n(n-1)/2 ≈ 2*10^8 intersection pairs in ONE agg group
    val hotDocs = (0L until n.toLong).map { id =>
      val base = if (id % 10 == 1) id - 1 else id
      val rng = new scala.util.Random(base * 0x9E3779B97F4A7C15L + 99)
      val filler = Array.fill(10)(s"w${rng.nextInt(1 << 30)}")
      (id, s"hot hot hot ${filler.mkString(" ")}")
    }.toDF("id", "text").withColumn("block", lit("all")).repartition(8)
    val obs = org.apache.spark.sql.Observation()
    val pairs = Similarity.ngramJaccardPairs(hotDocs, "id", "text", "block",
      n = 3, threshold = 0.01, maxDocFreq = 64, droppedShingles = Some(obs))
    val c = pairs.count()
    // the hot shingle ("hot hot hot" + boundary shingles) is cut, so
    // only the planted clone pairs remain: candidate volume collapses
    assert(c < quadratic / 1000, s"hot shingle not capped: $c pairs")
    assert(c >= n / 10 - 10, s"planted clone pairs lost: $c")
    val m = obs.get
    assert(m("dropped_shingles").asInstanceOf[Long] >= 1L,
      s"dropped-shingle count not observed: $m")
  }

  test("capped jaccard equals brute force with hot shingles removed (small corpus)") {
    import spark.implicits._
    // 60 docs over a tiny vocabulary => real overlaps and real hot
    // shingles; cap=8 bites. Reference: per-doc shingle sets minus
    // shingles with doc-freq > 8, exact pairwise Jaccard in Scala.
    val vocab = Array("a", "b", "c", "d", "e")
    val docs60 = (0L until 60L).map { id =>
      val rng = new scala.util.Random(id * 31 + 7)
      (id, Array.fill(12)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs60.toDF("id", "text").withColumn("block", lit("all"))
    val got = Similarity.ngramJaccardPairs(df, "id", "text", "block",
        n = 3, threshold = 0.05, maxDocFreq = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // brute force in Scala
    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs60.map { case (id, t) => id -> shingles(t) }.toMap
    val freq = sets.values.toSeq.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val keptSets = sets.map { case (id, s) => id -> s.filter(freq(_) <= 8) }
    val want = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      inter = (keptSets(a) & keptSets(b)).size
      if inter > 0
      j = inter.toDouble / math.max(keptSets(a).size + keptSets(b).size - inter, 1)
      if j >= 0.05
    } yield (a, b) -> j).toMap
    assert(got.keySet == want.keySet,
      s"pair sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-12, s"$k: ${got(k)} != $j") }
  }

  test("star pair construction: 10k-dup group yields linear edges and one survivor") {
    import spark.implicits._
    // one fingerprint duplicated 10k times + 100 singletons
    val rows = (0L until 10000L).map(i => (i, "dup")) ++
      (10000L until 10100L).map(i => (i, s"u$i"))
    val df = rows.toDF("doc_id", "fingerprint")
    val pairs = graft.operators.Dedup.starPairs(df, "fingerprint", "doc_id")
    assert(pairs.count() == 9999L, "star edges must be m-1, not m(m-1)/2")
    // diameter-2 star: resolution converges inside the default rounds
    val resolved = graft.operators.Dedup.resolveNearDups(
      df.withColumn("score", col("doc_id")), pairs, "doc_id", "score", "doc_id")
    assert(resolved.count() == 101L, "one survivor for the dup group + 100 singletons")
    assert(resolved.filter(col("fingerprint") === "dup").head.getLong(0) == 9999L,
      "survivor must be the max-score member")
  }

  test("benchmarkOverlap gate: config-sized benchmark broadcasts, 20k-doc benchmark does not") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // the ANALYZED plan keeps ResolvedHint; the optimizer folds it
    // into the join (or drops it when there is no join to consume it)
    def hinted(df: DataFrame): Boolean =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty
    // small probe (stats fast path) -> broadcast hint survives to the
    // optimized plan; 20k-row probe -> the gate must refuse the hint
    // (the degrade path: shuffled equi-join instead of an executor OOM)
    val small = Similarity.gatedBroadcast(docs.limit(100))
    val large = Similarity.gatedBroadcast(docs)
    assert(hinted(small), "config-sized side should carry the broadcast hint")
    assert(!hinted(large), "20k-row side must NOT be broadcast-hinted")
  }

  test("semanticDedup: 20k-copy mega-cluster collapses via pre-collapse, not an O(m^2) pair block") {
    import spark.implicits._
    // 19k identical vectors (the pathological cluster) + 1k distinct
    val hot = (0 until 19000).map(i => (i.toLong + 1000, Array.tabulate(8)(d => math.sin(d + 1).toFloat)))
    val distinct = (0 until 1000).map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d + 1).toFloat)))
    val emb = (distinct ++ hot).toDF("vec_id", "embedding")
    val index = Ann.sampledIvf(emb, k = 4)
    val t0 = System.nanoTime()
    val out = Ann.semanticDedup(emb, index, threshold = 0.95)
    val keptHot = out.filter(col("vec_id") >= 1000 && col("kept")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    // min-id copy survives unless a smaller-id distinct mate is >= 0.95
    assert(keptHot <= 1, s"at most the min-id copy survives, got $keptHot")
    assert(out.count() == 20000)
    // the old pair join would stream ~180M pairs here; pre-collapse
    // keeps it to one aggregation — seconds, not minutes
    assert(secs < 60, f"mega-cluster took $secs%.1f s — pair block not collapsed?")
  }

  test("planted near-dups survive end-to-end minhash dedup at 20k docs") {
    val nd = Similarity.minhashNearDups(docs, "id", "text",
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val found = nd.filter(col("id_b") === col("id_a") + 1).count()
    assert(found >= (n / 100) * 7 / 10, s"recall too low on planted clones: $found")
  }

  test("budget select: 64-way two-pass prefix cut equals the 1-partition reference at 20k docs") {
    import graft.operators.BudgetSelect
    val costed = docs.select(col("id"), ((col("id") % 7) + 1).as("cost"),
      (col("id") % 1000).as("prio"))
    def cut(parts: Int): Set[Long] =
      BudgetSelect.selectByBudget(costed, "id", "cost", "prio", budget = 30000,
          partitions = parts)
        .select("id").collect().map(_.getLong(0)).toSet
    val wide = cut(64)
    assert(wide === cut(1), "partition-count-dependent prefix cut")
    assert(wide.nonEmpty && wide.size < n, "cut line must fall inside the corpus")
  }

  test("quota sample: many-group apportionment stays exact at 20k docs") {
    import graft.operators.QuotaSample
    val grouped = docs.select(col("id"), (col("id") % 137).cast("string").as("g"))
    val sel = QuotaSample.quotaSample(grouped, "g", "id", k = 997)
    assert(sel.count() === 997L, "quotas must sum to exactly k across 137 groups")
    // every group's draw equals its quota
    val bad = sel.groupBy("g").agg(count(lit(1)).as("m"), first("quota").as("q"))
      .filter(col("m") =!= col("q")).count()
    assert(bad === 0L)
  }

  test("quota sample at 1M groups: allocation stays parallel and sums to k") {
    import graft.operators.QuotaSample
    // a registrable-domain-sized group table — the shape that used to
    // funnel through one single-partition rank window. 2M rows, 1M
    // groups of 2; exactness (Σ quota = k) must survive the
    // range-exchange rank at this cardinality.
    val grouped = spark.range(2000000L)
      .select(col("id"), (col("id") % 1000000L).as("g"))
    val sel = QuotaSample.quotaSample(grouped, "g", "id", k = 499979)
    assert(sel.count() === 499979L,
      "largest-remainder quotas must sum to exactly k across 1M groups")
  }

  test("global rank at 1M groups matches the 1-partition reference on a boundary slice") {
    import graft.operators.GlobalOrder
    val t = spark.range(1000000L)
      .select(col("id"), ((col("id") * 2654435761L) % 999983L).as("ord"))
    val wide = GlobalOrder.withRowNumber(t, Seq(col("ord").desc, col("id")), "r",
      partitions = 64)
    val narrow = GlobalOrder.withRowNumber(t, Seq(col("ord").desc, col("id")), "r",
      partitions = 1)
    // ranks over a total order are partition-assignment-invariant:
    // compare an arbitrary slice (every ~9973rd id) across layouts
    def slice(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("id") % 9973 === 0).select("id", "r")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slice(wide) === slice(narrow), "partition-count-dependent global rank")
  }

  test("mixture temperature at 1M domains: weights normalize without any window") {
    import graft.operators.Converters
    val grouped = spark.range(2000000L)
      .select(col("id"), concat(lit("d"), (col("id") % 1000000L)).as("domain"))
    val w = Converters.mixtureTemperature(grouped, "domain")
    val p = w.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"1M-domain mixture must not window:\n$p")
    val s = w.agg(sum(col("weight"))).head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-6, s"weights must normalize, got $s")
  }
}
