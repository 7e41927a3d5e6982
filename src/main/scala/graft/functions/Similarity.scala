package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity / near-duplicate machinery for training-data pipelines:
  * cosine similarity over embedding columns, brute-force and LSH-bucketed
  * ANN, MinHash + banded LSH, SimHash, and n-gram Jaccard.
  *
  * Everything is column-expression based (codegen'd); candidate
  * generation is join-shaped so Spark distributes it. No driver-side
  * loops, no collect().
  */
object Similarity {

  // ---------------------------------------------------------------- cosine

  /** Dot product of two same-typed array columns, accumulated in double
    * in array order (deterministic). Native expression — the
    * aggregate(zip_with(...)) composition gives identical values but
    * evaluates interpreted with per-element boxing.
    */
  def dot(a: Column, b: Column): Column = VectorExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = VectorExprs.cosineSim(a, b)

  /** Probes are a query *batch* in the common case — broadcast them.
    * But the hint must be gated: an unconditional broadcast of a probe
    * set that is a fixed FRACTION of the corpus OOMs at 100× scale.
    *
    * Fast path: when the optimizer's size estimate is already small
    * the hint is safe with NO extra job. Plan-stat estimates here are
    * scan-stat based (file bytes scaled by projected columns; filters
    * don't shrink them without CBO), so a small estimate implies a
    * small actual set. Only when the estimate is large does the gate
    * pay one bounded job (`limit(bound+1).count()` stops at bound+1
    * rows, never scanning the full set); above the bound the cross
    * join runs un-hinted (AQE/planner decides) — still the inherent
    * O(n·m) exact work, just without a driver-sized copy. Probe sets
    * that large belong on the ANN paths (hyperplaneLsh / IvfIndex).
    */
  private[graft] val MaxBroadcastProbes = 10000L
  private[graft] val MaxBroadcastProbeBytes = 32L * 1024 * 1024

  private[graft] def gatedBroadcast(p: DataFrame): DataFrame = {
    val stats = p.queryExecution.optimizedPlan.stats
    val statSmall = stats.rowCount.map(_.longValue <= MaxBroadcastProbes)
      .getOrElse(stats.sizeInBytes <= MaxBroadcastProbeBytes)
    if (statSmall) broadcast(p)
    else if (p.limit((MaxBroadcastProbes + 1).toInt).count() <= MaxBroadcastProbes) broadcast(p)
    else p
  }

  /** Brute-force ANN baseline: top-k neighbors per probe vector.
    * At 100 TB corpus this is the exact-scoring final stage after
    * candidate pruning (see IVF/LSH).
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      probeId: String = "vec_id", corpusId: String = "vec_id",
      probeVec: String = "embedding", corpusVec: String = "embedding"): DataFrame = {
    val p = probes.select(col(probeId).as("query_id"), col(probeVec).as("_qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
    val scored = gatedBroadcast(p).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** All pairs (probe, corpus) with cosine >= threshold. */
  def similarPairs(probes: DataFrame, corpus: DataFrame, threshold: Double,
      probeId: String = "vec_id", corpusId: String = "vec_id",
      probeVec: String = "embedding", corpusVec: String = "embedding"): DataFrame = {
    val p = probes.select(col(probeId).as("query_id"), col(probeVec).as("_qv"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
    gatedBroadcast(p).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("_qv"), col("_cv")))
      .filter(col("sim") >= threshold)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  // --------------------------------------------------------------- MinHash

  /** MinHash signature from a hashed-shingle-set column.
    * h_i(S) = min over s in S of ((a_i * s + b_i) mod p), with fixed
    * seeds so signatures are reproducible run-over-run. p = 2^31 - 1
    * (Mersenne prime): a,b,h < p keeps a*h+b < 2^62 — no long overflow
    * inside Catalyst's ANSI arithmetic.
    */
  val MinhashPrime: Long = (1L << 31) - 1

  private[graft] def seededCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    // Deterministic SplitMix64 stream — stable across runs and JVMs.
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until numHashes).map { _ =>
      val a = java.lang.Math.floorMod(next(), MinhashPrime - 1) + 1
      val b = java.lang.Math.floorMod(next(), MinhashPrime)
      (a, b)
    }
  }

  /** Signature as array<bigint> of length numHashes; null-safe on empty
    * shingle sets (empty docs get a sentinel max signature). Column-only
    * form — prefer [[minhashSignatures]] (explode + hash-aggregate) for
    * whole-table signatures: higher-order aggregates are interpreted,
    * and this form re-evaluates the shingle set per permutation.
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column = {
    val perms = seededCoeffs(numHashes).map { case (a, b) =>
      aggregate(shingleHashes, lit(Long.MaxValue),
        (acc, h) => least(acc, pmod(lit(a) * pmod(h, lit(MinhashPrime)) + lit(b), lit(MinhashPrime))))
    }
    array(perms: _*)
  }

  /** Whole-table MinHash signatures as (id, sig) via shingle explode +
    * one hash aggregation with numHashes `min`s — codegen'd, map-side
    * partial aggregation, one shuffle on the doc id. Docs with fewer
    * than shingleN tokens produce no row (they cannot be near-dups).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, fnv: Boolean = false): DataFrame = {
    val coeffs = seededCoeffs(numHashes)
    // native one-pass shingle hashing (duplicate shingle hashes are
    // harmless under min-aggregation, so no distinct step). fnv=true
    // switches the shingle hash to FNV-1a over the shingle string —
    // reproducible by the DuckDB oracle (see FnvExprs.scala).
    val shingleHashExpr =
      if (fnv) FnvShingleHashes(col(textCol), shingleN)
      else ShingleHashes(col(textCol), shingleN)
    val exploded = docs.select(col(idCol).as("id"),
        explode(shingleHashExpr).as("h"))
      .withColumn("hm", pmod(col("h"), lit(MinhashPrime)))
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("hm") + lit(b), lit(MinhashPrime))).as(s"_m$i")
    }
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** Banded LSH: split the signature into `bands` bands of `rowsPerBand`.
    * Docs sharing any band are candidates. The bucket key is the band's
    * values joined as a string — collision-FREE, so "same bucket" is
    * exactly "same band slice" (an xxhash64 bucket would admit false
    * candidates no SQL oracle could reproduce). ~10 bytes/hash on the
    * wire vs 8 for a hashed bucket — immaterial next to the shuffle
    * the candidate join already pays.
    */
  def lshBandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), ",").as("bucket")))

  /** Candidate pairs via LSH band buckets: explode bands, self-join on
    * (band, bucket). Distributed end-to-end; the join key is the band
    * bucket so only colliding docs meet. Returns (id_a < id_b) pairs.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      fnv: Boolean = false, maxBucket: Int = Int.MaxValue,
      droppedBuckets: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // signatures are reused three times (banding + two lookups) —
    // lazy persist computes them once within the first job WITHOUT the
    // separate blocking job an eager localCheckpoint pays, and (unlike
    // a checkpoint's truncated lineage) an evicted or lost block is
    // recomputed from lineage — the fault-tolerant choice on a real
    // cluster, where executor loss under a checkpoint is job failure
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, numHashes, fnv)
      .persist(StorageLevel.MEMORY_AND_DISK)
    lshCandidatePairsFromSigs(sigs, numHashes, bands, maxBucket, droppedBuckets)
  }

  /** (id, band, bucket) banding rows of an (id, sig) frame. */
  private def bandedOf(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("id"),
      explode(lshBandHashes(col("sig"), bands, rowsPerBand)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.bucket").as("bucket"))

  /** Candidate pairs from a precomputed (id, sig) frame — the reusable
    * core of [[lshCandidatePairs]] (the incremental path feeds it the
    * unmatched slice of a batch).
    *
    * `maxBucket` is the hot-band skew guard (the SCALING.md "hot band
    * bucket → O(bucket²) pairs" failure mode): with a cap, the
    * per-(band, bucket) membership list is bounded INSIDE the
    * aggregate ([[CollectListCapped]] — a hot bucket costs O(cap)
    * memory ever, and AQE cannot split a single join key, so the cap
    * must live in the aggregate), and buckets past the cap are DROPPED
    * from candidate generation — the same capped-set discipline as
    * [[ngramJaccardPairs]]'s stopword-shingle cut. A bucket that hot
    * is band-wise boilerplate: its pairs are the least informative and
    * the first thing parameter tuning (more bands) would shed anyway.
    * `droppedBuckets` observes (dropped, total) bucket counts on the
    * same job. Uncapped (the default) keeps the narrow self-join shape
    * — collecting unbounded buckets would be worse than joining them.
    */
  def lshCandidatePairsFromSigs(sigs: DataFrame, numHashes: Int,
      bands: Int, maxBucket: Int = Int.MaxValue,
      droppedBuckets: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxBucket > 1, "maxBucket must be > 1 (pairs need >= 2 ids)")
    val rowsPerBand = numHashes / bands
    // candidate generation stays NARROW: only (id, band, bucket) is
    // shuffled/deduped; the 16-wide signatures join back afterwards,
    // once per distinct pair instead of once per band collision.
    val banded = bandedOf(sigs, bands, rowsPerBand)
    val pairs =
      if (maxBucket == Int.MaxValue) {
        val a = banded.select(col("id").as("id_a"), col("band"), col("bucket"))
        val b = banded.select(col("id").as("id_b"), col("band"), col("bucket"))
        a.join(b, Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
      } else {
        val grouped = banded.groupBy(col("band"), col("bucket"))
          .agg(sort_array(CollectListCapped(col("id"), maxBucket)).as("ids"))
        val observed = droppedBuckets.map(o => grouped.observe(o,
            sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
              .as("dropped_buckets"),
            count(lit(1)).as("total_buckets"))).getOrElse(grouped)
        val kept = observed
          .filter(size(col("ids")) <= maxBucket && size(col("ids")) > 1)
        // in-list ordered pairs (ids sorted, so id_a < id_b holds);
        // expansion bounded by cap² per bucket
        val pairExpr = flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2),
              greatest(size(col("ids")) - i - 1, lit(0))),
            y => struct(x.as("id_a"), y.as("id_b")))))
        kept.select(explode(pairExpr).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      }
    pairs
      .distinct()
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
  }

  /** Estimated Jaccard from signatures: fraction of agreeing hashes. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column =
    round(size(filter(zip_with(sigA, sigB, (x, y) => x === y), m => m))
      .cast("double") / size(sigA).cast("double"), 6)

  /** MinHash near-dup pairs: LSH candidates filtered by estimated
    * Jaccard >= threshold.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      fnv: Boolean = false, maxBucket: Int = Int.MaxValue,
      droppedBuckets: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    lshCandidatePairs(docs, idCol, textCol, shingleN, numHashes, bands, fnv,
        maxBucket, droppedBuckets)
      .withColumn("est_jaccard", minhashJaccardEstimate(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))

  /** Incremental MinHash near-dup — the ongoing-ingest face of
    * [[minhashNearDups]], same contract family as
    * Dedup.incrementalExact and SubstringDedup.duplicatedSpansIncremental:
    * a new batch is deduplicated against BOTH itself and a LEDGER of
    * previously-accepted signatures, without rescanning the prior
    * corpus. The ledger is one (id, sig) row per accepted doc —
    * numHashes ints per document, orders of magnitude smaller than
    * the text it stands for.
    *
    * Returns (report, ledgerAdditions):
    *   report — one row per batch doc: (id, status, matched_id) with
    *     status `dup_ledger` (estimated Jaccard >= threshold against
    *     an accepted prior doc; matched_id = the smallest such id —
    *     prior corpus wins), `dup_batch` (near-dups other batch docs;
    *     matched_id = its connected component's minimum id, which is
    *     the member that survives), or `kept`;
    *   additions — kept docs' (id, sig), to append for the next batch.
    *
    * Shape: one signature pass over the batch, banded equi-joins for
    * both the ledger probe and the in-batch candidates (bucket-keyed,
    * never all-pairs), distributed component resolution. The ledger
    * probe is the same hash-partitioned join as the batch's own — AQE
    * broadcasts it while the ledger is small.
    */
  def minhashIncremental(batch: DataFrame, ledger: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4,
      fnv: Boolean = true): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, s"bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(batch, idCol, textCol, shingleN, numHashes, fnv)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val led = ledger.select(col("id"), col("sig"))
    // ledger probe: banded candidates, then the agreement check
    val vsLedger = bandedOf(sigs, bands, rowsPerBand)
      .join(bandedOf(led, bands, rowsPerBand)
        .select(col("id").as("lid"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select(col("id"), col("lid")).distinct()
      .join(sigs, Seq("id"))
      .join(led.select(col("id").as("lid"), col("sig").as("sig_l")), Seq("lid"))
      .filter(minhashJaccardEstimate(col("sig"), col("sig_l")) >= threshold)
      .groupBy(col("id")).agg(min(col("lid")).as("matched_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // in-batch resolution over the docs the ledger did NOT claim
    val freshSigs = sigs.join(vsLedger.select(col("id")), Seq("id"), "left_anti")
    val pairs = lshCandidatePairsFromSigs(freshSigs, numHashes, bands)
      .filter(minhashJaccardEstimate(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val clusters = graft.operators.Dedup.clusterPairs(pairs) // (id, rep)
    val report = batch.select(col(idCol).as("id"))
      .join(vsLedger.withColumnRenamed("matched_id", "_led"), Seq("id"), "left")
      .join(clusters.withColumnRenamed("rep", "_rep"), Seq("id"), "left")
      .select(col("id"),
        when(col("_led").isNotNull, "dup_ledger")
          .when(col("_rep").isNotNull && col("_rep") =!= col("id"), "dup_batch")
          .otherwise("kept").as("status"),
        coalesce(col("_led"),
          when(col("_rep") =!= col("id"), col("_rep"))).as("matched_id"))
    // short docs (< shingleN tokens) have no signature: they are kept
    // (nothing to match on) but add nothing to the ledger
    val additions = sigs
      .join(report.filter(col("status") === "kept").select(col("id")), Seq("id"))
      .select(col("id"), col("sig"))
    (report, additions)
  }

  // --------------------------------------------------------------- Jaccard

  /** Exact n-gram Jaccard pairs within a blocking column — the oracle-
    * checkable exact counterpart of MinHash. Blocking keeps the pair
    * space tractable; at scale the blocking column is the LSH bucket.
    *
    * Shape: explode shingles → equi-join on (block, shingle) → count
    * intersections per pair → join per-doc set sizes. All shuffles are
    * equi-joins/aggregations (no quadratic array_intersect over a
    * blown-up pair cross product), so it survives block skew and scales
    * out. Pairs with an empty intersection never materialize — correct,
    * since threshold > 0.
    *
    * `maxDocFreq` caps shingle "document frequency" within a block:
    * shingles appearing in more than maxDocFreq docs are removed from
    * the shingle SETS (both intersection and union) — the standard
    * stopword-shingle cut. Without a cap, one stopword-ish shingle in a
    * block puts the whole block's doc ids into ONE aggregation row and
    * one task pays O(df²) pairs for it — AQE skew-split cannot divide a
    * single group, so at 100 TB this is an executor OOM. The cap is
    * enforced with a count-only aggregation BEFORE any id list is
    * collected, so a hot shingle never materializes anywhere.
    * `droppedShingles` (optional) rides the same job and reports how
    * many (block, shingle) groups the cap removed. Caveat: when the
    * whole query result is EMPTY, AQE's empty-relation propagation can
    * prune the metrics node with the rest of the plan and the
    * observation stays unset — treat "no metrics" as "no output", not
    * as "nothing dropped".
    */
  /** Edit-distance CONFIRMATION of candidate near-dup pairs — the
    * exact second stage after any set-similarity candidate generator
    * (Jaccard / MinHash / SimHash): Levenshtein over ONLY the
    * candidate pairs, never a corpus cross-product (exact edit
    * distance is O(len²) per pair — affordable precisely because
    * candidates are few). `rel_dist` = distance / max(len) in [0,1];
    * `confirmed` = rel_dist <= maxRel. Join shape: two hash joins on
    * the id (broadcast when the pair set is small — AQE decides).
    */
  def editDistanceConfirm(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxRel: Double): DataFrame = {
    require(maxRel >= 0.0 && maxRel <= 1.0, s"maxRel must be in [0,1], got $maxRel")
    val texts = docs.select(col(idCol).as("_jid"), col(textCol).as("_t"))
    val joined = pairs
      .join(texts.withColumnRenamed("_jid", "id_a").withColumnRenamed("_t", "_ta"), Seq("id_a"))
      .join(texts.withColumnRenamed("_jid", "id_b").withColumnRenamed("_t", "_tb"), Seq("id_b"))
    joined.select(col("id_a"), col("id_b"),
        levenshtein(col("_ta"), col("_tb")).as("edit_dist"),
        (levenshtein(col("_ta"), col("_tb")).cast("double") /
          greatest(length(col("_ta")), length(col("_tb")), lit(1)).cast("double"))
          .as("rel_dist"))
      .withColumn("confirmed", col("rel_dist") <= maxRel)
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, threshold: Double,
      maxDocFreq: Int = Int.MaxValue,
      droppedShingles: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(threshold > 0.0, "threshold must be > 0 (zero-overlap pairs are never produced)")
    require(maxDocFreq > 1, "maxDocFreq must be > 1 (pairs need df >= 2)")
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("block"),
      explode(array_distinct(StringShingles(col(textCol), n))).as("s"))
    // ONE aggregation builds the per-(block, shingle) doc list; with a
    // cap, [[CollectListCapped]] bounds the buffer INSIDE the aggregate
    // (a hot group costs O(cap) memory, ever), and size > cap marks the
    // group as overflowed → dropped from both intersections and sizes.
    val collectIds =
      if (maxDocFreq == Int.MaxValue) sort_array(collect_list(col("id")))
      else sort_array(CollectListCapped(col("id"), maxDocFreq))
    val grouped = sh.groupBy(col("block"), col("s")).agg(collectIds.as("ids"))
    val kept = grouped.filter(size(col("ids")) <= maxDocFreq)
    // per-doc set sizes AFTER the cap (capped-set semantics: hot
    // shingles leave the union too, like a stopword cut)
    val sizes = kept.select(explode(col("ids")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    // Pair generation WITHOUT a self-join: emit each kept list's
    // ordered pairs, count per pair. One scan of the shingle table and
    // two hash-agg shuffles — vs. two scans + a join shuffle for the
    // classic self-join shape. Lists are <= maxDocFreq long, so the
    // per-row pair expansion is bounded by cap².
    val pairExpr = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), greatest(size(col("ids")) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    // the dropped-shingle count rides the pair branch only (a second
    // CollectMetrics copy on the sizes branch could double-count)
    val forPairs = droppedShingles.map(o => grouped.observe(o,
        sum(when(size(col("ids")) > maxDocFreq, 1L).otherwise(0L)).as("dropped_shingles"),
        count(lit(1)).as("total_shingles"))).getOrElse(grouped)
      .filter(size(col("ids")) <= maxDocFreq)
    val inter = forPairs
      .filter(size(col("ids")) > 1)
      .select(col("block"), explode(pairExpr).as("p"))
      .groupBy(col("block"), col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    // sizes has one row per doc — scales with the corpus, so no
    // broadcast hint; AQE picks broadcast when it actually fits.
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        greatest(col("uni"), lit(1)).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------- decontamination

  /** Benchmark decontamination: per-document n-gram overlap against a
    * benchmark/eval set (the GPT-3-style contamination check a training
    * pipeline runs before anything ships to a trainer). For each corpus
    * document: the fraction of its DISTINCT word n-grams that appear
    * anywhere in the benchmark set, and a flag at `threshold`.
    *
    * Shape: both sides explode to distinct shingle strings; the corpus
    * side left-joins the (deduped) benchmark shingle set and aggregates
    * hit counts per doc — one equi-join + one hash aggregation. The
    * benchmark side is eval data and therefore SMALL by nature, so the
    * join is broadcast through the same stats-gated hint the cosine
    * paths use (a benchmark that outgrows the gate degrades to a
    * shuffled equi-join instead of OOMing the executors). Documents
    * with fewer than n tokens have an empty shingle set — they rejoin
    * the output with ratio 0 via the final left join on ids (which also
    * keeps output cardinality == corpus cardinality, a property the
    * oracle checks).
    */
  def benchmarkOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, threshold: Double): DataFrame = {
    val benchSh = benchmark
      .select(explode(array_distinct(StringShingles(col(textCol), n))).as("s"))
      .distinct()
    val docSh = corpus.select(col(idCol).as("id"),
      explode(array_distinct(StringShingles(col(textCol), n))).as("s"))
    val counts = docSh
      .join(gatedBroadcast(benchSh.withColumn("_hit", lit(1))), Seq("s"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).as("n_overlap"))
    corpus.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_ratio", col("n_overlap").cast("double") /
        greatest(col("n_shingles"), lit(1)).cast("double"))
      .withColumn("contaminated", col("overlap_ratio") >= threshold)
  }

  /** Duplicate-shingle saturation: for each document, the fraction of
    * its DISTINCT word n-grams whose corpus-wide document frequency
    * exceeds `maxDocFreq` — the Dolma/CCNet-style "how much of this
    * document is boilerplate that exists elsewhere" signal, used to
    * drop template-heavy docs that exact/near dedup both miss (no
    * single source doc matches, but every phrase is common).
    *
    * Shape: one shingle explode, a count-ONLY doc-freq aggregation
    * (map-side partial; a hot shingle is one counter, never a list),
    * a keyed join back, and a per-doc aggregation. The join's skew on
    * stopword-ish shingles is ordinary join-key skew — AQE's skew
    * split handles it (unlike a hot aggregation GROUP, which is why
    * ngramJaccardPairs needs its in-aggregate cap and this does not).
    * Docs too short to shingle surface with saturation 0.
    */
  def duplicateShingleSaturation(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(StringShingles(col(textCol), n))).as("s"))
    val docFreq = sh.groupBy(col("s")).agg(count(lit(1)).as("_df"))
    val perDoc = sh.join(docFreq, Seq("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") > maxDocFreq, 1L).otherwise(0L)).as("n_dup_shingles"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"))
      .withColumn("dup_saturation", col("n_dup_shingles").cast("double") /
        greatest(col("n_shingles"), lit(1)).cast("double"))
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens — native Catalyst expression
    * (see [[SimHash64]]): one pass, imperative bit voting.
    */
  def simhash64(text: Column): Column = SimHash64(text)

  /** SimHash with FNV-1a token hashing — identical voting semantics,
    * oracle-reproducible hash (see FnvExprs.scala).
    */
  def simhashFnv64(text: Column): Column = SimHashFnv64(text)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** All pairs within a block with hamming(simhash) <= maxHamming —
    * EXACTLY the result of the naive block self-join, without the
    * quadratic pair blowup. Pigeonhole banding: the 64 bits split into
    * maxHamming+1 contiguous bands; any pair within hamming maxHamming
    * has fewer differing bits than bands, so >= 1 band matches exactly
    * → candidates come from an equi-join on (block, band, bits) and
    * only candidates pay the hamming check. At 100× data this is the
    * difference between a keyed shuffle and an O(n²)-per-block join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxHamming: Int, fnv: Boolean = true): DataFrame = {
    val shExpr = if (fnv) simhashFnv64(col(textCol)) else simhash64(col(textCol))
    hammingPairs64(
      docs.select(col(blockCol), col(idCol), shExpr.as("_sh64")),
      idCol, "_sh64", blockCol, maxHamming)
  }

  /** Component-preserving near-dup EDGES over a 64-bit hash — the
    * resolution-path variant of [[hammingPairs64]]: bit-identical
    * groups collapse to m-1 STAR edges rooted at the group minimum
    * (the starPairs shape — never m(m-1)/2 clique pairs), and the
    * banded join runs over DISTINCT hash values only. The edge list
    * has exactly the connected components of the full pair list (ids
    * sharing a hash are star-connected; a near-dup pair with distinct
    * hashes connects through its hash representatives), so feed it to
    * Dedup.clusterPairs when resolving survivors; use
    * [[hammingPairs64]] only when every individual pair is the
    * answer. A corpus with 10^6 bit-identical images costs 10^6 - 1
    * edges here instead of 5*10^11 pairs.
    */
  def hammingEdges64(hashes: DataFrame, idCol: String, hashCol: String,
      blockCol: String, maxHamming: Int): DataFrame =
    hammingPairs64(hashes, idCol, hashCol, blockCol, maxHamming,
      collapseIdentical = true)
      .select(col("id_a"), col("id_b"))

  /** All pairs within a block with hamming(hash) <= maxHamming, for
    * ANY precomputed 64-bit locality hash column (simhash, image
    * average-hash, audio fingerprint) — the same pigeonhole banding
    * as [[simhashPairs]], factored out: exactly the naive block
    * self-join's result without the quadratic pair blowup.
    *
    * `collapseIdentical=false` enumerates every qualifying pair — the
    * answer when each pair is the deliverable, but output is
    * inherently m²/2 in a block dominated by one hash value (a corpus
    * of monochrome images, silence-padded audio). With
    * `collapseIdentical=true` each bit-identical (block, hash) group
    * contributes m-1 STAR edges rooted at its min id (hamming 0) and
    * the banded join runs over one representative per DISTINCT hash —
    * same connected components, linear output: 10^6 identical items
    * cost 10^6 - 1 edges instead of 5·10^11 pairs. Resolution
    * pipelines should take this shape (or [[hammingEdges64]], its
    * id-pair projection).
    */
  def hammingPairs64(hashes: DataFrame, idCol: String, hashCol: String,
      blockCol: String, maxHamming: Int,
      collapseIdentical: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    if (collapseIdentical) {
      val base = hashes.select(col(blockCol).as("block"), col(idCol).as("id"),
        col(hashCol).as("sh"))
      // group min per (block, hash); m-1 star edges, diameter 2
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("block"), col("sh"))
      val stars = base
        .withColumn("id_a", min(col("id")).over(w))
        .filter(col("id") =!= col("id_a"))
        .select(col("block"), col("id_a"), col("id").as("id_b"),
          lit(0).as("hamming"))
      // banding over one representative per distinct hash; distinct
      // hashes have hamming >= 1 by definition, so no overlap with stars
      val reps = base.groupBy(col("block"), col("sh"))
        .agg(min(col("id")).as("id"))
      val repPairs = hammingPairs64(reps, "id", "sh", "block", maxHamming)
      return stars.union(repPairs.select(
        col("block"), col("id_a"), col("id_b"), col("hamming")))
    }
    val nBands = maxHamming + 1
    val sh = hashes.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(hashCol).as("sh"))
    // cumulative bit offsets partition [0, 64) into nBands spans
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    val bandCols = (0 until nBands).map { i =>
      val lo = bounds(i)
      val width = bounds(i + 1) - lo
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(i).as("band"), (shiftrightunsigned(col("sh"), lo).bitwiseAND(lit(mask))).as("bits"))
    }
    // The 8-byte simhash RIDES the band join (unlike the 128-byte
    // minhash signatures or 256-byte embeddings, where candidates stay
    // narrow and values join back): widening each banded row by one
    // long deletes BOTH pair-side lookup joins, and the hamming check
    // runs per collision (bit_count — trivial CPU) so distinct() only
    // processes pairs already within the radius. Both join inputs share
    // one subplan; exchange reuse computes/shuffles it once.
    val banded = sh.select(col("block"), col("id"), col("sh"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("block"), col("id"), col("sh"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    banded.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"),
        col("band"), col("bits"))
      .join(banded.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"),
        col("band"), col("bits")), Seq("block", "band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("block"), col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }
}
