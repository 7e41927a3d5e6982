package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor scale paths over an embedding column
  * (`array<float>`): [[Ann.hyperplaneLsh]] (random-hyperplane signatures
  * → bucket join) and [[Ann.IvfIndex]] (k-means coarse quantizer →
  * probe-nearest-partitions). `Similarity.bruteForceTopK` is the exact
  * baseline both are measured against.
  *
  * At 100 TB the shape is: candidate generation is an equi-join on
  * bucket ids (shuffle on small keys, never a cross join), exact
  * cosine rescoring touches only candidates. Hyperplanes/centroids are
  * driver-computed small artifacts broadcast to executors.
  */
object Ann {

  /** Deterministic unit-free hyperplanes via SplitMix64 — stable across
    * runs/JVMs (same requirement as MinHash seeds).
    */
  private[graft] def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    // sign bits pack into one Long: 64th+ plane would silently wrap
    require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1, 63], got $nPlanes")
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // Box-Muller from uniform bits for gaussian-ish planes
    Array.fill(nPlanes) {
      Array.fill(dim) {
        val u1 = (next() >>> 11).toDouble / (1L << 53).toDouble
        val u2 = (next() >>> 11).toDouble / (1L << 53).toDouble
        math.sqrt(-2 * math.log(u1 + 1e-300)) * math.cos(2 * math.Pi * u2)
      }
    }
  }

  /** Sign-bit signature column: bit i = sign(v . plane_i). Built as a
    * codegen'd expression sum over zip_with — no UDF.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length >= 1 && planes.length <= 63,
      s"sign bits pack into one Long: need 1..63 planes, got ${planes.length}")
    val v = vec.cast("array<double>")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(VectorExprs.dotProduct(v, lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The probe-side bucket set for MULTI-PROBE LSH (Lv et al., VLDB
    * 2007): the base signature plus the buckets reached by flipping —
    * one at a time — the `nFlip` bits whose hyperplane margin |v·p| is
    * smallest. A near-neighbor that lands one bucket over almost
    * always differs in a low-margin bit, so probing those buckets buys
    * the recall of extra tables WITHOUT growing the corpus-side index:
    * candidates grow ≤ (1+nFlip)x on the probe side only.
    */
  def multiProbeBuckets(vec: Column, planes: Array[Array[Double]], nFlip: Int): Column = {
    require(planes.length >= 1 && planes.length <= 63,
      s"sign bits pack into one Long: need 1..63 planes, got ${planes.length}")
    // (the 2^i exact-double trick below also needs i < 52 — implied)
    val v = vec.cast("array<double>")
    val dots = planes.toSeq.map(p => VectorExprs.dotProduct(v, lit(p)))
    val base = dots.zipWithIndex.map { case (d, i) =>
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // plane indices ordered by |margin| ascending; flip the nFlip smallest
    val ranked = array(dots.zipWithIndex.map { case (d, i) =>
      struct(abs(d).as("m"), lit(i).as("i"))
    }: _*)
    val flipIdx = slice(array_sort(ranked), 1, math.min(nFlip, planes.length)).getField("i")
    // 2^i as exact double->long (i < 52 always holds for sign bitsets)
    concat(array(base),
      transform(flipIdx, i => base.bitwiseXOR(pow(lit(2.0), i).cast("long"))))
  }

  /** LSH-bucketed ANN: same-signature vectors are candidates; exact
    * cosine rescoring; top-k per probe. Multi-table (nTables) repeats
    * with independent planes to recover recall lost to bucket splits;
    * `nProbeBits` > 0 additionally multi-probes the lowest-margin
    * neighboring buckets on the probe side (see [[multiProbeBuckets]]).
    *
    * Parameter math: per-bit agreement for neighbors at angle θ is
    * 1-θ/π; recall ≈ 1-(1-p^nPlanes)^nTables. Moderate-similarity
    * neighbors (cos ~0.5, p ~0.63) need FEW planes and MANY tables —
    * e.g. 4 planes x 8 tables ≈ 0.75 recall; 12 planes x 4 tables is
    * ~4%. Tune nPlanes to the similarity profile of the corpus; at
    * 100 TB prefer more planes (smaller buckets) + multi-probe over
    * more tables (corpus-side signature cost is per table, probe-side
    * bucket fan-out is nearly free).
    */
  def hyperplaneLsh(probes: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, nTables: Int = 8, dim: Int = 64,
      id: String = "vec_id", vec: String = "embedding",
      nProbeBits: Int = 0): DataFrame = {
    val tables = (0 until nTables).map(t => hyperplanes(dim, nPlanes, seed = 0x5EED + t * 7919L))
    // ALL tables' signatures in one projection — a single pass over
    // each side (vs one scan+materialization per table), then a narrow
    // (table, bucket) equi-join; vectors join back once per distinct
    // candidate pair for exact rescoring. Same shape as
    // lshSimilarPairs, plus the per-probe top-k window.
    def banded(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val sigStruct = array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("t"), hyperplaneSignature(col(vecCol), planes).as("b"))
      }: _*)
      df.select(col(idCol), explode(sigStruct).as("tb"))
        .select(col(idCol), col("tb.t").as("t"), col("tb.b").as("b"))
    }
    // lazy persist: computed once inside the first job (no separate
    // blocking job like an eager checkpoint), lineage kept so lost
    // blocks recompute instead of failing the job on a real cluster
    val corpusVecs = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusBanded = banded(corpusVecs, "neighbor_id", "_cv")
    val probeSide = probes.select(col(id).as("query_id"), col(vec).as("_qv"))
    val probeBanded =
      if (nProbeBits <= 0) banded(probeSide, "query_id", "_qv")
      else {
        // multi-probe: each table contributes (1 + nProbeBits) buckets
        val sigStruct = array(tables.zipWithIndex.map { case (planes, t) =>
          struct(lit(t).as("t"), multiProbeBuckets(col("_qv"), planes, nProbeBits).as("bs"))
        }: _*)
        probeSide.select(col("query_id"), explode(sigStruct).as("tb"))
          .select(col("query_id"), col("tb.t").as("t"), explode(col("tb.bs")).as("b"))
      }
    val cand = probeBanded.join(corpusBanded, Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val probeVecs = probes.select(col(id).as("query_id"), col(vec).as("_qv"))
    val cands = cand
      .join(probeVecs, Seq("query_id"))
      .join(corpusVecs, Seq("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** The full 100 TB ANN pipeline: LSH bucket candidate generation →
    * int8-quantized integer-dot prefilter (top-`prefilter` per probe)
    * → exact float re-rank (top-`k`). The middle stage is the
    * bandwidth lever: candidates are scored on 1-byte-per-dim
    * quantized vectors ([[Quantize]]), and the 4-bytes-per-dim float
    * vectors are fetched ONLY for the `prefilter` survivors — at scale
    * that's the difference between streaming the quantized index from
    * page cache and re-reading the float corpus per query batch.
    *
    * Every stage is deterministic (tie-breaks on neighbor_id), so the
    * three-stage composition is replayed exactly by the DuckDB oracle
    * (OracleSql.annHyperplaneLshQuantized).
    */
  def hyperplaneLshQuantized(probes: DataFrame, corpus: DataFrame, k: Int, prefilter: Int,
      nPlanes: Int = 4, nTables: Int = 8, dim: Int = 64,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(prefilter >= k, s"prefilter $prefilter must be >= k $k")
    val tables = (0 until nTables).map(t => hyperplanes(dim, nPlanes, seed = 0x5EED + t * 7919L))
    def banded(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val sigStruct = array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("t"), hyperplaneSignature(col(vecCol), planes).as("b"))
      }: _*)
      df.select(col(idCol), explode(sigStruct).as("tb"))
        .select(col(idCol), col("tb.t").as("t"), col("tb.b").as("b"))
    }
    val corpusVecs = Quantize.withQuantized(
        corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv")), "_cv", "_qc")
      .select(col("neighbor_id"), col("_cv"), col("_qc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeVecs = Quantize.withQuantized(
        probes.select(col(id).as("query_id"), col(vec).as("_qv")), "_qv", "_qp")
      .select(col("query_id"), col("_qv"), col("_qp"))
    val cand = banded(probeVecs, "query_id", "_qv")
      .join(banded(corpusVecs, "neighbor_id", "_cv"), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    // stage 2: integer scoring on the quantized columns ONLY
    val scored = cand
      .join(probeVecs.select(col("query_id"), col("_qp")), Seq("query_id"))
      .join(corpusVecs.select(col("neighbor_id"), col("_qc")), Seq("neighbor_id"))
      .withColumn("_qdot", Quantize.intDot(col("_qp"), col("_qc")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("_qdot").desc, col("neighbor_id"))
    val pruned = scored.withColumn("_qrn", row_number().over(wq))
      .filter(col("_qrn") <= prefilter)
      .select(col("query_id"), col("neighbor_id"))
    // stage 3: float vectors fetched only for survivors
    val reranked = pruned
      .join(probeVecs.select(col("query_id"), col("_qv")), Seq("query_id"))
      .join(corpusVecs.select(col("neighbor_id"), col("_cv")), Seq("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    reranked.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** Self-join LSH near-dup pairs over one corpus: ALL tables'
    * signatures computed in a single projection (one pass over the
    * vectors), candidates generated by a narrow (id, table, bucket)
    * equi-join, vectors joined back once per distinct pair for exact
    * rescoring. No top-k window — this is the dedup shape ("every pair
    * above threshold"), not the search shape.
    */
  def lshSimilarPairs(corpus: DataFrame, threshold: Double,
      nPlanes: Int = 4, nTables: Int = 8, dim: Int = 64,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val tables = (0 until nTables).map(t => hyperplanes(dim, nPlanes, seed = 0x5EED + t * 7919L))
    val vecs = corpus.select(col(id).as("id"), col(vec).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // lazy; 3 uses, lineage kept
    val sigStruct = array(tables.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("t"), hyperplaneSignature(col("_v"), planes).as("b"))
    }: _*)
    val banded = vecs.select(col("id"), explode(sigStruct).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = banded.select(col("id").as("id_a"), col("t"), col("b"))
      .join(banded.select(col("id").as("id_b"), col("t"), col("b")), Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("_v").as("_va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("_v").as("_vb")), Seq("id_b"))
      .withColumn("sim", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF index: k-means coarse quantizer. `fit` computes centroids
    * (driver-held, tiny); `search` scores probes against centroids,
    * keeps the nProbe nearest inverted lists, and rescores exactly
    * within them. The corpus-side assignment is computed once and can
    * be persisted as a column (re-used across queries).
    */
  final case class IvfIndex(centroids: Array[(Int, Array[Double])]) {

    // centroid ids are the positional index (fitIvf's zipWithIndex), so
    // the top-k expression's positional output IS the centroid id
    private val table: Array[Array[Double]] = centroids.sortBy(_._1).map(_._2)

    /** Nearest centroid id, one native expression — O(k·dim) per row
      * with the centroid table as a task-resident double[][]. A
      * `when`-chain argmax would be O(k) nested expressions and break
      * whole-stage codegen past k≈100; IVF at scale wants k≈4096.
      */
    def assignColumn(vec: Column): Column =
      element_at(CentroidTopK(vec, table, 1), 1)

    /** Array of the nProbe highest-scoring centroid ids (descending
      * dot; smaller id wins exact ties — deterministic).
      */
    def probeColumn(vec: Column, nProbe: Int): Column =
      CentroidTopK(vec, table, nProbe)

    // L2 variants via the augmentation trick (argmin ‖x−c‖² = argmax
    // over (x ++ [1]) · (c ++ [−‖c‖²/2])). Residual PQ requires L2
    // assignment to make residuals small: max-dot assignment favors
    // large-norm centroids and leaves x − c_list unbounded. (On a
    // unit-normalized corpus the two assignments coincide; the
    // residual advantage then appears only when lists are MANY enough
    // that intra-list dot is high — see the AnnSpec measurement.)
    private val augTable: Array[Array[Double]] =
      table.map(c => c :+ (-0.5 * c.map(x => x * x).sum))

    private def augmented(vec: Column): Column =
      concat(vec.cast("array<double>"), array(lit(1.0d)))

    /** L2-nearest centroid id. */
    def assignL2Column(vec: Column): Column =
      element_at(CentroidTopK(augmented(vec), augTable, 1), 1)

    /** The nProbe L2-nearest centroid ids. */
    def probeL2Column(vec: Column, nProbe: Int): Column =
      CentroidTopK(augmented(vec), augTable, nProbe)

    def search(probes: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
        id: String = "vec_id", vec: String = "embedding"): DataFrame = {
      val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
        assignColumn(col(vec)).as("list_id"))
      val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"),
        explode(probeColumn(col(vec), nProbe)).as("list_id"))
      val cands = p.join(c, Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      cands.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
        .select(col("query_id"), col("neighbor_id"), col("sim"))
    }

    /** FILTERED vector search (the "metadata predicate + top-k" shape
      * every retrieval stack needs): pre-filter the corpus, then widen
      * the probe set in proportion to the filter's selectivity —
      * nProbeEff = min(nCentroids, ceil(nProbe · total/kept)) — so a
      * filter keeping 1/s of the corpus probes ~s× more lists and
      * expected candidates-per-query stays ~constant instead of
      * collapsing (the recall cliff of naive post-filtering). A fully
      * selective filter degrades gracefully to exact search over the
      * survivors (all lists probed). Costs two count jobs (O(1) driver
      * scalars — selectivity, not data); at 100 TB feed `totalHint`/
      * `keptHint` from catalog stats to skip them.
      */
    def searchFiltered(probes: DataFrame, corpus: DataFrame, pred: Column,
        k: Int, nProbe: Int, id: String = "vec_id", vec: String = "embedding",
        totalHint: Long = -1L, keptHint: Long = -1L): DataFrame = {
      val filtered = corpus.filter(pred)
      val total = if (totalHint >= 0) totalHint else corpus.count()
      val kept = if (keptHint >= 0) keptHint else filtered.count()
      val np =
        if (kept <= 0) nProbe
        else math.min(centroids.length.toLong,
          (nProbe.toLong * total + kept - 1) / kept).toInt
      search(probes, filtered, k, np, id, vec)
    }
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-level
    * semantic deduplication — assign every vector to its coarse
    * cluster, then within each cluster drop any vector that has a
    * SMALLER-ID cluster-mate with cosine >= threshold (deterministic
    * survivor = the min id, the paper's "keep one per dup set" with a
    * stable choice). The clustering is what makes this 100 TB-safe:
    * the pairwise test is an equi-join on cluster id, so each
    * inverted list's pair block is bounded by its list size
    * (corpus/k expected) and no cross-corpus O(m²) ever forms — the
    * exact SemDeDup trade (cross-cluster dups are missed; tighten
    * with more clusters, not more pairs). Returns (id, cluster, kept)
    * for every input vector.
    */
  def semanticDedup(corpus: DataFrame, index: IvfIndex, threshold: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    // < 1 strictly: at exactly 1.0 the pre-collapse's "identical =
    // duplicate" shortcut could diverge from the IEEE cosine of an
    // identical pair by an ulp; for exact-only dedup use Dedup.exact
    require(threshold < 1.0, s"cosine threshold must be < 1, got $threshold")
    val assigned = corpus.select(col(id).cast("long").as("_id"),
      col(vec).cast("array<double>").as("_e"),
      index.assignColumn(col(vec)).as("cluster"))
    // exact-duplicate PRE-COLLAPSE: byte-identical vectors share one
    // representative (the group min id — identical vectors always share
    // a cluster, the assignment is deterministic in the values). A
    // non-representative is a duplicate BY DEFINITION (its rep is a
    // smaller-id mate at cosine ~1 >= any threshold <= 1), so the
    // pairwise stage runs over DISTINCT vectors only — the pathological
    // all-identical cluster costs one hash aggregation (O(m)), not an
    // O(m^2) pair block. One extra agg + join, both on the vector hash.
    val reps = assigned.groupBy(col("_e")).agg(min(col("_id")).as("_rep"))
    val withRep = assigned.join(reps, Seq("_e"))
    val repRows = withRep.filter(col("_id") === col("_rep"))
    val dropped = repRows.as("a")
      .join(repRows.as("b"),
        col("a.cluster") === col("b.cluster") && col("b._id") < col("a._id") &&
          Similarity.cosine(col("a._e"), col("b._e")) >= threshold)
      .select(col("a._id").as("_id")).distinct()
      .withColumn("_dropped", lit(true))
    withRep.join(dropped.withColumnRenamed("_id", "_rep"), Seq("_rep"), "left")
      .select(col("_id").as(id), col("cluster"),
        (col("_id") === col("_rep") && // non-reps always drop
          not(coalesce(col("_dropped"), lit(false)))).as("kept"))
  }

  /** Deterministic coarse quantizer: the k corpus vectors with the
    * smallest md5("ivf|" + id) become the centroids — IVF-flat with a
    * uniform sampled init (the FAISS-style alternative to a Lloyd fit).
    * Unlike [[fitIvf]] this is bit-reproducible across engines (the
    * KMeans fit reduces floats in partition order), so the driver's
    * DuckDB oracle can replay it; recall at equal nProbe is slightly
    * below a fitted quantizer but the search plan is identical.
    * Centroid ids are assigned in ascending vector id (deterministic).
    */
  def sampledIvf(corpus: DataFrame, k: Int, id: String = "vec_id",
      vec: String = "embedding"): IvfIndex = {
    val seeds = corpus
      .select(col(id).cast("long").as("_id"), col(vec).cast("array<double>").as("_e"))
      .orderBy(md5(concat_ws("|", lit("ivf"), col("_id"))), col("_id"))
      .limit(k)
      .collect()
    val cents = seeds.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).zipWithIndex.map { case ((_, e), i) => (i, e) }
    IvfIndex(cents)
  }

  /** Product quantization: the corpus compressed to one byte-sized
    * code per subspace (dim 64 → 8 codes ≈ 32× smaller than float32),
    * scored asymmetrically (full-precision query × encoded corpus, see
    * [[PqAdcScore]]) — at 100 TB this is the memory-bandwidth lever
    * that keeps the candidate scan in page cache while float vectors
    * are fetched only for the re-rank survivors.
    *
    * Encoding = nearest codebook centroid per subspace by L2, done
    * with the SAME native [[CentroidTopK]] argmax-dot expression via
    * the augmentation trick: argmin ‖x−c‖² = argmax(x·c − ‖c‖²/2) =
    * argmax over (x ++ [1]) · (c ++ [−‖c‖²/2]). Bias terms are
    * computed once in Scala and live inside the augmented tables, so
    * encode is one expression per subspace, no per-row norm math.
    */
  final case class PqIndex(codebooks: Array[Array[Array[Double]]]) {
    val nSub: Int = codebooks.length
    val subDim: Int = codebooks.head.head.length

    private val augTables: Array[Array[Array[Double]]] =
      codebooks.map(_.map(c => c :+ (-0.5 * c.map(x => x * x).sum)))

    /** array<int> of nSub codes for one vector. */
    def encodeColumn(vec: Column): Column = {
      val v = vec.cast("array<double>")
      array((0 until nSub).map { j =>
        val sub = concat(slice(v, j * subDim + 1, subDim), array(lit(1.0d)))
        element_at(CentroidTopK(sub, augTables(j), 1), 1)
      }: _*)
    }

    /** Approximate dot(query, corpus) from the corpus vector's codes. */
    def adcScore(queryVec: Column, codes: Column): Column =
      PqAdcScore(queryVec.cast("array<double>"), codes, codebooks)

    /** ADC scan → top-`prefilter` per probe → exact cosine re-rank →
      * top-k. The scan touches ONLY (id, codes) — float vectors join
      * in for prefilter survivors. Probes ride the same stats-gated
      * broadcast as the brute-force path.
      */
    def search(probes: DataFrame, corpus: DataFrame, k: Int, prefilter: Int,
        id: String = "vec_id", vec: String = "embedding"): DataFrame = {
      require(prefilter >= k, s"prefilter $prefilter must be >= k $k")
      val enc = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
          encodeColumn(col(vec)).as("_codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"))
      val scored = Similarity.gatedBroadcast(p)
        .crossJoin(enc.select(col("neighbor_id"), col("_codes")))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("adc_score", adcScore(col("_qv"), col("_codes")))
      val wq = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_score").desc, col("neighbor_id"))
      val pruned = scored.withColumn("_qrn", row_number().over(wq))
        .filter(col("_qrn") <= prefilter)
        .select(col("query_id"), col("_qv"), col("neighbor_id"))
      val reranked = pruned
        .join(enc.select(col("neighbor_id"), col("_cv")), Seq("neighbor_id"))
        .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
      reranked.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
        .select(col("query_id"), col("neighbor_id"), col("sim"))
    }
  }

  /** IVF-PQ (the FAISS IVFPQ composition): the coarse quantizer bounds
    * WHICH codes are scanned, PQ bounds the BYTES per scanned code —
    * together the 100 TB shape where neither a full code scan nor
    * per-query float I/O exists. Corpus rows carry (list_id, codes);
    * probes fan out to their nProbe best lists; ADC scores only within
    * probed lists; float vectors join in for the re-rank survivors.
    * Fully deterministic given sampled quantizers — oracle-replayable.
    */
  def ivfPqSearch(ivf: IvfIndex, pq: PqIndex, probes: DataFrame, corpus: DataFrame,
      k: Int, nProbe: Int, prefilter: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(prefilter >= k, s"prefilter $prefilter must be >= k $k")
    val enc = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
        ivf.assignColumn(col(vec)).as("list_id"),
        pq.encodeColumn(col(vec)).as("_codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"),
      explode(ivf.probeColumn(col(vec), nProbe)).as("list_id"))
    val scored = p.join(enc.select(col("neighbor_id"), col("list_id"), col("_codes")),
        Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_score", pq.adcScore(col("_qv"), col("_codes")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("neighbor_id"))
    val pruned = scored.withColumn("_qrn", row_number().over(wq))
      .filter(col("_qrn") <= prefilter)
      .select(col("query_id"), col("_qv"), col("neighbor_id"))
    val reranked = pruned
      .join(enc.select(col("neighbor_id"), col("_cv")), Seq("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    reranked.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** The list centroid as an array column selected by a 0-based list
    * id — the lookup residual encoding needs. The centroid table rides
    * as a nested literal (k × dim doubles — KBs, like hyperplanes).
    */
  private def centroidAt(ivf: IvfIndex, listId: Column): Column = {
    val table = ivf.centroids.sortBy(_._1).map(_._2.toSeq).toSeq
    element_at(typedlit(table), listId + 1)
  }

  /** Element-wise residual x − c_list(x) under L2 assignment (the
    * assignment that actually makes residuals small — see
    * [[IvfIndex.assignL2Column]]). Pure zip_with subtraction — exact
    * per-element doubles, no accumulation, so the SQL replay is
    * trivially bit-identical.
    */
  def residualColumn(ivf: IvfIndex, vec: Column): Column = {
    val v = vec.cast("array<double>")
    zip_with(v, centroidAt(ivf, ivf.assignL2Column(vec)), (x, c) => x - c)
  }

  /** Residual PQ codebooks: [[sampledPq]] run over the RESIDUAL
    * vectors (salt "pqr" so the sample is independent of the plain-PQ
    * one). Residuals are centered near zero, so the same byte budget
    * quantizes a much tighter cloud — the standard recall lever on top
    * of IVF-PQ.
    */
  def sampledResidualPq(ivf: IvfIndex, corpus: DataFrame, nSub: Int, nCents: Int,
      dim: Int = 64, id: String = "vec_id", vec: String = "embedding"): PqIndex = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val subDim = dim / nSub
    val resid = corpus.select(col(id).cast("long").as("_id"),
      residualColumn(ivf, col(vec)).as("_r"))
    val codebooks = (0 until nSub).map { j =>
      val seeds = resid.select(col("_id"), slice(col("_r"), j * subDim + 1, subDim).as("_c"))
        .orderBy(md5(concat_ws("|", lit("pqr"), lit(j), col("_id"))), col("_id"))
        .limit(nCents)
        .collect()
      seeds.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2).toArray
    }.toArray
    PqIndex(codebooks)
  }

  /** IVF + residual-PQ search: approx dot(q, x) = dot(q, c_list) +
    * ADC(q, codes(x − c_list)) — the first term is exact per (probe,
    * list) and shared by every candidate in the list, the second is
    * the quantized residual correction. Same probe/scan/re-rank shape
    * as [[ivfPqSearch]]; deterministic end-to-end.
    */
  def ivfResidualPqSearch(ivf: IvfIndex, rpq: PqIndex, probes: DataFrame,
      corpus: DataFrame, k: Int, nProbe: Int, prefilter: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(prefilter >= k, s"prefilter $prefilter must be >= k $k")
    val enc = corpus.select(col(id).as("neighbor_id"), col(vec).as("_cv"),
        ivf.assignL2Column(col(vec)).as("list_id"),
        rpq.encodeColumn(residualColumn(ivf, col(vec))).as("_codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = probes.select(col(id).as("query_id"), col(vec).as("_qv"),
        explode(ivf.probeL2Column(col(vec), nProbe)).as("list_id"))
      .withColumn("_qc_dot", VectorExprs.dotProduct(
        col("_qv").cast("array<double>"), centroidAt(ivf, col("list_id"))))
    val scored = p.join(enc.select(col("neighbor_id"), col("list_id"), col("_codes")),
        Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_score", col("_qc_dot") + rpq.adcScore(col("_qv"), col("_codes")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("neighbor_id"))
    val pruned = scored.withColumn("_qrn", row_number().over(wq))
      .filter(col("_qrn") <= prefilter)
      .select(col("query_id"), col("_qv"), col("neighbor_id"))
    val reranked = pruned
      .join(enc.select(col("neighbor_id"), col("_cv")), Seq("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    reranked.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic PQ codebooks, same construction as [[sampledIvf]]:
    * per subspace j, the nCents corpus SUBvectors with smallest
    * md5("pq|j|" + id) (code ids in ascending vector id). Each
    * subspace salts its own sample — independent codebooks without a
    * Lloyd fit, bit-reproducible by the SQL oracle. A k-means-fitted
    * variant would drop in exactly like fitIvf vs sampledIvf.
    */
  def sampledPq(corpus: DataFrame, nSub: Int, nCents: Int, dim: Int = 64,
      id: String = "vec_id", vec: String = "embedding"): PqIndex = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val subDim = dim / nSub
    // all nSub codebooks in ONE job: explode the subspace index, rank
    // per subspace by the salted hash inside a window, collect the
    // nSub x nCents winners together — selection order (md5 then id,
    // per j) is identical to the per-subspace orderBy/limit this
    // replaces, so the codebooks (and every oracle) are unchanged;
    // what changes is paying one scan instead of nSub scans per fit
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_j"))
      .orderBy(md5(concat_ws("|", lit("pq"), col("_j"), col("_id"))), col("_id"))
    val seeds = corpus
      .select(col(id).cast("long").as("_id"), col(vec).cast("array<double>").as("_e"))
      .select(col("_id"), col("_e"), explode(array((0 until nSub).map(lit): _*)).as("_j"))
      .select(col("_id"), col("_j"),
        slice(col("_e"), col("_j") * subDim + 1, lit(subDim)).as("_c"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nCents)
      .collect()
    val codebooks = Array.tabulate(nSub) { j =>
      seeds.filter(_.getAs[Int]("_j") == j)
        .map(r => (r.getAs[Long]("_id"), r.getSeq[Double](2).toArray))
        .sortBy(_._1).map(_._2)
    }
    codebooks.foreach(cb => require(cb.length == nCents,
      s"corpus smaller than nCents=$nCents codebook sample"))
    PqIndex(codebooks)
  }

  /** Fit PQ codebooks with spark.ml KMeans, one fit per subspace
    * (distributed; the driver-side artifact is nSub × nCents subDim
    * vectors ≈ KBs). Better quantization error than [[sampledPq]] but
    * not bit-reproducible cross-engine (KMeans reduces floats in
    * partition order) — same trade as fitIvf vs sampledIvf, so the
    * driver gate rides the sampled variant and this keeps its recall
    * floor in AnnSpec.
    */
  def fitPq(corpus: DataFrame, nSub: Int, nCents: Int, dim: Int = 64,
      vec: String = "embedding", seed: Long = 42L, maxIter: Int = 5): PqIndex = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val subDim = dim / nSub
    val codebooks = (0 until nSub).map { j =>
      val features = corpus.select(array_to_vector(
        slice(col(vec).cast("array<double>"), j * subDim + 1, subDim)).as("features"))
      val model = new KMeans().setK(nCents).setSeed(seed + j).setMaxIter(maxIter)
        .fit(features)
      model.clusterCenters.map((v: Vector) => v.toArray)
    }.toArray
    PqIndex(codebooks)
  }

  /** Fit the coarse quantizer with spark.ml KMeans (distributed; the
    * only driver-side artifact is k centroid vectors).
    */
  def fitIvf(corpus: DataFrame, k: Int, vec: String = "embedding", seed: Long = 42L,
      maxIter: Int = 5): IvfIndex = {
    val features = corpus.select(
      array_to_vector(col(vec).cast("array<double>")).as("features"))
    // coarse quantization only partitions the search space — a few
    // Lloyd iterations suffice; recall is governed by nProbe
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(features)
    IvfIndex(model.clusterCenters.zipWithIndex.map { case (v: Vector, i) => (i, v.toArray) })
  }
}
