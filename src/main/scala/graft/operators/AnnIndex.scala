package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Ann, Similarity}
import graft.functions.Ann.IvfIndex

/** Persisted IVF vector index with incremental maintenance — the
  * vector-search analog of [[Bm25.index]]/[[Bm25.mergeIndex]]. The
  * persistable artifact is two-part:
  *
  *   - the ASSIGNMENTS table, one row per vector `(vec_id, list_id,
  *     embedding)` — document-granular like BM25's postings, so a
  *     changed vector REPLACES its row (anti-join + union) and
  *     untouched vectors never re-assign;
  *   - the CODEBOOK (k centroid vectors), frozen at first build and
  *     carried beside the snapshot as a text sidecar
  *     ([[encodeCentroids]]). Freezing is the standard IVF
  *     maintenance contract: assignments stay comparable across
  *     epochs, so incremental merge == full rebuild EXACTLY (both
  *     assign with the same quantizer); re-fitting the codebook is a
  *     new index build, not maintenance.
  *
  * 100 TB shape: assignment is the O(N·k·dim) pass — exactly what
  * incrementality amortizes; merge is one hash anti-join + union on
  * vec_id; search joins k-bounded probe lists against the stored
  * postings (same plan as [[Ann.IvfIndex.search]], minus the corpus
  * re-assignment). The codebook is k·dim doubles — driver/sidecar
  * sized by construction.
  */
object AnnIndex {

  /** The persistable assignments: `(vec_id, list_id, embedding)`.
    * Embeddings are stored widened to double (exact for float input)
    * so search from the stored table is bit-identical to search over
    * the source vectors.
    */
  def assign(idx: IvfIndex, corpus: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): DataFrame =
    corpus.select(col(id).as("vec_id"),
      idx.assignColumn(col(vec)).as("list_id"),
      col(vec).cast("array<double>").as("embedding"))

  /** Delta-wins merge: `updated` vectors re-assign (with the FROZEN
    * codebook) and replace their rows; everything else is untouched.
    */
  def merge(idx: IvfIndex, existing: DataFrame, updated: DataFrame,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val delta = assign(idx, updated, id, vec)
    val touched = updated.select(col(id).as("vec_id")).distinct()
    existing.join(touched, Seq("vec_id"), "left_anti").unionByName(delta)
  }

  /** Top-k cosine search over a prebuilt assignments table — the same
    * candidate plan as [[Ann.IvfIndex.search]] (probe-list equi-join,
    * exact cosine re-rank, ties to the smaller neighbor id) without
    * re-assigning the corpus. Queries sharing an id with a stored
    * vector skip that vector (self-exclusion; same contract as
    * `IvfIndex.search`, whose probes are corpus-drawn).
    */
  def search(idx: IvfIndex, assignments: DataFrame, probes: DataFrame,
      k: Int, nProbe: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val c = assignments.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_cv"), col("list_id"))
    val p = probes.select(col(id).as("query_id"),
      col(vec).cast("array<double>").as("_qv"),
      explode(idx.probeColumn(col(vec), nProbe)).as("list_id"))
    val cands = p.join(c, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  // ------------------------------------------------- sharded persistence

  /** Partition-granular incremental merge against a
    * [[graft.sink.ShardedTable]] partitioned by `list_id`: the
    * replacement rows for ONLY the IVF lists the delta touches (an
    * updated vector touches its OLD list — retract — and its NEW list
    * — insert), plus the touched-list values for the commit. List
    * storage is the search-optimal layout (probe-list reads open
    * nProbe partitions, not the corpus — [[searchTable]]); locating a
    * changed vector's old list costs one column-pruned (vec_id,
    * list_id) scan, ~1% of index bytes next to the embedding payload
    * the rewrite used to pay. Touched lists are a driver collect
    * bounded by the codebook size. `hasCurrent = false` = full build.
    */
  def shardedMerge(idx: IvfIndex, table: graft.sink.ShardedTable,
      hasCurrent: Boolean, latestVecs: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): (DataFrame, Seq[String]) = {
    val spark = latestVecs.sparkSession
    val delta = assign(idx, latestVecs, id, vec)
    val newLists = delta.select(col("list_id"))
    if (!hasCurrent)
      (delta, newLists.distinct().collect().map(_.get(0).toString).toSeq.sorted)
    else {
      val deltaIds = latestVecs.select(col(id).as("vec_id")).distinct()
      val oldLists = table.readCurrent(spark).select(col("vec_id"), col("list_id"))
        .join(deltaIds, Seq("vec_id"), "left_semi").select(col("list_id"))
      val touched = newLists.unionByName(oldLists).distinct()
        .collect().map(_.get(0).toString).toSeq.sorted
      val kept = table.readPartitions(spark, touched)
        .join(deltaIds, Seq("vec_id"), "left_anti")
      (kept.unionByName(delta), touched)
    }
  }

  /** [[search]] with manifest-pruned candidate reads: only the
    * partitions of the lists the probes actually hit are opened —
    * nProbe · |distinct probed lists| directories, never the corpus.
    * The probed-list collect is bounded by the codebook size.
    */
  def searchTable(idx: IvfIndex, table: graft.sink.ShardedTable,
      probes: DataFrame, k: Int, nProbe: Int, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val spark = probes.sparkSession
    val probed = probes
      .select(explode(idx.probeColumn(col(vec), nProbe)).as("list_id"))
      .distinct().collect().map(_.get(0).toString).toSeq.sorted
    search(idx, table.readPartitions(spark, probed), probes, k, nProbe, id, vec)
  }

  // --- codebook sidecar codec ----------------------------------------
  // "cid:v1,v2,...;cid:v1,..." with Double.toString components —
  // shortest-round-trip decimal, so decode(encode(x)) is bit-exact.

  def encodeCentroids(idx: IvfIndex): String =
    idx.centroids.sortBy(_._1)
      .map { case (cid, e) => s"$cid:${e.mkString(",")}" }
      .mkString(";")

  def decodeCentroids(s: String): IvfIndex =
    IvfIndex(s.split(";").map { entry =>
      val Array(cid, vals) = entry.split(":", 2)
      (cid.toInt, vals.split(",").map(_.toDouble))
    })

  /** Convenience: load the codebook sidecar planted by the `annindex`
    * job type next to a published snapshot.
    */
  def loadCodebook(outDir: String,
      conf: org.apache.hadoop.conf.Configuration): IvfIndex =
    decodeCentroids(new graft.state.FsStateStore(outDir, conf)
      .get("_centroids", "annindex").flatMap(_.get("table"))
      .getOrElse(throw new IllegalStateException(
        s"no ANN codebook sidecar under $outDir — not an annindex snapshot?")))
}
