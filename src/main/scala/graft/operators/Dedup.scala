package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compaction-style deduplication (SURVEY.md §2.4/§2.6).
  *
  * The reference implements dedup as a full MR shuffle: AvroKeyMapper
  * emits (key, record), AvroKeyDedupReducer keeps one record per key —
  * either the first seen, or the one with the lexicographically-largest
  * "delta" fields (gobblin-compaction/.../avro/AvroKeyDedupReducer.java,
  * RecordKeyDedupReducerBase.java:74-85).
  *
  * Spark-first: one hash-aggregate with map-side partial aggregation —
  * `max_by(struct(allCols), struct(deltaCols))` — no sort, no reducer.
  * Struct ordering in Spark is lexicographic field-by-field, exactly
  * matching AvroValueDeltaSchemaComparator's field-list comparison.
  */
object Dedup {

  /** Exact dedup on a key projection (reducer keeps key only). */
  def exactKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()

  /** Keep one whole record per key, arbitrary survivor (reference
    * "keep first" mode). Nondeterministic across runs by design — use
    * [[keepMaxBy]] when a deterministic survivor matters.
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** "Largest delta wins": per key keep the record whose delta columns
    * compare greatest (ties impossible iff delta is unique per key —
    * callers should include a unique tiebreaker as the last delta col).
    *
    * Single shuffle on the key; AQE handles skewed keys. For 100 TB:
    * this is a hash aggregation, partial on the map side, so the shuffle
    * carries one record per (key, map partition), not the full input.
    */
  def keepMaxBy(df: DataFrame, keys: Seq[String], delta: Seq[String]): DataFrame = {
    val all = struct(df.columns.map(col).toSeq: _*)
    val ord = struct(delta.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(all, ord).as("_survivor"))
      .select(col("_survivor.*"))
  }

  /** Near-dup cluster assignment from a pair list (id_a, id_b) —
    * connected components by iterative min-label propagation, all in
    * DataFrame ops (no driver-side union-find, no GraphX dependency).
    * Converges in O(log(diameter)) rounds; near-dup clusters are
    * shallow so maxIter=5 covers practical data. Returns (id, rep)
    * for every id that appears in a pair; rep = min id of the cluster.
    */
  def clusterPairs(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 5, earlyStop: Boolean = true): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true) // reused every iteration
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("rep", col("id"))
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // each node adopts min(own rep, neighbors' reps)…
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("rep", "nrep"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nrep")).as("mrep"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("mrep"), col("rep"))).as("rep"))
      // …then pointer-jumps to its rep's rep (path compression) —
      // together the reached distance doubles per round (log diameter)
      val jumped = stepped
        .join(stepped.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
        .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"))
      // localCheckpoint truncates lineage — without it the iterated
      // join nests plans exponentially and analysis OOMs
      val next = jumped.localCheckpoint(true)
      if (earlyStop) {
        // convergence probe costs one extra job per round — skip it
        // (earlyStop=false) when a fixed round count is known to cover
        // the cluster diameter (2^maxIter hops)
        val changed = next.join(labels.withColumnRenamed("rep", "old"), Seq("id"))
          .filter(col("rep") =!= col("old")).limit(1).count()
        converged = changed == 0
      }
      labels = next
      i += 1
    }
    labels
  }

  /** LLM-pipeline near-dup resolution: within each cluster keep the
    * record with the best (max) score; records in no cluster survive
    * as-is. `pairs` comes from MinHash/SimHash/Jaccard candidates.
    */
  def resolveNearDups(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: String, tieBreak: String): DataFrame = {
    // fixed 4 rounds (2^4 = 16-hop diameter, far beyond near-dup
    // clusters) without per-round convergence probes
    val clusters = clusterPairs(pairs, maxIter = 4, earlyStop = false)
    val tagged = docs.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("_cluster", coalesce(col("rep"), col(idCol)))
    keepMaxBy(tagged, Seq("_cluster"), Seq(scoreCol, tieBreak))
      .drop("_cluster", "rep")
  }
}
