package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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

  /** Incremental exact dedup against a fingerprint LEDGER — the
    * ongoing-ingest face of exact dedup: a new batch dedups against
    * everything previously kept WITHOUT rescanning the corpus (the
    * ledger is one narrow fingerprint column, not the data). Within
    * the batch the min-id row survives (deterministic, replayable);
    * rows whose fingerprint is already in the ledger drop entirely.
    * Returns (kept rows, ledger additions) — callers append the
    * additions to the ledger for the next batch (partitioned parquet
    * of a single hash column: cheap to store, broadcast-able when
    * small, shuffle-joinable when not).
    *
    * Shape: one anti-join on the fingerprint + one keepMaxBy within
    * the batch. Both keyed on the fingerprint — at 100 TB the ledger
    * join is the same hash-partitioned equi-join as exact dedup
    * itself, and AQE picks broadcast when the ledger is small.
    */
  def incrementalExact(batch: DataFrame, ledger: DataFrame, fpCol: String,
      idCol: String): (DataFrame, DataFrame) = {
    val fresh = batch.join(ledger.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
    val kept = keepMaxBy(fresh.withColumn("_negid", -col(idCol)),
      keys = Seq(fpCol), delta = Seq("_negid")).drop("_negid")
    (kept, kept.select(col(fpCol)).distinct())
  }

  /** LINEAR pair construction for exact-dup groups: connected
    * components only need a CONNECTED graph per group, not a complete
    * one — the self-join shape emits m(m-1)/2 pairs for a key
    * duplicated m times (a doc duplicated 10^6 times = 5*10^11 pairs),
    * where a star rooted at the group minimum emits m-1 edges AND has
    * diameter 2, so [[clusterPairs]] converges in one round (a lag
    * CHAIN would also be linear but its diameter is m — O(log m)
    * propagation rounds). One window shuffle on the group key.
    */
  def starPairs(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("id_a", min(col(idCol)).over(w))
      .filter(col(idCol) =!= col("id_a"))
      .select(col("id_a"), col(idCol).as("id_b"))
  }

  /** Near-dup cluster assignment from a pair list (id_a, id_b) —
    * connected components by iterative min-label propagation, all in
    * DataFrame ops (no driver-side union-find, no GraphX dependency).
    * Converges in O(log(diameter)) rounds; near-dup clusters are
    * shallow so maxIter=5 covers practical data. Returns (id, rep)
    * for every id that appears in a pair; rep = min id of the cluster.
    */
  /** Edge counts at or below this take the driver union-find fast
    * path: near-dup graphs are usually METADATA-scale (pairs above a
    * high similarity threshold), and the iterative path pays ~10 Spark
    * jobs of fixed overhead regardless of size. The gate is a bounded
    * count (`limit(n+1)` — never scans a huge edge list), mirroring
    * the broadcast gate in Similarity; big graphs take the distributed
    * label-propagation path unchanged.
    */
  private[graft] val LocalSolveMaxEdges = 100000L

  def clusterPairs(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 5, earlyStop: Boolean = true,
      localSolveThreshold: Long = LocalSolveMaxEdges): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      // reused every iteration; static input, so a LAZY persist (not an
      // eager checkpoint job) suffices — lineage stays recoverable
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    if (localSolveThreshold > 0 &&
        edges.limit((localSolveThreshold + 1).toInt).count() <= localSolveThreshold)
      return localClusters(edges)
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
      val stepped = labels.select(col("id"), col("rep").as("_old"))
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("_old"),
          least(col("_old"), coalesce(col("mrep"), col("_old"))).as("rep"))
      // …then pointer-jumps to its rep's rep (path compression) —
      // together the reached distance doubles per round (log diameter)
      val jumped = stepped
        .join(stepped.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
        .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"), col("_old"))
      // localCheckpoint truncates lineage — without it the iterated
      // join nests plans exponentially and analysis OOMs. The changed
      // flag rides INSIDE the checkpointed row, so the convergence
      // probe is a scan of already-materialized partitions — no join
      // against the previous labels, no second pass over the plan.
      val next = jumped
        .withColumn("_chg", col("rep") =!= col("_old"))
        .select(col("id"), col("rep"), col("_chg"))
        .localCheckpoint(true)
      if (earlyStop) {
        converged = next.filter(col("_chg")).limit(1).isEmpty
      }
      labels = next.select(col("id"), col("rep"))
      i += 1
    }
    labels
  }

  /** Driver union-find over a bounded edge list (exact same contract
    * as the iterative path: rep = MIN id of the component, compared
    * via natural ordering). Path-halving find + min-rooted union.
    */
  private def localClusters(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val rows = edges.collect()
    val parent = new java.util.HashMap[Any, Any]()
    @annotation.tailrec
    def find(x: Any): Any = {
      val p = parent.get(x)
      if (p == x) x
      else { parent.put(x, parent.get(p)); find(parent.get(x)) }
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    rows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    import scala.jdk.CollectionConverters._
    val labels = parent.keySet.asScala.toSeq.map(id => Row(id, find(id)))
    val idType = edges.schema.head.dataType
    spark.createDataFrame(spark.sparkContext.parallelize(labels, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("rep", idType))))
  }

  /** CCNet-style line-level dedup: drop every line whose corpus-wide
    * occurrence count exceeds `maxOccurrences` (boilerplate headers,
    * nav bars, license blocks), then reassemble each document from its
    * surviving lines in original order. The standard pre-tokenizer
    * cleanup that document-level dedup cannot express — no two docs
    * match, but the same cookie banner is in half the corpus.
    *
    * Shape: posexplode lines → count-ONLY line-frequency aggregation
    * (a boilerplate line is one counter, never a list) → keyed join
    * back (hot-line skew is ordinary join-key skew — AQE splits it) →
    * per-document reassembly. The reassembly `collect_list` is
    * per-document, bounded by the document's own line count — the same
    * bounded-by-construction argument as sequence materialization.
    * Documents whose every line was boilerplate survive with empty
    * text (output cardinality == input cardinality).
    */
  def dropDuplicateLines(docs: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Int): DataFrame = {
    require(maxOccurrences >= 1, "maxOccurrences must be >= 1")
    val lines = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freq = lines.groupBy(col("line")).agg(count(lit(1)).as("_lf"))
    val kept = lines.join(freq, Seq("line"))
      .filter(col("_lf") <= maxOccurrences)
    val rebuilt = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("cleaned_text"))
    docs.select(col(idCol).as("id"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("id"), "left_outer")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** LLM-pipeline near-dup resolution: within each cluster keep the
    * record with the best (max) score; records in no cluster survive
    * as-is. `pairs` comes from MinHash/SimHash/Jaccard candidates.
    */
  def resolveNearDups(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: String, tieBreak: String): DataFrame = {
    // early-stop as soon as a round changes nothing (the probe rides
    // the checkpoint, so it's ~free); 4 rounds = 16-hop diameter cap
    val clusters = clusterPairs(pairs, maxIter = 4, earlyStop = true)
    val tagged = docs.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("_cluster", coalesce(col("rep"), col(idCol)))
    keepMaxBy(tagged, Seq("_cluster"), Seq(scoreCol, tieBreak))
      .drop("_cluster", "rep")
  }
}
