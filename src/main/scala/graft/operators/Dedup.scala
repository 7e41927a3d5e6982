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
}
