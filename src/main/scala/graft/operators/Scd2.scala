package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance from a changelog —
  * the batch face of the reference's delta-stream ingestion: a JDBC /
  * Kafka change stream landed incrementally (ref gobblin-core/.../
  * extract/QueryBasedSource.java:394 — each run resumes from the
  * previous run's low watermark) and resolved latest-per-key by the
  * compaction reducer (ref gobblin-compaction/.../mapreduce/avro/
  * AvroKeyDedupReducer.java:39 with delta-field comparators from
  * FieldAttributeBasedDeltaFieldsProvider.java). SCD2 keeps what that
  * reducer discards — the version history as validity intervals.
  *
  * Model: a changelog row is (key, seq, op, attrs...) where `seq` is a
  * monotonically increasing version stamp (offset, scn, event id) and
  * `op` is "U" (upsert) or "D" (delete). The SCD2 dimension holds one
  * row per version interval: attrs valid over [valid_from, valid_to),
  * `valid_to` null for the open (current) interval. A delete closes
  * the latest interval without emitting a row, so a key whose last op
  * was D has only closed intervals.
  *
  * Scale: [[fromChangelog]] is ONE hash shuffle on the key + a
  * per-key sort (window `lead`) — the minimum possible for interval
  * construction. [[merge]] recomputes ONLY keys present in the delta:
  * the untouched dimension slice passes through via an anti-join
  * against the (small) distinct delta-key set — broadcast-able, no
  * per-key sort — so incremental cost is O(|delta| + |touched
  * history|), not O(|dim|): the property that makes daily CDC merges
  * over a 100 TB dimension viable.
  */
object Scd2 {

  /** Build the full SCD2 dimension from a complete changelog.
    * Output: key, attrs..., valid_from, valid_to, is_current.
    */
  def fromChangelog(changelog: DataFrame, key: String, seq: String,
      op: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seq))
    changelog
      .withColumn("valid_to", lead(col(seq), 1).over(w))
      .filter(col(op) =!= "D")
      .select(
        Seq(col(key)) ++ attrs.map(col) ++ Seq(
          col(seq).as("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.as("is_current")): _*)
  }

  /** Reconstruct the changelog a dimension slice encodes: one U per
    * interval at its valid_from; and wherever an interval's valid_to
    * is NOT the next interval's valid_from (or there is no next
    * interval), the only possible closer at that seq is a delete — an
    * upsert would itself have opened the next interval there. Exact
    * inverse of [[fromChangelog]] for the attrs it carries (modulo
    * deletes with no open interval to close, which are no-ops in both
    * directions).
    */
  private def toChangelog(dim: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    val upserts = dim.select(
      Seq(col(key), col("valid_from").as("_seq"), lit("U").as("_op")) ++
        attrs.map(col): _*)
    val deletes = dim
      .withColumn("_next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull &&
        (col("_next_from").isNull || col("_next_from") =!= col("valid_to")))
      .select(
        Seq(col(key), col("valid_to").as("_seq"), lit("D").as("_op")) ++
          attrs.map(c => lit(null).cast(dim.schema(c).dataType).as(c)): _*)
    upserts.unionByName(deletes)
  }

  /** Merge a delta changelog into an existing SCD2 dimension.
    * Requires every delta seq to be newer than any dim seq for the
    * same key OR an exact re-delivery of an already-applied event (the
    * CDC contract: the log only moves forward, but a replayed
    * micro-batch re-delivers). Idempotent under replay: the
    * reconstructed history and the delta are deduplicated on
    * (key, seq) — one seq is one log event — so re-merging an
    * already-applied delta converges instead of minting zero-width
    * intervals.
    */
  def merge(dim: DataFrame, delta: DataFrame, key: String, seq: String,
      op: String, attrs: Seq[String]): DataFrame = {
    val touched = delta.select(col(key)).distinct()
    val untouched = dim.join(touched, Seq(key), "left_anti")
    val touchedDim = dim.join(touched, Seq(key), "left_semi")
    // replayed events are byte-identical re-deliveries of the same
    // (key, seq); reconstructed D rows carry null attrs but D attrs
    // never reach the output, so an arbitrary survivor is safe.
    // Dedup via a lag under the SAME (key, _seq)-ordered window
    // fromChangelog sorts by — dropDuplicates(key, _seq) forced an
    // extra hash exchange on (key, _seq) between two key-partitioned
    // windows; this shape does one exchange for dedup + rebuild.
    val w = Window.partitionBy(col(key)).orderBy(col("_seq"))
    val replay = toChangelog(touchedDim, key, attrs)
      .unionByName(delta.select(
        Seq(col(key), col(seq).as("_seq"), col(op).as("_op")) ++
          attrs.map(col): _*))
      .withColumn("_prev_seq", lag(col("_seq"), 1).over(w))
      .filter(col("_prev_seq").isNull || col("_prev_seq") =!= col("_seq"))
      .drop("_prev_seq")
    val rebuilt = fromChangelog(replay, key, "_seq", "_op", attrs)
    untouched.unionByName(rebuilt)
  }
}
