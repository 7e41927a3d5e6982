package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test splitting for training-data
  * pipelines. Assignment hashes the record id (with a seed) and
  * compares the hex digest against precomputed threshold strings, so:
  *
  *  - the same record lands in the same split on every run, on every
  *    engine (md5 hex compares identically in Spark, DuckDB, Python) —
  *    no rand(), no partition-dependence;
  *  - fractions resolve to 4 hex digits (1/65536 granularity);
  *  - adding data never moves existing records between splits (the
  *    property that keeps eval sets honest across dataset versions).
  */
object Splits {

  /** fractions: ordered (name, fraction); must sum to <= 1.0, the
    * remainder (if any) goes to the last split.
    */
  def assign(idCol: Column, fractions: Seq[(String, Double)], seed: String = "graft"): Column = {
    require(fractions.nonEmpty, "need at least one split")
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val h = md5(concat_ws("|", lit(seed), idCol))
    // cumulative thresholds as 4-hex-digit prefixes
    val cuts = fractions.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => f"${math.round(c * 65536).min(65535)}%04x")
    val named = fractions.map(_._1)
    val prefix = substring(h, 1, 4)
    cuts.zip(named.init).foldRight(lit(named.last): Column) {
      case ((cut, name), acc) => when(prefix < cut, lit(name)).otherwise(acc)
    }
  }

  def split(df: DataFrame, idCol: String, fractions: Seq[(String, Double)],
      seed: String = "graft", as: String = "split"): DataFrame =
    df.withColumn(as, assign(col(idCol), fractions, seed))

  /** 4-hex-digit cut strings carving [0, 65536) into `shards` equal
    * ranges — shared by the Spark expression and the SQL oracle replay.
    */
  def shardCuts(shards: Int): Seq[String] = {
    require(shards > 1, "need at least 2 shards")
    (1 until shards).map(i => f"${(i.toLong * 65536 / shards).toInt}%04x")
  }

  /** Deterministic shard id in [0, shards): the count of cut strings
    * at or below the record's 4-hex-digit md5 prefix. Same
    * hex-string-compare trick as [[assign]] — no hex→int conversion,
    * so any engine with md5 + string compare replays it exactly.
    */
  def shardOf(idCol: Column, shards: Int, seed: String = "graft"): Column = {
    val prefix = substring(md5(concat_ws("|", lit(seed), idCol)), 1, 4)
    shardCuts(shards).foldLeft(lit(0)) { (acc, cut) =>
      acc + when(prefix >= lit(cut), 1).otherwise(0)
    }
  }

  /** Sharded deterministic shuffle for training-data export: assign
    * each record a shard and a stable pseudo-random position within
    * it. Hash-ordering inside hash-assigned shards is the standard way
    * to break source locality (a model must not see a source's docs
    * back-to-back) while staying reproducible run-over-run and
    * engine-portable (no rand(), no partition-order dependence).
    *
    * Scale shape: one shuffle (the per-shard window sort). Shard count
    * = output file count — size it to the target shard bytes, not the
    * cluster's core count.
    */
  def shardAndShuffle(df: DataFrame, idCol: String, shards: Int,
      seed: String = "graft"): DataFrame = {
    val h = md5(concat_ws("|", lit(seed), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", shardOf(col(idCol), shards, seed))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
