package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys. AQE's skew-join split covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * skewed *aggregations* and for joins AQE can't split (e.g. after a
  * custom partitioner). Pattern: two-phase aggregate over a salted key.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable columns —
    * NOT rand(): retried tasks must re-produce identical salts or
    * exactly-once sinks break.
    */
  def salt(buckets: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over `buckets` reducers — then
    * final aggregate on key. Caller supplies mergeable partial aggs
    * (sum/count/min/max) and how to finalize them.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltFrom: Seq[String], buckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", salt(buckets, saltFrom.map(col): _*))
    val partial = salted.groupBy((keyCols.map(col) :+ col("_salt")): _*).agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keyCols.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-free join for a skewed big side against a small-
    * but-not-broadcastable side: big rows get salt s; small rows are
    * exploded to all salts, so (key, salt) joins co-locate without one
    * reducer owning the hot key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int,
      saltFrom: Seq[String]): DataFrame = {
    val b = big.withColumn("_salt", salt(buckets, saltFrom.map(col): _*))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
