package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Guaranteed heavy hitters over arbitrary-cardinality keys — the
  * hot-key detector a 100 TB pipeline needs before it can salt a
  * skewed join or mine boilerplate n-grams, where a plain
  * `groupBy(key).count` would shuffle EVERY distinct key (at corpus
  * scale: billions of n-grams, almost all of them singletons).
  *
  * Two passes:
  *
  *   1. CANDIDATES: a Misra-Gries summary of `k` counters per
  *      partition (bounded memory however large the partition),
  *      merged with the standard mergeable-summaries rule (sum
  *      counters; while more than k survive, subtract the (k+1)-th
  *      largest and drop non-positive — Agarwal et al. 2012,
  *      "Mergeable Summaries"). The merged summary over-counts
  *      nothing and under-counts by at most n/(k+1), so every key
  *      with true count > n/(k+1) is GUARANTEED present — in
  *      particular every key above the n/k report threshold.
  *      Driver state: at most k entries, whatever n is.
  *   2. CONFIRM: exact counts of the (<= k) candidate keys only —
  *      the filter broadcasts the candidate set, so the confirming
  *      aggregation shuffles candidate rows instead of the whole
  *      key space.
  *
  * The final output is EXACT and deterministic (keys with
  * count * k > n, true counts), independent of partitioning and merge
  * order — the sketch only decides how little work finding them takes.
  * mapPartitions is deliberate here: Misra-Gries is genuinely
  * per-partition imperative state with data-dependent evictions, the
  * case the operator preference ladder reserves it for.
  */
object HeavyHitters {

  /** Merge-add one count into a Misra-Gries summary of capacity k. */
  private def mgAdd(m: mutable.Map[String, Long], key: String, c: Long,
      k: Int): Unit = {
    m.get(key) match {
      case Some(old) => m(key) = old + c
      case None =>
        m(key) = c
        if (m.size > k) {
          // subtract the (k+1)-th largest surviving count; drop <= 0
          val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
          val dead = m.iterator.flatMap { case (kk, v) =>
            if (v - cut <= 0) Some(kk) else None
          }.toList
          dead.foreach(m.remove)
          m.mapValuesInPlace((_, v) => v - cut)
        }
    }
  }

  private def mgMerge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long], k: Int): mutable.Map[String, Long] = {
    b.foreach { case (key, c) => mgAdd(a, key, c, k) }
    a
  }

  /** (candidate keys, total row count) — pass 1. Bounded: <= k keys. */
  private[operators] def candidates(df: DataFrame, key: Column,
      k: Int): (Seq[String], Long) = {
    val keyed = df.select(key.cast("string").as("k")).where(col("k").isNotNull)
    val (summary, n) = keyed.queryExecution.toRdd
      .mapPartitions { rows =>
        val m = mutable.Map.empty[String, Long]
        var cnt = 0L
        rows.foreach { r =>
          mgAdd(m, r.getUTF8String(0).toString, 1L, k)
          cnt += 1
        }
        Iterator.single((m, cnt))
      }
      // treeAggregate (not treeReduce): total-safe on empty inputs
      .treeAggregate((mutable.Map.empty[String, Long], 0L))(
        { case ((ma, na), (mb, nb)) => (mgMerge(ma, mb, k), na + nb) },
        { case ((ma, na), (mb, nb)) => (mgMerge(ma, mb, k), na + nb) })
    (summary.keys.toSeq.sorted, n)
  }

  private def emptyResult(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("key", "cnt")
  }

  /** Exact heavy hitters: every key whose count strictly exceeds
    * n / k (as count * k > n — integer-exact), with its true count.
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (cands, n) = candidates(df, key, k)
    if (cands.isEmpty) return emptyResult(df)
    df.select(key.cast("string").as("key"))
      .where(col("key").isInCollection(cands))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }
}
