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
}
