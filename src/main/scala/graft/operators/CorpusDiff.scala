package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-version diff — the report a training-data pipeline needs
  * between two corpus drops: per stratum, how many documents were
  * added, removed, changed (same id, different content fingerprint),
  * or carried unchanged. The reference's snapshot-diff source answers
  * this at FILE granularity (ref gobblin-core/.../filebased/
  * FileBasedSource.java:79-146 — previous-run snapshot compared to the
  * current listing); a corpus iterates at DOCUMENT granularity, keyed
  * by a content fingerprint so rewrites are visible even when ids
  * persist.
  *
  * Scale: one full-outer hash join on the id (the minimum to align
  * versions) + one map-side-combined aggregation over strata.
  * Fingerprints travel as 64-bit longs, never full texts.
  */
object CorpusDiff {

  /** Per-stratum diff of two corpus versions. Strata are taken from
    * the NEW version for added/changed/unchanged rows and from the old
    * for removed rows (a document's stratum may itself change; the row
    * is counted under where it lives now).
    */
  def diff(oldV: DataFrame, newV: DataFrame, idCol: String,
      fingerprint: Column, stratum: Column): DataFrame = {
    // presence travels as an explicit marker, NOT as fingerprint
    // nullness — a null fingerprint (null text) is a legitimate value
    // and must not masquerade as absence
    val o = oldV.select(col(idCol).as("_id"), fingerprint.as("_ofp"),
      stratum.as("_ostr"), lit(true).as("_oex"))
    val n = newV.select(col(idCol).as("_id"), fingerprint.as("_nfp"),
      stratum.as("_nstr"), lit(true).as("_nex"))
    o.join(n, Seq("_id"), "full_outer")
      .select(
        coalesce(col("_nstr"), col("_ostr")).as("stratum"),
        when(col("_oex").isNull, "added")
          .when(col("_nex").isNull, "removed")
          .when(!(col("_ofp") <=> col("_nfp")), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("stratum"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
