package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv64

/** Training-shard export with a verifiable manifest — the dataset-drop
  * publisher a training pipeline runs last: deterministic shard
  * assignment, one directory per shard, and a manifest recording per
  * shard the row count, payload size, and an order-independent
  * content checksum (XOR of per-record FNV-1a 64 fingerprints — XOR
  * because shard files are written by parallel tasks in nondeterministic
  * row order, and the checksum must not care). [[verify]] recomputes
  * the manifest from the PUBLISHED files, so a reader can prove a drop
  * complete and uncorrupted without trusting the writer.
  *
  * Reference analog: the writer/publisher contract records counts and
  * bytes per task before atomic publish (ref gobblin-core/.../writer/
  * FsDataWriter.java:87,221 — bytesWritten/recordsWritten feeding
  * commit decisions) and copies carry origin checksums (ref
  * gobblin-data-management/.../copy/CopyableFile.java:94); this lifts
  * both to dataset-drop granularity.
  *
  * Scale: assignment is a projection; the manifest is one map-side-
  * combined aggregation over |shards| groups; verify re-reads the
  * partitioned tree with partition pruning intact. Nothing is
  * collected to the driver but the |shards|-row manifest.
  */
object ShardExport {

  private def manifestOf(df: DataFrame, text: Column): DataFrame =
    df.select(col("shard").cast("long").as("shard"),
        length(text).as("_len"), Fnv64(text).as("_fp"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_len").cast("long")).as("sum_chars"),
        expr("bit_xor(_fp)").as("checksum"))

  /** Write `df` as `nShards` deterministic shards under `outDir/data`
    * (one partition directory per shard) plus `outDir/manifest`. The
    * manifest is computed by reading the PUBLISHED files back — never
    * from a second evaluation of `df` (which could diverge if `df` is
    * nondeterministic or its source moves between jobs): the manifest
    * must describe the bytes on disk, nothing else.
    */
  def exportShards(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): Unit = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/data")
    manifestOf(df.sparkSession.read.parquet(s"$outDir/data"), col(textCol))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** Recompute the manifest from the published tree and diff it against
    * the stored one. Output: one row per shard with the stored figures
    * and `verified` (all three recomputed values match). Null-safe on
    * purpose: a shard present on only ONE side (a deleted shard
    * directory, an injected one, a manifest row lost) is `verified =
    * false`, never null — absence is the corruption this exists to
    * catch.
    */
  def verify(spark: SparkSession, outDir: String, idCol: String,
      textCol: String): DataFrame = {
    val data = spark.read.parquet(s"$outDir/data")
    val recomputed = data
      .select(col("shard").cast("long").as("shard"),
        length(col(textCol)).as("_len"), Fnv64(col(textCol)).as("_fp"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("r_docs"),
        sum(col("_len").cast("long")).as("r_chars"),
        expr("bit_xor(_fp)").as("r_checksum"))
    spark.read.parquet(s"$outDir/manifest")
      .join(recomputed, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs"), col("sum_chars"), col("checksum"),
        (col("n_docs") <=> col("r_docs") &&
          col("sum_chars") <=> col("r_chars") &&
          col("checksum") <=> col("r_checksum")).as("verified"))
  }
}
