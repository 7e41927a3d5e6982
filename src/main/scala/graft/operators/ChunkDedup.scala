package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHash

/** Cross-document chunk-level dedup accounting over content-defined
  * chunks (the rsync/LBFS fingerprinting idea; boundaries cut where a
  * rolling window hash matches a mask — see
  * functions/RollingHashExpr.scala). Because boundaries follow
  * CONTENT, not offsets, a shared passage buried at different offsets
  * in different documents still chunks identically after the first
  * boundary inside it — so equality on chunk hashes finds shift-
  * resistant sub-document duplication that whole-doc hashing misses,
  * at storage-dedup cost: one scan + one hash-keyed aggregation.
  *
  * Analogous surface in the reference: distcp-style copy dedup decides
  * per-FILE via checksums (ref gobblin-data-management/.../copy/
  * CopyableFile.java:94,220-252 — origin checksum carried with the
  * copy entity); this is the sub-file version a text corpus needs.
  *
  * Scale: the exploded chunk table is linear in corpus bytes /
  * 2^maskBits; the shared-hash set (chunks seen in >= 2 docs) is
  * output-bounded and joins back broadcast-style under AQE. No
  * pairwise comparison anywhere.
  */
object ChunkDedup {

  /** Per-document accounting: n_chunks (chunk occurrences) and
    * n_shared (occurrences whose hash appears in >= 2 distinct
    * documents). Documents whose text yields zero chunks are absent.
    */
  def sharedChunkStats(df: DataFrame, idCol: String, text: Column,
      window: Int = 16, maskBits: Int = 5): DataFrame = {
    val chunks = df.select(col(idCol),
      explode(RollingHash.contentChunkHashes(text, window, maskBits)).as("chunk"))
    val shared = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= 2)
      .select(col("chunk"), lit(1).as("_sh"))
    chunks.join(shared, Seq("chunk"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_sh").isNotNull, 1L).otherwise(0L)).as("n_shared"))
  }
}
