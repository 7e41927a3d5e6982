package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.{Publisher, SinkSpec}

/** Compaction: dedup + small-file merge + pre-flight verifiers + atomic
  * swap (SURVEY.md §2.6; reference gobblin-compaction — MRCompactor,
  * AvroKeyDedupReducer, CompactionThresholdVerifier /
  * CompactionTimeRangeVerifier / CompactionAuditCountVerifier,
  * recompaction conditions in compaction/conditions/).
  *
  * The whole MR module collapses to: read → [[Dedup]] → sized
  * repartition → staged write → verify → publish. Small-file merging is
  * free on read (Spark packs small files into splits) and controlled on
  * write by targetFileBytes.
  */
object Compaction {

  final case class CompactionStats(inputRows: Long, outputRows: Long, outputFiles: Int)

  /** Pre-flight verifiers — Either[reason, ()] like the reference's
    * verifier chain; any Left vetoes the run.
    */
  def thresholdVerifier(minRows: Long)(inputRows: Long): Either[String, Unit] =
    if (inputRows >= minRows) Right(()) else Left(s"below threshold: $inputRows < $minRows")

  def timeRangeVerifier(minTs: java.sql.Timestamp, maxTs: java.sql.Timestamp)(
      df: DataFrame, tsCol: String): Either[String, Unit] = {
    val outOfRange = df.filter(col(tsCol) < lit(minTs) || col(tsCol) > lit(maxTs)).limit(1).count()
    if (outOfRange == 0) Right(()) else Left(s"records outside [$minTs, $maxTs]")
  }

  /** Audit-count completeness: output must retain >= completeness of the
    * expected (audit) count — CompactionAuditCountVerifier semantics.
    */
  def auditCountVerifier(expected: Long, completeness: Double)(actual: Long): Either[String, Unit] =
    if (expected <= 0 || actual.toDouble / expected >= completeness) Right(())
    else Left(f"completeness ${actual.toDouble / expected}%.4f < $completeness%.4f")

  /** Recompaction trigger: late-records ratio (RecompactionConditionBasedOnRatio). */
  def shouldRecompact(lateRows: Long, compactedRows: Long, maxRatio: Double): Boolean =
    compactedRows > 0 && lateRows.toDouble / compactedRows > maxRatio

  /** Dedup + merge + publish. deltaCols empty = keep-any exact dedup;
    * non-empty = largest-delta-wins. Output file count is sized from
    * the input bytes so compaction actually merges small files.
    */
  def compact(spark: SparkSession, input: String, spec: SinkSpec,
      keys: Seq[String], deltaCols: Seq[String],
      targetFileBytes: Long = 256L * 1024 * 1024,
      minRowsThreshold: Long = 0): Either[String, CompactionStats] = {
    val df = spark.read.format(spec.format).load(input)
    val inputRows = df.count()
    thresholdVerifier(minRowsThreshold)(inputRows) match {
      case Left(reason) => Left(reason)
      case Right(()) =>
        val inputBytes = spark.read.format(spec.format).load(input)
          .queryExecution.optimizedPlan.stats.sizeInBytes
        val nFiles = math.max(1,
          (inputBytes / BigInt(targetFileBytes)).toInt min 10000)
        val deduped =
          if (deltaCols.isEmpty) Dedup.exact(df, keys)
          else Dedup.keepMaxBy(df, keys, deltaCols)
        val sized = deduped.repartition(nFiles)
        val publisher = new Publisher(spark.sparkContext.hadoopConfiguration)
        publisher.writeStaged(sized, spec)
        val outputRows = spark.read.format(spec.format).load(spec.stagingDir).count()
        publisher.publish(spec)
        Right(CompactionStats(inputRows, outputRows, nFiles))
    }
  }
}
