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

  /** Pluggable audit-count source — the reference's
    * KafkaAuditCountHttpClient seam behind CompactionAuditCountVerifier
    * (gobblin-compaction/.../verify/CompactionAuditCountVerifier.java):
    * the externally audited record count for a dataset/window. None =
    * the audit store has no row, which a mandatory verifier treats as
    * "cannot verify" and vetoes (same contract as the reference's
    * failed audit fetch).
    */
  trait AuditCountProvider extends Serializable {
    def expectedCount(dataset: String): Option[Long]
  }

  final case class AuditCheck(provider: AuditCountProvider, dataset: String,
      completeness: Double = 0.99)

  private def verifyAudit(check: AuditCheck, inputRows: Long): Either[String, Unit] =
    check.provider.expectedCount(check.dataset) match {
      case None => Left(s"audit store has no count for '${check.dataset}'")
      case Some(expected) =>
        auditCountVerifier(expected, check.completeness)(inputRows)
          .left.map(r => s"audit '${check.dataset}' (expected $expected): $r")
    }

  /** Recompaction trigger: late-records ratio (RecompactionConditionBasedOnRatio). */
  def shouldRecompact(lateRows: Long, compactedRows: Long, maxRatio: Double): Boolean =
    compactedRows > 0 && lateRows.toDouble / compactedRows > maxRatio

  /** Recompaction trigger: time since last compaction
    * (RecompactionConditionBasedOnDuration).
    */
  def shouldRecompactAfter(lastCompactedMs: Long, nowMs: Long, maxAgeMs: Long): Boolean =
    nowMs - lastCompactedMs > maxAgeMs

  /** Recompaction trigger: accumulated late files
    * (RecompactionConditionBasedOnFileCount).
    */
  def shouldRecompactFiles(lateFileCount: Long, maxFiles: Long): Boolean =
    lateFileCount > maxFiles

  /** Dedup key selection from an Avro schema, the reference's
    * DedupKeyOption ladder (MRCompactorAvroKeyDedupJobRunner.java:
    * 83-181): fields whose doc matches `(?i).*primarykey` are the key;
    * a record with no such doc falls back to ALL top-level fields.
    */
  def keysFromAvroSchema(schemaJson: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    require(schema.getType == org.apache.avro.Schema.Type.RECORD,
      s"key selection needs a record schema, got ${schema.getType}")
    val pk = "(?i).*primarykey".r
    val marked = schema.getFields.asScala.toSeq.filter(f =>
      Option(f.doc()).exists(d => pk.matches(d)))
    (if (marked.nonEmpty) marked else schema.getFields.asScala.toSeq).map(_.name())
  }

  /** Dedup + merge + publish. deltaCols empty = keep-any exact dedup;
    * non-empty = largest-delta-wins. Output file count is sized from
    * the input bytes (relation FILE stats — metadata, no scan) so
    * compaction actually merges small files.
    *
    * Single-pass discipline: input and output row counts ride the
    * staged write as Observations, and the pre-dedup repartition is ON
    * THE KEYS so the dedup aggregation reuses it — one scan of the
    * input, one shuffle, no post-write recount. The threshold verifier
    * therefore gates the PUBLISH, not the run: a vetoed run costs a
    * discarded staging dir (cheap, atomic), where a pre-flight count
    * would cost every run a full extra scan — at 100 TB the wrong
    * trade by far.
    */
  def compact(spark: SparkSession, input: String, spec: SinkSpec,
      keys: Seq[String], deltaCols: Seq[String],
      targetFileBytes: Long = 256L * 1024 * 1024,
      minRowsThreshold: Long = 0,
      registerAs: Option[String] = None,
      audit: Option[AuditCheck] = None): Either[String, CompactionStats] = {
    val df = spark.read.format(spec.format).load(input)
    val inputBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1,
      (inputBytes / BigInt(targetFileBytes)).toInt min 10000)
    val inObs = org.apache.spark.sql.Observation()
    val outObs = org.apache.spark.sql.Observation()
    // hash-repartition on the dedup keys: the aggregation's required
    // distribution is already satisfied, so no second exchange, and the
    // output lands in exactly nFiles files
    val keyed = df.observe(inObs, count(lit(1)).as("rows"))
      .repartition(nFiles, keys.map(col): _*)
    val deduped =
      if (deltaCols.isEmpty) Dedup.exact(keyed, keys)
      else Dedup.keepMaxBy(keyed, keys, deltaCols)
    val sized = deduped.observe(outObs, count(lit(1)).as("rows"))
    val publisher = new Publisher(spark.sparkContext.hadoopConfiguration)
    publisher.writeStaged(sized, spec)
    val inputRows = inObs.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L)
    val outputRows = outObs.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L)
    val verdict = for {
      _ <- thresholdVerifier(minRowsThreshold)(inputRows)
      _ <- audit.fold[Either[String, Unit]](Right(()))(verifyAudit(_, inputRows))
    } yield ()
    verdict match {
      case Left(reason) =>
        publisher.abort(spec)
        Left(reason)
      case Right(()) =>
        // snapshot swap, not merge: the compacted output REPLACES any
        // previous snapshot, so a replayed compaction converges
        publisher.publishSnapshot(spec)
        // post-action: catalog registration (the reference's
        // CompactionHiveRegistrationAction)
        registerAs.foreach(table =>
          new graft.sink.CatalogPublisher(spark).register(spec, table))
        Right(CompactionStats(inputRows, outputRows, nFiles))
    }
  }
}
