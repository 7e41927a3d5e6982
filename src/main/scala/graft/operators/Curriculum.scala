package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum training order (Bengio et al. 2009, "Curriculum
  * Learning"; the easy-to-hard data-ordering LLM pipelines apply at
  * corpus scale): rank the corpus by a difficulty signal, cut it into
  * contiguous difficulty STAGES, and emit a global training sequence
  * that walks the stages in order while shuffling WITHIN each stage —
  * sorted-by-difficulty batches inside a stage would correlate
  * gradients, so the within-stage order must look random yet stay
  * reproducible across reruns and engines.
  *
  * Determinism contract: every ordering is total (id tie-break), the
  * stage cut is the exact integer `(rank-1) * stages div n`, and the
  * within-stage shuffle key is `md5(salt | id)` — a hash both Spark
  * and SQL oracles evaluate identically (no engine RNG anywhere).
  *
  * Scale shape: two [[GlobalOrder]] range exchanges (difficulty rank,
  * then the final train_seq over (stage, shuffle key)) — no
  * single-partition window, no driver data path; the corpus row count
  * rides the first exchange's prefix-offset collect for free
  * ([[GlobalOrder.withRowNumberCounted]]), so staging costs no extra
  * scan.
  */
object Curriculum {

  /** `docs` plus `stage` (0-based, contiguous in difficulty) and
    * `train_seq` (1-based global training order). `difficultyCol`
    * ascends easy → hard; `idCol` must be unique.
    */
  def order(docs: DataFrame, idCol: String, difficultyCol: String,
      stages: Int, salt: String = "cur"): DataFrame = {
    require(stages >= 1, s"stages must be >= 1, got $stages")
    val (ranked, n) = GlobalOrder.withRowNumberCounted(docs,
      Seq(col(difficultyCol).asc, col(idCol).asc), "_drank")
    if (n == 0) return ranked.drop("_drank")
      .withColumn("stage", lit(0L)).withColumn("train_seq", lit(0L))
      .limit(0)
    val staged = ranked
      .withColumn("stage", expr(s"((_drank - 1) * $stages) div $n"))
      .withColumn("_skey",
        md5(concat(lit(s"$salt|"), col(idCol).cast("string"))))
    GlobalOrder.withRowNumber(staged,
        Seq(col("stage").asc, col("_skey").asc, col(idCol).asc), "train_seq")
      .drop("_drank", "_skey")
  }
}
