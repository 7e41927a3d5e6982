package graft.sink

import graft.state.FsStateStore

/** Resumable multi-dataset publish — the reference's commit-sequence
  * semantics (gobblin-core/.../publisher/CommitSequencePublisher.java;
  * the runtime's FsCommitSequenceStore): the publish PLAN is persisted
  * before any dataset moves, each dataset's completion is recorded
  * right after its atomic publish, and a rerun after a driver crash
  * mid-sequence SKIPS the datasets already recorded done — no
  * duplicate publishes, no lost datasets.
  *
  * Crash windows:
  *  - before a dataset's publish: rerun publishes it (staging intact);
  *  - DURING a publish: rename moves each staged entry exactly once —
  *    an entry is either still in staging or already in the output, so
  *    re-running `publish` moves only the remainder (per-entry
  *    exactly-once, the same property the reference leans on);
  *  - between publish and the `done` record: rerun calls publish again
  *    on an empty staging dir — a no-op (moved=0).
  *
  * State lives under `commit_sequences/<job>` in the [[FsStateStore]]
  * (per-dataset JSON, atomic tmp+rename writes) — driver-side metadata
  * only, like every sequencing decision.
  */
final class CommitSequence(store: FsStateStore, storeName: String = "commit_sequences") {

  final case class StepResult(dataset: String, action: String, moved: Int)

  private def storeDir(job: String) = s"$storeName/$job"

  /** Publish `datasets` in order, recording progress; already-done
    * datasets are skipped. `publishFn` defaults to the plain atomic
    * publish; pass `publisher.publishOverwritePartitions` for
    * partition-overwrite idempotent replay. On full success the
    * sequence record is cleared (when `clearOnComplete`), so the next
    * EXECUTION of the job starts a fresh sequence.
    */
  def run(job: String, datasets: Seq[(String, SinkSpec)],
      publishFn: SinkSpec => Int,
      clearOnComplete: Boolean = true): Seq[StepResult] = {
    val dir = storeDir(job)
    // 1. persist the plan before anything moves
    datasets.foreach { case (name, spec) =>
      if (store.get(dir, name).isEmpty)
        store.put(dir, name, Map("status" -> "pending", "output" -> spec.outputDir))
    }
    // 2. walk the sequence
    val results = datasets.map { case (name, spec) =>
      store.get(dir, name) match {
        case Some(st) if st.get("status").contains("done") =>
          StepResult(name, "skipped", 0)
        case _ =>
          val moved = publishFn(spec)
          store.put(dir, name, Map(
            "status" -> "done", "moved" -> moved.toString, "output" -> spec.outputDir))
          StepResult(name, "published", moved)
      }
    }
    // 3. complete: clear the sequence record
    if (clearOnComplete) datasets.foreach { case (name, _) => store.delete(dir, name) }
    results
  }

  /** Datasets recorded done for a (crashed) job execution. */
  def completed(job: String): Seq[String] =
    store.listKeys(storeDir(job)).filter(k =>
      store.get(storeDir(job), k).exists(_.get("status").contains("done")))
}
