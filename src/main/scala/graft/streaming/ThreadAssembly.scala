package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversation-thread assembly — the custom-keyed-state
  * face of `operators/SftPrep.assembleThreads`, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` (the reference's
  * stateful-processor seam; the 1→N emission `mapGroupsWithState`
  * can't express): per user, buffer turns, split on `> gapMs`
  * silence, and emit each ASSEMBLED session once the event-time
  * watermark proves it can no longer grow.
  *
  * Emission contract (exact, oracle-replayable): a session with last
  * turn at `last_ms` emits iff `last_ms + gapMs < watermark` —
  * STRICT, both in data batches and on event-time timeout (Spark
  * fires a timeout when its timestamp < watermark, also strict, so
  * one rule covers both paths; the final no-data micro-batch raises
  * the watermark to the global max event time and flushes everything
  * strictly below it). Sessions still open at stream end never emit —
  * append-mode discipline, same shape as the session_window gate.
  *
  * State per key: the buffered turns of the not-yet-emittable
  * sessions plus the next session number — bounded by one user's
  * unflushed history, the same bound every sessionization operator
  * carries; emitted turns leave state immediately.
  */
object ThreadAssembly {

  /** `ts` duplicates `ms` as a TIMESTAMP solely to carry the
    * event-time watermark tag into the stateful operator (Spark
    * requires the watermarked column in the operator's input); the
    * assembly logic reads the exact integer `ms`.
    */
  final case class ThreadTurn(user_id: Long, ts: java.sql.Timestamp,
      ms: Long, event_id: Long, role: String, text: String)
  final case class ThreadBuf(next_no: Long, turns: Seq[ThreadTurn])
  final case class ThreadOut(user_id: Long, session_no: Long, n_turns: Long,
      start_ms: Long, end_ms: Long, thread_text: String)

  def assemble(turns: Dataset[ThreadTurn], gapMs: Long): Dataset[ThreadOut] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (key: Long, rows: Iterator[ThreadTurn], state: GroupState[ThreadBuf]) => {
          val prior = state.getOption.getOrElse(ThreadBuf(1L, Seq.empty))
          val all = (prior.turns ++ rows).sortBy(t => (t.ms, t.event_id)).toVector
          val wm = state.getCurrentWatermarkMs()
          val sessionsB = Vector.newBuilder[Vector[ThreadTurn]]
          var cur = Vector.empty[ThreadTurn]
          for (t <- all) {
            if (cur.nonEmpty && t.ms - cur.last.ms > gapMs) {
              sessionsB += cur; cur = Vector.empty
            }
            cur = cur :+ t
          }
          if (cur.nonEmpty) sessionsB += cur
          val sessions = sessionsB.result()
          // session ends strictly increase, so emittable = time prefix
          val emit = sessions.takeWhile(sess => sess.last.ms + gapMs < wm)
          val rest = sessions.drop(emit.length)
          val out = emit.zipWithIndex.map { case (sess, i) =>
            ThreadOut(key, prior.next_no + i, sess.length,
              sess.head.ms, sess.last.ms + gapMs,
              sess.map(t => s"${t.role}: ${t.text}").mkString("\n"))
          }
          if (rest.isEmpty)
            // keep next_no so later sessions number correctly; no
            // pending work → no (new) timeout. A stale timeout firing
            // on this empty buffer walks this same path and no-ops.
            state.update(ThreadBuf(prior.next_no + emit.length, Seq.empty))
          else {
            state.update(ThreadBuf(prior.next_no + emit.length, rest.flatten))
            // earliest pending end; >= wm here (else it would have
            // emitted), satisfying Spark's not-before-watermark check
            state.setTimeoutTimestamp(math.max(rest.head.last.ms + gapMs, wm))
          }
          out.iterator
        })
  }
}
