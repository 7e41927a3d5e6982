package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-sequence (funnel) matching — the event-pattern capability
  * SQL engines expose as MATCH_RECOGNIZE and Spark has no native
  * operator for: for each key, greedily match the earliest occurrence
  * of step 1, then the earliest step-2 event strictly after it within
  * `maxGapMs`, and so on. Greedy-earliest is the standard funnel
  * definition (it maximizes downstream completion under a gap cap for
  * single-match-per-key semantics).
  *
  * Shape: ONE pass. The step-typed slice of the input is shuffled once
  * by key, sorted within partitions by (key, ms), and matched by a
  * streaming per-key scan whose state is k anchors — O(k) longs, no
  * per-key history buffering (a bot key with 10^8 events costs a
  * linear scan, not memory). The previous composition — one filtered
  * min-aggregation + key-equi-join PER STEP — scanned the (possibly
  * expensive upstream) input k times and shuffled each step slice plus
  * the anchor table separately; this shape reads the input once and
  * moves each event across the wire once. Trade-off, documented: the
  * step-1 slice now crosses the shuffle as raw events where the old
  * first-step aggregation was map-side combined; every later step's
  * slice crossed in full under both shapes, and the k−1 anchor-table
  * shuffles and joins are gone.
  */
object Funnel {

  /** Per-key funnel over `steps` event types, timestamps in `msCol`
    * (epoch millis, exact integral values). Output: key, t1..tk
    * (nullable ms, msCol's type), n_steps completed. Keys with at
    * least one step-1 event appear in the output (matching the
    * first-step aggregation of the compositional definition), even
    * when every step-1 timestamp is null.
    */
  def funnel(df: DataFrame, keyCol: String, typeCol: String, msCol: String,
      steps: Seq[String], maxGapMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.size
    val keyField = df.schema(df.schema.fieldIndex(keyCol))
    val msType = df.schema(df.schema.fieldIndex(msCol)).dataType
    // the greedy chain compares and adds epoch-millis as longs; floats
    // would silently truncate, so fail loudly (contract: exact longs)
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(msType),
      s"funnel ms column '$msCol' must be integral epoch millis, got $msType")
    val outSchema = StructType(
      StructField(keyField.name, keyField.dataType, keyField.nullable) +:
        (1 to n).map(i => StructField(s"t$i", msType, nullable = true)) :+
        StructField("n_steps", LongType, nullable = false))
    val stepsArr = steps.toArray
    // project early (§2.3): only (key, type, ms) cross the exchange,
    // and only step-typed events at all
    val slim = df
      .filter(col(typeCol).isin(steps.distinct.map(lit): _*))
      .select(col(keyCol), col(typeCol), col(msCol))
    slim
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(msCol))
      .mapPartitions { it =>
        new Iterator[Row] {
          private var started = false
          private var curKey: Any = null
          private var hasFirst = false       // key has >=1 step-1 event
          private var filled = 0             // anchors t1..t{filled} set
          private val anchorMs = new Array[Long](n)
          private val anchorVal = new Array[Any](n)
          private var pending: Row = null

          private def flush(): Row = {
            val out = new Array[Any](n + 2)
            out(0) = curKey
            var i = 0
            while (i < n) {
              out(i + 1) = if (i < filled) anchorVal(i) else null
              i += 1
            }
            out(n + 1) = filled.toLong
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
          }

          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val r = it.next()
              val key = r.get(0)
              if (!started || !java.util.Objects.equals(key, curKey)) {
                if (started && hasFirst) pending = flush()
                started = true
                curKey = key
                hasFirst = false
                filled = 0
              }
              val evType = r.getString(1)
              if (evType == stepsArr(0)) hasFirst = true
              if (!r.isNullAt(2) && filled < n && evType == stepsArr(filled)) {
                val msAny = r.get(2)
                val ms = msAny.asInstanceOf[Number].longValue
                // events arrive in ascending ms within the key, so the
                // first qualifying event IS the earliest (the min the
                // compositional definition takes); strict > means an
                // event never chains onto an anchor at its own ms
                if (filled == 0 ||
                    (ms > anchorMs(filled - 1) &&
                     ms <= anchorMs(filled - 1) + maxGapMs)) {
                  anchorMs(filled) = ms
                  anchorVal(filled) = msAny
                  filled += 1
                }
              }
            }
            if (pending == null && started && hasFirst) {
              pending = flush()
              hasFirst = false // emit the last key exactly once
            }
          }

          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Row = {
            advance()
            val r = pending; pending = null; r
          }
        }
      }(Encoders.row(outSchema))
  }
}
