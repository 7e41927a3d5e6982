package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Converters.Op

/** Streaming ingestion (SURVEY.md §2.8/§3.2), Structured-Streaming
  * native. The reference's ack/watermark machinery
  * (FineGrainedWatermarkTracker, WatermarkManager, FlushControlMessage
  * every stream.flush.interval.secs) collapses into the checkpoint
  * commit log + ProcessingTime trigger: each micro-batch IS the flush
  * boundary, offsets commit after the sink write — the exact semantics
  * KafkaStreamingExtractor implements by hand
  * (KafkaStreamingExtractor.java:87,115-137; FlushingExtractor.java:79-151).
  */
object StreamingIngest {

  /** File-source stream (the manual Auto-Loader's streaming mode). */
  def readFileStream(spark: SparkSession, schema: StructType, path: String,
      format: String = "parquet", maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.format(format).load(path)
  }

  /** Transform chain + partitioned file sink with flush-interval
    * trigger: the Kafka->HDFS ingestion shape. Caller starts it.
    */
  def ingest(stream: DataFrame, ops: Seq[Op], outputDir: String,
      checkpointDir: String, partitionBy: Seq[String],
      flushIntervalSecs: Long = 60): DataStreamWriter[org.apache.spark.sql.Row] = {
    val transformed = ops.foldLeft(stream)((df, op) => op(df))
    val w = transformed.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(flushIntervalSecs * 1000))
      .outputMode("append")
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }

  /** Stateful streaming wants its OWN shuffle-partition sizing: every
    * partition of a stateful exchange is a state-store instance with
    * per-micro-batch open/commit cost, so the right count tracks the
    * KEY SPACE, not the session's batch-join parallelism (measured
    * here: 32 -> 8 partitions cut a small windowed-agg stream's wall
    * clock ~40%; at real scale the same knob goes the other way).
    * Runs `body` with spark.sql.shuffle.partitions=n — the value is
    * captured into the stream's checkpoint at first start — then
    * restores the session setting.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** Run an append-mode streaming plan over a static source to
    * completion (Trigger.AvailableNow + parquet sink): all available
    * data is processed, the final no-data micro-batch advances the
    * watermark and flushes closed windows, then the query stops. This
    * makes streaming semantics batch-replayable — the driver's
    * correctness gate can diff the sink against a batch oracle.
    */
  def runAvailableNow(out: DataFrame, outputDir: String, checkpointDir: String): Unit = {
    val q = out.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time windowed aggregation with late-data watermark — the
    * capability the reference delegates to offline compaction (§2.8),
    * done online: counts+sums per (window, key).
    */
  def windowedAgg(stream: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, slideDuration: String, lateness: String,
      valueCol: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration, slideDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"), col("sum_value"))

  /** foreachBatch ingestion with the full batch-side commit machinery:
    * each micro-batch is schema-conformed (additive evolution handled,
    * incompatible change stops the query with the new schema recorded),
    * transformed, staged, and published atomically with partition
    * overwrite — so a replayed micro-batch (failure between sink write
    * and checkpoint commit) converges instead of duplicating. This is
    * the exactly-once file-sink pattern the reference approximates with
    * flush-ack watermarks (§2.8).
    */
  def ingestForeachBatch(stream: DataFrame,
      targetSchema: org.apache.spark.sql.types.StructType,
      store: graft.state.StateStore, streamName: String,
      ops: Seq[Op], stagingDir: String, outputDir: String,
      partitionBy: Seq[String]): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val conformed = SchemaEvolution.conform(batch, targetSchema, store, streamName)
        val transformed = ops.foldLeft(conformed)((df, op) => op(df))
        val publisher = new graft.sink.Publisher(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        val spec = graft.sink.SinkSpec(s"$stagingDir/batch-$batchId", outputDir,
          partitionBy = partitionBy)
        publisher.writeStaged(transformed, spec)
        publisher.publishOverwritePartitions(spec)
        ()
    }

  /** Custom keyed state — the `KeyValueGroupedDataset.mapGroupsWithState`
    * face of the engine (running per-key aggregates that outlive any
    * window). Emits (key, runningCount, runningSum) per key per batch.
    */
  def runningTotals(stream: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(keyCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          (key, n, s)
      }
      .toDF(keyCol, "running_count", "running_sum")
  }

  /** Streaming exact dedup on a key with state TTL via watermark —
    * the streaming face of compaction dedup: `dropDuplicates` keeps
    * first-seen per key within the watermark horizon.
    */
  def streamingDedup(stream: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness).dropDuplicates(keys :+ tsCol)

  /** Keys-ONLY streaming dedup with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`, Spark 3.5+): unlike
    * [[streamingDedup]] — whose state key includes the event-time
    * column, so a replayed event with a JITTERED timestamp slips
    * through — this suppresses any duplicate key arriving within the
    * watermark delay of the first occurrence, while state still
    * evicts once the watermark passes. The at-least-once-source →
    * effectively-once-sink dedup shape (the reference's Kafka replay
    * concern) with bounded state at 100 TB.
    */
  def streamingDedupWithinWatermark(stream: DataFrame, tsCol: String,
      lateness: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "within-watermark dedup needs at least one key column")
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Stream-stream event-time interval join: left rows match right
    * rows with the same key whose timestamp falls in
    * [left.ts, left.ts + within]. Both sides carry watermarks, so the
    * join STATE is bounded — Spark evicts a buffered row once the
    * other side's watermark passes its join-condition horizon; without
    * the time bound a stream-stream join would buffer both streams
    * forever. Inner matches emit as soon as both rows arrive
    * (append mode), so the complete run's output equals the batch
    * join — which is exactly what the oracle replays.
    *
    * Column names on each side must be pre-disambiguated by the
    * caller (`lTs`/`rTs` etc. name columns, not expressions).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lTs: String, rTs: String, within: String,
      lateness: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark(lTs, lateness)
    val r = right.withWatermark(rTs, lateness)
    l.join(r,
      expr(s"""$key = ${key}_r AND $rTs >= $lTs AND $rTs <= $lTs + interval $within"""))
  }
}
