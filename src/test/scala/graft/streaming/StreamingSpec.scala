package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Converters

/** Structured-Streaming ingestion driven synchronously with
  * processAllAvailable (guide pattern): file source → transforms →
  * partitioned file sink with checkpoint; restart resumes from the
  * checkpoint and picks up only new files (the KafkaStreamingExtractor
  * flush/commit semantics, inherited from the engine).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def stageEvents(dir: String, firstHalf: Boolean): Unit = {
    val ev = Tables.load(spark, sf(), "events")
    val part = if (firstHalf) ev.filter($"event_id" < 500) else ev.filter($"event_id" >= 500)
    part.write.mode("append").parquet(dir)
  }

  test("file-stream ingest with checkpoint resumes across restarts") {
    val root = tmpDir("streaming")
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    stageEvents(in, firstHalf = true)
    val schema = Tables.load(spark, sf(), "events").schema

    def runOnce(): Unit = {
      val stream = StreamingIngest.readFileStream(spark, schema, in)
      val q = StreamingIngest.ingest(stream,
        ops = Seq(Converters.withTimePartition("ts")),
        outputDir = out, checkpointDir = ckpt,
        partitionBy = Seq("date_key"), flushIntervalSecs = 1).start()
      q.processAllAvailable(); q.stop()
    }

    runOnce()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 500)

    // new files arrive; restart resumes from checkpoint, no reprocessing
    stageEvents(in, firstHalf = false)
    runOnce()
    val outDf = spark.read.parquet(out)
    assert(outDf.count() == 1000)
    assert(outDf.select("event_id").distinct().count() == 1000) // exactly-once
    assert(outDf.columns.contains("date_key"))
  }

  test("windowed aggregation with watermark matches batch equivalent") {
    val root = tmpDir("streamwin")
    val in = s"$root/in"
    stageEvents(in, firstHalf = true); stageEvents(in, firstHalf = false)
    val schema = Tables.load(spark, sf(), "events").schema

    val stream = StreamingIngest.readFileStream(spark, schema, in)
    val agg = StreamingIngest.windowedAgg(stream, "ts", "event_type",
      windowDuration = "1 day", slideDuration = "1 day", lateness = "1 hour",
      valueCol = "value")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    // append mode emits only closed windows (watermark passed); compare
    // those against the batch computation restricted to the same windows
    val streamed = spark.table("win_out")
      .select($"window_start", $"event_type", $"n")
    val batch = Tables.load(spark, sf(), "events")
      .groupBy(window($"ts", "1 day").getField("start").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val joined = streamed.join(batch, Seq("window_start", "event_type"), "inner")
      .filter(streamed("n") =!= batch("n"))
    assert(streamed.count() > 0, "no closed windows emitted")
    assert(joined.count() == 0, "streamed counts disagree with batch")
  }

  test("foreachBatch ingest: conform + atomic partition publish per micro-batch") {
    val root = tmpDir("streamfeb")
    val in = s"$root/in"
    stageEvents(in, firstHalf = true)
    val schema = Tables.load(spark, sf(), "events").schema
    val store = new graft.state.FsStateStore(s"$root/state")
    // target schema without props (simulates a narrower sink contract)
    val target = org.apache.spark.sql.types.StructType(schema.fields.filter(_.name != "props"))

    val stream = StreamingIngest.readFileStream(spark, schema, in)
    val q = StreamingIngest.ingestForeachBatch(stream, target, store, "events_s",
        ops = Seq(Converters.withTimePartition("ts")),
        stagingDir = s"$root/staging", outputDir = s"$root/out",
        partitionBy = Seq("date_key"))
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 500)
    assert(!out.columns.contains("props")) // conformed to target
    assert(out.columns.contains("date_key"))
  }

  test("stateful running totals accumulate across batches") {
    val root = tmpDir("streamstate")
    val in = s"$root/in"
    stageEvents(in, firstHalf = true)
    val schema = Tables.load(spark, sf(), "events").schema

    val stream = StreamingIngest.readFileStream(spark, schema, in,
      maxFilesPerTrigger = Some(1))
    val totals = StreamingIngest.runningTotals(stream, "user_id", "value")
    val q = totals.writeStream.format("memory").queryName("totals_out")
      .outputMode("update").start()
    q.processAllAvailable()
    // second batch arrives -> state carries over
    stageEvents(in, firstHalf = false)
    q.processAllAvailable(); q.stop()

    val last = spark.table("totals_out")
      .groupBy($"user_id").agg(max($"running_count").as("n"))
    val expected = Tables.load(spark, sf(), "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    assert(last.except(expected).isEmpty && expected.except(last).isEmpty)
  }

  test("streaming dedup drops duplicate keys within the watermark horizon") {
    val root = tmpDir("streamdedup")
    val in = s"$root/in"
    // write the same half twice -> every event duplicated
    stageEvents(in, firstHalf = true); stageEvents(in, firstHalf = true)
    val schema = Tables.load(spark, sf(), "events").schema

    val stream = StreamingIngest.readFileStream(spark, schema, in)
    val deduped = StreamingIngest.streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 500)
  }

  test("within-watermark dedup suppresses ts-jittered replays; ts-keyed dedup cannot") {
    val root = tmpDir("streamdedupwk")
    val in = s"$root/in"
    val ev = Tables.load(spark, sf(), "events").filter($"event_id" < 200)
    // replay with a +1 minute jitter: same keys, different event time
    ev.write.mode("append").parquet(in)
    ev.withColumn("ts", $"ts" + expr("INTERVAL 1 MINUTE"))
      .write.mode("append").parquet(in)
    val schema = Tables.load(spark, sf(), "events").schema

    def runDedup(name: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
      val stream = StreamingIngest.readFileStream(spark, schema, in)
      val q = f(stream).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }
    // keys-only within-watermark dedup: every jittered replay suppressed
    assert(runDedup("ddwk_out", s =>
      StreamingIngest.streamingDedupWithinWatermark(s, "ts", "2160 hours", Seq("event_id"))) == 200)
    // (keys + ts)-keyed dedup: the jittered copies all slip through
    assert(runDedup("ddts_out", s =>
      StreamingIngest.streamingDedup(s, "ts", "2160 hours", Seq("event_id"))) == 400)
  }
}
