package graft.sink

import org.apache.spark.sql.{DataFrame, Row}

/** Generic external-service sink: the one implementation behind the
  * reference's Kafka/Elasticsearch/Couchbase/HTTP/EventHub writer
  * family (SURVEY §2.5 — AsyncWriterManager, BufferedAsyncDataWriter,
  * BytesBoundedBatch, RetryWriter): rows stream per partition, batch
  * up, optionally rate-limit, write with bounded retries and
  * exponential backoff.
  *
  * At-least-once: a batch that exhausts retries fails the task and
  * Spark replays the partition — writers must be idempotent (keyed
  * upserts), which is also the reference's contract.
  */
object ClientSink {

  trait BatchWriter extends Serializable {
    /** Must be idempotent; throw to signal a retryable failure. */
    def writeBatch(rows: Seq[Row]): Unit
  }

  final case class WriteStats(rows: Long, batches: Long, retries: Long)

  def write(df: DataFrame, writer: BatchWriter, batchSize: Int = 500,
      maxRetries: Int = 3, backoffMs: Long = 50,
      ratePerSecond: Option[Double] = None): WriteStats = {
    val rowsAcc = df.sparkSession.sparkContext.longAccumulator("client_sink_rows")
    val batchAcc = df.sparkSession.sparkContext.longAccumulator("client_sink_batches")
    val retryAcc = df.sparkSession.sparkContext.longAccumulator("client_sink_retries")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val throttle = ratePerSecond.map(Throttle.perSecond(_))
      rows.grouped(batchSize).foreach { batch =>
        throttle.foreach(_.acquire(batch.size.toDouble))
        var attempt = 0
        var done = false
        while (!done) {
          try {
            writer.writeBatch(batch)
            done = true
          } catch {
            case e: Exception if attempt < maxRetries =>
              attempt += 1
              retryAcc.add(1)
              Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        rowsAcc.add(batch.size)
        batchAcc.add(1)
      }
    }
    WriteStats(rowsAcc.value, batchAcc.value, retryAcc.value)
  }
}
