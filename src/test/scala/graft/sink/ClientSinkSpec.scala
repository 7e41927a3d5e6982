package graft.sink

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Local-mode executors share the JVM, so statics model the external
  * service.
  */
object FakeService {
  val store = new ConcurrentHashMap[Long, String]()
  val attempts = new AtomicInteger(0)
  @volatile var failFirstN = 0

  object Writer extends ClientSink.BatchWriter {
    def writeBatch(rows: Seq[Row]): Unit = {
      if (attempts.incrementAndGet() <= failFirstN)
        throw new RuntimeException("transient service error")
      rows.foreach(r => store.put(r.getLong(0), r.getString(1)))
    }
  }
}

class ClientSinkSpec extends SparkSpec {
  import spark.implicits._

  test("batched writes deliver every row; batch count matches") {
    FakeService.store.clear(); FakeService.attempts.set(0); FakeService.failFirstN = 0
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4)
    val stats = ClientSink.write(df, FakeService.Writer, batchSize = 100)
    assert(stats.rows == 1000 && FakeService.store.size() == 1000)
    assert(stats.batches >= 10 && stats.retries == 0)
  }

  test("transient failures are retried with backoff; rows still delivered") {
    FakeService.store.clear(); FakeService.attempts.set(0); FakeService.failFirstN = 3
    val df = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1)
    val stats = ClientSink.write(df, FakeService.Writer,
      batchSize = 50, maxRetries = 5, backoffMs = 1)
    assert(FakeService.store.size() == 200)
    assert(stats.retries == 3)
  }

  test("retry exhaustion fails the job (at-least-once, not at-most-once)") {
    FakeService.store.clear(); FakeService.attempts.set(0); FakeService.failFirstN = Int.MaxValue
    val df = (1L to 10L).map(i => (i, "x")).toDF("id", "v").repartition(1)
    intercept[org.apache.spark.SparkException](
      ClientSink.write(df, FakeService.Writer, batchSize = 10, maxRetries = 1, backoffMs = 1))
  }
}
