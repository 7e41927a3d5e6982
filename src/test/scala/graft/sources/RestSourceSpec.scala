package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** RestSource: pagination exactness, watermark predicate, retry path,
  * max-watermark probe — the RestApiExtractor semantics over the
  * pluggable fake transport.
  */
class RestSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  test("page boundaries are exact: no dup/missing ids across pages and intervals") {
    val client = new RestSource.DeterministicFeed(feedHigh = 100)
    // pageSize 7 deliberately does NOT divide interval sizes
    val df = RestSource.readIncremental(spark, client, "e", "id",
      low = 0, high = 100, maxIntervals = 4, schema = schema, pageSize = 7)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 100L), s"got ${ids.length} ids")
  }

  test("watermark predicate: only ids above the low watermark are pulled") {
    val client = new RestSource.DeterministicFeed(feedHigh = 100)
    val df = RestSource.readIncremental(spark, client, "e", "id",
      low = 50, high = 100, maxIntervals = 3, schema = schema, pageSize = 9)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (51L to 100L))
  }

  test("transient page failure is retried and the pull completes") {
    val client = new RestSource.DeterministicFeed(feedHigh = 60,
      failFirstAttemptAtPage = Set(1))
    val df = RestSource.readIncremental(spark, client, "retry_e", "id",
      low = 0, high = 60, maxIntervals = 2, schema = schema, pageSize = 10,
      maxRetries = 2, backoffMs = 0)
    assert(df.count() == 60)
  }

  test("exhausted retries fail the pull") {
    // a FRESH entity name per run so the per-JVM transient memory
    // can't have absorbed the failure already
    val entity = "fail_e_" + System.nanoTime()
    val client = new RestSource.DeterministicFeed(feedHigh = 30,
      failFirstAttemptAtPage = Set(1))
    val df = RestSource.readIncremental(spark, client, entity, "id",
      low = 0, high = 30, maxIntervals = 1, schema = schema, pageSize = 10,
      maxRetries = 0)
    // spark wraps the task failure; the transient IOException is the cause chain
    val e = intercept[org.apache.spark.SparkException] { df.count() }
    assert(e.getMessage.contains("transient failure") ||
      Option(e.getCause).exists(_.getMessage.contains("transient failure")))
  }

  test("max-watermark probe answers the planning query") {
    val client = new RestSource.DeterministicFeed(feedHigh = 4242)
    assert(RestSource.maxWatermark(client, "e", "id", 0).contains(4242L))
  }

  test("values parse through from_json with the declared schema") {
    val client = new RestSource.DeterministicFeed(feedHigh = 20)
    val rows = RestSource.readIncremental(spark, client, "e", "id",
        low = 0, high = 20, maxIntervals = 2, schema = schema, pageSize = 6)
      .orderBy(col("id")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == (r.getLong(0) * 2654435761L) % 1000)
    }
  }
}
