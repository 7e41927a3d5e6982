package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paged REST-style source with a pluggable client — the operator
  * semantics of the reference's RestApiExtractor (gobblin-core/.../
  * extract/restapi/RestApiExtractor.java:232-238 cursor-paged pulls
  * via nextUrl, :172 getMaxWatermark, watermark Predicate push-down;
  * RestApiConnector holds the transport). The transport is exactly the
  * pluggable seam: tests and the driver gate use a deterministic fake
  * client; a real HTTP client drops in unchanged (the same pattern as
  * [[graft.sink.ClientSink]] on the write side).
  *
  * Spark shape for 100 TB-class pulls: ONE page chain is inherently
  * sequential (each page hands out the next cursor), so parallelism
  * comes from the watermark axis — the reference's partition planning.
  * Each watermark interval becomes one task that walks its own page
  * chain executor-side; records stream through an iterator (no
  * per-task buffering of the whole chain), and JSON decoding runs as a
  * codegen'd `from_json` projection, not client-side parsing.
  *
  * Retry: fetch failures back off and retry up to maxRetries per page
  * request (the reference's connector retry); a page that still fails
  * fails the task, and Spark's task retry re-walks that interval only.
  */
object RestSource {

  /** One page of results: raw record payloads plus the cursor for the
    * next page (None = chain exhausted). Mirrors nextUrl paging.
    */
  final case class Page(records: Seq[String], nextCursor: Option[String])

  /** A page request: entity + watermark interval (low, high] pushed to
    * the service as a predicate + page size; `cursor` None opens the
    * chain.
    */
  final case class PageRequest(entity: String, wmColumn: String,
      lowExclusive: Long, highInclusive: Long, pageSize: Int,
      cursor: Option[String])

  /** The transport seam. Implementations must be Serializable — fetch
    * runs on executors.
    */
  trait PagedClient extends Serializable {
    def fetch(req: PageRequest): Page
  }

  /** Walk one interval's page chain lazily with bounded retry. */
  private final class PageChain(client: PagedClient, entity: String, wmColumn: String,
      lo: Long, hi: Long, pageSize: Int, maxRetries: Int, backoffMs: Long)
    extends Iterator[String] {

    private var cursor: Option[String] = None
    private var done = false
    private var buffer: Iterator[String] = Iterator.empty

    private def fetchWithRetry(req: PageRequest): Page = {
      var attempt = 0
      while (true) {
        try return client.fetch(req)
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            if (backoffMs > 0) Thread.sleep(backoffMs * (1L << (attempt - 1)))
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def advance(): Unit =
      while (!buffer.hasNext && !done) {
        val page = fetchWithRetry(PageRequest(entity, wmColumn, lo, hi, pageSize, cursor))
        buffer = page.records.iterator
        cursor = page.nextCursor
        if (cursor.isEmpty) done = true
      }

    override def hasNext: Boolean = { advance(); buffer.hasNext }
    override def next(): String = { advance(); buffer.next() }
  }

  /** Incremental paged read: fan the (low, high] watermark range out
    * into `maxIntervals` page chains (one executor task each), parse
    * records with `schema` via from_json. Interval math reuses
    * [[Partitioner.intervals]] — the same planning the JDBC source
    * pushes as predicates.
    */
  def readIncremental(spark: SparkSession, client: PagedClient, entity: String,
      wmColumn: String, low: Long, high: Long, maxIntervals: Int,
      schema: StructType, pageSize: Int = 1000, maxRetries: Int = 3,
      backoffMs: Long = 0L): DataFrame = {
    import spark.implicits._
    val ivs = Partitioner.intervals(low, high, maxIntervals, WatermarkType.Simple)
    val work = spark.createDataset(ivs).repartition(math.max(ivs.size, 1))
    val raw = work.mapPartitions { it =>
      it.flatMap { case (lo, hi) =>
        new PageChain(client, entity, wmColumn, lo, hi, pageSize, maxRetries, backoffMs)
      }
    }.toDF("record")
    raw.select(from_json(col("record"), schema).as("r")).select(col("r.*"))
  }

  /** getMaxWatermark (RestApiExtractor.java:172): probe the service for
    * the high watermark before planning — here the client answers it
    * from a 1-row page on a reversed cursor; fake clients compute it.
    */
  def maxWatermark(client: PagedClient, entity: String, wmColumn: String,
      low: Long): Option[Long] = {
    val page = client.fetch(PageRequest(entity, wmColumn, low, Long.MaxValue, 1,
      Some("max_watermark")))
    page.records.headOption.map(_.trim.toLong)
  }

  /** Deterministic in-memory feed — the honest fake transport for
    * specs and the driver gate (no network in the container; the same
    * documented-fake pattern as Multimodal.FakeDecoder). Serves rows
    * id ∈ (lowExclusive, highInclusive] as JSON `{"id": n, "v": (n *
    * 2654435761) % 1000}` in pageSize chunks with an offset cursor —
    * the v formula is replayed by the DuckDB oracle. Pages listed in
    * `failFirstAttemptAtPage` throw on their FIRST fetch per JVM
    * (transient-failure injection for the retry path).
    */
  final class DeterministicFeed(feedHigh: Long,
      failFirstAttemptAtPage: Set[Int] = Set.empty) extends PagedClient {
    override def fetch(req: PageRequest): Page = {
      if (req.cursor.contains("max_watermark"))
        return Page(Seq(feedHigh.toString), None)
      val offset = req.cursor.map(_.toLong).getOrElse(0L)
      val pageIdx = (offset / req.pageSize).toInt
      if (failFirstAttemptAtPage(pageIdx) &&
          DeterministicFeed.failedOnce.add((req.entity, req.lowExclusive, pageIdx)))
        throw new java.io.IOException(s"transient failure at page $pageIdx")
      val lo = req.lowExclusive + offset
      val hi = math.min(lo + req.pageSize, req.highInclusive)
      val recs = ((lo + 1) to hi).map(id =>
        s"""{"id": $id, "v": ${(id * 2654435761L) % 1000}}""")
      val next = if (hi < req.highInclusive) Some((offset + req.pageSize).toString) else None
      Page(recs, next)
    }
  }

  object DeterministicFeed {
    // per-JVM transient-failure memory: a RETRIED fetch of the same
    // page succeeds, like a real flaky endpoint
    private val failedOnce =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long, Int)]()
  }
}
