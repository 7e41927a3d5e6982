package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Lookup-join / enrichment against an external service — the
  * reference's AsyncHttpJoinConverter / AsyncConverter1to1
  * (gobblin-modules/gobblin-http/.../AsyncHttpJoinConverter.java:64,
  * AsyncConverter1to1.java:49 — bounded in-flight futures).
  *
  * No Catalyst primitive expresses a remote lookup, so this is the one
  * operator family built on mapPartitions (preference order (d), and
  * justifiably): rows stream per partition, keys are batched, at most
  * `maxInflightBatches` batches are in flight per partition. The
  * cluster-wide request rate is partitions x maxInflightBatches —
  * repartition() the input to set it.
  *
  * The client is a plain `Seq[String] => Map[String, String]`
  * (key batch -> responses); a real HTTP client drops in unchanged.
  * Failures: keys missing from the response map yield null (OPTIONAL
  * policy semantics); a throwing client fails the task and Spark
  * retries it — same as the reference's failure-rate threshold, minus
  * the bookkeeping.
  */
object AsyncEnrich {

  def enrich(df: DataFrame, keyCol: String, as: String,
      client: Seq[String] => Map[String, String],
      batchSize: Int = 100, maxInflightBatches: Int = 4): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(as, StringType, nullable = true))
    val keyIdx = df.schema.fieldIndex(keyCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      // ExecutionContext per partition-task: bounded by inflight cap.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(maxInflightBatches)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val batches = rows.grouped(batchSize)
      // sliding window of in-flight batch futures
      val inflight = new scala.collection.mutable.Queue[Future[Seq[Row]]]()
      def launch(batch: Seq[Row]): Future[Seq[Row]] = Future {
        val keys = batch.map(r => String.valueOf(r.get(keyIdx)))
        val responses = client(keys.distinct)
        batch.zip(keys).map { case (r, k) =>
          Row.fromSeq(r.toSeq :+ responses.get(k).orNull)
        }
      }
      val out = new Iterator[Seq[Row]] {
        def hasNext: Boolean = inflight.nonEmpty || batches.hasNext
        def next(): Seq[Row] = {
          while (batches.hasNext && inflight.size < maxInflightBatches)
            inflight.enqueue(launch(batches.next()))
          val r = Await.result(inflight.dequeue(), Duration.Inf)
          if (!hasNext) pool.shutdown()
          r
        }
      }
      out.flatten
    }
  }
}
