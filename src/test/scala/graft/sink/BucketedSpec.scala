package graft.sink

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed co-located join: the join of two tables bucketed on the
  * key must plan with NO shuffle exchange on either side. Shared
  * session; broadcast is disabled per-test via runtime conf (and
  * restored) so the join strategy is the bucketable sort-merge.
  */
class BucketedSpec extends SparkSpec {

  // unique per-JVM-run names: the in-memory catalog forgets tables on
  // restart but their warehouse dirs persist, and saveAsTable refuses
  // to reuse an existing managed location
  private val run = java.lang.Long.toHexString(System.nanoTime())
  private val liTable = s"li_b_$run"
  private val oTable = s"o_b_$run"

  private def withNoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }

  test("join of two bucketed tables plans without exchanges") {
    val li = Tables.load(spark, sf(), "lineitem")
    val o = Tables.load(spark, sf(), "orders")
    Bucketed.writeBucketed(li.select("l_orderkey", "l_quantity"), liTable, "l_orderkey", 4)
    Bucketed.writeBucketed(o.select("o_orderkey", "o_totalprice"), oTable, "o_orderkey", 4)

    withNoBroadcast {
      val joined = Bucketed.readBucketed(spark, liTable)
        .join(Bucketed.readBucketed(spark, oTable),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table(liTable).groupBy("l_orderkey").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
