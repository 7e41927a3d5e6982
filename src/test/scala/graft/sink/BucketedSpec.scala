package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Bucketed co-located join: the join of two tables bucketed on the
  * key must plan with NO shuffle exchange on either side.
  * Own session (needs a warehouse dir + disabled broadcast so the
  * join strategy is the bucketable sort-merge).
  */
class BucketedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("BucketedSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("warehouse").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  test("join of two bucketed tables plans without exchanges") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Bucketed.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 4)
    Bucketed.writeBucketed(o.select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey", 4)

    val joined = Bucketed.readBucketed(spark, "li_b")
      .join(Bucketed.readBucketed(spark, "o_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // and it still computes the right thing
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("li_b").groupBy("l_orderkey").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
