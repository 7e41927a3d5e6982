package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** JDBC source + staging-swap sink against embedded Derby — the whole
  * staging-table publish protocol (Gobblin-JDBC-Writer.md:16-24)
  * exercised end-to-end through spark.read/write.jdbc.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = s"jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sql: String): Unit = withConn { c =>
    val st = c.createStatement(); try st.executeUpdate(sql) finally st.close()
  }

  test("staging-swap publish is atomic and idempotent-on-retry") {
    exec("CREATE TABLE final_t (id BIGINT, v DOUBLE)")
    exec("CREATE TABLE staging_t (id BIGINT, v DOUBLE)")

    val df = Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).toDF("id", "v")
    // Spark writes the staging table (mode overwrite re-creates it —
    // Derby needs it dropped first or written fresh; use append onto
    // the empty staging table to keep DDL ours)
    df.write.mode("append").jdbc(url, "staging_t", new java.util.Properties())
    withConn(c => JdbcSource.publishStaging(c, "staging_t", "final_t", truncateFinal = false))

    val back = spark.read.jdbc(url, "final_t", new java.util.Properties())
    assert(back.count() == 3)
    // staging emptied by the swap -> re-running the swap is a no-op
    withConn(c => JdbcSource.publishStaging(c, "staging_t", "final_t", truncateFinal = false))
    assert(spark.read.jdbc(url, "final_t", new java.util.Properties()).count() == 3)
  }

  test("histogram-planned read balances a skewed source") {
    exec("CREATE TABLE skew_t (id BIGINT, updated BIGINT)")
    // 10 rows spread over [0, 1000), then a 200-row burst in [500, 510)
    (0 until 10).foreach(i => exec(s"INSERT INTO skew_t VALUES ($i, ${i * 100})"))
    (0 until 200).foreach(i => exec(s"INSERT INTO skew_t VALUES (${100 + i}, ${500 + i % 10})"))

    // probe the histogram the way a planner would: coarse bucket counts
    val probe = spark.read.jdbc(url, "skew_t", new java.util.Properties())
      .groupBy((org.apache.spark.sql.functions.col("updated") / 100).cast("long").as("b"))
      .count().collect()
      .map(r => Partitioner.HistBucket(r.getLong(0) * 100, (r.getLong(0) + 1) * 100, r.getLong(1)))
      .sortBy(_.lo).toSeq

    val df = JdbcSource.readIncrementalByHistogram(spark, url, "skew_t",
      wmColumn = "updated", buckets = probe, targetRows = 50,
      wmType = WatermarkType.Simple)
    assert(df.count() == 210)
    // the burst bucket is isolated into its own partition; quiet spans pack
    val perPartition = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPartition.max >= 200, "burst rows concentrate in the probed hot range")
    assert(perPartition.count(_ > 50) == 1,
      s"only the histogram-floor partition may exceed target: ${perPartition.mkString(",")}")
  }

  test("incremental read partitions by watermark predicates") {
    exec("CREATE TABLE src_t (id BIGINT, updated BIGINT)")
    (1L to 100L).foreach(i => exec(s"INSERT INTO src_t VALUES ($i, ${i * 10})"))

    val df = JdbcSource.readIncremental(spark, url, "src_t",
      wmColumn = "updated", low = 200, high = 1000, maxIntervals = 4,
      wmType = WatermarkType.Simple)
    // (200, 1000]: predicates are >= low, so row updated=200 included;
    // reference semantics treat low as inclusive start of the range
    assert(df.rdd.getNumPartitions == 4)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 20L && ids.last == 100L && ids.length == 81)
  }
}
