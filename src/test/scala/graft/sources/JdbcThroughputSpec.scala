package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** BASELINE.md's one hard reference number: MySQL JDBC writer, 80k
  * records (14 sparse fields), best case 40s at batch=1000,
  * parallelism 1 (Gobblin-JDBC-Writer.md:181-196). Same record count
  * and field count through our staging-swap path must beat it with
  * slack. (Embedded Derby vs networked MySQL isn't identical I/O, so
  * the asserted bound keeps a 2x margin below the reference's 40s.)
  */
class JdbcThroughputSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftbench;create=true"

  test("80k x 14-field records through staging swap in well under 40s") {
    val ddl = (1 to 12).map(i => s"f$i DOUBLE").mkString(", ")
    def exec(sql: String): Unit = {
      val c = DriverManager.getConnection(url)
      try { val st = c.createStatement(); try st.executeUpdate(sql) finally st.close() }
      finally c.close()
    }
    exec(s"CREATE TABLE bench_final (id BIGINT, name VARCHAR(64), $ddl)")
    exec(s"CREATE TABLE bench_staging (id BIGINT, name VARCHAR(64), $ddl)")

    val df = spark.range(80000).selectExpr(
      Seq("id", "concat('rec-', id) AS name") ++
        (1 to 12).map(i => s"CASE WHEN id % $i = 0 THEN id * 1.5 ELSE NULL END AS f$i"): _*)
      .coalesce(1) // parallelism 1, matching the reference setup

    val t0 = System.nanoTime()
    df.write.mode("append").jdbc(url, "bench_staging", new java.util.Properties())
    val c = DriverManager.getConnection(url)
    try JdbcSource.publishStaging(c, "bench_staging", "bench_final", truncateFinal = false)
    finally c.close()
    val secs = (System.nanoTime() - t0) / 1e9

    val back = spark.read.jdbc(url, "bench_final", new java.util.Properties())
    assert(back.count() == 80000)
    info(f"80k records staged+swapped in $secs%.1f s (reference best: 40 s)")
    assert(secs < 20.0, f"$secs%.1f s — expected well under the 40 s reference")
  }
}
