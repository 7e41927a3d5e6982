package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.DecimalType

import graft.operators.{AsyncEnrich, Compaction, FsCopy, Retention}
import graft.quality.Quality
import graft.sink.{CatalogPublisher, Publisher, SinkSpec}
import graft.sources.{DatasetFinder, JdbcSource, WatermarkType}

/** Driver-gated queries that execute the REAL operator machinery
  * (quality checker, compaction publish, distcp copy+stitch, JDBC
  * staging swap, retention policy combination, catalog registration,
  * async enrichment) — not SQL reformulations. Each oracle replays the
  * operator's *semantics* in DuckDB over the same inputs, so a green
  * row proves the operator end-to-end: VERDICT r2's top ask was moving
  * these components from ScalaTest-only onto the driver gate.
  */
object OperatorGates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def vMilli = floor(col("value") * 1000).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- RowLevelPolicy FAIL / ERR_FILE through Quality.checkRows (ref
    //     RowLevelPolicyChecker.java:101,177-184): output = surviving
    //     rows per type plus the quarantined bucket; the oracle applies
    //     the same predicates in SQL ------------------------------------
    "q_quality_policies" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val checked = Quality.checkRows(ev, Seq(
        Quality.RowPolicy("value_cap", col("value") <= 190, Quality.Fail),
        Quality.RowPolicy("user_mod", pmod(col("user_id"), lit(7)) =!= 0, Quality.ErrFile)))
      val passed = checked.passed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(vMilli).as("sum_v_milli"))
      val quarantined = checked.quarantined.get
        .agg(count(lit(1)).as("n"), sum(vMilli).as("sum_v_milli"))
        .select(lit("_quarantined").as("event_type"), col("n"), col("sum_v_milli"))
      passed.unionByName(quarantined).orderBy(col("event_type"))
    }),

    // --- compaction END-TO-END (ref MRCompactorAvroKeyDedupJobRunner):
    //     stage a 16-file copy of the 4-column lineitem projection, run
    //     Compaction.compact (dedup + sized merge + staged write +
    //     verify + atomic publish), read back the PUBLISHED output; the
    //     oracle is the dedup SQL over the original table --------------
    "q_compaction_e2e" -> ((s, dir) => {
      val tmp = tmpDir("graft_compact")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
        .repartition(16).write.parquet(s"$tmp/input")
      val spec = SinkSpec(s"$tmp/staging", s"$tmp/output")
      val res = Compaction.compact(s, s"$tmp/input", spec,
        keys = Seq("l_orderkey"),
        deltaCols = Seq("l_linenumber", "l_partkey", "l_quantity"))
      require(res.isRight, s"compaction vetoed: $res")
      s.read.parquet(s"$tmp/output").orderBy(col("l_orderkey"))
    }),

    // --- distcp copy end-to-end (ref FileAwareInputStreamDataWriter +
    //     DistcpFileSplitter): plan with a split size small enough to
    //     force chunked copies + executor-side stitching, execute,
    //     verify lengths, then PROVE byte-fidelity by reading the
    //     copied parquet (footer/page checksums catch any corruption)
    //     and aggregating; the oracle aggregates the source table -----
    "q_fscopy_verify" -> ((s, dir) => {
      val tmp = tmpDir("graft_copy")
      t(s, dir, "events").select(col("event_id"), col("event_type"), col("user_id"), col("value"))
        .repartition(4).write.parquet(s"$tmp/src/events")
      val plan = FsCopy.plan(s, s"$tmp/src", s"$tmp/dest", splitSize = 64L * 1024)
      FsCopy.execute(plan)
      val errs = FsCopy.verify(plan)
      require(errs.isEmpty, s"copy verify failed: $errs")
      s.read.parquet(s"$tmp/dest/events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(vMilli).as("sum_v_milli"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    }),

    // --- JDBC staging-table protocol end-to-end against embedded Derby
    //     (ref Gobblin-JDBC-Writer.md:16-24): Spark-parallel staging
    //     write -> one-transaction INSERT..SELECT swap -> watermark-
    //     partitioned incremental read-back (8 predicate partitions) --
    "q_jdbc_staging" -> ((s, dir) => {
      val db = "gq" + java.util.UUID.randomUUID.toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE events_final (event_id BIGINT, event_type VARCHAR(32), v_milli BIGINT)")
        finally st.close()
      } finally conn.close()
      val props = new java.util.Properties()
      // keep Spark's auto-created staging schema swap-compatible with
      // the VARCHAR final table (Derby CLOB won't INSERT..SELECT)
      props.setProperty("createTableColumnTypes", "event_type VARCHAR(32)")
      val df = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), vMilli.as("v_milli"))
      JdbcSource.writeViaStaging(df, url, "events_final", "events_staging", props)
      JdbcSource.readIncremental(s, url, "events_final", "event_id",
          low = -1L, high = 1L << 40, maxIntervals = 8, wmType = WatermarkType.Simple)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v_milli")).as("sum_v_milli"))
        .orderBy(col("event_type"))
    }),

    // --- retention policy combination (ref CombineRetentionPolicy
    //     .java:67 INTERSECT + NewestK + TimeBased): survivors = kept
    //     by BOTH policies; output = the deletable set DatasetCleaner
    //     would remove --------------------------------------------------
    "q_retention_deletable" -> ((s, dir) => {
      val v = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val newest = Retention.newestK(v, Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")), 3)
      // o_orderdate is TIMESTAMP_NTZ — an NTZ literal avoids a
      // session-TZ cast in the comparison
      val recent = Retention.newerThan(v, "o_orderdate",
        lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
      val survivors = Retention.keepIntersect(Seq(newest, recent))
      Retention.deletable(v, survivors)
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // --- publish + catalog registration (ref HiveRegistrationPublisher
    //     -> HiveRegister): staged partitioned write -> atomic publish
    //     -> register + RECOVER PARTITIONS -> read back BY NAME --------
    "q_catalog_publish" -> ((s, dir) => {
      val tmp = tmpDir("graft_cat")
      val spec = SinkSpec(s"$tmp/staging", s"$tmp/out", partitionBy = Seq("event_type"))
      val pub = new Publisher(s.sparkContext.hadoopConfiguration)
      pub.writeStaged(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("value"), col("event_type")),
        spec)
      s.sql("DROP TABLE IF EXISTS graft_cat_events") // fresh location each run
      new CatalogPublisher(s).publishAndRegister(pub, spec, "graft_cat_events")
      s.table("graft_cat_events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(vMilli).as("sum_v_milli"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // --- multi-dataset finder + time-aware selection + replication
    //     (ref CopyableGlobDatasetFinder + TimeAwareRecursiveCopyable
    //     Dataset.java:43-80): orders laid out as dataset-per-status /
    //     version-per-month; glob discovery, version window [1996,
    //     1997), layout-preserving FsCopy of just those versions, read
    //     back the REPLICA; oracle filters the source table -----------
    "q_dataset_finder" -> ((s, dir) => {
      val tmp = tmpDir("graft_dsf")
      // dataset-per-status / version-per-year layout; repartition on
      // the partition cols => one file per version dir
      t(s, dir, "orders")
        .withColumn("year_key", expr("substr(cast(o_orderdate as string), 1, 4)"))
        .repartition(col("o_orderstatus"), col("year_key"))
        .write.partitionBy("o_orderstatus", "year_key").parquet(s"$tmp/root")
      val datasets = DatasetFinder.findDatasets(s, s"$tmp/root/o_orderstatus=*")
      val selected = DatasetFinder.inWindow(
          DatasetFinder.versions(s, datasets), "'year_key='yyyy",
          lit("1996-01-01 00:00:00").cast("timestamp"),
          lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(col("dataset"), col("version"), col("path"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      val plan = DatasetFinder.planCopies(s, selected, s"$tmp/dest", splitSize = 256L * 1024)
      FsCopy.execute(plan)
      s.read.parquet(s"$tmp/dest")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("year_key")).as("n_years"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- REST paged extractor end-to-end (ref RestApiExtractor.java:
    //     232-238 cursor paging, :172 max-watermark probe): probe the
    //     high watermark, fan (0, high] into 8 page chains (one task
    //     each), walk pages of 100 with a transient failure planted at
    //     page 2 (retried), parse via from_json; the oracle recomputes
    //     the deterministic feed with range() ---------------------------
    "q_rest_paged" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import graft.sources.RestSource
      val client = new RestSource.DeterministicFeed(feedHigh = 5000,
        failFirstAttemptAtPage = Set(2))
      val high = RestSource.maxWatermark(client, "gate_events", "id", 0)
        .getOrElse(sys.error("max watermark probe failed"))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      RestSource.readIncremental(s, client, "gate_events", "id",
          low = 0, high = high, maxIntervals = 8, schema = schema,
          pageSize = 100, maxRetries = 3)
        .orderBy(col("id"))
    }),

    // --- cross-database table replication (ref HiveCopyEntityHelper):
    //     register a partitioned table in one database, copy data +
    //     definition + partitions into another, read the REPLICA by
    //     name ----------------------------------------------------------
    "q_table_copy" -> ((s, dir) => {
      val tmp = tmpDir("graft_tc")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_src")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_dst")
      s.sql("DROP TABLE IF EXISTS graft_src.gate_ev")
      s.sql("DROP TABLE IF EXISTS graft_dst.gate_ev_copy")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.partitionBy("event_type").parquet(s"$tmp/src")
      new CatalogPublisher(s).register(
        SinkSpec(s"$tmp/stg", s"$tmp/src", partitionBy = Seq("event_type")),
        "graft_src.gate_ev")
      graft.sink.TableCopy.copyTable(s, "graft_src.gate_ev",
        "graft_dst.gate_ev_copy", s"$tmp/dst")
      s.table("graft_dst.gate_ev_copy")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(vMilli).as("sum_v_milli"),
          max(col("user_id")).as("max_user"))
        .orderBy(col("event_type"))
    }),

    // --- async lookup-join enrichment (ref AsyncHttpJoinConverter):
    //     bounded in-flight batched client calls; the fake client
    //     computes a pure function the oracle replays in SQL -----------
    "q_async_enrich" -> ((s, dir) => {
      val client: Seq[String] => Map[String, String] = keys =>
        keys.map(k => k -> ((k.toLong * 2654435761L) % 1000).toString).toMap
      AsyncEnrich.enrich(
          t(s, dir, "events").select(col("event_id"), col("user_id")),
          "user_id", "enriched", client, batchSize = 500)
        .select(col("event_id"), col("enriched").cast("long").as("enrich_v"))
        .orderBy(col("event_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_quality_policies" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM events WHERE value <= 190 AND user_id % 7 <> 0
        |GROUP BY event_type
        |UNION ALL
        |SELECT '_quarantined' AS event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM events WHERE user_id % 7 = 0
        |ORDER BY event_type""".stripMargin,

    "q_compaction_e2e" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber DESC, l_partkey DESC, l_quantity DESC) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q_fscopy_verify" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_jdbc_staging" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_retention_deletable" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |), newest AS (
        |  SELECT * FROM v QUALIFY row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) <= 3
        |), recent AS (
        |  SELECT * FROM v WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
        |), survivors AS (
        |  SELECT * FROM newest INTERSECT SELECT * FROM recent
        |)
        |SELECT * FROM v EXCEPT SELECT * FROM survivors
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_catalog_publish" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_async_enrich" ->
      """SELECT event_id, (user_id * 2654435761) % 1000 AS enrich_v
        |FROM events ORDER BY event_id""".stripMargin,

    // the deterministic feed replayed: ids (0, 5000], v = (id*K) % 1000
    "q_rest_paged" ->
      """SELECT range AS id, (range * 2654435761) % 1000 AS v
        |FROM range(1, 5001) ORDER BY id""".stripMargin,

    "q_table_copy" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
        |  MAX(user_id) AS max_user
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_dataset_finder" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  COUNT(DISTINCT strftime(o_orderdate, '%Y')) AS n_years,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
