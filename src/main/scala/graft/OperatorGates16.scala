package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 operator gates: Iceberg partition-spec evolution (the one
  * interop edge the r13 reader still threw on).
  */
object OperatorGates16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries16: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Iceberg PARTITION-SPEC EVOLUTION (spec v2): snapshot 1
    //     mirrors under spec 0 = identity(shard); snapshot 2 rewrites
    //     shard 1 and mirrors it under a NEW identity(region) spec
    //     (spec 2, fresh partition field-id) while the untouched
    //     manifests are carried under spec 0 — the mixed-spec
    //     manifest list a foreign writer's spec change produces. The
    //     independent reader resolves each manifest's partition type
    //     through its own partition_spec_id (probe 1: time travel to
    //     the pre-evolution snapshot; probe 2: current mixed-spec
    //     snapshot; probe 3: partition pruning across BOTH spec
    //     domains at once — native "0" and evolved "11"). Oracle
    //     replays all three visibilities --------------------------
    "q_iceberg_spec_evolution" -> ((s, dir) => {
      import graft.sink.{IcebergMeta, ShardedTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_specevo").toString
      val table = new ShardedTable(s"$tmp/t", "shard",
        s.sparkContext.hadoopConfiguration)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 240)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
          (lit(10) + pmod(col("doc_id"), lit(4))).cast("long").as("region"))
      val v1 = table.commit(docs, touched = Seq("0", "1", "2", "3"))
      IcebergMeta.mirror(s, table, v1) // spec 0: identity(shard)
      // evolution: shard 1 rewritten (ids shifted so visibility is
      // provable), its new manifest rides identity(region) — region
      // is shard-constant, satisfying the single-valued-file rule
      val v2 = table.commit(
        docs.filter(col("shard") === 1)
          .withColumn("doc_id", col("doc_id") + 1000),
        touched = Seq("1"))
      IcebergMeta.mirror(s, table, v2, specPartCol = Some("region"))
      def probe(snap: Option[Long], parts: Option[Seq[String]], label: Int) =
        IcebergMeta.read(s, s"$tmp/t", snapshotId = snap,
            partitions = parts)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
          .select(lit(label.toLong).as("probe"), col("shard"),
            col("n"), col("sum_id"))
      probe(Some(1L), None, 1)
        .unionByName(probe(None, None, 2))
        .unionByName(probe(None, Some(Seq("0", "11")), 3))
        .orderBy(col("probe"), col("shard"))
    }))

  def oracleSql16: Map[String, String] = Map(

    "q_iceberg_spec_evolution" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 4 AS shard FROM documents
        |  WHERE doc_id < 240),
        |d2 AS (
        |  SELECT CASE WHEN shard = 1 THEN doc_id + 1000 ELSE doc_id END
        |    AS doc_id, shard
        |  FROM d),
        |p1 AS (
        |  SELECT CAST(1 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d GROUP BY shard),
        |p2 AS (
        |  SELECT CAST(2 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d2 GROUP BY shard),
        |p3 AS (
        |  SELECT CAST(3 AS BIGINT) AS probe, shard,
        |    count(*) AS n, sum(doc_id) AS sum_id
        |  FROM d2 WHERE shard IN (0, 1) GROUP BY shard)
        |SELECT probe, CAST(shard AS BIGINT) AS shard,
        |  CAST(n AS BIGINT) AS n, CAST(sum_id AS BIGINT) AS sum_id
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |  UNION ALL SELECT * FROM p3) u
        |ORDER BY probe, shard""".stripMargin)
}
