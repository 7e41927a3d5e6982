package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 operator gates: foreign Iceberg schema-EVOLUTION reads —
  * rename histories (pre-rename data files carrying the OLD column
  * name, with and without parquet footer field ids), legal type
  * promotions (int→long / float→double), and equality-delete files
  * keyed under pre-rename names. The r15 judge's one silent-wrong
  * path: name-resolved reads null-filling a renamed column for every
  * old file.
  */
object OperatorGates18 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries18: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Foreign RENAME / PROMOTION evolution: tables written by the
    //     independent ForeignIceberg.writeHistory — snapshot 1's data
    //     file carries column `old_score` (field id 2), snapshot 2
    //     renames it to `score` (same id). A correct reader surfaces
    //     the old file's VALUES under the current name — the silent
    //     failure mode is 120 nulls. Probe 0 = rename with footer
    //     field ids (engine shape, id-resolved), probe 1 = rename
    //     without ids (unique-historical-name resolution), probe 2 =
    //     time travel to snapshot 1 under ITS schema (old name, no
    //     leakage), probe 3 = int→long + float→double promotion (old
    //     int32/float file read widened under the current schema),
    //     probe 4 = an equality-delete file KEYED UNDER THE PRE-RENAME
    //     name applying to the old file's rows, probe 5 = a
    //     PARTITIONED table whose metadata names differ from the
    //     file columns (name-mapping) — pruning and rename
    //     resolution composing in one read -------------------------
    "q_iceberg_foreign_evolve" -> ((s, dir) => {
      import graft.sink.{ForeignIceberg, IcebergMeta}
      import ForeignIceberg.HistSnap
      import s.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_evolve").toString
      val base = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), (col("doc_id") * 3).as("score"))
        .coalesce(1).localCheckpoint(true)
      val oldPart = base.filter(col("doc_id") < 120)
        .select(col("doc_id"), col("score").as("old_score"))
      val newPart = base.filter(col("doc_id") >= 120)
      def renTable(withIds: Boolean, sub: String): String =
        ForeignIceberg.writeHistory(s, s"$tmp/$sub", Seq(
          HistSnap(oldPart, Map("doc_id" -> 1, "old_score" -> 2),
            parquetFieldIds = withIds),
          HistSnap(newPart, Map("doc_id" -> 1, "score" -> 2),
            parquetFieldIds = withIds)))
      val tIds = renTable(withIds = true, "t_ids")
      val tNo = renTable(withIds = false, "t_noids")
      val tPromo = ForeignIceberg.writeHistory(s, s"$tmp/t_promo", Seq(
        HistSnap(base.filter(col("doc_id") < 120)
          .select(col("doc_id").cast("int").as("doc_id"),
            col("score").cast("float").as("score")),
          Map("doc_id" -> 1, "score" -> 2)),
        HistSnap(newPart.select(col("doc_id"),
          col("score").cast("double").as("score")),
          Map("doc_id" -> 1, "score" -> 2))))
      // delete keys are old_score VALUES of doc_ids 5 and 10; the
      // delete rides sequence 2 so it applies to the seq-1 old file
      val tDel = ForeignIceberg.writeHistory(s, s"$tmp/t_del", Seq(
        HistSnap(oldPart, Map("doc_id" -> 1, "old_score" -> 2),
          parquetFieldIds = false),
        HistSnap(newPart, Map("doc_id" -> 1, "score" -> 2),
          parquetFieldIds = false)),
        eqDelete = Seq(HistSnap(Seq(15L, 30L).toDF("old_score"),
          Map("old_score" -> 2), parquetFieldIds = false)))
      def agg(df: DataFrame, probe: Long): DataFrame = {
        require(df.columns.toSeq.head == "doc_id",
          s"probe $probe: unexpected shape ${df.columns.mkString(",")}")
        val v = df.columns.last
        df.agg(count(lit(1)).as("n"),
          count(col(v)).as("n_score"),
          sum(col(v)).cast("long").as("sum_score"))
          .select(lit(probe).as("probe"), col("n"), col("n_score"),
            col("sum_score"))
      }
      // partitioned × renamed cross-product: metadata (and the
      // name-mapping property) says score, the id-less files say
      // renv, partition pruning and per-file rename resolution must
      // compose in one read
      val tPart = ForeignIceberg.write(s, s"$tmp/t_part",
        base.withColumn("grp", pmod(col("doc_id"), lit(4)))
          .select(col("doc_id"), col("grp"), col("score").as("renv")),
        Some("grp"), ForeignIceberg.Shape(
          metaNames = Map("renv" -> "score")))
      val curIds = IcebergMeta.read(s, tIds)
      require(curIds.columns.toSeq == Seq("doc_id", "score"),
        "rename table current read is not under the renamed schema")
      val snap1 = IcebergMeta.read(s, tIds, snapshotId = Some(1L))
      require(snap1.columns.toSeq == Seq("doc_id", "old_score"),
        "time travel must read snapshot 1 under the PRE-rename schema")
      val promo = IcebergMeta.read(s, tPromo)
      require(promo.schema("doc_id").dataType ==
        org.apache.spark.sql.types.LongType &&
        promo.schema("score").dataType ==
          org.apache.spark.sql.types.DoubleType,
        "promotion table must read under the widened current types")
      val pickedPart = IcebergMeta.read(s, tPart,
        partitions = Some(Seq("1")))
      require(pickedPart.columns.toSeq == Seq("doc_id", "grp", "score"),
        "partitioned rename read is not under the metadata names")
      val p5 = pickedPart
        .agg(count(lit(1)).as("n"), count(col("score")).as("n_score"),
          sum(col("score")).cast("long").as("sum_score"))
        .select(lit(5L).as("probe"), col("n"), col("n_score"),
          col("sum_score"))
      agg(curIds, 0L)
        .unionByName(agg(IcebergMeta.read(s, tNo), 1L))
        .unionByName(agg(snap1, 2L))
        .unionByName(agg(promo, 3L))
        .unionByName(agg(IcebergMeta.read(s, tDel), 4L))
        .unionByName(p5)
        .orderBy(col("probe"))
    }))

  def oracleSql18: Map[String, String] = Map(

    // probes 0/1 see all 200 rows with NO nulls in the renamed
    // column (the silent failure mode is n_score = 80); probe 2 the
    // 120 pre-rename rows; probe 3 the widened values (identical
    // sums — int→long and float→double promotions are exact here);
    // probe 4 everything minus the two pre-rename-keyed deletes
    "q_iceberg_foreign_evolve" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id * 3 AS score FROM documents
        |  WHERE doc_id < 200),
        |o AS (SELECT * FROM d WHERE doc_id < 120),
        |full_t AS (
        |  SELECT count(*) AS n, count(score) AS n_score,
        |    sum(score) AS sum_score FROM d),
        |old_t AS (
        |  SELECT count(*) AS n, count(score) AS n_score,
        |    sum(score) AS sum_score FROM o),
        |del_t AS (
        |  SELECT count(*) AS n, count(score) AS n_score,
        |    sum(score) AS sum_score FROM d
        |  WHERE doc_id NOT IN (5, 10)),
        |part_t AS (
        |  SELECT count(*) AS n, count(score) AS n_score,
        |    sum(score) AS sum_score FROM d
        |  WHERE doc_id % 4 = 1),
        |u AS (
        |  SELECT 0 AS probe, n, n_score, sum_score FROM full_t
        |  UNION ALL SELECT 1, n, n_score, sum_score FROM full_t
        |  UNION ALL SELECT 2, n, n_score, sum_score FROM old_t
        |  UNION ALL SELECT 3, n, n_score, sum_score FROM full_t
        |  UNION ALL SELECT 4, n, n_score, sum_score FROM del_t
        |  UNION ALL SELECT 5, n, n_score, sum_score FROM part_t)
        |SELECT CAST(probe AS BIGINT) AS probe, CAST(n AS BIGINT) AS n,
        |  CAST(n_score AS BIGINT) AS n_score,
        |  CAST(sum_score AS BIGINT) AS sum_score
        |FROM u ORDER BY probe""".stripMargin)
}
