package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Foreign schema-EVOLUTION read fuzz: rename and type-promotion
  * histories written by [[ForeignIceberg.writeHistory]] (snapshots
  * whose data files carry OLD column names / NARROWER types, with and
  * without parquet field ids in the footers). The invariant:
  * [[IcebergMeta.read]] is loud-or-correct — a renamed column's
  * pre-rename values come back under the CURRENT name (field-id /
  * unique-historical-name resolution), a promoted column's int32
  * values come back widened, and the two shapes name resolution
  * genuinely cannot attribute (a resurrected name or a name swap,
  * both without footer ids) fail loudly — never silent nulls, never
  * a mis-bound column.
  */
class IcebergEvolveSpec extends graft.SparkSpec {

  private def df1: DataFrame = {
    import spark.implicits._
    (0L until 30L).map(i => (i, i * 7)).toDF("id", "a")
  }
  private def df2renamed: DataFrame = {
    import spark.implicits._
    (30L until 50L).map(i => (i, i * 7)).toDF("id", "b")
  }

  private def renameTable(withIds: Boolean): String =
    ForeignIceberg.writeHistory(spark, tmpDir("fi_ren"), Seq(
      ForeignIceberg.HistSnap(df1,
        Map("id" -> 1, "a" -> 2), parquetFieldIds = withIds),
      ForeignIceberg.HistSnap(df2renamed,
        Map("id" -> 1, "b" -> 2), parquetFieldIds = withIds)))

  private def checkRename(root: String): Unit = {
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "b"))
    // the old file's `a` values MUST surface under `b` — the silent
    // failure mode is 30 nulls here
    assert(cur.filter(col("b").isNull).count() === 0L)
    val r = cur.agg(count(lit(1)), sum(col("b"))).collect().head
    assert(r.getLong(0) === 50L)
    assert(r.getLong(1) === (0L until 50L).map(_ * 7).sum)
    // time travel reads snapshot 1 under ITS schema: column `a`
    val old = IcebergMeta.read(spark, root, snapshotId = Some(1L))
    assert(old.columns.toSeq === Seq("id", "a"))
    assert(old.filter(col("a").isNull).count() === 0L)
    assert(old.count() === 30L)
  }

  test("rename evolution WITH parquet field ids reads correct values") {
    checkRename(renameTable(withIds = true))
  }

  test("rename evolution WITHOUT footer ids resolves by unique historical name") {
    checkRename(renameTable(withIds = false))
  }

  test("int->long and float->double promotion reads widened values") {
    import spark.implicits._
    val s1 = Seq((0, 1.5f), (1, 2.5f)).toDF("i", "f")
    val s2 = Seq((2L, 3.5d), (3L, 4.5d)).toDF("i", "f")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_promo"), Seq(
      ForeignIceberg.HistSnap(s1, Map("i" -> 1, "f" -> 2)),
      ForeignIceberg.HistSnap(s2, Map("i" -> 1, "f" -> 2))))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.schema("i").dataType === LongType)
    assert(cur.schema("f").dataType === DoubleType)
    val rows = cur.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).toSeq
    assert(rows === Seq((0L, 1.5), (1L, 2.5), (2L, 3.5), (3L, 4.5)))
    // time travel reads the narrow snapshot under the narrow schema
    val old = IcebergMeta.read(spark, root, snapshotId = Some(1L))
    assert(old.schema("i").dataType === IntegerType)
    assert(old.schema("f").dataType === FloatType)
  }

  test("rename + promotion combined, mixed footer-id snapshots") {
    import spark.implicits._
    val s1 = Seq((0, 10L), (1, 11L)).toDF("id", "old_v")
    val s2 = Seq((2L, 12L), (3L, 13L)).toDF("id", "v")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_mix"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "old_v" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "v" -> 2))))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "v"))
    val rows = cur.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows === Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("resurrected name without footer ids resolves via the adding snapshot's schema") {
    import spark.implicits._
    // `a` owned by id 2 in schema 0, then dropped and re-added as
    // id 3: per-snapshot schema-ids attribute each file's `a` — the
    // old file's belongs to field 2 (null-fills under current field
    // 3), the new file's to field 3
    val s1 = Seq((0L, 10L)).toDF("id", "a")
    val s2 = Seq((1L, 20L)).toDF("id", "a")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_res"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "a" -> 3),
        parquetFieldIds = false)))
    val rows = IcebergMeta.read(spark, root).collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows === Seq((0L, -1L), (1L, 20L)))
  }

  test("resurrected name with NO schema attribution at all fails LOUDLY") {
    import spark.implicits._
    // no footer ids AND no per-snapshot schema-ids: a footer carrying
    // `a` cannot be attributed to field 2 or 3 — refuse, never guess
    val s1 = Seq((0L, 10L)).toDF("id", "a")
    val s2 = Seq((1L, 20L)).toDF("id", "a")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_resx"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "a" -> 3),
        parquetFieldIds = false)),
      snapshotSchemaIds = false)
    val e = intercept[Exception] {
      IcebergMeta.read(spark, root).collect()
    }
    assert(e.getMessage.contains("several field ids") ||
      e.getMessage.contains("ambiguous"))
  }

  test("resurrected name WITH footer ids reads correctly") {
    import spark.implicits._
    val s1 = Seq((0L, 10L)).toDF("id", "a")
    val s2 = Seq((1L, 20L)).toDF("id", "a")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_res2"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "a" -> 2)),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "a" -> 3))))
    val cur = IcebergMeta.read(spark, root)
    // current schema's `a` is field 3 — snapshot 1's file has no
    // field 3 (its `a` is field 2), so it null-fills THERE, which is
    // the spec behavior for a dropped-then-re-added column
    val rows = cur.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows === Seq((0L, -1L), (1L, 20L)))
  }

  test("name SWAP without footer ids resolves via the adding snapshot's schema") {
    import spark.implicits._
    // schema 0: (x id 2, y id 3); schema 1 swaps the names keeping
    // ids — each file's columns are attributed under the schema its
    // snapshot recorded, so the old file's `x` IS field 2 (current
    // name `y`) and its `y` IS field 3 (current name `x`)
    val s1 = Seq((0L, 1L, 2L)).toDF("id", "x", "y")
    val s2 = Seq((1L, 3L, 4L)).toDF("id", "y", "x")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_swap"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "x" -> 2, "y" -> 3),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "y" -> 2, "x" -> 3),
        parquetFieldIds = false)))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "y", "x"))
    val rows = cur.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(rows === Seq((0L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("name SWAP with NO schema attribution fails loudly") {
    import spark.implicits._
    val s1 = Seq((0L, 1L, 2L)).toDF("id", "x", "y")
    val s2 = Seq((1L, 3L, 4L)).toDF("id", "y", "x")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_swapx"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "x" -> 2, "y" -> 3),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "y" -> 2, "x" -> 3),
        parquetFieldIds = false)),
      snapshotSchemaIds = false)
    val e = intercept[Exception] {
      IcebergMeta.read(spark, root).collect()
    }
    assert(e.getMessage.contains("historical names") ||
      e.getMessage.contains("several field ids"))
  }

  test("name SWAP with footer ids reads correctly") {
    import spark.implicits._
    val s1 = Seq((0L, 1L, 2L)).toDF("id", "x", "y")
    val s2 = Seq((1L, 3L, 4L)).toDF("id", "y", "x")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_swap2"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "x" -> 2, "y" -> 3)),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "y" -> 2, "x" -> 3))))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "y", "x"))
    val rows = cur.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // old file: field 2 was named x (value 1), field 3 named y (2);
    // current names field 2 -> y, field 3 -> x
    assert(rows === Seq((0L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("equality deletes keyed under the PRE-rename name resolve and apply") {
    import spark.implicits._
    // snapshot 1 writes (id, a); snapshot 2 renames a->b; the delete
    // file was written by a pre-rename engine: its key column is `a`
    // (field 2), no footer ids — the reader must resolve the delete
    // key to the current `b` and remove the rows from the OLD file
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_rendel"), Seq(
      ForeignIceberg.HistSnap(df1, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(df2renamed, Map("id" -> 1, "b" -> 2),
        parquetFieldIds = false)),
      eqDelete = Seq(ForeignIceberg.HistSnap(
        Seq(7L * 7, 13L * 7).toDF("a"), Map("a" -> 2),
        parquetFieldIds = false)))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.count() === 48L)
    assert(cur.filter(col("b").isin(49L, 91L)).count() === 0L)
    assert(cur.filter(col("b").isNull).count() === 0L)
  }

  test("native mirror DROP evolution is opt-in; time travel keeps the column; re-add null-fills old data") {
    val root = tmpDir("mirror_drop")
    val t = new ShardedTable(root, "part",
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val v1 = t.commit(Seq((0L, 1L, "a"), (1L, 2L, "b"))
      .toDF("part", "k", "v"), touched = Seq("0", "1"))
    IcebergMeta.mirror(spark, t, v1)
    // default: a delta lacking `v` is an old-shape commit, NOT a drop
    val v2 = t.commit(Seq((0L, 10L)).toDF("part", "k"),
      touched = Seq("0"))
    IcebergMeta.mirror(spark, t, v2)
    assert(IcebergMeta.read(spark, root).columns.toSeq ===
      Seq("part", "k", "v"))
    // opt-in: the same shape WITH allowDrops drops `v` from current
    val v3 = t.commit(Seq((0L, 20L)).toDF("part", "k"),
      touched = Seq("0"))
    IcebergMeta.mirror(spark, t, v3, allowDrops = true)
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("part", "k"))
    assert(cur.count() === 2L)
    // time travel still reads `v` under snapshot 1's schema
    val old = IcebergMeta.read(spark, root, snapshotId = Some(1L))
    assert(old.columns.toSeq === Seq("part", "k", "v"))
    assert(old.filter(col("v").isNull).count() === 0L)
    // re-adding the NAME mints a fresh field id: the surviving
    // pre-drop file's `v` data belongs to the DROPPED field and must
    // null-fill under the new one, never resurface
    val v4 = t.commit(Seq((0L, 30L, "Z")).toDF("part", "k", "v"),
      touched = Seq("0"))
    IcebergMeta.mirror(spark, t, v4)
    val cur2 = IcebergMeta.read(spark, root)
    assert(cur2.columns.toSeq === Seq("part", "k", "v"))
    val rows = cur2.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) "-" else r.getString(2))).sortBy(_._2).toSeq
    assert(rows === Seq((1L, 2L, "-"), (0L, 30L, "Z")))
  }

  test("one manifest mixing delete files keyed on DIFFERENT columns applies each by ITS ids") {
    import spark.implicits._
    // equality_ids is per data_file: file A deletes by value (field
    // 2), file B by id (field 1) — a reader that applies A's ids to
    // B null-keys B's rows and silently skips its deletes
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_mixdel"), Seq(
      ForeignIceberg.HistSnap(df1, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(df2renamed, Map("id" -> 1, "b" -> 2),
        parquetFieldIds = false)),
      eqDelete = Seq(
        ForeignIceberg.HistSnap(Seq(7L * 7).toDF("a"), Map("a" -> 2),
          parquetFieldIds = false),
        ForeignIceberg.HistSnap(Seq(3L, 11L).toDF("id"), Map("id" -> 1),
          parquetFieldIds = false)))
    val cur = IcebergMeta.read(spark, root)
    // dropped: id 7 (by a=49), ids 3 and 11 (by id) — all from the
    // pre-rename file; 30 - 3 + 20 = 47 rows survive
    assert(cur.count() === 47L)
    assert(cur.filter(col("id").isin(3L, 7L, 11L)).count() === 0L)
    assert(cur.filter(col("b").isNull).count() === 0L)
  }

  test("manifest REWRITE keeps per-entry sequences: older files still receive deletes") {
    import spark.implicits._
    // RewriteManifests shape: ONE manifest (list seq = 2) carries both
    // data files as EXISTING entries with their ORIGINAL seqs (1, 2);
    // an equality delete at seq 2 must still remove id 0 from the
    // seq-1 file while the seq-2 file's id 0 row SURVIVES (deletes
    // apply strictly older). A reader keying files off the LIST seq
    // shields the old file and silently under-deletes.
    val s1 = Seq((0L, 10L), (1L, 11L)).toDF("id", "v")
    val s2 = Seq((0L, 99L), (2L, 12L)).toDF("id", "v")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_rw"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "v" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "v" -> 2),
        parquetFieldIds = false)),
      eqDelete = Seq(ForeignIceberg.HistSnap(Seq(0L).toDF("id"),
        Map("id" -> 1), parquetFieldIds = false)),
      compactManifests = true)
    val rows = IcebergMeta.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(t => (t._1, t._2))
      .toSeq
    assert(rows === Seq((0L, 99L), (1L, 11L), (2L, 12L)))
  }

  test("branch/tag refs select snapshots; unknown refs fail loudly") {
    import spark.implicits._
    val s1 = Seq((0L, 10L)).toDF("id", "v")
    val s2 = Seq((1L, 20L)).toDF("id", "v")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_refs"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "v" -> 2)),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "v" -> 2))),
      refs = Map("v1-audit" -> 1L))
    assert(IcebergMeta.read(spark, root, ref = Some("v1-audit"))
      .count() === 1L)
    assert(IcebergMeta.read(spark, root, ref = Some("main"))
      .count() === 2L)
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.read(spark, root, ref = Some("nope")).count()
    }
    assert(e.getMessage.contains("ref 'nope'"))
  }

  test("a rewrite with NO deletes plans ONE scan, not one per original seq") {
    import spark.implicits._
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_rwplan"), Seq(
      ForeignIceberg.HistSnap(Seq((0L, 1L)).toDF("id", "v"),
        Map("id" -> 1, "v" -> 2)),
      ForeignIceberg.HistSnap(Seq((1L, 2L)).toDF("id", "v"),
        Map("id" -> 1, "v" -> 2)),
      ForeignIceberg.HistSnap(Seq((2L, 3L)).toDF("id", "v"),
        Map("id" -> 1, "v" -> 2))),
      compactManifests = true)
    val df = IcebergMeta.read(spark, root)
    assert(df.count() === 3L)
    // three distinct original seqs but one delete-applicability class
    // (no deletes) — the scan must not shatter per seq
    assert(df.queryExecution.optimizedPlan.collectLeaves().length === 1)
  }

  test("foreign DROP history: current read lacks the column, time travel keeps it") {
    import spark.implicits._
    val s1 = Seq((0L, 1L, 9L), (1L, 2L, 8L)).toDF("id", "a", "b")
    val s2 = Seq((2L, 3L)).toDF("id", "a")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_drop"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "a" -> 2, "b" -> 3),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false)))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "a"))
    assert(cur.count() === 3L)
    assert(cur.filter(col("a").isNull).count() === 0L)
    val old = IcebergMeta.read(spark, root, snapshotId = Some(1L))
    assert(old.columns.toSeq === Seq("id", "a", "b"))
    assert(old.filter(col("b").isNull).count() === 0L)
  }

  test("rename known ONLY via schema.name-mapping.default resolves") {
    import spark.implicits._
    // the standard imported-parquet shape: ONE metadata schema naming
    // the field `b`, data files (no footer ids) carrying `a`, and the
    // name-mapping property declaring both names for field 2 — the
    // spec's mechanism for exactly this case
    val s1 = Seq((0L, 10L), (1L, 11L)).toDF("id", "a")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_nm"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "a" -> 2),
        parquetFieldIds = false, metaNames = Map("a" -> "b"))),
      nameMapping = Some(Seq(1 -> Seq("id"), 2 -> Seq("b", "a"))))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "b"))
    val rows = cur.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows === Seq((0L, 10L), (1L, 11L)))
  }

  test("add-only history keeps the fast path: no resolution needed") {
    import spark.implicits._
    val s1 = Seq((0L, 10L)).toDF("id", "v")
    val s2 = Seq((1L, 20L, "x")).toDF("id", "v", "tag")
    val root = ForeignIceberg.writeHistory(spark, tmpDir("fi_add"), Seq(
      ForeignIceberg.HistSnap(s1, Map("id" -> 1, "v" -> 2),
        parquetFieldIds = false),
      ForeignIceberg.HistSnap(s2, Map("id" -> 1, "v" -> 2, "tag" -> 3),
        parquetFieldIds = false)))
    val cur = IcebergMeta.read(spark, root)
    val rows = cur.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) "-" else r.getString(2))).sortBy(_._1).toSeq
    assert(rows === Seq((0L, 10L, "-"), (1L, 20L, "x")))
  }
}
