package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Foreign-table read fuzz: [[IcebergMeta.read]] against metadata
  * shapes OTHER engines write (synthesized by the independent
  * [[ForeignIceberg]] writer) — identity specs on date/timestamptz/
  * long/string sources, bucket/truncate transforms, unpartitioned
  * specs, non-zero spec/schema ids, multi-element `schemas` arrays,
  * snapshots without the optional `schema-id`, all three file_path
  * scheme forms, manifests with every OPTIONAL data_file field
  * omitted. The invariant under every shape: read() is loud-or-
  * correct — a partition-filtered read returns EXACTLY the matching
  * rows when the spec's value serialization is decodable (long/int/
  * string/date identity) and ALL rows when it is not (timestamptz,
  * bucket, truncate, unpartitioned) — never a silently pruned subset.
  */
class IcebergForeignSpec extends graft.SparkSpec {

  private def data(): DataFrame = {
    import spark.implicits._
    (0L until 60L).map { id =>
      (id, id % 3,
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(id % 3)),
        java.sql.Timestamp.valueOf(java.time.LocalDateTime
          .of(2024, 1, 1, (id % 3).toInt, 0, 0)),
        s"cat${id % 3}x", id * 7)
    }.toDF("id", "grp", "day", "ts", "cat", "v")
  }

  private def sums(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(col("v"))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("date-identity specs prune EXACTLY; never garbage-decode") {
    val root = ForeignIceberg.write(spark, tmpDir("fi_date"), data(),
      Some("day"))
    assert(sums(IcebergMeta.read(spark, root)) === sums(data()))
    val picked = IcebergMeta.read(spark, root,
      partitions = Some(Seq("2024-01-02")))
    assert(sums(picked) === sums(data().filter(col("grp") === 1)))
    // and the filter column survives with the right values
    assert(picked.select(col("day")).distinct().collect()
      .map(_.getDate(0).toString).toSeq === Seq("2024-01-02"))
  }

  test("long- and string-identity specs prune exactly too") {
    val rootL = ForeignIceberg.write(spark, tmpDir("fi_long"), data(),
      Some("grp"), ForeignIceberg.Shape(specId = 2))
    assert(sums(IcebergMeta.read(spark, rootL,
      partitions = Some(Seq("0", "2")))) ===
      sums(data().filter(col("grp") =!= 1)))
    val rootS = ForeignIceberg.write(spark, tmpDir("fi_str"), data(),
      Some("cat"))
    assert(sums(IcebergMeta.read(spark, rootS,
      partitions = Some(Seq("cat1x")))) ===
      sums(data().filter(col("grp") === 1)))
  }

  test("undecodable specs NEVER prune: timestamptz, bucket, truncate, unpartitioned") {
    val shapes = Seq(
      ("ts", ForeignIceberg.Shape()),                       // timestamptz id
      ("grp", ForeignIceberg.Shape(transform = "bucket[4]")),
      ("cat", ForeignIceberg.Shape(transform = "truncate[3]")),
      ("grp", ForeignIceberg.Shape(transform = "")))        // unpartitioned
    shapes.zipWithIndex.foreach { case ((pc, shape), i) =>
      val root = ForeignIceberg.write(spark, tmpDir(s"fi_cons$i"),
        data(), Some(pc), shape)
      // a filter that would "match" nothing decodable must keep ALL
      assert(sums(IcebergMeta.read(spark, root,
        partitions = Some(Seq("2024-01-02", "1", "cat")))) ===
        sums(data()), s"shape $i pruned rows it cannot decode")
    }
  }

  test("schema/spec-id and path-form fuzz: every combination reads whole") {
    val combos = for {
      pathForm <- Seq("plain", "file", "file3")
      specId <- Seq(0, 7)
      (schemaId, hist) <- Seq((0, false), (3, true))
      snapSchemaId <- Seq(true, false)
    } yield ForeignIceberg.Shape(specId = specId, schemaId = schemaId,
      pathForm = pathForm, historicalSchema = hist,
      snapshotSchemaId = snapSchemaId)
    combos.zipWithIndex.foreach { case (shape, i) =>
      val root = ForeignIceberg.write(spark, tmpDir(s"fi_fuzz$i"),
        data(), Some("day"), shape)
      val got = IcebergMeta.read(spark, root)
      // reads under the CURRENT schema (never the narrower historical
      // one), full row set, exact prune still works
      assert(got.columns.toSeq ===
        Seq("id", "grp", "day", "ts", "cat", "v"), s"shape $i columns")
      assert(sums(got) === sums(data()), s"shape $i rows")
      assert(sums(IcebergMeta.read(spark, root,
        partitions = Some(Seq("2024-01-01")))) ===
        sums(data().filter(col("grp") === 0)), s"shape $i prune")
    }
  }

  test("foreign POSITION deletes apply: (file, pos) rows vanish, time travel keeps them") {
    // data files sort by all columns, so positions are deterministic:
    // partition ordinal 0 = day 2024-01-01 (ids 0,3,6,9,...), pos 0 ->
    // id 0, pos 3 -> id 9; ordinal 2 = day 2024-01-03 (ids 2,5,8,11..),
    // pos 3 -> id 11
    val root = ForeignIceberg.write(spark, tmpDir("fi_pos"), data(),
      Some("day"), ForeignIceberg.Shape(pathForm = "file"),
      posDeletes = Seq((0, 0L), (0, 3L), (2, 3L)))
    val expect = data().filter(!col("id").isin(0L, 9L, 11L))
    assert(sums(IcebergMeta.read(spark, root)) === sums(expect))
    // partition-pruned read still applies the deletes
    assert(sums(IcebergMeta.read(spark, root,
      partitions = Some(Seq("2024-01-01")))) ===
      sums(expect.filter(col("grp") === 0)))
    // time travel to snapshot 1 pre-dates the delete snapshot
    assert(sums(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      sums(data()))
  }

  test("foreign EQUALITY deletes apply by key columns at a later sequence") {
    import spark.implicits._
    val root = ForeignIceberg.write(spark, tmpDir("fi_eq"), data(),
      Some("day"),
      eqDeletes = Some((Seq(7L, 13L, 26L).toDF("id"), Seq("id"))))
    val expect = data().filter(!col("id").isin(7L, 13L, 26L))
    assert(sums(IcebergMeta.read(spark, root)) === sums(expect))
    assert(sums(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      sums(data()))
    // both kinds together, keys disjoint: ordinal 1 pos 0 -> id 1
    val both = ForeignIceberg.write(spark, tmpDir("fi_both"), data(),
      Some("day"),
      posDeletes = Seq((1, 0L)),
      eqDeletes = Some((Seq(5L).toDF("id"), Seq("id"))))
    assert(sums(IcebergMeta.read(spark, both)) ===
      sums(data().filter(!col("id").isin(1L, 5L))))
  }

  test("multi-entry manifests with RANGE summaries read whole; never pruned") {
    // one manifest covering ALL partitions: summary lower != upper —
    // the shape engines write when a manifest spans partitions. The
    // reader must walk every entry of the multi-file manifest and a
    // partition filter must keep the manifest (range summaries are
    // not prunable), returning ALL rows
    val root = ForeignIceberg.write(spark, tmpDir("fi_range"), data(),
      Some("day"), ForeignIceberg.Shape(rangeSummary = true))
    assert(sums(IcebergMeta.read(spark, root)) === sums(data()))
    assert(sums(IcebergMeta.read(spark, root,
      partitions = Some(Seq("2024-01-02")))) === sums(data()),
      "a range-summary manifest must never be pruned")
  }

  test("partitioned table with RENAMED metadata names prunes AND resolves values") {
    // the imported-table shape: metadata schema (and name-mapping)
    // says docid/score, the id-less parquet files say id/v — the
    // reader must rename-resolve per file AND partition-prune off
    // the manifest summaries in the same read
    val root = ForeignIceberg.write(spark, tmpDir("fi_renpart"), data(),
      Some("day"), ForeignIceberg.Shape(
        metaNames = Map("id" -> "docid", "v" -> "score")))
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq ===
      Seq("docid", "grp", "day", "ts", "cat", "score"))
    assert(cur.filter(col("score").isNull || col("docid").isNull)
      .count() === 0L)
    val r = cur.agg(count(lit(1)), sum(col("score"))).collect().head
    assert((r.getLong(0), r.getLong(1)) === sums(data()))
    val picked = IcebergMeta.read(spark, root,
      partitions = Some(Seq("2024-01-02")))
    val rp = picked.agg(count(lit(1)), sum(col("score"))).collect().head
    assert((rp.getLong(0), rp.getLong(1)) ===
      sums(data().filter(col("grp") === 1)))
  }

  test("a partition filter matching NOTHING returns empty under the table schema") {
    val root = ForeignIceberg.write(spark, tmpDir("fi_none"), data(),
      Some("day"))
    val none = IcebergMeta.read(spark, root,
      partitions = Some(Seq("1999-01-01")))
    assert(none.columns.toSeq === data().columns.toSeq)
    assert(none.count() === 0L)
  }

  test("broken references fail loudly, never silently empty") {
    val root = ForeignIceberg.write(spark, tmpDir("fi_loud"), data(),
      Some("day"))
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.read(spark, root, snapshotId = Some(99L)).count()
    }
    assert(e.getMessage.contains("snapshot 99"))
  }

  test("a v1 table refuses with a clear message, never mis-reads") {
    val root = ForeignIceberg.write(spark, tmpDir("fi_v1"), data(),
      Some("day"))
    // rewrite the metadata claiming format-version 1 (through the
    // Hadoop FS so the local-FS .crc sidecar stays consistent)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(
      s"$root/metadata/v00001.metadata.json")
    val in = hfs.open(mp)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val out = hfs.create(mp, true)
    out.write(txt.replaceFirst("\"format-version\"\\s*:\\s*2",
      "\"format-version\" : 1").getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.read(spark, root).count()
    }
    assert(e.getMessage.contains("format-version 1"))
  }
}
