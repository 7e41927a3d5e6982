package graft.sink

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Iceberg v2 interop: snapshot mirroring of ShardedTable commits,
  * round-trip through the metadata-only reader, time travel, manifest
  * pruning, and byte-level layout pinning against the published
  * Apache Iceberg Table Spec v2 (file names, Avro field-ids, file
  * metadata keys, single-value bound serialization).
  */
class IcebergMetaSpec extends graft.SparkSpec {

  private def fixture(): (ShardedTable, String) = {
    val root = tmpDir("iceberg")
    val t = new ShardedTable(root, "part",
      spark.sparkContext.hadoopConfiguration)
    (t, root)
  }

  private def df(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("part", "k", "v")
  }

  test("mirrored snapshots round-trip through the metadata-only reader") {
    val (t, root) = fixture()
    val v1 = t.commit(df(Seq((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c"),
      (2L, 4L, "d"))), touched = Seq("0", "1", "2"))
    IcebergMeta.mirror(spark, t, v1)
    val v2 = t.commit(df(Seq((1L, 30L, "C"), (1L, 31L, "D"))),
      touched = Seq("1"))
    IcebergMeta.mirror(spark, t, v2)

    def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
      d.select(col("part"), col("k"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq

    // current snapshot == native current
    assert(rows(IcebergMeta.read(spark, root)) ===
      rows(t.readCurrent(spark)))
    // time travel to snapshot 1 == native version 1
    assert(rows(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      rows(t.read(spark, 1L)))
    // partition pruning never opens unrelated manifests
    assert(rows(IcebergMeta.read(spark, root,
      partitions = Some(Seq("1")))) ===
      Seq((1L, 30L, "C"), (1L, 31L, "D")))
    // snapshot log carries both snapshots with increasing sequence nums
    val snaps = IcebergMeta.snapshots(spark, root)
    assert(snaps.map(_.snapshotId) === Seq(1L, 2L))
    assert(snaps.map(_.sequenceNumber) === Seq(1L, 2L))
  }

  test("only the touched partition gets a NEW manifest on commit 2") {
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (1L, 2L, "b"))), touched = Seq("0", "1")))
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((1L, 20L, "B"))), touched = Seq("1")))
    val snaps = IcebergMeta.snapshots(spark, root)
    def manifestsOf(listPath: String): Map[String, String] = {
      val p = new org.apache.hadoop.fs.Path(listPath)
      val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
      val st = new org.apache.avro.file.DataFileStream(in,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try {
        val b = Map.newBuilder[String, String]
        while (st.hasNext) {
          val r = st.next()
          val parts = r.get("partitions")
            .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
          val lo = parts.get(0).get("lower_bound")
            .asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](lo.remaining())
          lo.duplicate().get(bytes)
          val v = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toString
          b += v -> r.get("manifest_path").toString
        }
        b.result()
      } finally st.close()
    }
    val m1 = manifestsOf(snaps(0).manifestList)
    val m2 = manifestsOf(snaps(1).manifestList)
    assert(m1.keySet === Set("0", "1") && m2.keySet === Set("0", "1"))
    assert(m2("0") === m1("0"), "untouched partition manifest carried by path")
    assert(m2("1") !== m1("1"), "touched partition got a new manifest")
  }

  test("layout pins: metadata.json, manifest field-ids, file metadata") {
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((7L, 1L, "x"))), touched = Seq("7")))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // version hint + metadata json
    val hint = new org.apache.hadoop.fs.Path(s"$root/metadata/version-hint.text")
    assert(fs.exists(hint))
    val md = new com.fasterxml.jackson.databind.ObjectMapper().readTree {
      val in = fs.open(new org.apache.hadoop.fs.Path(
        s"$root/metadata/v00001.metadata.json"))
      try in.readAllBytes() finally in.close()
    }
    assert(md.get("format-version").asInt() === 2)
    assert(md.get("current-schema-id").asInt() === 0)
    val fields = md.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("name").asText()) === Seq("part", "k", "v"))
    assert(fields.map(_.get("id").asInt()) === Seq(1, 2, 3))
    assert(fields.map(_.get("type").asText()) === Seq("long", "long", "string"))
    val spec = md.get("partition-specs").get(0)
    assert(spec.get("spec-id").asInt() === 0)
    val sf = spec.get("fields").get(0)
    assert(sf.get("transform").asText() === "identity")
    assert(sf.get("source-id").asInt() === 1)
    assert(sf.get("field-id").asInt() === 1000)
    assert(md.get("properties").has("schema.name-mapping.default"))
    assert(md.get("current-snapshot-id").asLong() === 1L)
    val snap = md.get("snapshots").get(0)
    assert(snap.get("sequence-number").asLong() === 1L)
    // manifest list avro: spec field names + field-id props + header
    val listPath = new org.apache.hadoop.fs.Path(
      snap.get("manifest-list").asText())
    val lin = listPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration).open(listPath)
    val lst = new org.apache.avro.file.DataFileStream(lin,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val lschema = lst.getSchema
    def fid(s: org.apache.avro.Schema, name: String): Int =
      s.getField(name).getObjectProp("field-id") match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case o => o.toString.toInt
      }
    assert(fid(lschema, "manifest_path") === 500)
    assert(fid(lschema, "manifest_length") === 501)
    assert(fid(lschema, "added_snapshot_id") === 503)
    assert(fid(lschema, "sequence_number") === 515)
    assert(fid(lschema, "content") === 517)
    val entry = lst.next()
    lst.close()
    assert(entry.get("partition_spec_id") === 0)
    assert(entry.get("content") === 0)
    // partition bound: long 7 little-endian
    val parts = entry.get("partitions")
      .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
    val lo = parts.get(0).get("lower_bound").asInstanceOf[java.nio.ByteBuffer]
    val bytes = new Array[Byte](lo.remaining())
    lo.duplicate().get(bytes)
    assert(bytes.toSeq === Seq[Byte](7, 0, 0, 0, 0, 0, 0, 0))
    // the manifest itself: header metadata + entry field-ids
    val mPath = new org.apache.hadoop.fs.Path(
      entry.get("manifest_path").toString)
    val min = mPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration).open(mPath)
    val mst = new org.apache.avro.file.DataFileStream(min,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    assert(new String(mst.getMeta("format-version")) === "2")
    assert(new String(mst.getMeta("content")) === "data")
    assert(new String(mst.getMeta("partition-spec-id")) === "0")
    assert(mst.getMeta("schema") != null)
    val es = mst.getSchema
    assert(fid(es, "status") === 0)
    assert(fid(es, "data_file") === 2)
    val dfS = es.getField("data_file").schema()
    assert(fid(dfS, "file_path") === 100)
    assert(fid(dfS, "record_count") === 103)
    assert(fid(dfS, "content") === 134)
    val me = mst.next()
    mst.close()
    assert(me.get("status") === 1)
    val dataFile = me.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(dataFile.get("file_format").toString === "PARQUET")
    assert(dataFile.get("record_count") === 1L)
    assert(dataFile.get("file_size_in_bytes").asInstanceOf[Long] > 0L)
  }

  test("equality deletes: merge-on-read without rewriting partitions") {
    import spark.implicits._
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"))),
      touched = Seq("0", "1")))
    // delete k in {2, 3} via an equality-delete snapshot
    IcebergMeta.mirrorDeletes(spark, t,
      Seq(2L, 3L).toDF("k"), equalityCols = Seq("k"))
    def ks(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("k").collect().map(_.getLong(0)).sorted.toSeq
    // current snapshot applies the deletes
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 4L))
    // time travel BEFORE the delete still sees everything
    assert(ks(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      Seq(1L, 2L, 3L, 4L))
    // pruned read applies deletes within the partition
    assert(ks(IcebergMeta.read(spark, root,
      partitions = Some(Seq("1")))) === Seq(4L))
    // a LATER data commit is NOT affected by the older delete
    // (equality deletes hit only files with smaller sequence numbers)
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((2L, 2L, "resurrected"))), touched = Seq("2")))
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L, 4L))
    // snapshot log: data, delete, data with increasing sequence nums
    val snaps = IcebergMeta.snapshots(spark, root)
    assert(snaps.map(_.snapshotId) === Seq(1L, 2L, 3L))
  }

  test("position deletes: by (file, pos), later commits outrank") {
    import spark.implicits._
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"))),
      touched = Seq("0", "1")))
    // plan (file, pos) for k in {2, 3} from the current snapshot
    val plan = IcebergMeta.planPositionDeletes(spark, root,
      Seq(2L, 3L).toDF("k"), joinCols = Seq("k"))
    assert(plan.count() == 2)
    IcebergMeta.mirrorPositionDeletes(spark, t, plan)
    def ks(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 4L))
    // time travel BEFORE the delete still sees everything
    assert(ks(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      Seq(1L, 2L, 3L, 4L))
    // a LATER data commit carrying the same key is NOT affected —
    // its files outrank the delete's sequence number (and the
    // position identity names the OLD file anyway)
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((2L, 2L, "resurrected"))), touched = Seq("2")))
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L, 4L))
    // mixed kinds: an equality delete on top of the position delete
    IcebergMeta.mirrorDeletes(spark, t, Seq(4L).toDF("k"),
      equalityCols = Seq("k"))
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L))
  }

  test("position-delete plans carry the manifests' EXACT file_path form") {
    import spark.implicits._
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (1L, 2L, "b"))), touched = Seq("0", "1")))
    val plan = IcebergMeta.planPositionDeletes(spark, root,
      Seq(1L).toDF("k"), joinCols = Seq("k"))
    val planned = plan.select("file_path").collect()
      .map(_.getString(0)).toSet
    // the manifests store file:/p (Path.toString); Spark's _metadata
    // reports file:///p — a foreign reader compares EXACTLY, so the
    // plan must be in the manifests' form, never the _metadata form
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestForm = t.manifest(1L).values.flatMap { d =>
      fs.listStatus(new org.apache.hadoop.fs.Path(d)).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }.toSet
    assert(planned.nonEmpty)
    assert(planned.forall(p => !p.startsWith("file:///")))
    assert(planned.subsetOf(manifestForm))
  }

  test("partition-spec evolution: mixed-spec snapshots read per spec") {
    import spark.implicits._
    val (t, root) = fixture()
    // table partCol "part"; extra column "zone" is part-constant so
    // identity(zone) is single-valued per data file
    val rows = Seq((0L, 1L, "a", 10L), (0L, 2L, "b", 10L),
      (1L, 3L, "c", 11L), (2L, 4L, "d", 12L))
      .toDF("part", "k", "v", "zone")
    IcebergMeta.mirror(spark, t, t.commit(rows,
      touched = Seq("0", "1", "2")))
    // evolve: rewrite part 1 under identity(zone)
    IcebergMeta.mirror(spark, t, t.commit(
      Seq((1L, 30L, "C", 11L)).toDF("part", "k", "v", "zone"),
      touched = Seq("1")), specPartCol = Some("zone"))
    def ks(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L, 4L, 30L))
    assert(ks(IcebergMeta.read(spark, root, snapshotId = Some(1L))) ===
      Seq(1L, 2L, 3L, 4L))
    // pruning decodes each manifest under ITS spec: native "0" and
    // evolved zone "11" prune across both domains at once
    assert(ks(IcebergMeta.read(spark, root,
      partitions = Some(Seq("0", "11")))) === Seq(1L, 2L, 30L))
    // the metadata carries BOTH specs; default points at the new one
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val hint = new org.apache.hadoop.fs.Path(s"$root/metadata/version-hint.text")
    val fs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p); try in.readAllBytes() finally in.close()
    }
    val v = new String(readAll(hint)).trim.toLong
    val md = M.readTree(readAll(new org.apache.hadoop.fs.Path(
      f"$root/metadata/v$v%05d.metadata.json")))
    val specs = md.get("partition-specs").elements().asScala.toSeq
    assert(specs.map(_.get("spec-id").asInt()).sorted == Seq(0, 1, 2))
    assert(md.get("default-spec-id").asInt() == 2)
    assert(md.get("last-partition-id").asInt() == 1001)
    // a FURTHER mirror back under the table spec reuses spec 0 and
    // still carries the evolved manifest by path
    IcebergMeta.mirror(spark, t, t.commit(
      Seq((2L, 40L, "E", 12L)).toDF("part", "k", "v", "zone"),
      touched = Seq("2")))
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L, 30L, 40L))
    // deletes still apply across the evolution
    IcebergMeta.mirrorDeletes(spark, t, Seq(30L).toDF("k"),
      equalityCols = Seq("k"))
    assert(ks(IcebergMeta.read(spark, root)) === Seq(1L, 2L, 40L))
  }

  test("evolution demands single-valued files; foreign specs tolerated") {
    import spark.implicits._
    val (t, root) = fixture()
    // zone VARIES inside part 0 -> identity(zone) must fail loudly;
    // coalesce(1) pins both rows into ONE data file (two files would
    // each be single-valued and legitimately pass)
    val rows = Seq((0L, 1L, "a", 10L), (0L, 2L, "b", 99L))
      .toDF("part", "k", "v", "zone").coalesce(1)
    val v1 = t.commit(rows, touched = Seq("0"))
    val e = intercept[IllegalArgumentException](
      IcebergMeta.mirror(spark, t, v1, specPartCol = Some("zone")))
    assert(e.getMessage.contains("single-valued"))
    // a bucket[16] spec from a foreign writer must not break read():
    // it resolves to "not prunable", never to a throw
    IcebergMeta.mirror(spark, t, v1)
    val hint = new org.apache.hadoop.fs.Path(s"$root/metadata/version-hint.text")
    val fs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p); try in.readAllBytes() finally in.close()
    }
    val v = new String(readAll(hint)).trim.toLong
    val mdPath = new org.apache.hadoop.fs.Path(
      f"$root/metadata/v$v%05d.metadata.json")
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.readTree(readAll(mdPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specs = md.get("partition-specs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    specs.add(M.readTree("""{"spec-id":7,"fields":[
      {"name":"k_bucket","transform":"bucket[16]","source-id":2,
       "field-id":1007}]}""".replace("\n", "")))
    val out = fs.create(mdPath, true)
    out.write(M.writeValueAsBytes(md)); out.close()
    assert(IcebergMeta.read(spark, root).count() == 2L)
    assert(IcebergMeta.read(spark, root,
      partitions = Some(Seq("0"))).count() == 2L)
  }

  test("snapshot summaries carry truthful counters") {
    import spark.implicits._
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c"))),
      touched = Seq("0", "1")))
    IcebergMeta.mirrorDeletes(spark, t, Seq(2L).toDF("k"),
      equalityCols = Seq("k"))
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val hint = new org.apache.hadoop.fs.Path(
      s"$root/metadata/version-hint.text")
    val fs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p); try in.readAllBytes() finally in.close()
    }
    val v = new String(readAll(hint)).trim.toLong
    val md = M.readTree(readAll(new org.apache.hadoop.fs.Path(
      f"$root/metadata/v$v%05d.metadata.json")))
    val snaps = md.get("snapshots").elements().asScala.toSeq
    val s1 = snaps.head.get("summary")
    assert(s1.get("operation").asText() == "overwrite")
    assert(s1.get("added-records").asText() == "3")
    assert(s1.get("total-records").asText() == "3")
    assert(s1.get("total-delete-files").asText() == "0")
    val s2 = snaps(1).get("summary")
    assert(s2.get("operation").asText() == "delete")
    assert(s2.get("added-equality-delete-records").asText() == "1")
    assert(s2.get("total-records").asText() == "3")
    assert(s2.get("added-delete-files").asText().toInt >= 1)
  }

  test("delete manifest layout: content codes, spec-id 1, equality_ids") {
    import spark.implicits._
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"))), touched = Seq("0")))
    IcebergMeta.mirrorDeletes(spark, t, Seq(1L).toDF("k"), Seq("k"))
    val snaps = IcebergMeta.snapshots(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(snaps(1).manifestList))
    val st = new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val entries = Iterator.continually(st)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    st.close()
    // one data entry carried + one delete entry
    assert(entries.map(_.get("content")).toSet === Set(0, 1))
    val del = entries.find(_.get("content") == 1).get
    assert(del.get("partition_spec_id") === 1)
    assert(del.get("sequence_number") === 2L)
    val mPath = new org.apache.hadoop.fs.Path(
      del.get("manifest_path").toString)
    val min2 = mPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration).open(mPath)
    val mst = new org.apache.avro.file.DataFileStream(min2,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    assert(new String(mst.getMeta("content")) === "deletes")
    assert(new String(mst.getMeta("partition-spec-id")) === "1")
    val me = mst.next()
    mst.close()
    val dataFile = me.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(dataFile.get("content") === 2) // EQUALITY_DELETES
    val ids = dataFile.get("equality_ids")
      .asInstanceOf[java.util.List[Integer]]
    assert(ids.size() === 1 && ids.get(0) === 2) // field id of k
  }

  test("data_file column stats: counts, typed bounds, range pruning") {
    val (t, root) = fixture()
    // two partitions with DISJOINT k ranges -> file-level bounds prune
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 10L, "a"), (0L, 19L, "b"), (1L, 100L, "c"),
        (1L, 190L, "d"))), touched = Seq("0", "1")))
    val snaps = IcebergMeta.snapshots(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(snaps(0).manifestList))
    val lst = new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val listEntries = Iterator.continually(lst)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    lst.close()
    // open partition 0's manifest and pin the k-column stats
    val m0 = listEntries.map(_.get("manifest_path").toString)
      .find(_.contains("-m0")).get
    val min0 = new org.apache.hadoop.fs.Path(m0)
    val ms = new org.apache.avro.file.DataFileStream(
      min0.getFileSystem(spark.sparkContext.hadoopConfiguration).open(min0),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val fileEntries = Iterator.continually(ms)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    ms.close()
    // aggregate the k bounds over partition 0's files (field id 2)
    def boundsOf(name: String): Seq[Long] = fileEntries.map { e =>
      val dfr = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val m = dfr.get(name)
        .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
      val kv = m.asScala.find(_.get("key") == 2).get
      val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
      val bytes = new Array[Byte](bb.remaining())
      bb.duplicate().get(bytes)
      java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    assert(boundsOf("lower_bounds").min === 10L)
    assert(boundsOf("upper_bounds").max === 19L)
    val counts = fileEntries.map { e =>
      val dfr = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val vc = dfr.get("value_counts")
        .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
      val nc = dfr.get("null_value_counts")
        .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
      (vc.asScala.find(_.get("key") == 2).get.get("value"),
        nc.asScala.find(_.get("key") == 2).get.get("value"))
    }
    assert(counts.map(_._1.asInstanceOf[Long]).sum === 2L) // 2 rows in p0
    assert(counts.forall(_._2 === 0L)) // no nulls
    // range read on k: only partition 1's range matches
    val pruned = IcebergMeta.read(spark, root,
      range = Some(("k", "100", "200")))
    assert(pruned.select("k").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(100L, 190L))
    // a range matching no file bounds is an ANSWER: empty frame
    // under the table schema, never a crash (a no-data-for-that-key
    // query is routine); broken REFERENCES still throw
    val none = IcebergMeta.read(spark, root,
      range = Some(("k", "500", "600")))
    assert(none.columns.toSeq === Seq("part", "k", "v"))
    assert(none.count() === 0L)
  }

  test("expireSnapshots trims the log and keeps shared manifests") {
    val (t, root) = fixture()
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((0L, 1L, "a"), (1L, 2L, "b"))), touched = Seq("0", "1")))
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((1L, 20L, "B"))), touched = Seq("1")))
    IcebergMeta.mirror(spark, t, t.commit(
      df(Seq((1L, 30L, "C"))), touched = Seq("1")))
    val before = IcebergMeta.snapshots(spark, root).map(_.snapshotId)
    assert(before === Seq(1L, 2L, 3L))
    val deleted = IcebergMeta.expireSnapshots(spark, root, keepLast = 1)
    assert(deleted >= 3) // two old lists + at least one orphaned manifest
    val after = IcebergMeta.snapshots(spark, root)
    assert(after.map(_.snapshotId) === Seq(3L))
    // the survivor still reads fine: partition 0's manifest was SHARED
    // with expired snapshots and must have survived the expiry
    val rows = IcebergMeta.read(spark, root)
      .select("part", "k").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(rows === Seq((0L, 1L), (1L, 30L)))
    // expired snapshots are gone
    intercept[IllegalArgumentException] {
      IcebergMeta.read(spark, root, snapshotId = Some(1L))
    }
  }

  test("mirror enforces native-version order") {
    val (t, _) = fixture()
    val v1 = t.commit(df(Seq((0L, 1L, "a"))), touched = Seq("0"))
    t.commit(df(Seq((0L, 2L, "b"))), touched = Seq("0"))
    IcebergMeta.mirror(spark, t, v1)
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.mirror(spark, t, 3L)
    }
    assert(e.getMessage.contains("order"))
  }

  test("schema evolution: added columns null-fill; time travel keeps old schema") {
    import spark.implicits._
    val (t, root) = fixture()
    val v1 = t.commit(df(Seq((0L, 1L, "a"), (1L, 2L, "b"))),
      touched = Seq("0", "1"))
    IcebergMeta.mirror(spark, t, v1)
    // evolution arrives WITH new data: part 1 rewritten carrying an
    // added column
    val v2 = t.commit(Seq((1L, 30L, "C", 7L)).toDF("part", "k", "v", "extra"),
      touched = Seq("1"))
    IcebergMeta.mirror(spark, t, v2)

    // current read: the snapshot-2 schema, old files null-filled
    val cur = IcebergMeta.read(spark, root)
    assert(cur.columns.toSeq === Seq("part", "k", "v", "extra"))
    val rows = cur.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sorted.toSeq
    assert(rows === Seq((0L, 1L, "a", -1L), (1L, 30L, "C", 7L)))
    // time travel: snapshot 1 reads under ITS schema — no added column
    val old = IcebergMeta.read(spark, root, snapshotId = Some(1L))
    assert(old.columns.toSeq === Seq("part", "k", "v"))

    // metadata shape: schemas ACCUMULATE, ids are stable, the added
    // column gets a fresh id and is optional, snapshots record their
    // own schema-id
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def md() = {
      val hint = new org.apache.hadoop.fs.Path(
        s"$root/metadata/version-hint.text")
      val in = fs.open(hint)
      val v = new String(try in.readAllBytes() finally in.close())
        .trim.toLong
      val p = new org.apache.hadoop.fs.Path(
        f"$root/metadata/v$v%05d.metadata.json")
      val in2 = fs.open(p)
      M.readTree(try in2.readAllBytes() finally in2.close())
    }
    val m2 = md()
    val schemas = m2.get("schemas").elements().asScala.toSeq
    assert(schemas.map(_.get("schema-id").asInt()) === Seq(0, 1))
    assert(m2.get("current-schema-id").asInt() === 1)
    assert(m2.get("last-column-id").asInt() === 4)
    val s1 = schemas(1).get("fields").elements().asScala.toSeq
    assert(s1.map(f => (f.get("name").asText(), f.get("id").asInt())) ===
      Seq(("part", 1), ("k", 2), ("v", 3), ("extra", 4)))
    assert(!s1.last.get("required").asBoolean(), "added column is optional")
    val snapIds = m2.get("snapshots").elements().asScala
      .map(s => s.get("snapshot-id").asLong() ->
        s.get("schema-id").asInt()).toSeq
    assert(snapIds === Seq(1L -> 0, 2L -> 1))

    // deletes after evolution carry the evolved schema verbatim and
    // resolve equality ids through it
    IcebergMeta.mirrorDeletes(spark, t, Seq(30L).toDF("k"), Seq("k"))
    assert(IcebergMeta.read(spark, root).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L))
    val m3 = md()
    assert(m3.get("current-schema-id").asInt() === 1)
    assert(m3.get("schemas").size() === 2)

    // a delta may OMIT optional columns (an old-shape writer after
    // evolution — the common post-evolution commit): the union schema
    // keeps them, the new files null-fill, the schemas array does NOT
    // grow, and the mirror never wedges on a false "dropped column"
    val v4 = t.commit(Seq((0L, 50L, 8L)).toDF("part", "k", "extra"),
      touched = Seq("0"))
    IcebergMeta.mirror(spark, t, v4)
    val cur4 = IcebergMeta.read(spark, root)
    assert(cur4.columns.toSeq === Seq("part", "k", "v", "extra"))
    val row4 = cur4.filter(col("k") === 50L).collect().head
    assert(row4.isNullAt(2), "omitted optional column must null-fill")
    assert(row4.getLong(3) === 8L)
    val m4 = md()
    assert(m4.get("current-schema-id").asInt() === 1)
    assert(m4.get("schemas").size() === 2,
      "an old-shape delta must not mint a new schema")

    // retyping a column still fails loudly
    val v5 = t.commit(
      Seq((0L, "oops", "x", 9L)).toDF("part", "k", "v", "extra"),
      touched = Seq("0"))
    val e = intercept[IllegalArgumentException] {
      IcebergMeta.mirror(spark, t, v5)
    }
    assert(e.getMessage.contains("retyping"))
  }
}
