package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sink.SinkSpec

/** Macro operators: copy (distcp), compaction, retention finders. */
class MacroOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fs copy: plan splits large files, execute copies bytes, verify passes") {
    val root = tmpDir("fscopy")
    val src = s"$root/src"; val dest = s"$root/dest"
    Files.createDirectories(Paths.get(src, "sub"))
    Files.write(Paths.get(src, "small.bin"), Array.fill[Byte](1000)(1))
    Files.write(Paths.get(src, "sub", "big.bin"), Array.tabulate[Byte](5000)(i => (i % 97).toByte))

    val plan = FsCopy.plan(spark, src, dest, splitSize = 2048)
    val chunks = plan.collect()
    assert(chunks.count(_.src.endsWith("small.bin")) == 1)
    assert(chunks.count(_.src.endsWith("big.bin")) == 3) // 5000/2048 -> 3 chunks

    // known source mtime -> must survive the copy (attr preservation)
    val srcMtime = 1700000000000L
    new java.io.File(s"$src/sub/big.bin").setLastModified(srcMtime)
    val plan2 = FsCopy.plan(spark, src, dest, splitSize = 2048)

    val res = FsCopy.execute(plan2)
    assert(res.bytes == 6000)
    assert(FsCopy.verify(plan2).isEmpty)
    // byte-identical content incl. stitched chunks
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(src, "sub", "big.bin")),
      Files.readAllBytes(Paths.get(dest, "sub", "big.bin"))))
    assert(new java.io.File(s"$dest/sub/big.bin").lastModified() == srcMtime,
      "stitched file must preserve the source modification time")
    // no stray chunk parts after the distributed stitch
    assert(!new java.io.File(s"$dest/sub").list().exists(_.contains(".chunk-")))
  }

  test("fs copy verify: planted missing file and length mismatch surface as failures") {
    val root = tmpDir("fscopy_verify")
    val src = s"$root/src"; val dest = s"$root/dest"
    Files.createDirectories(Paths.get(src))
    (1 to 4).foreach(i =>
      Files.write(Paths.get(src, s"f$i.bin"), Array.fill[Byte](100 * i)(i.toByte)))
    val plan = FsCopy.plan(spark, src, dest, splitSize = 150) // f2..f4 chunked
    FsCopy.execute(plan)
    assert(FsCopy.verify(plan).isEmpty)
    // plant: delete one dest, truncate another
    Files.delete(Paths.get(dest, "f1.bin"))
    Files.write(Paths.get(dest, "f3.bin"), Array.fill[Byte](7)(0))
    val failures = FsCopy.verify(plan)
    assert(failures.size == 2, s"got $failures")
    assert(failures.exists(f => f.startsWith("missing:") && f.contains("f1.bin")))
    assert(failures.exists(f => f.startsWith("length mismatch:") && f.contains("f3.bin")
      && f.contains("(7 != 300)")))
  }

  test("compaction: dedup + merge + publish with threshold verifier") {
    val root = tmpDir("compaction")
    val input = s"$root/input"
    val ev = Tables.load(spark, sf(), "events")
    // duplicate the input -> compaction must halve it
    ev.union(ev).repartition(16).write.parquet(input)

    val spec = SinkSpec(s"$root/staging", s"$root/out")
    // single-pass check: counts ride the staged write as Observations,
    // so compact() reads the input bytes exactly once (job/stage counts
    // are an AQE artifact; bytes read is the honest scan metric)
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val res = try {
      val r = Compaction.compact(spark, input, spec,
        keys = Seq("event_id"), deltaCols = Seq("ts", "event_id"))
      // listener events post asynchronously — wait until the sum settles
      var last = -1L
      var spins = 0
      while (bytesRead.get() != last && spins < 20) {
        last = bytesRead.get(); Thread.sleep(100); spins += 1
      }
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(res.isRight)
    val stats = res.toOption.get
    assert(stats.inputRows == 2000 && stats.outputRows == 1000)
    val onDisk = new java.io.File(input).listFiles().map(_.length()).sum
    assert(bytesRead.get() < (onDisk * 1.5).toLong,
      s"compact must scan the input once: read ${bytesRead.get()} of $onDisk on-disk bytes")
    assert(spark.read.parquet(s"$root/out").count() == 1000)
    assert(stats.outputFiles < 16) // small files merged

    // threshold verifier vetoes the publish; staging is discarded
    val vetoed = Compaction.compact(spark, input, SinkSpec(s"$root/st2", s"$root/out2"),
      keys = Seq("event_id"), deltaCols = Nil, minRowsThreshold = 1000000)
    assert(vetoed.isLeft)
    assert(!new java.io.File(s"$root/out2").exists())
    assert(!new java.io.File(s"$root/st2").exists())
  }

  test("compaction audit-count verifier: disagreeing or absent audit counts veto the publish") {
    val root = tmpDir("audit")
    val input = s"$root/input"
    Tables.load(spark, sf(), "events").limit(800).write.parquet(input)
    // 800 input rows; the fake audit store plays the reference's
    // KafkaAuditCountHttpClient
    val store = new Compaction.AuditCountProvider {
      def expectedCount(dataset: String): Option[Long] = dataset match {
        case "events_hour" => Some(810L)  // 800/810 = 0.9877 completeness
        case _ => None
      }
    }
    // 0.98 completeness satisfied -> publish
    val ok = Compaction.compact(spark, input, SinkSpec(s"$root/st1", s"$root/out1"),
      keys = Seq("event_id"), deltaCols = Nil,
      audit = Some(Compaction.AuditCheck(store, "events_hour", completeness = 0.98)))
    assert(ok.isRight && new java.io.File(s"$root/out1").exists())
    // 0.999 completeness NOT met -> veto, staging discarded
    val veto = Compaction.compact(spark, input, SinkSpec(s"$root/st2", s"$root/out2"),
      keys = Seq("event_id"), deltaCols = Nil,
      audit = Some(Compaction.AuditCheck(store, "events_hour", completeness = 0.999)))
    assert(veto.isLeft && veto.swap.toOption.get.contains("completeness"))
    assert(!new java.io.File(s"$root/out2").exists() && !new java.io.File(s"$root/st2").exists())
    // audit store has no row for the dataset -> cannot verify -> veto
    val noRow = Compaction.compact(spark, input, SinkSpec(s"$root/st3", s"$root/out3"),
      keys = Seq("event_id"), deltaCols = Nil,
      audit = Some(Compaction.AuditCheck(store, "unknown_topic")))
    assert(noRow.isLeft && noRow.swap.toOption.get.contains("no count"))
    assert(!new java.io.File(s"$root/out3").exists())
  }

  test("compaction late-data lifecycle: compact, late arrivals, recompact merges") {
    import spark.implicits._
    val root = tmpDir("late")
    val ev = Tables.load(spark, sf(), "events")
      .select($"event_id", $"ts", $"event_type", $"value")

    // initial compaction of the on-time data
    ev.write.parquet(s"$root/input")
    val first = Compaction.compact(spark, s"$root/input",
      SinkSpec(s"$root/st1", s"$root/out"), keys = Seq("event_id"), deltaCols = Seq("ts", "event_id"))
    assert(first.isRight)
    val compacted = first.toOption.get.outputRows

    // late records land in late/ — half of them replays (duplicates),
    // half is genuinely new (shifted ids)
    val late = ev.limit(200)
    late.union(late.withColumn("event_id", $"event_id" + 1000000))
      .write.parquet(s"$root/late")
    val lateFiles = new java.io.File(s"$root/late").listFiles().count(_.getName.endsWith(".parquet"))
    val lateRows = spark.read.parquet(s"$root/late").count()

    // ratio condition decides (RecompactionConditionBasedOnRatio)
    assert(Compaction.shouldRecompact(lateRows, compacted, maxRatio = 0.03))
    assert(Compaction.shouldRecompactFiles(lateFiles, maxFiles = 0))

    // recompact over compacted + late: duplicates collapse, new survive
    spark.read.parquet(s"$root/out").union(spark.read.parquet(s"$root/late"))
      .write.parquet(s"$root/input2")
    val second = Compaction.compact(spark, s"$root/input2",
      SinkSpec(s"$root/st2", s"$root/out2"), keys = Seq("event_id"), deltaCols = Seq("ts", "event_id"))
    assert(second.isRight)
    assert(second.toOption.get.outputRows == compacted + 200) // only the new ids add rows
    assert(spark.read.parquet(s"$root/out2")
      .groupBy($"event_id").count().filter($"count" > 1).isEmpty)
  }

  test("compaction verifiers and recompaction condition") {
    assert(Compaction.auditCountVerifier(1000, 0.99)(995).isRight)
    assert(Compaction.auditCountVerifier(1000, 0.99)(980).isLeft)
    assert(Compaction.shouldRecompact(lateRows = 150, compactedRows = 1000, maxRatio = 0.1))
    assert(!Compaction.shouldRecompact(lateRows = 50, compactedRows = 1000, maxRatio = 0.1))
    val ev = Tables.load(spark, sf(), "events")
    assert(Compaction.timeRangeVerifier(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))(ev, "ts").isRight)
    assert(Compaction.timeRangeVerifier(
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))(ev, "ts").isLeft)
    // duration / file-count recompaction conditions
    assert(Compaction.shouldRecompactAfter(lastCompactedMs = 0, nowMs = 7200000, maxAgeMs = 3600000))
    assert(!Compaction.shouldRecompactAfter(lastCompactedMs = 0, nowMs = 1000, maxAgeMs = 3600000))
    assert(Compaction.shouldRecompactFiles(lateFileCount = 101, maxFiles = 100))
    assert(!Compaction.shouldRecompactFiles(lateFileCount = 5, maxFiles = 100))
  }

  test("compaction key selection from avro doc-primarykey; registration post-action") {
    // DedupKeyOption ladder: doc-marked fields win, else all fields
    val marked =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long","doc":"the PrimaryKey"},
        |{"name":"scn","type":"long","doc":"delta"},
        |{"name":"payload","type":"string"}]}""".stripMargin
    assert(Compaction.keysFromAvroSchema(marked) == Seq("id"))
    val unmarked =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"long"},{"name":"b","type":"string"}]}""".stripMargin
    assert(Compaction.keysFromAvroSchema(unmarked) == Seq("a", "b"))

    // registerAs exposes the compacted output through the catalog
    import spark.implicits._
    val root = tmpDir("compactreg")
    Seq((1L, 1L, "x"), (1L, 2L, "y"), (2L, 1L, "z")).toDF("id", "scn", "payload")
      .write.parquet(s"$root/in")
    val spec = graft.sink.SinkSpec(s"$root/staging", s"$root/out")
    val r = Compaction.compact(spark, s"$root/in", spec,
      keys = Seq("id"), deltaCols = Seq("scn"), registerAs = Some("compacted_t"))
    assert(r.isRight)
    val rows = spark.table("compacted_t").orderBy($"id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("retention: path-date version times and trash-instead-of-delete") {
    val root = tmpDir("retention_trash")
    Seq("logs/2024-01-01-00", "logs/2024-01-02-12", "logs/not-a-date")
      .foreach(d => Files.createDirectories(Paths.get(root, d)))
    val versions = Retention.withPathTime(
      Retention.listVersions(spark, root), "yyyy-MM-dd-HH")
    val byName = versions.collect().map(r =>
      r.getAs[String]("version") -> Option(r.getAs[java.sql.Timestamp]("version_time"))).toMap
    assert(byName("2024-01-02-12").contains(java.sql.Timestamp.valueOf("2024-01-02 12:00:00")))
    assert(byName("not-a-date").isEmpty) // unparseable -> null, never a wrong date
    val victim = versions.filter($"version" === "2024-01-01-00")
      .select("path").head.getString(0)
    val trash = s"$root/.trash"
    assert(Retention.deleteVersions(spark, Seq(victim), trashDir = Some(trash)) == 1)
    assert(!Files.exists(Paths.get(root, "logs/2024-01-01-00")))
    assert(Files.exists(Paths.get(trash, "logs/2024-01-01-00"))) // recoverable
  }

  test("retention: listVersions + policy + deleteVersions with empty-parent cleanup") {
    val root = tmpDir("retention")
    Seq("ds1/v=2024-01-01", "ds1/v=2024-01-02", "ds1/v=2024-01-03", "ds2/v=2024-01-01")
      .foreach(d => Files.createDirectories(Paths.get(root, d)))
    val versions = Retention.listVersions(spark, root)
    assert(versions.count() == 4)
    val keep = Retention.newestK(versions, Seq("dataset"), Seq($"version"), 1)
    val toDelete = Retention.deletable(versions, keep)
      .select("path").collect().map(_.getString(0))
    assert(toDelete.length == 2)
    assert(Retention.deleteVersions(spark, toDelete.toSeq) == 2)
    assert(Retention.listVersions(spark, root).count() == 2)
  }
}
