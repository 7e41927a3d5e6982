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

    val res = FsCopy.execute(plan)
    assert(res.bytes == 6000)
    assert(FsCopy.verify(plan).isEmpty)
    // byte-identical content incl. stitched chunks
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(src, "sub", "big.bin")),
      Files.readAllBytes(Paths.get(dest, "sub", "big.bin"))))
  }

  test("compaction: dedup + merge + publish with threshold verifier") {
    val root = tmpDir("compaction")
    val input = s"$root/input"
    val ev = Tables.load(spark, sf(), "events")
    // duplicate the input -> compaction must halve it
    ev.union(ev).repartition(16).write.parquet(input)

    val spec = SinkSpec(s"$root/staging", s"$root/out")
    val res = Compaction.compact(spark, input, spec,
      keys = Seq("event_id"), deltaCols = Seq("ts", "event_id"))
    assert(res.isRight)
    val stats = res.toOption.get
    assert(stats.inputRows == 2000 && stats.outputRows == 1000)
    assert(spark.read.parquet(s"$root/out").count() == 1000)
    assert(stats.outputFiles < 16) // small files merged

    // threshold verifier vetoes
    val vetoed = Compaction.compact(spark, input, SinkSpec(s"$root/st2", s"$root/out2"),
      keys = Seq("event_id"), deltaCols = Nil, minRowsThreshold = 1000000)
    assert(vetoed.isLeft)
    assert(!new java.io.File(s"$root/out2").exists())
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
