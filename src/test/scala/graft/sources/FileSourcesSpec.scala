package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.state.FsStateStore

class FileSourcesSpec extends AnyFunSuite {

  private def mkTree(dirs: Seq[String]): String = {
    val base = Files.createTempDirectory("pfs").toString
    dirs.foreach { d =>
      Files.createDirectories(Paths.get(base, d))
      Files.writeString(Paths.get(base, d, "part-0.parquet"), "x")
    }
    base
  }

  test("partitioned source selects strictly after watermark, capped, oldest first") {
    val base = mkTree(Seq("date_key=2024-01-01", "date_key=2024-01-02",
      "date_key=2024-01-03", "date_key=2024-01-04"))
    val p1 = PartitionedFileSource.plan(base, Some("2024-01-01"), maxPartitionsPerRun = 2)
    assert(p1.paths.map(_.split('/').last) ==
      Seq("date_key=2024-01-02", "date_key=2024-01-03"))
    assert(p1.highWatermark.contains("2024-01-03"))
    val p2 = PartitionedFileSource.plan(base, p1.highWatermark)
    assert(p2.paths.map(_.split('/').last) == Seq("date_key=2024-01-04"))
    val p3 = PartitionedFileSource.plan(base, p2.highWatermark)
    assert(p3.paths.isEmpty && p3.highWatermark.contains("2024-01-04"))
  }

  test("partitioned source ignores hidden dirs and missing base") {
    val base = mkTree(Seq("date_key=2024-01-01", "_staging", ".hidden"))
    assert(PartitionedFileSource.plan(base, None).paths.size == 1)
    assert(PartitionedFileSource.plan("/nonexistent/base", None).paths.isEmpty)
  }

  test("file diff picks up new and changed files only") {
    val base = Files.createTempDirectory("fdiff").toString
    Files.writeString(Paths.get(base, "a.txt"), "1")
    Files.writeString(Paths.get(base, "b.txt"), "2")
    val store = new FsStateStore(Files.createTempDirectory("st").toString)

    val p1 = FileDiffSource.plan(base, FileDiffSource.loadSnapshot(store, "j"))
    assert(p1.newFiles.map(_.split('/').last).sorted == Seq("a.txt", "b.txt"))
    FileDiffSource.saveSnapshot(store, "j", p1.snapshot)

    // no change -> nothing new
    val p2 = FileDiffSource.plan(base, FileDiffSource.loadSnapshot(store, "j"))
    assert(p2.newFiles.isEmpty)

    // new file + changed file (different length => different sig)
    Files.writeString(Paths.get(base, "c.txt"), "3")
    Files.writeString(Paths.get(base, "a.txt"), "1-changed")
    val p3 = FileDiffSource.plan(base, p2.snapshot)
    assert(p3.newFiles.map(_.split('/').last).sorted == Seq("a.txt", "c.txt"))
  }

  test("kafka offset planning: committed, new, and out-of-range partitions") {
    import KafkaOffsets._
    val current = Seq(
      PartitionRange("t", 0, earliest = 100, latest = 500),  // committed in range
      PartitionRange("t", 1, earliest = 0, latest = 50),     // new partition
      PartitionRange("t", 2, earliest = 300, latest = 400))  // committed fell off retention
    val prev = Map(("t", 0) -> 250L, ("t", 2) -> 10L)
    val plan = KafkaOffsets.plan(prev, current, ResetToEarliest)
    assert(plan.startingOffsets == Map(("t", 0) -> 250L, ("t", 1) -> 0L, ("t", 2) -> 300L))
    assert(plan.endingOffsets == Map(("t", 0) -> 500L, ("t", 1) -> 50L, ("t", 2) -> 400L))
    assert(plan.startingJson == """{"t": {"0": 250, "1": 0, "2": 300}}""")

    val planLatest = KafkaOffsets.plan(prev, current, ResetToLatest)
    assert(planLatest.startingOffsets(("t", 2)) == 400L)
  }

}
