package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot publish semantics: the staged dir REPLACES the output
  * whole — replays converge, previous data survives a failed swap,
  * stale tombstones don't block.
  */
class PublisherSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def publisher = new Publisher(spark.sparkContext.hadoopConfiguration)

  test("replace not merge: second snapshot fully supersedes the first") {
    val root = tmpDir("snap")
    val spec = SinkSpec(s"$root/staging", s"$root/out")
    Seq(1, 2, 3).toDF("v").write.parquet(spec.stagingDir)
    publisher.publishSnapshot(spec)
    assert(spark.read.parquet(spec.outputDir).count() == 3)
    // a second, SMALLER snapshot must replace, not merge
    Seq(9).toDF("v").write.parquet(spec.stagingDir)
    publisher.publishSnapshot(spec)
    val out = spark.read.parquet(spec.outputDir).as[Int].collect()
    assert(out.toSeq == Seq(9), s"snapshot must replace: got ${out.toSeq}")
    // no tombstone left behind
    assert(!new java.io.File(s"$root").listFiles().exists(_.getName.contains(".replaced")))
  }

  test("stale tombstone from a crashed run is cleared, publish proceeds") {
    val root = tmpDir("snap_tomb")
    val spec = SinkSpec(s"$root/staging", s"$root/out")
    // simulate a crash that left a tombstone behind
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/.out.replaced"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/.out.replaced/stale.bin"), Array[Byte](1))
    Seq(5, 6).toDF("v").write.parquet(spec.stagingDir)
    publisher.publishSnapshot(spec)
    assert(spark.read.parquet(spec.outputDir).as[Int].collect().sorted.toSeq == Seq(5, 6))
    assert(!new java.io.File(s"$root/.out.replaced").exists())
  }

  test("publishing with no staging dir is a zero no-op") {
    val root = tmpDir("snap_empty")
    val spec = SinkSpec(s"$root/missing_staging", s"$root/out")
    assert(publisher.publishSnapshot(spec) == 0)
    assert(!new java.io.File(s"$root/out").exists())
  }
}
