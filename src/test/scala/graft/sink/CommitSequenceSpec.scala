package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.state.FsStateStore

/** Commit-sequence crash replay: kill the driver (simulated) between
  * dataset publishes, rerun, and verify no dataset is published twice
  * and none is lost.
  */
class CommitSequenceSpec extends SparkSpec {
  import spark.implicits._

  test("crash mid-sequence, rerun: completed datasets skipped, remainder published once") {
    val root = Files.createTempDirectory("cseq").toString
    val store = new FsStateStore(s"$root/state")
    val publisher = new Publisher(spark.sparkContext.hadoopConfiguration)
    val specs = (1 to 3).map { i =>
      s"ds$i" -> SinkSpec(s"$root/staging/ds$i", s"$root/out/ds$i")
    }
    // stage all three datasets
    specs.foreach { case (name, spec) =>
      publisher.writeStaged(Seq((name, 1), (name, 2)).toDF("ds", "v"), spec)
    }
    val seq = new CommitSequence(store)

    // run 1 "crashes" after ds1: the publishFn throws on ds2
    val crash = intercept[RuntimeException] {
      seq.run("jobX", specs, spec =>
        if (spec.outputDir.endsWith("ds2")) throw new RuntimeException("driver died")
        else publisher.publish(spec))
    }
    assert(crash.getMessage == "driver died")
    assert(seq.completed("jobX") == Seq("ds1"))
    assert(spark.read.parquet(s"$root/out/ds1").count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/out/ds2")))

    // run 2 (the replay): ds1 skipped, ds2+ds3 published
    val results = seq.run("jobX", specs, publisher.publish)
    assert(results.map(r => r.dataset -> r.action) ==
      Seq("ds1" -> "skipped", "ds2" -> "published", "ds3" -> "published"))
    (1 to 3).foreach { i =>
      assert(spark.read.parquet(s"$root/out/ds$i").count() == 2, s"ds$i row count")
    }
    // sequence record cleared after full success
    assert(store.listKeys("commit_sequences/jobX").isEmpty)
  }

  test("replay after crash between publish and record is a harmless no-op publish") {
    val root = Files.createTempDirectory("cseq2").toString
    val store = new FsStateStore(s"$root/state")
    val publisher = new Publisher(spark.sparkContext.hadoopConfiguration)
    val spec = SinkSpec(s"$root/staging/ds", s"$root/out/ds")
    publisher.writeStaged(Seq(("a", 1)).toDF("k", "v"), spec)

    val seq = new CommitSequence(store)
    // crash AFTER the publish rename but BEFORE the done record: the
    // publish happened, the state still says pending
    val boom = intercept[RuntimeException] {
      seq.run("jobY", Seq("ds" -> spec), s => { publisher.publish(s); throw new RuntimeException("died post-publish") })
    }
    assert(boom.getMessage == "died post-publish")
    assert(spark.read.parquet(s"$root/out/ds").count() == 1)

    // rerun: staging is gone, publish moves 0 entries, data unchanged
    val results = seq.run("jobY", Seq("ds" -> spec), publisher.publish)
    assert(results == Seq(seq.StepResult("ds", "published", 0)))
    assert(spark.read.parquet(s"$root/out/ds").count() == 1)
  }
}
