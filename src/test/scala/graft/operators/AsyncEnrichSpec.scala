package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.{Publisher, SinkSpec}

class AsyncEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("enrich adds looked-up column; missing keys yield null") {
    val df = (1 to 250).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    val out = AsyncEnrich.enrich(df, "id", "user_name",
      client = keys => keys.filter(_.toLong % 2 == 0).map(k => k -> s"user-$k").toMap,
      batchSize = 32, maxInflightBatches = 3)
    assert(out.count() == 250)
    assert(out.filter($"user_name".isNotNull).count() == 125)
    assert(out.filter($"id" === 2).head.getString(2) == "user-2")
  }

  test("enrich batches requests (client called ceil(n/batch) times per partition)") {
    val calls = spark.sparkContext.longAccumulator("client_calls")
    val df = (1 to 100).map(i => (i.toLong, "x")).toDF("id", "payload").repartition(1)
    AsyncEnrich.enrich(df, "id", "v",
      client = keys => { calls.add(1); keys.map(k => k -> "v").toMap },
      batchSize = 30, maxInflightBatches = 2).count()
    assert(calls.value == 4) // 100/30 -> 4 batches
  }

  test("grokParse extracts typed groups") {
    val df = Seq("2024-01-01 click [u7]").toDF("line")
    val out = Converters.grokParse("line", "^(\\S+) (\\S+) \\[u(\\d+)\\]$",
      Seq(("day", 1, "string"), ("etype", 2, "string"), ("uid", 3, "long")))(df)
    val r = out.head
    assert(r.getString(0) == "2024-01-01" && r.getString(1) == "click" && r.getLong(2) == 7L)
  }

  test("publishAll is all-or-nothing across fork branches") {
    val root = tmpDir("forkpub")
    val pub = new Publisher(spark.sparkContext.hadoopConfiguration)
    val specA = SinkSpec(s"$root/stage/a", s"$root/out/a")
    val specB = SinkSpec(s"$root/stage/b", s"$root/out/b")
    val df = Seq((1, "x")).toDF("id", "v")

    // only branch A staged -> publishAll must refuse and abort A
    pub.writeStaged(df, specA)
    intercept[IllegalStateException](pub.publishAll(Seq(specA, specB)))
    assert(!new java.io.File(s"$root/out/a").exists() ||
      new java.io.File(s"$root/out/a").listFiles().isEmpty)

    // both staged -> both publish
    pub.writeStaged(df, specA); pub.writeStaged(df, specB)
    assert(pub.publishAll(Seq(specA, specB)) > 0)
    assert(spark.read.parquet(s"$root/out/a").count() == 1)
    assert(spark.read.parquet(s"$root/out/b").count() == 1)
  }
}
