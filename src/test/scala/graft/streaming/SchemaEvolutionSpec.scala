package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sink.{Publisher, SinkSpec}
import graft.state.FsStateStore

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new FsStateStore(tmpDir("schemas"))

  private val v1 = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("identical schema passes through conformed") {
    val store = newStore()
    val batch = Seq((1L, "a")).toDF("id", "name")
    val out = SchemaEvolution.conform(batch, v1, store, "s")
    assert(out.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(out.count() == 1)
  }

  test("additive column: batch conforms, widened schema recorded for restart") {
    val store = newStore()
    val batch = Seq((1L, "a", 9.5)).toDF("id", "name", "score")
    val out = SchemaEvolution.conform(batch, v1, store, "s")
    assert(out.schema.fieldNames.toSeq == Seq("id", "name")) // current run: v1 shape
    val recorded = SchemaEvolution.loadSchema(store, "s").get
    assert(recorded.fieldNames.toSeq == Seq("id", "name", "score")) // next run: v2
    // restart path: conforming an old-shape batch to v2 null-fills
    val old = Seq((2L, "b")).toDF("id", "name")
    val conformed = SchemaEvolution.conform(old, recorded, store, "s")
    assert(conformed.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(conformed.head.isNullAt(2))
  }

  test("type change raises SchemaChangedException and records new schema") {
    val store = newStore()
    val batch = Seq(("not-a-long", "a")).toDF("id", "name")
    val e = intercept[SchemaEvolution.SchemaChangedException](
      SchemaEvolution.conform(batch, v1, store, "s"))
    assert(e.observed("id").dataType == StringType)
    assert(SchemaEvolution.loadSchema(store, "s").get("id").dataType == StringType)
  }

  test("publishOverwritePartitions makes re-publish idempotent") {
    val root = tmpDir("overwrite")
    val pub = new Publisher(spark.sparkContext.hadoopConfiguration)
    val spec = SinkSpec(s"$root/staging", s"$root/out", partitionBy = Seq("p"))
    val df = Seq((1L, "x", "d1"), (2L, "y", "d2")).toDF("id", "v", "p")
    pub.writeStaged(df, spec); pub.publishOverwritePartitions(spec)
    assert(spark.read.parquet(s"$root/out").count() == 2)
    // re-run of the same range: replaces partitions, no duplicates
    pub.writeStaged(df, spec); pub.publishOverwritePartitions(spec)
    assert(spark.read.parquet(s"$root/out").count() == 2)
    // merging publisher by contrast appends files
    pub.writeStaged(df, spec); pub.publish(spec)
    assert(spark.read.parquet(s"$root/out").count() == 4)
  }
}
