package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 40L).map(i => (i, s"document number $i body " * 3)).toDF("id", "txt")

  test("export + verify round-trips clean") {
    val out = tmpDir("shardexp")
    ShardExport.exportShards(docs, "id", "txt", nShards = 4, outDir = out)
    val m = ShardExport.verify(spark, out, "id", "txt").collect()
    assert(m.length === 4)
    assert(m.forall(_.getBoolean(4)), "all shards must verify")
    assert(m.map(_.getLong(1)).sum === 40L)
  }

  test("verify flags a tampered shard and leaves the others verified") {
    val out = tmpDir("shardexp_tamper")
    ShardExport.exportShards(docs, "id", "txt", nShards = 4, outDir = out)
    // drop one row from shard 2's published file: materialize the
    // remaining rows first (the rewrite replaces the files being read)
    val rows = spark.read.parquet(s"$out/data").filter(col("shard") === 2)
      .filter(col("id") =!= 2L).drop("shard")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    rows.toSeq.toDF("id", "txt")
      .write.mode("overwrite").parquet(s"$out/data/shard=2")
    val m = ShardExport.verify(spark, out, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(m(2L) === false, "tampered shard must fail verification")
    assert(Seq(0L, 1L, 3L).forall(m(_)), "untouched shards stay verified")
  }

  test("a deleted shard directory reports verified=false, not null/absent") {
    val out = tmpDir("shardexp_missing")
    ShardExport.exportShards(docs, "id", "txt", nShards = 4, outDir = out)
    // remove shard 1 entirely — the published tree lies by omission
    val dir = new java.io.File(s"$out/data/shard=1")
    dir.listFiles().foreach(_.delete()); assert(dir.delete())
    val m = ShardExport.verify(spark, out, "id", "txt").collect()
    assert(m.length === 4, "the manifest row for the missing shard must appear")
    val byShard = m.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(byShard(1L) === false)
    assert(Seq(0L, 2L, 3L).forall(byShard(_)))
  }

  test("negative ids shard deterministically via pmod") {
    val neg = Seq((-7L, "a"), (-6L, "b"), (5L, "c")).toDF("id", "txt")
    val out = tmpDir("shardexp_neg")
    ShardExport.exportShards(neg, "id", "txt", nShards = 4, outDir = out)
    val m = ShardExport.verify(spark, out, "id", "txt").collect()
    assert(m.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(m.forall(_.getBoolean(4)))
  }
}
