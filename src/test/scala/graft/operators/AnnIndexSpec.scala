package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Ann

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic vectors: 4-dim, values from per-id LCG. */
  private def vecs(ids: Range): DataFrame =
    ids.map { i =>
      val rng = new scala.util.Random(i * 0x9E3779B97F4A7C15L)
      (i.toLong, Array.fill(4)(rng.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")

  test("codebook encode/decode round-trips bit-exactly") {
    val idx = Ann.sampledIvf(vecs(0 until 50), k = 5)
    val back = AnnIndex.decodeCentroids(AnnIndex.encodeCentroids(idx))
    assert(back.centroids.map(_._1).toSeq === idx.centroids.map(_._1).toSeq)
    back.centroids.zip(idx.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq) // Double.toString shortest round-trip
    }
  }

  test("incremental merge equals full rebuild under the frozen codebook") {
    val first = vecs(0 until 60)
    val rest = vecs(60 until 100)
    val idx = Ann.sampledIvf(first, k = 4) // frozen at first epoch
    val merged = AnnIndex.merge(idx, AnnIndex.assign(idx, first), rest)
    val rebuilt = AnnIndex.assign(idx, vecs(0 until 100))
    assert(merged.select("vec_id", "list_id").collect().map(r =>
        (r.getLong(0), r.getInt(1))).toSet ===
      rebuilt.select("vec_id", "list_id").collect().map(r =>
        (r.getLong(0), r.getInt(1))).toSet)
    assert(merged.count() === 100L)
  }

  test("re-delivered vectors REPLACE their rows (no duplicate postings)") {
    val all = vecs(0 until 80)
    val idx = Ann.sampledIvf(all, k = 4)
    val replay = all.filter(col("vec_id") % 7 === 0)
    val merged = AnnIndex.merge(idx, AnnIndex.assign(idx, all), replay)
    assert(merged.count() === 80L, "re-delivery must not duplicate rows")
    assert(merged.groupBy("vec_id").count().filter(col("count") > 1).count() === 0L)
  }

  test("search from stored assignments equals IvfIndex.search over the source") {
    val all = vecs(0 until 100)
    val idx = Ann.sampledIvf(all, k = 4)
    val probes = all.filter(col("vec_id") % 11 === 0)
    val fromStore = AnnIndex.search(idx, AnnIndex.assign(idx, all), probes,
      k = 3, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = idx.search(probes, all, k = 3, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromStore === direct)
  }

  test("loadCodebook on a non-index directory fails loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("annidx").toString
    intercept[IllegalStateException] {
      AnnIndex.loadCodebook(tmp, spark.sparkContext.hadoopConfiguration)
    }
  }

  test("sharded merge == rebuild; untouched lists carry over by path") {
    val root = java.nio.file.Files.createTempDirectory("annidx").toString + "/t"
    val table = new graft.sink.ShardedTable(root, "list_id",
      spark.sparkContext.hadoopConfiguration)
    val first = vecs(0 until 60)
    val idx = Ann.sampledIvf(first, k = 4) // frozen
    val (full0, touched0) = AnnIndex.shardedMerge(idx, table,
      hasCurrent = false, first)
    table.commit(full0, touched0)
    // epoch 2: ONE vector re-delivered with a changed embedding — only
    // its old and new lists may rewrite
    val moved = vecs(0 until 1)
      .withColumn("embedding", reverse(col("embedding")))
    val (merged, touched) = AnnIndex.shardedMerge(idx, table,
      hasCurrent = true, moved)
    table.commit(merged, touched)
    assert(touched.size <= 2, s"1-vector delta touched ${touched.size} lists")
    val m1 = table.manifest(1L)
    val m2 = table.manifest(2L)
    m1.keys.filterNot(touched.contains).foreach { l =>
      assert(m2(l) === m1(l), s"untouched list $l must not rewrite")
    }
    // merged table == full rebuild of the corrected corpus under the
    // frozen codebook
    val corrected = first.filter(col("vec_id") =!= 0)
      .unionByName(moved)
    val rebuilt = AnnIndex.assign(idx, corrected)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val stored = table.readCurrent(spark).select("vec_id", "list_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(stored === rebuilt)
  }

  test("searchTable (manifest-pruned reads) equals full-assignments search") {
    val root = java.nio.file.Files.createTempDirectory("annidx").toString + "/t"
    val table = new graft.sink.ShardedTable(root, "list_id",
      spark.sparkContext.hadoopConfiguration)
    val all = vecs(0 until 100)
    val idx = Ann.sampledIvf(all, k = 4)
    val (full0, touched0) = AnnIndex.shardedMerge(idx, table,
      hasCurrent = false, all)
    table.commit(full0, touched0)
    val probes = all.filter(col("vec_id") % 11 === 0)
    val pruned = AnnIndex.searchTable(idx, table, probes, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fullSearch = AnnIndex.search(idx, AnnIndex.assign(idx, all), probes,
      k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === fullSearch)
  }
}
