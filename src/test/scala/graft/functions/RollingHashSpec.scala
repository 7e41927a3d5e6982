package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rolling-hash fingerprints + SQL registration (shared session —
  * GraftExtensions.register targets an already-built session, the same
  * injectFunction tuples the spark.sql.extensions path uses).
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("rolling hash: deterministic, order-sensitive, content-sensitive") {
    val out = Seq("abc", "abc", "acb", "abcd").toDF("t")
      .select(RollingHash.rollingHash64($"t")).collect().map(_.getLong(0))
    assert(out(0) == out(1))
    assert(out(0) != out(2)) // order matters (unlike a bag hash)
    assert(out(0) != out(3))
  }

  test("content-defined chunks are shift-resistant") {
    val rnd = new scala.util.Random(11)
    val body = (1 to 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val doc1 = "PREFIX-ONE " + body
    val doc2 = "totally different and longer prefix material " + body
    val rows = Seq(doc1, doc2).toDF("t")
      .select(RollingHash.contentChunkHashes($"t", 16, 4).as("chunks"))
      .collect().map(_.getSeq[Long](0))
    val shared = rows(0).toSet intersect rows(1).toSet
    // the shared 300-char body must yield shared chunk hashes even
    // though its byte offset differs between the two docs
    assert(shared.nonEmpty, s"no shared chunks: ${rows(0).size}/${rows(1).size}")
    assert(rows(0).size > 3) // actually chunked, not one blob
  }

  test("SQL registration via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT simhash64('a b c'), rolling_hash64('abc'), size(content_chunk_hashes('abcdef', 4, 2))"
    ).head
    assert(row.getLong(0) == Seq("a b c").toDF("t")
      .select(Similarity.simhash64($"t")).head.getLong(0))
    assert(row.getLong(1) == Seq("abc").toDF("t")
      .select(RollingHash.rollingHash64($"t")).head.getLong(0))
    assert(row.getInt(2) >= 1)
  }
}
