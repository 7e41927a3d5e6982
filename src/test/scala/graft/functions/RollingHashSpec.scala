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

  test("mulmod is exact multiplication mod 2^61-1 (vs BigInteger)") {
    import java.math.BigInteger
    val M = BigInteger.valueOf(RollingHashOps.Mod)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5000) {
      val a = math.abs(rnd.nextLong()) % RollingHashOps.Mod
      val b = math.abs(rnd.nextLong()) % RollingHashOps.Mod
      val want = BigInteger.valueOf(a).multiply(BigInteger.valueOf(b)).mod(M).longValueExact()
      assert(RollingHashOps.mulmod(a, b) == want, s"mulmod($a, $b)")
    }
    // boundary operands
    for (a <- Seq(0L, 1L, RollingHashOps.Mod - 1); b <- Seq(0L, 1L, RollingHashOps.Mod - 1)) {
      val want = BigInteger.valueOf(a).multiply(BigInteger.valueOf(b)).mod(M).longValueExact()
      assert(RollingHashOps.mulmod(a, b) == want, s"mulmod($a, $b)")
    }
  }

  test("chunk boundaries match a naive BigInteger reference (rolled window == fresh window)") {
    import java.math.BigInteger
    val M = BigInteger.valueOf(RollingHashOps.Mod)
    val B = BigInteger.valueOf(RollingHashOps.Base)
    def poly(bytes: Array[Byte], from: Int, until: Int): Long = {
      var h = BigInteger.ZERO
      for (i <- from until until) h = h.multiply(B).add(BigInteger.valueOf((bytes(i) & 0xff) + 1L)).mod(M)
      h.longValueExact()
    }
    // naive reimplementation of the content-defined chunking: window
    // hash at i computed FRESH from the last w bytes each time
    def naiveChunks(s: String, w: Int, maskBits: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      val mask = (1L << maskBits) - 1
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var start = 0
      for (i <- bytes.indices) {
        if (i >= w - 1 && (poly(bytes, i - w + 1, i + 1) & mask) == mask) {
          out += poly(bytes, start, i + 1)
          start = i + 1
        }
      }
      if (start < bytes.length) out += poly(bytes, start, bytes.length)
      out.toSeq
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 30) {
      val len = 50 + rnd.nextInt(500)
      val s = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val got = Seq(s).toDF("t")
        .select(RollingHash.contentChunkHashes($"t", 16, 4).as("c"))
        .head.getSeq[Long](0)
      assert(got == naiveChunks(s, 16, 4), s"trial $trial")
    }
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
