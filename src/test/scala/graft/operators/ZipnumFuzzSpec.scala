package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

/** Seeded round-trip fuzz for the ZipNum distribution layouts: random
  * index sizes (including empty and single-row), shard counts
  * (including more shards than rows), block sizes (including 1 line
  * per block), both layouts (cluster.idx and per-shard .idx), and
  * random urlkey prefixes (matching many, one, none). Invariants:
  * [[CdxIndex.readZipnum]] equals the source index exactly, and a
  * prefix lookup equals the full read filtered — for BOTH layouts,
  * at every shape.
  */
class ZipnumFuzzSpec extends graft.SparkSpec {

  private def randomIndex(rnd: Random, n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val site = rnd.nextInt(6)
      val path = s"p${rnd.nextInt(4)}"
      (s"com,s$site)/$path", f"2026010100${rnd.nextInt(10)}%02d00",
        s"https://s$site.com/$path", 200, "text/html",
        f"d$i%08x${rnd.nextInt(1000)}%04d", f"w${rnd.nextInt(3)}.warc.gz",
        i * 97L, 50L + rnd.nextInt(100))
    }.toDF("urlkey", "ts", "url", "status", "mime", "digest",
      "filename", "offset", "length")
  }

  (1 to 12).foreach { seed =>
    test(s"random shapes round-trip in both layouts (seed $seed)") {
      val rnd = new Random(seed)
      // first five seeds pin the boundary sizes (incl. EMPTY — the
      // no-shard-ever-wrote layout) deterministically; the rest roam
      val n =
        if (seed <= 5) Seq(0, 1, 3, 25, 120)(seed - 1)
        else Seq(0, 1, 3, 25, 120)(rnd.nextInt(5))
      val shards = 1 + rnd.nextInt(6) // may exceed n
      val lpb = 1 + rnd.nextInt(9)
      val idx = randomIndex(rnd, n).cache()
      Seq(false, true).foreach { perShard =>
        val out = tmpDir(s"znfuzz${seed}_$perShard")
        CdxIndex.exportZipnum(spark, idx, out, shards, lpb,
          perShardIdx = perShard)
        val back = CdxIndex.readZipnum(spark, out)
        assert(back.exceptAll(idx).isEmpty && idx.exceptAll(back).isEmpty,
          s"seed $seed perShard=$perShard n=$n shards=$shards lpb=$lpb: " +
            "round-trip diverges")
        val prefixes = Seq("com,s0", "com,s3)/p1", "zz,nothing", "com,")
        prefixes.foreach { p =>
          val got = CdxIndex.readZipnum(spark, out, urlkeyPrefix = Some(p))
          val want = idx.filter(col("urlkey").startsWith(p))
          assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
            s"seed $seed perShard=$perShard prefix=$p: lookup diverges")
        }
      }
      idx.unpersist()
    }
  }
}
