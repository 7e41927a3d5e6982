package graft.operators

import org.apache.spark.sql.functions._

/** CdxIndex: SURT canonicalization rule matrix, CDXJ parse/render
  * round-trip, and the range-coalescing plan (gaps-and-islands
  * boundaries, overlap handling, per-file isolation, partitioning
  * invariance).
  */
class CdxIndexSpec extends graft.SparkSpec {

  test("surt rule matrix") {
    import spark.implicits._
    val cases = Seq(
      ("https://www.Example.COM/Path?b=2&a=1", "com,example)/path?a=1&b=2"),
      ("http://example.com", "com,example)/"),
      // pywb keeps non-default ports in the urlkey as host:port
      ("https://sub.host.example.org:8443/x#frag",
        "org,example,host,sub:8443)/x"),
      ("HTTP://WWW.A.B/", "b,a)/"),
      ("https://example.com/a/b/c?z=1", "com,example)/a/b/c?z=1"),
      ("example.com/noscheme?b=&a=", "com,example)/noscheme?a=&b="),
      // www2./www3. labels are stripped like www. (pywb: www\d*\.)
      ("https://www2.example.com/x", "com,example)/x"),
      ("http://WWW3.Example.com/", "com,example)/"),
      // default ports are dropped, not kept
      ("http://example.com:80/x", "com,example)/x"),
      ("https://example.com:443/x", "com,example)/x"),
      // wwwides.com must NOT lose its first label
      ("http://wwwides.com/x", "com,wwwides)/x"))
    val got = cases.map(_._1).toDF("url")
      .select(CdxIndex.surt(col("url")).as("s")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w) }
  }

  test("CDXJ render/parse round-trip") {
    import spark.implicits._
    val idx = Seq(
      ("com,example)/a", "20260815000000", "https://example.com/a", 200,
        "text/html", "sha1:AAAA", "crawl-0.warc.gz", 0L, 500L),
      ("com,example)/b", "20260815000001", "https://example.com/b", 301,
        "application/pdf", "sha1:BBBB", "crawl-1.warc.gz", 12345L, 999L))
      .toDF("urlkey", "ts", "url", "status", "mime", "digest",
        "filename", "offset", "length")
    val lines = CdxIndex.renderCdxj(idx)
    assert(lines.as[String].collect().forall(l =>
      l.matches("""\S+ \d{14} \{.*\}""")))
    val back = CdxIndex.parseCdxj(lines)
    val rows = back.orderBy("urlkey").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("urlkey") == "com,example)/a")
    assert(rows(0).getAs[Long]("offset") == 0L)
    assert(rows(1).getAs[Int]("status") == 301)
    assert(rows(1).getAs[Long]("length") == 999L)
  }

  test("planFetch coalesces ranges per file with the gap bound") {
    import spark.implicits._
    val idx = Seq(
      // file A: 0-100, 150-250 (gap 50), 1000-1100 (gap 750)
      ("k1", "f_a", 0L, 100L), ("k2", "f_a", 150L, 100L),
      ("k3", "f_a", 1000L, 100L),
      // file B: overlapping ranges merge regardless of gap
      ("k4", "f_b", 0L, 500L), ("k5", "f_b", 300L, 100L),
      // not wanted:
      ("k9", "f_a", 400L, 50L))
      .toDF("urlkey", "filename", "offset", "length")
    val wanted = Seq("k1", "k2", "k3", "k4", "k5").toDF("url")
    // identity surt for bare tokens: surt("k1") = "k1)/"... use the
    // index join seam directly by pre-shaping wanted keys
    val keyed = idx.filter(col("urlkey") =!= "k9")
    val plan = CdxIndex.planFetch(
      keyed.withColumn("urlkey", col("urlkey")),
      wanted.select(col("url")), "url", maxGap = 100)
    val _ = plan // full-path check below uses real URLs instead
    // real-URL path: k tokens as hosts
    val idx2 = keyed.withColumn("urlkey",
      CdxIndex.surt(concat(lit("https://"), col("urlkey"), lit(".com/"))))
    val wanted2 = wanted.select(
      concat(lit("HTTPS://"), col("url"), lit(".COM/")).as("url"))
    val rows = CdxIndex.planFetch(idx2, wanted2, "url", maxGap = 100)
      .orderBy("filename", "range_start").collect()
    assert(rows.map(r => (r.getAs[String]("filename"),
      r.getAs[Long]("range_start"), r.getAs[Long]("range_end"),
      r.getAs[Long]("n_records"))).toSeq == Seq(
      ("f_a", 0L, 250L, 2L),    // 0-100 + 150-250 merge (gap 50 <= 100)
      ("f_a", 1000L, 1100L, 1L),
      ("f_b", 0L, 500L, 2L)))   // overlap merges
  }

  test("dedupByDigest keeps one deterministic record per digest") {
    import spark.implicits._
    val idx = Seq(
      ("k1", "f_b", 100L, 10L, "d1"),
      ("k2", "f_a", 500L, 10L, "d1"), // wins: f_a < f_b
      ("k3", "f_a", 900L, 10L, "d1"),
      ("k4", "f_a", 0L, 10L, "d2"))
      .toDF("urlkey", "filename", "offset", "length", "digest")
    val got = CdxIndex.dedupByDigest(idx)
      .select("urlkey").as[String].collect().sorted.toSeq
    assert(got == Seq("k2", "k4"))
  }

  test("fetchRanges decodes exactly the records its ranges cover") {
    import spark.implicits._
    val pages = (0 until 10).map(i =>
      (s"https://ex.com/p$i", s"<html>body $i</html>".getBytes("UTF-8")))
    val (bytes, idx) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxfetch")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/crawl-0.warc.gz"), bytes)
    // one range over members 3..5 only (no gap coalescing needed)
    val (o3, _) = (idx(3)._2, idx(3)._3)
    val end5 = idx(5)._2 + idx(5)._3
    val plan = Seq(("crawl-0.warc.gz", o3, end5))
      .toDF("filename", "range_start", "range_end")
    val got = CdxIndex.fetchRanges(spark, dir, plan)
      .orderBy("target_uri").collect()
    assert(got.map(_.getAs[String]("target_uri")).toSeq ==
      Seq("https://ex.com/p3", "https://ex.com/p4", "https://ex.com/p5"))
    assert(got.forall(_.getAs[Int]("http_status") == 200))
    assert(got.head.getAs[String]("payload_text") == "<html>body 3</html>")
    // the digest column really is the payload md5
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("<html>body 3</html>".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(got.head.getAs[String]("payload_md5") == md)
  }

  test("maxRangeBytes splits a dense island while staying byte-complete") {
    import spark.implicits._
    // 100 contiguous 1000-byte records: one island without a cap
    val hits = (0 until 100).map(i => ("f", i.toLong * 1000, 1000L))
      .toDF("filename", "offset", "length")
    val uncapped = CdxIndex.coalesceRanges(hits, maxGap = 0).collect()
    assert(uncapped.length == 1 &&
      uncapped.head.getAs[Long]("range_bytes") == 100000L)
    val capped = CdxIndex.coalesceRanges(hits, maxGap = 0,
        maxRangeBytes = 16000L)
      .orderBy("range_start").collect()
    // every record is covered exactly once, in order, and no range
    // exceeds the cap plus one record's length
    assert(capped.map(_.getAs[Long]("n_records")).sum == 100L)
    assert(capped.head.getAs[Long]("range_start") == 0L)
    assert(capped.last.getAs[Long]("range_end") == 100000L)
    capped.sliding(2).foreach {
      case Array(a, b) => assert(
        a.getAs[Long]("range_end") == b.getAs[Long]("range_start"))
      case _ =>
    }
    assert(capped.forall(_.getAs[Long]("range_bytes") <= 17000L))
    assert(capped.length >= 6)
    // a cap outside Int addressing is rejected loudly
    intercept[IllegalArgumentException](
      CdxIndex.coalesceRanges(hits, 0, maxRangeBytes = 1L << 40))
  }

  test("fetchRanges reports each record's true member offset") {
    import spark.implicits._
    val pages = (0 until 6).map(i =>
      (s"https://ex.com/p$i", s"<html>m $i</html>".getBytes("UTF-8")))
    val (bytes, idx) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxoffsets")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/c.warc.gz"), bytes)
    val plan = Seq(("c.warc.gz", idx(1)._2, idx(4)._2 + idx(4)._3))
      .toDF("filename", "range_start", "range_end")
    val got = CdxIndex.fetchRanges(spark, dir, plan)
      .orderBy("offset").collect()
    assert(got.map(_.getAs[Long]("offset")).toSeq ==
      idx.slice(1, 5).map(_._2))
    assert(got.map(_.getAs[String]("target_uri")).toSeq ==
      (1 until 5).map(i => s"https://ex.com/p$i"))
  }

  test("recrawled URLs in one range stay disambiguated by offset") {
    import spark.implicits._
    // two captures of the SAME url, adjacent members — a coalesced
    // range decodes both; (filename, offset) tells them apart where
    // a url join would fan out
    val pages = Seq(
      ("https://ex.com/p", "<html>old</html>".getBytes("UTF-8")),
      ("https://ex.com/p", "<html>new!</html>".getBytes("UTF-8")))
    val (bytes, idx) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxrecrawl")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/r.warc.gz"), bytes)
    val plan = Seq(("r.warc.gz", 0L, idx(1)._2 + idx(1)._3))
      .toDF("filename", "range_start", "range_end")
    val got = CdxIndex.fetchRanges(spark, dir, plan)
      .orderBy("offset").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("offset") == idx(0)._2)
    assert(got(1).getAs[Long]("offset") == idx(1)._2)
    assert(got(0).getAs[String]("payload_text") == "<html>old</html>")
    assert(got(1).getAs[String]("payload_text") == "<html>new!</html>")
    assert(got(0).getAs[String]("target_uri") ==
      got(1).getAs[String]("target_uri"))
  }

  test("coalesceRanges invariants hold under randomized layouts (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 8) {
      val maxGap = rnd.nextInt(500).toLong
      val cap = (2000 + rnd.nextInt(20000)).toLong
      // members TILE a file (gzip concatenation): non-overlapping,
      // random sizes, random inter-member gaps
      val hits = (0 until 3).flatMap { f =>
        var off = rnd.nextInt(1000).toLong
        (0 until 50).map { _ =>
          val len = (1 + rnd.nextInt(3000)).toLong
          val row = (s"f_$f", off, len)
          off += len + rnd.nextInt(800)
          row
        }
      }
      val df = hits.toDF("filename", "offset", "length")
      val ranges = CdxIndex.coalesceRanges(df, maxGap, cap).collect()
        .map(r => (r.getAs[String]("filename"),
          r.getAs[Long]("range_start"), r.getAs[Long]("range_end"),
          r.getAs[Long]("n_records")))
      // every record counted exactly once
      assert(ranges.map(_._4).sum == hits.length.toLong, s"round $round")
      // ranges per file are disjoint and each start is a record offset
      val offsets = hits.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      ranges.groupBy(_._1).foreach { case (f, rs) =>
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 <= b._2, s"overlap in $f")
          case _ =>
        }
        sorted.foreach { r =>
          assert(offsets(f).contains(r._2), s"start not a record offset")
          assert(r._3 > r._2)
        }
      }
      // every record's bytes are inside some range of its file
      hits.foreach { case (f, off, len) =>
        assert(ranges.exists(r => r._1 == f && r._2 <= off &&
          off + len <= r._3), s"uncovered record $f@$off")
      }
      // no range exceeds cap + one record's max length
      assert(ranges.forall(r => r._3 - r._2 <= cap + 3000),
        s"cap breach in round $round")
    }
  }

  test("sha1B32 matches an independent base-32 derivation") {
    // 160 bits = exactly 32 base-32 digits, so RFC 4648 base32 of a
    // SHA-1 equals the digest read as a big-endian integer rendered
    // in base 32 with the RFC alphabet — an independent arithmetic
    // path that would catch alphabet or bit-order bugs
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    for (payload <- Seq("", "abc", "The quick brown fox", "üÿ")) {
      val bytes = payload.getBytes("UTF-8")
      val sha = java.security.MessageDigest.getInstance("SHA-1")
        .digest(bytes)
      var n = new java.math.BigInteger(1, sha)
      val digits = new StringBuilder
      (0 until 32).foreach { _ =>
        digits.insert(0, alphabet(n.mod(
          java.math.BigInteger.valueOf(32)).intValue()))
        n = n.shiftRight(5)
      }
      assert(CdxIndex.sha1B32(bytes) == digits.toString, payload)
    }
  }

  test("indexWarcs recovers member offsets, lengths and metadata") {
    val pages = (0 until 8).map(i =>
      (s"https://Ex.com/p$i?b=2&a=1", s"<html>idx $i</html>".getBytes("UTF-8")))
    val (bytes, idx) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxbuild")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg-0.warc.gz"), bytes)
    val built = CdxIndex.indexWarcs(spark, dir)
      .orderBy("offset").collect()
    assert(built.length == 8)
    built.zip(idx).zipWithIndex.foreach { case ((r, (uri, off, len)), i) =>
      assert(r.getAs[String]("url") == uri)
      assert(r.getAs[Long]("offset") == off)
      assert(r.getAs[Long]("length") == len)
      assert(r.getAs[String]("filename") == "seg-0.warc.gz")
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[String]("mime") == "text/html")
      assert(r.getAs[String]("ts") == "20260101000000")
      assert(r.getAs[String]("urlkey") == s"com,ex)/p$i?a=1&b=2")
      assert(r.getAs[String]("digest") ==
        CdxIndex.sha1B32(s"<html>idx $i</html>".getBytes("UTF-8")))
    }
    // the built index round-trips through the CDXJ text form
    val lines = CdxIndex.renderCdxj(CdxIndex.indexWarcs(spark, dir))
    val back = CdxIndex.parseCdxj(lines).orderBy("offset").collect()
    assert(back.length == 8)
    assert(back.map(_.getAs[Long]("offset")).toSeq ==
      idx.map(_._2).toSeq)
  }

  test("windowed indexWarcs is byte-identical to the single-window walk") {
    val pages = (0 until 16).map(i =>
      (s"https://ex.com/w$i", s"<html>win $i ${"x" * (i * 13)}</html>"
        .getBytes("UTF-8")))
    val (bytes, _) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxwin")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg-0.warc.gz"), bytes)
    val whole = CdxIndex.indexWarcs(spark, dir)
      .orderBy("offset").collect().map(_.toSeq)
    // a 64-byte window is smaller than every member: each step must
    // GROW until one member fits, emit it, then reset — many windows,
    // same rows
    val windowed = CdxIndex.indexWarcs(spark, dir,
      windowBytes = 64L, maxMemberBytes = 1L << 16)
      .orderBy("offset").collect().map(_.toSeq)
    assert(windowed.toSeq == whole.toSeq)
    // a window that lands mid-member but fits several: slides, no rescan loss
    val mid = CdxIndex.indexWarcs(spark, dir,
      windowBytes = 777L, maxMemberBytes = 1L << 16)
      .orderBy("offset").collect().map(_.toSeq)
    assert(mid.toSeq == whole.toSeq)
    // a member above maxMemberBytes fails loudly, never OOMs quietly
    val eCap = intercept[org.apache.spark.SparkException] {
      CdxIndex.indexWarcs(spark, dir,
        windowBytes = 64L, maxMemberBytes = 128L).collect()
    }
    assert(eCap.getMessage.contains("exceeds maxMemberBytes"))
    // a file truncated mid-member fails loudly, never shrinks
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg-0.warc.gz"),
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 7))
    val eTrunc = intercept[org.apache.spark.SparkException] {
      CdxIndex.indexWarcs(spark, dir).collect()
    }
    assert(eTrunc.getMessage.contains("truncated gzip member") ||
      eTrunc.getMessage.contains("truncated"))
  }

  test("indexWarcs: an archive of only empty-inflating members fails loudly") {
    // gzip members that inflate to ZERO bytes — corruption (or a
    // broken writer), not an empty crawl; the 0-byte-file check
    // cannot see it and the windowed walk must not index it to zero
    // rows silently (ADVICE r15)
    val emptyMember = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.finish(); gz.close()
      bos.toByteArray
    }
    val dir = tmpDir("cdxempty")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.warc.gz"),
      emptyMember ++ emptyMember ++ emptyMember)
    val e = intercept[org.apache.spark.SparkException] {
      CdxIndex.indexWarcs(spark, dir).collect()
    }
    assert(e.getMessage.contains("inflated to nothing"))
    // a mix (one real member) stays fine: empty members skip, real
    // records index
    val pages = Seq(("https://ex.com/ok", "<html>ok</html>".getBytes("UTF-8")))
    val (bytes, _) = WarcCodec.writeResponsesIndexed(pages)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.warc.gz"),
      emptyMember ++ bytes ++ emptyMember)
    assert(CdxIndex.indexWarcs(spark, dir).count() === 1L)
  }

  test("exportZipnum: sorted blocked shards + cluster.idx that tiles them") {
    val pages = (0 until 23).map(i =>
      (s"https://ex.com/z${"%02d".format(i)}", s"<html>zn $i</html>"
        .getBytes("UTF-8")))
    val (bytes, _) = WarcCodec.writeResponsesIndexed(pages)
    val dir = tmpDir("cdxzn")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg-0.warc.gz"), bytes)
    val idx = CdxIndex.indexWarcs(spark, dir)
    val out = tmpDir("cdxzn_out")
    CdxIndex.exportZipnum(spark, idx, out, shards = 2, linesPerBlock = 4)
    val cluster = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$out/cluster.idx"))
    assert(!cluster.isEmpty)
    // every block: addressed range gunzips to <= 4 lines starting at its key
    val all = scala.collection.mutable.ArrayBuffer[String]()
    cluster.forEach { l =>
      val Array(key, fname, off, len, _) = l.split("\t")
      val raw = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/$fname"))
      val slice = java.util.Arrays.copyOfRange(raw,
        off.toInt, off.toInt + len.toInt)
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(slice))
      val lines = new String(gz.readAllBytes(), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
      assert(lines.nonEmpty && lines.size <= 4)
      assert(lines.head.startsWith(key))
      all ++= lines
    }
    // global (urlkey, ts) order and full coverage
    assert(all.toSeq == all.toSeq.sorted)
    assert(all.size == 23)
    // blocks tile each shard file exactly
    import scala.jdk.CollectionConverters._
    cluster.asScala.toSeq.map(_.split("\t"))
      .groupBy(_(1)).foreach { case (fname, bs) =>
        val size = java.nio.file.Files.size(
          java.nio.file.Paths.get(s"$out/$fname"))
        val sorted = bs.sortBy(_(2).toLong)
        assert(sorted.head(2).toLong == 0L)
        assert(sorted.map(b => b(2).toLong + b(3).toLong).last == size)
      }
    // parseCdxj round-trip equals the source index
    import spark.implicits._
    val parsed = CdxIndex.parseCdxj(all.toSeq.toDF("line"))
    assert(parsed.exceptAll(idx).isEmpty && idx.exceptAll(parsed).isEmpty)
    // the distributed consumer reads the layout back identically
    val reread = CdxIndex.readZipnum(spark, out)
    assert(reread.exceptAll(idx).isEmpty && idx.exceptAll(reread).isEmpty)
    // prefix lookup == full filter (cluster.idx narrows the blocks)
    val probe = CdxIndex.readZipnum(spark, out,
      urlkeyPrefix = Some("com,ex)/z1"))
    val expectP = idx.filter(col("urlkey").startsWith("com,ex)/z1"))
    assert(probe.exceptAll(expectP).isEmpty &&
      expectP.exceptAll(probe).isEmpty)
    assert(probe.count() == 10) // z10..z19
    // a prefix matching nothing returns empty, not an error
    assert(CdxIndex.readZipnum(spark, out,
      urlkeyPrefix = Some("zz,nothing")).isEmpty)
    // the per-shard .idx layout variant: no cluster.idx, one
    // cdx-NNNNN.idx per shard + a tiny shards.idx top index — the
    // same consumer reads it identically, prefix narrowing included
    val out2 = tmpDir("zipnum_pershard")
    CdxIndex.exportZipnum(spark, idx, out2, shards = 3,
      linesPerBlock = 4, perShardIdx = true)
    val z2 = java.nio.file.Paths.get(out2)
    assert(!java.nio.file.Files.exists(z2.resolve("cluster.idx")))
    assert(java.nio.file.Files.exists(z2.resolve("shards.idx")))
    assert(java.nio.file.Files.list(z2).iterator().asScala
      .count(_.getFileName.toString.matches("cdx-\\d{5}\\.idx")) == 3)
    val reread2 = CdxIndex.readZipnum(spark, out2)
    assert(reread2.exceptAll(idx).isEmpty && idx.exceptAll(reread2).isEmpty)
    val probe2 = CdxIndex.readZipnum(spark, out2,
      urlkeyPrefix = Some("com,ex)/z1"))
    assert(probe2.exceptAll(expectP).isEmpty &&
      expectP.exceptAll(probe2).isEmpty)
    // prefix past every shard's keys: empty result, no 404 on a
    // concrete path (shard-narrowing falls back to the glob)
    assert(CdxIndex.readZipnum(spark, out2,
      urlkeyPrefix = Some("zz,nothing")).isEmpty)
  }

  test("plan is partitioning-invariant") {
    import spark.implicits._
    val idx = (0 until 200).map { i =>
      (s"h$i", s"f_${i % 3}", i.toLong * 97, 50L + i % 40)
    }.toDF("host", "filename", "offset", "length")
      .withColumn("urlkey",
        CdxIndex.surt(concat(lit("http://"), col("host"), lit(".com/"))))
      .drop("host")
    val wanted = (0 until 200 by 2).map(i => s"http://H$i.com/").toDF("url")
    def run(parts: Int) =
      CdxIndex.planFetch(idx.repartition(parts), wanted, "url", maxGap = 300)
        .orderBy("filename", "range_start").collect().toSeq.map(_.toString)
    assert(run(1) == run(7))
  }
}
