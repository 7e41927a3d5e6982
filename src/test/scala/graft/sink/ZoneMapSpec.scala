package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zone-map data skipping on the ShardedTable manifest: stats are
  * committed with the delta, carried over untouched, and readRange
  * provably opens only intersecting partitions' files.
  */
class ZoneMapSpec extends SparkSpec {

  private def mkTable(root: String) =
    new ShardedTable(root, "shard", spark.sparkContext.hadoopConfiguration)

  import spark.implicits._

  private def rows(ids: Range, shardOf: Int => Int) =
    ids.map(i => (shardOf(i).toLong, i.toLong, s"w${i / 100}", s"t$i"))
      .toDF("shard", "id", "word", "payload")

  /** inputFiles render as `file:///...`, manifest dirs as Hadoop's
    * `file:/...` — compare on the URI path component of both.
    */
  private def paths(files: Seq[String]): Seq[String] =
    files.map(f => new java.net.URI(f).getPath)

  private def dirOf(m: Map[String, String], part: String): String =
    new java.net.URI(m(part)).getPath

  test("commit records per-partition min/max; readRange opens ONLY intersecting shards") {
    val t = mkTable(tmpDir("zm") + "/t")
    // clustered layout: shard = id / 100 (ingest order), 5 shards
    t.commit(rows(0 until 500, _ / 100), (0 to 4).map(_.toString),
      statsCols = Seq("id", "word"))
    val stats = t.zoneStats(t.currentVersion.get)
    assert(stats("0")("id") == (("0", "99")))
    assert(stats("3")("id") == (("300", "399")))
    assert(stats("2")("word") == (("w2", "w2")))

    val pruned = t.readRange(spark, "id", Some("150"), Some("249"))
    // result correctness: superset of the range, nothing outside the
    // kept shards; residual filter gives the exact answer
    assert(pruned.filter(col("id").between(150, 249)).count() == 100)
    // file-level proof: every opened file lives in shard 1 or 2's dir
    val m = t.manifest(t.currentVersion.get)
    val keptDirs = Seq(dirOf(m, "1"), dirOf(m, "2"))
    val opened = paths(pruned.inputFiles.toSeq)
    assert(opened.nonEmpty)
    assert(opened.forall(f => keptDirs.exists(d => f.startsWith(d))),
      s"read outside pruned shards: ${opened.filterNot(f => keptDirs.exists(f.startsWith))}")
    // and strictly fewer files than the full table
    assert(opened.size < t.readCurrent(spark).inputFiles.length)
  }

  test("string-typed zone maps prune lexicographically") {
    val t = mkTable(tmpDir("zm") + "/t")
    t.commit(rows(0 until 300, _ / 100), (0 to 2).map(_.toString),
      statsCols = Seq("word"))
    val m = t.manifest(t.currentVersion.get)
    val opened = paths(t.readRange(spark, "word", Some("w1"), Some("w1")).inputFiles.toSeq)
    assert(opened.forall(_.startsWith(dirOf(m, "1"))))
  }

  test("columns without stats never prune (conservative), including half-open ranges") {
    val t = mkTable(tmpDir("zm") + "/t")
    t.commit(rows(0 until 200, _ / 100), Seq("0", "1"), statsCols = Seq("id"))
    // 'payload' has no stats: every shard read
    assert(t.readRange(spark, "payload", Some("zzz"), None).count() == 200)
    // half-open on the statted column still prunes
    val m = t.manifest(t.currentVersion.get)
    val opened = paths(t.readRange(spark, "id", Some("100"), None).inputFiles.toSeq)
    assert(opened.forall(_.startsWith(dirOf(m, "1"))))
  }

  test("incremental commit refreshes touched stats and carries untouched ones") {
    val t = mkTable(tmpDir("zm") + "/t")
    t.commit(rows(0 until 300, _ / 100), (0 to 2).map(_.toString),
      statsCols = Seq("id"))
    // rewrite shard 1 with ids shifted up: stats must follow the data
    val delta = (1000 until 1050).map(i => (1L, i.toLong, "w9", s"t$i"))
      .toDF("shard", "id", "word", "payload")
    t.commit(delta, Seq("1"), statsCols = Seq("id"))
    val stats = t.zoneStats(t.currentVersion.get)
    assert(stats("1")("id") == (("1000", "1049")))
    assert(stats("0")("id") == (("0", "99"))) // carried, untouched
    assert(stats("2")("id") == (("200", "299")))
    // prune with the refreshed stats: [0, 500] no longer touches shard 1
    val m = t.manifest(t.currentVersion.get)
    val opened = paths(t.readRange(spark, "id", Some("0"), Some("500")).inputFiles.toSeq)
    assert(opened.forall(f => f.startsWith(dirOf(m, "0")) || f.startsWith(dirOf(m, "2"))))
  }

  test("numeric zone maps compare numerically, not lexicographically") {
    val t = mkTable(tmpDir("zm") + "/t")
    // shard 0: ids 2..9, shard 1: ids 10..19 — lexicographic min/max
    // would make "9" > "10" and mis-prune
    val df = ((2 until 10).map(i => (0L, i.toLong)) ++
      (10 until 20).map(i => (1L, i.toLong))).toDF("shard", "id")
    t.commit(df, Seq("0", "1"), statsCols = Seq("id"))
    assert(t.readRange(spark, "id", Some("9"), Some("11"))
      .filter(col("id").between(9, 11)).select("id").as[Long].collect().sorted
      .sameElements(Array(9L, 10L, 11L)))
  }

  test("timestamp/date/double zone maps prune with exact typed comparisons") {
    val t = mkTable(tmpDir("zm") + "/t")
    // 3 day-shards of hourly rows + a double measure per row
    val df = (0 until 72).map { h =>
      ((h / 24).toLong, f"2024-01-${10 + h / 24}%02d ${h % 24}%02d:30:00",
        f"2024-01-${10 + h / 24}%02d", h.toDouble / 8.0)
    }.toDF("shard", "tss", "days", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("day", col("days").cast("date"))
      .select("shard", "ts", "day", "v")
    t.commit(df, Seq("0", "1", "2"), statsCols = Seq("ts", "day", "v"))
    val m = t.manifest(t.currentVersion.get)
    def mic(s: String): String =
      (java.time.Instant.parse(s).toEpochMilli * 1000L).toString
    // timestamp bounds are epoch-micros strings (UTC session)
    val tsOpened = paths(t.readRange(spark, "ts",
      Some(mic("2024-01-11T00:00:00Z")), Some(mic("2024-01-11T23:59:59Z")))
      .inputFiles.toSeq)
    assert(tsOpened.nonEmpty && tsOpened.forall(_.startsWith(dirOf(m, "1"))))
    // date bounds are ISO strings
    val dayOpened = paths(t.readRange(spark, "day",
      Some("2024-01-12"), None).inputFiles.toSeq)
    assert(dayOpened.nonEmpty && dayOpened.forall(_.startsWith(dirOf(m, "2"))))
    // double bounds compare NUMERICALLY: lexicographic "10.0" < "6.0"
    // would prune shard 2 (v in [6.0, 8.875]) away
    val vOpened = paths(t.readRange(spark, "v",
      Some("5.95"), Some("10.0")).inputFiles.toSeq)
    assert(vOpened.nonEmpty && vOpened.forall(_.startsWith(dirOf(m, "2"))))
    // pruning + residual == exact answer
    assert(t.readRange(spark, "v", Some("3.5"), Some("5.9"))
      .filter(col("v").between(3.5, 5.9)).count() ===
      df.filter(col("v").between(3.5, 5.9)).count())
  }

  test("NaN double stats never prune their shard (conservative)") {
    val t = mkTable(tmpDir("zm") + "/t")
    val df = Seq((0L, 1.0), (0L, Double.NaN), (1L, 100.0)).toDF("shard", "v")
    t.commit(df, Seq("0", "1"), statsCols = Seq("v"))
    // shard 0's max renders NaN; comparisons with NaN are false, so
    // the shard is kept for any range and results never change
    assert(t.readRange(spark, "v", Some("0.5"), Some("2.0"))
      .filter(col("v").between(0.5, 2.0)).count() === 1)
    // the NaN shard is conservatively KEPT even for [50, inf): its max
    // is unknowable, so both shards' 3 rows come back pre-filter
    assert(t.readRange(spark, "v", Some("50.0"), None).count() === 3)
  }

  test("zone-map type changes and ':' in names are rejected loudly") {
    val t = mkTable(tmpDir("zm") + "/t")
    t.commit(rows(0 until 100, _ => 0), Seq("0"), statsCols = Seq("id"))
    val asString = rows(100 until 200, _ => 1)
      .withColumn("id", col("id").cast("string"))
    intercept[IllegalArgumentException] {
      t.commit(asString, Seq("1"), statsCols = Seq("id"))
    }
    intercept[IllegalArgumentException] {
      t.commit(rows(0 until 10, _ => 2).withColumnRenamed("word", "a:b"),
        Seq("2"), statsCols = Seq("a:b"))
    }
  }

  test("property: pruned range read + residual filter == full scan filter, random layouts") {
    val rnd = new scala.util.Random(271828)
    for (trial <- 1 to 3) {
      val t = mkTable(tmpDir("zmprop") + "/t")
      // random non-clustered layout: ids land in shards by a random mix
      // of locality and scatter, so zones OVERLAP — pruning must still
      // never change results, only skip provably-disjoint shards
      val nShards = 3 + rnd.nextInt(5)
      val rows = (0 until 1500).map { i =>
        val shard = if (rnd.nextBoolean()) (i * nShards / 1500) else rnd.nextInt(nShards)
        (shard.toLong, rnd.nextInt(10000).toLong)
      }
      t.commit(rows.toDF("shard", "id"), (0 until nShards).map(_.toString),
        statsCols = Seq("id"))
      for (_ <- 1 to 4) {
        val a = rnd.nextInt(10000).toLong
        val b = a + rnd.nextInt(3000)
        val pruned = t.readRange(spark, "id", Some(a.toString), Some(b.toString))
          .filter(col("id").between(a, b)).select("id")
          .as[Long].collect().sorted.toSeq
        val full = rows.map(_._2).filter(v => v >= a && v <= b).sorted
        assert(pruned == full, s"trial $trial range [$a,$b]")
      }
    }
  }

  test("all-null stat columns record no stats and stay readable") {
    val t = mkTable(tmpDir("zm") + "/t")
    val df = (0 until 50).map(i => (0L, i.toLong))
      .toDF("shard", "id").withColumn("word", lit(null).cast("string"))
    t.commit(df, Seq("0"), statsCols = Seq("id", "word"))
    assert(t.zoneStats(t.currentVersion.get)("0").get("word").isEmpty)
    assert(t.readRange(spark, "word", Some("a"), Some("b")).count() == 50)
  }
}
