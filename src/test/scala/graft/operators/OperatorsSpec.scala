package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  lazy val events = Tables.load(spark, sf(), "events").cache()

  test("filterEquals + pickFields") {
    val out = Converters.chain(
      Converters.filterEquals("event_type", "click"),
      Converters.pickFields("event_id", "value"))(events)
    assert(out.columns.toSeq == Seq("event_id", "value"))
    assert(out.count() ==
      events.filter($"event_type" === "click").count())
  }

  test("flattenNestedKeys copies nested to top level") {
    val df = Seq((1L, ("a", 2.0))).toDF("id", "s")
      .select($"id", $"s".cast("struct<x:string,y:double>"))
    val out = Converters.flattenNestedKeys("s.x", "s.y")(df)
    assert(out.columns.toSeq == Seq("id", "s", "s_x", "s_y"))
    assert(out.select("s_x").head.getString(0) == "a")
  }

  test("parseJson expands typed columns") {
    val out = Converters.parseJson("props",
      StructType(Seq(StructField("k", LongType))))(events)
    assert(out.columns.contains("k") && !out.columns.contains("props"))
    assert(out.filter($"k".isNull).count() == 0)
  }

  test("splitToRecords is 1->N explode") {
    val df = Seq((1, "a,b,c"), (2, "d")).toDF("id", "csv")
    val out = Converters.splitToRecords("csv", ",", "item")(df)
    assert(out.count() == 4)
  }

  test("splitDelimited applies names by ordinal") {
    val df = Seq("1|alice|9.5").toDF("line")
    val out = Converters.splitDelimited("line", "|", Seq("id", "name", "score"))(df)
    assert(out.columns.toSeq == Seq("id", "name", "score"))
    assert(out.head.getString(1) == "alice")
  }

  test("fork routes records to overlapping branches; forkTagged unions") {
    val branches = Converters.fork(events, Seq($"value" >= 150, $"event_type" === "purchase"))
    val tagged = Converters.forkTagged(events, Seq(
      "big" -> ($"value" >= 150), "purchases" -> ($"event_type" === "purchase")))
    assert(branches.map(_.count()).sum == tagged.count())
  }

  test("limitBy is deterministic under reordering") {
    val a = Converters.limitBy(10, $"value".desc, $"event_id")(events)
      .collect().map(_.getLong(0))
    val b = Converters.limitBy(10, $"value".desc, $"event_id")(events.repartition(7))
      .collect().map(_.getLong(0))
    assert(a.sameElements(b))
  }

  test("exact dedup is idempotent; delta dedup keeps max") {
    val df = Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (1, 2, "b2"))
      .toDF("k", "v", "payload")
    val d1 = Dedup.keepMaxBy(df, Seq("k"), Seq("v", "payload"))
    assert(d1.count() == 2)
    assert(d1.filter($"k" === 1).head.getString(2) == "b2")
    // idempotence: dedup of dedup = dedup
    val d2 = Dedup.keepMaxBy(d1, Seq("k"), Seq("v", "payload"))
    assert(d2.collect().toSet == d1.collect().toSet)
  }

  test("retention newestK + deletable partition versions correctly") {
    val versions = Seq(
      ("ds1", "2024-01-01"), ("ds1", "2024-01-02"), ("ds1", "2024-01-03"),
      ("ds2", "2024-02-01")).toDF("dataset", "version")
    val keep = Retention.newestK(versions, Seq("dataset"), Seq($"version"), 2)
    assert(keep.filter($"dataset" === "ds1").count() == 2)
    assert(keep.filter($"dataset" === "ds1").agg(min($"version")).head.getString(0) == "2024-01-02")
    val del = Retention.deletable(versions, keep)
    assert(del.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("ds1", "2024-01-01")))
  }

  test("retention combine intersect/union") {
    val versions = Seq(("d", 1), ("d", 2), ("d", 3), ("d", 4)).toDF("ds", "v")
    val newest2 = Retention.newestK(versions, Seq("ds"), Seq($"v"), 2) // v in {3,4}
    val recent = versions.filter($"v" >= 2)                            // v in {2,3,4}
    assert(Retention.keepIntersect(Seq(newest2, recent)).collect().map(_.getInt(1)).sorted.toSeq == Seq(3, 4))
    assert(Retention.keepUnion(Seq(newest2, recent)).collect().map(_.getInt(1)).sorted.toSeq == Seq(2, 3, 4))
  }

  test("compliance purge = anti join; purge + purged partitions input") {
    val data = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val del = Seq(2).toDF("del_id")
    val kept = Compliance.purge(data, del, "id", "del_id")
    val dropped = Compliance.purged(data, del, "id", "del_id")
    assert(kept.count() == 2 && dropped.count() == 1)
    assert(kept.count() + dropped.count() == data.count())
  }

  test("kAnonymize: sub-k cells fold; a sub-k fold cell is WITHHELD") {
    // 12 'a' rows + 3+2 small cells -> fold cell has 5 >= k=5: released
    val data = (Seq.fill(12)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("g")
    val got = Compliance.kAnonymize(data, Seq("g"), k = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got === Map("a" -> ((12L, false)), "OTHER" -> ((5L, true))))
    // only ONE sub-k cell (2 rows < k): the fold cell itself is sub-k
    // and must NOT be published
    val leak = (Seq.fill(12)("a") ++ Seq.fill(2)("c")).toDF("g")
    val got2 = Compliance.kAnonymize(leak, Seq("g"), k = 5)
      .collect().map(r => r.getString(0)).toSet
    assert(got2 === Set("a"), "a sub-k OTHER cell is itself a leak")
  }

  test("sessionize: gap splits sessions, ids contiguous from 1") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 00:10:00", 2L),   // same session (10 min gap)
      (1L, "2024-01-01 01:00:00", 3L),   // new session (50 min gap)
      (2L, "2024-01-01 00:00:00", 4L))
      .toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val out = Sessionize.sessionize(rows, "user_id", "ts", "event_id", 1800L * 1000000)
      .orderBy("user_id", "session_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("multimodal: fake decode features over binary column") {
    val media = Seq(
      (1L, "image", Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05)),
      (2L, "audio", Array.emptyByteArray))
      .toDF("media_id", "modality", "content")
    val feats = Multimodal.decodeFeatures(media, Multimodal.FakeDecoder)
      .collect().sortBy(_.media_id)
    assert(feats(0).n_bytes == 5 && feats(0).head_hex == "01020304")
    assert(feats(0).byte_mean == 3.0)
    assert(feats(1).n_bytes == 0 && feats(1).head_hex == "")
  }

  test("multimodal: repartitionForBytes sizes partitions") {
    val media = Seq.tabulate(10)(i => (i.toLong, "image", Array.fill[Byte](1000)(1)))
      .toDF("media_id", "modality", "content")
    assert(Multimodal.repartitionForBytes(media, 2500).rdd.getNumPartitions == 4)
  }
}
