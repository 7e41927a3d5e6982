package graft.sink

import graft.SparkSpec
import graft.sink.DatasetMetadata._

class DatasetMetadataSpec extends SparkSpec {

  test("id: empty is '0'; equal content equal id regardless of build order") {
    assert(empty.id === "0")
    val a = empty.withDataset("x", "1").withDataset(DatasetUrnKey, "urn:a")
    val b = empty.withDataset(DatasetUrnKey, "urn:a").withDataset("x", "1")
    assert(a.id === b.id)
    assert(a.id.matches("[0-9a-f]{32}"))
    assert(a.id !== a.withDataset("x", "2").id)
    // file-level content changes the id too
    assert(a.id !== a.withFile("f1", NumRecordsKey,
      com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.numberNode(3L)).id)
  }

  test("json roundtrip preserves content and id") {
    val m = empty
      .withDataset(DatasetUrnKey, "urn:events")
      .withDatasetList(TransferEncodingKey, Seq("aes", "gzip"))
      .withDataset(NumRecordsKey, 42L)
      .withFile("part-0", NumRecordsKey,
        com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.numberNode(42L))
    val back = fromJson(m.toJson)
    assert(back === m)
    assert(back.id === m.id)
    assert(back.datasetUrn === Some("urn:events"))
    assert(back.transferEncoding === Some(List("aes", "gzip")))
  }

  test("addAll: other record overwrites") {
    val a = empty.withDataset("k", "old").withDataset("only_a", "1")
    val b = empty.withDataset("k", "new")
    val m = a.addAll(b)
    assert(m.dataset("k").asText() === "new")
    assert(m.dataset("only_a").asText() === "1")
  }

  test("mergeWithDefaults: encodings concatenate (mine first), rest fills if absent") {
    val defaults = empty
      .withDatasetList(TransferEncodingKey, Seq("gzip"))
      .withDataset(ContentTypeKey, "application/octet-stream")
      .withDataset("team", "infra")
    val mine = empty
      .withDatasetList(TransferEncodingKey, Seq("aes"))
      .withDataset(ContentTypeKey, "application/x-parquet")
    val m = mine.mergeWithDefaults(defaults)
    assert(m.transferEncoding === Some(List("aes", "gzip")))
    assert(m.dataset(ContentTypeKey).asText() === "application/x-parquet")
    assert(m.dataset("team").asText() === "infra")
    // absent own encoding takes the defaults'
    val noEnc = empty.mergeWithDefaults(defaults)
    assert(noEnc.transferEncoding === Some(List("gzip")))
  }

  test("collector dedups by id with a last-seen fast path") {
    val c = new Collector()
    val m = empty.withDataset(DatasetUrnKey, "urn:a")
    assert(c.process(Some(m)).isDefined)
    assert(c.process(Some(m)).isEmpty) // last-seen short circuit
    val rebuilt = empty.withDataset(DatasetUrnKey, "urn:a")
    val other = empty.withDataset(DatasetUrnKey, "urn:b")
    assert(c.process(Some(other)).isDefined)
    assert(c.process(Some(rebuilt)).isEmpty) // same id, already cached
    assert(c.all.size === 2)
  }

  test("collector is bounded: LRU eviction at cacheSize") {
    val c = new Collector(cacheSize = 2)
    val Seq(a, b, d) = Seq("a", "b", "d")
      .map(u => empty.withDataset(DatasetUrnKey, s"urn:$u"))
    c.process(Some(a)); c.process(Some(b))
    c.process(Some(a)) // touch a so b is oldest
    c.process(Some(d)) // evicts b
    assert(c.all.map(_.datasetUrn.get).toSet === Set("urn:a", "urn:d"))
  }

  test("collector merges defaults on admission; null metadata admits the default") {
    val defaults = empty.withDatasetList(TransferEncodingKey, Seq("gzip"))
    val c = new Collector(default = Some(defaults))
    val got = c.process(Some(empty.withDataset(DatasetUrnKey, "urn:a")))
    assert(got.get.transferEncoding === Some(List("gzip")))
    val c2 = new Collector(default = Some(defaults))
    assert(c2.process(None) === Some(defaults))
    intercept[IllegalArgumentException] { new Collector(cacheSize = 0) }
  }

  test("json merger folds records and file metrics into totals") {
    val merger = new JsonMerger
    merger.update(empty.withDataset(DatasetUrnKey, "urn:a").toJson)
    merger.updateFiles(Seq(("part-0", 10L), ("part-1", 5L)))
    merger.updateFiles(Seq(("part-2", 1L)))
    val m = merger.mergedMeta
    assert(m.datasetUrn === Some("urn:a"))
    assert(m.numRecords === 16L)
    assert(m.numFiles === 3)
    assert(m.file("part-1")(NumRecordsKey).asLong() === 5L)
    // the merged record round-trips by VALUE (Num-Files must be a
    // canonical long node, not an IntNode)
    assert(fromJson(merger.mergedJson) === m)
  }

  test("parquetFileMetrics reads footer counts per file, no data scan") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_meta_files")
    (1 to 10).toDF("v").coalesce(1).write.mode("append").parquet(dir)
    (1 to 3).toDF("v").coalesce(1).write.mode("append").parquet(dir)
    val metrics = parquetFileMetrics(spark, dir)
    assert(metrics.size === 2)
    assert(metrics.map(_._2).sorted === Seq(3L, 10L))
    assert(metrics.forall(_._1.endsWith(".parquet")))
  }
}
