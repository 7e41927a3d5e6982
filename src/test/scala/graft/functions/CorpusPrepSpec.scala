package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Packing

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: coverage, stride overlap, short-doc and exact-fit edges") {
    val cases = Seq(
      // 10 tokens, chunk 4, stride 3 -> ceil(6/3)+1 = 3 chunks
      ("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 3,
        Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9")),
      // exact fit: 4 tokens, chunk 4 -> one chunk
      ("a b c d", 4, 3, Seq("a b c d")),
      // shorter than a chunk -> one (short) chunk
      ("a b", 4, 3, Seq("a b")),
      // trailing partial chunk
      ("a b c d e", 4, 3, Seq("a b c d", "d e")),
      // empty text -> one empty chunk (documents always yield >=1 chunk)
      ("", 4, 3, Seq("")))
    cases.foreach { case (text, c, s, want) =>
      val got = Seq(text).toDF("text")
        .select(Text.chunkTokens(col("text"), c, s).as("ch"))
        .head().getSeq[String](0)
      assert(got == want, s"text='$text' chunk=$c stride=$s: $got")
    }
  }

  test("chunkTokens: every token position is covered at stride < chunk") {
    val text = (0 until 97).map(i => s"w$i").mkString(" ")
    val chunks = Seq(text).toDF("text")
      .select(Text.chunkTokens(col("text"), 16, 10).as("ch"))
      .head().getSeq[String](0)
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered == (0 until 97).map(i => s"w$i").toSet)
    // consecutive chunks overlap by chunk - stride = 6 tokens
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.split(" ").takeRight(6).sameElements(b.split(" ").take(6)))
      case _ =>
    }
  }

  test("benchmarkOverlap: exact hit counts, short docs surface with ratio 0") {
    val corpus = Seq(
      (1L, "a b c d e"),     // shingles: abc bcd cde
      (2L, "x y z w"),       // xyz yzw — no overlap
      (3L, "a b c x y z"),   // abc bcx cxy xyz — 2 of 4 hit
      (4L, "a b"))           // too short to shingle
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d q"), (101L, "x y z q")).toDF("doc_id", "text")
    val out = Similarity.benchmarkOverlap(corpus, bench, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byId(1L) == ((3L, 2L, 2.0 / 3.0, true)))   // abc bcd hit, cde missed
    assert(byId(2L) == ((2L, 1L, 0.5, true)))          // xyz hit, yzw missed
    assert(byId(3L) == ((4L, 2L, 0.5, true)))
    assert(byId(4L) == ((0L, 0L, 0.0, false)))         // short doc kept, ratio 0
    assert(out.length == 4, "output cardinality == corpus cardinality")
  }

  test("packGreedy: greedy fills, budget overflow opens a new sequence, oversized doc isolated") {
    val docs = Seq(
      (0L, 1L, 40), (0L, 2L, 50), (0L, 3L, 20),  // 110 > 100 -> doc 3 starts seq 1
      (0L, 4L, 150),                             // oversized -> its own seq 2
      (0L, 5L, 10),                              // seq 3 (150+10 > 100)
      (1L, 6L, 100), (1L, 7L, 1))                // shard reset: seq 0, then seq 1
      .toDF("shard", "doc_id", "n_tok")
    val got = Packing.packGreedy(docs, "shard", "doc_id", "n_tok", budget = 100)
      .orderBy("shard", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 1L), (0L, 4L, 2L), (0L, 5L, 3L),
      (1L, 6L, 0L), (1L, 7L, 1L)))
  }

  test("packGreedy: assignment is independent of input order and partitioning") {
    val base = (1L to 200L).map(i => (i % 7, i, (i * 13 % 90 + 10).toInt))
    val a = Packing.packGreedy(base.toDF("shard", "doc_id", "n_tok"),
      "shard", "doc_id", "n_tok", budget = 128).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    val b = Packing.packGreedy(
      scala.util.Random.shuffle(base).toDF("shard", "doc_id", "n_tok").repartition(13),
      "shard", "doc_id", "n_tok", budget = 128).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    assert(a.sameElements(b))
  }

  test("shardsFor: corpus-tracking shard counts; derived sharding stays partition-invariant") {
    import graft.operators.Packing.shardsFor
    assert(shardsFor(0L, 1000L) == 1 && shardsFor(999L, 1000L) == 1)
    assert(shardsFor(1000L, 1000L) == 1 && shardsFor(1001L, 1000L) == 2)
    assert(shardsFor(10_000_000_000L, 100_000L) == 100_000) // 10B docs -> 100k bounded folds
    intercept[IllegalArgumentException](shardsFor(10L, 0L))
    // packing with a shardsFor-derived shard column: same assignment
    // whatever the physical partitioning, every shard bounded near target
    val n = 600L
    val nShards = shardsFor(n, targetDocsPerShard = 50L) // 12
    val docs = (1L to n).map(i => (i % nShards, i, (i * 13 % 90 + 10).toInt))
    val a = Packing.packGreedy(docs.toDF("shard", "doc_id", "n_tok"),
      "shard", "doc_id", "n_tok", budget = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    val b = Packing.packGreedy(
      scala.util.Random.shuffle(docs).toDF("shard", "doc_id", "n_tok").repartition(17),
      "shard", "doc_id", "n_tok", budget = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    assert(a.sameElements(b))
    assert(a.groupBy(_._1).values.map(_.length).max <= 50)
  }

  test("packGreedy: no sequence except oversized singletons exceeds the budget") {
    val docs = (1L to 500L).map(i => (i % 11, i, (i * 37 % 300 + 1).toInt))
      .toDF("shard", "doc_id", "n_tok")
    val packed = Packing.packGreedy(docs, "shard", "doc_id", "n_tok", budget = 256)
    val bad = Packing.packStats(packed, budget = 256)
      .filter(col("seq_tokens") > 256 && col("n_docs") > 1)
    assert(bad.count() == 0)
  }

  test("normalize: NFC composes, stripAccents removes diacritics, both codegen==interpreted") {
    val decomposedCafe = "café"          // e + combining acute
    val cases = Seq(
      (decomposedCafe, "café", "cafe"),
      ("café", "café", "cafe"),
      ("über schön", "über schön", "uber schon"),
      ("naïve El Niño", "naïve El Niño", "naive El Nino"),
      ("plain ascii 42", "plain ascii 42", "plain ascii 42"),
      ("", "", ""))
    val df = cases.map(_._1).toDF("s")
    val out = df.select(NormalizeNfc(col("s")).as("nfc"),
      StripAccents(col("s")).as("stripped")).collect()
    out.zip(cases).foreach { case (r, (in, nfc, strip)) =>
      assert(r.getString(0) == nfc, s"nfc($in)")
      assert(r.getString(1) == strip, s"strip($in)")
    }
    // interpreted path (eval without codegen) agrees
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { case (in, nfc, strip) =>
      assert(NormalizeOps.nfc(UTF8String.fromString(in)).toString == nfc)
      assert(NormalizeOps.stripAccents(UTF8String.fromString(in)).toString == strip)
    }
  }

  test("duplicateShingleSaturation: exact doc-freq arithmetic, short docs at 0") {
    val docs = Seq(
      (1L, "a b c d"),    // abc bcd
      (2L, "a b c e"),    // abc bce
      (3L, "a b c f"),    // abc bcf  -> abc has df 3 > 2
      (4L, "x y"))        // no shingles
      .toDF("doc_id", "text")
    val out = Similarity.duplicateShingleSaturation(docs, "doc_id", "text", n = 3, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 1L, 0.5)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("url extraction, domains, blocklist") {
    val df = Seq(
      "visit https://Sub.Example.COM/path?q=1 or http://other.net",
      "no urls at all",
      "bare http://blocked.org and https://blocked.org/twice")
      .toDF("text")
    val out = df.select(
      size(Text.extractUrls(col("text"))).as("n"),
      array_join(array_sort(Text.domains(col("text"))), ",").as("d"),
      Text.hasBlockedDomain(col("text"), Seq("Blocked.ORG")).as("b")).collect()
    assert(out(0).getInt(0) == 2 && out(0).getString(1) == "other.net,sub.example.com" && !out(0).getBoolean(2))
    assert(out(1).getInt(0) == 0 && out(1).getString(1) == "" && !out(1).getBoolean(2))
    assert(out(2).getInt(0) == 2 && out(2).getString(1) == "blocked.org" && out(2).getBoolean(2))
  }

  test("sampleFractionPerGroup: per-group rates near target, membership stable under growth") {
    import graft.operators.Converters
    val base = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "rare"))
      .toDF("doc_id", "lang")
    val sampled = Converters.sampleFractionPerGroup("lang", "doc_id",
      Map("en" -> 0.25), defaultFraction = 1.0)(base)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("rare") == 2000L, "fraction 1.0 keeps every row")
    assert(math.abs(byLang("en") - 500L) < 120, s"en kept ${byLang("en")} of 2000 at 0.25")
    // growth stability: membership of the first half is unchanged when
    // the second half of the corpus arrives
    val firstHalf = Converters.sampleFractionPerGroup("lang", "doc_id",
      Map("en" -> 0.25), defaultFraction = 1.0)(base.filter(col("doc_id") <= 2000))
      .collect().map(_.getLong(0)).toSet
    val fromFull = sampled.filter(col("doc_id") <= 2000).collect().map(_.getLong(0)).toSet
    assert(firstHalf == fromFull)
  }

  test("materializeSequences: members concatenated in doc_id order, payload bounded by budget") {
    val docs = Seq(
      (1L, "one one"), (2L, "two"), (3L, "three three three"), (4L, "four"))
      .toDF("doc_id", "text")
    val counted = docs.select(col("doc_id"), lit(0L).as("shard"),
      Text.tokenCount(col("text")).as("n_tok"))
    val packed = Packing.packGreedy(counted, "shard", "doc_id", "n_tok", budget = 3)
    val seqs = Packing.materializeSequences(packed, docs, "doc_id", "text", " | ")
      .orderBy("seq_id").collect()
    // budget 3: [1,2] (2+1), [3] (3), [4]
    assert(seqs.map(_.getString(4)).toSeq ==
      Seq("one one | two", "three three three", "four"))
    assert(seqs.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((2L, 3L), (1L, 3L), (1L, 1L)))
  }

  test("topTerms: exact weights and deterministic tie-break on a toy corpus") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry date date"))
      .toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    val out = TermStats.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy(col("id"), col("weight").desc, col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, "apple", 6.0),   // tf 2 * 3 / 1
      (1L, "banana", 1.5),  // tf 1 * 3 / 2
      (2L, "banana", 1.5), (2L, "cherry", 1.5),  // tie -> term asc
      (3L, "date", 6.0), (3L, "cherry", 1.5)))
  }

  test("dropDuplicateLines: boilerplate lines drop, order preserved, empty docs survive") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "keep me\nBOILER\nand me"),
      (2L, "BOILER\nunique two"),
      (3L, "BOILER"),              // everything boilerplate -> empty
      (4L, "solo line"))
      .toDF("doc_id", "text")
    val out = Dedup.dropDuplicateLines(docs, "doc_id", "text", maxOccurrences = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, "keep me\nand me"),
      (2L, 2L, 1L, "unique two"),
      (3L, 1L, 0L, ""),
      (4L, 1L, 1L, "solo line")))
  }

  test("WavCodec: synthesize/parse roundtrip, chunk-order robustness, malformed rejection") {
    import graft.operators.Multimodal.WavCodec
    val samples = Array.tabulate(100)(i => ((i * 37) % 65536 - 32768).toShort)
    val wav = WavCodec.synthesize(16000, samples)
    val f = WavCodec.parse(7L, wav)
    assert(f.sample_rate == 16000 && f.n_channels == 1 && f.bits == 16)
    assert(f.n_samples == 100 && f.duration_us == 100L * 1000000 / 16000)
    assert(f.mean_abs_amp == samples.map(s => math.abs(s.toInt).toLong).sum.toDouble / 100)
    // an unknown chunk BEFORE fmt/data must be skipped (real WAVs carry
    // LIST/INFO chunks); splice one in after the RIFF/WAVE preamble
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val spliced = wav.take(12) ++ junk ++ wav.drop(12)
    // RIFF size field is now stale, but chunk walking doesn't use it
    assert(WavCodec.parse(8L, spliced) == f.copy(media_id = 8L))
    intercept[IllegalArgumentException](WavCodec.parse(9L, "not a wav at all....".getBytes ++ new Array[Byte](40)))
    // non-PCM format code rejected
    val nonPcm = wav.clone(); nonPcm(20) = 3 // fmt audioFormat -> 3 (float)
    intercept[IllegalArgumentException](WavCodec.parse(10L, nonPcm))
  }

  test("BmpCodec: roundtrip with stride padding, malformed rejection") {
    import graft.operators.Multimodal.BmpCodec
    // width 3 -> row bytes 9, stride 12: padding must be excluded
    val f = BmpCodec.parse(1L, BmpCodec.synthesize(3, 2, i => i % 256))
    assert(f.width == 3 && f.height == 2 && f.bpp == 24 && f.n_pixels == 6)
    assert(f.mean_intensity == (0 until 18).sum.toDouble / 18)
    intercept[IllegalArgumentException](BmpCodec.parse(2L, new Array[Byte](60)))
    val nonRgb = BmpCodec.synthesize(3, 2, _ => 0)
    nonRgb(28) = 8 // bpp -> 8
    intercept[IllegalArgumentException](BmpCodec.parse(3L, nonRgb))
  }

  test("WavCodec.resample: identity round-trips; half-rate keeps even samples") {
    import graft.operators.Multimodal.WavCodec
    val samples = Array.tabulate[Short](10)(i => (i * 100 - 500).toShort)
    val wav = WavCodec.synthesize(8000, samples)
    assert(WavCodec.resample(1L, wav, 8000).toSeq == wav.toSeq)
    val half = WavCodec.parse(2L, WavCodec.resample(2L, wav, 4000))
    assert(half.sample_rate == 4000 && half.n_samples == 5)
    val expect = Seq(0, 2, 4, 6, 8).map(i => math.abs(i * 100 - 500))
    assert(half.mean_abs_amp == expect.sum.toDouble / 5)
  }

  test("WavCodec.resample: depth-generic (8/24/32-bit stay at depth)") {
    import graft.operators.Multimodal.WavCodec
    for (bits <- Seq(8, 24, 32)) {
      val amp = bits match { case 8 => 100; case 24 => 4000000; case _ => 100000000 }
      val samples = Array.tabulate(10)(i => (i % 5) * amp / 5 - amp / 2)
      val wav = WavCodec.synthesizeDepth(8000, 1, bits, samples)
      // identity rate round-trips byte-exactly at every depth
      assert(WavCodec.resample(1L, wav, 8000).toSeq == wav.toSeq)
      val half = WavCodec.parse(2L, WavCodec.resample(2L, wav, 4000))
      assert(half.bits == bits && half.n_samples == 5)
      val expect = Seq(0, 2, 4, 6, 8)
        .map(i => math.abs((i % 5) * amp / 5 - amp / 2).toLong)
      assert(half.mean_abs_amp == expect.sum.toDouble / 5)
    }
  }

  test("WavCodec.resample: stereo frames stay phase-aligned") {
    import graft.operators.Multimodal.WavCodec
    // L channel = +frame, R channel = -frame: alignment detectable
    val frames = Array.tabulate[Short](8 * 2) { k =>
      val f = k / 2
      (if (k % 2 == 0) f * 10 else -(f * 10)).toShort
    }
    val wav = WavCodec.synthesizeInterleaved(8000, 2, frames)
    val f0 = WavCodec.parse(1L, wav)
    assert(f0.n_channels == 2 && f0.n_samples == 8)
    val half = WavCodec.parse(2L, WavCodec.resample(2L, wav, 4000))
    assert(half.n_channels == 2 && half.n_samples == 4)
    // kept frames 0,2,4,6 -> mean |amp| over both channels = 30
    assert(half.mean_abs_amp == Seq(0, 20, 40, 60).map(_ * 2).sum.toDouble / 8)
  }

  test("resizeBmp: identity keeps pixels; downsample picks floor-index sources") {
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.BmpCodec
    val src = BmpCodec.synthesize(4, 2, i => i % 256)
    val media = Seq((1L, src)).toDF("media_id", "content")
    // identity resize: re-encoded bytes parse to identical features
    val same = Multimodal.resizeBmp(media, 4, 2).collect().head
    assert(same.width == 4 && same.height == 2)
    assert(same.mean_intensity == BmpCodec.parse(1L, src).mean_intensity)
    assert(same.content.toSeq == src.toSeq) // bit-identical re-encode
    // 2x downsample keeps pixels (0,0) and (2,0) of each sampled row:
    // out pixel (ox,oy) -> src (ox*4/2, oy*2/1) = (2ox, 0)
    val half = Multimodal.resizeBmp(media, 2, 1).collect().head
    val expected = Seq(0, 1, 2, 6, 7, 8).map(_ % 256) // channels of px 0 and 2, row 0
    assert(half.mean_intensity == expected.sum.toDouble / 6)
    // the output is itself a valid BMP
    assert(BmpCodec.parse(2L, half.content).n_pixels == 2)
  }

  test("aHashBmp: flat image hashes to 0; bright top half sets the top 32 bits") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.BmpCodec
    val flat = BmpCodec.synthesize(8, 8, _ => 100)
    // bottom-up linearization: rows 0-3 (bottom) dark, rows 4-7 bright
    val split = BmpCodec.synthesize(8, 8, i => if ((i / 3) / 8 >= 4) 255 else 0)
    val media = Seq((1L, flat), (2L, split)).toDF("media_id", "content")
    val got = Multimodal.aHashBmp(media).collect().map(h => h.media_id -> h.ahash).toMap
    assert(got(1L) === 0L) // no sample is strictly brighter than the mean
    assert(got(2L) === java.lang.Long.parseUnsignedLong("ffffffff00000000", 16))
    // top-down BMPs are rejected, not silently mis-sampled
    val topDown = split.clone()
    val td = java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    td.putInt(22, -8)
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.aHashBmp(Seq((3L, topDown)).toDF("media_id", "content")).collect()
    }
    assert(err.getMessage.contains("bottom-up") || err.getCause != null)
  }

  test("aHash near-dup: identical and lightly-perturbed images pair via hammingPairs64") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.BmpCodec
    def img(perturb: Boolean) = BmpCodec.synthesize(16, 16,
      i => (((i / 3 % 16) * 16 + 7 * i) % 256 + (if (perturb && i < 48) 128 else 0)) % 256)
    val media = Seq(
      (1L, img(false)), (2L, img(false)), (3L, img(perturb = true)),
      (4L, BmpCodec.synthesize(16, 16, i => (i * 37 + 11) % 256))) // unrelated
      .toDF("media_id", "content")
    val hashes = Multimodal.aHashBmp(media).toDF().withColumn("block", lit("all"))
    val pairs = Similarity
      .hammingPairs64(hashes, "media_id", "ahash", "block", maxHamming = 8)
      .selectExpr("id_a", "id_b", "CAST(hamming AS BIGINT) AS hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(p => (p._1, p._2))
    val exact = pairs.filter(_._3 == 0).map(p => (p._1, p._2))
    assert(exact.contains((1L, 2L))) // identical images: hamming 0
    // the perturbed copy pairs with both originals at a small distance
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0))
  }

  test("hammingEdges64: same components as the full pair list, linear edges for identical groups") {
    import graft.operators.Dedup
    // 200 ids sharing ONE hash + a near hash + an unrelated hash
    val rows = (1L to 200L).map(i => ("b", i, 0x0F0FL)) ++
      Seq(("b", 300L, 0x0F0EL), ("b", 400L, -1L))
    val df = rows.toDF("block", "id", "h")
    val edges = Similarity.hammingEdges64(df, "id", "h", "block", maxHamming = 2)
    // 199 star edges + 1 rep pair (0x0F0F min-id 1 <-> 300); never C(200,2)
    assert(edges.count() === 200)
    val comps = Dedup.clusterPairs(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.clusterPairs(
      Similarity.hammingPairs64(df, "id", "h", "block", maxHamming = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === full)
    assert(comps(300L) === 1L && !comps.contains(400L))
    // random corpora: component structure always matches
    val rnd = new scala.util.Random(11)
    val hs = (1L to 60L).map(i =>
      ("blk" + (i % 2), i, (rnd.nextLong() & 0xFFL) | ((i % 5) << 32)))
    val rdf = hs.toDF("block", "id", "h")
    val a = Dedup.clusterPairs(
        Similarity.hammingEdges64(rdf, "id", "h", "block", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.clusterPairs(
        Similarity.hammingPairs64(rdf, "id", "h", "block", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("hammingPairs64 collapseIdentical: linear output on 10k bit-identical items") {
    // a hash-dominated corpus (monochrome images / silence-padded
    // audio): 10k ids share ONE hash; enumerating pairs would be
    // C(10k,2) ≈ 5*10^7 — the collapsed shape must emit exactly n-1
    // star edges (hamming 0) rooted at the min id, plus rep pairs
    val n = 10000L
    val rows = (1L to n).map(i => ("b", i, 0x5A5AL)) ++
      Seq(("b", n + 1, 0x5A5BL)) // one near hash, hamming 1
    val df = rows.toDF("block", "id", "h")
    val out = Similarity.hammingPairs64(df, "id", "h", "block",
        maxHamming = 2, collapseIdentical = true)
      .selectExpr("id_a", "id_b", "CAST(hamming AS BIGINT) AS hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === n.toInt) // (n-1) stars + 1 rep pair
    val stars = out.filter(_._3 == 0)
    assert(stars.length === n.toInt - 1 && stars.forall(_._1 == 1L))
    assert(out.count(_._3 == 1) === 1)
    assert(out.contains((1L, n + 1, 1L))) // reps pair across hashes
  }

  test("hammingPairs64 equals the brute-force definition on random hashes") {
    val rnd = new scala.util.Random(7)
    val hs = (1L to 30L).map(i =>
      ("b" + (i % 2), i, rnd.nextLong() & 0xffffL | (rnd.nextLong() & 0xf000000000000000L)))
    val df = hs.toDF("block", "id", "h")
    val got = Similarity.hammingPairs64(df, "id", "h", "block", maxHamming = 5)
      .selectExpr("id_a", "id_b", "CAST(hamming AS BIGINT) AS hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ba, ia, ha) <- hs; (bb, ib, hb) <- hs
      if ba == bb && ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 5
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
  }

  test("fingerprintWav: monotone energy sets all bits, flat signal none, short input rejected") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.WavCodec
    // 130 samples with strictly growing |amplitude| -> every window
    // energy exceeds its predecessor -> all 64 delta bits set
    val rising = WavCodec.synthesize(8000, Array.tabulate(130)(t => (t * 7).toShort))
    val flat = WavCodec.synthesize(8000, Array.fill(130)(250.toShort))
    val media = Seq((1L, rising), (2L, flat)).toDF("media_id", "content")
    val got = Multimodal.fingerprintWav(media).collect().map(h => h.media_id -> h.ahash).toMap
    assert(got(1L) === -1L) // all 64 bits
    assert(got(2L) === 0L)
    val short = WavCodec.synthesize(8000, Array.fill(64)(1.toShort))
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.fingerprintWav(Seq((3L, short)).toDF("media_id", "content")).collect()
    }
    assert(err.getMessage.contains("65") || err.getCause != null)
  }

  test("fingerprintAudio: depth-normalized across 8/16/24-bit containers") {
    import graft.operators.{FlacAudio, Multimodal}
    // base samples are multiples of 256, so the 8-bit truncation
    // (>>8 stored, <<8 normalized) is EXACT and all three depths
    // must hash identically — the mixed-depth archival corpus case
    val base = Array.tabulate(130)(t => ((((t + 7) * 37) % 120) - 60) * 256)
    val wav16 = Multimodal.WavCodec.synthesizeDepth(8000, 1, 16, base)
    val flac24 = FlacAudio.encode(8000, 1, 24, base.map(_ << 8),
      blockSize = 64)
    val wav8 = Multimodal.WavCodec.synthesizeDepth(8000, 1, 8,
      base.map(_ >> 8))
    val media = Seq((1L, wav16), (2L, flac24), (3L, wav8))
      .toDF("media_id", "content")
    val h = Multimodal.fingerprintAudio(media).collect()
      .map(x => x.media_id -> x.ahash).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) == h(3L))
  }

  test("fingerprintAudio: windows and minSamples parameters") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.WavCodec
    // 528 = 33 * 16 samples: every window holds exactly 16, so the
    // rising signal makes window energies strictly increasing
    val rising = WavCodec.synthesize(8000,
      Array.tabulate(528)(t => (t * 7).toShort))
    val media = Seq((1L, rising)).toDF("media_id", "content")
    // 33 windows -> a 32-bit hash: rising energy sets exactly bits 0-31
    val h33 = Multimodal.fingerprintAudio(media, windows = 33)
      .collect().head.ahash
    assert(h33 == 0xffffffffL)
    // minSamples above the clip length fails loudly
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.fingerprintAudio(media, windows = 65,
        minSamples = 1000).collect()
    }
    assert(err.getMessage.contains("1000") || err.getCause != null)
  }

  test("fingerprintWav near-dup: identical and head-perturbed audio pair via hammingPairs64") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.WavCodec
    def wav(perturb: Boolean) = WavCodec.synthesize(8000, Array.tabulate(130) { t =>
      (((t * 131 + 17) % 1800 - 900) + (if (perturb && t < 6) 700 else 0)).toShort
    })
    val media = Seq(
      (1L, wav(false)), (2L, wav(false)), (3L, wav(perturb = true)),
      (4L, WavCodec.synthesize(8000, Array.tabulate(130)(t => ((t * 997) % 1800 - 900).toShort))))
      .toDF("media_id", "content")
    val hashes = Multimodal.fingerprintWav(media).toDF().withColumn("block", lit("all"))
    val pairs = Similarity
      .hammingPairs64(hashes, "media_id", "ahash", "block", maxHamming = 8)
      .selectExpr("id_a", "id_b", "CAST(hamming AS BIGINT) AS hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0L))
  }

  test("Mp4Codec.tracks: tkhd/mdhd/hdlr/stsd metadata round-trips") {
    import graft.operators.Multimodal.Mp4Codec
    val mp4 = Mp4Codec.synthesizeTracks(1000, 9000, Seq(
      ("vide", "avc1", "eng", 600, 1800),
      ("soun", "mp4a", "deu", 48000, 96000),
      ("text", "tx3g", "und", 1000, 2500)))
    val ts = Mp4Codec.tracks(1L, mp4)
    assert(ts.map(t => (t.trackId, t.handler, t.codec, t.language,
      t.timescale, t.durationMs)) == Seq(
      (1L, "vide", "avc1", "eng", 600L, 3000L),
      (2L, "soun", "mp4a", "deu", 48000L, 2000L),
      (3L, "text", "tx3g", "und", 1000L, 2500L)))
    // the container-level probe still agrees on the track count
    assert(Mp4Codec.parse(1L, mp4).n_tracks == 3)
    val e = intercept[IllegalArgumentException](
      Mp4Codec.tracks(2L, Mp4Codec.synthesize(900, 1000, 1)))
    assert(e.getMessage.contains("media 2")) // bare trak: no tkhd
  }

  test("Mp4Codec: probe roundtrip, sniff dispatch, malformed rejection") {
    import graft.operators.Multimodal
    import Multimodal.Mp4Codec
    val mp4 = Mp4Codec.synthesize(timescale = 900, duration = 45000, nTracks = 2)
    val f = Mp4Codec.parse(5L, mp4)
    assert(f.brand == "isom" && f.timescale == 900 && f.duration_units == 45000)
    assert(f.duration_ms == 45000L * 1000 / 900 && f.n_tracks == 2)
    assert(Multimodal.sniffModality(mp4) == "video/mp4")
    intercept[IllegalArgumentException](Mp4Codec.parse(6L, new Array[Byte](32)))
    // mvhd version 1 (64-bit fields) is explicitly unsupported
    val v1 = mp4.clone(); v1(16 + 8 + 8) = 1
    intercept[IllegalArgumentException](Mp4Codec.parse(7L, v1))
  }

  test("topNgramPerDoc: known top bigram, deterministic tie, short docs surface empty") {
    val docs = Seq(
      (1L, "a b a b a b c"),       // top bigram "a b" x3, 13 chars
      (2L, "x y"),                  // single bigram
      (3L, "solo"),                 // too short for a bigram
      (4L, "t t t t")               // "t t" x3 (non-overlap counted per position: 3)
    ).toDF("doc_id", "text")
    val out = TermStats.topNgramPerDoc(docs, "doc_id", "text", 2)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a b" && out(0).getLong(2) == 3L)
    assert(out(0).getDouble(3) == 3.0 * 3 / 13)
    assert(out(1).getString(1) == "x y" && out(1).getLong(2) == 1L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0L && out(2).getDouble(3) == 0.0)
    assert(out(3).getString(1) == "t t" && out(3).getLong(2) == 3L)
  }

  test("symbolWordRatio counts hash marks and ellipses per word") {
    val df = Seq("plain words only", "x ## y ... z", "").toDF("s")
    val r = df.select(Text.symbolWordRatio(col("s"))).collect().map(_.getDouble(0))
    assert(r(0) == 0.0)
    assert(r(1) == 3.0 / 5.0) // '#','#','...' over 5 words
    assert(r(2) == 0.0)
  }

  test("semanticDedup: planted duplicates drop to the min-id survivor; clusters bound pairs") {
    import graft.functions.Ann
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d + 1).toFloat))
    }
    // plant exact duplicates of vectors 3 and 7 at higher ids
    val dups = Seq((103L, base(3)._2.clone()), (107L, base(7)._2.clone()),
      (203L, base(3)._2.clone()))
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val index = Ann.sampledIvf(emb, k = 4)
    val out = Ann.semanticDedup(emb, index, threshold = 0.999999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out(3L) && out(7L), "min-id originals survive")
    assert(!out(103L) && !out(107L) && !out(203L), "planted duplicates drop")
    assert(out.count(!_._2) == 3, "nothing else drops at a ~1.0 threshold")
  }

  test("codecs: adversarial size fields terminate with errors, never hang") {
    import graft.operators.Multimodal.{WavCodec, BmpCodec, Mp4Codec}
    val wav = WavCodec.synthesize(16000, Array.tabulate(50)(_.toShort))

    // WAV chunk size 0xFFFFFFF8: previously cl.toInt wrapped negative and
    // the walk advanced by 0 forever — must now reject as overrun
    val hugeChunk = wav.clone()
    hugeChunk(16) = 0xF8.toByte; hugeChunk(17) = 0xFF.toByte
    hugeChunk(18) = 0xFF.toByte; hugeChunk(19) = 0xFF.toByte // fmt size
    intercept[IllegalArgumentException](WavCodec.parse(1L, hugeChunk))

    // zero blockAlign: previously divide-by-zero
    val zeroAlign = wav.clone(); zeroAlign(32) = 0; zeroAlign(33) = 0
    intercept[IllegalArgumentException](WavCodec.parse(2L, zeroAlign))

    // top-down BMP (negative height): real files use this; stats must match
    // the bottom-up image since intensity is row-order independent
    val bmp = BmpCodec.synthesize(3, 2, i => i % 256)
    val topDown = bmp.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(negH, 0, topDown, 22, 4)
    val f = BmpCodec.parse(3L, topDown)
    assert(f.height == 2 && f.n_pixels == 6 && f.mean_intensity == (0 until 18).sum.toDouble / 18)

    // BMP whose declared pixel data overruns the buffer: clean error,
    // not ArrayIndexOutOfBounds
    val overrun = bmp.clone()
    val bigH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1000000).array()
    System.arraycopy(bigH, 0, overrun, 22, 4)
    intercept[IllegalArgumentException](BmpCodec.parse(4L, overrun))

    // MP4 box size larger than buffer: previously size.toInt could wrap
    // negative and loop forever — must reject
    val mp4 = Mp4Codec.synthesize(900, 9000, 1)
    val hugeBox = mp4.clone()
    hugeBox(16) = 0xFF.toByte; hugeBox(17) = 0xFF.toByte
    hugeBox(18) = 0xFF.toByte; hugeBox(19) = 0xF0.toByte // moov size
    intercept[IllegalArgumentException](Mp4Codec.parse(5L, hugeBox))
  }

  test("perceptual-hash fuzz: header-mutated containers error or hash, never hang or overrun") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{BmpCodec, WavCodec}
    import spark.implicits._
    val rnd = new scala.util.Random(0xA5A5)
    val bmp = BmpCodec.synthesize(10, 8, i => (i * 13) % 256)
    val wav = WavCodec.synthesize(8000, Array.tabulate(130)(t => (t * 9).toShort))
    (1 to 40).foreach { i =>
      def mutate(src: Array[Byte]): Array[Byte] = {
        val b = src.clone()
        // corrupt a header/structure byte (first 64) — the region the
        // walkers interpret; pixel/sample bytes can't break indexing
        b(rnd.nextInt(math.min(64, b.length))) = rnd.nextInt(256).toByte
        if (i % 5 == 0) b.take(8 + rnd.nextInt(b.length - 8)) else b
      }
      def attempt(f: => Any): Unit =
        try { f; () } catch {
          case _: org.apache.spark.SparkException => () // wrapped require
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"iter $i: unexpected ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      attempt(Multimodal.aHashBmp(
        Seq((i.toLong, mutate(bmp))).toDF("media_id", "content")).collect())
      attempt(Multimodal.fingerprintWav(
        Seq((i.toLong, mutate(wav))).toDF("media_id", "content")).collect())
    }
  }

  test("codec fuzz: 500 random byte blobs per codec — error or parse, never hang") {
    import graft.operators.Multimodal.{WavCodec, BmpCodec, Mp4Codec}
    val rnd = new scala.util.Random(0xC0DEC)
    (1 to 500).foreach { i =>
      val len = rnd.nextInt(4096)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      // seed some with valid magic so the walkers actually engage
      if (i % 3 == 0 && len >= 12) {
        System.arraycopy("RIFF".getBytes, 0, bytes, 0, 4)
        System.arraycopy("WAVE".getBytes, 0, bytes, 8, 4)
      } else if (i % 3 == 1 && len >= 2) {
        bytes(0) = 'B'; bytes(1) = 'M'
      } else if (len >= 8) {
        System.arraycopy("ftyp".getBytes, 0, bytes, 4, 4)
      }
      def attempt(f: => Any): Unit =
        try { f; () } catch {
          case _: IllegalArgumentException => () // the contract
          case e: Throwable => fail(s"seed $i: unexpected ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      attempt(WavCodec.parse(i.toLong, bytes))
      attempt(BmpCodec.parse(i.toLong, bytes))
      attempt(Mp4Codec.parse(i.toLong, bytes))
    }

    // crafted: short fmt chunk / short mvhd ending AT the buffer edge
    // previously read past their chunk into (or beyond) the buffer
    val shortFmt = "RIFF".getBytes ++ Array[Byte](20, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 0, 1, 0)
    intercept[IllegalArgumentException](WavCodec.parse(1L, shortFmt))
    val shortMvhd = java.nio.ByteBuffer.allocate(32)
      .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      .putInt(16).put("moov".getBytes)
      .putInt(8).put("mvhd".getBytes).array()
    intercept[IllegalArgumentException](Mp4Codec.parse(2L, shortMvhd))
  }

  test("normalize: NFC(x) and NFC(NFD(x)) hash to the same fingerprint") {
    val df = Seq("café déjà-vu", "café déjà-vu").toDF("s")
    val fps = df.select(Text.fingerprint(NormalizeNfc(col("s")))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }
}
