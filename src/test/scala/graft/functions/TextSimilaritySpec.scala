package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("collect_list_capped: SQL-registered, buffers capped at cap+1, complete below cap") {
    graft.plans.GraftExtensions.register(spark)
    (1 to 100).map(i => (i % 2, i)).toDF("k", "v").createOrReplaceTempView("clc_t")
    val rows = spark.sql(
      """SELECT k, size(collect_list_capped(v, 5)) AS capped,
        |       size(collect_list_capped(v, 200)) AS full
        |FROM clc_t GROUP BY k ORDER BY k""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == 6, "overflowing group truncates to cap+1 (overflow observable)")
      assert(r.getInt(2) == 50, "groups below the cap keep the complete list")
    }
  }

  test("scrubPii: redacts emails, IPv4s, phone fragments; leaves clean text alone") {
    val cases = Seq(
      ("write to alice.smith+x@sub.example.org today", "write to <EMAIL> today"),
      ("server at 192.168.0.1 responded", "server at <IP> responded"),
      ("call 555-0142 now", "call <PHONE> now"),
      ("a@b.co and 10.0.0.7 and 555-1234", "<EMAIL> and <IP> and <PHONE>"),
      ("no pii here, just words and 42", "no pii here, just words and 42"),
      ("version 1.2.3 stays", "version 1.2.3 stays"))
    val out = cases.map(_._1).toDF("text")
      .select(Text.scrubPii(col("text"))).collect().map(_.getString(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) => assert(got == want) }
  }

  test("stripHtml: tags, entities (no double-decode), whitespace collapse") {
    import spark.implicits._
    val out = Seq(
      "<div class='x'>a  <b>b</b></div>",
      "&amp;lt; stays encoded-ish; &lt;tag&gt; decodes",
      "plain text untouched").toDF("t")
      .select(Text.stripHtml($"t")).collect().map(_.getString(0))
    assert(out(0) == "a b")
    // &amp;lt; -> "&lt;" literally (amp decoded LAST, no second pass)
    assert(out(1) == "&lt; stays encoded-ish; <tag> decodes")
    assert(out(2) == "plain text untouched")
  }

  test("normalizeUrl: case, default ports, fragment, utm, trailing slash") {
    import spark.implicits._
    val cases = Seq(
      "HTTP://Example.COM:80/A/B/?utm_source=x&q=1#top" ->
        "http://example.com/A/B/?q=1",
      "https://Host.org:8443/keep:port" ->
        "https://host.org:8443/keep:port", // only default ports stripped
      "https://a.b:80/x" -> "https://a.b:80/x", // :80 NOT default on https
      "https://a.b/" -> "https://a.b",
      "https://a.b/?utm_x=1" -> "https://a.b",
      // consecutive utm run collapses; embedded 'utm_' substrings and
      // non-utm params survive
      "https://a.b/?utm_a=1&utm_b=2&id=3" -> "https://a.b/?id=3",
      "https://a.b/?xutm_source=1&q=2" -> "https://a.b/?xutm_source=1&q=2",
      "https://a.b/?id=3&utm_a=1" -> "https://a.b/?id=3",
      "not a url at all" -> "not a url at all")
    val out = cases.map(_._1).toDF("u")
      .select(Text.normalizeUrl($"u")).collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("dupNgramRatio: exact counts on known repetition") {
    val df = Seq(
      ("a b a b a b", 0.6),       // bigrams: ab ba ab ba ab -> 5 grams, 2 unique
      ("a b c d", 0.0),           // all unique
      ("x", 0.0),                 // shorter than n
      ("w w w w", 2.0 / 3.0))     // ww ww ww -> 3 grams, 1 unique
      .toDF("text", "want")
    df.select(Text.dupNgramRatio(col("text"), 2).as("got"), col("want"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12, r.toString))
  }

  test("tokens/shingles basics") {
    val df = Seq("a b c d", "x", "").toDF("text")
    val out = df.select(
      Text.tokenCount($"text").as("n"),
      Text.shingles($"text", 2).as("sh")).collect()
    assert(out(0).getInt(0) == 4)
    assert(out(0).getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(out(1).getSeq[String](1).isEmpty) // fewer tokens than n
    assert(out(2).getInt(0) == 0)
  }

  test("fingerprint matches reference md5 hex") {
    val got = Seq("hello").toDF("text")
      .select(Text.fingerprint($"text")).head.getString(0)
    assert(got == "5d41402abc4b2a76b9719d911017c592")
  }

  test("langId picks dominant marker language, und when none") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist hier",
      "zzz qqq www").toDF("text")
    val out = df.select(Text.langId($"text")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("quality score components") {
    val good = ("w " * 25 + "the end").trim         // >20 tokens, has stopword, no punct
    val short = "tiny doc"
    val out = Seq(good, short).toDF("text")
      .select(Text.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(out(0) == 1.0)
    assert(out(1) == 0.2) // only punct-ok
  }

  test("minhash signatures: identical docs agree, est-jaccard tracks exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),  // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup
      (4L, "completely different content about spark engines and data pipelines yes"))
      .toDF("doc_id", "text")
    val sigs = Similarity.minhashSignatures(docs, "doc_id", "text", shingleN = 3, numHashes = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val est13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }.toDouble / 32
    val est14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }.toDouble / 32
    assert(est13 > est14, s"near-dup $est13 should beat unrelated $est14")
    assert(est13 > 0.5)
  }

  test("LSH candidates contain the exact near-dup pairs (recall)") {
    val base = "data engine spark shuffle partition join aggregate filter scan codegen " * 3
    val docs = Seq(
      (1L, base + "alpha"), (2L, base + "beta"),   // near-dups of each other
      (3L, "totally unrelated words one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val cands = Similarity.lshCandidatePairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8) // 8 bands of 2 -> high recall
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    val dups = Similarity.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, shingleN = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((1L, 2L)))
  }

  test("simhash: identical -> 0 hamming; perturbed small; unrelated large") {
    val df = Seq(
      (1L, "spark data engine partition shuffle aggregate join scan filter window"),
      (2L, "spark data engine partition shuffle aggregate join scan filter window"),
      (3L, "spark data engine partition shuffle aggregate join scan filter windows"),
      (4L, "entirely different vocabulary about cooking pasta tomatoes basil garlic"))
      .toDF("id", "text")
      .select($"id", Similarity.simhash64($"text").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) == 0)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("cosine: self-similarity 1, orthogonal 0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 2.0f)), (3L, Array(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.similarPairs(df, df, threshold = -1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(pairs((1L, 3L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((1L, 2L))) < 1e-12)
  }

  test("bruteForceTopK returns k ordered neighbors, excludes self") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
    val probes = e.filter($"vec_id" === 0)
    val out = Similarity.bruteForceTopK(probes, e, k = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) != 0L))
    val sims = out.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("fnv expressions match the reference FNV-1a 64 vectors") {
    // vectors from the public FNV reference implementation
    val got = Seq("abc", "", "hello").toDF("s")
      .select(Fnv64($"s")).collect().map(_.getLong(0))
    assert(got(0) == 0xe71fa2190541574bL)
    assert(got(1) == 0xcbf29ce484222325L) // offset basis for empty input
    assert(got(2) == 0xa430d84680aabd0bL)
  }

  test("fnv shingle hashes == fnv64 of the space-joined shingle strings") {
    val df = Seq("the  quick brown fox jumps", "a b", "").toDF("text")
    val viaShingles = df.select(FnvShingleHashes($"text", 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    val viaStrings = df.select(
      transform(Text.shingles($"text", 3), s => Fnv64(s)).as("h"))
      .collect().map(_.getSeq[Long](0))
    viaShingles.zip(viaStrings).foreach { case (a, b) => assert(a == b) }
    assert(viaShingles(1).isEmpty && viaShingles(2).isEmpty)
  }

  test("banded simhashPairs == naive block self-join (pigeonhole exactness)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val banded = Similarity.simhashPairs(docs, "doc_id", "text", "source", maxHamming = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val sh = docs.select($"source", $"doc_id", Similarity.simhashFnv64($"text").as("sh"))
    val naive = sh.as("a").join(sh.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select($"a.source", $"a.doc_id", $"b.doc_id",
        Similarity.hamming64($"a.sh", $"b.sh").as("hamming"))
      .filter($"hamming" <= 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(banded == naive)
    assert(banded.nonEmpty) // the fixture must actually exercise the path
  }

  test("simhashPairs candidate generation is an equi-join, not a cross blowup") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val plan = Similarity.simhashPairs(docs, "doc_id", "text", "source", maxHamming = 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "banded pairs must not cross join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "banded pairs must not BNLJ")
  }

  test("brute-force broadcast hint is gated on probe count") {
    val e = graft.Tables.load(spark, sf(), "embeddings")
    val few = e.limit(10)
    val hinted = Similarity.bruteForceTopK(few, e, k = 3)
      .queryExecution.analyzed.toString
    assert(hinted.contains("ResolvedHint"), "small probe set should carry the broadcast hint")
    // a probe side that is a fixed fraction of the corpus (here: 20M
    // rows whose plan-stat estimate is far past the byte bound, the
    // 100 TB stand-in) must NOT be pinned to a broadcast: the stats
    // fast path rejects it and the bounded probe-count job (which
    // stops at bound+1 rows) confirms
    val manyIds = spark.range(20L * 1000 * 1000).select($"id".as("vec_id"),
      array((0 until 4).map(i => lit(i.toFloat)): _*).as("embedding"))
    assert(manyIds.queryExecution.optimizedPlan.stats.sizeInBytes >
      Similarity.MaxBroadcastProbeBytes, "test premise: estimate must exceed the byte bound")
    val unhinted = Similarity.bruteForceTopK(manyIds, manyIds, k = 3)
      .queryExecution.analyzed.toString
    assert(!unhinted.contains("ResolvedHint"), "large probe set must leave the join to the planner")
  }

  test("ngram jaccard: identical docs in same block -> 1.0") {
    val docs = Seq(
      (1L, "b1", "one two three four five six"),
      (2L, "b1", "one two three four five six"),
      (3L, "b1", "unrelated totally different words here now"),
      (4L, "b2", "one two three four five six"))  // other block, never paired
      .toDF("doc_id", "block", "text")
    val pairs = Similarity.ngramJaccardPairs(docs, "doc_id", "text", "block", 3, 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }
}
