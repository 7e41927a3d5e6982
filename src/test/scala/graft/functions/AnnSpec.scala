package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** ANN scale paths measured against the exact brute-force baseline on
  * the real embeddings table: recall@5 must clear a floor.
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf(), "embeddings").cache()
  lazy val probes = emb.filter($"vec_id" % 100 === 0)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact = topkSet(Similarity.bruteForceTopK(probes, emb, k = 5))

  test("hyperplane LSH recall@5 >= 0.5 with 4 planes x 8 tables") {
    // neighbors here sit at cos ~0.4-0.5 => per-bit p ~0.63;
    // expected recall 1-(1-0.63^4)^8 ~ 0.75
    val lsh = topkSet(Ann.hyperplaneLsh(probes, emb, k = 5,
      nPlanes = 4, nTables = 8))
    val recall = (lsh intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("quantized prefilter pipeline: wide prefilter == plain LSH; narrow still clears floor") {
    val plain = topkSet(Ann.hyperplaneLsh(probes, emb, k = 5))
    // a prefilter wider than any bucket's candidate count must not
    // change the result at all — the int8 stage only reorders
    val wide = topkSet(Ann.hyperplaneLshQuantized(probes, emb, k = 5, prefilter = 10000))
    assert(wide == plain, "wide prefilter must be a no-op vs plain LSH")
    // a tight prefilter trades recall for bandwidth but must stay sane
    val tight = topkSet(Ann.hyperplaneLshQuantized(probes, emb, k = 5, prefilter = 10))
    val recall = (tight intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"tight-prefilter recall $recall")
  }

  test("multi-probe LSH beats single-probe at HALF the tables") {
    // the 100 TB configuration: fewer corpus-side tables, probe-side
    // bucket fan-out instead. 4 tables single-probe vs 4 tables +
    // 2 flipped low-margin bits — same index cost, higher recall.
    def recallOf(nProbeBits: Int): Double = {
      val got = topkSet(Ann.hyperplaneLsh(probes, emb, k = 5,
        nPlanes = 4, nTables = 4, nProbeBits = nProbeBits))
      (got intersect exact).size.toDouble / exact.size
    }
    val single = recallOf(0)
    val multi = recallOf(2)
    assert(multi >= single, s"multi-probe $multi < single $single")
    assert(multi >= 0.5, s"multi-probe recall floor: $multi")
  }

  test("hyperplane family rejects nPlanes > 63 instead of silently wrapping sign bits") {
    intercept[IllegalArgumentException](Ann.hyperplanes(dim = 8, nPlanes = 64, seed = 1L))
    val tooMany = Array.fill(64)(Array.fill(8)(1.0))
    intercept[IllegalArgumentException](Ann.hyperplaneSignature($"embedding", tooMany))
    intercept[IllegalArgumentException](Ann.multiProbeBuckets($"embedding", tooMany, nFlip = 1))
    assert(Ann.hyperplanes(dim = 8, nPlanes = 63, seed = 1L).length == 63)
  }

  test("multiProbeBuckets: base first, then single-bit flips of lowest margins") {
    val planes = Ann.hyperplanes(dim = 64, nPlanes = 4, seed = 0x5EED)
    val row = emb.limit(1).select(
      Ann.multiProbeBuckets($"embedding", planes, nFlip = 2).as("bs"),
      Ann.hyperplaneSignature($"embedding", planes).as("base")).head
    val bs = row.getSeq[Long](0)
    val base = row.getLong(1)
    assert(bs.length == 3 && bs.head == base)
    bs.tail.foreach { b =>
      val diff = b ^ base
      assert(java.lang.Long.bitCount(diff) == 1 && diff < 16, s"flip $diff not a single low bit")
    }
    assert(bs.tail.distinct.size == 2) // two DIFFERENT planes flipped
  }

  test("IVF with nProbe=4 of 8 lists recall@5 >= 0.6; full probe = exact") {
    val idx = Ann.fitIvf(emb, k = 8)
    assert(idx.centroids.length == 8)
    val ivf = topkSet(idx.search(probes, emb, k = 5, nProbe = 4))
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    // probing every list degenerates to exact search
    val full = topkSet(idx.search(probes, emb, k = 5, nProbe = 8))
    assert(full == exact)
  }

  test("searchFiltered: results honor the predicate, widening matches search at nProbeEff") {
    val idx = Ann.fitIvf(emb, k = 8)
    val pred = $"label" <= 4
    val filteredCorpus = emb.filter(pred)
    val got = idx.searchFiltered(probes, emb, pred, k = 5, nProbe = 2)
    // every neighbor satisfies the predicate
    val allowed = filteredCorpus.select("vec_id").as[Long].collect().toSet
    assert(topkSet(got).forall { case (_, n) => allowed(n) })
    // widening arithmetic: nProbeEff = min(8, ceil(2 * total / kept))
    val total = emb.count(); val kept = filteredCorpus.count()
    val npEff = math.min(8L, (2 * total + kept - 1) / kept).toInt
    assert(npEff > 2, "test setup: selectivity must actually widen the probe set")
    assert(topkSet(got) == topkSet(idx.search(probes, filteredCorpus, k = 5, nProbe = npEff)))
    // hints skip the count jobs but must give the identical result
    val hinted = idx.searchFiltered(probes, emb, pred, k = 5, nProbe = 2,
      totalHint = total, keptHint = kept)
    assert(topkSet(hinted) == topkSet(got))
  }

  test("searchFiltered: a fully selective filter degrades to exact search over survivors") {
    val idx = Ann.fitIvf(emb, k = 8)
    val pred = $"vec_id" % 25 === 1 // ~4% kept -> widening caps at all 8 lists
    val got = topkSet(idx.searchFiltered(probes, emb, pred, k = 5, nProbe = 1))
    val exactFiltered = topkSet(
      Similarity.bruteForceTopK(probes, emb.filter(pred), k = 5))
    assert(got == exactFiltered)
  }

  test("PQ ADC: wide prefilter equals exact top-k; tight prefilter clears the recall floor") {
    val idx = Ann.sampledPq(emb, nSub = 8, nCents = 16)
    // prefilter >= corpus: the ADC stage only ORDERS candidates — the
    // exact re-rank then sees everything, so the result must equal the
    // brute-force top-k exactly
    val wide = topkSet(idx.search(probes, emb, k = 5, prefilter = 1000000))
    assert(wide == exact, "full-prefilter PQ must equal brute force after re-rank")
    // tight prefilter: approximation quality of the 8-byte codes
    val tight = topkSet(idx.search(probes, emb, k = 5, prefilter = 20))
    val recall = (tight intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall@5 with prefilter=20: $recall")
  }

  test("fitted PQ codebooks beat or match sampled at the same prefilter") {
    val sampled = Ann.sampledPq(emb, nSub = 8, nCents = 16)
    val fitted = Ann.fitPq(emb, nSub = 8, nCents = 16)
    def recallOf(idx: Ann.PqIndex): Double = {
      val got = topkSet(idx.search(probes, emb, k = 5, prefilter = 20))
      (got intersect exact).size.toDouble / exact.size
    }
    val (rs, rf) = (recallOf(sampled), recallOf(fitted))
    // Lloyd-fitted codebooks have lower quantization error; allow a
    // small tolerance since recall@tiny-probe-count is noisy
    assert(rf >= rs - 0.12, s"fitted $rf vs sampled $rs")
    assert(rf >= 0.4, s"fitted PQ recall floor: $rf")
  }

  test("PQ encoding: codes are deterministic and within centroid range") {
    val idx = Ann.sampledPq(emb, nSub = 8, nCents = 16)
    val codes = emb.select(idx.encodeColumn(col("embedding")).as("c")).collect()
    val again = emb.select(idx.encodeColumn(col("embedding")).as("c")).collect()
    codes.zip(again).foreach { case (a, b) =>
      assert(a.getSeq[Int](0) == b.getSeq[Int](0))
    }
    codes.foreach(r => r.getSeq[Int](0).foreach(c => assert(c >= 0 && c < 16)))
    assert(codes.head.getSeq[Int](0).length == 8)
  }

  test("IVF-PQ: full probe + full prefilter equals brute force; bounded params clear the floor") {
    val ivf = Ann.sampledIvf(emb, k = 8)
    val pq = Ann.sampledPq(emb, nSub = 8, nCents = 16)
    // probing every list with an unbounded prefilter leaves only the
    // exact re-rank — must equal the brute-force top-k
    val full = topkSet(Ann.ivfPqSearch(ivf, pq, probes, emb,
      k = 5, nProbe = 8, prefilter = 1000000))
    assert(full == exact, "full-probe full-prefilter IVF-PQ must equal brute force")
    // the composition compounds BOTH approximations (list pruning x
    // code quantization) — recall multiplies, so the prefilter wants
    // ~10x k where PQ-alone got away with 4x
    val bounded = topkSet(Ann.ivfPqSearch(ivf, pq, probes, emb,
      k = 5, nProbe = 4, prefilter = 50))
    val recall = (bounded intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF-PQ recall@5 (nProbe=4, prefilter=50): $recall")
  }

  test("residual IVF-PQ: full-probe/prefilter equals brute force; recall comparable to plain") {
    val ivf = Ann.sampledIvf(emb, k = 8)
    val pq = Ann.sampledPq(emb, nSub = 8, nCents = 16)
    val rpq = Ann.sampledResidualPq(ivf, emb, nSub = 8, nCents = 16)
    val full = topkSet(Ann.ivfResidualPqSearch(ivf, rpq, probes, emb,
      k = 5, nProbe = 8, prefilter = 1000000))
    assert(full == exact, "exhaustive residual IVF-PQ must equal brute force")
    // recall comparison on a 25x bigger probe set — with 5 probes the
    // recall granularity is 1/25 and sampled-codebook noise dominates
    val probesWide = emb.filter($"vec_id" % 4 === 0)
    val exactWide = topkSet(Similarity.bruteForceTopK(probesWide, emb, k = 5))
    def recallOf(s: Set[(Long, Long)]): Double =
      (s intersect exactWide).size.toDouble / exactWide.size
    val plain = recallOf(topkSet(Ann.ivfPqSearch(ivf, pq, probesWide, emb,
      k = 5, nProbe = 4, prefilter = 20)))
    val resid = recallOf(topkSet(Ann.ivfResidualPqSearch(ivf, rpq, probesWide, emb,
      k = 5, nProbe = 4, prefilter = 20)))
    // measured on THIS corpus (unit-norm, near-uniform, 8 lists):
    // intra-list dot is low, so residuals are no tighter than the
    // originals and residual PQ only matches plain within noise — the
    // residual lever pays off when lists are many/clustered (100 TB:
    // k≈4096 lists). Assert comparability + a floor, not superiority.
    assert(resid >= plain - 0.1, s"residual recall $resid well below plain IVF-PQ $plain")
    assert(resid >= 0.25, s"residual IVF-PQ recall floor: $resid")
  }

  test("signatures are deterministic across evaluations") {
    val planes = 8
    val sigs1 = emb.limit(50).select($"vec_id",
      Ann.hyperplaneSignature($"embedding",
        Array.fill(planes)(Array.fill(64)(0.5))).as("sig")).collect()
    // constant planes: all-positive vectors -> same bucket for all rows
    assert(sigs1.map(_.getLong(1)).distinct.length <= 2)
  }
}
