package graft

import graft.functions.{Ann, Similarity}

/** DuckDB-dialect SQL builders for the oracle side of the hash-based
  * queries (the driver's correctness gate). Each builder mirrors —
  * arithmetic-op for arithmetic-op — the corresponding Catalyst
  * expression, so both engines produce bit-identical values:
  *
  *  - FNV-1a 64 (FnvExprs.scala) is a two-ops-per-byte fold DuckDB can
  *    replay with HUGEINT mod-2^64 arithmetic.
  *  - The Rabin-Karp polynomial hash (RollingHashExpr.scala) is a
  *    mod-(2^61-1) fold, same story.
  *  - Hyperplane LSH sign bits and cosine scores reduce to
  *    list_dot_product over DOUBLE[], which accumulates in array order
  *    exactly like VectorOps (bitwise-equal doubles, proven by the
  *    q_cosine_pairs gate in round 1).
  *
  * Seeds, coefficients and hyperplanes are interpolated as literals
  * from the SAME Scala values the query side uses — no second source
  * of truth. Oracles run at sf<=0.01 row counts; they favor legibility
  * over scale (the Spark side owns the 100 TB plan).
  */
object OracleSql {
  private val U64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val S63 = "CAST('9223372036854775808' AS HUGEINT)"
  private val FnvInit = "CAST('14695981039346656037' AS HUGEINT)"
  private val FnvPrime = "CAST('1099511628211' AS HUGEINT)"
  private val Mersenne61 = "CAST('2305843009213693951' AS HUGEINT)"

  /** FNV-1a 64 of an ASCII string expression, as unsigned HUGEINT.
    * (documents.text is ASCII, so unicode(char) == the UTF-8 byte.)
    */
  private[graft] def fnvU(s: String): String =
    s"""list_reduce(list_prepend($FnvInit,
       |      list_transform(range(1, len($s)+1), ch_i -> CAST(unicode(substring($s, ch_i, 1)) AS HUGEINT))),
       |      (fh, fc) -> (xor(fh, fc) * $FnvPrime) % $U64)""".stripMargin

  /** Same, reinterpreted as the signed 64-bit value a Spark LongType
    * carries: (u + 2^63) mod 2^64 - 2^63.
    */
  private[graft] def fnvS(s: String): String =
    s"CAST((${fnvU(s)} + $S63) % $U64 - $S63 AS BIGINT)"

  /** Oracle for q_simhash_pairs: FNV-1a SimHash (token bit-voting)
    * rebuilt per doc, then the NAIVE within-block self-join — the
    * pigeonhole banding on the Spark side is result-identical, so the
    * oracle checks the banded plan against the brute-force definition.
    */
  def simhashPairs(maxHamming: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, source, list_transform(toks, t -> ${fnvS("t")}) AS hs
       |  FROM toks
       |), sh AS (
       |  SELECT doc_id, source,
       |    CAST(list_sum(list_transform(range(63), sb ->
       |      CASE WHEN 2 * len(list_filter(hs, vh -> ((vh >> sb) & 1) = 1)) - len(hs) > 0
       |           THEN (CAST(1 AS BIGINT) << sb) ELSE CAST(0 AS BIGINT) END))
       |    + CASE WHEN 2 * len(list_filter(hs, vh -> ((vh >> 63) & 1) = 1)) - len(hs) > 0
       |           THEN CAST('-9223372036854775808' AS BIGINT) ELSE 0 END AS BIGINT) AS sh
       |  FROM th
       |)
       |SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming
       |ORDER BY source, id_a, id_b""".stripMargin

  /** Oracle for q_minhash_neardups: FNV shingle hashes -> the same 16
    * (a*h+b) mod 2^31-1 permutations (coefficients interpolated from
    * Similarity.seededCoeffs) -> banded candidates -> agreement
    * fraction. est_jaccard = k/16 is a dyadic rational, so the Spark
    * side's round(..., 6) is the identity and raw division matches.
    */
  def minhashNearDups(threshold: Double, numHashes: Int, bands: Int): String = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val p = Similarity.MinhashPrime
    val mins = Similarity.seededCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hms, hm_v -> ($a * ((hm_v % $p + $p) % $p) + $b) % $p)) AS s$i"
    }.mkString(",\n    ")
    val sigArr = (0 until numHashes).map(i => s"s$i").mkString("[", ", ", "]")
    val bandCond = (0 until bands).map { t =>
      s"a.sig[${t * rows + 1}:${t * rows + rows}] = b.sig[${t * rows + 1}:${t * rows + rows}]"
    }.mkString(" OR ")
    val est = s"CAST(len(list_filter(range($numHashes), eq_i -> a.sig[eq_i+1] = b.sig[eq_i+1])) AS DOUBLE) / $numHashes.0"
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents
       |), hms AS (
       |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |    sh_i -> ${fnvS("array_to_string(toks[sh_i:sh_i+2], ' ')")}) AS hms
       |  FROM toks WHERE len(toks) >= 3
       |), mins AS (
       |  SELECT doc_id, $mins FROM hms
       |), sig AS (
       |  SELECT doc_id, $sigArr AS sig FROM mins
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $est AS est_jaccard
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandCond)
       |WHERE $est >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for q_minhash_incremental: the two-batch incremental
    * near-dup protocol replayed — batch 1 (even doc_ids) resolves
    * against itself (banded candidates -> agreement >= threshold ->
    * transitive closure, min id kept), its kept signatures form the
    * ledger; batch 2 (odd doc_ids) first probes the ledger (min
    * matching accepted id wins), then resolves its unmatched remainder
    * within the batch the same way.
    */
  def minhashIncremental(threshold: Double, numHashes: Int, bands: Int): String = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val p = Similarity.MinhashPrime
    val mins = Similarity.seededCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hms, hm_v -> ($a * ((hm_v % $p + $p) % $p) + $b) % $p)) AS s$i"
    }.mkString(",\n    ")
    val sigArr = (0 until numHashes).map(i => s"s$i").mkString("[", ", ", "]")
    def bandCond(a: String, b: String) = (0 until bands).map { t =>
      s"$a.sig[${t * rows + 1}:${t * rows + rows}] = $b.sig[${t * rows + 1}:${t * rows + rows}]"
    }.mkString("(", " OR ", ")")
    def est(a: String, b: String) =
      s"CAST(len(list_filter(range($numHashes), eq_i -> $a.sig[eq_i+1] = $b.sig[eq_i+1])) AS DOUBLE) / $numHashes.0"
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents
       |), hms AS (
       |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |    sh_i -> ${fnvS("array_to_string(toks[sh_i:sh_i+2], ' ')")}) AS hms
       |  FROM toks WHERE len(toks) >= 3
       |), mins AS (
       |  SELECT doc_id, $mins FROM hms
       |), sig AS (
       |  SELECT doc_id, $sigArr AS sig FROM mins
       |), p1 AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 0 AND ${bandCond("a", "b")}
       |  WHERE ${est("a", "b")} >= $threshold
       |), sym1 AS (
       |  SELECT id_a AS va, id_b AS vb FROM p1 UNION SELECT id_b, id_a FROM p1
       |), reach1(va, vb) AS (
       |  SELECT va, vb FROM sym1
       |  UNION SELECT r.va, s.vb FROM reach1 r JOIN sym1 s ON r.vb = s.va
       |), rep1 AS (
       |  SELECT va AS id, least(min(vb), va) AS rep FROM reach1 GROUP BY va
       |), k1 AS (
       |  SELECT s.doc_id FROM sig s LEFT JOIN rep1 r ON r.id = s.doc_id
       |  WHERE s.doc_id % 2 = 0 AND (r.id IS NULL OR r.rep = s.doc_id)
       |), vsl AS (
       |  SELECT a.doc_id AS id, min(b.doc_id) AS matched_id
       |  FROM sig a JOIN sig b ON a.doc_id % 2 = 1
       |    AND b.doc_id IN (SELECT doc_id FROM k1) AND ${bandCond("a", "b")}
       |  WHERE ${est("a", "b")} >= $threshold
       |  GROUP BY a.doc_id
       |), p2 AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
       |    AND a.doc_id NOT IN (SELECT id FROM vsl)
       |    AND b.doc_id NOT IN (SELECT id FROM vsl)
       |    AND ${bandCond("a", "b")}
       |  WHERE ${est("a", "b")} >= $threshold
       |), sym2 AS (
       |  SELECT id_a AS va, id_b AS vb FROM p2 UNION SELECT id_b, id_a FROM p2
       |), reach2(va, vb) AS (
       |  SELECT va, vb FROM sym2
       |  UNION SELECT r.va, s.vb FROM reach2 r JOIN sym2 s ON r.vb = s.va
       |), rep2 AS (
       |  SELECT va AS id, least(min(vb), va) AS rep FROM reach2 GROUP BY va
       |), r1 AS (
       |  SELECT CAST(1 AS INTEGER) AS batch, d.doc_id AS id,
       |    CASE WHEN r.rep IS NOT NULL AND r.rep <> d.doc_id
       |         THEN 'dup_batch' ELSE 'kept' END AS status,
       |    CASE WHEN r.rep IS NOT NULL AND r.rep <> d.doc_id
       |         THEN r.rep END AS matched_id
       |  FROM documents d LEFT JOIN rep1 r ON r.id = d.doc_id
       |  WHERE d.doc_id % 2 = 0
       |), r2 AS (
       |  SELECT CAST(2 AS INTEGER), d.doc_id,
       |    CASE WHEN v.id IS NOT NULL THEN 'dup_ledger'
       |         WHEN r.rep IS NOT NULL AND r.rep <> d.doc_id THEN 'dup_batch'
       |         ELSE 'kept' END,
       |    coalesce(v.matched_id,
       |      CASE WHEN r.rep <> d.doc_id THEN r.rep END)
       |  FROM documents d
       |  LEFT JOIN vsl v ON v.id = d.doc_id
       |  LEFT JOIN rep2 r ON r.id = d.doc_id
       |  WHERE d.doc_id % 2 = 1
       |)
       |SELECT batch, id, status, matched_id FROM (
       |  SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
       |ORDER BY batch, id""".stripMargin
  }

  /** Oracle for q_rolling_fingerprint. doc_hash replays the whole-text
    * polynomial fold; the boundary positions replay the rolling WINDOW
    * hash by hashing each 16-byte window directly (winHash after byte i
    * == polyhash(bytes[i-15..i]) — the add/remove recurrence is just an
    * O(1) way to compute that), and n_chunks = boundaries + a trailing
    * chunk when its hash is nonzero, exactly RollingHashOps.chunkHashes.
    */
  def rollingFingerprint(window: Int, maskBits: Int): String = {
    val mask = (1L << maskBits) - 1
    val poly = s"(h, c) -> (h * 257 + c) % $Mersenne61"
    s"""WITH codes AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(text)+1), ch_i -> CAST(unicode(substring(text, ch_i, 1)) + 1 AS HUGEINT)) AS cs
       |  FROM documents
       |), base AS (
       |  SELECT doc_id, cs,
       |    CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), cs), $poly) AS BIGINT) AS doc_hash,
       |    list_filter(range(${window - 1}, len(cs)), w_i ->
       |      list_reduce(cs[w_i - ${window - 2} : w_i + 1], $poly) % ${mask + 1} = $mask) AS bounds
       |  FROM codes
       |)
       |SELECT doc_id, doc_hash,
       |  CAST(len(bounds) + CASE WHEN list_reduce(
       |      list_prepend(CAST(0 AS HUGEINT), cs[CASE WHEN len(bounds) > 0 THEN bounds[-1] + 2 ELSE 1 END : len(cs)]),
       |      $poly) <> 0 THEN 1 ELSE 0 END AS INT) AS n_chunks
       |FROM base
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-table LSH bucket expressions over column `e` (DOUBLE[]): bit i
    * of table t = sign(e . plane_i), planes interpolated from
    * Ann.hyperplanes with the exact seeds hyperplaneLsh uses. Scala's
    * shortest-roundtrip Double.toString parses back to the same double
    * in DuckDB, and list_dot_product accumulates in array order like
    * VectorOps.dot — identical sign bits.
    */
  private def bucketExprs(nPlanes: Int, nTables: Int, dim: Int): Seq[String] =
    (0 until nTables).map { t =>
      val planes = Ann.hyperplanes(dim, nPlanes, seed = 0x5EED + t * 7919L)
      planes.zipWithIndex.map { case (pl, i) =>
        val lit = pl.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(e, $lit) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", s") AS b$t")
    }

  private val CosineAB =
    """list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"""

  /** Oracle for q_ann_hyperplane_lsh: same 8 signature tables, bucket
    * equality as candidate generation, exact cosine top-k.
    */
  def annHyperplaneLsh(k: Int, probeMod: Int, nPlanes: Int = 4, nTables: Int = 8,
      dim: Int = 64): String = {
    val buckets = bucketExprs(nPlanes, nTables, dim).mkString(",\n    ")
    val share = (0 until nTables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""WITH sig AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $buckets
       |  FROM embeddings
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id, $CosineAB AS sim
       |  FROM sig a JOIN sig b ON a.vec_id % $probeMod = 0 AND a.vec_id <> b.vec_id
       |    AND ($share)
       |)
       |SELECT query_id, neighbor_id, sim FROM cand
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin
  }

  /** Oracle for q_ann_lsh_quantized: replays the three-stage pipeline
    * exactly — the same 8 signature tables for candidates, the int8
    * quantization arithmetic (scale = 127/maxAbs, floor(x*s+0.5)) and
    * exact BIGINT dot for the prefilter, exact cosine for the final
    * re-rank; both window stages tie-break on neighbor_id.
    */
  def annHyperplaneLshQuantized(k: Int, prefilter: Int, probeMod: Int,
      nPlanes: Int = 4, nTables: Int = 8, dim: Int = 64): String = {
    val buckets = bucketExprs(nPlanes, nTables, dim).mkString(",\n    ")
    val share = (0 until nTables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""WITH sig AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $buckets,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
       |  FROM embeddings
       |), sq AS (
       |  SELECT vec_id, e, ${(0 until nTables).map(t => s"b$t").mkString(", ")},
       |    list_transform(e, x -> CAST(floor(x * (CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END) + 0.5) AS BIGINT)) AS qv
       |  FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, CAST(len(a.qv) AS BIGINT) + 1), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS qdot,
       |    $CosineAB AS sim
       |  FROM sq a JOIN sq b ON a.vec_id % $probeMod = 0 AND a.vec_id <> b.vec_id
       |    AND ($share)
       |), pruned AS (
       |  SELECT query_id, neighbor_id, sim FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) <= $prefilter
       |)
       |SELECT query_id, neighbor_id, sim FROM pruned
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin
  }

  /** Oracle for q_sql_surface: replays fnv64() and simhash_fnv64() —
    * the two SQL-registered native expressions with exact DuckDB
    * arithmetic — for every document. Proves the
    * SparkSessionExtensions registration path end-to-end, not just the
    * Column API.
    */
  def sqlSurface: String =
    s"""WITH toks AS (
       |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, text, list_transform(toks, t -> ${fnvS("t")}) AS hs
       |  FROM toks
       |)
       |SELECT doc_id, ${fnvS("text")} AS text_fnv,
       |  CAST(list_sum(list_transform(range(63), sb ->
       |    CASE WHEN 2 * len(list_filter(hs, vh -> ((vh >> sb) & 1) = 1)) - len(hs) > 0
       |         THEN (CAST(1 AS BIGINT) << sb) ELSE CAST(0 AS BIGINT) END))
       |  + CASE WHEN 2 * len(list_filter(hs, vh -> ((vh >> 63) & 1) = 1)) - len(hs) > 0
       |         THEN CAST('-9223372036854775808' AS BIGINT) ELSE 0 END AS BIGINT) AS text_simhash
       |FROM th ORDER BY doc_id""".stripMargin

  /** Oracle for q_rotating_aes: the decrypt(encrypt(x)) frame is the
    * identity on text, and the rotated key choice replays
    * RotatingAes.pickKeyId — FNV-1a of "aesrot|doc_id", positive mod
    * the key count, indexed into the ascending key ids. (AES itself
    * has no DuckDB primitive; the gate checks the roundtrip identity
    * and the exact key schedule, while RotatingAesSpec checks the wire
    * bytes against an independent JCE decrypt.)
    */
  def rotatingAes(keyIds: Seq[Int]): String = {
    val n = keyIds.size
    val arr = keyIds.sorted.mkString("[", ", ", "]")
    val saltedId = "('aesrot' || '|' || doc_id)"
    s"""SELECT doc_id,
       |  CAST($arr[CAST(((${fnvS(saltedId)} % $n) + $n) % $n AS INT) + 1] AS INT) AS key_id,
       |  text AS decrypted
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Oracle for q_ann_ivf: replays Ann.sampledIvf + IvfIndex.search —
    * centroids are the nCentroids vectors with smallest md5("ivf|"+id)
    * (cid in ascending vec_id), corpus rows assign to their argmax-dot
    * centroid, probes fan out to their nProbe best lists, exact cosine
    * top-k within the probed lists. Argmax/top-n tie-breaks are
    * (dot DESC, cid ASC) on both engines; dot products accumulate in
    * array order (bit-equal doubles, same as the LSH oracles).
    */
  private def ivfCandCtes(nProbe: Int, nCentroids: Int, probeMod: Int,
      probeBound: Option[Long] = None): String = {
    val boundSql = probeBound.map(b => s" AND vec_id < $b").getOrElse("")
    s"""seeds AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $nCentroids
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e FROM seeds
       |), scored AS (
       |  SELECT v.vec_id, c.cid,
       |    list_dot_product(CAST(v.embedding AS DOUBLE[]), c.e) AS dot
       |  FROM embeddings v CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, cid FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
       |), plists AS (
       |  SELECT vec_id, cid FROM scored WHERE vec_id % $probeMod = 0$boundSql
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) <= $nProbe
       |), vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), cand AS (
       |  SELECT p.vec_id AS query_id, v.vec_id AS neighbor_id, $CosineAB AS sim
       |  FROM plists p JOIN assign v ON p.cid = v.cid AND p.vec_id <> v.vec_id
       |  JOIN vecs a ON a.vec_id = p.vec_id
       |  JOIN vecs b ON b.vec_id = v.vec_id
       |)""".stripMargin
  }

  def annIvf(k: Int, nProbe: Int, nCentroids: Int, probeMod: Int): String =
    s"""WITH ${ivfCandCtes(nProbe, nCentroids, probeMod)}
       |SELECT query_id, neighbor_id, sim FROM cand
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin

  /** Oracle for q_ann_recall: the IVF candidates above top-k'd, the
    * brute-force exact top-k (same cosine, same (sim DESC, id)
    * tie-break), and per-query hit counting — recall@k as the plain
    * IEEE division n_hit / k.
    */
  def annRecall(k: Int, nProbe: Int, nCentroids: Int, probeMod: Int,
      probeBound: Long): String =
    s"""WITH ${ivfCandCtes(nProbe, nCentroids, probeMod, Some(probeBound))},
       |ivfk AS (
       |  SELECT query_id, neighbor_id FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |), exactc AS (
       |  SELECT p.vec_id AS query_id, v.vec_id AS neighbor_id, $CosineAB AS sim
       |  FROM (SELECT vec_id FROM vecs WHERE vec_id % $probeMod = 0 AND vec_id < $probeBound) p
       |  JOIN vecs v ON v.vec_id <> p.vec_id
       |  JOIN vecs a ON a.vec_id = p.vec_id
       |  JOIN vecs b ON b.vec_id = v.vec_id
       |), exact AS (
       |  SELECT query_id, neighbor_id FROM exactc
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |)
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
       |  CAST(count(i.neighbor_id) AS DOUBLE) / $k AS recall
       |FROM exact e LEFT JOIN ivfk i
       |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  /** Oracle for q_semantic_dedup: replays Ann.sampledIvf +
    * Ann.semanticDedup — same sampled quantizer and argmax-dot
    * assignment as [[annIvf]], then the SemDeDup drop rule: a vector
    * is dropped iff a smaller-id cluster-mate has cosine >= threshold
    * (bit-equal doubles on both engines, same accumulation order).
    */
  def semanticDedup(nCentroids: Int, threshold: Double): String =
    s"""WITH seeds AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $nCentroids
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e FROM seeds
       |), scored AS (
       |  SELECT v.vec_id, c.cid,
       |    list_dot_product(CAST(v.embedding AS DOUBLE[]), c.e) AS dot
       |  FROM embeddings v CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, cid FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
       |), vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), dropped AS (
       |  SELECT DISTINCT x.vec_id
       |  FROM assign x JOIN assign y ON x.cid = y.cid AND y.vec_id < x.vec_id
       |  JOIN vecs a ON a.vec_id = x.vec_id
       |  JOIN vecs b ON b.vec_id = y.vec_id
       |  WHERE $CosineAB >= $threshold
       |)
       |SELECT x.vec_id, x.cid AS cluster, d.vec_id IS NULL AS kept
       |FROM assign x LEFT JOIN dropped d ON d.vec_id = x.vec_id
       |ORDER BY x.vec_id""".stripMargin

  /** Oracle for q_ann_pq: replays Ann.sampledPq + PqIndex.search
    * end-to-end — per-subspace codebooks sampled by md5('pq|j|'+id)
    * (code ids ascending by vector id), L2 encoding via the SAME
    * augmented-dot formulation (x ++ [1]) · (c ++ [−‖c‖²/2]) so the
    * argmax compares bit-identical doubles, ADC scores rebuilt as an
    * ordered per-subspace dot list summed with an explicit left-assoc
    * addition chain (= PqOps.adcScore's accumulation order), then the
    * prefilter and exact-cosine re-rank windows with (score DESC,
    * neighbor_id) tie-breaks.
    */
  /** The PQ codebook/encode CTE block shared by annPq and annIvfPq:
    * cb0 (sampled per-subspace codebooks), cb (+ L2 bias), enc
    * (augmented-dot scores), codes (argmax -> one code per subspace).
    * Expects a CTE `e(vec_id, e DOUBLE[])` in scope.
    */
  private def pqCodebookCtes(nSub: Int, nCents: Int, subDim: Int,
      src: String = "e", salt: String = "pq"): String = {
    val cbUnion = (0 until nSub).map { j =>
      val lo = j * subDim + 1
      val hi = j * subDim + subDim
      s"""  SELECT $j AS j, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, c
         |  FROM (SELECT vec_id, e[$lo:$hi] AS c FROM $src
         |        ORDER BY md5('$salt|$j|' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCents) s$j"""
        .stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""cb0 AS (
       |$cbUnion
       |), cb AS (
       |  SELECT j, cid, c, -0.5 * list_dot_product(c, c) AS bias FROM cb0
       |), enc AS (
       |  SELECT v.vec_id, cb.j, cb.cid,
       |    list_dot_product(v.e[cb.j * $subDim + 1 : cb.j * $subDim + $subDim] || [CAST(1.0 AS DOUBLE)],
       |      cb.c || [cb.bias]) AS bd
       |  FROM $src v CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id, j, cid FROM enc
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY bd DESC, cid) = 1
       |)""".stripMargin
  }

  def annPq(k: Int, prefilter: Int, probeMod: Int, nSub: Int = 8,
      nCents: Int = 16, dim: Int = 64): String = {
    val subDim = dim / nSub
    val chain = (1 to nSub).map(i => s"ds[$i]").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), ${pqCodebookCtes(nSub, nCents, subDim)}, sc AS (
       |  SELECT p.vec_id AS query_id, cd.vec_id AS neighbor_id, cd.j,
       |    list_dot_product(p.e[cd.j * $subDim + 1 : cd.j * $subDim + $subDim], cb.c) AS d
       |  FROM e p
       |  JOIN codes cd ON p.vec_id % $probeMod = 0 AND p.vec_id <> cd.vec_id
       |  JOIN cb ON cb.j = cd.j AND cb.cid = cd.cid
       |), adc AS (
       |  SELECT query_id, neighbor_id, list(d ORDER BY j) AS ds
       |  FROM sc GROUP BY query_id, neighbor_id
       |), scored AS (
       |  SELECT query_id, neighbor_id, $chain AS adc_score FROM adc
       |), pruned AS (
       |  SELECT query_id, neighbor_id FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id) <= $prefilter
       |)
       |SELECT pr.query_id, pr.neighbor_id, $CosineAB AS sim
       |FROM pruned pr
       |JOIN e a ON a.vec_id = pr.query_id
       |JOIN e b ON b.vec_id = pr.neighbor_id
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin
  }

  /** Oracle for q_ann_ivf_pq: the IVFPQ composition — sampledIvf
    * coarse lists (annIvf's seeds/assign/probe-lists arithmetic) bound
    * the candidates, PQ codes (pqCodebookCtes) bound the scan bytes,
    * ordered ADC chain + exact-cosine re-rank as in annPq. A corpus
    * vector lives in exactly one list, so a probe meets it at most
    * once — no DISTINCT needed anywhere.
    */
  def annIvfPq(k: Int, nProbe: Int, prefilter: Int, probeMod: Int,
      nCentroids: Int = 8, nSub: Int = 8, nCents: Int = 16, dim: Int = 64): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), ${ivfPqBody(k, nProbe, prefilter, probeMod, nCentroids, nSub, nCents, dim)}""".stripMargin

  /** The IVFPQ CTE body (seeds ... final SELECT), parameterized over a
    * CTE `e(vec_id, e DOUBLE[])` already in scope — reused by
    * [[annIvfPq]] and the corpus-level [[embeddingPipeline]].
    */
  private def ivfPqBody(k: Int, nProbe: Int, prefilter: Int, probeMod: Int,
      nCentroids: Int, nSub: Int, nCents: Int, dim: Int): String = {
    val subDim = dim / nSub
    val chain = (1 to nSub).map(i => s"ds[$i]").mkString(" + ")
    s"""seeds AS (
       |  SELECT vec_id, e FROM e
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $nCentroids
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS lid, e AS ce FROM seeds
       |), ivfs AS (
       |  SELECT v.vec_id, c.lid, list_dot_product(v.e, c.ce) AS dot
       |  FROM e v CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, lid FROM ivfs
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, lid) = 1
       |), plists AS (
       |  SELECT vec_id, lid FROM ivfs WHERE vec_id % $probeMod = 0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, lid) <= $nProbe
       |), ${pqCodebookCtes(nSub, nCents, subDim)}, sc AS (
       |  SELECT pl.vec_id AS query_id, a.vec_id AS neighbor_id, cd.j,
       |    list_dot_product(pe.e[cd.j * $subDim + 1 : cd.j * $subDim + $subDim], cb.c) AS d
       |  FROM plists pl
       |  JOIN assign a ON a.lid = pl.lid AND a.vec_id <> pl.vec_id
       |  JOIN codes cd ON cd.vec_id = a.vec_id
       |  JOIN cb ON cb.j = cd.j AND cb.cid = cd.cid
       |  JOIN e pe ON pe.vec_id = pl.vec_id
       |), adc AS (
       |  SELECT query_id, neighbor_id, list(d ORDER BY j) AS ds
       |  FROM sc GROUP BY query_id, neighbor_id
       |), scored AS (
       |  SELECT query_id, neighbor_id, $chain AS adc_score FROM adc
       |), pruned AS (
       |  SELECT query_id, neighbor_id FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id) <= $prefilter
       |)
       |SELECT pr.query_id, pr.neighbor_id, $CosineAB AS sim
       |FROM pruned pr
       |JOIN e a ON a.vec_id = pr.query_id
       |JOIN e b ON b.vec_id = pr.neighbor_id
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin
  }

  /** Oracle for q_embedding_pipeline — the embedding FLAGSHIP: the
    * semantic-dedup CTEs ([[semanticDedup]]'s quantizer/assignment/
    * drop rule at 16 clusters) produce the survivor corpus as CTE
    * `e`, and the full IVFPQ retrieval ([[ivfPqBody]]) runs OVER THE
    * SURVIVORS — index seeds, codebooks, lists, ADC chain and re-rank
    * all derive from the deduped corpus, exactly like the Spark side.
    */
  def embeddingPipeline(semClusters: Int, semThreshold: Double,
      k: Int, nProbe: Int, prefilter: Int, probeMod: Int,
      nCentroids: Int = 8, nSub: Int = 8, nCents: Int = 16, dim: Int = 64): String =
    s"""WITH all_e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), sseeds AS (
       |  SELECT vec_id, e FROM all_e
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $semClusters
       |), scents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e FROM sseeds
       |), sscored AS (
       |  SELECT v.vec_id, c.cid, list_dot_product(v.e, c.e) AS dot
       |  FROM all_e v CROSS JOIN scents c
       |), sassign AS (
       |  SELECT vec_id, cid FROM sscored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
       |), sdropped AS (
       |  SELECT DISTINCT x.vec_id
       |  FROM sassign x JOIN sassign y ON x.cid = y.cid AND y.vec_id < x.vec_id
       |  JOIN all_e a ON a.vec_id = x.vec_id
       |  JOIN all_e b ON b.vec_id = y.vec_id
       |  WHERE $CosineAB >= $semThreshold
       |), e AS (
       |  SELECT s.vec_id, s.e FROM all_e s
       |  LEFT JOIN sdropped d ON d.vec_id = s.vec_id WHERE d.vec_id IS NULL
       |), ${ivfPqBody(k, nProbe, prefilter, probeMod, nCentroids, nSub, nCents, dim)}""".stripMargin

  /** Oracle for q_ann_ivf_rpq: IVF + RESIDUAL PQ — residual r = x −
    * c_list (exact element-wise subtraction), codebooks sampled from
    * residuals (salt 'pqr'), approx dot = qc_dot + (ordered residual
    * ADC chain) with explicit parentheses so the addition order equals
    * the Spark side's `qc + PqOps.adcScore(...)`.
    */
  def annIvfResidualPq(k: Int, nProbe: Int, prefilter: Int, probeMod: Int,
      nCentroids: Int = 8, nSub: Int = 8, nCents: Int = 16, dim: Int = 64): String = {
    val subDim = dim / nSub
    val chain = (1 to nSub).map(i => s"ds[$i]").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), seeds AS (
       |  SELECT vec_id, e FROM e
       |  ORDER BY md5('ivf' || '|' || vec_id), vec_id LIMIT $nCentroids
       |), cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS lid, e AS ce,
       |    -0.5 * list_dot_product(e, e) AS bias
       |  FROM seeds
       |), ivfs AS (
       |  -- L2 coarse assignment via the augmented dot (argmin L2 =
       |  -- argmax of (x ++ [1]) . (c ++ [-|c|^2/2])), matching
       |  -- IvfIndex.assignL2Column bit-for-bit
       |  SELECT v.vec_id, c.lid,
       |    list_dot_product(v.e || [CAST(1.0 AS DOUBLE)], c.ce || [c.bias]) AS bd
       |  FROM e v CROSS JOIN cents c
       |), assign AS (
       |  SELECT vec_id, lid FROM ivfs
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY bd DESC, lid) = 1
       |), plists AS (
       |  SELECT vec_id, lid FROM ivfs WHERE vec_id % $probeMod = 0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY bd DESC, lid) <= $nProbe
       |), r AS (
       |  SELECT v.vec_id, list_transform(range(1, $dim + 1), ri -> v.e[ri] - c.ce[ri]) AS e
       |  FROM e v JOIN assign a ON a.vec_id = v.vec_id JOIN cents c ON c.lid = a.lid
       |), ${pqCodebookCtes(nSub, nCents, subDim, src = "r", salt = "pqr")}, sc AS (
       |  SELECT pl.vec_id AS query_id, a.vec_id AS neighbor_id, pl.lid, cd.j,
       |    list_dot_product(pe.e[cd.j * $subDim + 1 : cd.j * $subDim + $subDim], cb.c) AS d
       |  FROM plists pl
       |  JOIN assign a ON a.lid = pl.lid AND a.vec_id <> pl.vec_id
       |  JOIN codes cd ON cd.vec_id = a.vec_id
       |  JOIN cb ON cb.j = cd.j AND cb.cid = cd.cid
       |  JOIN e pe ON pe.vec_id = pl.vec_id
       |), qc AS (
       |  SELECT pl.vec_id AS query_id, pl.lid, list_dot_product(pe.e, c.ce) AS qc_dot
       |  FROM plists pl JOIN e pe ON pe.vec_id = pl.vec_id JOIN cents c ON c.lid = pl.lid
       |), adc AS (
       |  SELECT query_id, neighbor_id, lid, list(d ORDER BY j) AS ds
       |  FROM sc GROUP BY query_id, neighbor_id, lid
       |), scored AS (
       |  SELECT a.query_id, a.neighbor_id, q.qc_dot + ($chain) AS adc_score
       |  FROM adc a JOIN qc q ON q.query_id = a.query_id AND q.lid = a.lid
       |), pruned AS (
       |  SELECT query_id, neighbor_id FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id) <= $prefilter
       |)
       |SELECT pr.query_id, pr.neighbor_id, $CosineAB AS sim
       |FROM pruned pr
       |JOIN e a ON a.vec_id = pr.query_id
       |JOIN e b ON b.vec_id = pr.neighbor_id
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= $k
       |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin
  }

  /** Oracle for q_embed_neardup_resolve: LSH candidates -> cosine >=
    * threshold edges -> TRUE connected components via a recursive CTE
    * (transitive closure; the oracle-side graphs are tiny) -> survivor
    * = min vec_id per component, singletons survive as-is. Also an
    * independent check that Dedup.clusterPairs' 4 pointer-jumping
    * rounds reach the full components on this data.
    */
  def embedNeardupResolve(threshold: Double, nPlanes: Int = 4, nTables: Int = 8,
      dim: Int = 64): String = {
    val buckets = bucketExprs(nPlanes, nTables, dim).mkString(",\n    ")
    val share = (0 until nTables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""WITH RECURSIVE sig AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $buckets
       |  FROM embeddings
       |), edges AS (
       |  SELECT DISTINCT a.vec_id AS ea, b.vec_id AS eb
       |  FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ($share)
       |  WHERE $CosineAB >= $threshold
       |), sym AS (
       |  SELECT ea AS va, eb AS vb FROM edges UNION SELECT eb, ea FROM edges
       |), reach(va, vb) AS (
       |  SELECT va, vb FROM sym
       |  UNION
       |  SELECT r.va, s.vb FROM reach r JOIN sym s ON r.vb = s.va
       |), rep AS (
       |  SELECT va AS id, min(vb) AS mn FROM reach GROUP BY va
       |)
       |SELECT e.vec_id, e.label FROM embeddings e LEFT JOIN rep r ON r.id = e.vec_id
       |WHERE r.id IS NULL OR r.mn >= e.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  /** Shared bigram-LM CTE chain (graft.functions.NgramLm): tokenize,
    * fit on the CLEAN lang='en' slice, attach per-bigram conditional
    * probabilities, and score every document's bigrams and tokens.
    * `scoreText` lets the governed-pipeline flagship score a perturbed
    * text expression while the LM itself stays fit on clean text.
    */
  def lmCtes(scoreText: String = "text"): String =
    s"""toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(coalesce($scoreText, ''), ' '),
      |                x -> len(x) > 0) AS l
      |  FROM documents),
      |tr AS (
      |  SELECT list_filter(string_split(coalesce(text, ''), ' '),
      |                     x -> len(x) > 0) AS l
      |  FROM documents WHERE lang = 'en'),
      |uni AS (
      |  SELECT w, count(*) AS cu
      |  FROM (SELECT unnest(l) AS w FROM tr) GROUP BY w),
      |bi AS (
      |  SELECT bg, count(*) AS cb FROM (
      |    SELECT unnest(list_transform(range(1, len(l)),
      |      i -> l[i] || ' ' || l[i + 1])) AS bg FROM tr) GROUP BY bg),
      |prob AS (
      |  SELECT b.bg, CAST(b.cb AS DOUBLE) / u.cu AS p
      |  FROM bi b JOIN uni u ON string_split(b.bg, ' ')[1] = u.w),
      |tk AS (SELECT doc_id, unnest(l) AS w FROM toks),
      |oov AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |         count(*) FILTER (u.w IS NULL) AS n_oov
      |  FROM tk t LEFT JOIN uni u ON t.w = u.w GROUP BY t.doc_id),
      |dbg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(l)),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg FROM toks),
      |hits AS (
      |  SELECT g.doc_id, count(*) AS n_bigrams, count(p.p) AS n_hits,
      |         min(p.p) AS min_prob
      |  FROM dbg g LEFT JOIN prob p ON g.bg = p.bg GROUP BY g.doc_id)""".stripMargin

  /** BPE merge induction replay (graft.functions.Bpe): k chained CTE
    * layers, each recomputing the weighted pair counts over the
    * current word-dictionary segmentation, taking the (count DESC,
    * pair ASC) argmax, and applying the merge with the same
    * left-greedy fold the Spark `aggregate` HOF uses.
    */
  def bpeMerges(k: Int): String = {
    val base =
      """WITH toks AS (
        |  SELECT list_filter(string_split(coalesce(text, ''), ' '),
        |                     x -> len(x) > 0) AS l
        |  FROM documents WHERE lang = 'en'),
        |words AS (
        |  SELECT w, count(*) AS n
        |  FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
        |w0 AS (SELECT n, list_append(string_split(w, ''), '</w>') AS syms
        |       FROM words)""".stripMargin
    val layers = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pair, CAST(sum(n) AS BIGINT) AS c FROM (
         |    SELECT n, unnest(list_transform(range(1, len(syms)),
         |      j -> syms[j] || ' ' || syms[j + 1])) AS pair
         |    FROM w${i - 1}) GROUP BY pair),
         |t$i AS (
         |  SELECT pair, c, string_split(pair, ' ')[1] AS a,
         |         string_split(pair, ' ')[2] AS b
         |  FROM p$i ORDER BY c DESC, pair LIMIT 1),
         |w$i AS (
         |  SELECT n, list_reduce(list_transform(syms, x -> [x]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.a
         |                      AND x[1] = t.b
         |                THEN list_concat(acc[1:len(acc) - 1], [t.a || t.b])
         |                ELSE list_concat(acc, x) END) AS syms
         |  FROM w${i - 1}, t$i t)""".stripMargin
    }
    val sel = (1 to k)
      .map(i => s"SELECT $i AS step, pair, c AS cnt FROM t$i")
      .mkString("\nUNION ALL\n")
    base + ",\n" + layers.mkString(",\n") + "\n" + sel + "\nORDER BY step"
  }

  /** BPE encode replay: learn k merges on the en dictionary (same
    * layers as [[bpeMerges]]), apply them IN ORDER to the whole-corpus
    * dictionary, and report per-language fertility (pieces per word).
    */
  def bpeEncode(k: Int): String = {
    val base =
      """WITH dtoks AS (
        |  SELECT lang, list_filter(string_split(coalesce(text, ''), ' '),
        |                           x -> len(x) > 0) AS l
        |  FROM documents),
        |words AS (
        |  SELECT w, count(*) AS n
        |  FROM (SELECT unnest(l) AS w FROM dtoks WHERE lang = 'en') GROUP BY w),
        |w0 AS (SELECT n, list_append(string_split(w, ''), '</w>') AS syms
        |       FROM words)""".stripMargin
    val enLayers = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pair, CAST(sum(n) AS BIGINT) AS c FROM (
         |    SELECT n, unnest(list_transform(range(1, len(syms)),
         |      j -> syms[j] || ' ' || syms[j + 1])) AS pair
         |    FROM w${i - 1}) GROUP BY pair),
         |t$i AS (
         |  SELECT pair, c, string_split(pair, ' ')[1] AS a,
         |         string_split(pair, ' ')[2] AS b
         |  FROM p$i ORDER BY c DESC, pair LIMIT 1),
         |w$i AS (
         |  SELECT n, list_reduce(list_transform(syms, x -> [x]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.a
         |                      AND x[1] = t.b
         |                THEN list_concat(acc[1:len(acc) - 1], [t.a || t.b])
         |                ELSE list_concat(acc, x) END) AS syms
         |  FROM w${i - 1}, t$i t)""".stripMargin
    }
    val allBase =
      """a0 AS (
        |  SELECT w, list_append(string_split(w, ''), '</w>') AS syms
        |  FROM (SELECT DISTINCT unnest(l) AS w FROM dtoks))""".stripMargin
    val applyLayers = (1 to k).map { i =>
      s"""a$i AS (
         |  SELECT w, list_reduce(list_transform(syms, x -> [x]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.a
         |                      AND x[1] = t.b
         |                THEN list_concat(acc[1:len(acc) - 1], [t.a || t.b])
         |                ELSE list_concat(acc, x) END) AS syms
         |  FROM a${i - 1}, t$i t)""".stripMargin
    }
    val encCtes =
      s"""enc AS (SELECT w, len(syms) AS pieces FROM a$k),
         |toklang AS (SELECT lang, unnest(l) AS w FROM dtoks)""".stripMargin
    val fin =
      """SELECT lang, count(*) AS n_words,
        |  CAST(sum(e.pieces) AS BIGINT) AS n_pieces,
        |  CAST(sum(e.pieces) AS DOUBLE) / count(*) AS pieces_per_word
        |FROM toklang t JOIN enc e ON t.w = e.w
        |GROUP BY lang ORDER BY lang""".stripMargin
    (Seq(base) ++ enLayers ++ Seq(allBase) ++ applyLayers ++ Seq(encCtes))
      .mkString(",\n") + "\n" + fin
  }

  /** Oracle for q_importance_weights (graft.functions.Importance):
    * FNV bigram hashes bucketed mod `buckets`, Laplace-smoothed
    * integer weights ((tc+1) * 2^20 // (rc+1)) fitted on target =
    * clean lang='en' docs vs raw = garble-planted docs, then every
    * raw doc's exact integer score. Docs with < n tokens surface
    * with 0 grams / 0 score.
    */
  private def importanceScoredCtes(plantedText: String, buckets: Int): String = {
    def gramCtes(src: String, prefix: String): String =
      s"""${prefix}tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split($src, ' '), x -> len(x) > 0) AS toks
         |  FROM aug),
         |${prefix}g AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    g_i -> ${fnvS("array_to_string(toks[g_i:g_i+1], ' ')")})) AS h
         |  FROM ${prefix}tk WHERE len(toks) >= 2),
         |${prefix}b AS (
         |  SELECT doc_id, ((h % $buckets) + $buckets) % $buckets AS bucket
         |  FROM ${prefix}g)""".stripMargin
    s"""aug AS (
       |  SELECT doc_id, lang, $plantedText AS text,
       |    text AS clean_text
       |  FROM documents),
       |${gramCtes("text", "r")},
       |rc AS (SELECT bucket, count(*) AS rc FROM rb GROUP BY bucket),
       |ttk AS (
       |  SELECT list_filter(string_split(clean_text, ' '), x -> len(x) > 0)
       |    AS toks
       |  FROM aug WHERE lang = 'en'),
       |tg AS (
       |  SELECT unnest(list_transform(range(1, len(toks)),
       |    g_i -> ${fnvS("array_to_string(toks[g_i:g_i+1], ' ')")})) AS h
       |  FROM ttk WHERE len(toks) >= 2),
       |tc AS (
       |  SELECT ((h % $buckets) + $buckets) % $buckets AS bucket,
       |    count(*) AS tc
       |  FROM tg GROUP BY bucket),
       |w AS (
       |  SELECT coalesce(rc.bucket, tc.bucket) AS bucket,
       |    ((coalesce(tc, 0) + 1) * 1048576) // (coalesce(rc, 0) + 1) AS w
       |  FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket),
       |sc AS (
       |  SELECT rb.doc_id, count(*) AS n_grams,
       |    sum(coalesce(w.w, 1048576)) AS score
       |  FROM rb LEFT JOIN w ON rb.bucket = w.bucket
       |  GROUP BY rb.doc_id)""".stripMargin
  }

  def importanceWeights(plantedText: String, buckets: Int): String =
    s"""WITH ${importanceScoredCtes(plantedText, buckets)}
       |SELECT d.doc_id,
       |  coalesce(sc.n_grams, 0) AS n_grams,
       |  CAST(coalesce(sc.score, 0) AS BIGINT) AS score
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Oracle for q_importance_select: the scored docs of
    * [[importanceWeights]], then per-lang top-k by (score desc,
    * doc_id asc) — the DSIR stratified selection step.
    */
  def importanceSelect(plantedText: String, buckets: Int, k: Int): String =
    s"""WITH ${importanceScoredCtes(plantedText, buckets)},
       |scored AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(sc.n_grams, 0) AS n_grams,
       |    CAST(coalesce(sc.score, 0) AS BIGINT) AS score
       |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
       |rk AS (
       |  SELECT doc_id, lang, n_grams, score, row_number() OVER (
       |    PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM scored)
       |SELECT doc_id, lang, n_grams, score
       |FROM rk WHERE rnk <= $k ORDER BY lang, doc_id""".stripMargin
}
