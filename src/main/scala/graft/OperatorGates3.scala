package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ann, Quantize, Text}
import graft.operators.{Skew, Splits}
import graft.sink.{Bucketed, CommitSequence, Publisher, SinkSpec}
import graft.sources.{Partitioner, WatermarkType}
import graft.state.FsStateStore
import graft.streaming.SchemaEvolution

/** Round-3 wave of driver-gated queries: bucketed co-located joins,
  * salted skew joins, the commit-sequence crash/resume protocol, the
  * mid-stream schema-evolution conform path, JDBC interval planning,
  * and the new training-data operators (int8 embedding quantization,
  * PII scrubbing, duplicate-n-gram quality signals, sharded
  * deterministic shuffle). As with the other gate waves: every query
  * executes the REAL operator machinery, and the oracle replays the
  * operator's semantics (not its code path) in DuckDB.
  */
object OperatorGates3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val dec18_2 = DecimalType(18, 2)
  private val dec4_2 = DecimalType(4, 2)
  private def decSumDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(dec18_2)).cast("double")
  private def discPrice: org.apache.spark.sql.Column =
    col("l_extendedprice").cast(dec18_2) * (lit(1).cast(dec4_2) - col("l_discount").cast(dec4_2))
  private def vMilli = floor(col("value") * 1000).cast("long")

  def queries3: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- bucketed co-located join (sink.Bucketed): both sides written
    //     bucketBy(8, key) + sortBy, so the fact-to-fact join plans
    //     with ZERO ShuffleExchange — asserted on the physical plan at
    //     run time, so a regression that silently drops bucket info
    //     (e.g. a path-based save) fails the gate, not just a spec ----
    "q_bucketed_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      Bucketed.writeBucketed(li, "graft_bkt_lineitem", "l_orderkey", 8)
      Bucketed.writeBucketed(o, "graft_bkt_orders", "o_orderkey", 8)
      val joined = Bucketed.readBucketed(s, "graft_bkt_lineitem").hint("merge")
        .join(Bucketed.readBucketed(s, "graft_bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      require(shuffles.isEmpty,
        s"bucketed join planned ${shuffles.size} shuffle exchange(s) — bucketing not applied")
      joined.groupBy(col("o_orderpriority"))
        .agg(decSumDouble(col("l_quantity")).as("sum_qty"),
          sum(discPrice).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- salted skew join (Skew.saltedJoin): big side salted on
    //     stable columns, small side exploded to every salt — the
    //     manual co-location for joins AQE's skew split can't reach.
    //     The oracle is the PLAIN join, so the gate proves salted ==
    //     unsalted semantics ------------------------------------------
    "q_skew_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
      val small = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      Skew.saltedJoin(big, small, "l_orderkey", buckets = 8,
          saltFrom = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(discPrice).cast("double").as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- commit-sequence crash/resume (sink.CommitSequence; ref
    //     CommitSequencePublisher): publish A, crash before B, resume —
    //     A must be SKIPPED (recorded done), B published. The output is
    //     read back from the PUBLISHED directories; the action column
    //     carries the replay decision the oracle pins ------------------
    "q_commit_sequence" -> ((s, dir) => {
      val tmp = tmpDir("graft_cseq")
      val store = new FsStateStore(s"$tmp/state")
      val pub = new Publisher()
      val specA = SinkSpec(s"$tmp/stage/a", s"$tmp/out/a")
      val specB = SinkSpec(s"$tmp/stage/b", s"$tmp/out/b")
      pub.writeStaged(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice")), specA)
      pub.writeStaged(t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")), specB)
      val seq = new CommitSequence(store)
      val datasets = Seq("a" -> specA, "b" -> specB)
      // run 1: simulated crash between the two publishes
      try {
        seq.run("job1", datasets, spec => {
          if (spec == specB) throw new RuntimeException("simulated crash before b")
          pub.publish(spec)
        })
        require(false, "crash did not propagate")
      } catch { case _: RuntimeException => }
      require(seq.completed("job1") == Seq("a"), "dataset a not recorded done after crash")
      // run 2: resume — a skipped, b published
      val results = seq.run("job1", datasets, pub.publish _)
      require(results.map(r => (r.dataset, r.action)) ==
        Seq(("a", "skipped"), ("b", "published")),
        s"unexpected resume actions: $results")
      val outA = s.read.parquet(s"$tmp/out/a")
        .agg(count(lit(1)).as("n_rows"), decSumDouble(col("o_totalprice")).as("sum_val"))
        .select(lit("a").as("dataset"), lit(results(0).action).as("action"),
          col("n_rows"), col("sum_val"))
      val outB = s.read.parquet(s"$tmp/out/b")
        .agg(count(lit(1)).as("n_rows"), decSumDouble(col("l_quantity")).as("sum_val"))
        .select(lit("b").as("dataset"), lit(results(1).action).as("action"),
          col("n_rows"), col("sum_val"))
      outA.unionByName(outB).orderBy(col("dataset"))
    }),

    // --- mid-stream schema evolution (streaming.SchemaEvolution; ref
    //     KafkaSchemaChangeInjector): batch 2 arrives with an ADDED
    //     column -> conform records the widened schema; later batches
    //     conformed against the widened target null-fill it. The gate
    //     unions the conformed batches and aggregates, so the widen +
    //     null-fill path feeds the checked numbers --------------------
    "q_schema_evolve" -> ((s, dir) => {
      val tmp = tmpDir("graft_schev")
      val store = new FsStateStore(s"$tmp/state")
      val target = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val ev = t(s, dir, "events")
      val b1 = ev.filter(pmod(col("event_id"), lit(3)) === 0)
        .select(col("event_id"), col("event_type"), col("value"))
      val b2 = ev.filter(pmod(col("event_id"), lit(3)) === 1)
        .select(col("event_id"), col("event_type"), col("value"), col("user_id").as("extra"))
      val b3 = ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .select(col("event_id"), col("event_type"), col("value"))
      // batch 2 against the original target: additive column -> output
      // conforms to target, widened schema recorded for restart
      SchemaEvolution.conform(b2, target, store, "ev")
      val widened = SchemaEvolution.loadSchema(store, "ev")
        .getOrElse(sys.error("widened schema not recorded"))
      require(widened.fieldNames.contains("extra") &&
        widened("extra").nullable, "recorded schema missing nullable extra column")
      // replay all batches against the widened target (the restart path)
      val conformed = Seq(b1, b2, b3)
        .map(b => SchemaEvolution.conform(b, widened, store, "ev"))
        .reduce(_.unionByName(_))
      conformed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), count(col("extra")).as("n_extra"),
          sum(vMilli).as("sum_v_milli"))
        .orderBy(col("event_type"))
    }),

    // --- JDBC interval planning (sources.Partitioner.intervals, ref
    //     Partitioner.java SIMPLE type): split the observed [min,max]
    //     user_id range into <=32 half-open spans; the oracle replays
    //     the ceil-division arithmetic in SQL over the same range ------
    "q_partition_intervals" -> ((s, dir) => {
      val mm = t(s, dir, "events")
        .agg(min(col("user_id")).cast("long"), max(col("user_id")).cast("long")).head()
      val iv = Partitioner.intervals(mm.getLong(0), mm.getLong(1), 32, WatermarkType.Simple)
      import s.implicits._
      iv.toDF("lo_w", "hi_w").orderBy(col("lo_w"))
    }),

    // --- int8 embedding quantization (functions.Quantize): per-vector
    //     max-abs scale, explicit floor(x*s+0.5) rounding, exact BIGINT
    //     dot scoring — the 4x memory / bandwidth lever for ANN scans.
    //     The oracle replays scale, rounding, and integer dots
    //     bit-for-bit in DuckDB list arithmetic ------------------------
    "q_embed_quantize" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      Quantize.quantizedTopK(probes, e, "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("qdot").desc, col("neighbor_id"))
    }),

    // --- three-stage quantized ANN (Ann.hyperplaneLshQuantized): LSH
    //     bucket candidates -> int8 integer-dot prefilter -> exact
    //     float re-rank; float vectors touched only by survivors. The
    //     oracle replays all three stages exactly ---------------------
    "q_ann_lsh_quantized" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(pmod(col("vec_id"), lit(100)) === 0)
      Ann.hyperplaneLshQuantized(probes, e, k = 5, prefilter = 20)
        .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
    }),

    // --- PII scrubbing (Text.scrubPii): emails, IPv4s, phone-shaped
    //     digit runs redacted in one regexp_replace chain. PII is
    //     planted deterministically from table columns so the patterns
    //     actually fire; the oracle replays the same chain with RE2
    //     syntax-compatible patterns -----------------------------------
    "q_pii_scrub" -> ((s, dir) => {
      val raw = concat(
        substring(col("text"), 1, 40), lit(" contact "), col("source"), lit("."), col("lang"),
        lit("@example.com or 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
        ((col("doc_id") * 7) % 256).cast("string"), lit(" ext 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      t(s, dir, "documents")
        .select(col("doc_id"), Text.scrubPii(raw).as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // --- duplicate-n-gram quality signal (Text.dupNgramRatio): the
    //     Gopher/Dolma-style excess-repetition filter; exact counts,
    //     one IEEE division --------------------------------------------
    "q_dup_ngrams" -> ((s, dir) => {
      val (ng, nu) = Text.ngramCounts(col("text"), 2)
      t(s, dir, "documents")
        .select(col("doc_id"), ng.cast("long").as("n_grams"),
          nu.cast("long").as("n_unique"),
          Text.dupNgramRatio(col("text"), 2).as("dup_ratio"))
        .orderBy(col("doc_id"))
    }),

    // --- sharded deterministic shuffle (Splits.shardAndShuffle): hash
    //     shard assignment + stable pseudo-random within-shard order for
    //     training-data export; reproducible run-over-run, no rand() ---
    "q_shard_shuffle" -> ((s, dir) => {
      Splits.shardAndShuffle(t(s, dir, "documents").select(col("doc_id")), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    })
  )

  def oracleSql3: Map[String, String] = Map(

    "q_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_skew_join" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_commit_sequence" ->
      """SELECT 'a' AS dataset, 'skipped' AS action, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'b' AS dataset, 'published' AS action, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM lineitem
        |ORDER BY dataset""".stripMargin,

    "q_schema_evolve" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(CASE WHEN event_id % 3 = 1 THEN 1 END) AS BIGINT) AS n_extra,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_partition_intervals" ->
      """WITH r AS (SELECT CAST(min(user_id) AS BIGINT) AS lo, CAST(max(user_id) AS BIGINT) AS hi FROM events),
        |p AS (SELECT lo, hi, least(32, hi - lo) AS n,
        |        CAST(ceil(CAST(hi - lo AS DOUBLE) / least(32, hi - lo)) AS BIGINT) AS step FROM r),
        |e AS (SELECT lo, hi, step, unnest(range(0, n)) AS i FROM p)
        |SELECT lo + i * step AS lo_w, least(lo + (i + 1) * step, hi) AS hi_w
        |FROM e WHERE lo + i * step < hi ORDER BY lo_w""".stripMargin,

    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding,
        |        CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END AS sc FROM q),
        |qq AS (SELECT vec_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * sc + 0.5) AS BIGINT)) AS qv
        |       FROM s)
        |SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(1, CAST(len(a.qv) AS BIGINT) + 1), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS qdot
        |FROM qq a JOIN qq b ON a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) <= 5
        |ORDER BY query_id, qdot DESC, neighbor_id""".stripMargin,

    "q_ann_lsh_quantized" ->
      OracleSql.annHyperplaneLshQuantized(k = 5, prefilter = 20, probeMod = 100),

    "q_pii_scrub" ->
      s"""WITH r AS (SELECT doc_id,
         |  substring(text, 1, 40) || ' contact ' || source || '.' || lang || '@example.com or 10.' ||
         |  CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
         |  ' ext 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
         |FROM documents)
         |SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(raw,
         |  '${Text.EmailRe}', '<EMAIL>', 'g'),
         |  '${Text.Ipv4Re}', '<IP>', 'g'),
         |  '${Text.PhoneRe}', '<PHONE>', 'g') AS scrubbed
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ws FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(ws) >= 2
        |        THEN list_transform(range(1, CAST(len(ws) AS BIGINT)), i -> array_to_string(ws[i:i+1], ' '))
        |        ELSE [] END AS grams FROM w)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique,
        |  CASE WHEN len(grams) <= 0 THEN 0.0
        |    ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE) END AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_shard_shuffle" -> {
      val shardExpr = Splits.shardCuts(8)
        .map(c => s"(CASE WHEN substr(h, 1, 4) >= '$c' THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH h AS (SELECT doc_id, md5('graft|' || CAST(doc_id AS VARCHAR)) AS h FROM documents)
         |SELECT doc_id, CAST($shardExpr AS INTEGER) AS shard,
         |  row_number() OVER (PARTITION BY ($shardExpr) ORDER BY h, doc_id) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin
    }
  )
}
