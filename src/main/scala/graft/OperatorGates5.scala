package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Converters

/** Round-4 wave 5: driver gates for the last ScalaTest-only components
  * of the SURVEY §2 inventory — the recursion eliminator, the generic
  * record-stream processor chain, instrumented metrics, and sketches —
  * plus the flow-compiler gate. Same discipline as every wave: the
  * query side executes the REAL operator machinery; the oracle replays
  * the semantics independently in DuckDB.
  */
object OperatorGates5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def queries5: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- recursion eliminator (ref AvroRecursionEliminatingConverter
    //     .java:42): a self-referencing record schema is rejected by
    //     the direct StructType mapping, made ingestable by
    //     eliminateRecursion + toParseStruct (recursive field REMOVED,
    //     the reference's behavior), then actually used to parse JSON
    //     payloads that DO carry the recursive subtree. sum_id proves
    //     the parser skips the dropped subtree cleanly (a desynced
    //     parse would leak reply.id = 2*doc_id into id) ----------------
    "q_recursive_schema" -> ((s, dir) => {
      import graft.functions.JsonSchema._
      val inner = Seq[(String, SType)](
        "id" -> SLong, "lang" -> SString,
        "score" -> SUnion(Seq(SNull, SLong)),
        "tags" -> SArray(SString))
      val comment = SRecord("comment",
        inner :+ ("reply" -> SRecord("comment", inner :+ ("reply" -> SNull))))
      val rejected =
        try { toSpark(comment); false }
        catch { case _: IllegalArgumentException => true }
      require(rejected, "recursive schema must be rejected before elimination")
      val schema = toParseStruct(comment)
      require(!schema.fieldNames.contains("reply"), "recursive field must be dropped")
      val js = format_string(
        """{"id": %s, "lang": "%s", "score": %s, "tags": %s, "reply": {"id": %s, "lang": "zz", "score": 1, "tags": [], "reply": null}}""",
        col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("null"))
          .otherwise(pmod(col("doc_id"), lit(7)).cast("string")),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("""["a","b"]"""))
          .otherwise(lit("""["a"]""")),
        (col("doc_id") * 2).cast("string"))
      t(s, dir, "documents")
        .select(from_json(js, schema).as("p"))
        .groupBy(col("p.lang").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("p.id")).as("sum_id"),
          sum(col("p.score")).as("sum_score"),
          sum(size(col("p.tags")).cast("long")).as("n_tags"))
        .orderBy(col("lang"))
    }),

    // --- generic record-stream processor chain (ref
    //     RecordStreamProcessor.java, StreamModelTaskRunner.java:78):
    //     a 4-stage Converters.chain — predicate filter, 1->N record
    //     splitter, post-split filter, projection — run as ONE
    //     composed op, the way JobRunner executes converter chains ----
    "q_processor_chain" -> ((s, dir) => {
      val op = Converters.chain(
        Converters.filterWhere(col("lang").isin("en", "de")),
        Converters.splitToRecords("text", " ", "word"),
        Converters.filterWhere(length(col("word")) > 0),
        Converters.pickFields("doc_id", "lang", "word"))
      op(t(s, dir, "documents"))
        .groupBy(col("lang"), length(col("word")).as("wlen"))
        .agg(count(lit(1)).as("n"), min(col("word")).as("min_word"))
        .orderBy(col("lang"), col("wlen"))
    }),

    // --- instrumented metrics (ref gobblin-core-base instrumented
    //     decorators + JobMetrics): run a real JobRunner job and emit
    //     its OBSERVED counters as the result — rows written (from the
    //     write-riding Observation), quarantined rows, the committed
    //     high watermark, and the write's numOutputRows as seen by the
    //     QueryExecutionListener. The oracle recomputes every counter
    //     from the raw table ------------------------------------------
    "q_observed_metrics" -> ((s, dir) => {
      import graft.metrics.GraftListener
      import graft.model.JobSpec
      import graft.runner.JobRunner
      import graft.state.FsStateStore
      val tmp = tmpDir("graft_metrics")
      val listener = GraftListener.install(s)
      try {
        val rr = JobRunner.run(
          s, new FsStateStore(s"$tmp/state"), JobSpec("gate_metrics"),
          read = sess => Tables.load(sess, dir, "events")
            .select(col("event_id"), col("event_type"), col("value")),
          watermarkCol = "event_id",
          ops = Seq.empty,
          rowPolicies = Seq(graft.quality.Quality.RowPolicy(
            "vcap", col("value") <= 150, graft.quality.Quality.ErrFile)),
          taskPolicies = Nil,
          sink = (s"$tmp/staging", s"$tmp/out", Nil),
          quarantineDir = Some(s"$tmp/quarantine"))
        require(rr.published, s"metrics job must publish: $rr")
        // listener callbacks ride the async listener bus; poll until the
        // staged write's numOutputRows shows up (bounded)
        var tries = 0
        def writeRows: Option[Long] = listener.snapshot
          .find(m => !m.failed && m.outputRows.contains(rr.rowsWritten))
          .flatMap(_.outputRows)
        while (writeRows.isEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
        val lr = writeRows.getOrElse(sys.error("listener never saw the staged write"))
        import s.implicits._
        Seq(
          ("high_watermark", rr.highWatermark.getOrElse(-1L)),
          ("listener_rows_out", lr),
          ("published_runs", 1L),
          ("quarantined", rr.quarantined),
          ("rows_written", rr.rowsWritten))
          .toDF("metric", "value").orderBy(col("metric"))
      } finally s.listenerManager.unregister(listener)
    }),

    // --- GaaS flow compiler (ref MultiHopFlowCompiler.java:78,
    //     BFSPathFinder.java:70, Orchestrator.java:82): a 2-hop flow
    //     (landing -> warehouse ingest -> compacted mart) compiled by
    //     descriptor-typed BFS — a 1-hop decoy edge demands avro and
    //     must lose to the compatible 2-hop path — then executed
    //     hop-by-hop with per-hop completion records; a second execute
    //     skips every hop (resume contract). Result = the mart --------
    "q_flow_compile" -> ((s, dir) => {
      import graft.runner.FlowCompiler
      import graft.runner.FlowCompiler._
      import graft.state.FsStateStore
      val tmp = tmpDir("graft_flow")
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .write.parquet(s"$tmp/landing")
      val parquetD = DatasetDescriptor(format = "parquet")
      val tableD = DatasetDescriptor(format = "table")
      val edges = Seq(
        FlowEdge("direct", "landing", "mart",
          DatasetDescriptor(format = "avro"), tableD, Map.empty),
        FlowEdge("ingest", "landing", "warehouse", parquetD, parquetD, Map(
          "job.type" -> "ingest",
          "source.path" -> "${flow.landing}",
          "source.watermark.expr" -> "event_id",
          "ops" -> "filter",
          "op.filter.predicate" -> "value <= 180",
          "state.dir" -> "${flow.work}/state",
          "sink.staging" -> "${flow.work}/wh_staging",
          "sink.output" -> "${flow.work}/wh")),
        FlowEdge("compact", "warehouse", "mart", parquetD, tableD, Map(
          "job.type" -> "compact",
          "source.path" -> "${flow.work}/wh",
          "compact.keys" -> "event_id",
          "sink.staging" -> "${flow.work}/mart_staging",
          "sink.output" -> "${flow.work}/mart")))
      val flow = FlowSpec("gate_flow", "landing", "mart",
        input = parquetD, output = tableD,
        config = Map("landing" -> s"$tmp/landing", "work" -> tmp))
      val compiled = FlowCompiler.compile(edges, flow)
        .fold(e => sys.error(e), identity)
      require(compiled.hops.map(_.id) == Seq("ingest", "compact"),
        s"BFS must pick the compatible 2-hop path, got ${compiled.hops.map(_.id)}")
      val store = new FsStateStore(s"$tmp/flowstate")
      val r1 = FlowCompiler.execute(s, store, compiled)
      require(r1.map(_.action) == Seq("ran", "ran"), s"first run executes: $r1")
      val r2 = FlowCompiler.execute(s, store, compiled)
      require(r2.map(_.action) == Seq("skipped", "skipped"), s"rerun resumes: $r2")
      s.read.parquet(s"$tmp/mart")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("sum_v_milli"))
        .orderBy(col("event_type"))
    }),

    // --- HLL sketch (approx_count_distinct — Spark's HyperLogLog++):
    //     per-group estimate checked against the exact distinct count
    //     at 3x the requested rsd. The estimate is deterministic for
    //     fixed data, so the bound flag is stable; the oracle replays
    //     the exact side and asserts the bound --------------------------
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.05).as("_est"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("_est") - col("n_exact")) <= col("n_exact") * 0.15)
            .as("est_in_bound"))
        .orderBy(col("event_type"))
    })
  )

  def oracleSql5: Map[String, String] = Map(

    "q_recursive_schema" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id % 7 END) AS BIGINT) AS sum_score,
        |  count(*) + count(*) FILTER (doc_id % 2 = 0) AS n_tags
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_processor_chain" ->
      """SELECT lang, CAST(len(word) AS INT) AS wlen, count(*) AS n, min(word) AS min_word
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |      FROM documents WHERE lang IN ('en', 'de'))
        |WHERE len(word) > 0
        |GROUP BY lang, len(word) ORDER BY lang, wlen""".stripMargin,

    "q_observed_metrics" ->
      """SELECT 'high_watermark' AS metric, max(event_id) AS value FROM events WHERE value <= 150
        |UNION ALL SELECT 'listener_rows_out', count(*) FROM events WHERE value <= 150
        |UNION ALL SELECT 'published_runs', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'quarantined', count(*) FROM events WHERE value > 150
        |UNION ALL SELECT 'rows_written', count(*) FROM events WHERE value <= 150
        |ORDER BY metric""".stripMargin,

    "q_flow_compile" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM events WHERE value <= 180
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS est_in_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
