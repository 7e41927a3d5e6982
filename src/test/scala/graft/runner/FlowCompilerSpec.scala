package graft.runner

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.runner.FlowCompiler._
import graft.state.FsStateStore

/** Flow compiler: descriptor-typed BFS path finding, template
  * resolution, and a real 2-hop flow (landing tree → warehouse →
  * catalog-registered mart) executed hop-by-hop with crash-resume.
  */
class FlowCompilerSpec extends SparkSpec {

  private val anyD = DatasetDescriptor()

  private def edge(id: String, from: String, to: String,
      in: DatasetDescriptor = anyD, out: DatasetDescriptor = anyD,
      template: Map[String, String] = Map.empty) =
    FlowEdge(id, from, to, in, out, template)

  test("BFS picks the shortest COMPATIBLE path, not the shortest path") {
    val csv = DatasetDescriptor(format = "csv")
    val parquet = DatasetDescriptor(format = "parquet")
    val avro = DatasetDescriptor(format = "avro")
    val edges = Seq(
      edge("direct_avro", "landing", "mart", in = avro), // 1 hop but wrong format
      edge("convert", "landing", "warehouse", in = csv, out = parquet),
      edge("promote", "warehouse", "mart", in = parquet))
    val flow = FlowSpec("f", "landing", "mart", input = csv, output = parquet)
    val path = findPath(edges, flow)
    assert(path.map(_.map(_.id)) == Right(Seq("convert", "promote")))
    // with avro input the 1-hop edge wins (its wildcard output passes
    // avro through, and the flow's output descriptor must accept that)
    val avroFlow = FlowSpec("f2", "landing", "mart", input = avro, output = avro)
    assert(findPath(edges, avroFlow).map(_.map(_.id)) == Right(Seq("direct_avro")))
    // no compatible path at all
    val jsonFlow = FlowSpec("f3", "landing", "mart",
      input = DatasetDescriptor(format = "json"))
    assert(findPath(edges, jsonFlow).isLeft)
  }

  test("wildcard output descriptors thread the incoming descriptor through") {
    val parquet = DatasetDescriptor(format = "parquet")
    // replicate preserves format (output 'any'); the dest requires parquet
    val edges = Seq(
      edge("replicate", "a", "b"),
      edge("load", "b", "c", in = parquet, out = parquet))
    val ok = FlowSpec("f", "a", "c", input = parquet, output = parquet)
    assert(findPath(edges, ok).map(_.map(_.id)) == Right(Seq("replicate", "load")))
    // a csv flow cannot take the same path: replicate forwards csv,
    // which 'load' refuses
    val bad = FlowSpec("f", "a", "c", input = DatasetDescriptor(format = "csv"))
    assert(findPath(edges, bad).isLeft)
  }

  test("cyclic graphs terminate (edge, descriptor) — no infinite revisit") {
    val edges = Seq(
      edge("ab", "a", "b"), edge("ba", "b", "a"), edge("bb", "b", "b"))
    val flow = FlowSpec("f", "a", "zzz") // unreachable dest
    assert(findPath(edges, flow).isLeft) // must return, not hang
  }

  test("compile resolves ${flow.*} placeholders; missing keys fail loudly") {
    val edges = Seq(edge("hop", "a", "b",
      template = Map("job.type" -> "ingest", "source.path" -> "${flow.in}/data",
        "sink.output" -> "${flow.work}/out")))
    val flow = FlowSpec("myflow", "a", "b",
      config = Map("in" -> "/landing", "work" -> "/tmp/w"))
    val compiled = compile(edges, flow).toOption.get
    val p = compiled.jobs.head
    assert(p.getProperty("source.path") == "/landing/data")
    assert(p.getProperty("sink.output") == "/tmp/w/out")
    assert(p.getProperty("job.name") == "myflow_h0_hop")
    val missing = FlowSpec("myflow", "a", "b", config = Map("in" -> "/landing"))
    val err = intercept[IllegalArgumentException](compile(edges, missing))
    assert(err.getMessage.contains("work"))
  }

  test("2-hop flow end-to-end: land -> warehouse ingest -> compacted mart + resume semantics") {
    val root = tmpDir("flow")
    val spark0 = spark
    import spark0.implicits._
    // landing tree: events subset as plain parquet
    val ev = Tables.load(spark, sf(), "events")
      .select($"event_id", $"event_type", $"value")
    ev.write.parquet(s"$root/landing")
    val nAll = ev.count()
    val nKept = ev.filter($"value" <= 180).count()
    assert(nKept > 0 && nKept < nAll)

    val parquet = DatasetDescriptor(format = "parquet")
    val table = DatasetDescriptor(format = "table")
    val edges = Seq(
      // decoy: direct landing->mart but only for avro
      edge("direct", "landing", "mart", in = DatasetDescriptor(format = "avro")),
      edge("ingest", "landing", "warehouse", in = parquet, out = parquet,
        template = Map(
          "job.type" -> "ingest",
          "source.path" -> "${flow.landing}",
          "source.watermark.expr" -> "event_id",
          "ops" -> "filter",
          "op.filter.predicate" -> "value <= 180",
          "state.dir" -> "${flow.work}/state",
          "sink.staging" -> "${flow.work}/wh_staging",
          "sink.output" -> "${flow.work}/wh")),
      edge("compact", "warehouse", "mart", in = parquet, out = table,
        template = Map(
          "job.type" -> "compact",
          "source.path" -> "${flow.work}/wh",
          "compact.keys" -> "event_id",
          "sink.staging" -> "${flow.work}/mart_staging",
          "sink.output" -> "${flow.work}/mart")))
    val flow = FlowSpec("evflow", "landing", "mart",
      input = parquet, output = table,
      config = Map("landing" -> s"$root/landing", "work" -> root))

    val compiled = compile(edges, flow).toOption.get
    assert(compiled.hops.map(_.id) == Seq("ingest", "compact"))

    val store = new FsStateStore(s"$root/flowstate")
    val r1 = FlowCompiler.execute(spark, store, compiled)
    assert(r1.map(_.action) == Seq("ran", "ran"))
    assert(spark.read.parquet(s"$root/mart").count() == nKept)

    // re-execute: both hops recorded done -> skipped, no double publish
    val r2 = FlowCompiler.execute(spark, store, compiled)
    assert(r2.map(_.action) == Seq("skipped", "skipped"))
    assert(spark.read.parquet(s"$root/mart").count() == nKept)

    // crash between hops: drop hop2's record; rerun resumes at hop 2
    store.delete("flows/evflow", r1(1).hop)
    val r3 = FlowCompiler.execute(spark, store, compiled)
    assert(r3.map(_.action) == Seq("skipped", "ran"))
    assert(spark.read.parquet(s"$root/mart").count() == nKept,
      "hop-2 replay must keep the mart consistent (compaction dedups on event_id)")

    // reset clears the sequence: next execution runs hop 1 again, and
    // the ingest job's own watermark makes it an empty incremental
    FlowCompiler.reset(store, "evflow")
    val r4 = FlowCompiler.execute(spark, store, compiled)
    assert(r4.map(_.action) == Seq("ran", "ran"))
    assert(r4.head.summary("rowsWritten") == "0", "second ingest is an empty incremental")
    assert(spark.read.parquet(s"$root/mart").count() == nKept)
  }

  test("multicast DAG: shared ingest prefix runs once, branches fan out, blocked propagates") {
    val root = tmpDir("flowdag")
    val spark0 = spark
    import spark0.implicits._
    val ev = Tables.load(spark, sf(), "events")
      .select($"event_id", $"event_type", $"value")
    ev.write.parquet(s"$root/landing")
    val parquet = DatasetDescriptor(format = "parquet")
    val edges = Seq(
      edge("ingest", "landing", "warehouse", in = parquet, out = parquet,
        template = Map(
          "job.type" -> "ingest",
          "source.path" -> "${flow.landing}",
          "source.watermark.expr" -> "event_id",
          "state.dir" -> "${flow.work}/state",
          "sink.staging" -> "${flow.work}/wh_staging",
          "sink.output" -> "${flow.work}/wh")),
      edge("compact", "warehouse", "mart", in = parquet, out = parquet,
        template = Map(
          "job.type" -> "compact",
          "source.path" -> "${flow.work}/wh",
          "compact.keys" -> "event_id",
          "sink.staging" -> "${flow.work}/mart_staging",
          "sink.output" -> "${flow.work}/mart")),
      edge("archive", "warehouse", "vault", in = parquet, out = parquet,
        template = Map(
          "job.type" -> "copy",
          "source.path" -> "${flow.work}/wh",
          "copy.dest" -> "${flow.work}/vault")))
    val flow = FlowSpec("fanout", "landing", "unused", input = parquet,
      config = Map("landing" -> s"$root/landing", "work" -> root))
    val dag = compileMulticast(edges, flow,
      Seq("mart" -> parquet, "vault" -> parquet)).toOption.get
    assert(dag.nodes.map(_.edge.id) == Seq("ingest", "compact", "archive"))
    assert(dag.nodes.head.dependsOn.isEmpty)
    assert(dag.nodes.tail.forall(_.dependsOn == Seq("fanout_h0_ingest")),
      "both branches depend on the single shared ingest")

    val store = new FsStateStore(s"$root/flowstate")
    val r1 = executeDag(spark, store, dag)
    assert(r1.map(_.action) == Seq("ran", "ran", "ran"))
    val n = spark.read.parquet(s"$root/mart").count()
    assert(n == ev.count() && spark.read.parquet(s"$root/vault").count() == n)
    assert(executeDag(spark, store, dag).map(_.action) == Seq("skipped", "skipped", "skipped"))

    // a failing shared hop blocks BOTH dependents
    val badEdges = edges.map(e => if (e.id == "ingest")
      e.copy(template = e.template + ("job.type" -> "teleport")) else e)
    val badDag = compileMulticast(badEdges,
      flow.copy(name = "fanout2"), Seq("mart" -> parquet, "vault" -> parquet)).toOption.get
    val r2 = executeDag(spark, new FsStateStore(s"$root/flowstate2"), badDag)
    assert(r2.map(_.action) == Seq("failed", "blocked", "blocked"))
  }

  test("property: BFS path is valid, compatible, and hop-minimal (200 random graphs)") {
    val formats = Seq("parquet", "csv", "avro", "any")
    val rnd = new scala.util.Random(0xF10C)
    def randDesc() = DatasetDescriptor(format = formats(rnd.nextInt(formats.length)))
    (1 to 200).foreach { trial =>
      val nNodes = 3 + rnd.nextInt(4)
      val nodes = (0 until nNodes).map(i => s"n$i")
      val edges = (0 until (3 + rnd.nextInt(8))).map { j =>
        edge(s"e$j", nodes(rnd.nextInt(nNodes)), nodes(rnd.nextInt(nNodes)),
          in = randDesc(), out = randDesc())
      }
      val flow = FlowSpec(s"t$trial", nodes.head, nodes.last,
        input = DatasetDescriptor(format = formats(rnd.nextInt(3))), // concrete input
        output = randDesc())

      // independent checker: enumerate ALL edge paths up to length 5
      // (exponential enumeration — the cap keeps worst case ~8^5/trial)
      def walk(node: String, desc: DatasetDescriptor, depth: Int): Option[Int] =
        if (node == flow.destNode && flow.output.contains(desc) && depth > 0) Some(depth)
        else if (depth >= 5) None
        else edges.filter(e => e.from == node && e.input.contains(desc))
          .flatMap(e => walk(e.to, e.output.resolveAgainst(desc), depth + 1))
          .minOption
      val brute = walk(flow.sourceNode, flow.input, 0)

      findPath(edges, flow) match {
        case Right(path) =>
          // replay the path: every hop must be compatible in sequence
          val endDesc = path.foldLeft((flow.sourceNode, flow.input)) {
            case ((node, desc), e) =>
              assert(e.from == node && e.input.contains(desc),
                s"trial $trial: hop ${e.id} incompatible")
              (e.to, e.output.resolveAgainst(desc))
          }
          assert(endDesc._1 == flow.destNode && flow.output.contains(endDesc._2))
          if (path.length <= 5)
            assert(brute.contains(path.length),
              s"trial $trial: BFS found ${path.length} hops, brute-force says $brute")
          else assert(brute.isEmpty,
            s"trial $trial: brute found $brute but BFS needed ${path.length}")
        case Left(_) =>
          assert(brute.isEmpty, s"trial $trial: BFS said no-path but brute found $brute")
      }
    }
  }

  test("a failing hop is recorded and aborts the flow") {
    val root = tmpDir("flowfail")
    val edges = Seq(edge("boom", "a", "b",
      template = Map("job.type" -> "teleport")))
    val flow = FlowSpec("failflow", "a", "b")
    val compiled = compile(edges, flow).toOption.get
    val store = new FsStateStore(s"$root/state")
    val issues = new Troubleshooter.MultiContextIssueRepository()
    val err = intercept[IllegalStateException](
      FlowCompiler.execute(spark, store, compiled, issues = Some(issues)))
    assert(err.getMessage.contains("failflow") && err.getMessage.contains("boom"))
    val rec = store.get("flows/failflow", "failflow_h0_boom")
    assert(rec.exists(_.get("status").contains("failed")))
    // the failure is classified into the attached troubleshooter
    val got = issues.getAll("flow:failflow:-:failflow_h0_boom")
    assert(got.size === 1)
    assert(got.head.severity === Troubleshooter.Severity.Error)
    assert(got.head.summary.contains("failflow"))
  }
}
