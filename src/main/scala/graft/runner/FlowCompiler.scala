package graft.runner

import java.util.Properties

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.state.{FsStateStore, StateStore}

/** Thin GaaS flow compiler (SURVEY §3.3) — the reference's
  * FlowGraph → JobSpec-chain compilation re-expressed as driver-side
  * planning over the existing properties-job vocabulary:
  *
  *   - FlowGraph of dataset-descriptor-typed edges
  *     (gobblin-service/.../flowgraph/BaseFlowEdge.java,
  *     DatasetDescriptor `contains` semantics in
  *     flowgraph/DatasetDescriptorConfigKeys.java)
  *   - shortest-hop path search, BFS over EDGES with
  *     (edge, arriving-descriptor) visited marking so descriptor-
  *     dependent revisits terminate (pathfinder/BFSPathFinder.java:46-70)
  *   - compilation of the hop path into ordered, fully-resolved job
  *     Properties (flow/MultiHopFlowCompiler.java:78,
  *     IdentityFlowToJobSpecCompiler)
  *   - orchestration: hops execute in order through [[JobConfig.runAny]]
  *     with per-hop completion persisted in the state store, so a rerun
  *     after a mid-flow crash SKIPS completed hops — the same resume
  *     contract as [[graft.sink.CommitSequence]]
  *     (orchestration/Orchestrator.java:82).
  *
  * Everything here is O(graph) driver-side metadata; the data movement
  * inside each hop is the already-distributed job machinery.
  */
object FlowCompiler {

  /** Dataset descriptor: what an edge consumes/produces ("any" = the
    * reference's wildcard). `contains` is the compatibility test — a
    * descriptor contains another iff every NON-wildcard field matches.
    */
  final case class DatasetDescriptor(
      format: String = "any", platform: String = "any", path: String = "any") {

    def contains(o: DatasetDescriptor): Boolean =
      Seq((format, o.format), (platform, o.platform), (path, o.path))
        .forall { case (mine, theirs) => mine == "any" || mine == theirs }

    /** The descriptor downstream of an edge: wildcard output fields
      * pass the incoming value through (an edge that doesn't change
      * format/platform shouldn't have to re-declare them).
      */
    def resolveAgainst(incoming: DatasetDescriptor): DatasetDescriptor =
      DatasetDescriptor(
        if (format == "any") incoming.format else format,
        if (platform == "any") incoming.platform else platform,
        if (path == "any") incoming.path else path)
  }

  /** One hop: from/to are DataNode ids; `template` is a properties-job
    * template ([[JobConfig.runAny]] vocabulary) whose values may carry
    * `${flow.<key>}` placeholders resolved from the FlowSpec config at
    * compile time.
    */
  final case class FlowEdge(id: String, from: String, to: String,
      input: DatasetDescriptor, output: DatasetDescriptor,
      template: Map[String, String])

  /** A user's flow request: move data of shape `input` at `sourceNode`
    * to shape `output` at `destNode`; `config` feeds template
    * placeholders (paths, state dir, thresholds).
    */
  final case class FlowSpec(name: String, sourceNode: String, destNode: String,
      input: DatasetDescriptor = DatasetDescriptor(),
      output: DatasetDescriptor = DatasetDescriptor(),
      config: Map[String, String] = Map.empty)

  final case class CompiledFlow(flow: FlowSpec, hops: Seq[FlowEdge], jobs: Seq[Properties])

  /** Shortest compatible hop path, BFS over edges. A search state is
    * (node, descriptor-on-arrival); an edge is traversable when its
    * declared input contains the current descriptor, and the flow
    * completes when the dest node is reached with a descriptor the
    * flow's output descriptor contains.
    */
  def findPath(edges: Seq[FlowEdge], flow: FlowSpec): Either[String, Seq[FlowEdge]] = {
    val byFrom = edges.groupBy(_.from)
    val queue = mutable.Queue[(String, DatasetDescriptor, List[FlowEdge])](
      (flow.sourceNode, flow.input, Nil))
    val visited = mutable.Set[(String, DatasetDescriptor)]((flow.sourceNode, flow.input))
    while (queue.nonEmpty) {
      val (node, desc, path) = queue.dequeue()
      if (node == flow.destNode && flow.output.contains(desc) && path.nonEmpty)
        return Right(path.reverse)
      byFrom.getOrElse(node, Nil).foreach { e =>
        if (e.input.contains(desc)) {
          val next = e.output.resolveAgainst(desc)
          if (visited.add((e.to, next)))
            queue.enqueue((e.to, next, e :: path))
        }
      }
    }
    Left(s"no path ${flow.sourceNode} -> ${flow.destNode} satisfying " +
      s"${flow.input} -> ${flow.output} (${edges.size} edges)")
  }

  private val Placeholder = raw"\$$\{flow\.([A-Za-z0-9_.-]+)\}".r

  private def resolve(value: String, flow: FlowSpec): String =
    Placeholder.replaceAllIn(value, m =>
      scala.util.matching.Regex.quoteReplacement(
        flow.config.getOrElse(m.group(1), throw new IllegalArgumentException(
          s"flow '${flow.name}': template needs flow config key '${m.group(1)}'"))))

  /** Compile: path-find, then materialize one fully-resolved
    * Properties per hop. `job.name` defaults to
    * `<flow>_h<i>_<edgeId>` so each hop gets its own watermark/state
    * identity.
    */
  def compile(edges: Seq[FlowEdge], flow: FlowSpec): Either[String, CompiledFlow] =
    findPath(edges, flow).map { path =>
      val jobs = path.zipWithIndex.map { case (e, i) =>
        val p = new Properties()
        e.template.foreach { case (k, v) => p.setProperty(k, resolve(v, flow)) }
        if (p.getProperty("job.name") == null)
          p.setProperty("job.name", s"${flow.name}_h${i}_${e.id}")
        p
      }
      CompiledFlow(flow, path, jobs)
    }

  /** One node of a compiled multicast DAG: its resolved job, and the
    * job names it must wait for (its path predecessor).
    */
  final case class DagNode(jobName: String, edge: FlowEdge, props: Properties,
      dependsOn: Seq[String])

  final case class CompiledDag(flow: FlowSpec, nodes: Seq[DagNode])

  /** Multicast compilation — the reference's Dag-of-JobSpecs shape
    * (flow/MultiHopFlowCompiler.java compiles to a Dag, not a chain;
    * orchestration/DagManager.java walks it): one flow fanning out to
    * several destinations. Each destination gets its shortest
    * compatible path; hops shared as a common path PREFIX compile to
    * ONE job (same job identity — deterministic hop naming makes the
    * dedup structural), so the landing→warehouse ingest of a
    * warehouse→{mart, archive} fan-out runs once. Nodes come back in
    * dependency (topological) order.
    */
  def compileMulticast(edges: Seq[FlowEdge], flow: FlowSpec,
      dests: Seq[(String, DatasetDescriptor)]): Either[String, CompiledDag] = {
    require(dests.nonEmpty, "multicast needs at least one destination")
    val paths = dests.map { case (node, out) =>
      findPath(edges, flow.copy(destNode = node, output = out))
    }
    paths.collectFirst { case Left(e) => e } match {
      case Some(err) => Left(err)
      case None =>
        val seen = scala.collection.mutable.LinkedHashMap[String, DagNode]()
        paths.map(_.toOption.get).foreach { path =>
          path.zipWithIndex.foldLeft(Option.empty[String]) { case (prev, (e, i)) =>
            val name = s"${flow.name}_h${i}_${e.id}"
            seen.get(name) match {
              case Some(existing) => // same (edge, depth) = same job; merge deps
                seen += name -> existing.copy(
                  dependsOn = (existing.dependsOn ++ prev).distinct)
              case None =>
                val p = new Properties()
                e.template.foreach { case (k, v) => p.setProperty(k, resolve(v, flow)) }
                if (p.getProperty("job.name") == null) p.setProperty("job.name", name)
                seen += name -> DagNode(name, e, p, prev.toSeq)
            }
            Some(name)
          }
        }
        // re-topsort: insertion order can place a merged-in dependency
        // after its dependent. Acyclic by construction (a dep is always
        // one hop shallower), so the DFS terminates.
        val byName = seen.values.map(n => n.jobName -> n).toMap
        val ordered = scala.collection.mutable.LinkedHashSet[String]()
        def visit(n: DagNode): Unit = if (!ordered.contains(n.jobName)) {
          n.dependsOn.foreach(d => visit(byName(d)))
          ordered += n.jobName
        }
        seen.values.foreach(visit)
        Right(CompiledDag(flow, ordered.toSeq.map(byName)))
    }
  }

  /** Execute a multicast DAG: nodes run in dependency order with the
    * same per-hop completion records as [[execute]]; a node whose
    * dependency failed this run is skipped as "blocked" (recorded, so
    * a resume retries it after the dependency is fixed).
    */
  def executeDag(spark: SparkSession, store: StateStore,
      dag: CompiledDag,
      issues: Option[Troubleshooter.MultiContextIssueRepository] = None): Seq[HopResult] = {
    val dir = s"flows/${dag.flow.name}"
    val failed = scala.collection.mutable.Set[String]()
    dag.nodes.map { node =>
      val key = node.jobName
      if (node.dependsOn.exists(failed.contains)) {
        failed += key // propagate: dependents must not run either
        HopResult(key, "blocked", Map("blocked_on" -> node.dependsOn.mkString(",")))
      } else store.get(dir, key) match {
        case Some(st) if st.get("status").contains("done") =>
          HopResult(key, "skipped", st - "status")
        case _ =>
          try {
            val summary = JobConfig.runAny(spark, node.props)
            store.put(dir, key, summary + ("status" -> "done"))
            HopResult(key, "ran", summary)
          } catch {
            case e: Exception =>
              failed += key
              recordIssue(issues, dag.flow.name, key, e)
              store.put(dir, key, Map("status" -> "failed", "error" -> e.getMessage))
              HopResult(key, "failed", Map("error" -> e.getMessage))
          }
      }
    }
  }

  /** Classify a hop failure into the troubleshooter (when attached):
    * context = flow:name:-:hop (ref TroubleshooterUtils context ids).
    */
  private def recordIssue(issues: Option[Troubleshooter.MultiContextIssueRepository],
      flowName: String, hop: String, e: Throwable): Unit =
    issues.foreach(_.put(
      Troubleshooter.contextIdForJob("flow", flowName, "-", hop),
      Troubleshooter.fromThrowable(e, "graft.runner.FlowCompiler",
        s"hop '$hop' of flow '$flowName'",
        timeMs = System.currentTimeMillis())))

  final case class HopResult(hop: String, action: String, summary: Map[String, String])

  /** Orchestrate a compiled flow: hops run IN ORDER through
    * [[JobConfig.runAny]]; each completion is recorded in the state
    * store before the next hop starts, and a rerun skips recorded
    * hops (crash-resume; same contract as CommitSequence). A hop that
    * throws is recorded failed and aborts the flow.
    */
  def execute(spark: SparkSession, store: StateStore,
      compiled: CompiledFlow,
      issues: Option[Troubleshooter.MultiContextIssueRepository] = None): Seq[HopResult] = {
    val dir = s"flows/${compiled.flow.name}"
    compiled.hops.zip(compiled.jobs).map { case (hop, props) =>
      val key = props.getProperty("job.name")
      store.get(dir, key) match {
        case Some(st) if st.get("status").contains("done") =>
          HopResult(key, "skipped", st - "status")
        case _ =>
          val summary =
            try JobConfig.runAny(spark, props)
            catch {
              case e: Exception =>
                recordIssue(issues, compiled.flow.name, key, e)
                store.put(dir, key, Map("status" -> "failed", "error" -> e.getMessage))
                throw new IllegalStateException(
                  s"flow '${compiled.flow.name}' failed at hop '$key': ${e.getMessage}", e)
            }
          store.put(dir, key, summary + ("status" -> "done"))
          HopResult(key, "ran", summary)
      }
    }
  }

  /** Clear a flow's hop records so the NEXT execution starts a fresh
    * sequence (the post-success clear the reference does on flow
    * completion).
    */
  def reset(store: StateStore, flowName: String): Unit =
    store.listKeys(s"flows/$flowName").foreach(store.delete(s"flows/$flowName", _))
}
