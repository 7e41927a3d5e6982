package graft.runner

import java.nio.charset.StandardCharsets

import scala.collection.immutable.ListMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import graft.runner.FlowCompiler.{DatasetDescriptor, FlowSpec}

/** Persisted, versioned FlowSpec catalog — the reference's
  * spec-catalog surface re-expressed on a filesystem tree:
  *
  *   - a catalog stores named FlowSpecs and hands them to the
  *     compiler/orchestrator (gobblin-runtime/.../spec_catalog/
  *     FlowCatalog.java:60-120: put/get/remove over an underlying
  *     SpecStore);
  *   - the store is a filesystem layout with one directory per spec
  *     and one FILE PER VERSION, so an update never rewrites history
  *     (gobblin-runtime/.../spec_store/FSSpecStore.java:45-60,
  *     getSpecUri/specToPath);
  *   - the CURRENT version is a metadata pointer updated by atomic
  *     rename, the same single-step-replace discipline as
  *     [[graft.state.FsStateStore]] (and the config store's
  *     current-version metadata, SimpleHDFSStoreMetadata.java).
  *
  * Layout: `<root>/_FLOW_CATALOG/<flowName>/<version>.conf` +
  * `<root>/_FLOW_CATALOG/<flowName>/_current` (the pointer).
  * Versions are `v1, v2, ...` — monotonically assigned, never
  * reused, so readers of an old version keep a stable view while a
  * writer publishes the next (the config-store deployment contract).
  *
  * A catalog is O(flows) driver-side METADATA; the data movement
  * happens inside compiled hops, which are already distributed.
  */
final class FlowCatalog(root: String, conf: Configuration = new Configuration()) {

  import FlowCatalog._

  private val base = new Path(root, DirName)
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  private def flowDir(name: String): Path = {
    require(name.nonEmpty && !name.contains("/") && !name.startsWith("_"),
      s"flow name must be a plain segment, got '$name'")
    new Path(base, name)
  }

  /** Store a new VERSION of the spec (never overwrites an existing
    * one) and move the current pointer to it. Returns the version id.
    */
  def put(spec: FlowSpec): String = {
    val dir = flowDir(spec.name)
    val f = fs(dir)
    f.mkdirs(dir)
    val next = "v" + (versions(spec.name).map(_.drop(1).toInt)
      .foldLeft(0)(math.max) + 1)
    writeAtomic(new Path(dir, s"$next.conf"), render(spec), f)
    writeAtomic(new Path(dir, CurrentName), next, f)
    next
  }

  /** The current version's spec, if the flow exists. */
  def get(name: String): Option[FlowSpec] =
    currentVersion(name).flatMap(get(name, _))

  /** A specific stored version (old versions stay readable forever). */
  def get(name: String, version: String): Option[FlowSpec] = {
    val p = new Path(flowDir(name), s"$version.conf")
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      Some(parse(text))
    }
  }

  def currentVersion(name: String): Option[String] = {
    val p = new Path(flowDir(name), CurrentName)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        Some(new String(out.toByteArray, StandardCharsets.UTF_8).trim)
      } finally in.close()
    }
  }

  /** Stored versions of one flow, ascending (v1, v2, ...). */
  def versions(name: String): Seq[String] = {
    val dir = flowDir(name)
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".conf") && n.startsWith("v"))
      .map(_.stripSuffix(".conf"))
      .sortBy(_.drop(1).toInt)
  }

  /** All flow names in the catalog, sorted. */
  def list(): Seq[String] = {
    val f = fs(base)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  /** Drop a flow and its whole version history. */
  def remove(name: String): Boolean =
    fs(flowDir(name)).delete(flowDir(name), true)

  private def writeAtomic(dest: Path, text: String, f: FileSystem): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc =
      if (dest.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(dest.toUri, conf)
    fc.rename(tmp, dest, Options.Rename.OVERWRITE)
  }
}

object FlowCatalog {

  val DirName = "_FLOW_CATALOG"
  val CurrentName = "_current"

  /** FlowSpec → properties text (the .pull dialect the job layer
    * already speaks; `conf.` prefixes namespace the template config).
    */
  private[runner] def render(spec: FlowSpec): String = {
    val head = ListMap(
      "flow.name" -> spec.name,
      "flow.source" -> spec.sourceNode,
      "flow.dest" -> spec.destNode,
      "flow.input.format" -> spec.input.format,
      "flow.input.platform" -> spec.input.platform,
      "flow.input.path" -> spec.input.path,
      "flow.output.format" -> spec.output.format,
      "flow.output.platform" -> spec.output.platform,
      "flow.output.path" -> spec.output.path)
    val confLines = spec.config.toSeq.sortBy(_._1)
      .map { case (k, v) => s"conf.$k=$v" }
    (head.map { case (k, v) => s"$k=$v" }.toSeq ++ confLines).mkString("\n") + "\n"
  }

  private[runner] def parse(text: String): FlowSpec = {
    val kv = text.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val cut = l.indexOf('=')
        require(cut > 0, s"malformed flow spec line: $l")
        l.substring(0, cut) -> l.substring(cut + 1)
      }
      .toSeq
    val m = kv.toMap
    def req(k: String): String = m.getOrElse(k,
      throw new IllegalArgumentException(s"flow spec missing '$k'"))
    FlowSpec(
      name = req("flow.name"),
      sourceNode = req("flow.source"),
      destNode = req("flow.dest"),
      input = DatasetDescriptor(req("flow.input.format"),
        req("flow.input.platform"), req("flow.input.path")),
      output = DatasetDescriptor(req("flow.output.format"),
        req("flow.output.platform"), req("flow.output.path")),
      // preserve declared order for determinism (ListMap over the
      // conf.-prefixed lines in file order)
      config = ListMap(kv.collect {
        case (k, v) if k.startsWith("conf.") => k.stripPrefix("conf.") -> v
      }: _*))
  }
}
