package graft.runner

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset config store with import/inheritance resolution — the
  * engine's take on the reference's config-management module
  * (`gobblin-config-management`).
  *
  * Semantics derived from:
  *  - resolution precedence: own config, then each own-import's
  *    resolved config in declared order, then the parent's resolved
  *    config, with a shared visited-set so every node contributes at
  *    most once and cycles degrade to "already loaded" (ref
  *    `ConfigStoreBackedValueInspector.java:111-141`);
  *  - the root node may not import (circular by construction, ref
  *    `InMemoryTopology.java:76-78`);
  *  - recursive import listing is a DFS over (reversed own imports +
  *    parent) with cycle DETECTION (not tolerance) — a cycle on the
  *    explicit-import graph is a store bug and throws (ref
  *    `InMemoryTopology.java:190-204`, `ImportTraverser.java`,
  *    `CircularDependencyException.java`);
  *  - filesystem layout: `<storeRoot>/_CONFIG_STORE/<version>/<path>/
  *    {main.conf, includes.conf}`, current version in store metadata
  *    (ref `SimpleHadoopFilesystemConfigStore.java:87-128`,
  *    `SimpleHDFSStoreMetadata.java`).
  *
  * Scale note: a config store is O(datasets) METADATA, not data — the
  * reference resolves on the driver too. What must scale is applying
  * resolved configs to records, so [[resolveAll]] returns a DataFrame
  * fit for a broadcast join against any fact table.
  */
object ConfigStore {

  /** One store node: ordered own key→values + ordered own imports. */
  final case class Node(
      props: Vector[(String, String)] = Vector.empty,
      imports: Vector[String] = Vector.empty)

  /** A resolved value and the node that contributed it. */
  final case class Resolved(key: String, value: String, origin: String)

  final case class CircularConfigImportException(cycle: List[String])
      extends RuntimeException(
        s"circular config import: ${cycle.mkString(" -> ")}")

  val StoreDirName = "_CONFIG_STORE"
  val MainConfName = "main.conf"
  val IncludesConfName = "includes.conf"
  val MetadataName = "_metadata.conf"
  private val CurrentVersionKey = "config.store.currentVersion"

  /** Normalize `/a/b/` → `/a/b`; root stays `/`. */
  def normalize(path: String): String = {
    require(path.startsWith("/"), s"config path must be absolute: $path")
    val trimmed = path.reverse.dropWhile(_ == '/').reverse
    if (trimmed.isEmpty) "/" else trimmed
  }

  def parentOf(path: String): Option[String] = normalize(path) match {
    case "/" => None
    case p =>
      val cut = p.lastIndexOf('/')
      Some(if (cut == 0) "/" else p.substring(0, cut))
  }

  /** In-memory store (the unit-test / programmatic surface). */
  def inMemory(nodes: Map[String, Node]): ConfigStore =
    new ConfigStore(nodes.map { case (k, v) => normalize(k) -> v }, "in-memory")

  /** Deploy a store version to a filesystem tree (the StoreDeployer
    * surface): one directory per node with `main.conf` (key=value
    * lines) and `includes.conf` (one import path per line), then mark
    * the version current in the store metadata.
    */
  def deployFs(storeRoot: String, version: String, nodes: Map[String, Node],
      conf: Configuration = new Configuration()): Unit = {
    val root = new Path(storeRoot, StoreDirName)
    val fs = root.getFileSystem(conf)
    val vRoot = new Path(root, version)
    nodes.foreach { case (rawPath, node) =>
      val p = normalize(rawPath)
      if (p == "/") require(node.imports.isEmpty, "root node may not import")
      node.props.foreach { case (k, v) =>
        // the line format trims and drops '#' comments on read-back —
        // anything that would not round-trip identically is rejected
        require(k == k.trim && k.nonEmpty && !k.startsWith("#") &&
          !k.contains("=") && !k.contains("\n") &&
          v == v.trim && !v.contains("\n"),
          s"config key/value not representable in $MainConfName: '$k'='$v'")
      }
      node.imports.foreach(i => require(
        i == i.trim && i.startsWith("/") && !i.contains("\n"),
        s"import path not representable in $IncludesConfName: '$i'"))
      val dir = if (p == "/") vRoot else new Path(vRoot, p.stripPrefix("/"))
      fs.mkdirs(dir)
      if (node.props.nonEmpty)
        writeLines(fs, new Path(dir, MainConfName),
          node.props.map { case (k, v) => s"$k=$v" })
      if (node.imports.nonEmpty)
        writeLines(fs, new Path(dir, IncludesConfName), node.imports)
    }
    writeLines(fs, new Path(root, MetadataName),
      Seq(s"$CurrentVersionKey=$version"))
  }

  /** Open the CURRENT version of a deployed store. */
  def openFs(storeRoot: String,
      conf: Configuration = new Configuration()): ConfigStore = {
    val root = new Path(storeRoot, StoreDirName)
    val fs = root.getFileSystem(conf)
    val meta = readLines(fs, new Path(root, MetadataName))
      .flatMap { line =>
        line.split("=", 2) match {
          case Array(k, v) if k.trim == CurrentVersionKey => Some(v.trim)
          case _ => None
        }
      }
    require(meta.nonEmpty, s"no $CurrentVersionKey in store metadata at $root")
    openFsVersion(storeRoot, meta.last, conf)
  }

  /** Open a specific version of a deployed store. */
  def openFsVersion(storeRoot: String, version: String,
      conf: Configuration = new Configuration()): ConfigStore = {
    val vRoot = new Path(new Path(storeRoot, StoreDirName), version)
    val fs = vRoot.getFileSystem(conf)
    require(fs.exists(vRoot), s"config store version does not exist: $vRoot")
    val nodes = mutable.Map.empty[String, Node]
    def walk(dir: Path, key: String): Unit = {
      val props = readLines(fs, new Path(dir, MainConfName)).flatMap { line =>
        line.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }
      val imports = readLines(fs, new Path(dir, IncludesConfName))
        .map(_.trim).filter(_.nonEmpty).map { raw =>
          require(raw.startsWith("/"),
            s"non-absolute import '$raw' in $dir/$IncludesConfName")
          normalize(raw)
        }
      nodes(key) = Node(props.toVector, imports.toVector)
      fs.listStatus(dir).filter(_.isDirectory).foreach { st =>
        val child =
          if (key == "/") "/" + st.getPath.getName
          else key + "/" + st.getPath.getName
        walk(st.getPath, child)
      }
    }
    walk(vRoot, "/")
    new ConfigStore(nodes.toMap, s"$storeRoot@$version")
  }

  private def writeLines(fs: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] =
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#")).toVector
      finally in.close()
    }
}

final class ConfigStore(
    nodes: Map[String, ConfigStore.Node], val id: String) {
  import ConfigStore._

  def node(path: String): Node = nodes.getOrElse(normalize(path), Node())
  def paths: Seq[String] = nodes.keys.toSeq.sorted

  require(node("/").imports.isEmpty,
    "root node may not import other nodes (circular by construction)")

  /** Resolved config for one path: first-wins merge over the
    * precedence chain own → imports (declared order, recursively) →
    * parent, every node visited at most once via the shared set —
    * mirrors the reference recursion exactly.
    */
  def resolve(path: String): ListMap[String, String] =
    ListMap(resolveWithOrigin(path).map(r => r.key -> r.value): _*)

  /** Same, keeping which node won each key. */
  def resolveWithOrigin(path: String): Seq[Resolved] = {
    val visited = mutable.Set.empty[String]
    val out = mutable.LinkedHashMap.empty[String, Resolved]
    def recur(raw: String): Unit = {
      val p = normalize(raw)
      if (!visited.add(p)) return
      val n = node(p)
      n.props.foreach { case (k, v) =>
        if (!out.contains(k)) out(k) = Resolved(k, v, p)
      }
      if (p != "/") {
        n.imports.foreach(recur)
        parentOf(p).foreach(recur)
      }
    }
    recur(path)
    out.values.toVector
  }

  /** The full DFS import closure of a path: each own import (in
    * declared precedence order) followed by its closure, then the
    * parent chain; nodes listed at most once; a cycle in the
    * explicit-import graph throws [[CircularConfigImportException]].
    */
  def importsRecursively(path: String): List[String] = {
    val seen = mutable.Set.empty[String]
    val out = mutable.ListBuffer.empty[String]
    def recur(p: String, stack: List[String]): Unit = {
      if (stack.contains(p))
        throw CircularConfigImportException((p :: stack).reverse)
      val neighbors =
        if (p == "/") Nil
        else node(p).imports.toList ++ parentOf(p).toList
      neighbors.foreach { nb =>
        val n = normalize(nb)
        if (seen.add(n)) { out += n; recur(n, p :: stack) }
        else if (stack.contains(n))
          throw CircularConfigImportException((n :: stack).reverse)
      }
    }
    recur(normalize(path), Nil)
    out.toList
  }

  // reverse adjacency, built once per store (nodes are immutable):
  // importedBy queries are O(answer), not O(topology)
  private lazy val reverseIndex: Map[String, Seq[String]] =
    nodes.toSeq
      .flatMap { case (p, n) => n.imports.map(i => normalize(i) -> p) }
      .groupMap(_._1)(_._2)
      .map { case (t, ps) => t -> ps.sorted }

  /** Reverse import index — which nodes DIRECTLY import `path` (ref
    * `InMemoryTopology.getImportedBy`): the impact-analysis query
    * ("who breaks if this tag changes").
    */
  def importedBy(path: String): Seq[String] =
    reverseIndex.getOrElse(normalize(path), Seq.empty)

  /** Transitive closure of [[importedBy]], matching the reference's
    * recursive imported-by traversal — including its cycle DETECTION:
    * a cycle in the explicit-import graph throws, exactly like the
    * forward [[importsRecursively]], instead of reporting a node as
    * transitively importing itself.
    */
  def importedByRecursively(path: String): Seq[String] = {
    val seen = mutable.Set.empty[String]
    def recur(p: String, stack: List[String]): Unit =
      importedBy(p).foreach { d =>
        if (stack.contains(d))
          throw CircularConfigImportException((d :: stack).reverse)
        if (seen.add(d)) recur(d, d :: stack)
      }
    val start = normalize(path)
    recur(start, List(start))
    seen.toSeq.sorted
  }

  /** Batch-resolve many dataset paths to a long-format DataFrame
    * `(path, key, value, origin)` — the join-side artifact: resolved
    * configs are tiny, so Spark will broadcast this against any fact
    * table (retention, routing, quality thresholds) without a shuffle.
    */
  def resolveAll(spark: SparkSession, dsPaths: Seq[String]): DataFrame = {
    import spark.implicits._
    dsPaths.flatMap { p =>
      val norm = normalize(p)
      resolveWithOrigin(norm).map(r => (norm, r.key, r.value, r.origin))
    }.toDF("path", "key", "value", "origin")
  }
}
