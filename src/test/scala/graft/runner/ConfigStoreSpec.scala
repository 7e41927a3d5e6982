package graft.runner

import graft.SparkSpec
import graft.runner.ConfigStore._

/** Config-store resolution: precedence (own → imports in declared
  * order → parent), shared visited-set, cycle behavior, FS deploy
  * round-trip with version selection.
  */
class ConfigStoreSpec extends SparkSpec {

  private def store(nodes: (String, Node)*): ConfigStore =
    ConfigStore.inMemory(nodes.toMap)

  test("own beats import beats parent; imports win in declared order") {
    val cs = store(
      "/" -> Node(Vector("a" -> "root", "r" -> "root")),
      "/tags/x" -> Node(Vector("a" -> "x", "p" -> "x")),
      "/tags/y" -> Node(Vector("a" -> "y", "p" -> "y", "q" -> "y")),
      "/data" -> Node(Vector("a" -> "data")),
      "/data/ds" -> Node(Vector("own" -> "1"),
        imports = Vector("/tags/x", "/tags/y")))
    val r = cs.resolve("/data/ds")
    assert(r("own") == "1")
    assert(r("a") == "x") // first import wins over second, parent, root
    assert(r("p") == "x")
    assert(r("q") == "y") // only the second import has it
    assert(r("r") == "root") // falls through to root
    val origins = cs.resolveWithOrigin("/data/ds").map(x => x.key -> x.origin).toMap
    assert(origins("a") == "/tags/x" && origins("r") == "/")
  }

  test("parent chain resolves recursively with its own imports") {
    val cs = store(
      "/" -> Node(Vector("k" -> "root")),
      "/tags/t" -> Node(Vector("k" -> "tag", "only" -> "tag")),
      "/data" -> Node(imports = Vector("/tags/t")),
      "/data/ds" -> Node(Vector("x" -> "1")))
    val r = cs.resolve("/data/ds")
    // /data/ds has no k; parent /data imports /tags/t which does
    assert(r("k") == "tag")
    assert(r("only") == "tag")
  }

  test("visited-set: diamond imports contribute once, first path wins") {
    val cs = store(
      "/" -> Node(),
      "/base" -> Node(Vector("v" -> "base")),
      "/a" -> Node(Vector("v" -> "a"), imports = Vector("/base")),
      "/b" -> Node(Vector("w" -> "b"), imports = Vector("/base")),
      "/ds" -> Node(imports = Vector("/a", "/b")))
    val r = cs.resolve("/ds")
    assert(r("v") == "a") // /a's own v shadows /base's
    assert(r("w") == "b")
  }

  test("import cycles degrade to already-loaded in resolve, throw in importsRecursively") {
    val cs = store(
      "/" -> Node(),
      "/a" -> Node(Vector("ka" -> "1"), imports = Vector("/b")),
      "/b" -> Node(Vector("kb" -> "2"), imports = Vector("/a")))
    val r = cs.resolve("/a")
    assert(r("ka") == "1" && r("kb") == "2") // resolution terminates
    val ex = intercept[CircularConfigImportException](cs.importsRecursively("/a"))
    assert(ex.cycle.nonEmpty)
  }

  test("root may not import") {
    intercept[IllegalArgumentException] {
      store("/" -> Node(imports = Vector("/x")), "/x" -> Node())
    }
  }

  test("importsRecursively lists import closure before parent chain") {
    val cs = store(
      "/" -> Node(),
      "/t1" -> Node(imports = Vector("/t2")),
      "/t2" -> Node(),
      "/d" -> Node(),
      "/d/ds" -> Node(imports = Vector("/t1")))
    // /t1's closure (its import /t2, then its parent /) comes before
    // /d/ds's own parent chain; / is listed once
    assert(cs.importsRecursively("/d/ds") == List("/t1", "/t2", "/", "/d"))
  }

  test("deploy rejects keys/values the line format cannot represent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cfgbad").toString
    intercept[IllegalArgumentException] {
      ConfigStore.deployFs(tmp, "v1",
        Map("/d" -> Node(Vector("a=b" -> "1"))))
    }
    intercept[IllegalArgumentException] {
      ConfigStore.deployFs(tmp, "v1",
        Map("/d" -> Node(Vector("k" -> "line1\nline2"))))
    }
  }

  test("FS deploy round-trips and the CURRENT version wins") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cfgstore").toString
    val v1 = Map(
      "/" -> Node(Vector("retention.days" -> "1")),
      "/data/ds" -> Node(Vector("owner" -> "old")))
    val v2 = Map(
      "/" -> Node(Vector("retention.days" -> "365")),
      "/tags/hot" -> Node(Vector("retention.days" -> "30")),
      "/data/ds" -> Node(Vector("owner" -> "new"),
        imports = Vector("/tags/hot")))
    ConfigStore.deployFs(tmp, "v0.9", v1)
    ConfigStore.deployFs(tmp, "v1.0", v2)
    val cs = ConfigStore.openFs(tmp)
    val r = cs.resolve("/data/ds")
    assert(r("owner") == "new")
    assert(r("retention.days") == "30")
    // the stale version stays addressable explicitly
    val old = ConfigStore.openFsVersion(tmp, "v0.9")
    assert(old.resolve("/data/ds")("owner") == "old")
    assert(old.resolve("/data/ds")("retention.days") == "1")
  }

  test("importedBy lists direct importers; recursive follows chains") {
    val cs = store(
      "/" -> Node(),
      "/base" -> Node(),
      "/mid" -> Node(imports = Vector("/base")),
      "/a" -> Node(imports = Vector("/mid")),
      "/b" -> Node(imports = Vector("/base", "/mid")),
      "/c" -> Node())
    assert(cs.importedBy("/base") == Seq("/b", "/mid"))
    assert(cs.importedBy("/c").isEmpty)
    assert(cs.importedByRecursively("/base") == Seq("/a", "/b", "/mid"))
    // cycle: same exception as the forward traversal, not a
    // self-referential answer
    val cyc = store(
      "/" -> Node(),
      "/a" -> Node(imports = Vector("/b")),
      "/b" -> Node(imports = Vector("/a")))
    intercept[CircularConfigImportException](cyc.importedByRecursively("/a"))
  }

  test("property: resolution invariants over 300 random stores") {
    val rnd = new scala.util.Random(0xC0F6)
    val universe = Vector("/a", "/b", "/c", "/a/x", "/a/y", "/b/z", "/a/x/p")
    val keys = Vector("k0", "k1", "k2", "k3")
    for (_ <- 1 to 300) {
      val paths = "/" +: rnd.shuffle(universe).take(2 + rnd.nextInt(5))
      val nodes = paths.map { p =>
        val props = keys.filter(_ => rnd.nextBoolean())
          .map(k => k -> s"$p#$k").toVector
        val imports =
          if (p == "/") Vector.empty[String]
          else rnd.shuffle(paths.filterNot(_ == p))
            .take(rnd.nextInt(3)).toVector // cycles allowed
        p -> Node(props, imports)
      }.toMap
      val cs = ConfigStore.inMemory(nodes)
      for (p <- paths) {
        val res = cs.resolveWithOrigin(p)
        val byKey = res.map(r => r.key -> r).toMap
        // own props always win, attributed to self
        nodes(p).props.foreach { case (k, v) =>
          assert(byKey(k).value == v && byKey(k).origin == p, s"own@$p/$k")
        }
        // every resolved value really exists at its claimed origin
        res.foreach { r =>
          assert(nodes.getOrElse(r.origin, Node()).props
            .contains(r.key -> r.value), s"origin@$p/${r.key}")
        }
        // first import's own props beat everything except own
        val ownKeys = nodes(p).props.map(_._1).toSet
        nodes(p).imports.headOption.foreach { fi =>
          nodes.getOrElse(ConfigStore.normalize(fi), Node()).props
            .filterNot { case (k, _) => ownKeys(k) }
            .foreach { case (k, v) =>
              assert(byKey(k).value == v, s"first-import@$p/$k")
            }
        }
        // deterministic
        assert(cs.resolveWithOrigin(p) == res)
      }
    }
  }

  test("FS reads survive malformed store content with clean errors") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cfgfuzz").toString
    // no metadata at all
    val noMeta = intercept[IllegalArgumentException](ConfigStore.openFs(tmp))
    assert(noMeta.getMessage.contains("currentVersion"))
    // metadata pointing at a missing version
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(tmp, "_CONFIG_STORE"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "_CONFIG_STORE", "_metadata.conf"),
      "config.store.currentVersion=v9\n")
    val noVer = intercept[IllegalArgumentException](ConfigStore.openFs(tmp))
    assert(noVer.getMessage.contains("v9"))
    // junk lines in main.conf are skipped; junk import fails WITH the file named
    val vdir = java.nio.file.Paths.get(tmp, "_CONFIG_STORE", "v9", "d")
    java.nio.file.Files.createDirectories(vdir)
    java.nio.file.Files.writeString(vdir.resolve("main.conf"),
      "# comment\nnot a kv line\nk=good\n  \n")
    val cs = ConfigStore.openFs(tmp)
    assert(cs.resolve("/d") == scala.collection.immutable.ListMap("k" -> "good"))
    java.nio.file.Files.writeString(vdir.resolve("includes.conf"),
      "relative/import\n")
    val badImp = intercept[IllegalArgumentException](ConfigStore.openFs(tmp))
    assert(badImp.getMessage.contains("relative/import") &&
      badImp.getMessage.contains("includes.conf"))
  }

  test("resolveAll emits the broadcast-joinable long table") {
    val cs = store(
      "/" -> Node(Vector("r" -> "root")),
      "/d" -> Node(),
      "/d/a" -> Node(Vector("k" -> "1")),
      "/d/b" -> Node(Vector("k" -> "2")))
    val df = cs.resolveAll(spark, Seq("/d/a", "/d/b"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("/d/a", "k", "1", "/d/a"), ("/d/a", "r", "root", "/"),
      ("/d/b", "k", "2", "/d/b"), ("/d/b", "r", "root", "/")))
  }
}
