package graft.state

import org.scalatest.funsuite.AnyFunSuite

class StateStoreSpec extends AnyFunSuite {

  private def newStore() = new FsStateStore(
    java.nio.file.Files.createTempDirectory("statestore").toString)

  test("put/get round-trip") {
    val s = newStore()
    s.put("jobs", "j1", Map("watermark" -> "123", "state" -> "COMMITTED"))
    assert(s.get("jobs", "j1").contains(Map("watermark" -> "123", "state" -> "COMMITTED")))
    assert(s.get("jobs", "missing").isEmpty)
  }

  test("overwrite replaces state atomically") {
    val s = newStore()
    s.put("jobs", "j1", Map("watermark" -> "1"))
    s.put("jobs", "j1", Map("watermark" -> "2"))
    assert(s.get("jobs", "j1").get("watermark") == "2")
  }

  test("escaping survives control chars, quotes, unicode") {
    val s = newStore()
    val nasty = Map("k\"1" -> "a\nb\tc\\d\"e", "sql" -> "SELECT *\r\nFROM t")
    s.put("jobs", "nasty", nasty)
    assert(s.get("jobs", "nasty").contains(nasty))
  }

  test("listKeys and delete") {
    val s = newStore()
    s.put("wm", "a", Map("x" -> "1")); s.put("wm", "b", Map("x" -> "2"))
    assert(s.listKeys("wm") == Seq("a", "b"))
    s.delete("wm", "a")
    assert(s.listKeys("wm") == Seq("b"))
    assert(s.listKeys("empty").isEmpty)
  }

  test("empty map round-trips") {
    val s = newStore()
    s.put("jobs", "empty", Map.empty)
    assert(s.get("jobs", "empty").contains(Map.empty[String, String]))
  }
}
