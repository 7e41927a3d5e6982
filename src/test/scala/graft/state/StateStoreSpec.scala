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

  test("codec fuzz: 200 random unicode maps round-trip (seeded)") {
    val rnd = new scala.util.Random(1234)
    val s = newStore()
    def randString(): String =
      (0 until rnd.nextInt(30)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => rnd.nextPrintableChar()
          case 1 => "\\\"\n\r\t".charAt(rnd.nextInt(5))
          case 2 => (rnd.nextInt(0x1f) + 1).toChar      // control chars
          case 3 => (0x80 + rnd.nextInt(0x7f0)).toChar  // BMP unicode
          case _ => 'x'
        }
      }.mkString
    (1 to 200).foreach { i =>
      val m = (0 until rnd.nextInt(6)).map(_ => randString() -> randString()).toMap
      s.put("fuzz", s"k$i", m)
      assert(s.get("fuzz", s"k$i").contains(m), s"round-trip failed for $m")
    }
  }
}
