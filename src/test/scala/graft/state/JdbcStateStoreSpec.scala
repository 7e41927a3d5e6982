package graft.state

import org.scalatest.funsuite.AnyFunSuite

/** JdbcStateStore: the MysqlStateStore-shaped JDBC backend against
  * embedded Derby — transactional upsert, round-trip fidelity of
  * awkward values, listKeys ordering, store isolation, and parity
  * with FsStateStore through the shared JSON render.
  */
class JdbcStateStoreSpec extends AnyFunSuite {

  private def fresh(): JdbcStateStore =
    new JdbcStateStore("jdbc:derby:memory:jss" +
      java.util.UUID.randomUUID().toString.replace("-", "") +
      ";create=true").init()

  test("put/get round-trips awkward values") {
    val s = fresh()
    val m = Map(
      "watermark" -> "12345",
      "newline" -> "a\nb\tc",
      "quote" -> """he said "hi" \ bye""",
      "unicode" -> "naïve — “quotes” 日本語",
      "empty" -> "")
    s.put("jobs", "ds1", m)
    assert(s.get("jobs", "ds1").contains(m))
  }

  test("put is an upsert: second write wins atomically") {
    val s = fresh()
    s.put("jobs", "ds1", Map("run" -> "1"))
    s.put("jobs", "ds1", Map("run" -> "2", "extra" -> "x"))
    assert(s.get("jobs", "ds1").contains(Map("run" -> "2", "extra" -> "x")))
    assert(s.listKeys("jobs") == Seq("ds1"))
  }

  test("stores are isolated; listKeys is sorted; delete removes") {
    val s = fresh()
    s.put("a", "k2", Map("v" -> "1"))
    s.put("a", "k1", Map("v" -> "2"))
    s.put("b", "k1", Map("v" -> "3"))
    assert(s.listKeys("a") == Seq("k1", "k2"))
    assert(s.listKeys("b") == Seq("k1"))
    s.delete("a", "k1")
    assert(s.listKeys("a") == Seq("k2"))
    assert(s.get("a", "k1").isEmpty)
    assert(s.get("b", "k1").contains(Map("v" -> "3")))
    s.deleteStore("a")
    assert(s.listKeys("a").isEmpty)
    assert(s.listKeys("b") == Seq("k1"))
  }

  test("init is idempotent and getOrElse defaults") {
    val url = "jdbc:derby:memory:jss" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
    val s1 = new JdbcStateStore(url).init()
    val s2 = new JdbcStateStore(url).init() // same table, no error
    s1.put("x", "k", Map("a" -> "1"))
    assert(s2.get("x", "k").contains(Map("a" -> "1")))
    assert(s2.getOrElse("x", "missing", Map("d" -> "1")) == Map("d" -> "1"))
  }

  test("state payloads are byte-compatible with FsStateStore") {
    // the shared JSON render: what Jdbc stores, Fs parses (and back)
    val m = Map("watermark" -> "99", "path" -> "/a/b c", "läng" -> "ü")
    assert(Json.parseFlat(Json.render(m)) == m)
  }

  test("table name is validated against injection") {
    val e = intercept[IllegalArgumentException](
      new JdbcStateStore("jdbc:derby:memory:x", table = "t; DROP TABLE y"))
    assert(e.getMessage.contains("identifier"))
  }
}
