package graft.functions

import graft.SparkSpec

/** Aho-Corasick phrase matching: the classic overlapping-suffix
  * cases, differential equivalence against naive contains, and the
  * blocklist filter contract.
  */
class PhraseMatchSpec extends SparkSpec {

  test("classic he/she/his/hers automaton finds suffix matches") {
    val a = PhraseMatch.build(Seq("he", "she", "his", "hers"))
    def m(t: String): Seq[String] = a.matches(t).map(a.phrases(_)).toSeq
    assert(m("ushers") == Seq("he", "she", "hers"))
    assert(m("his") == Seq("his"))
    assert(m("xyz") == Seq.empty)
    assert(m("hehehe") == Seq("he"))
    assert(m(null) == Seq.empty)
  }

  test("differential: automaton == naive contains on deterministic texts") {
    val phrases = Seq("ab", "abc", "bca", "ca", "aaa", "cab")
    val a = PhraseMatch.build(phrases)
    val alphabet = "abc"
    (0 until 200).foreach { seed =>
      val t = (0 until 12).map(i =>
        alphabet(((seed * 31 + i * 7) % 3 + 3) % 3)).mkString
      val naive = phrases.filter(t.contains).sorted
      val auto = a.matches(t).map(a.phrases(_)).toSeq.sorted
      assert(auto == naive, s"text '$t'")
    }
  }

  test("filterClean drops exactly the rows containing any phrase") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "contains bad word inside"),
      (3L, "badword without space is different"),
      (4L, "ends with bad word")).toDF("id", "text")
    val kept = PhraseMatch.filterClean(docs, "text", Seq("bad word", "zzz"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("empty or null phrases rejected") {
    intercept[IllegalArgumentException](PhraseMatch.build(Seq.empty))
    intercept[IllegalArgumentException](PhraseMatch.build(Seq("ok", "")))
  }
}
