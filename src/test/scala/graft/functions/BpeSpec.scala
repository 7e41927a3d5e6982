package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge induction: dictionary weighting, left-greedy merge
  * application, argmax tie-break, and multi-step learning.
  */
class BpeSpec extends SparkSpec {

  test("wordDict weights by occurrences and appends the end marker") {
    import spark.implicits._
    val docs = Seq("low low lower", "low").toDF("text")
    val dict = Bpe.wordDict(docs, "text").collect()
      .map(r => r.getSeq[String](1).mkString("|") -> (r.getString(0), r.getLong(2)))
      .toMap
    assert(dict("l|o|w|</w>") == (("low", 3L)))
    assert(dict("l|o|w|e|r|</w>") == (("lower", 1L)))
  }

  test("applyMerges encodes through the learned merge sequence") {
    import spark.implicits._
    val docs = Seq("low low low", "low lower").toDF("text")
    val dict = Bpe.wordDict(docs, "text")
    val merges = Bpe.learnMerges(dict, 3) // l o -> lo w -> low </w>
    val enc = Bpe.applyMerges(dict, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("low") == Seq("low</w>"))
    assert(enc("lower") == Seq("low", "e", "r", "</w>"))
  }

  test("applyMerge is left-greedy and non-overlapping") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b")).toDF("syms")
    val out = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a")) // aaa -> [aa, a], not [a, aa]
    assert(out(1) == Seq("a", "b", "a", "b"))
    val out2 = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out2(1) == Seq("ab", "ab"))
  }

  test("learnMerges finds the classic low/lower merges in order") {
    import spark.implicits._
    // 'lo' appears in every word (count 5); after merging, 'lo w'
    // dominates; ties break lexically
    val docs = Seq("low low low", "low lower").toDF("text")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "text"), 3)
    assert(merges.map(_.step) == Seq(1, 2, 3))
    assert(merges.head.pair == "l o" && merges.head.count == 5)
    assert(merges(1).pair == "lo w" && merges(1).count == 5)
    // after [lo w]: "low </w>" x4 vs lower's "low e","e r","r </w>" x1
    assert(merges(2).pair == "low </w>" && merges(2).count == 4)
  }

  test("property: the Spark merge HOF equals a plain Scala greedy fold") {
    import spark.implicits._
    def refMerge(syms: Seq[String], a: String, b: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    val rnd = new scala.util.Random(0xB9E)
    val alphabet = Vector("a", "b", "c", "ab", "bc")
    val cases = Seq.fill(300)(
      Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.size))))
    val pairs = Seq(("a", "b"), ("b", "b"), ("ab", "c"), ("c", "a"))
    for ((a, b) <- pairs) {
      val got = cases.toDF("syms")
        .select(Bpe.applyMerge(col("syms"), a, b).as("m"))
        .collect().map(_.getSeq[String](0))
      cases.zip(got).foreach { case (in, out) =>
        assert(out == refMerge(in, a, b), s"merge($a,$b) on $in")
      }
    }
  }

  test("merged symbols chain across steps (merges compose)") {
    import spark.implicits._
    val docs = Seq("aaaa aaaa").toDF("text")
    val merges = Bpe.learnMerges(Bpe.wordDict(docs, "text"), 2)
    assert(merges.head.pair == "a a")
    // after step 1: [aa, aa, </w>] -> "aa aa" and "aa </w>" tie at 2;
    // the lexical tie-break picks "aa </w>" ('<' sorts before 'a')
    assert(merges(1).pair == "aa </w>" && merges(1).count == 2)
  }
}
