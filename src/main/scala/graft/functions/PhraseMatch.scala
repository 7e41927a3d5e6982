package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase matching via Aho-Corasick — the blocklist/flagging
  * primitive at corpus scale: ONE automaton pass per document finds
  * every occurrence of every phrase, O(text + matches), where the
  * naive alternation regex or per-phrase `contains` loop is
  * O(text × phrases) and collapses at real blocklist sizes (10^4-10^5
  * phrases × 100 TB of text). The phrase list is config-sized: the
  * automaton builds ONCE on the driver (linear in total phrase
  * bytes) and ships to executors via a broadcast, the codebook
  * division of labor.
  *
  * Matching is case-sensitive, byte-exact on UTF-16 code units, and
  * reports each DISTINCT phrase found (sorted — deterministic
  * output). Word-boundary semantics are the caller's: pad phrases
  * with spaces for token-ish matching.
  *
  * Reference seam: the reference's closest surface is
  * StringFilterConverter (single-pattern row filter); this is its
  * many-pattern scale form.
  */
object PhraseMatch {

  /** Immutable automaton: goto/fail/output tables over a dense node
    * array with per-node sorted char->child maps (phrase lists are
    * config-sized; lookup is a binary search — cache-friendly and
    * serialization-cheap for the broadcast).
    */
  final class Automaton private[PhraseMatch] (
      private[PhraseMatch] val chars: Array[Array[Char]],
      private[PhraseMatch] val children: Array[Array[Int]],
      private[PhraseMatch] val fail: Array[Int],
      private[PhraseMatch] val out: Array[Array[Int]],
      val phrases: Array[String]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(chars(s), c)
        if (i >= 0) return children(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0
    }

    /** Distinct phrase indices occurring in `text`, ascending. */
    def matches(text: String): Array[Int] = {
      if (text == null) return Array.emptyIntArray
      val seen = new java.util.TreeSet[Integer]()
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val os = out(s)
        var k = 0
        while (k < os.length) { seen.add(os(k)); k += 1 }
        i += 1
      }
      val r = new Array[Int](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { r(k) = it.next(); k += 1 }
      r
    }
  }

  /** Build the automaton (driver-side, linear in total phrase bytes). */
  def build(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty, "empty phrase list")
    phrases.foreach(p => require(p != null && p.nonEmpty, "null/empty phrase"))
    val ps = phrases.toArray
    // trie as growable maps first
    val trieChildren = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val trieOut = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    ps.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = trieChildren(s).getOrElseUpdate(c, {
          trieChildren += scala.collection.mutable.TreeMap.empty[Char, Int]
          trieOut += scala.collection.mutable.ArrayBuffer.empty[Int]
          trieChildren.length - 1
        })
      }
      trieOut(s) += pi
    }
    val n = trieChildren.length
    val fail = new Array[Int](n)
    // BFS fail links; output sets inherit the fail target's outputs
    val queue = scala.collection.mutable.Queue.empty[Int]
    trieChildren(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      trieChildren(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !trieChildren(f).contains(ch))
          f = fail(f)
        fail(v) = if (f != u && trieChildren(f).contains(ch))
          trieChildren(f)(ch) else 0
        trieOut(v) ++= trieOut(fail(v))
        queue += v
      }
    }
    new Automaton(
      trieChildren.map(_.keys.toArray).toArray,
      trieChildren.map(_.values.toArray).toArray,
      fail,
      trieOut.map(_.distinct.sorted.toArray).toArray,
      ps)
  }

  /** Tag each row with the DISTINCT phrases found in `textCol`
    * (`matched`: sorted array, empty when clean). One automaton pass
    * per document; the automaton broadcasts once.
    */
  def tagMatches(docs: DataFrame, textCol: String, phrases: Seq[String])
      : DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(build(phrases))
    val matchUdf = udf { (text: String) =>
      val a = bc.value
      a.matches(text).map(a.phrases(_))
    }
    docs.withColumn("matched", matchUdf(col(textCol)))
  }

  /** Keep only rows whose `textCol` contains NONE of the phrases —
    * the blocklist filter.
    */
  def filterClean(docs: DataFrame, textCol: String, phrases: Seq[String])
      : DataFrame =
    tagMatches(docs, textCol, phrases)
      .filter(size(col("matched")) === 0)
      .drop("matched")
}
