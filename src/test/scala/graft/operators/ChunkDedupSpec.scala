package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.RollingHashOps

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def naive(docs: Seq[(Long, String)], w: Int, mb: Int): Map[Long, (Long, Long)] = {
    val chunks = docs.map { case (id, txt) =>
      id -> RollingHashOps.chunkHashes(UTF8String.fromString(txt), w, mb)
        .toLongArray().toSeq
    }
    val docsPerHash = chunks.flatMap { case (id, cs) => cs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    chunks.collect { case (id, cs) if cs.nonEmpty =>
      id -> (cs.size.toLong, cs.count(c => docsPerHash(c) >= 2).toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int = 16, mb: Int = 4): Map[Long, (Long, Long)] =
    ChunkDedup.sharedChunkStats(docs.toDF("id", "txt"), "id", col("txt"), w, mb)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("shared passage at different offsets is found (shift resistance)") {
    val passage = "the quick brown fox jumps over the lazy dog again and " +
      "again until the boilerplate is long enough to span several chunks " +
      "of the content defined chunking window for sure"
    val docs = Seq(
      1L -> s"alpha beta gamma $passage",
      2L -> s"a completely different and much longer prefix sits here $passage",
      3L -> "no shared content in this document at all just filler words")
    val got = run(docs)
    assert(got(1L)._2 > 0, "doc 1 must report shared chunks")
    assert(got(2L)._2 > 0, "doc 2 must report shared chunks")
    assert(got(3L)._2 === 0, "doc 3 shares nothing")
    assert(got === naive(docs, 16, 4))
  }

  test("property: matches the naive per-occurrence accounting") {
    val rnd = new scala.util.Random(11)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 15) {
      val docs = (1L to 12L).map { id =>
        id -> Seq.fill(5 + rnd.nextInt(60))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      }
      assert(run(docs, w = 8, mb = 3) === naive(docs, 8, 3), s"trial $trial")
    }
  }

  test("docs yielding no chunks are absent; within-doc repeats need a second doc") {
    val got = run(Seq(1L -> "", 2L -> "xyz"))
    assert(!got.contains(1L)) // empty text -> zero chunks
    assert(got(2L) === ((1L, 0L))) // short text -> one trailing chunk, unshared
  }
}
