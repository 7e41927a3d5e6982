package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, ((i * 137) % 997).toLong))
      .toDF("id", "difficulty")

  test("stages are contiguous in difficulty and balanced within one row") {
    val r = Curriculum.order(docs(1000), "id", "difficulty", stages = 4)
      .select("id", "difficulty", "stage", "train_seq")
      .as[(Long, Long, Long, Long)].collect()
    val byStage = r.groupBy(_._3).toSeq.sortBy(_._1)
    assert(byStage.map(_._1) == Seq(0L, 1L, 2L, 3L))
    val sizes = byStage.map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced stages: $sizes")
    // difficulty ranges of consecutive stages may touch (rank splits
    // ties) but never invert
    byStage.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.map(_._2).max <= b.map(_._2).min)
    }
  }

  test("train_seq is a stage-major permutation, shuffled within stages") {
    val r = Curriculum.order(docs(400), "id", "difficulty", stages = 4)
      .select("id", "difficulty", "stage", "train_seq")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(r.map(_._4).toSeq == (1L to 400L))
    // stage-major: the sequence of stages is non-decreasing
    assert(r.map(_._3).toSeq == r.map(_._3).sorted.toSeq)
    // within a stage the walk is NOT difficulty-sorted (the shuffle)
    val inStage0 = r.filter(_._3 == 0L).map(_._2).toSeq
    assert(inStage0 != inStage0.sorted)
  }

  test("deterministic across partitionings; salt changes only the within-stage walk") {
    def run(parts: Int, salt: String) =
      Curriculum.order(docs(500).repartition(parts), "id", "difficulty",
          stages = 5, salt = salt)
        .select("id", "stage", "train_seq")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(3, "cur")
    assert(a == run(13, "cur"))
    val b = run(3, "other-salt")
    assert(a.map(t => (t._1, t._2)) == b.map(t => (t._1, t._2))) // stages fixed
    assert(a != b) // the walk moved
  }

  test("one stage degenerates to a plain deterministic shuffle; empty input is empty") {
    val r = Curriculum.order(docs(50), "id", "difficulty", stages = 1)
      .select("stage").distinct().as[Long].collect().toSeq
    assert(r == Seq(0L))
    assert(Curriculum.order(docs(0), "id", "difficulty", stages = 3).count() == 0)
  }
}
