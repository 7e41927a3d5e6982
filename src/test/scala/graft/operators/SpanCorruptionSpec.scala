package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  /** Splice the target's spans back into the input's sentinels. */
  private def reconstruct(input: String, target: String): String = {
    val spans = scala.collection.mutable.Map[String, Vector[String]]()
    var cur: String = null
    var buf = Vector.empty[String]
    for (tok <- target.split(" ").filter(_.nonEmpty)) {
      if (tok.startsWith("<extra_id_")) {
        if (cur != null) spans(cur) = buf
        cur = tok; buf = Vector.empty
      } else buf :+= tok
    }
    if (cur != null) spans(cur) = buf
    input.split(" ").filter(_.nonEmpty).flatMap { tok =>
      if (tok.startsWith("<extra_id_")) spans(tok) else Vector(tok)
    }.mkString(" ")
  }

  private val docs = Seq(
    (1L, "a b c d e f g h i j k l m n o p q r s t"),
    (2L, "x y z"),
    (3L, ""),
    (4L, "lone")
  ).toDF("doc_id", "text")

  test("input + target splice back to the original token stream") {
    val rows = SpanCorruption.corrupt(docs, "doc_id", "text").collect()
    val originals = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).mkString(" ")).toMap
    rows.foreach { r =>
      val (id, in, tg) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(reconstruct(in, tg) === originals(id), s"doc $id")
      // token accounting: input non-sentinel tokens + masked == total
      val inToks = in.split(" ").filter(t => t.nonEmpty && !t.startsWith("<extra_id_")).length
      assert(inToks + r.getLong(4) === originals(id).split(" ").count(_.nonEmpty).toLong)
      // sentinels appear once each in input, numbered 0..n_spans-1
      val sents = in.split(" ").filter(_.startsWith("<extra_id_"))
      assert(sents.toSet === (0L until r.getLong(3)).map(k => s"<extra_id_$k>").toSet)
    }
  }

  test("maskMod=1 masks everything into one span; output is deterministic") {
    val all = SpanCorruption.corrupt(docs.filter($"doc_id" === 1), "doc_id", "text",
      blockSize = 3, maskMod = 1).collect().head
    assert(all.getString(1) === "<extra_id_0>")
    assert(all.getString(2).startsWith("<extra_id_0> a b c"))
    assert(all.getLong(3) === 1L && all.getLong(4) === 20L)
    val a = SpanCorruption.corrupt(docs, "doc_id", "text").collect().toSeq
    val b = SpanCorruption.corrupt(docs, "doc_id", "text").collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
  }

  test("fim: PSM reordering reconstructs the original; counts partition the doc") {
    val rows = SpanCorruption.fim(docs, "doc_id", "text").collect()
    val originals = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val psm = r.getString(1)
      // parse <fim_prefix> P <fim_suffix> S <fim_middle> M
      val sfx = psm.indexOf("<fim_suffix>"); val mid = psm.indexOf("<fim_middle>")
      assert(sfx >= 0 && mid > sfx, s"doc $id: $psm")
      def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
      val p = toks(psm.substring("<fim_prefix>".length, sfx))
      val sf = toks(psm.substring(sfx + "<fim_suffix>".length, mid))
      val m = toks(psm.substring(mid + "<fim_middle>".length))
      assert(p ++ m ++ sf === originals(id), s"doc $id")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((p.size.toLong, m.size.toLong, sf.size.toLong)))
    }
    // empty doc degenerates to the bare sentinels
    val empty = rows.find(_.getLong(0) == 3L).get
    assert(empty.getString(1) === "<fim_prefix> <fim_suffix> <fim_middle>")
  }

  test("empty and unmasked docs keep full text with empty targets") {
    val byId = SpanCorruption.corrupt(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getString(1) === "" && byId(3L).getString(2) === "")
    assert(byId(3L).getLong(3) === 0L)
  }
}
