package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CollectListCapped, ContentChunkHashes, CosineSimilarity,
  DotProduct, Fnv64, FnvShingleHashes, NormalizeNfc, RollingHash64, ShingleHashes,
  SimHash64, SimHashFnv64, StringShingles, StripAccents}

/** SparkSessionExtensions registration: exposes graft's native
  * Catalyst expressions to SQL. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`:
  *
  * {{{
  * SELECT simhash64(text), rolling_hash64(text),
  *        content_chunk_hashes(text, 16, 6) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (args: Seq[Expression]) => RollingHash64(args.head)),
    (FunctionIdentifier("content_chunk_hashes"),
      new ExpressionInfo(classOf[ContentChunkHashes].getName, "content_chunk_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => ContentChunkHashes(c, 16, 6)
        case Seq(c, w, m) => ContentChunkHashes(c, intLit(w, "window"), intLit(m, "maskBits"))
        case _ => throw new IllegalArgumentException(
          "content_chunk_hashes(text[, window, maskBits])")
      }),
    (FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (args: Seq[Expression]) => Fnv64(args.head)),
    (FunctionIdentifier("simhash_fnv64"),
      new ExpressionInfo(classOf[SimHashFnv64].getName, "simhash_fnv64"),
      (args: Seq[Expression]) => SimHashFnv64(args.head)),
    (FunctionIdentifier("fnv_shingle_hashes"),
      new ExpressionInfo(classOf[FnvShingleHashes].getName, "fnv_shingle_hashes"),
      (args: Seq[Expression]) => FnvShingleHashes(args.head, intLit(args(1), "n"))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args.head, intLit(args(1), "n"))),
    (FunctionIdentifier("string_shingles"),
      new ExpressionInfo(classOf[StringShingles].getName, "string_shingles"),
      (args: Seq[Expression]) => StringShingles(args.head, intLit(args(1), "n"))),
    (FunctionIdentifier("collect_list_capped"),
      new ExpressionInfo(classOf[CollectListCapped].getName, "collect_list_capped"),
      (args: Seq[Expression]) => CollectListCapped(args.head, intLit(args(1), "cap"))),
    (FunctionIdentifier("normalize_nfc"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "normalize_nfc"),
      (args: Seq[Expression]) => NormalizeNfc(args.head)),
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => StripAccents(args.head)),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = org.apache.spark.sql.graftshim.ColumnShim.functionRegistry(spark)
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
