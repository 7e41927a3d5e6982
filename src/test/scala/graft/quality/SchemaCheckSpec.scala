package graft.quality

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.JsonSchema._

class SchemaCheckSpec extends SparkSpec {
  import SchemaCheck.parity

  private val base = SRecord("ev", Seq("id" -> SLong, "name" -> SString,
    "tags" -> SArray(SString), "val" -> SUnion(Seq(SNull, SDouble))))

  test("SType parity: names, field sets, and types must match; order must not matter") {
    assert(parity(base, base))
    assert(parity(base, SRecord("ev", Seq("val" -> SUnion(Seq(SNull, SDouble)),
      "tags" -> SArray(SString), "name" -> SString, "id" -> SLong))))
    // renamed record
    assert(!parity(base, base.copy(name = "ev2")))
    // renamed field
    assert(!parity(base, SRecord("ev", Seq("id" -> SLong, "label" -> SString,
      "tags" -> SArray(SString), "val" -> SUnion(Seq(SNull, SDouble))))))
    // field count mismatch
    assert(!parity(base, SRecord("ev", base.fields.take(3))))
    // primitive type change (NO promotions: parity is a copy guard)
    assert(!parity(base, SRecord("ev", Seq("id" -> SInt, "name" -> SString,
      "tags" -> SArray(SString), "val" -> SUnion(Seq(SNull, SDouble))))))
  }

  test("SType parity: unions match as a multiset, arrays/maps recurse") {
    val u = SUnion(Seq(SNull, SLong, SString))
    assert(parity(u, SUnion(Seq(SString, SNull, SLong))))
    assert(!parity(u, SUnion(Seq(SString, SNull, SDouble))))
    assert(!parity(u, SUnion(Seq(SNull, SLong))))
    assert(parity(SMap(SArray(SLong)), SMap(SArray(SLong))))
    assert(!parity(SMap(SArray(SLong)), SMap(SArray(SInt))))
    // duplicate branches consume one-for-one
    assert(parity(SUnion(Seq(SLong, SLong)), SUnion(Seq(SLong, SLong))))
    assert(!parity(SUnion(Seq(SLong, SLong)), SUnion(Seq(SLong, SString))))
  }

  test("StructType parity: order and nullability ignored, structure enforced") {
    val a = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vals", ArrayType(DoubleType)),
      StructField("nest", StructType(Seq(StructField("x", IntegerType))))))
    val reordered = StructType(Seq(
      StructField("nest", StructType(Seq(StructField("x", IntegerType)))),
      StructField("id", LongType, nullable = true),
      StructField("vals", ArrayType(DoubleType, containsNull = false))))
    assert(SchemaCheck.parity(a, reordered))
    // renamed / retyped / added fields all fail
    assert(!SchemaCheck.parity(a, StructType(reordered.fields.map {
      case f if f.name == "id" => f.copy(name = "id2")
      case f => f
    })))
    assert(!SchemaCheck.parity(a, StructType(reordered.fields.map {
      case f if f.name == "id" => f.copy(dataType = IntegerType)
      case f => f
    })))
    assert(!SchemaCheck.parity(a,
      StructType(reordered.fields :+ StructField("extra", LongType))))
    // nested struct field rename fails
    assert(!SchemaCheck.parity(a, StructType(reordered.fields.map {
      case f if f.name == "nest" =>
        f.copy(dataType = StructType(Seq(StructField("y", IntegerType))))
      case f => f
    })))
  }

  test("checkParquetTree: per-file verdicts from footers, mismatch caught") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_schemacheck")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c", 3.0)).toDF("id", "name", "amount") // renamed column
      .coalesce(1).write.mode("append").parquet(dir)
    val expected = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val checks = SchemaCheck.checkParquetTree(spark, dir, expected)
    assert(checks.size === 2)
    assert(checks.count(_.ok) === 1)
    assert(checks.forall(_.file.endsWith(".parquet")))
    assert(checks.filter(!_.ok).head.schema.contains("amount"))
  }

  test("checkParquetTree recurses into partitioned dt=*/ subtrees") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_schemacheck_part")
    Seq((1L, "a")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$dir/dt=2024-01-01")
    Seq((2L, "b")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$dir/dt=2024-01-02")
    Seq((3L, 9.0)).toDF("id", "wrong")
      .coalesce(1).write.parquet(s"$dir/dt=2024-01-03")
    val expected = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val checks = SchemaCheck.checkParquetTree(spark, dir, expected)
    // a flat listStatus would see ZERO files here
    assert(checks.size === 3)
    assert(checks.count(_.ok) === 2)
    // relative paths disambiguate the per-partition part-00000 names
    assert(checks.map(_.file).distinct.size === 3)
    assert(checks.forall(_.file.startsWith("dt=")))
    assert(checks.filter(!_.ok).head.file.startsWith("dt=2024-01-03"))
  }

  test("checkParquetTreeSummary aggregates the verdict executor-side") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_schemacheck_sum")
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"n$i")).toDF("id", "name")
        .coalesce(1).write.parquet(s"$dir/dt=$i")
    }
    Seq((9L, 1.5)).toDF("id", "bad")
      .coalesce(1).write.parquet(s"$dir/dt=9")
    val expected = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val v = SchemaCheck.checkParquetTreeSummary(spark, dir, expected, maxExamples = 3)
    assert(v.nFiles === 5 && v.nBad === 1)
    assert(v.badExamples.size === 1 && v.badExamples.head.startsWith("dt=9"))
    // empty tree -> zero verdict, no job
    val empty = tmpDir("graft_schemacheck_empty")
    assert(SchemaCheck.checkParquetTreeSummary(spark, empty, expected)
      === SchemaCheck.TreeCheck(0L, 0L, Nil))
  }
}
