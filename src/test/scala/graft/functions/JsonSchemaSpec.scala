package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.JsonSchema._

class JsonSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("full scalar type matrix maps per SURVEY §1.2") {
    val rec = SRecord("r", Seq(
      "d" -> SDate, "ts" -> STimestamp, "t" -> STime, "fx" -> SFixed,
      "s" -> SString, "b" -> SBytes, "i" -> SInt, "l" -> SLong,
      "f" -> SFloat, "dbl" -> SDouble, "bool" -> SBoolean, "e" -> SEnum))
    val st = toSpark(rec).asInstanceOf[StructType]
    assert(st("d").dataType == DateType)
    assert(st("ts").dataType == TimestampType && st("t").dataType == TimestampType)
    assert(st("fx").dataType == BinaryType && st("b").dataType == BinaryType)
    assert(st("s").dataType == StringType && st("e").dataType == StringType)
    assert(st("i").dataType == IntegerType && st("l").dataType == LongType)
    assert(st("f").dataType == FloatType && st("dbl").dataType == DoubleType)
    assert(st("bool").dataType == BooleanType)
  }

  test("nested array/map/record; nullable union; tagged general union") {
    val rec = SRecord("r", Seq(
      "arr" -> SArray(SLong),
      "m" -> SMap(SRecord("inner", Seq("x" -> SInt))),
      "opt" -> SUnion(Seq(SString, SNull)),
      "either" -> SUnion(Seq(SLong, SString))))
    val st = toSpark(rec).asInstanceOf[StructType]
    assert(st("arr").dataType == ArrayType(LongType))
    assert(st("m").dataType.asInstanceOf[MapType].valueType.isInstanceOf[StructType])
    assert(st("opt").dataType == StringType && st("opt").nullable)
    val u = st("either").dataType.asInstanceOf[StructType]
    assert(u.fieldNames.toSeq == Seq("tag", "u0", "u1"))
    assert(u("u0").dataType == LongType && u("u1").dataType == StringType)
  }

  test("recursive record rejected; eliminator prunes it") {
    // node.next re-references record name "node" -> recursion
    val recursive = SRecord("node", Seq("value" -> SLong,
      "next" -> SRecord("node", Seq("value" -> SLong,
        "next" -> SRecord("node", Nil)))))
    intercept[IllegalArgumentException](toSpark(recursive))
    val pruned = eliminateRecursion(recursive)
    val st = toSpark(pruned).asInstanceOf[StructType] // no longer throws
    // the recursive subtree is dropped (NullType field), value survives
    assert(st("next").dataType == NullType)
    assert(st("value").dataType == LongType)
  }

  test("toParseStruct drops the recursive field; from_json skips the subtree cleanly") {
    val recursive = SRecord("node", Seq("value" -> SLong,
      "next" -> SRecord("node", Seq("value" -> SLong, "next" -> SNull))))
    val st = toParseStruct(recursive)
    assert(!st.fieldNames.contains("next") && st("value").dataType == LongType)
    // the payload DOES carry the recursive subtree; a NullType
    // placeholder would desync Jackson and leak next.value into value
    val row = Seq("""{"value": 5, "next": {"value": 6, "next": null}}""")
      .toDF("js").select(from_json($"js", st).as("r")).select($"r.value").head
    assert(row.getLong(0) == 5L)
  }

  test("from_json with generated schema parses typed values end-to-end") {
    val schema = toSpark(SRecord("r", Seq(
      "k" -> SLong, "tags" -> SArray(SString),
      "when" -> STimestamp)))
    val df = Seq("""{"k": 7, "tags": ["a","b"], "when": "2024-01-02 03:04:05"}""")
      .toDF("js")
      .select(from_json($"js", schema).as("r"))
      .select($"r.k", $"r.tags", to_timestamp($"r.when").as("when"))
    val row = df.head
    assert(row.getLong(0) == 7L)
    assert(row.getSeq[String](1) == Seq("a", "b"))
    assert(row.getTimestamp(2) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
  }

  test("property: eliminateRecursion makes ANY random schema tree convertible (300 seeds)") {
    val rnd = new scala.util.Random(99)
    val scalars = Vector(SDate, STimestamp, STime, SFixed, SString, SBytes,
      SInt, SLong, SFloat, SDouble, SBoolean, SNull, SEnum)
    // biased generator that reuses record names => recursion is common
    def gen(depth: Int): SType =
      if (depth >= 4) scalars(rnd.nextInt(scalars.size))
      else rnd.nextInt(10) match {
        case 0 | 1 | 2 => scalars(rnd.nextInt(scalars.size))
        case 3 => SArray(gen(depth + 1))
        case 4 => SMap(gen(depth + 1))
        case 5 | 6 | 7 =>
          SRecord(s"r${rnd.nextInt(3)}",
            (0 until 1 + rnd.nextInt(3)).map(i => s"f$i" -> gen(depth + 1)))
        case _ => SUnion((0 until 1 + rnd.nextInt(3)).map(_ => gen(depth + 1)) :+ SNull)
      }
    (1 to 300).foreach { _ =>
      val t = SRecord("root", Seq("payload" -> gen(0)))
      val pruned = eliminateRecursion(t)
      val st = toSpark(pruned) // must never throw
      assert(st.isInstanceOf[StructType])
    }
  }

  test("schema TEXT parses the full descriptor grammar") {
    val text =
      """[
        |  {"columnName": "id", "dataType": {"type": "long"}},
        |  {"columnName": "name", "dataType": {"type": "string"}, "isNullable": true},
        |  {"columnName": "tags", "dataType": {"type": "array", "items": "string"}},
        |  {"columnName": "scores", "dataType": {"type": "map", "values": {"type": "double"}}},
        |  {"columnName": "addr", "dataType": {"type": "record", "name": "addr", "values": [
        |    {"columnName": "city", "dataType": {"type": "string"}},
        |    {"columnName": "zip", "dataType": {"type": "int"}}
        |  ]}},
        |  {"columnName": "status", "dataType": {"type": "enum", "symbols": ["A", "B"]}},
        |  {"columnName": "opt", "dataType": {"type": ["string", "null"]}},
        |  {"columnName": "either", "dataType": {"type": ["long", "string"]}}
        |]""".stripMargin
    val st = JsonSchemaText.toStruct(text)
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("scores").dataType == MapType(StringType, DoubleType))
    val addr = st("addr").dataType.asInstanceOf[StructType]
    assert(addr("city").dataType == StringType && addr("zip").dataType == IntegerType)
    assert(st("status").dataType == StringType) // ENUM -> string
    assert(st("opt").dataType == StringType && st("opt").nullable)
    val u = st("either").dataType.asInstanceOf[StructType]
    assert(u.fieldNames.toSeq == Seq("tag", "u0", "u1"))
  }

  test("schema TEXT: recursive record is eliminated, not fatal") {
    val text =
      """[{"columnName": "n", "dataType": {"type": "record", "name": "node", "values": [
        |  {"columnName": "value", "dataType": {"type": "long"}},
        |  {"columnName": "next", "dataType": {"type": "record", "name": "node", "values": [
        |    {"columnName": "value", "dataType": {"type": "long"}}
        |  ]}}
        |]}}]""".stripMargin
    val st = JsonSchemaText.toStruct(text) // must not throw
    val n = st("n").dataType.asInstanceOf[StructType]
    assert(n("value").dataType == LongType)
    assert(n("next").dataType == NullType) // recursive subtree pruned
  }

  test("schema TEXT: malformed documents fail with a clear message") {
    intercept[IllegalArgumentException](JsonSchemaText.parseFields("""{"not": "an array"}"""))
    intercept[IllegalArgumentException](JsonSchemaText.parseFields("""[{"dataType": {"type": "long"}}]"""))
    intercept[IllegalArgumentException](JsonSchemaText.parseFields("""[{"columnName": "x"}]"""))
    intercept[IllegalArgumentException](JsonSchemaText.parseFields("""[{"columnName": "x", "dataType": {"type": "wat"}}]"""))
  }

  test("schema TEXT drives from_json end-to-end") {
    val st = JsonSchemaText.toStruct(
      """[{"columnName": "k", "dataType": {"type": "long"}},
        |  {"columnName": "tags", "dataType": {"type": "array", "items": "string"}}]""".stripMargin)
    val row = Seq("""{"k": 9, "tags": ["x"]}""").toDF("js")
      .select(from_json($"js", st).as("r")).select($"r.k", $"r.tags").head
    assert(row.getLong(0) == 9L && row.getSeq[String](1) == Seq("x"))
  }

  test("date-format parsing matches reference default format semantics") {
    val df = Seq("2024-03-05 10:20:30").toDF("s")
      .select(JsonSchema.parseTimestamp($"s").as("ts"), JsonSchema.parseDate(lit("2024-03-05")).as("d"))
    val r = df.head
    assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-03-05 10:20:30"))
    assert(r.getDate(1).toString == "2024-03-05")
  }
}
