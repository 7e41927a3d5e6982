package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Avro container files + binary-datum envelope decode, built on
  * avro-core (no spark-avro connector on this classpath).
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("container-file roundtrip preserves values and types (events table)") {
    val dir = tmpDir("avro") + "/events"
    val src = Tables.load(spark, sf(), "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    AvroFiles.write(src, dir)
    val back = AvroFiles.read(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("event_id").dataType == LongType)
    assert(back.count() == 1000)
    // exact value equality both directions (anti-join empty)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("nested struct/array/map roundtrip incl. nullable fields") {
    val dir = tmpDir("avro") + "/nested"
    val src = Seq(
      (1L, Seq("a", "b"), Map("x" -> 1.5), ("in", 7), Option("opt")),
      (2L, Seq.empty[String], Map.empty[String, Double], ("ner", 9), None))
      .toDF("id", "tags", "scores", "rec", "maybe")
    AvroFiles.write(src, dir)
    val back = AvroFiles.read(spark, dir)
    // set ops reject MAP columns — compare materialized rows by id
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getMap[String, Double](2).toMap,
        r.getStruct(3), Option(r.getString(4)))).sortBy(_._1).toSeq
    assert(rows(back) == rows(src))
    assert(back.schema("maybe").nullable)
    val rec = back.schema("rec").dataType.asInstanceOf[StructType]
    assert(rec.fieldNames.toSeq == Seq("_1", "_2"))
  }

  test("reader schema comes from the NEWEST file: added field survives, old rows get its default") {
    val dir = tmpDir("avro_evolve") + "/data"
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)

    def writeRaw(name: String, schemaJson: String, rows: Seq[GenericRecord], mtime: Long): Unit = {
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val out = fs.create(p, true)
      val w = new org.apache.avro.file.DataFileWriter(
        new GenericDatumWriter[GenericRecord](schema)).create(schema, out)
      try rows.foreach(w.append) finally w.close()
      fs.setTimes(p, mtime, -1L) // explicit mtimes — no clock races
    }
    val oldSchema =
      """{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}"""
    val newSchema =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"long"},
        |{"name":"b","type":"string","default":"fallback"}]}""".stripMargin
    def rec(schemaJson: String, vals: (String, Any)*): GenericRecord = {
      val s = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val r = new org.apache.avro.generic.GenericData.Record(s)
      vals.foreach { case (k, v) => r.put(k, v) }
      r
    }
    writeRaw("part-0.avro", oldSchema, Seq(rec(oldSchema, "a" -> 1L)), mtime = 1000000L)
    writeRaw("part-1.avro", newSchema,
      Seq(rec(newSchema, "a" -> 2L, "b" -> new org.apache.avro.util.Utf8("fresh"))),
      mtime = 2000000L)

    val back = AvroFiles.read(spark, dir).orderBy($"a")
    assert(back.schema.fieldNames.toSeq == Seq("a", "b"),
      "added field from the newest file must be in the read schema")
    val got = back.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "fallback"), (2L, "fresh")))
  }

  test("schema translation is a faithful two-way matrix") {
    val st = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("dt", DateType, nullable = false),
      StructField("arr", ArrayType(LongType), nullable = false),
      StructField("m", MapType(StringType, StringType), nullable = false),
      StructField("nested", StructType(Seq(StructField("x", LongType))), nullable = false)))
    val round = AvroFiles.sparkType(AvroFiles.avroSchema(st)).asInstanceOf[StructType]
    // data types survive exactly; nullability survives on fields
    assert(round.fields.map(f => (f.name, f.dataType)).toSeq ==
      st.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(round("i").nullable && !round("l").nullable)
  }

  test("logical decimal: schema matrix + container round-trip exact") {
    val st = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("money", DecimalType(18, 2), nullable = false),
      StructField("rate", DecimalType(4, 3), nullable = true)))
    // schema: bytes + decimal(p,s) both ways
    val avro = AvroFiles.avroSchema(st)
    val round = AvroFiles.sparkType(avro).asInstanceOf[StructType]
    assert(round("money").dataType == DecimalType(18, 2))
    assert(round("rate").dataType == DecimalType(4, 3))
    val moneySchema = avro.getField("money").schema()
    assert(moneySchema.getType == org.apache.avro.Schema.Type.BYTES &&
      moneySchema.getLogicalType.getName == "decimal")
    // values: negative, zero, scale-extreme — all byte-exact
    val dir = tmpDir("avrodec")
    val df = Seq(
      (1L, BigDecimal("12345678901234.56"), Some(BigDecimal("0.125"))),
      (2L, BigDecimal("-0.01"), None),
      (3L, BigDecimal("0.00"), Some(BigDecimal("-1.999"))))
      .toDF("k", "money", "rate")
      .select(col("k"), col("money").cast("decimal(18,2)").as("money"),
        col("rate").cast("decimal(4,3)").as("rate"))
    AvroFiles.write(df, dir)
    val back = AvroFiles.read(spark, dir).orderBy("k").collect()
    assert(back(0).getDecimal(1) == new java.math.BigDecimal("12345678901234.56"))
    assert(back(1).getDecimal(1) == new java.math.BigDecimal("-0.01"))
    assert(back(1).isNullAt(2))
    assert(back(2).getDecimal(2) == new java.math.BigDecimal("-1.999"))
  }

  test("binary-datum envelope decode (BytesToAvroConverter semantics)") {
    val schema = AvroFiles.avroSchema(StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = false))))
    // encode datums with plain avro-core, as a registry producer would
    def datum(k: Long, name: String): Array[Byte] = {
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("k", k); rec.put("name", name)
      val bos = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush(); bos.toByteArray
    }
    val payloads = Seq(datum(1, "alpha"), datum(2, "beta")).toDF("payload")
    val decoded = AvroFiles.decodeDatums(spark, payloads, "payload", schema.toString)
    assert(decoded.orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("datum ENCODE (to_avro direction): expression output decodes with plain avro-core") {
    import org.apache.avro.generic.GenericDatumReader
    import org.apache.avro.io.DecoderFactory
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "name")
    val structCol = org.apache.spark.sql.functions.struct($"k", $"name")
    val enc = df.select($"k", AvroDatumEncode(structCol).as("payload"))
    // binary avro needs the exact WRITER schema — derive it the same
    // way the expression does (from the struct's runtime type)
    val writerType = df.select(structCol.as("s")).schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val schema = AvroFiles.avroSchema(writerType)
    // independent decode with avro-core, not our own decoder
    val reader = new GenericDatumReader[GenericRecord](schema)
    val rows = enc.orderBy($"k").collect().map { r =>
      val dec = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]]("payload"), null)
      val rec = reader.read(null, dec)
      (rec.get("k").asInstanceOf[Long], rec.get("name").toString)
    }.toSeq
    assert(rows == Seq((1L, "alpha"), (2L, "beta")))
    // and through our own decode expression: exact roundtrip
    val rt = enc.select($"k".as("orig_k"),
        AvroDatumDecode($"payload", schema.toString).as("r"))
      .select($"orig_k", $"r.k", $"r.name").orderBy($"orig_k").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSeq
    assert(rt == Seq((1L, "alpha"), (2L, "beta")))
  }
}
