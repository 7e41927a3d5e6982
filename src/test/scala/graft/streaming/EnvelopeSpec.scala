package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val registry: Map[Int, DataType] = Map(
    1 -> StructType(Seq(StructField("k", LongType), StructField("name", StringType))),
    70000 -> StructType(Seq(StructField("v", DoubleType)))) // id beyond 2 bytes

  test("encode/decode round-trip against the registry, multi-schema stream") {
    val df = Seq(
      (1, """{"k": 7, "name": "a"}"""),
      (70000, """{"v": 2.5}"""),
      (999, """{"x": 1}"""))   // unknown schema id
      .toDF("id", "js")
      .select(when($"id" === 1, Envelope.encode(1, $"js"))
        .when($"id" === 70000, Envelope.encode(70000, $"js"))
        .otherwise(Envelope.encode(999, $"js")).as("envelope"))

    val out = Envelope.decode(df, "envelope", registry)
      .select($"schema_id", $"decoded_1.k", $"decoded_1.name", $"decoded_70000.v")
      .collect().sortBy(_.getInt(0))

    assert(out(0).getInt(0) == 1 && out(0).getLong(1) == 7L && out(0).getString(2) == "a")
    assert(out(1).getInt(0) == 999 && out(1).isNullAt(1) && out(1).isNullAt(3)) // unknown -> nulls
    assert(out(2).getInt(0) == 70000 && out(2).getDouble(3) == 2.5)
  }

  test("avro-datum envelopes decode against a writer-schema registry") {
    import java.io.ByteArrayOutputStream
    import org.apache.avro.io.EncoderFactory
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import graft.sources.AvroFiles

    val s1 = AvroFiles.avroSchema(StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = false))))
    val s2 = AvroFiles.avroSchema(StructType(Seq(
      StructField("v", DoubleType, nullable = false))), name = "other")
    def datum(schema: org.apache.avro.Schema, fields: (String, Any)*): Array[Byte] = {
      val rec = new GenericData.Record(schema)
      fields.foreach { case (n, value) => rec.put(n, value) }
      val bos = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush(); bos.toByteArray
    }
    val rows = Seq(
      (1, datum(s1, "k" -> 7L, "name" -> "a")),
      (2, datum(s2, "v" -> 2.5)),
      (9, Array[Byte](1, 2, 3))) // unregistered id
      .toDF("id", "payload")
      .select((when($"id" === 1, Envelope.encode(1, $"payload"))
        .when($"id" === 2, Envelope.encode(2, $"payload"))
        .otherwise(Envelope.encode(9, $"payload"))).as("envelope"))

    val out = Envelope.decodeAvro(rows, "envelope",
        Map(1 -> s1.toString, 2 -> s2.toString))
      .select($"schema_id", $"decoded_1.k", $"decoded_1.name", $"decoded_2.v")
      .collect().sortBy(_.getInt(0))

    assert(out(0).getInt(0) == 1 && out(0).getLong(1) == 7L && out(0).getString(2) == "a")
    assert(out(1).getInt(0) == 2 && out(1).getDouble(3) == 2.5 && out(1).isNullAt(1))
    assert(out(2).getInt(0) == 9 && out(2).isNullAt(1) && out(2).isNullAt(3))
  }
}
