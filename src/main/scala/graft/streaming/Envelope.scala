package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Envelope payload decoding against a schema registry — the
  * EnvelopePayloadConverter / BaseEnvelopeSchemaConverter family
  * (gobblin-modules/gobblin-kafka-common/.../EnvelopePayloadConverter
  * .java:46) and the Confluent wire format: each record carries
  * [magic(1) | schemaId(4, big-endian) | payload].
  *
  * The registry here is an in-process map (schemaId -> StructType);
  * a remote registry client plugs in by materializing the same map on
  * the driver (schema sets are tiny and change rarely — the reference
  * caches them per-task the same way). JSON payloads decode via
  * `from_json` ([[decode]]); binary Avro datums via
  * [[decodeAvro]] / [[graft.sources.AvroDatumDecode]] (the from_avro
  * equivalent built on avro-core — no connector jar needed).
  *
  * Everything is column-expression (codegen'd): header parsing is
  * substring/conv arithmetic, per-schema decode is a when() chain over
  * the registry — no UDF, no per-row registry lookups.
  */
object Envelope {

  /** Big-endian int32 schema id at offset 2 (1-based substr, after the
    * magic byte).
    */
  def schemaId(envelope: Column): Column = {
    val b = (i: Int) => conv(hex(substring(envelope, 1 + i, 1)), 16, 10).cast("long")
    (b(1) * 16777216L + b(2) * 65536L + b(3) * 256L + b(4)).cast("int")
  }

  def payload(envelope: Column): Column =
    substring(envelope, 6, Int.MaxValue)

  /** Decode the payload per registered schema: output columns are
    * (schema_id, decoded struct per schema — null for other ids).
    * Unknown ids keep decoded_* null, so a FAIL row-policy on
    * "all decoded null" quarantines them (the reference throws).
    */
  def decode(df: DataFrame, envelopeCol: String,
      registry: Map[Int, DataType]): DataFrame = {
    val env = col(envelopeCol)
    val withId = df.withColumn("schema_id", schemaId(env))
    registry.foldLeft(withId) { case (d, (id, schema)) =>
      d.withColumn(s"decoded_$id",
        when(col("schema_id") === id,
          from_json(payload(env).cast("string"), schema)))
    }
  }

  /** Avro-payload variant of [[decode]]: the registry maps schemaId ->
    * writer schema JSON, each payload decodes through
    * [[graft.sources.AvroDatumDecode]] (the from_avro equivalent on
    * this classpath). Same null-for-unknown-id contract.
    */
  def decodeAvro(df: DataFrame, envelopeCol: String,
      registry: Map[Int, String]): DataFrame = {
    val env = col(envelopeCol)
    val withId = df.withColumn("schema_id", schemaId(env))
    registry.foldLeft(withId) { case (d, (id, schemaJson)) =>
      d.withColumn(s"decoded_$id",
        when(col("schema_id") === id,
          graft.sources.AvroDatumDecode(payload(env), schemaJson)))
    }
  }

  /** Build an envelope column (for tests/sinks): magic 0x00 + BE id +
    * payload bytes.
    */
  def encode(id: Int, payloadJson: Column): Column = {
    val header = Array(0, (id >> 24) & 0xff, (id >> 16) & 0xff, (id >> 8) & 0xff, id & 0xff)
      .map(b => f"$b%02x").mkString
    concat(unhex(lit(header)), payloadJson.cast("binary"))
  }
}
