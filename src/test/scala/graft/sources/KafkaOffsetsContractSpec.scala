package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Contract test for the offset-JSON handed to Spark's Kafka source:
  * `spark.read.format("kafka").option("startingOffsets"/"endingOffsets",
  * json)` parses that option with Jackson into
  * `Map[String, Map[String, Long]]` (topic -> partition-as-STRING ->
  * offset; spark-sql-kafka's JsonUtils.partitionOffsets). The
  * connector jar is absent in this environment, so this pins the
  * EXACT documented shape the jar would parse — deserializing the
  * same way JsonUtils does — guarding the seam until a live broker
  * wiring can exercise it end-to-end.
  */
class KafkaOffsetsContractSpec extends AnyFunSuite {
  import KafkaOffsets._

  /** Parse exactly as spark-sql-kafka's JsonUtils.partitionOffsets:
    * Jackson ObjectMapper + Scala module, Map[String, Map[String, Long]].
    */
  private def parseAsSpark(json: String): Map[String, Map[String, Long]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    // erasure leaves inner numbers as Integer/Long by magnitude —
    // normalize through Number exactly as a typed binding would
    mapper.readValue(json, classOf[Map[String, Map[String, Any]]])
      .map { case (t, ps) =>
        t -> ps.map { case (p, o) => p -> o.asInstanceOf[Number].longValue() }
      }
  }

  private val ranges = Seq(
    PartitionRange("events", 0, earliest = 5L, latest = 100L),
    PartitionRange("events", 1, earliest = 0L, latest = 42L),
    PartitionRange("audit", 0, earliest = 7L, latest = 7L))

  test("offset JSON parses as Spark's JsonUtils shape: topic -> string partition -> long") {
    val plan = KafkaOffsets.plan(Map(("events", 0) -> 10L), ranges)
    for (json <- Seq(plan.startingJson, plan.endingJson)) {
      val parsed = parseAsSpark(json)
      assert(parsed.keySet === Set("events", "audit"), json)
      parsed.foreach { case (_, parts) =>
        parts.keys.foreach { k =>
          assert(k.forall(_.isDigit), s"partition key '$k' must be a numeric STRING")
        }
      }
    }
    val starts = parseAsSpark(plan.startingJson)
    assert(starts("events")("0") === 10L) // committed offset honored
    assert(starts("events")("1") === 0L) // new partition -> earliest
    assert(starts("audit")("0") === 7L)
    val ends = parseAsSpark(plan.endingJson)
    assert(ends("events")("0") === 100L && ends("events")("1") === 42L)
  }

  test("round-trip: parsed values equal the plan maps exactly") {
    val plan = KafkaOffsets.plan(Map.empty, ranges, ResetToLatest)
    val starts = parseAsSpark(plan.startingJson).flatMap { case (t, ps) =>
      ps.map { case (p, o) => (t, p.toInt) -> o }
    }
    assert(starts === plan.startingOffsets)
    val ends = parseAsSpark(plan.endingJson).flatMap { case (t, ps) =>
      ps.map { case (p, o) => (t, p.toInt) -> o }
    }
    assert(ends === plan.endingOffsets)
  }

  test("topic names needing JSON escaping are rejected or emitted valid") {
    // Kafka legal topic chars are [a-zA-Z0-9._-] — none need escaping,
    // so the emitter's raw interpolation is safe for every legal name;
    // this documents that boundary with a legal-but-gnarly name
    val plan = KafkaOffsets.plan(Map.empty,
      Seq(PartitionRange("a.b-c_9", 3, 1L, 2L)))
    val parsed = parseAsSpark(plan.startingJson)
    assert(parsed("a.b-c_9")("3") === 1L)
  }
}
