package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOfLeft picks the latest right row at-or-before each left ts") {
    val e = Seq(
      (1L, 10L, "2024-01-05 00:00:00"),
      (2L, 10L, "2024-01-01 00:00:00"),   // before any order -> null
      (3L, 10L, "2024-01-04 00:00:00"),   // equal ts -> inclusive match
      (4L, 20L, "2024-01-10 00:00:00"))   // key with no right rows
      .toDF("event_id", "k", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val o = Seq(
      (10L, "2024-01-02 00:00:00", 100.0),
      (10L, "2024-01-04 00:00:00", 200.0),
      (30L, "2024-01-01 00:00:00", 1.0))
      .toDF("k2", "ots_s", "amount")
      .withColumn("ots", $"ots_s".cast("timestamp")).drop("ots_s")

    val out = AsOfJoin.asOfLeft(e, o, "k", "k2", "ts", "ots",
        payload = Map("amount" -> $"amount", "matched_ts" -> $"ots"))
      .orderBy("event_id").collect()

    assert(out(0).getDouble(3) == 200.0) // event 1 @ 01-05 -> order @ 01-04
    assert(out(1).isNullAt(3))           // event 2 precedes all orders
    assert(out(2).getDouble(3) == 200.0) // equal ts is inclusive
    assert(out(3).isNullAt(3))           // no right rows for key 20
    // payload columns travel together (amount + matched_ts same row)
    assert(out(0).getTimestamp(4) == java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))
  }

  test("left row count is preserved (no fan-out)") {
    val e = graft.Tables.load(spark, sf(), "events")
      .select($"event_id", $"user_id", $"ts")
    val o = graft.Tables.load(spark, sf(), "orders")
    val joined = AsOfJoin.asOfLeft(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Map("last_order_date" -> $"o_orderdate"))
    assert(joined.count() == e.count())
  }
}
