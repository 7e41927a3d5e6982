package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rotating-AES codec: wire format (ref RotatingAESCodec.java:243
  * `%04d%03d` + base64 iv + base64 ct), roundtrip under every key,
  * deterministic key rotation, JSON credential store parsing.
  */
class RotatingAesSpec extends SparkSpec {
  import RotatingAes._

  private val store = CredentialStore(Map(
    1 -> Array.tabulate(16)(_.toByte),
    7 -> Array.tabulate(16)(i => (255 - i).toByte), // high bytes: no UTF-8 mangling
    23 -> "0123456789abcdef".getBytes("UTF-8")))

  test("roundtrips every row and spreads rows across all keys") {
    val df = spark.range(200).select(
      col("id"), concat(lit("payload-"), col("id")).as("text"))
    val out = df
      .withColumn("enc", encrypt(col("text"), pickKeyId(store, col("id")), store))
      .select(col("id"), col("text"),
        keyId(col("enc")).as("kid"),
        decrypt(col("enc"), store).cast("string").as("rt"))
      .collect()
    out.foreach { r => assert(r.getString(3) == r.getString(1)) }
    assert(out.map(_.getInt(2)).distinct.sorted.toSeq == Seq(1, 7, 23))
  }

  test("writes the reference header: 4-digit keyId, 3-digit ivLen, base64 iv") {
    val enc = spark.range(1).select(
      encrypt(lit("hello"), lit(7), store).as("e")).head.getString(0)
    assert(enc.substring(0, 4) == "0007")
    val ivLen = enc.substring(4, 7).toInt
    assert(ivLen == 24) // base64 of a 16-byte CBC IV
    assert(java.util.Base64.getDecoder.decode(enc.substring(7, 7 + ivLen)).length == 16)
    // body is valid base64 of whole AES blocks
    assert(java.util.Base64.getDecoder.decode(enc.substring(7 + ivLen)).length % 16 == 0)
  }

  test("encryption is a pure function of (plain, keyId): retry-idempotent, unique IVs") {
    val df = spark.range(50).select(concat(lit("p"), col("id")).as("t"))
    def pick(): Seq[Int] = spark.range(50)
      .select(pickKeyId(store, col("id"))).collect().map(_.getInt(0)).toSeq
    assert(pick() == pick())
    def enc(): Seq[String] =
      df.select(encrypt(col("t"), lit(1), store)).collect().map(_.getString(0)).toSeq
    val a = enc()
    assert(a == enc()) // re-run (task retry) -> identical frames
    // distinct plaintexts -> distinct derived IVs
    assert(a.map(_.substring(7, 31)).distinct.size == a.size)
  }

  test("loads the reference JsonCredentialStore hex layout and interops") {
    val f = Files.createTempFile("creds", ".json")
    Files.writeString(f,
      """{"12": "000102030405060708090a0b0c0d0e0f", "3": "ffeeddccbbaa99887766554433221100"}""")
    val cs = CredentialStore.fromJsonFile(f.toString)
    assert(cs.ids.toSeq == Seq(3, 12))
    assert(cs.keys(12).toSeq == Array.tabulate(16)(_.toByte).toSeq)
    val rt = spark.range(1).select(
      decrypt(encrypt(lit("interop"), lit(3), cs), cs).cast("string")).head.getString(0)
    assert(rt == "interop")
  }

  test("property: arbitrary binary payloads roundtrip (200 seeded cases)") {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    val payloads = (0 until 200).map { i =>
      val len = rng.nextInt(300) // includes 0-length
      val b = new Array[Byte](len); rng.nextBytes(b)
      (i.toLong, b)
    } :+ (200L, Array.tabulate(256)(_.toByte)) // every byte value once
    val df = payloads.toDF("id", "payload")
    val out = df
      .withColumn("enc", encrypt(col("payload"), pickKeyId(store, col("id")), store))
      .select(col("id"), col("payload"), decrypt(col("enc"), store).as("rt"))
      .collect()
    out.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("rt"), r.getAs[Array[Byte]]("payload")),
        s"roundtrip mismatch for id ${r.getLong(0)}")
    }
  }

  test("rejects malformed stores") {
    intercept[IllegalArgumentException](
      CredentialStore(Map(1 -> Array.fill(8)(0.toByte)))) // wrong key length
    intercept[IllegalArgumentException](CredentialStore(Map.empty))
    intercept[IllegalArgumentException](
      CredentialStore(Map(10000 -> Array.fill(16)(0.toByte)))) // not %04d-encodable
  }
}
