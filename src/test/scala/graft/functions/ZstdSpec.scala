package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zstd expressions: lossless round-trip, two-direction CLI interop
  * (the system zstd binary is the foreign anchor), bomb guards on both
  * the declared-size and streaming paths, and loud corrupt-frame
  * failures.
  */
class ZstdSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(payload: Array[Byte]): Array[Byte] =
    ZstdBytes.decompress(ZstdBytes.compress(payload, 3), 1L << 26)

  test("round-trip is lossless for text, binary, and empty payloads") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq(
      "plain prose with some repetition repetition repetition".getBytes(UTF_8),
      Array.fill(10000)(rnd.nextInt(256).toByte),
      Array.emptyByteArray,
      ("x" * 100000).getBytes(UTF_8))
    payloads.foreach(p => assert(roundTrip(p).sameElements(p)))
  }

  test("column expressions round-trip through a plan") {
    val docs = Seq("alpha", "beta beta beta", "", "γδε unicode")
      .toDF("text")
    val back = docs
      .select(ZstdDecompress(ZstdCompress(col("text").cast("binary")))
        .cast("string").as("text"))
      .as[String].collect().toSeq
    assert(back == Seq("alpha", "beta beta beta", "", "γδε unicode"))
  }

  test("CLI interop: our frames decode with the zstd binary and vice versa") {
    // resolve by probing PATH + system bins so suite health doesn't
    // depend on the invoking shell's PATH
    val zstdBin = graft.BinTool.resolve("zstd")
    assume(zstdBin.isDefined, "zstd binary not reachable — skipping interop")
    val dir = Files.createTempDirectory("zstd_interop")
    val payload = ("interop payload line\n" * 500).getBytes(UTF_8)

    // ours -> CLI
    val ours = dir.resolve("ours.zst")
    Files.write(ours, ZstdBytes.compress(payload, 3))
    val dec = dir.resolve("ours.out")
    val p1 = new ProcessBuilder(zstdBin.get, "-d", "-f", "-q",
      ours.toString, "-o", dec.toString).inheritIO().start()
    assert(p1.waitFor() == 0, "zstd -d rejected our frame")
    assert(Files.readAllBytes(dec).sameElements(payload))

    // CLI -> ours
    val raw = dir.resolve("cli.in")
    Files.write(raw, payload)
    val p2 = new ProcessBuilder(zstdBin.get, "-3", "-f", "-q", raw.toString,
      "-o", dir.resolve("cli.zst").toString).inheritIO().start()
    assert(p2.waitFor() == 0, "zstd binary failed to compress")
    val cli = Files.readAllBytes(dir.resolve("cli.zst"))
    assert(ZstdBytes.isZstd(cli))
    assert(ZstdBytes.decompress(cli, 1L << 26).sameElements(payload))
  }

  test("declared-size bomb guard fails loudly before allocating") {
    val bomb = ZstdBytes.compress(new Array[Byte](1 << 20), 3) // 1 MiB of zeros
    val e = intercept[IllegalArgumentException] {
      ZstdBytes.decompress(bomb, 1024)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("a frame declaring > Int.MaxValue fails loudly even under a huge cap") {
    // hand-craft a header: magic + descriptor 0xE0 (single-segment,
    // 8-byte FCS) + FCS = 2^32 little-endian. The guard must trip on
    // the declared size BEFORE any Int allocation can wrap negative.
    val hdr = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0xe0.toByte, 0, 0, 0, 0, 1, 0, 0, 0)
    assert(com.github.luben.zstd.Zstd.getFrameContentSize(hdr) == (1L << 32))
    val e = intercept[IllegalArgumentException] {
      ZstdBytes.decompress(hdr, Long.MaxValue)
    }
    assert(e.getMessage.contains("array limit"))
  }

  test("non-binary input fails at analysis, not with a ClassCastException") {
    val df = Seq("x").toDF("text")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ZstdCompress(col("text"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ZstdDecompress(col("text"))).collect()
    }
  }

  test("NULL literals evaluate to NULL instead of failing analysis") {
    // NullType must pass checkInputDataTypes: a bare NULL reaches the
    // nullSafeEval short-circuit and yields NULL
    val r = Seq(1).toDF("i")
      .select(ZstdCompress(lit(null)).as("c"), ZstdDecompress(lit(null)).as("d"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("streaming frames (no recorded content size) inflate under the cap and trip it") {
    // ZstdOutputStream emits a frame without a content-size header:
    // exercises the incremental path
    val payload = ("streaming " * 5000).getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 3)
    zos.write(payload); zos.close()
    val frame = bos.toByteArray
    assert(com.github.luben.zstd.Zstd.getFrameContentSize(frame) < 0,
      "fixture must be a streaming frame")
    assert(ZstdBytes.decompress(frame, 1L << 26).sameElements(payload))
    val e = intercept[IllegalArgumentException] {
      ZstdBytes.decompress(frame, 1024)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("non-zstd and corrupt frames fail loudly, never silently truncate") {
    intercept[IllegalArgumentException] {
      ZstdBytes.decompress("not a frame".getBytes(UTF_8), 1L << 20)
    }
    val good = ZstdBytes.compress(("abc" * 1000).getBytes(UTF_8), 3)
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    intercept[Exception] { ZstdBytes.decompress(corrupt, 1L << 20) }
    val truncated = good.take(good.length / 2)
    intercept[Exception] { ZstdBytes.decompress(truncated, 1L << 20) }
  }

  test("decodeAuto sniffs zstd and reports decompressed stats") {
    import graft.operators.Multimodal
    val payload = Array.tabulate(1000)(i => (i % 251).toByte)
    val blob = ZstdBytes.compress(payload, 3)
    val row = Multimodal.decodeAuto(Seq((1L, blob)).toDF("media_id", "content"))
      .filter(col("modality") === "application/zstd")
      .collect()
    assert(row.length == 1)
    assert(row(0).n_units == 1000L)
  }
}
