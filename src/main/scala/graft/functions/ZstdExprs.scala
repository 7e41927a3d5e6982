package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, NullType}

/** Zstandard (de)compression columns over zstd-jni — the codec Spark
  * itself ships for shuffle/parquet (on every executor classpath, no
  * new dependency). The ingestion seam for `.jsonl.zst` /
  * `.warc.zst`-shaped crawl drops (the reference's gzip-downloader
  * converters, gobblin-core/.../converter/csv/... and
  * UnGzipConverter, generalized to the codec modern dumps actually
  * use).
  *
  * Decompression is executor-local, streaming, and bomb-guarded: a
  * frame that inflates past `maxBytes` fails loudly with the media id
  * rather than OOMing the executor (the same loud-failure contract as
  * the container codecs).
  */
object ZstdBytes {

  /** Compress with the frame content size recorded in the header
    * (zstd-jni default), so decompression can allocate exactly.
    */
  def compress(bytes: Array[Byte], level: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes, level)

  def decompress(bytes: Array[Byte], maxBytes: Long): Array[Byte] = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
      (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd,
      s"not a zstd frame (${bytes.length} bytes)")
    val declared = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
    // the one-shot path needs an Int allocation; a frame declaring
    // > Int.MaxValue must not wrap negative even under a raised cap
    if (declared >= 0 && declared <= Int.MaxValue) {
      require(declared <= maxBytes,
        s"zstd frame declares $declared bytes > cap $maxBytes")
      com.github.luben.zstd.Zstd.decompress(bytes, declared.toInt)
    } else if (declared > Int.MaxValue) {
      throw new IllegalArgumentException(
        s"zstd frame declares $declared bytes > JVM array limit " +
          s"${Int.MaxValue} (cap $maxBytes)")
    } else {
      // streaming frame without a recorded content size: inflate
      // incrementally under the cap
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        require(out.size() <= maxBytes,
          s"zstd frame inflates past cap $maxBytes")
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    }
  }

  /** True iff the payload leads with the zstd frame magic. */
  def isZstd(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
      (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd
}

/** zstd_compress(binary[, level]) — BinaryType -> BinaryType. */
case class ZstdCompress(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zstd_compress"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType passes: a bare NULL literal evaluates to NULL via the
    // nullSafeEval short-circuit, matching pre-check behavior
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY input, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    ZstdBytes.compress(input.asInstanceOf[Array[Byte]], level)
  override protected def withNewChildInternal(newChild: Expression): ZstdCompress =
    copy(child = newChild)
}

object ZstdCompress {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, level: Int = 3): Column =
    ColumnShim.toColumn(ZstdCompress(ColumnShim.toExpression(c), level))
}

/** zstd_decompress(binary) — loud on corrupt frames, bomb-guarded. */
case class ZstdDecompress(child: Expression, maxBytes: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zstd_decompress"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType passes: a bare NULL literal evaluates to NULL via the
    // nullSafeEval short-circuit, matching pre-check behavior
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY input, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    ZstdBytes.decompress(input.asInstanceOf[Array[Byte]], maxBytes)
  override protected def withNewChildInternal(newChild: Expression): ZstdDecompress =
    copy(child = newChild)
}

object ZstdDecompress {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, maxBytes: Long = 512L * 1024 * 1024): Column =
    ColumnShim.toColumn(ZstdDecompress(ColumnShim.toExpression(c), maxBytes))
}
