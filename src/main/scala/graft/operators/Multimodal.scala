package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * The decode step is a STUB — real image/audio codecs are not in this
  * container. `FakeDecoder` is a deterministic stand-in computing
  * structural features of the bytes; swap [[Decoder]] implementations
  * for a real codec. Everything around it — schema, batch shape,
  * partition sizing, null handling — is real and tested.
  *
  * Scale: `decodeFeatures` is a mapPartitions pipeline (the reference's
  * AsyncConverter1to1 shape, AsyncHttpJoinConverter.java:64): rows
  * stream through with zero driver involvement; `repartitionForBytes`
  * sizes partitions so a batch of decoded media fits executor memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      byte_mean: Double, head_hex: String)

  /** Pluggable decode/feature step. Implementations must be
    * deterministic per byte content (retries at scale replay rows).
    */
  trait Decoder extends Serializable {
    def features(id: Long, modality: String, content: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real codec: length + mean byte +
    * first-4-bytes hex ("magic number" — what a real decoder sniffs).
    */
  object FakeDecoder extends Decoder {
    def features(id: Long, modality: String, content: Array[Byte]): MediaFeatures = {
      val n = content.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (content(i) & 0xff); i += 1 }
      val head = content.take(4).map(b => f"${b & 0xff}%02X").mkString
      MediaFeatures(id, modality, n.toLong, if (n == 0) 0.0 else sum.toDouble / n, head)
    }
  }

  /** Binary rows → features via mapPartitions: the plumbing a real
    * decode (JNI codec, ONNX session) plugs into — one decoder instance
    * per partition, rows streamed.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, m, c) =>
          decoder.features(id, m, if (c == null) Array.emptyByteArray else c)
        }
      }
  }

  final case class FrameSample(
      media_id: Long, n_frames: Long, n_sampled: Long,
      sampled_bytes: Long, frames: Array[Array[Byte]])

  /** Frame-sampling plumbing: split the binary payload into fixed-size
    * frames (a real video decoder yields decoded frames here — the
    * framing/striding/batching code is what this exercises), keep
    * every `everyN`-th frame starting at frame 0. Streams rows per
    * partition; frames for one record stay together (a decode batch).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): Dataset[FrameSample] = {
    require(frameBytes > 0 && everyN > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          val bytes = if (content == null) Array.emptyByteArray else content
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          val sampled = (0 until nFrames by everyN).map { f =>
            java.util.Arrays.copyOfRange(bytes, f * frameBytes,
              math.min((f + 1) * frameBytes, bytes.length))
          }.toArray
          FrameSample(id, nFrames.toLong, sampled.length.toLong,
            sampled.map(_.length.toLong).sum, sampled)
        }
      }
  }

  /** Size partitions for decode: target bytes per partition so decoded
    * batches fit executor memory (decoded media is 10-100x the stored
    * bytes). Uses a cheap aggregate of stored sizes, never collect().
    */
  def repartitionForBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = media.agg(sum(coalesce(length(col("content")), lit(0))))
      .head().getAs[Any](0) match {
        case null => 0L
        case l: Long => l
        case d: java.math.BigDecimal => d.longValue
        case o => o.toString.toDouble.toLong
      }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
    media.repartition(parts)
  }
}
