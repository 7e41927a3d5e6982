package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * Every common modality decodes for REAL in pure JVM: RIFF/WAVE PCM16
  * audio, uncompressed 24-bpp BMP, baseline JPEG ([[JpegCodec]]),
  * MJPEG-in-AVI video frames ([[AviCodec]]/[[MjpegVideo]]), plus ISO
  * BMFF (MP4) container probing. `FakeDecoder` survives only as the
  * deterministic byte-stats fallback for UNKNOWN payloads (and as the
  * pluggable [[Decoder]] seam a JNI/ONNX codec would fill). Schema,
  * batch shape, partition sizing, and null handling are shared by all
  * of them.
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

  /** Frame-sampling plumbing over OPAQUE payloads: split the binary
    * into fixed-size byte frames, keep every `everyN`-th starting at
    * frame 0 — the striding/batching shape for codecs this build can't
    * decode. For MJPEG-in-AVI the REAL frame decoder is
    * [[MjpegVideo.decodeFrames]]. Streams rows per partition; frames
    * for one record stay together (a decode batch).
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

  // --- a REAL decoder: RIFF/WAVE PCM ---------------------------------
  // Audio needs no external codec for the PCM case — the container is
  // a chunk walk and the samples are little-endian shorts. The image
  // and video legs are equally real: BmpCodec below, JpegCodec and
  // AviCodec/MjpegVideo in their own files.

  final case class WavFeatures(
      media_id: Long, sample_rate: Int, n_channels: Int, bits: Int,
      n_samples: Long, duration_us: Long, mean_abs_amp: Double)

  object WavCodec {

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private[Multimodal] final case class WavMeta(
        rate: Int, channels: Int, bits: Int, dataOff: Int, nSamples: Long)

    /** Header-only chunk walk + validation (any chunk order, unknown
      * chunks skipped, word-aligned sizes) — the shared metadata step
      * so [[resample]] does not pay [[parse]]'s full sample scan. Like
      * parse always did, the LAST fmt/data chunk wins.
      */
    private[Multimodal] def meta(id: Long, bytes: Array[Byte]): WavMeta = {
      require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
        s"media $id: not a RIFF/WAVE container")
      var off = 12
      var rate = -1; var channels = -1; var bits = -1; var blockAlign = -1
      var dataOff = -1; var dataLen = -1L
      while (off + 8 <= bytes.length) {
        val ct = tag(bytes, off)
        val cl = u32(bytes, off + 4)
        // a 32-bit size must fit in the remaining buffer, else the walk
        // would advance by <= 0 (cl.toInt wraps negative) and never end
        require(cl <= (bytes.length - off - 8).toLong,
          s"media $id: chunk '$ct' size $cl overruns buffer at offset $off")
        if (ct == "fmt ") {
          require(cl >= 16, s"media $id: fmt chunk too short ($cl bytes)")
          require(u16(bytes, off + 8) == 1, s"media $id: not PCM (fmt != 1)")
          channels = u16(bytes, off + 10)
          rate = u32(bytes, off + 12).toInt
          blockAlign = u16(bytes, off + 20)
          bits = u16(bytes, off + 22)
        } else if (ct == "data") {
          dataOff = off + 8
          dataLen = cl
        }
        off += 8 + cl.toInt + (cl.toInt & 1) // word-aligned; always >= 8 forward
      }
      require(rate > 0 && dataOff >= 0, s"media $id: missing fmt/data chunk")
      require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
        s"media $id: unsupported PCM depth $bits")
      require(channels > 0 && blockAlign == channels * (bits / 8),
        s"media $id: blockAlign $blockAlign inconsistent with $channels ch x $bits-bit")
      WavMeta(rate, channels, bits, dataOff, dataLen / blockAlign)
    }

    /** Sample `i` (interleaved index) as a SIGNED amplitude at the
      * stored depth: 8-bit WAV is unsigned-centered (v - 128), wider
      * depths are little-endian two's complement — the RIFF spec's
      * convention per depth.
      */
    private[Multimodal] def sampleAt(bytes: Array[Byte], m: WavMeta, i: Int): Int = {
      val w = m.bits / 8
      val o = m.dataOff + i * w
      m.bits match {
        case 8 => (bytes(o) & 0xff) - 128
        case 16 => (u16(bytes, o) << 16) >> 16
        case 24 => (((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16)) << 8) >> 8
        case _ => (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      }
    }

    /** Parse a PCM WAV: [[meta]] + per-sample mean |amplitude| over
      * little-endian PCM at any supported depth (8/16/24/32).
      */
    def parse(id: Long, bytes: Array[Byte]): WavFeatures = {
      val m = meta(id, bytes)
      var sum = 0L
      var i = 0
      val frames = m.nSamples.toInt * m.channels
      while (i < frames) {
        sum += math.abs(sampleAt(bytes, m, i).toLong)
        i += 1
      }
      WavFeatures(id, m.rate, m.channels, m.bits, m.nSamples,
        m.nSamples * 1000000L / m.rate,
        if (frames == 0) 0.0 else sum.toDouble / frames)
    }

    /** Synthesize a canonical 44-byte-header mono PCM16 WAV — the test/
      * gate fixture generator (and the documented shape [[parse]]
      * understands). Sample values come from the caller.
      */
    def synthesize(sampleRate: Int, samples: Array[Short]): Array[Byte] =
      synthesizeInterleaved(sampleRate, 1, samples)

    /** Nearest-neighbor sample-rate conversion over PCM16 — the audio
      * RESAMPLE op, mirror of the image resize: output frame j copies
      * source frame floor(j·srcRate/outRate), all channels together
      * (stereo stays phase-aligned); the result is a real WAV via
      * [[synthesize]] (mono) or an interleaved re-encode. Reads
      * through [[meta]], so the bytes resampled are exactly the data
      * chunk parse reports on (last-chunk-wins), with no second
      * feature scan. Integer index arithmetic only, so oracles replay
      * the resampled stats from the generator formula.
      */
    def resample(id: Long, bytes: Array[Byte], outRate: Int): Array[Byte] = {
      require(outRate > 0, s"media $id: bad target rate $outRate")
      val m = meta(id, bytes)
      val outN = (m.nSamples * outRate / m.rate).toInt
      // depth-generic: [[sampleAt]] decodes any supported PCM width
      // and [[synthesizeDepth]] re-encodes at the SAME width, so
      // 8/24/32-bit archival audio resamples without a depth cast
      val out = Array.tabulate[Int](outN * m.channels) { k =>
        val j = k / m.channels // output frame
        val c = k % m.channels
        val sj = (j.toLong * m.rate / outRate).toInt
        sampleAt(bytes, m, sj * m.channels + c)
      }
      synthesizeDepth(outRate, m.channels, m.bits, out)
    }

    /** Multi-channel variant of [[synthesize]]: interleaved PCM16
      * frames, canonical 44-byte header.
      */
    def synthesizeInterleaved(sampleRate: Int, channels: Int,
        interleaved: Array[Short]): Array[Byte] = {
      require(channels >= 1 && interleaved.length % channels == 0,
        s"interleaved length ${interleaved.length} not a multiple of $channels")
      val dataSize = interleaved.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      interleaved.foreach(buf.putShort)
      buf.array()
    }

    /** Depth-generic synthesis: interleaved SIGNED amplitudes stored
      * at `bits` (8-bit written unsigned-centered, wider depths
      * little-endian two's complement — [[sampleAt]]'s inverse).
      */
    def synthesizeDepth(sampleRate: Int, channels: Int, bits: Int,
        interleaved: Array[Int]): Array[Byte] = {
      require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
        s"unsupported PCM depth $bits")
      require(channels >= 1 && interleaved.length % channels == 0,
        s"interleaved length ${interleaved.length} not a multiple of $channels")
      val w = bits / 8
      val dataSize = interleaved.length * w
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * w)
        .putShort((channels * w).toShort).putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      interleaved.foreach { v =>
        bits match {
          case 8 => buf.put((v + 128).toByte)
          case 16 => buf.putShort(v.toShort)
          case 24 =>
            buf.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
              .put(((v >> 16) & 0xff).toByte)
          case _ => buf.putInt(v)
        }
      }
      buf.array()
    }

    /** Strip leading/trailing silence — the ASR-prep trim: a frame is
      * silent when EVERY channel's |amplitude| is <= `threshold`; the
      * kept range runs from the first to the last non-silent frame
      * (inclusive). All-silent input yields a zero-frame WAV. Exact
      * integer cuts, so oracles replay them from the sample formula.
      * Works at every supported depth.
      */
    def trimSilence(id: Long, bytes: Array[Byte],
        threshold: Int): Array[Byte] = {
      require(threshold >= 0, s"media $id: negative threshold")
      val m = meta(id, bytes)
      val nF = m.nSamples.toInt
      def loud(frame: Int): Boolean = {
        var c = 0
        while (c < m.channels) {
          if (math.abs(sampleAt(bytes, m, frame * m.channels + c).toLong)
            > threshold) return true
          c += 1
        }
        false
      }
      var first = 0
      while (first < nF && !loud(first)) first += 1
      var last = nF - 1
      while (last >= first && !loud(last)) last -= 1
      val kept = math.max(0, last - first + 1)
      val out = Array.tabulate(kept * m.channels)(k =>
        sampleAt(bytes, m, (first + k / m.channels) * m.channels
          + k % m.channels))
      synthesizeDepth(m.rate, m.channels, m.bits, out)
    }

    /** Fixed-window segmentation — the ASR-prep chunker: frames split
      * into windows of `windowFrames` (the last window may be short;
      * empty windows never emitted), each window re-encoded as its
      * own WAV. Returns (window index, window WAV bytes).
      */
    def segment(id: Long, bytes: Array[Byte],
        windowFrames: Int): Seq[(Int, Array[Byte])] = {
      require(windowFrames > 0, s"media $id: bad window $windowFrames")
      val m = meta(id, bytes)
      val nF = m.nSamples.toInt
      val nW = (nF + windowFrames - 1) / windowFrames
      (0 until nW).map { w =>
        val from = w * windowFrames
        val until = math.min(nF, from + windowFrames)
        val out = Array.tabulate((until - from) * m.channels)(k =>
          sampleAt(bytes, m, (from + k / m.channels) * m.channels
            + k % m.channels))
        (w, synthesizeDepth(m.rate, m.channels, m.bits, out))
      }
    }
  }

  /** Resample every row's audio to `outRate` and report the RESAMPLED
    * features (full convert→re-encode→re-parse cycle per row).
    */
  def resampleWav(media: DataFrame, outRate: Int): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        require(c != null, s"media $id: null content")
        WavCodec.parse(id, WavCodec.resample(id, c, outRate))
      })
  }

  /** (media_id, content) rows → parsed WAV features, streamed per
    * partition like [[decodeFeatures]].
    */
  def decodeWav(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => WavCodec.parse(id, c) })
  }

  // --- and a REAL image decoder: uncompressed 24-bpp BMP -------------

  final case class BmpFeatures(
      media_id: Long, width: Int, height: Int, bpp: Int,
      n_pixels: Long, mean_intensity: Double)

  object BmpCodec {

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private[Multimodal] final case class BmpMeta(
        dataOff: Int, width: Int, height: Int, rawHeight: Int, stride: Int)

    /** Header-only validation (shared by [[parse]] and the resize
      * path, which must not pay parse's full pixel scan).
      */
    private[Multimodal] def meta(id: Long, bytes: Array[Byte]): BmpMeta = {
      require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        s"media $id: not a BMP")
      val dataOff = u32(bytes, 10).toInt
      val width = u32(bytes, 18).toInt
      val rawHeight = u32(bytes, 22).toInt
      // negative height = top-down row order; intensity stats are
      // row-order independent, so only the magnitude matters to parse
      val height = math.abs(rawHeight)
      val bpp = u16(bytes, 28)
      require(bpp == 24 && u32(bytes, 30) == 0,
        s"media $id: only uncompressed 24-bpp BMP supported")
      require(width > 0 && height > 0, s"media $id: bad BMP dims ${width}x$rawHeight")
      val stride = ((width * 3 + 3) / 4) * 4
      require(dataOff >= 54 && dataOff.toLong + height.toLong * stride <= bytes.length,
        s"media $id: BMP pixel data (${height}x$stride at $dataOff) overruns ${bytes.length} bytes")
      BmpMeta(dataOff, width, height, rawHeight, stride)
    }

    /** Parse an uncompressed BI_RGB 24-bpp BMP: BITMAPFILEHEADER +
      * BITMAPINFOHEADER, bottom-up pixel rows padded to 4-byte stride;
      * mean intensity over all channel bytes (padding excluded).
      */
    def parse(id: Long, bytes: Array[Byte]): BmpFeatures = {
      val m = meta(id, bytes)
      val dataOff = m.dataOff
      val width = m.width
      val height = m.height
      val stride = m.stride
      val bpp = 24
      var sum = 0L
      var y = 0
      while (y < height) {
        val rowOff = dataOff + y * stride
        var i = 0
        while (i < width * 3) { sum += (bytes(rowOff + i) & 0xff); i += 1 }
        y += 1
      }
      val nChan = width.toLong * height * 3
      BmpFeatures(id, width, height, bpp, width.toLong * height,
        if (nChan == 0) 0.0 else sum.toDouble / nChan)
    }

    /** Synthesize an uncompressed 24-bpp BMP. `channelAt(i)` supplies
      * the byte for linear channel index i, linearized bottom-up in
      * file order (row y=0 is the BOTTOM row, channel fastest) — the
      * same order [[parse]] sums, so oracles replay means directly.
      */
    def synthesize(width: Int, height: Int, channelAt: Int => Int): Array[Byte] = {
      val stride = ((width * 3 + 3) / 4) * 4
      val dataSize = stride * height
      val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putShort(0).putShort(0).putInt(54)
        .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      var i = 0
      while (y < height) {
        var x = 0
        while (x < width * 3) { buf.put((channelAt(i) & 0xff).toByte); x += 1; i += 1 }
        var p = width * 3
        while (p < stride) { buf.put(0.toByte); p += 1 }
        y += 1
      }
      buf.array()
    }

    /** Channel byte at linear channel index k of the DECODED image
      * (pixel-major, channel-fastest, bottom-up row order — the same
      * linearization [[synthesize]] writes), skipping row padding.
      */
    private[Multimodal] def srcChannel(bytes: Array[Byte], m: BmpMeta, k: Int): Int = {
      val pix = k / 3
      bytes(m.dataOff + (pix / m.width) * m.stride +
        (pix % m.width) * 3 + k % 3) & 0xff
    }
  }

  final case class ResizedBmp(
      media_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_intensity: Double, content: Array[Byte])

  /** Nearest-neighbor BMP resize — the multimodal RESIZE op: decode
    * the 24-bpp pixels, resample `(ox, oy) → (ox·srcW/outW,
    * oy·srcH/outH)` (integer floor), re-encode a REAL BMP via
    * [[BmpCodec.synthesize]], and report the resized image's features
    * by re-parsing it. Pure integer index arithmetic, so an oracle
    * replays the resampled mean analytically from the source
    * generator formula. Executor-side `mapPartitions` over binary
    * rows (the honest seam all codecs use). Bottom-up row order
    * assumed (synthesized and common-case BMPs).
    */
  def resizeBmp(media: DataFrame, outW: Int, outH: Int): Dataset[ResizedBmp] = {
    require(outW > 0 && outH > 0, s"bad resize target ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        require(bytes != null, s"media $id: null content")
        val m = BmpCodec.meta(id, bytes) // header-only, no pixel scan
        // parse tolerates top-down (negative height) because intensity
        // is row-order independent — resize is NOT: reject instead of
        // silently flipping/sampling the wrong rows
        require(m.rawHeight > 0,
          s"media $id: resize supports bottom-up BMPs only (height ${m.rawHeight})")
        val out = BmpCodec.synthesize(outW, outH, { j =>
          val pix = j / 3
          val sx = (pix % outW) * m.width / outW
          val sy = (pix / outW) * m.height / outH
          BmpCodec.srcChannel(bytes, m, (sy * m.width + sx) * 3 + j % 3)
        })
        val re = BmpCodec.parse(id, out) // round-trip through the codec
        ResizedBmp(id, re.width, re.height, re.n_pixels, re.mean_intensity, out)
      })
  }

  final case class MediaHash(media_id: Long, ahash: Long)

  /** Perceptual average-hash (aHash) over REAL decoded 24-bpp pixels:
    * nearest-neighbor sample to an 8x8 grid (the same integer floor
    * sampling as [[resizeBmp]]), per-sample luma = the SUM of the 3
    * channel bytes (division-free), bit j set iff
    * `64 * luma(j) > sum(lumas)` — i.e. the sample is brighter than
    * the image mean, compared in exact integers so an oracle replays
    * the hash bit-for-bit from a generator formula.
    *
    * Near-identical images (crops of padding, re-encodes, small
    * overlays) land within a few bits; pair them with
    * [[graft.functions.Similarity.hammingPairs64]] — image near-dup
    * becomes the same banded-shuffle shape as text simhash, no
    * pairwise pixel compare anywhere.
    */
  def aHashBmp(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        require(bytes != null, s"media $id: null content")
        val m = BmpCodec.meta(id, bytes)
        require(m.rawHeight > 0,
          s"media $id: aHash supports bottom-up BMPs only (height ${m.rawHeight})")
        val lumas = new Array[Long](64)
        var j = 0
        while (j < 64) {
          val sx = (j % 8) * m.width / 8
          val sy = (j / 8) * m.height / 8
          val base = (sy.toLong * m.width + sx).toInt * 3
          lumas(j) = BmpCodec.srcChannel(bytes, m, base) +
            BmpCodec.srcChannel(bytes, m, base + 1) +
            BmpCodec.srcChannel(bytes, m, base + 2)
          j += 1
        }
        val total = lumas.sum
        var hash = 0L
        j = 0
        while (j < 64) {
          if (64L * lumas(j) > total) hash |= (1L << j)
          j += 1
        }
        MediaHash(id, hash)
      })
  }

  final case class MediaPHash(media_id: Long, phash: Long)

  /** DCT perceptual hash (pHash) over REAL decoded 24-bpp pixels:
    * exact 2x2-or-larger box SUMS of r+g+b bytes down to a 32x32 gray
    * grid (division-free; rows in the decoded bottom-up order, the
    * same linearization [[aHashBmp]] samples), then
    * [[graft.functions.PerceptualHash.phash64Gray32]] — the quantized
    * integer DCT whose cosine table the oracle SQL shares verbatim.
    * Frequency-domain bits survive uniform re-grades that flip aHash
    * bits; near-dup pairs ride the same
    * [[graft.functions.Similarity.hammingPairs64]] banded shuffle.
    */
  def phashBmp(media: DataFrame): Dataset[MediaPHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        require(bytes != null, s"media $id: null content")
        val m = BmpCodec.meta(id, bytes)
        require(m.rawHeight > 0,
          s"media $id: pHash supports bottom-up BMPs only (height ${m.rawHeight})")
        require(m.width % 32 == 0 && m.height % 32 == 0,
          s"media $id: pHash needs dims divisible by 32, got ${m.width}x${m.height}")
        val bw = m.width / 32
        val bh = m.height / 32
        val g = new Array[Long](1024)
        var cy = 0
        while (cy < 32) {
          var cx = 0
          while (cx < 32) {
            var acc = 0L
            var py = cy * bh
            while (py < (cy + 1) * bh) {
              var px = cx * bw
              while (px < (cx + 1) * bw) {
                val base = (py * m.width + px) * 3
                acc += BmpCodec.srcChannel(bytes, m, base) +
                  BmpCodec.srcChannel(bytes, m, base + 1) +
                  BmpCodec.srcChannel(bytes, m, base + 2)
                px += 1
              }
              py += 1
            }
            g(cy * 32 + cx) = acc
            cx += 1
          }
          cy += 1
        }
        MediaPHash(id, graft.functions.PerceptualHash.phash64Gray32(g))
      })
  }

  /** 64-bit energy-delta audio fingerprint (Haitsma–Kalker style,
    * simplified to exact integers) over REAL decoded PCM16: the
    * linear sample stream (channels interleaved) splits into 65 equal
    * windows (boundaries `w * n / 65`, integer floor), window energy
    * = sum of |s16|, bit j set iff `energy(j+1) > energy(j)`.
    * Division-free, so an oracle replays the hash exactly; robust to
    * level-preserving edits (re-containering, short overlays) the way
    * aHash is for images. Pair with
    * [[graft.functions.Similarity.hammingPairs64]] — audio near-dup
    * becomes the same banded shuffle as text simhash and image aHash.
    */
  def fingerprintWav(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        require(bytes != null, s"media $id: null content")
        MediaHash(id, fingerprintWavBytes(id, bytes))
      })
  }

  /** The windowed energy hash over an abstract sample accessor —
    * shared by the WAV byte-walk and the FLAC decoded-PCM path so one
    * logical recording fingerprints identically from either container.
    * `windows` energy buckets yield a (windows-1)-bit hash (default
    * 65 → 64 bits); `minSamples` rejects clips too short for the
    * windows to carry signal (production fingerprints over real clips
    * should demand many samples per window, e.g. minSamples =
    * windows * 256 — toy gate clips use the floor).
    */
  private def energyFingerprint(id: Long, n: Int, sampleAt: Int => Int,
      windows: Int = 65, minSamples: Int = 0): Long = {
    require(windows >= 2 && windows <= 65,
      s"media $id: windows must be in [2,65], got $windows")
    require(n >= math.max(windows, minSamples),
      s"media $id: need >= ${math.max(windows, minSamples)} samples " +
        s"for a ${windows - 1}-bit fingerprint, got $n")
    val energy = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      // boundary products in Long: w * n overflows Int past ~33M
      // samples (a few minutes of 44.1kHz stereo)
      val hi = ((w + 1).toLong * n / windows).toInt
      var t = (w.toLong * n / windows).toInt
      var e = 0L
      while (t < hi) { e += math.abs(sampleAt(t)); t += 1 }
      energy(w) = e
      w += 1
    }
    var hash = 0L
    var j = 0
    while (j < windows - 1) {
      if (energy(j + 1) > energy(j)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Normalize a sample stored at `bits` to the 16-bit domain by
    * arithmetic shift — deterministic and oracle-replayable, so the
    * same recording fingerprints identically from a 24-bit FLAC (the
    * common archival depth), a 16-bit WAV, or an 8-bit legacy WAV.
    * (The energy hash compares window sums pairwise, so the uniform
    * scale cancels — the shift exists to pin ONE documented domain.)
    */
  private def norm16(v: Int, bits: Int): Int =
    if (bits >= 16) v >> (bits - 16) else v << (16 - bits)

  private def fingerprintWavBytes(id: Long, bytes: Array[Byte],
      windows: Int = 65, minSamples: Int = 0): Long = {
    val m = WavCodec.meta(id, bytes)
    val n = (m.nSamples * m.channels).toInt
    energyFingerprint(id, n,
      t => norm16(WavCodec.sampleAt(bytes, m, t), m.bits),
      windows, minSamples)
  }

  /** Audio fingerprint with container dispatch: WAV PCM (any
    * supported depth — 8-bit legacy through 32-bit) walks the bytes
    * directly; FLAC goes through the REAL frame decoder
    * ([[FlacAudio.decode]], CRC+MD5-verified). Samples are
    * depth-normalized to the 16-bit domain ([[norm16]]) before the
    * energy windows, so the same recording hashes identically from a
    * 16-bit WAV, a 24-bit archival FLAC, or an 8-bit legacy WAV, and
    * near-dup works on real mixed-depth corpora. `windows`/
    * `minSamples` parameterize the hash for production clip lengths
    * (defaults keep the 65-window/64-bit shape).
    */
  def fingerprintAudio(media: DataFrame, windows: Int = 65,
      minSamples: Int = 0): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        require(bytes != null, s"media $id: null content")
        val hash = sniffModality(bytes) match {
          case "audio/wav" => fingerprintWavBytes(id, bytes, windows, minSamples)
          case "audio/flac" =>
            val pcm = FlacAudio.decode(id, bytes)
            energyFingerprint(id, pcm.samples.length,
              t => norm16(pcm.samples(t), pcm.bps), windows, minSamples)
          case other => throw new IllegalArgumentException(
            s"media $id: no audio fingerprint for modality $other")
        }
        MediaHash(id, hash)
      })
  }

  /** (media_id, content) rows → parsed BMP features. */
  def decodeBmp(media: DataFrame): Dataset[BmpFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => BmpCodec.parse(id, c) })
  }

  // --- REAL PNG decode ([[PngCodec]]): features + aHash over the
  // alpha-stripped decoded pixels --------------------------------------

  final case class PngFeatures(
      media_id: Long, width: Int, height: Int, bit_depth: Int,
      color_type: Int, channels: Int, n_pixels: Long, mean_intensity: Double)

  /** (media_id, content) PNG rows → decoded features: dims, stored
    * depth/color-type, and mean intensity over the NON-ALPHA channel
    * bytes of the decoded 8-bit samples (gray contributes its single
    * channel; palette is expanded first). Per-partition decode,
    * nothing on the driver.
    */
  def decodePng(media: DataFrame): Dataset[PngFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        require(c != null, s"media $id: null content")
        val img = PngCodec.decode(id, c)
        val keep = if (img.channels == 2 || img.channels == 4)
          img.channels - 1 else img.channels
        var sum = 0L
        var p = 0
        val nPix = img.width * img.height
        while (p < nPix) {
          var ch = 0
          while (ch < keep) {
            sum += (img.pixels(p * img.channels + ch) & 0xff)
            ch += 1
          }
          p += 1
        }
        val n = nPix.toLong * keep
        PngFeatures(id, img.width, img.height, img.bitDepth, img.colorType,
          img.channels, nPix.toLong, if (n == 0) 0.0 else sum.toDouble / n)
      })
  }

  /** PNG → 64-bit perceptual aHash (shared 8x8 nearest-sample / luma
    * construction, [[MjpegVideo.aHashDecoded]]); alpha is stripped
    * before hashing so an RGBA re-save of an RGB image hashes
    * identically.
    */
  def aHashPng(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        require(c != null, s"media $id: null content")
        MediaHash(id, MjpegVideo.aHashDecoded(
          PngCodec.toDecodedImage(PngCodec.decode(id, c))))
      })
  }

  // --- REAL GIF decode ([[GifCodec]]): composited frame features +
  // aHash per ANIMATION frame (GIF's distinguishing structure) --------

  final case class GifFrameRow(
      media_id: Long, frame_no: Int, n_frames: Int, width: Int, height: Int,
      delay_cs: Int, mean_intensity: Double, ahash: Long)

  /** (media_id, content) GIF rows → one row per (composited) frame:
    * LZW-decoded, disposal/transparency-composited RGB canvas stats
    * plus the shared 64-bit perceptual aHash — the same shape as
    * [[MjpegVideo.decodeFrames]], so animated-GIF near-dup rides the
    * identical banded-hamming path. Per-partition decode.
    */
  def decodeGifFrames(media: DataFrame): Dataset[GifFrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        require(c != null, s"media $id: null content")
        val img = GifCodec.decode(id, c)
        img.frames.iterator.map { f =>
          var sum = 0L
          var i = 0
          while (i < f.pixels.length) { sum += (f.pixels(i) & 0xff); i += 1 }
          GifFrameRow(id, f.index, img.nFrames, img.width, img.height,
            f.delayCs,
            if (f.pixels.length == 0) 0.0 else sum.toDouble / f.pixels.length,
            MjpegVideo.aHashDecoded(GifCodec.toDecodedImage(img, f.index)))
        }
      })
  }

  final case class ScrubbedMedia(media_id: Long, modality: String,
      had_gps: Boolean, content: Array[Byte])

  /** Privacy scrub before corpus publication: strip Exif/XMP metadata
    * (GPS coordinates, timestamps, device ids) from JPEG and WebP
    * payloads while keeping pixels byte-identical and display
    * orientation correct (a minimal orientation-only block is
    * re-spliced when needed). Other modalities pass through
    * unchanged. The compliance-tier counterpart of the reference's
    * record-purger (gobblin-modules/gobblin-compliance) for media
    * columns.
    */
  def scrubExifGps(media: DataFrame): Dataset[ScrubbedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        require(c != null, s"media $id: null content")
        sniffModality(c) match {
          case m @ "image/jpeg" =>
            ScrubbedMedia(id, m, JpegCodec.exifHasGps(id, c),
              JpegCodec.stripExif(id, c))
          case m @ ("image/webp" | "image/webp-lossy" | "image/webp-anim") =>
            ScrubbedMedia(id, m, WebpCodec.exifHasGps(id, c),
              WebpCodec.scrubExif(id, c))
          case m @ "image/png" =>
            ScrubbedMedia(id, m, PngCodec.exifHasGps(id, c),
              PngCodec.stripMetadata(id, c))
          case m @ "image/tiff" =>
            ScrubbedMedia(id, m, TiffScrub.hasGps(id, c),
              TiffScrub.scrub(id, c))
          case m =>
            ScrubbedMedia(id, m, had_gps = false, c)
        }
      })
  }

  final case class TiffPageRow(media_id: Long, page_no: Int, n_pages: Int,
      width: Int, height: Int, channels: Int, mean_intensity: Double,
      ahash: Long)

  /** Per-page rows of (possibly multi-page) TIFFs — the scanned-
    * document container shape (faxes and book scans are one TIFF,
    * many pages). Every page fully decoded (CCITT fax / LZW / Deflate
    * / PackBits, strips or tiles) on executors; per-page mean over
    * color channels (alpha dropped) and the shared 64-bit aHash.
    */
  def decodeTiffPages(media: DataFrame): Dataset[TiffPageRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        require(c != null, s"media $id: null content")
        val n = TiffCodec.nPages(id, c)
        (0 until n).iterator.map { p =>
          val img = TiffCodec.decodePage(id, c, p)
          val keep = if (img.channels == 4) 3 else img.channels
          var sum = 0L
          var px = 0
          val nPix = img.width * img.height
          while (px < nPix) {
            var ch = 0
            while (ch < keep) { sum += (img.pixels(px * img.channels + ch) & 0xff); ch += 1 }
            px += 1
          }
          val hashImg = if (img.channels != 4) img else {
            val out = new Array[Byte](nPix * 3)
            var q = 0
            while (q < nPix) {
              out(q * 3) = img.pixels(q * 4)
              out(q * 3 + 1) = img.pixels(q * 4 + 1)
              out(q * 3 + 2) = img.pixels(q * 4 + 2)
              q += 1
            }
            JpegCodec.DecodedImage(img.width, img.height, 3, out)
          }
          TiffPageRow(id, p, n, img.width, img.height, img.channels,
            if (nPix == 0) 0.0 else sum.toDouble / (nPix.toLong * keep),
            MjpegVideo.aHashDecoded(hashImg))
        }
      })
  }

  final case class WebpFrameRow(media_id: Long, frame_no: Int, n_frames: Int,
      width: Int, height: Int, duration_ms: Int, mean_intensity: Double,
      ahash: Long)

  /** Per-frame rows of animated lossless WebPs: every frame fully
    * composited (blend + dispose applied), per-frame RGB mean and the
    * shared 64-bit aHash — the [[decodeGifFrames]] contract for the
    * container modern image boards actually serve animations in.
    */
  def decodeWebpAnimFrames(media: DataFrame): Dataset[WebpFrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, c) =>
        require(c != null, s"media $id: null content")
        val anim = WebpCodec.decodeAnim(id, c)
        anim.frames.iterator.zipWithIndex.map { case (f, idx) =>
          val img = WebpCodec.frameToDecodedImage(anim, idx)
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
          WebpFrameRow(id, idx, anim.frames.length, anim.width, anim.height,
            f.durationMs,
            if (img.pixels.length == 0) 0.0
            else sum.toDouble / img.pixels.length,
            MjpegVideo.aHashDecoded(img))
        }
      })
  }

  // --- cross-format image hashing ------------------------------------

  final case class MediaFormatHash(media_id: Long, modality: String, ahash: Long)

  /** Sniff-and-hash ANY supported still image (BMP/PNG/GIF/JPEG):
    * every format decodes to the SAME top-down pixel layout before the
    * shared [[MjpegVideo.aHashDecoded]] construction, so one logical
    * image hashes IDENTICALLY regardless of container — the contract
    * cross-format dedup needs (a crawl stores the same picture as
    * .png, .gif and .jpg; byte-level dedup can't see it). BMP's
    * bottom-up rows are flipped here (unlike [[aHashBmp]], which
    * hashes in file order and therefore only matches other BMPs);
    * GIF hashes its first composited frame; luma = r+g+b is
    * channel-order independent, so BMP's BGR needs no reorder.
    * Unsupported payloads fail loudly — route mixed corpora through
    * [[sniffModality]] first if skipping is intended.
    */
  /** Sniff + decode ANY supported still format to the shared
    * top-down, alpha-stripped layout (BMP rows flipped, GIF = first
    * composited frame). The normalization every cross-format image
    * op builds on.
    */
  /** Apply an EXIF Orientation (TIFF tag 0x0112 value 1-8) to a
    * decoded image, producing the UPRIGHT pixels: 1 identity,
    * 2 mirror-H, 3 rotate-180, 4 mirror-V, 5 transpose,
    * 6 rotate-90-CW, 7 transverse, 8 rotate-90-CCW (5-8 swap dims).
    * The value names where the stored row 0 / column 0 sit in the
    * scene; this is the display transform that puts them back.
    */
  private[graft] def applyOrientation(img: JpegCodec.DecodedImage,
      o: Int): JpegCodec.DecodedImage = {
    if (o == 1) return img
    val w = img.width; val h = img.height; val ch = img.channels
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](img.pixels.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        // (sx, sy) = stored pixel shown at upright (x, y)
        val sx = o match {
          case 2 => w - 1 - x
          case 3 => w - 1 - x
          case 4 => x
          case 5 => y
          case 6 => y
          case 7 => w - 1 - y
          case _ => w - 1 - y // 8
        }
        val sy = o match {
          case 2 => y
          case 3 => h - 1 - y
          case 4 => h - 1 - y
          case 5 => x
          case 6 => h - 1 - x
          case 7 => h - 1 - x
          case _ => x // 8
        }
        var k = 0
        while (k < ch) {
          out((y * ow + x) * ch + k) = img.pixels((sy * w + sx) * ch + k)
          k += 1
        }
        x += 1
      }
      y += 1
    }
    JpegCodec.DecodedImage(ow, oh, ch, out)
  }

  private[operators] def decodeNormalized(id: Long,
      c: Array[Byte]): (String, JpegCodec.DecodedImage) = {
    require(c != null, s"media $id: null content")
    val m = sniffModality(c)
    val img = m match {
      case "image/bmp" =>
        val meta = BmpCodec.meta(id, c)
        require(meta.rawHeight > 0,
          s"media $id: cross-format decode supports bottom-up BMPs only")
        val out = new Array[Byte](meta.width * meta.height * 3)
        var y = 0
        while (y < meta.height) {
          val srcRow = meta.height - 1 - y // file rows are bottom-up
          var i = 0
          while (i < meta.width * 3) {
            out(y * meta.width * 3 + i) =
              c(meta.dataOff + srcRow * meta.stride + i)
            i += 1
          }
          y += 1
        }
        JpegCodec.DecodedImage(meta.width, meta.height, 3, out)
      case "image/png" => PngCodec.toDecodedImage(PngCodec.decode(id, c))
      case "image/gif" => GifCodec.toDecodedImage(GifCodec.decode(id, c))
      case "image/jpeg" =>
        // real web JPEGs carry EXIF Orientation 2-8; normalize to the
        // upright pixels here (the shared seam, same argument as the
        // BMP bottom-up flip) or a rotated duplicate defeats the hash
        applyOrientation(JpegCodec.decode(id, c),
          JpegCodec.exifOrientation(id, c))
      case "image/webp" | "image/webp-lossy" =>
        // WebP stills carry EXIF in a VP8X chunk — same normalization
        // contract as the JPEG APP1 path
        applyOrientation(WebpCodec.toDecodedImage(WebpCodec.decode(id, c)),
          WebpCodec.exifOrientation(id, c))
      case "image/webp-anim" => // first composited frame, like GIF
        WebpCodec.frameToDecodedImage(WebpCodec.decodeAnim(id, c), 0)
      case "image/tiff" =>
        // page 0, alpha stripped (PNG convention), upright per the
        // TIFF Orientation tag (same normalization contract as the
        // JPEG APP1 / WebP VP8X paths)
        val raw = TiffCodec.decode(id, c)
        val rgb = if (raw.channels != 4) raw else {
          val out = new Array[Byte](raw.width * raw.height * 3)
          var p = 0
          while (p < raw.width * raw.height) {
            out(p * 3) = raw.pixels(p * 4)
            out(p * 3 + 1) = raw.pixels(p * 4 + 1)
            out(p * 3 + 2) = raw.pixels(p * 4 + 2)
            p += 1
          }
          JpegCodec.DecodedImage(raw.width, raw.height, 3, out)
        }
        applyOrientation(rgb, TiffCodec.exifOrientation(id, c))
      case other => throw new IllegalArgumentException(
        s"media $id: cannot decode modality '$other' as a still image")
    }
    (m, img)
  }

  def aHashAuto(media: DataFrame): Dataset[MediaFormatHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        val (m, img) = decodeNormalized(id, c)
        MediaFormatHash(id, m, MjpegVideo.aHashDecoded(img))
      })
  }

  final case class ResizedImage(
      media_id: Long, src_modality: String, width: Int, height: Int,
      mean_intensity: Double, ahash: Long, content: Array[Byte])

  /** Cross-format nearest-neighbor resize — the vision-training prep
    * step (budget the pixel count before feature extraction): decode
    * ANY supported format to the normalized layout, resample
    * `(ox, oy) -> (ox*srcW/outW, oy*srcH/outH)` (integer floor, the
    * [[resizeBmp]] convention), re-encode as PNG (lossless, so the
    * emitted bytes are deterministic and loader-readable anywhere).
    * Reports the resized image's stats + aHash from the decoded
    * output (round-trips through [[PngCodec]]).
    */
  def resizeImage(media: DataFrame, outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, s"bad resize target ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        val (m, src) = decodeNormalized(id, c)
        val ch = src.channels
        val px = new Array[Byte](outW * outH * ch)
        var oy = 0
        while (oy < outH) {
          val sy = oy * src.height / outH
          var ox = 0
          while (ox < outW) {
            val sx = ox * src.width / outW
            var k = 0
            while (k < ch) {
              px((oy * outW + ox) * ch + k) =
                src.pixels((sy * src.width + sx) * ch + k)
              k += 1
            }
            ox += 1
          }
          oy += 1
        }
        val out = PngCodec.encode(outW, outH, ch, px)
        val re = PngCodec.toDecodedImage(PngCodec.decode(id, out))
        var sum = 0L
        var i = 0
        while (i < re.pixels.length) { sum += (re.pixels(i) & 0xff); i += 1 }
        ResizedImage(id, m, re.width, re.height,
          if (re.pixels.length == 0) 0.0 else sum.toDouble / re.pixels.length,
          MjpegVideo.aHashDecoded(re), out)
      })
  }

  final case class PdfTextRow(
      media_id: Long, n_pages: Long, n_chars: Long, text: String)

  /** PDF text extraction over a binary column — executor-local
    * [[PdfText.extract]] per payload (xref/ObjStm walk, filter chain,
    * content-stream interpret, font decode), pages joined with '\n'.
    * The crawl-curation seam for the PDF half of a web corpus: route
    * [[sniffModality]] == "application/pdf" payloads here, HTML
    * through Text.stripHtml, then share the downstream dedup/quality
    * chain. Loud id-tagged failures on structural corruption and
    * /Encrypt; unmapped glyphs surface as U+FFFD for quality scoring.
    */
  def extractPdfText(media: DataFrame): Dataset[PdfTextRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        val t = PdfText.extract(id, c)
        val txt = t.text
        PdfTextRow(id, t.nPages.toLong, txt.length.toLong, txt)
      })
  }

  // --- and REAL video-container probing: ISO BMFF (MP4) box walk -----
  // MP4 payload codecs (H.264 etc.) are beyond a pure-JVM build, but
  // the CONTAINER metadata — what a pipeline probes before deciding to
  // decode at all — is a pure big-endian box tree. Full frame decode
  // exists for MJPEG-in-AVI ([[MjpegVideo.decodeFrames]]).

  final case class Mp4Features(
      media_id: Long, brand: String, timescale: Long, duration_units: Long,
      duration_ms: Long, n_tracks: Int)

  object Mp4Codec {

    private def u32(b: Array[Byte], o: Int): Long = // big-endian (ISO BMFF)
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Probe an MP4: top-level box walk for ftyp/moov, moov child walk
      * for mvhd (version-0: 32-bit timescale/duration) and trak count.
      */
    def parse(id: Long, bytes: Array[Byte]): Mp4Features = {
      require(bytes.length >= 16 && tag(bytes, 4) == "ftyp",
        s"media $id: not an ISO BMFF container (no ftyp)")
      val brand = tag(bytes, 8)
      var off = 0
      var timescale = -1L; var duration = -1L; var tracks = 0
      while (off + 8 <= bytes.length) {
        val size = u32(bytes, off)
        val bt = tag(bytes, off + 4)
        // size must be >= 8 (forward progress) and fit the buffer
        // (else size.toInt can wrap negative and loop forever)
        require(size >= 8 && size <= (bytes.length - off).toLong,
          s"media $id: corrupt box '$bt' size $size at $off")
        if (bt == "moov") {
          var c = off + 8
          val end = (off + size).toInt
          while (c + 8 <= end) {
            val cs = u32(bytes, c)
            val ct = tag(bytes, c + 4)
            require(cs >= 8 && cs <= (end - c).toLong,
              s"media $id: corrupt moov child '$ct' size $cs at $c")
            if (ct == "mvhd") {
              require(cs >= 28, s"media $id: mvhd box too short ($cs bytes)")
              require(bytes(c + 8) == 0, s"media $id: only mvhd version 0 supported")
              timescale = u32(bytes, c + 20)
              duration = u32(bytes, c + 24)
            } else if (ct == "trak") tracks += 1
            c += cs.toInt
          }
        }
        off += size.toInt
      }
      require(timescale > 0, s"media $id: missing moov/mvhd")
      Mp4Features(id, brand, timescale, duration,
        duration * 1000L / timescale, tracks)
    }

    /** One track's metadata: id + duration from tkhd/mdhd, the
      * ISO-639-2 language packed in mdhd, handler type (vide/soun/
      * text/sbtl) from hdlr, and the first stsd sample-entry fourcc
      * (the codec a transcoding pipeline dispatches on).
      */
    final case class Mp4Track(trackId: Long, handler: String,
        codec: String, language: String, timescale: Long,
        durationMs: Long)

    /** Child boxes of `[start,end)` as (type, bodyStart, bodyEnd). */
    private def children(id: Long, b: Array[Byte], start: Int,
        end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var c = start
      while (c + 8 <= end) {
        val cs = u32(b, c)
        val ct = tag(b, c + 4)
        require(cs >= 8 && cs <= (end - c).toLong,
          s"media $id: corrupt box '$ct' size $cs at $c")
        out += ((ct, c + 8, c + cs.toInt))
        c += cs.toInt
      }
      out.result()
    }

    private def child(id: Long, b: Array[Byte], start: Int, end: Int,
        name: String): Option[(Int, Int)] =
      children(id, b, start, end).collectFirst {
        case (t, s, e) if t == name => (s, e)
      }

    /** Per-track metadata walk: moov/trak/(tkhd, mdia/(mdhd, hdlr,
      * minf/stbl/stsd)).
      */
    def tracks(id: Long, bytes: Array[Byte]): Seq[Mp4Track] = {
      require(bytes.length >= 16 && tag(bytes, 4) == "ftyp",
        s"media $id: not an ISO BMFF container (no ftyp)")
      val (moovS, moovE) = child(id, bytes, 0, bytes.length, "moov")
        .getOrElse(fail(id, "missing moov box"))
      children(id, bytes, moovS, moovE).collect {
        case ("trak", ts, te) =>
          val (tkS, _) = child(id, bytes, ts, te, "tkhd")
            .getOrElse(fail(id, "trak without tkhd"))
          require(bytes(tkS) == 0, s"media $id: only tkhd version 0 supported")
          val trackId = u32(bytes, tkS + 12)
          val (mdS, mdE) = child(id, bytes, ts, te, "mdia")
            .getOrElse(fail(id, "trak without mdia"))
          val (mhS, _) = child(id, bytes, mdS, mdE, "mdhd")
            .getOrElse(fail(id, "mdia without mdhd"))
          require(bytes(mhS) == 0, s"media $id: only mdhd version 0 supported")
          val timescale = u32(bytes, mhS + 12)
          val duration = u32(bytes, mhS + 16)
          require(timescale > 0, s"media $id: mdhd timescale 0")
          val langBits = ((bytes(mhS + 20) & 0xff) << 8) | (bytes(mhS + 21) & 0xff)
          val language = new String(Array(
            (0x60 + ((langBits >> 10) & 0x1f)).toChar,
            (0x60 + ((langBits >> 5) & 0x1f)).toChar,
            (0x60 + (langBits & 0x1f)).toChar))
          val (hdS, _) = child(id, bytes, mdS, mdE, "hdlr")
            .getOrElse(fail(id, "mdia without hdlr"))
          val handler = tag(bytes, hdS + 8)
          val codec = (for {
            (mnS, mnE) <- child(id, bytes, mdS, mdE, "minf")
            (sbS, sbE) <- child(id, bytes, mnS, mnE, "stbl")
            (sdS, sdE) <- child(id, bytes, sbS, sbE, "stsd")
          } yield {
            require(u32(bytes, sdS + 4) >= 1, s"media $id: empty stsd")
            tag(bytes, sdS + 12) // first sample entry's fourcc
          }).getOrElse(fail(id, "trak without an stsd sample entry"))
          Mp4Track(trackId, handler, codec, language, timescale,
            duration * 1000L / timescale)
      }
    }

    private def fail(id: Long, msg: String): Nothing =
      throw new IllegalArgumentException(s"media $id: $msg")

    private def fullBox(name: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length).put(name.getBytes("US-ASCII")).put(body)
      out.array()
    }

    /** Synthesize an MP4 with REAL track structure: per track a
      * (handler, codecFourcc, language, timescale, duration) tuple
      * becomes trak/tkhd + mdia/(mdhd with packed language, hdlr,
      * minf/stbl/stsd with one sample entry).
      */
    def synthesizeTracks(movieTimescale: Int, movieDuration: Int,
        specs: Seq[(String, String, String, Int, Int)]): Array[Byte] = {
      val traks = specs.zipWithIndex.map {
        case ((handler, codec, lang, timescale, duration), i) =>
          val tkhd = java.nio.ByteBuffer.allocate(84)
          tkhd.putInt(0x00000007) // version 0 + enabled flags
            .putInt(0).putInt(0) // times
            .putInt(i + 1).putInt(0) // track_ID + reserved
            .putInt(duration)
          tkhd.putLong(0L) // reserved
          tkhd.putShort(0).putShort(0).putShort(0).putShort(0)
          Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            .foreach(tkhd.putInt)
          tkhd.putInt(0).putInt(0) // width/height
          val langBits = ((lang(0) - 0x60) << 10) |
            ((lang(1) - 0x60) << 5) | (lang(2) - 0x60)
          val mdhd = java.nio.ByteBuffer.allocate(24)
          mdhd.putInt(0).putInt(0).putInt(0)
            .putInt(timescale).putInt(duration)
            .putShort(langBits.toShort).putShort(0)
          val hdlr = java.nio.ByteBuffer.allocate(25)
          hdlr.putInt(0).putInt(0).put(handler.getBytes("US-ASCII"))
            .putInt(0).putInt(0).putInt(0).put(0.toByte) // empty name
          val entry = java.nio.ByteBuffer.allocate(16)
          entry.putInt(16).put(codec.getBytes("US-ASCII"))
            .putInt(0).putShort(0).putShort(1) // reserved + data_ref_idx
          val stsdBody = java.nio.ByteBuffer.allocate(8 + 16)
          stsdBody.putInt(0).putInt(1).put(entry.array())
          val stbl = fullBox("stbl", fullBox("stsd", stsdBody.array()))
          val minf = fullBox("minf", stbl)
          val mdia = fullBox("mdia",
            fullBox("mdhd", mdhd.array()) ++
              fullBox("hdlr", hdlr.array()) ++ minf)
          fullBox("trak", fullBox("tkhd", tkhd.array()) ++ mdia)
      }
      val base = synthesize(movieTimescale, movieDuration, 0)
      // splice the traks inside moov: rebuild moov with them appended
      val moovStart = 16 // after the 16-byte ftyp
      val moovSize = u32(base, moovStart).toInt
      val moovBody = java.util.Arrays.copyOfRange(base,
        moovStart + 8, moovStart + moovSize)
      val ftyp = java.util.Arrays.copyOfRange(base, 0, 16)
      ftyp ++ fullBox("moov", moovBody ++ traks.flatten.toArray)
    }

    /** Synthesize a minimal structurally-valid MP4: ftyp(isom) +
      * moov(mvhd v0 + `nTracks` empty trak boxes).
      */
    def synthesize(timescale: Int, duration: Int, nTracks: Int): Array[Byte] = {
      val mvhd = java.nio.ByteBuffer.allocate(108)
      mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0)            // version 0 + flags
        .putInt(0).putInt(0)  // creation/modification time
        .putInt(timescale).putInt(duration)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putInt(0).putInt(0)  // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(mvhd.putInt) // identity matrix
      (1 to 6).foreach(_ => mvhd.putInt(0)) // pre_defined
      mvhd.putInt(nTracks + 1) // next_track_ID
      val traks = Array.fill(nTracks)(
        java.nio.ByteBuffer.allocate(8).putInt(8).put("trak".getBytes("US-ASCII")).array())
      val moovSize = 8 + 108 + nTracks * 8
      val moovHdr = java.nio.ByteBuffer.allocate(8).putInt(moovSize)
        .put("moov".getBytes("US-ASCII")).array()
      val ftyp = java.nio.ByteBuffer.allocate(16).putInt(16)
        .put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
        .putInt(0).array()
      ftyp ++ moovHdr ++ mvhd.array() ++ traks.flatten
    }
  }

  /** (media_id, content) rows → probed MP4 container features. */
  def probeMp4(media: DataFrame): Dataset[Mp4Features] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => Mp4Codec.parse(id, c) })
  }

  /** Magic-byte modality sniff — what a mixed media column dispatches
    * on BEFORE any schema metadata is trusted.
    */
  def sniffModality(bytes: Array[Byte]): String =
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A') "audio/wav"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && tag4(bytes, 8) == "AVI ") "video/avi"
    else if (WebpCodec.isWebp(bytes))
      // both forms decode to pixels (VP8L exactly, VP8 via the RFC
      // 6386 keyframe decoder); the label keeps them distinguishable
      (if (WebpCodec.isAnim(bytes)) "image/webp-anim"
      else if (WebpCodec.isLossless(bytes)) "image/webp"
      else "image/webp-lossy")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
    else if (bytes.length >= 12 && tag4(bytes, 4) == "ftyp") "video/mp4"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff) "image/jpeg"
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "image/png"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "image/gif"
    else if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) "application/zip"
    else if (bytes.length >= 262 && bytes(257) == 'u' && bytes(258) == 's' &&
      bytes(259) == 't' && bytes(260) == 'a' && bytes(261) == 'r')
      "application/x-tar"
    else if (bytes.length >= 5 && bytes(0) == 'W' && bytes(1) == 'A' &&
      bytes(2) == 'R' && bytes(3) == 'C' && bytes(4) == '/')
      "application/warc"
    else if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-')
      "application/pdf"
    else if (TiffCodec.isTiff(bytes)) "image/tiff"
    else if (FlacCodec.isFlac(bytes)) "audio/flac"
    else if (Subtitles.isWebVtt(bytes)) "text/vtt"
    else if (OggCodec.isOgg(bytes)) "audio/ogg"
    else if (AiffCodec.isAiff(bytes)) "audio/aiff"
    // after image/jpeg: an MP3 frame sync is FF Ex/Fx, never FF D8
    else if (Mp3Codec.isMp3(bytes)) "audio/mpeg"
    else if (graft.functions.ZstdBytes.isZstd(bytes)) "application/zstd"
    else if (Bzip2Codec.isBzip2(bytes)) "application/x-bzip2"
    else if (XzCodec.isXz(bytes)) "application/x-xz"
    else if (RtfText.isRtf(bytes)) "text/rtf"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b && (bytes(2) & 0xff) == 0x08)
      "application/gzip"
    else "unknown"

  private def tag4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  final case class MediaAuto(
      media_id: Long, modality: String, n_units: Long, mean_val: Double)

  /** Mixed-modality decode: sniff each payload, route to the matching
    * REAL codec (WAV samples / BMP pixels / JPEG pixels / MJPEG-AVI
    * first frame), fall back to byte stats for unknowns — the one-pass
    * ingest shape for a heterogeneous media column. n_units = samples
    * | pixels | frames | bytes; mean_val = mean |amplitude| | mean
    * intensity | frame-0 mean intensity | mean byte.
    */
  def decodeAuto(media: DataFrame): Dataset[MediaAuto] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) =>
        val bytes = if (c == null) Array.emptyByteArray else c
        sniffModality(bytes) match {
          case m @ "audio/wav" =>
            val f = WavCodec.parse(id, bytes)
            MediaAuto(id, m, f.n_samples, f.mean_abs_amp)
          case m @ "image/bmp" =>
            val f = BmpCodec.parse(id, bytes)
            MediaAuto(id, m, f.n_pixels, f.mean_intensity)
          case m @ "image/jpeg" =>
            val img = JpegCodec.decode(id, bytes)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
            MediaAuto(id, m, img.width.toLong * img.height,
              if (img.pixels.length == 0) 0.0 else sum.toDouble / img.pixels.length)
          case m @ "image/png" =>
            val img = PngCodec.decode(id, bytes)
            val keep = if (img.channels == 2 || img.channels == 4)
              img.channels - 1 else img.channels
            var sum = 0L
            var p = 0
            val nPix = img.width * img.height
            while (p < nPix) {
              var ch = 0
              while (ch < keep) {
                sum += (img.pixels(p * img.channels + ch) & 0xff)
                ch += 1
              }
              p += 1
            }
            MediaAuto(id, m, nPix.toLong,
              if (nPix == 0) 0.0 else sum.toDouble / (nPix.toLong * keep))
          case m @ ("image/webp" | "image/webp-lossy") =>
            // full decode (VP8L exact / VP8 keyframe); n_units =
            // pixels, mean over RGB (alpha dropped, matching the PNG
            // path's intensity convention)
            val img = WebpCodec.toDecodedImage(WebpCodec.decode(id, bytes))
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
            MediaAuto(id, m, img.width.toLong * img.height,
              if (img.pixels.length == 0) 0.0 else sum.toDouble / img.pixels.length)
          case m @ "image/webp-anim" =>
            // composite all frames; n_units = frames, mean over the
            // FIRST composited frame's RGB (the GIF probe shape)
            val anim = WebpCodec.decodeAnim(id, bytes)
            val img = WebpCodec.frameToDecodedImage(anim, 0)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
            MediaAuto(id, m, anim.frames.length.toLong,
              if (img.pixels.length == 0) 0.0 else sum.toDouble / img.pixels.length)
          case m @ "image/gif" =>
            // full decode of the FIRST composited frame; n_units =
            // animation frames (the probe shape, like video/avi)
            val img = GifCodec.decode(id, bytes)
            val px = img.frames.head.pixels
            var sum = 0L
            var i = 0
            while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
            MediaAuto(id, m, img.nFrames.toLong,
              if (px.length == 0) 0.0 else sum.toDouble / px.length)
          case m @ "application/pdf" =>
            // document probe: n_units = extracted characters,
            // mean_val = page count (text metrics, not byte stats)
            val t = PdfText.extract(id, bytes)
            MediaAuto(id, m, t.text.length.toLong, t.nPages.toDouble)
          case m @ "image/tiff" =>
            // scanned-document shape: full decode of PAGE 0 (strips/
            // tiles, LZW/Deflate/PackBits/CCITT fax); n_units = page-0
            // pixels, mean over color channels (alpha dropped, the PNG
            // convention)
            val img = TiffCodec.decode(id, bytes)
            val keep = if (img.channels == 4) 3 else img.channels
            var sum = 0L
            var p = 0
            val nPix = img.width * img.height
            while (p < nPix) {
              var ch = 0
              while (ch < keep) {
                sum += (img.pixels(p * img.channels + ch) & 0xff)
                ch += 1
              }
              p += 1
            }
            MediaAuto(id, m, nPix.toLong,
              if (nPix == 0) 0.0 else sum.toDouble / (nPix.toLong * keep))
          case m @ "audio/mpeg" =>
            // compressed-audio probe: n_units = frames, mean_val =
            // duration in ms (header arithmetic, no MDCT decode)
            val f = Mp3Codec.parse(id, bytes)
            MediaAuto(id, m, f.nFrames.toLong, f.durationMs.toDouble)
          case m @ "audio/flac" =>
            if (FlacAudio.hasFrames(id, bytes)) {
              // REAL frame decode (CRC+MD5-verified): n_units =
              // per-channel samples, mean_val = mean |amplitude| —
              // the WAV parse shape, so one recording probes the
              // same from either container
              val pcm = FlacAudio.decode(id, bytes)
              var sum = 0L
              var i = 0
              while (i < pcm.samples.length) {
                sum += math.abs(pcm.samples(i).toLong); i += 1
              }
              MediaAuto(id, m, pcm.samples.length.toLong / pcm.channels,
                if (pcm.samples.length == 0) 0.0
                else sum.toDouble / pcm.samples.length)
            } else { // STREAMINFO-only shell: header probe
              val f = FlacCodec.parse(id, bytes)
              MediaAuto(id, m, f.totalSamples, f.durationMs.toDouble)
            }
          case m @ ("application/zip" | "application/x-tar" |
                    "application/warc") =>
            // archive probe: member/record count + mean payload byte
            val members: Seq[Array[Byte]] = m match {
              case "application/zip" => ZipCodec.parse(id, bytes).map(_._2)
              case "application/x-tar" => TarCodec.parse(id, bytes).map(_._2)
              case _ => WarcCodec.parse(id, bytes).map(_.payload)
            }
            var sum = 0L
            var n = 0L
            members.foreach { d =>
              var i = 0
              while (i < d.length) { sum += (d(i) & 0xff); i += 1 }
              n += d.length
            }
            MediaAuto(id, m, members.length.toLong,
              if (n == 0) 0.0 else sum.toDouble / n)
          case m @ "application/zstd" =>
            // compressed-blob probe: inflate (bomb-guarded) and report
            // the DECOMPRESSED byte stats — the .jsonl.zst drop shape
            val d = try graft.functions.ZstdBytes.decompress(bytes, 512L * 1024 * 1024)
              catch { case e: Exception => throw new IllegalArgumentException(
                s"media $id: corrupt zstd frame: ${e.getMessage}", e) }
            var sum = 0L
            var i = 0
            while (i < d.length) { sum += (d(i) & 0xff); i += 1 }
            MediaAuto(id, m, d.length.toLong,
              if (d.length == 0) 0.0 else sum.toDouble / d.length)
          case m @ "application/x-xz" =>
            // .xz corpus drops (Wikipedia-dump era): LZMA2 decode with
            // per-block checks verified, bomb-guarded
            val d = XzCodec.decompress(id, bytes)
            var sum = 0L
            var i = 0
            while (i < d.length) { sum += (d(i) & 0xff); i += 1 }
            MediaAuto(id, m, d.length.toLong,
              if (d.length == 0) 0.0 else sum.toDouble / d.length)
          case m @ "application/x-bzip2" =>
            // same shape for the .bz2 era of corpus drops (CRCs
            // verified, bomb-guarded, multi-stream)
            val d = Bzip2Codec.decompress(id, bytes)
            var sum = 0L
            var i = 0
            while (i < d.length) { sum += (d(i) & 0xff); i += 1 }
            MediaAuto(id, m, d.length.toLong,
              if (d.length == 0) 0.0 else sum.toDouble / d.length)
          case m @ "application/gzip" =>
            // multi-member walk with CRC+ISIZE verification (a
            // .warc.gz routes here too — the inner WARC is the
            // member payload, probed as decompressed bytes)
            val d = WarcCodec.gunzipAll(id, bytes)
            var sum = 0L
            var i = 0
            while (i < d.length) { sum += (d(i) & 0xff); i += 1 }
            MediaAuto(id, m, d.length.toLong,
              if (d.length == 0) 0.0 else sum.toDouble / d.length)
          case m @ "text/rtf" =>
            // document probe: n_units = extracted characters,
            // mean_val = paragraph count (the PDF probe shape)
            val text = RtfText.extract(id, bytes)
            MediaAuto(id, m, text.length.toLong,
              text.split("\n", -1).length.toDouble)
          case m @ "video/avi" =>
            // container walk + a REAL decode of the first frame (the
            // probe a pipeline runs before committing to full decode)
            val avi = AviCodec.parse(id, bytes)
            val img = JpegCodec.decode(id, avi.frames.head)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
            MediaAuto(id, m, avi.frames.length.toLong,
              if (img.pixels.length == 0) 0.0 else sum.toDouble / img.pixels.length)
          case m @ "audio/ogg" =>
            // container+metadata parse (CRC-verified pages): n_units
            // = final granule (PCM samples), mean_val = duration ms
            val g = OggCodec.parse(id, bytes)
            MediaAuto(id, m, g.lastGranule, g.durationMs.toDouble)
          case m @ "audio/aiff" =>
            // big-endian PCM sibling of the WAV parse shape
            val a = AiffCodec.parse(id, bytes)
            MediaAuto(id, m, a.nFrames, a.meanAbsAmp)
          case m @ "text/vtt" =>
            // transcript probe: n_units = cues, mean_val = voiced ms
            val (_, cues) = Subtitles.parse(id, bytes)
            MediaAuto(id, m, cues.length.toLong,
              cues.map(c => c.endMs - c.startMs).sum.toDouble)
          case m =>
            val f = FakeDecoder.features(id, m, bytes)
            MediaAuto(id, m, f.n_bytes, f.byte_mean)
        }
      })
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
