package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 tier, video leg: REAL MJPEG frame decode (AVI container
  * walk + pure-JVM baseline JPEG) feeding the banded-hamming near-dup
  * path. Fixtures are synthesized from table parameters in the
  * quality-100 constant-block regime, where the whole
  * encode→container→decode chain is bit-exact — so the oracles replay
  * decoded pixel statistics and perceptual hashes ANALYTICALLY from
  * the generator formulas (the same discipline as the BMP/WAV gates).
  */
object OperatorGates11 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Constant-block gray frame value for video `d`, frame `f`, 16x16
    * block `(bx, by)` on the 64x48 canvas — single source of truth;
    * the q_frame_decode oracle restates it.
    */
  private def frameValue(d: Long, f: Int, bx: Int, by: Int): Int =
    (22 + (d * 31 + f * 17 + bx * 41 + by * 59) % 211).toInt

  /** MJPEG-in-AVI fixture for doc `d`: 4-6 frames of 64x48 gray
    * constant 16x16 blocks, encoded at quality 100 / 4:2:0 (DC-only
    * blocks decode bit-exactly through the full color path).
    */
  private[graft] def synthAvi(d: Long): Array[Byte] = {
    import graft.operators.{AviCodec, JpegCodec}
    val nf = (4 + (d / 25) % 3).toInt
    val frames = (0 until nf).map { f =>
      val rgb = new Array[Byte](64 * 48 * 3)
      var y = 0
      while (y < 48) {
        var x = 0
        while (x < 64) {
          val v = frameValue(d, f, x / 16, y / 16)
          val o = (y * 64 + x) * 3
          rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
          x += 1
        }
        y += 1
      }
      JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
    }
    AviCodec.synthesize(64, 48, 33333, frames)
  }

  /** Near-dup fixture: content keyed by group (d/25) % 5 so 4 videos
    * share each group's frames (re-encoded copies = hamming-0 pairs);
    * odd (d/25) videos brighten block (0,0) of frame 1 by +30 — a
    * few-bit aHash wobble in some groups, the near-but-not-identical
    * signal (and cross-frame pairs land at small distances naturally).
    */
  private def neardupValue(d: Long, f: Int, bx: Int, by: Int): Int = {
    val g = (d / 25) % 5
    val base = (25 + (g * 37 + f * 13 + bx * 47 + by * 71) % 199).toInt
    base + (if ((d / 25) % 2 == 1 && f == 1 && bx == 0 && by == 0) 30 else 0)
  }

  private[graft] def synthNeardupAvi(d: Long): Array[Byte] = {
    import graft.operators.{AviCodec, JpegCodec}
    val frames = (0 until 3).map { f =>
      val rgb = new Array[Byte](64 * 48 * 3)
      var y = 0
      while (y < 48) {
        var x = 0
        while (x < 64) {
          val v = neardupValue(d, f, x / 16, y / 16)
          val o = (y * 64 + x) * 3
          rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
          x += 1
        }
        y += 1
      }
      JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
    }
    AviCodec.synthesize(64, 48, 33333, frames)
  }

  /** PNG fixture value: channel `c` of 16x16 block `(bx, by)` for
    * image `d` — the oracle restates it. Gray images ((d/25) even) use
    * c = 0 only.
    */
  private def pngValue(d: Long, c: Int, bx: Int, by: Int): Int =
    (13 + (d * 29 + c * 53 + bx * 43 + by * 61) % 223).toInt

  /** Deterministic PNG fixture for doc `d`: 64x48, constant 16x16
    * blocks; even (d/25) gray (1 channel), odd RGB. Encoded with the
    * ADAPTIVE-filter encoder, so decode exercises the real unfilter
    * matrix while remaining bit-exact (PNG is lossless).
    */
  private[graft] def synthPng(d: Long): Array[Byte] = {
    import graft.operators.PngCodec
    val gray = (d / 25) % 2 == 0
    val ch = if (gray) 1 else 3
    val px = new Array[Byte](64 * 48 * ch)
    var y = 0
    while (y < 48) {
      var x = 0
      while (x < 64) {
        var c = 0
        while (c < ch) {
          px((y * 64 + x) * ch + c) =
            pngValue(d, if (gray) 0 else c, x / 16, y / 16).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode(64, 48, ch, px)
  }

  /** GIF fixture frame value: 16x16 block `(bx, by)` of frame `f` for
    * image `d`, a gray palette index — the oracle restates it.
    */
  private def gifValue(d: Long, f: Int, bx: Int, by: Int): Int =
    (18 + (d * 37 + f * 23 + bx * 41 + by * 67) % 229).toInt

  /** Animated-GIF fixture for doc `d`: 2-4 full-canvas opaque frames
    * of 64x48 constant 16x16 blocks over a 256-gray global palette
    * (index == intensity), LZW-compressed by [[GifCodec.encode]].
    * Full-canvas opaque frames make composited == raw, so the oracle
    * replays per-frame stats exactly.
    */
  private[graft] def synthGif(d: Long): Array[Byte] = {
    import graft.operators.GifCodec
    val pal = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      pal(i * 3) = i.toByte; pal(i * 3 + 1) = i.toByte; pal(i * 3 + 2) = i.toByte
      i += 1
    }
    val nf = (2 + (d / 25) % 3).toInt
    val frames = (0 until nf).map { f =>
      val idx = new Array[Byte](64 * 48)
      var y = 0
      while (y < 48) {
        var x = 0
        while (x < 64) {
          idx(y * 64 + x) = gifValue(d, f, x / 16, y / 16).toByte
          x += 1
        }
        y += 1
      }
      idx
    }
    GifCodec.encode(64, 48, pal, frames, interlaced = d % 50 == 0)
  }

  /** Cross-format fixture: image `d`'s 16x16 block value at block
    * `(bx, by)` — keyed by content GROUP g = (d/25) % 5, not by id, so
    * ids sharing g carry the SAME pixels in DIFFERENT formats; odd
    * (d/25)/2 images REFLECT block (0,0) (v -> 240-v), pushing its
    * ~6 aHash cells across the brightness-mean threshold — the
    * near-but-not-identical signal. The oracle restates it.
    */
  private def crossValue(d: Long, bx: Int, by: Int): Int = {
    val k = d / 25
    val g = k % 5
    val base = (20 + (g * 53 + bx * 37 + by * 73) % 200).toInt
    if ((k / 2) % 2 == 1 && bx == 0 && by == 0) 240 - base else base
  }

  /** The same 64x48 gray constant-block content serialized as PNG /
    * GIF / JPEG-q100 / BMP / WebP-VP8L / EXIF-rotated JPEG / TIFF-LZW
    * — every format's decode must land on the identical top-down
    * pixels (JPEG is exact in the q100 constant-block regime; the
    * others are lossless; the rotated JPEG stores the pixels
    * 90°-CCW-turned with Orientation=6, which decodeNormalized must
    * rotate back). The format index (k%7 + k/7) % 7 varies WITHIN
    * each content group g = k%5, so near-dup pairs genuinely cross
    * formats; the oracle needs no format knowledge because every
    * decode is pixel-exact.
    */
  private[graft] def synthCrossformat(d: Long): Array[Byte] = {
    import graft.operators.{GifCodec, JpegCodec, PngCodec, TiffCodec, WebpCodec}
    def v(x: Int, y: Int): Int = crossValue(d, x / 16, y / 16)
    val k = d / 25
    ((k % 7 + k / 7) % 7).toInt match {
      case 0 => // PNG, 1-channel gray
        val px = new Array[Byte](64 * 48)
        var i = 0
        while (i < px.length) { px(i) = v(i % 64, i / 64).toByte; i += 1 }
        PngCodec.encode(64, 48, 1, px)
      case 1 => // GIF, gray palette (index == intensity)
        val pal = new Array[Byte](768)
        var j = 0
        while (j < 256) {
          pal(j * 3) = j.toByte; pal(j * 3 + 1) = j.toByte; pal(j * 3 + 2) = j.toByte
          j += 1
        }
        val idx = new Array[Byte](64 * 48)
        var i = 0
        while (i < idx.length) { idx(i) = v(i % 64, i / 64).toByte; i += 1 }
        GifCodec.encode(64, 48, pal, Seq(idx))
      case 2 => // JPEG q100 4:2:0 (bit-exact for constant 16x16 blocks)
        val rgb = new Array[Byte](64 * 48 * 3)
        var i = 0
        while (i < 64 * 48) {
          val b = v(i % 64, i / 64).toByte
          rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
          i += 1
        }
        JpegCodec.encodeRgb(64, 48, rgb, quality = 100, subsample = true)
      case 3 => // BMP (bottom-up file rows; aHashAuto flips)
        graft.operators.Multimodal.BmpCodec.synthesize(64, 48, { i =>
          val pix = i / 3
          v(pix % 64, 47 - pix / 64) // file row y is image row 47-y
        })
      case 4 => // WebP VP8L (gray replicated to RGB; lossless)
        val rgb = new Array[Byte](64 * 48 * 3)
        var i = 0
        while (i < 64 * 48) {
          val b = v(i % 64, i / 64).toByte
          rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
          i += 1
        }
        WebpCodec.encodeLossless(64, 48, 3, rgb)
      case 5 => // JPEG q100 stored 90°-CCW-rotated + EXIF Orientation=6
        val rgb = new Array[Byte](64 * 48 * 3)
        var i = 0
        while (i < 64 * 48) {
          val b = v(i % 64, i / 64).toByte
          rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
          i += 1
        }
        val upright = JpegCodec.DecodedImage(64, 48, 3, rgb)
        val stored = graft.operators.Multimodal.applyOrientation(upright, 8)
        JpegCodec.withExifOrientation(
          JpegCodec.encodeRgb(stored.width, stored.height, stored.pixels,
            quality = 100, subsample = true),
          orientation = 6, bigEndian = d % 2 == 0)
      case _ => // TIFF gray, LZW + predictor, alternating byte orders
        val px = new Array[Byte](64 * 48)
        var i = 0
        while (i < px.length) { px(i) = v(i % 64, i / 64).toByte; i += 1 }
        TiffCodec.encode(64, 48, 1, px, compression = 5, predictor = true,
          bigEndian = d % 2 == 0)
    }
  }

  /** Per-PIXEL gradient value for the resize fixture (not blocks —
    * resize must actually change the sampled values). The oracle
    * restates it.
    */
  private def gradValue(d: Long, x: Int, y: Int): Int =
    (13 + (d * 7 + x * 3 + y * 5) % 241).toInt

  /** The same 64x48 per-pixel gradient serialized as PNG / GIF / BMP
    * by (d/25) % 3 (all lossless — the resize gate needs exact
    * source pixels).
    */
  private[graft] def synthGradient(d: Long): Array[Byte] = {
    import graft.operators.{GifCodec, PngCodec}
    def v(x: Int, y: Int): Int = gradValue(d, x, y)
    ((d / 25) % 3).toInt match {
      case 0 =>
        val px = new Array[Byte](64 * 48)
        var i = 0
        while (i < px.length) { px(i) = v(i % 64, i / 64).toByte; i += 1 }
        PngCodec.encode(64, 48, 1, px)
      case 1 =>
        val pal = new Array[Byte](768)
        var j = 0
        while (j < 256) {
          pal(j * 3) = j.toByte; pal(j * 3 + 1) = j.toByte; pal(j * 3 + 2) = j.toByte
          j += 1
        }
        val idx = new Array[Byte](64 * 48)
        var i = 0
        while (i < idx.length) { idx(i) = v(i % 64, i / 64).toByte; i += 1 }
        GifCodec.encode(64, 48, pal, Seq(idx))
      case _ =>
        graft.operators.Multimodal.BmpCodec.synthesize(64, 48, { i =>
          val pix = i / 3
          v(pix % 64, 47 - pix / 64)
        })
    }
  }

  def queries11: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- CROSS-FORMAT image resize (Multimodal.resizeImage): decode
    //     any lossless format to the normalized layout, 2x
    //     nearest-neighbor downsample, re-encode PNG, re-decode for
    //     stats — dims, exact mean, and the resized aHash all replay
    //     analytically from the gradient formula ---------------------
    "q_image_resize" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthGradient(id))))
        .toDF("media_id", "content")
      Multimodal.resizeImage(media, outW = 32, outH = 24).toDF()
        .select(col("media_id"), col("src_modality"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"))
    }),

    // --- CROSS-FORMAT image near-dup: the same logical image stored
    //     as PNG / GIF / JPEG / BMP must hash IDENTICALLY through
    //     aHashAuto's format-normalized decode, so dedup finds copies
    //     that byte- or single-format hashing cannot; perturbed group
    //     members land at small hamming. Oracle brute-forces the pair
    //     definition from the shared content formula ------------------
    "q_crossformat_neardup" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Similarity
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthCrossformat(id))))
        .toDF("media_id", "content")
      val hashes = Multimodal.aHashAuto(media).toDF()
        .withColumn("block", lit("all"))
      Similarity.hammingPairs64(hashes, "media_id", "ahash", "block",
          maxHamming = 8, collapseIdentical = false)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- REAL animated-GIF decode (GifCodec): count-bounded fixtures
    //     (20 GIFs at every SF, 2-4 frames each, half interlaced),
    //     LZW-decoded and disposal-composited on executors; GIF is
    //     lossless so the oracle replays every frame's dims, exact
    //     mean, and 64-bit aHash analytically ------------------------
    "q_gif_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthGif(id))))
        .toDF("media_id", "content")
      Multimodal.decodeGifFrames(media).toDF()
        .select(col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("delay_cs").cast("long").as("delay_cs"),
          col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"), col("frame_no"))
    }),

    // --- REAL PNG decode (PngCodec): count-bounded fixtures (20
    //     images at every SF, gray and RGB, adaptive-filtered), each
    //     CRC-checked, inflated, unfiltered and hashed on executors;
    //     PNG is lossless so the oracle replays dims, exact channel
    //     sums, IEEE mean division, and the 64-bit aHash analytically -
    "q_png_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthPng(id))))
        .toDF("media_id", "content")
      Multimodal.decodePng(media).toDF()
        .join(Multimodal.aHashPng(media).toDF(), "media_id")
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("bit_depth").cast("long").as("bit_depth"),
          col("color_type").cast("long").as("color_type"),
          col("n_pixels"), col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"))
    }),

    // --- REAL video frame decode (AviCodec + JpegCodec + MjpegVideo):
    //     count-bounded MJPEG fixtures (20 videos at every SF), every
    //     2nd frame container-extracted and fully JPEG-decoded
    //     (Huffman, dequant, IDCT, 4:2:0 upsample, YCbCr->RGB) on
    //     executors. The oracle replays per-frame channel sums, IEEE
    //     mean division, and the 64-bit aHash from the block formula -
    "q_frame_decode" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.MjpegVideo
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthAvi(id))))
        .toDF("media_id", "content")
      MjpegVideo.decodeFrames(media, everyN = 2).toDF()
        .select(col("media_id"),
          col("frame_no").cast("long").as("frame_no"),
          col("n_frames").cast("long").as("n_frames"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_intensity"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy(col("media_id"), col("frame_no"))
    }),

    // --- video near-dup through the decoded-frame hashes: group-keyed
    //     MJPEG content (4 videos per group, odd videos perturb one
    //     block of frame 1), frame aHashes -> banded hamming pairs ->
    //     min distance per cross-video pair. The oracle brute-forces
    //     the pair definition from the same formula ------------------
    "q_video_neardup" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Similarity
      import graft.operators.MjpegVideo
      val media = t(s, dir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(25)) === 0 && col("doc_id") < 500)
        .as[Long]
        .mapPartitions(_.map(id => (id, synthNeardupAvi(id))))
        .toDF("media_id", "content")
      val hashes = MjpegVideo.frameHashes(media, everyN = 1)
        .withColumn("fid", col("media_id") * 1000 + col("frame_no"))
        .withColumn("block", lit("all"))
      // enumerate every qualifying cross-video frame pair (the oracle
      // IS the brute-force definition; the collapsed star shape is the
      // scale path, gated in q_image_neardup/q_media_dedup_resolve)
      Similarity.hammingPairs64(hashes, "fid", "ahash", "block",
          maxHamming = 6, collapseIdentical = false)
        .select(expr("id_a div 1000").as("va"),
          expr("id_a % 1000").cast("long").as("fa"),
          expr("id_b div 1000").as("vb"),
          expr("id_b % 1000").cast("long").as("fb"),
          col("hamming").cast("long").as("hamming"))
        .filter(col("va") =!= col("vb"))
        .orderBy(col("va"), col("fa"), col("vb"), col("fb"))
    })
  )

  def oracleSql11: Map[String, String] = Map(

    "q_image_resize" ->
      """WITH imgs AS (
        |  SELECT doc_id, (doc_id // 25) % 3 AS f
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |feat AS (
        |  SELECT doc_id, f,
        |    list_sum(list_transform(range(0, 768), i ->
        |      13 + (doc_id * 7 + (i % 32) * 2 * 3 + (i // 32) * 2 * 5) % 241)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      3 * (13 + (doc_id * 7 + 8 * (j % 8) * 3 + 6 * (j // 8) * 5) % 241)) AS lum
        |  FROM imgs)
        |SELECT doc_id AS media_id,
        |  CASE f WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
        |         ELSE 'image/bmp' END AS src_modality,
        |  CAST(32 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
        |  CAST(sv AS DOUBLE) / 768 AS mean_intensity,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id""".stripMargin,

    "q_crossformat_neardup" ->
      """WITH imgs AS (
        |  SELECT doc_id, (doc_id // 25) % 5 AS g,
        |    ((doc_id // 25) // 2) % 2 = 1 AS pert
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |bits AS (
        |  SELECT doc_id, list_transform(range(0, 64), j ->
        |    3 * (CASE WHEN pert AND ((j % 8) // 2) = 0
        |              AND ((6 * (j // 8)) // 16) = 0
        |         THEN 240 - (20 + (g * 53) % 200)
        |         ELSE 20 + (g * 53 + ((j % 8) // 2) * 37
        |              + ((6 * (j // 8)) // 16) * 73) % 200 END)) AS lum
        |  FROM imgs),
        |hb AS (
        |  SELECT doc_id, list_transform(range(0, 64), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END) AS b
        |  FROM bits),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    list_sum(list_transform(range(0, 64), j ->
        |      CASE WHEN a.b[j + 1] <> b.b[j + 1] THEN 1 ELSE 0 END)) AS hamming
        |  FROM hb a JOIN hb b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM pairs
        |WHERE hamming <= 8 ORDER BY id_a, id_b""".stripMargin,

    "q_gif_decode" ->
      """WITH gifs AS (
        |  SELECT doc_id, CAST(2 + (doc_id // 25) % 3 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |fr AS (
        |  SELECT doc_id, nf, unnest(range(0, nf)) AS frame_no FROM gifs),
        |feat AS (
        |  SELECT doc_id, nf, frame_no,
        |    list_sum(list_transform(range(0, 12), b ->
        |      18 + (doc_id * 37 + frame_no * 23 + (b % 4) * 41 + (b // 4) * 67) % 229)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      3 * (18 + (doc_id * 37 + frame_no * 23 + ((j % 8) // 2) * 41
        |           + ((6 * (j // 8)) // 16) * 67) % 229)) AS lum
        |  FROM fr)
        |SELECT doc_id AS media_id, frame_no, nf AS n_frames,
        |  CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
        |  CAST(10 AS BIGINT) AS delay_cs,
        |  CAST(256 * sv AS DOUBLE) / 3072 AS mean_intensity,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id, frame_no""".stripMargin,

    "q_png_decode" ->
      """WITH imgs AS (
        |  SELECT doc_id, (doc_id // 25) % 2 = 0 AS gray
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |feat AS (
        |  SELECT doc_id, gray,
        |    list_sum(list_transform(range(0, 12), b ->
        |      CASE WHEN gray
        |        THEN 13 + (doc_id * 29 + (b % 4) * 43 + (b // 4) * 61) % 223
        |        ELSE 13 + (doc_id * 29 + (b % 4) * 43 + (b // 4) * 61) % 223
        |           + 13 + (doc_id * 29 + 53 + (b % 4) * 43 + (b // 4) * 61) % 223
        |           + 13 + (doc_id * 29 + 106 + (b % 4) * 43 + (b // 4) * 61) % 223
        |      END)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      CASE WHEN gray
        |        THEN 3 * (13 + (doc_id * 29 + ((j % 8) // 2) * 43
        |             + ((6 * (j // 8)) // 16) * 61) % 223)
        |        ELSE 13 + (doc_id * 29 + ((j % 8) // 2) * 43
        |             + ((6 * (j // 8)) // 16) * 61) % 223
        |           + 13 + (doc_id * 29 + 53 + ((j % 8) // 2) * 43
        |             + ((6 * (j // 8)) // 16) * 61) % 223
        |           + 13 + (doc_id * 29 + 106 + ((j % 8) // 2) * 43
        |             + ((6 * (j // 8)) // 16) * 61) % 223
        |      END) AS lum
        |  FROM imgs)
        |SELECT doc_id AS media_id, CAST(64 AS BIGINT) AS width,
        |  CAST(48 AS BIGINT) AS height, CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(CASE WHEN gray THEN 0 ELSE 2 END AS BIGINT) AS color_type,
        |  CAST(3072 AS BIGINT) AS n_pixels,
        |  CAST(256 * sv AS DOUBLE) /
        |    (CASE WHEN gray THEN 3072 ELSE 9216 END) AS mean_intensity,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id""".stripMargin,

    "q_frame_decode" ->
      """WITH vids AS (
        |  SELECT doc_id, CAST(4 + (doc_id // 25) % 3 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |fr AS (
        |  SELECT doc_id, nf, unnest(range(0, nf, 2)) AS frame_no FROM vids),
        |feat AS (
        |  SELECT doc_id, nf, frame_no,
        |    list_sum(list_transform(range(0, 12), b ->
        |      22 + (doc_id * 31 + frame_no * 17 + (b % 4) * 41 + (b // 4) * 59) % 211)) AS sv,
        |    list_transform(range(0, 64), j ->
        |      3 * (22 + (doc_id * 31 + frame_no * 17
        |           + ((j % 8) // 2) * 41 + ((6 * (j // 8)) // 16) * 59) % 211)) AS lum
        |  FROM fr)
        |SELECT doc_id AS media_id, frame_no, nf AS n_frames,
        |  CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
        |  CAST(768 * sv AS DOUBLE) / 9216 AS mean_intensity,
        |  array_to_string(list_transform(range(63, -1, -1), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END), '')
        |    AS ahash_bits
        |FROM feat ORDER BY media_id, frame_no""".stripMargin,

    "q_video_neardup" ->
      """WITH vids AS (
        |  SELECT doc_id, (doc_id // 25) % 5 AS g, (doc_id // 25) % 2 = 1 AS pert
        |  FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
        |fr AS (
        |  SELECT doc_id, g, pert, unnest(range(0, 3)) AS f FROM vids),
        |bits AS (
        |  SELECT doc_id, f, list_transform(range(0, 64), j ->
        |    3 * (25 + (g * 37 + f * 13 + ((j % 8) // 2) * 47
        |         + ((6 * (j // 8)) // 16) * 71) % 199
        |       + CASE WHEN pert AND f = 1 AND ((j % 8) // 2) = 0
        |              AND ((6 * (j // 8)) // 16) = 0 THEN 30 ELSE 0 END)) AS lum
        |  FROM fr),
        |hb AS (
        |  SELECT doc_id, f, list_transform(range(0, 64), j ->
        |    CASE WHEN 64 * lum[j + 1] > list_sum(lum) THEN 1 ELSE 0 END) AS b
        |  FROM bits)
        |,fpairs AS (
        |  SELECT a.doc_id AS va, a.f AS fa, b.doc_id AS vb, b.f AS fb,
        |    list_sum(list_transform(range(0, 64), j ->
        |      CASE WHEN a.b[j + 1] <> b.b[j + 1] THEN 1 ELSE 0 END)) AS hamming
        |  FROM hb a JOIN hb b ON a.doc_id < b.doc_id)
        |SELECT va, fa, vb, fb, CAST(hamming AS BIGINT) AS hamming FROM fpairs
        |WHERE hamming <= 6 ORDER BY va, fa, vb, fb""".stripMargin
  )
}
