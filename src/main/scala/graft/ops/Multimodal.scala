package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio payloads ride as opaque `binary`
  * columns with typed metadata and are batch-decoded per partition — the
  * Scala analogue of `mapInPandas` (one iterator per partition, so codec
  * state amortizes across the batch).
  *
  * The container ships no media files, so payloads are SYNTHESIZED — but as
  * genuine, spec-conformant bytes: 24-bpp BITMAPINFOHEADER BMP images
  * (bottom-up rows, 4-byte stride padding) and 16-bit mono PCM RIFF/WAVE
  * audio. The decode side then does real codec work — magic checks,
  * little-endian header field reads, pixel/sample extraction — not a
  * byte-length formula. Image dimensions are a deterministic function of
  * the source text's byte length (w = 64 + tb mod 193, h = 64 + 31·tb mod
  * 129) and WAV sample counts equal the text byte length, which is what
  * keeps every mm catalog entry fully SQL-oracle-replayable: the oracle
  * recomputes the header arithmetic from the text, the engine reads it
  * back from the actual bytes, and a hash match proves the codec path
  * round-trips bit-exactly.
  *
  * Reference analogue: none (`.MISSING_LARGE_BLOBS:1-4` — the reference
  * repo carries no media); this is the mandate's training-pipeline
  * extension surface.
  */
object Multimodal {

  // ---- byte-level codecs (pure JVM, partition-local) ----------------------

  /** Deterministic BGR pixel value at logical top-down (x, y) for doc `id` —
    * the synthetic "content" of a generated image. Cheap integer mixing so
    * 100 MB-scale generation stays CPU-trivial.
    */
  @inline def pixel(id: Long, x: Int, y: Int): (Byte, Byte, Byte) = (
    (((x + 7 * y + id) % 256 + 256) % 256).toByte,
    (((3 * x + y + 5 * id) % 256 + 256) % 256).toByte,
    (((x + 5 * y + 11 * id) % 256 + 256) % 256).toByte)

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Row stride of a 24-bpp BMP: rows pad to 4-byte boundaries. */
  @inline def bmpStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total file size of a 24-bpp BITMAPINFOHEADER BMP. */
  @inline def bmpSize(width: Int, height: Int): Int =
    54 + bmpStride(width) * height

  /** Encode a width×height 24-bpp BMP whose pixel (x, y) is
    * [[pixel]](id, x, y). Spec-conformant: 14-byte file header, 40-byte
    * BITMAPINFOHEADER, bottom-up BGR rows with stride padding.
    */
  def encodeBmp(id: Long, width: Int, height: Int): Array[Byte] = {
    val stride = bmpStride(width)
    val size = 54 + stride * height
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size)
    putLe32(out, 10, 54)          // pixel-data offset
    putLe32(out, 14, 40)          // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height)      // positive = bottom-up
    putLe16(out, 26, 1)           // planes
    putLe16(out, 28, 24)          // bpp
    putLe32(out, 34, stride * height) // image size
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 dpi in px/m
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val (b, g, r) = pixel(id, x, y)
        val o = rowOff + 3 * x
        out(o) = b; out(o + 1) = g; out(o + 2) = r
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parsed 24-bpp BMP: dims + BGR pixels in LOGICAL top-down row-major
    * order (the bottom-up storage is unwound here).
    */
  final case class BmpImage(width: Int, height: Int, bgr: Array[Byte]) {
    /** BGR at logical top-down (x, y). */
    def at(x: Int, y: Int): (Byte, Byte, Byte) = {
      val o = 3 * (y * width + x)
      (bgr(o), bgr(o + 1), bgr(o + 2))
    }
  }

  /** Decode a 24-bpp uncompressed BMP — real header parsing: magic check,
    * little-endian field reads, stride-aware bottom-up pixel unwind.
    */
  def parseBmp(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    require(le32(bytes, 2) == bytes.length,
      s"BMP size field ${le32(bytes, 2)} != payload ${bytes.length}")
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    require(le16(bytes, 28) == 24, "expected 24 bpp")
    require(le32(bytes, 30) == 0, "expected uncompressed BI_RGB")
    val stride = bmpStride(width)
    val bgr = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val src = dataOff + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val d = 3 * (y * width + x)
        bgr(d) = bytes(src + 3 * x)
        bgr(d + 1) = bytes(src + 3 * x + 1)
        bgr(d + 2) = bytes(src + 3 * x + 2)
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, bgr)
  }

  /** Deterministic 16-bit sample i for doc `id`. */
  @inline def sample(id: Long, i: Int): Short =
    ((((id * 131 + i.toLong * 7919) % 65536 + 65536) % 65536) - 32768).toShort

  /** Encode 16-bit mono PCM RIFF/WAVE with `n` samples of [[sample]] at
    * `rate` Hz — canonical 44-byte header (fmt + data chunks).
    */
  def encodeWav(id: Long, n: Int, rate: Int = 16000): Array[Byte] = {
    val dataSize = 2 * n
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)          // fmt chunk size
    putLe16(out, 20, 1)           // PCM
    putLe16(out, 22, 1)           // mono
    putLe32(out, 24, rate)
    putLe32(out, 28, rate * 2)    // byte rate
    putLe16(out, 32, 2)           // block align
    putLe16(out, 34, 16)          // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < n) {
      putLe16(out, 44 + 2 * i, sample(id, i) & 0xffff)
      i += 1
    }
    out
  }

  final case class WavMeta(sampleRate: Int, channels: Int, bits: Int,
      nSamples: Long)

  /** Parse a RIFF/WAVE header by WALKING THE CHUNK LIST (not assuming the
    * canonical 44-byte layout): fmt yields rate/channels/bits, data yields
    * the sample count. Returns the samples too when `withSamples`.
    */
  def parseWav(bytes: Array[Byte], withSamples: Boolean = false)
  : (WavMeta, Array[Short]) = {
    require(bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE payload")
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataSize = 0
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val sz = le32(bytes, off + 4)
      id match {
        case "fmt " =>
          require(le16(bytes, off + 8) == 1, "expected PCM")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" => dataOff = off + 8; dataSize = sz
        case _ => () // skip unknown chunks
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    val n = dataSize / (channels * bits / 8)
    val samples =
      if (!withSamples) Array.empty[Short]
      else Array.tabulate(n)(i =>
        le16(bytes, dataOff + 2 * i).toShort)
    (WavMeta(rate, channels, bits, n), samples)
  }

  // ---- Spark plumbing -----------------------------------------------------

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Int, header_hex: String,
      feature: Array[Float])
  case class MediaDims(doc_id: Long, byte_len: Long, width: Long,
      height: Long)
  case class MediaResized(doc_id: Long, payload: Array[Byte],
      orig_len: Int, new_len: Int)
  case class AudioMeta(doc_id: Long, sample_rate: Int, n_samples: Long)

  /** Synthesize a real BMP payload per document: dims derive from the text
    * byte length (w = 64 + tb mod 193 ∈ [64, 256], h = 64 + 31·tb mod 129
    * ∈ [64, 192]), pixels from [[pixel]]. Generation is mapPartitions so a
    * real ingest (decode-from-object-store) drops in with the same shape;
    * the metadata struct carries the REAL byte length of the encoded file.
    */
  def synthesizeBmp(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      length(col(textCol).cast("binary")).cast("int").as("tb"))
      .as[(Long, Int)]
    src.mapPartitions { it =>
      it.map { case (id, tb) =>
        val w = 64 + tb % 193
        val h = 64 + (tb * 31) % 129
        MediaRecord(id, encodeBmp(id, w, h))
      }
    }.toDF()
      .select(col("doc_id"), col("payload"),
        struct(length(col("payload")).as("byte_len"),
          lit("image/bmp").as("mime"), lit(3).as("channels"))
          .as("media_meta"))
  }

  /** Synthesize a real WAV payload per document: n_samples = text byte
    * length, 16-bit mono 16 kHz PCM from [[sample]].
    */
  def synthesizeWav(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      length(col(textCol).cast("binary")).cast("int").as("tb"))
      .as[(Long, Int)]
    src.mapPartitions { it =>
      it.map { case (id, tb) => MediaRecord(id, encodeWav(id, tb)) }
    }.toDF()
      .select(col("doc_id"), col("payload"),
        struct(length(col("payload")).as("byte_len"),
          lit("audio/wav").as("mime"), lit(1).as("channels"))
          .as("media_meta"))
  }

  /** Real image decode via mapPartitions: parse the BMP header, unwind the
    * pixels, and emit content features computed from the ACTUAL bytes —
    * dims, per-channel means, mean luma, two probe pixels. byte_len and
    * header_hex come from the raw payload (the oracle replays both from
    * the size arithmetic, so a hash match proves the encoded header is
    * bit-exact).
    */
  def decodeImageFeatures(spark: SparkSession, media: DataFrame)
  : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val header = r.payload.take(8).map("%02x".format(_)).mkString
          val img = parseBmp(r.payload)
          var sb = 0L; var sg = 0L; var sr = 0L
          var i = 0
          while (i < img.bgr.length) {
            sb += img.bgr(i) & 0xff
            sg += img.bgr(i + 1) & 0xff
            sr += img.bgr(i + 2) & 0xff
            i += 3
          }
          val n = img.width.toLong * img.height
          def luma(p: (Byte, Byte, Byte)): Float =
            (0.114f * (p._1 & 0xff) + 0.587f * (p._2 & 0xff) +
              0.299f * (p._3 & 0xff))
          MediaFeatures(r.doc_id, r.payload.length, header, Array(
            img.width.toFloat, img.height.toFloat,
            sb.toFloat / n, sg.toFloat / n, sr.toFloat / n,
            (0.114f * sb + 0.587f * sg + 0.299f * sr) / n,
            luma(img.at(0, 0)), luma(img.at(img.width / 2, img.height / 2))))
        }
      }
  }

  /** Decode just the dims from the BMP header — the input a ViT packing
    * planner actually reads per image.
    */
  def decodeDims(spark: SparkSession, media: DataFrame)
  : Dataset[MediaDims] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img = parseBmp(r.payload)
          MediaDims(r.doc_id, r.payload.length.toLong, img.width.toLong,
            img.height.toLong)
        }
      }
  }

  /** Real nearest-neighbor resize: decode the BMP, keep pixels at
    * (factor·x, factor·y) — so new dims are ⌈w/f⌉×⌈h/f⌉ — and RE-ENCODE a
    * valid BMP. Both lengths are real encoded sizes (oracle replays the
    * stride arithmetic).
    */
  def resizeImage(spark: SparkSession, media: DataFrame, factor: Int)
  : Dataset[MediaResized] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img = parseBmp(r.payload)
          val nw = (img.width + factor - 1) / factor
          val nh = (img.height + factor - 1) / factor
          val stride = bmpStride(nw)
          val out = new Array[Byte](54 + stride * nh)
          out(0) = 'B'; out(1) = 'M'
          putLe32(out, 2, out.length)
          putLe32(out, 10, 54)
          putLe32(out, 14, 40)
          putLe32(out, 18, nw)
          putLe32(out, 22, nh)
          putLe16(out, 26, 1)
          putLe16(out, 28, 24)
          putLe32(out, 34, stride * nh)
          putLe32(out, 38, 2835); putLe32(out, 42, 2835)
          var y = 0
          while (y < nh) {
            val rowOff = 54 + (nh - 1 - y) * stride
            var x = 0
            while (x < nw) {
              val (b, g, rr) = img.at(x * factor, y * factor)
              val o = rowOff + 3 * x
              out(o) = b; out(o + 1) = g; out(o + 2) = rr
              x += 1
            }
            y += 1
          }
          MediaResized(r.doc_id, out, r.payload.length, out.length)
        }
      }
  }

  /** Real audio metadata decode: walk the RIFF chunk list, return rate +
    * sample count per payload.
    */
  def decodeWavMeta(spark: SparkSession, media: DataFrame)
  : Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (meta, _) = parseWav(r.payload)
          AudioMeta(r.doc_id, meta.sampleRate, meta.nSamples)
        }
      }
  }

  /** Frame sampling: every `stride` bytes is a frame offset, bounded by
    * `maxFrames` — byte arithmetic over the REAL encoded payload length.
    * One row per sampled frame; row-local (explode of a bounded sequence).
    */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int, maxFrames: Int)
  : DataFrame =
    df.select(col(idCol), col("media_meta.byte_len").as("byte_len"))
      .withColumn("frame_no",
        explode(sequence(lit(0),
          least(floor((col("byte_len") - 1) / stride),
            lit(maxFrames - 1)))))
      .withColumn("byte_offset", col("frame_no") * stride)
      .select(col(idCol), col("frame_no"), col("byte_offset"))

  /** ViT patch-grid accounting over DECODED dims (from [[decodeDims]]):
    * floor the (width, height) to whole `patch`-pixel cells, count
    * patches, add the CLS slot. Row-local integer arithmetic — zero
    * shuffles, partitioning inherited from the decode.
    */
  def patchGrid(dims: DataFrame, idCol: String, patch: Int = 16)
  : DataFrame =
    dims.select(col(idCol), col("byte_len"), col("width"), col("height"))
      .withColumn("grid_w", floor(col("width") / patch).cast("long"))
      .withColumn("grid_h", floor(col("height") / patch).cast("long"))
      .withColumn("n_patches", col("grid_w") * col("grid_h"))
      .withColumn("n_tokens", col("n_patches") + 1L)

  /** STFT-style frame accounting over DECODED sample counts (from
    * [[decodeWavMeta]]): `frameLen`-sample windows every `hop` samples —
    * the 25 ms / 10 ms @ 16 kHz speech-front-end defaults. Row-local.
    */
  def audioWindows(samples: DataFrame, idCol: String,
      sampleRate: Int = 16000, frameLen: Int = 400, hop: Int = 160)
  : DataFrame =
    samples.select(col(idCol), col("n_samples").cast("long").as("n_samples"))
      .withColumn("n_frames",
        when(col("n_samples") >= frameLen,
          floor((col("n_samples") - frameLen) / hop).cast("long") + 1L)
          .otherwise(0L))
      .withColumn("duration_ms",
        floor(col("n_samples") * 1000L / sampleRate).cast("long"))
      .withColumn("last_frame_start",
        when(col("n_frames") > 0, (col("n_frames") - 1L) * hop)
          .otherwise(lit(null).cast("long")))
}
