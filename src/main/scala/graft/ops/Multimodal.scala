package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque `binary`
  * payloads with typed metadata, batch-decoded per partition.
  *
  * The decode step itself is a STUB (this container ships no image/audio
  * codecs): `decodeFeaturesStub` derives deterministic fake features from the
  * raw bytes. Everything around it is the real Spark shape — binary column +
  * metadata struct schema, `mapPartitions` batch iteration (the Scala
  * analogue of `mapInPandas`: one iterator per partition so a real codec
  * could amortize per-batch init), and partition-count control for
  * decode-cost balancing.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, byte_len: Int, header_hex: String,
      feature: Array[Float])

  /** Attach a binary payload + typed metadata struct to a text corpus
    * (payload := utf-8 bytes stands in for real media bytes).
    */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        length(col(textCol).cast("binary")).as("byte_len"),
        lit("text/plain").as("mime"),
        lit(1).as("channels")).as("media_meta"))

  /** Batch decode via mapPartitions — the per-partition iterator is where a
    * real codec would be initialized once and reused. STUB: features are a
    * deterministic hash-derived fake (8 floats), byte length and an 8-byte
    * header hex are real.
    */
  def decodeFeaturesStub(spark: SparkSession, media: DataFrame)
  : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), lit("raw").as("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() — once per partition
        it.map { r =>
          val header = r.payload.take(8).map("%02x".format(_)).mkString
          val fake = Array.tabulate(8) { i =>
            // ??? real decode goes here; deterministic stand-in:
            ((java.util.Arrays.hashCode(r.payload) * (i + 1)) % 1000) / 1000.0f
          }
          MediaFeatures(r.doc_id, r.payload.length, header, fake)
        }
      }
  }

  case class MediaResized(doc_id: Long, payload: Array[Byte],
      orig_len: Int, new_len: Int)

  /** Resize plumbing: downsample the payload by keeping every `factor`-th
    * byte — the partition-local pass a real image resampler would be
    * (decode → scale → re-encode), minus the codec. Output length is
    * `ceil(len / factor)`, which the catalog query oracle-checks; the
    * byte selection itself is deterministic (offsets 0, factor, 2·factor…).
    */
  def resizeStub(spark: SparkSession, media: DataFrame, factor: Int)
  : Dataset[MediaResized] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), lit("raw").as("format"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // real impl: scaler initialized once per partition
        it.map { r =>
          val out = r.payload.indices.collect {
            case i if i % factor == 0 => r.payload(i)
          }.toArray
          MediaResized(r.doc_id, out, r.payload.length, out.length)
        }
      }
  }

  /** Frame sampling plumbing: every `stride` bytes is a "frame" offset —
    * the byte arithmetic a real video frame-sampler would do, minus the
    * codec. One row per sampled frame.
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

  /** ViT patch-grid plumbing: the tokenizer-side arithmetic a vision
    * transformer's preprocessor does per image — floor the (width, height)
    * to whole `patch`-pixel cells, count patches, add the CLS slot. The
    * image DIMENSIONS are a deterministic stand-in derived from the
    * payload length (the codec that would read them from the real header
    * is the container's one missing piece, same stub boundary as
    * [[decodeFeaturesStub]]); everything downstream of the dims — the
    * grid/token accounting a packing planner budgets sequence length
    * with — is the real, fully oracle-replayable shape. Entirely
    * row-local: zero shuffles, partitioning inherited from the scan.
    */
  def patchGrid(media: DataFrame, idCol: String, patch: Int = 16)
  : DataFrame =
    media.select(col(idCol),
        col("media_meta.byte_len").cast("long").as("byte_len"))
      // stand-in dims: 64..256-ish px, deterministic in the payload bytes
      .withColumn("width", lit(64L) + pmod(col("byte_len"), lit(193L)))
      .withColumn("height", lit(64L) + pmod(col("byte_len") * 31L, lit(129L)))
      .withColumn("grid_w", floor(col("width") / patch).cast("long"))
      .withColumn("grid_h", floor(col("height") / patch).cast("long"))
      .withColumn("n_patches", col("grid_w") * col("grid_h"))
      .withColumn("n_tokens", col("n_patches") + 1L)

  /** STFT-style audio frame accounting: the payload stands in for 16-bit
    * mono PCM (n_samples = byte_len / 2), framed with `frameLen`-sample
    * windows every `hop` samples — the 25 ms / 10 ms @ 16 kHz defaults of
    * speech front ends. Pure row-local integer arithmetic (the feature
    * extractor's budget input, like [[patchGrid]] for ViT); the decode
    * itself stays behind the documented codec stub.
    */
  def audioWindows(media: DataFrame, idCol: String, sampleRate: Int = 16000,
      frameLen: Int = 400, hop: Int = 160): DataFrame =
    media.select(col(idCol),
        floor(col("media_meta.byte_len").cast("long") / 2L)
          .cast("long").as("n_samples"))
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
