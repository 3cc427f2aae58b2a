package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal path is a REAL codec round trip over synthesized but
  * spec-conformant payloads: these tests byte-verify the BMP/WAV encoders
  * against the format specs and assert the decode reads dims/samples from
  * the actual header bytes — not from a side-channel formula.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "hello world payload"), (2L, "tiny")).toDF("doc_id", "text")

  test("encodeBmp emits a spec-conformant 24-bpp BMP; parseBmp reads dims " +
      "from the header bytes") {
    val bytes = Multimodal.encodeBmp(7L, 5, 3)
    // file header: magic, LE32 size, pixel-data offset 54
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val stride = Multimodal.bmpStride(5) // 3*5=15 → padded to 16
    assert(stride == 16)
    assert(bytes.length == 54 + stride * 3)
    // LE32 size field equals the real length
    val sz = (bytes(2) & 0xff) | ((bytes(3) & 0xff) << 8) |
      ((bytes(4) & 0xff) << 16) | ((bytes(5) & 0xff) << 24)
    assert(sz == bytes.length)
    // dims decoded FROM THE HEADER equal the encoded dims
    val img = Multimodal.parseBmp(bytes)
    assert(img.width == 5 && img.height == 3)
    // pixel content survives the bottom-up/stride round trip
    for (y <- 0 until 3; x <- 0 until 5)
      assert(img.at(x, y) == Multimodal.pixel(7L, x, y),
        s"pixel mismatch at ($x,$y)")
  }

  test("encodeWav emits canonical RIFF/WAVE; parseWav walks chunks and " +
      "round-trips the samples") {
    val bytes = Multimodal.encodeWav(3L, 500)
    assert(bytes.length == 44 + 1000)
    val (meta, samples) = Multimodal.parseWav(bytes, withSamples = true)
    assert(meta == Multimodal.WavMeta(16000, 1, 16, 500))
    assert(samples.length == 500)
    for (i <- 0 until 500)
      assert(samples(i) == Multimodal.sample(3L, i), s"sample $i")
  }

  test("synthesizeBmp: payload is a parseable BMP with dims from the text " +
      "byte length; metadata carries the real encoded size") {
    val media = Multimodal.synthesizeBmp(spark, docs, "doc_id", "text")
    val r = media.filter(col("doc_id") === 1)
      .select(col("payload"), col("media_meta.byte_len"),
        col("media_meta.mime"))
      .collect().head
    val payload = r.getAs[Array[Byte]](0)
    // "hello world payload" = 19 bytes → w=64+19%193=83, h=64+(19*31)%129=137
    val img = Multimodal.parseBmp(payload)
    assert(img.width == 83 && img.height == 137)
    assert(r.getInt(1) == payload.length)
    assert(payload.length == Multimodal.bmpSize(83, 137))
    assert(r.getString(2) == "image/bmp")
  }

  test("decodeImageFeatures: byte_len/header/features computed from the " +
      "actual pixels, deterministically") {
    val media = Multimodal.synthesizeBmp(spark, docs, "doc_id", "text")
    val feats = Multimodal.decodeImageFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    val expectedLen = Multimodal.bmpSize(83, 137)
    assert(feats(1L).byte_len == expectedLen)
    // header: 'BM' + LE32 size + reserved zeros
    val szHex = f"${expectedLen & 0xff}%02x${(expectedLen >> 8) & 0xff}%02x" +
      f"${(expectedLen >> 16) & 0xff}%02x${(expectedLen >> 24) & 0xff}%02x"
    assert(feats(1L).header_hex == s"424d${szHex}0000")
    // features: dims read from header, channel means from real pixels
    assert(feats(1L).feature(0) == 83.0f && feats(1L).feature(1) == 137.0f)
    val img = Multimodal.parseBmp(Multimodal.encodeBmp(1L, 83, 137))
    val meanB = img.bgr.indices.collect {
      case i if i % 3 == 0 => img.bgr(i) & 0xff
    }.sum.toFloat / (83 * 137)
    assert(math.abs(feats(1L).feature(2) - meanB) < 1e-3)
    // determinism
    val again = Multimodal.decodeImageFeatures(spark, media).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
  }

  test("resizeImage: re-encoded BMP has ceil(d/f) dims and nearest-" +
      "neighbor pixels from the REAL source image") {
    val media = Multimodal.synthesizeBmp(spark, docs, "doc_id", "text")
    val out = Multimodal.resizeImage(spark, media, 4).collect()
      .map(r => r.doc_id -> r).toMap
    // doc 1: 83×137 → ⌈83/4⌉×⌈137/4⌉ = 21×35
    val resized = Multimodal.parseBmp(out(1L).payload)
    assert(resized.width == 21 && resized.height == 35)
    assert(out(1L).orig_len == Multimodal.bmpSize(83, 137))
    assert(out(1L).new_len == Multimodal.bmpSize(21, 35))
    // NN semantics: resized (x,y) = source (4x, 4y)
    for (y <- 0 until 35; x <- 0 until 21)
      assert(resized.at(x, y) == Multimodal.pixel(1L, 4 * x, 4 * y),
        s"resized pixel ($x,$y)")
  }

  test("synthesizeWav + decodeWavMeta: chunk walk recovers rate and the " +
      "text-byte-length sample count") {
    val media = Multimodal.synthesizeWav(spark, docs, "doc_id", "text")
    val metas = Multimodal.decodeWavMeta(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).sample_rate == 16000)
    assert(metas(1L).n_samples == 19)  // "hello world payload" bytes
    assert(metas(2L).n_samples == 4)
  }

  test("patch grid: ViT token accounting from header-decoded dims") {
    val media = Multimodal.synthesizeBmp(spark, docs, "doc_id", "text")
    val dims = Multimodal.decodeDims(spark, media).toDF()
    val got = Multimodal.patchGrid(dims, "doc_id", 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // doc 1: 19 text bytes → 83×137 → 5×8 grid, 40 patches, 41 tokens
    assert(got(1L) == ((83L, 137L, 5L, 8L, 40L, 41L)), got)
    // doc 2: 4 bytes → w=68, h=64+124=188 → 4×11 grid
    assert(got(2L) == ((68L, 188L, 4L, 11L, 44L, 45L)), got)
  }

  test("frame sampling: stride offsets over the real encoded length, " +
      "bounded by maxFrames") {
    val media = Multimodal.synthesizeBmp(spark, docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, "doc_id", 8192, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: bmpSize(83,137) = 54 + 252*137 = 34578 bytes, stride 8192 →
    // frames 0..3 capped at maxFrames=3 → 0,1,2
    assert(Multimodal.bmpSize(83, 137) == 34578)
    assert(frames.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      Seq(0L, 1L, 2L))
    // doc 2: bmpSize(68,188) = 54 + 204*188 = 38406 → also capped at 3
    assert(frames.filter(_._1 == 2L).map(_._2).sorted.toSeq ==
      Seq(0L, 1L, 2L))
    assert(frames.forall { case (_, no, off) => off == no * 8192 })
  }
}
