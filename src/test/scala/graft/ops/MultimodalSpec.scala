package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "hello world payload"), (2L, "tiny")).toDF("doc_id", "text")

  test("binary payload + typed metadata struct") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val r = media.filter(col("doc_id") === 1)
      .select(col("media_meta.byte_len"), col("media_meta.mime"))
      .collect().head
    assert(r.getInt(0) == 19)
    assert(r.getString(1) == "text/plain")
  }

  test("decode stub: per-partition iterator yields deterministic features") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val feats = Multimodal.decodeFeaturesStub(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len == 19)
    assert(feats(1L).header_hex == "68656c6c6f20776f")  // "hello wo"
    assert(feats(1L).feature.length == 8)
    // determinism: re-run produces identical features
    val again = Multimodal.decodeFeaturesStub(spark, media).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
  }

  test("resize stub: every k-th byte kept, ceil(len/k) length") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val out = Multimodal.resizeStub(spark, media, 4).collect()
      .map(r => r.doc_id -> r).toMap
    // doc 1: "hello world payload" (19 bytes) → offsets 0,4,8,12,16
    assert(out(1L).orig_len == 19 && out(1L).new_len == 5)
    assert(new String(out(1L).payload, "UTF-8") == "horpo")
  }

  test("patch grid: ViT token accounting from stand-in dims") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val got = Multimodal.patchGrid(media, "doc_id", 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // doc 1: 19 bytes → w=64+19%193=83, h=64+(19*31)%129=137 → 5×8 grid
    assert(got(1L) == ((19L, 83L, 137L, 5L, 8L, 40L, 41L)), got)
    // doc 2: 4 bytes → w=68, h=64+124=188 → 4×11 grid
    assert(got(2L) == ((4L, 68L, 188L, 4L, 11L, 44L, 45L)), got)
  }

  test("frame sampling: stride offsets bounded by maxFrames") {
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, "doc_id", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 19 bytes, stride 8 → frames 0,1,2 (capped by bytes: (19-1)/8=2)
    assert(frames.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(frames.filter(_._1 == 2L).map(_._2).toSeq == Seq(0L))
    assert(frames.forall { case (_, no, off) => off == no * 8 })
  }
}
