package graft

import graft.mm.Multimodal
import org.apache.spark.sql.functions._

class MmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world this is a fake image payload"),
    (2L, "x" * 200)).toDF("doc_id", "text")

  test("pack → decode: deterministic metadata + fixed-shape features") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val dec = Multimodal.decode(media).collect().sortBy(_.id)
    assert(dec.length == 2)
    assert(dec.forall(d => d.width >= 1 && d.width <= 1920))
    assert(dec.forall(d => d.features.length == 4))
    assert(dec(1).nBytes == 200)
    // deterministic: same input → same decode
    val dec2 = Multimodal.decode(media).collect().sortBy(_.id)
    assert(dec.map(_.width).toSeq == dec2.map(_.width).toSeq)
  }

  test("resize clamps the longer dimension, keeps aspect-ish") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    val resized = Multimodal.resize(Multimodal.decode(media), maxDim = 100).collect()
    assert(resized.forall(d => math.max(d.width, d.height) <= 100))
  }

  test("frame sampling strides fixed-size chunks") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 2)
      .collect().filter(_.id == 2L).sortBy(_.frameIdx)
    // 200 bytes → chunks 0..3 (64,64,64,8); stride 2 → idx 0 and 2
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(frames.head.frameBytes.length == 64)
  }
}
