package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.FakeCodec
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the stub codec's determinism and shape contracts
  * (fixed-size outputs regardless of input size — the property that bounds
  * executor memory in a media pass) and the distributed thumbnail/keyframe
  * stage end to end.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val payload = Array.tabulate(100)(i => (i * 7 % 251).toByte)

  test("codec determinism: frames/feature/resize/sampleFrames are pure") {
    assert(FakeCodec.frames(payload).toSeq === FakeCodec.frames(payload.clone).toSeq)
    assert(FakeCodec.feature(payload).toSeq === FakeCodec.feature(payload.clone).toSeq)
    assert(FakeCodec.resize(payload, 16).toSeq === FakeCodec.resize(payload.clone, 16).toSeq)
  }

  test("shape contracts: fixed-width outputs, ceil-division frame counts") {
    assert(FakeCodec.frames(payload).length === 4) // ceil(100/32)
    assert(FakeCodec.feature(payload).length === FakeCodec.FeatureDim)
    assert(FakeCodec.resize(payload, 16).length === 16)
    assert(FakeCodec.resize(Array.emptyByteArray, 16).length === 16)
    // stride 4 over 4 frames keeps frame 0 only; stride 1 keeps all
    assert(FakeCodec.sampleFrames(payload, 4).length === 1)
    assert(FakeCodec.sampleFrames(payload, 1).length === 4)
    // resize preserves first byte (stride sampling anchors at index 0)
    assert(FakeCodec.resize(payload, 16)(0) === payload(0))
  }

  test("distributed thumbnails: one fixed-size row per record") {
    val media = Multimodal.asMedia(spark, MiniData.dir)
    val thumbs = Multimodal.thumbnails(media, width = 8, frameStride = 2).collect()
    assert(thumbs.length === media.count())
    assert(thumbs.forall(_.thumb.length === 8))
    assert(thumbs.forall(_.n_keyframes >= 1))
    // deterministic across runs
    val again = Multimodal.thumbnails(media, width = 8, frameStride = 2).collect()
    assert(thumbs.map(t => (t.doc_id, t.thumb.toSeq)).sortBy(_._1).toSeq ===
      again.map(t => (t.doc_id, t.thumb.toSeq)).sortBy(_._1).toSeq)
  }
}
