package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "image", "hello world payload".getBytes("UTF-8")),
    MediaRecord(2L, "image", Array.empty[Byte]),
    MediaRecord(3L, "video", ("x" * 300).getBytes("UTF-8"))).toDS()

  test("feature extraction is deterministic over bytes; empty payload safe") {
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    assert(f(1L).byte_len === 19L && f(1L).first_byte === 'h'.toInt)
    assert(f(1L).width === 64 + 19 && f(1L).height === 64 + (('h'.toInt * 7) % 768))
    assert(f(2L).byte_len === 0L && f(2L).first_byte === 0)
    // same payload → same phash
    val again = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m.phash).toMap
    assert(f.view.mapValues(_.phash).toMap === again)
  }

  test("frame sampling yields one row per stride window") {
    val frames = Multimodal.sampleFrames(media, stride = 100).collect()
    // payload 3 is 300 bytes → 3 frames; others too short
    assert(frames.count(_.media_id == 3L) === 3)
    assert(frames.count(_.media_id == 1L) === 0)
    assert(frames.map(_.frame_idx).toSet.subsetOf(Set(0, 1, 2)))
  }

  test("packText produces binary payload with typed metadata") {
    val df = Seq((7L, "abc")).toDF("id", "txt")
    val packed = Multimodal.packText(df, "id", "txt", "audio")
    val r = packed.as[MediaRecord].collect()(0)
    assert(r.media_id === 7L && r.media_type === "audio")
    assert(new String(r.payload, "UTF-8") === "abc")
  }
}
