package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("feature extraction is deterministic and batch-shaped") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, "image", "abc".getBytes("UTF-8")),
      MediaRecord(2L, "video", "defg".getBytes("UTF-8")),
      MediaRecord(3L, "audio", Array[Byte]())).toDS()
    val out = Multimodal.extractFeatures(recs).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).nBytes === 3L)
    // checksum: ((('a'*31)+'b')*31+'c') % p
    val expected = (((97L * 31 + 98) % 1000000007L) * 31 + 99) % 1000000007L
    assert(out(0).checksum === expected)
    assert(out(1).frames > 1)        // video has frames
    assert(out(2).nBytes === 0L)     // empty payload survives the codec
    // re-run gives identical features (stub codec is pure)
    val again = Multimodal.extractFeatures(recs).collect().sortBy(_.id)
    assert(again.toSeq === out.toSeq)
  }

  test("asMediaRecords wraps a DataFrame column as binary payloads") {
    import spark.implicits._
    val df = Seq((10L, "{\"k\": 1}"), (11L, "{\"k\": 2}"))
      .toDF("event_id", "props")
    val ds = Multimodal.asMediaRecords(df, "event_id", "props", "image")
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length === 2 && feats.forall(_.nBytes === 8L))
  }
}
