package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private implicit def s: org.apache.spark.sql.SparkSession = spark
  import Multimodal._

  test("decodeStub frame geometry: ceil division, last frame short") {
    val row = MediaRow(1L, "src", "video/fake", Array.fill[Byte](70)(1))
    val d = decodeStub(row, frameLen = 16)
    assert(d.n_frames == 5 && d.n_bytes == 70 && d.frame_len == 16)
  }

  test("sampleFrameFeatures strides frames and folds bytes within each frame") {
    import spark.implicits._
    // 40 bytes: values 0..39; frames of 10 -> 4 frames; stride 2 -> frames 0, 2
    val bytes = Array.tabulate[Byte](40)(_.toByte)
    val media = Seq(MediaRow(7L, "a", "image/fake", bytes)).toDS()
    val got = sampleFrameFeatures(media, frameLen = 10, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(got(0).byte_sum == (0 until 10).sum)
    assert(got(0).byte_min == 0 && got(0).byte_max == 9)
    assert(got(1).byte_sum == (20 until 30).sum)
    assert(got(1).byte_min == 20 && got(1).byte_max == 29)
  }

  test("unsigned byte handling: values over 127 fold correctly") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "a", "image/fake",
      Array(0xff.toByte, 0x80.toByte, 0x00.toByte))).toDS()
    val got = sampleFrameFeatures(media, frameLen = 4, stride = 1).collect().head
    assert(got.byte_sum == 255 + 128)
    assert(got.byte_max == 255 && got.byte_min == 0)
  }

  test("mediaFromDocuments carries text bytes as the binary column") {
    import spark.implicits._
    val docs = Seq((1L, "hello", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = mediaFromDocuments(docs).collect().head
    assert(m.media_id == 1L && m.source == "s0")
    assert(new String(m.content, "UTF-8") == "hello")
  }
}
