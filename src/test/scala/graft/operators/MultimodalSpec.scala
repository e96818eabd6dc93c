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

  test("decodePpm parses a well-formed P6 header: scanline frames from the pixel offset") {
    val header = "P6\n4 3\n255\n"
    val pixels = Array.tabulate[Byte](4 * 3 * 3)(i => (i + 10).toByte)
    val row = MediaRow(2L, "img", "image/x-portable-pixmap",
      header.getBytes("UTF-8") ++ pixels)
    val d = decodePpm(row).get
    assert(d.format == "ppm" && d.frame_len == 12 && d.n_frames == 3)
    assert(d.data_off == header.length)
    // features come from pixel bytes only — the header is excluded
    import spark.implicits._
    val got = sampleFrameFeatures(Seq(row).toDS(), frameLen = 16, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3 && got.forall(_.format == "ppm"))
    assert(got(0).byte_sum == (10 until 22).sum)
    assert(got(2).byte_min == 34 && got(2).byte_max == 45)
  }

  test("decodePpm skips #-comments and multi-whitespace in the header") {
    val header = "P6 # a comment\n# another\n 2\t2 #w h\n255\n"
    val row = MediaRow(3L, "img", "x",
      header.getBytes("UTF-8") ++ Array.fill[Byte](12)(7))
    val d = decodePpm(row).get
    assert(d.frame_len == 6 && d.n_frames == 2 && d.data_off == header.length)
  }

  test("malformed or foreign blobs fall back to the stub decoder") {
    def fmt(bytes: Array[Byte]) =
      decode(MediaRow(9L, "s", "x", bytes), frameLen = 16).format
    // wrong magic (lowercase / absent)
    assert(fmt("p6\n2 2\n255\n0123456789ab".getBytes) == "raw")
    assert(fmt("hello world".getBytes) == "raw")
    // truncated header: width present, height missing
    assert(fmt("P6\n4 ".getBytes) == "raw")
    // maxval out of byte range
    assert(fmt(("P6\n2 2\n65535\n" + "x" * 12).getBytes) == "raw")
    // truncated pixel payload (needs 12, has 5)
    assert(fmt("P6\n2 2\n255\nxxxxx".getBytes) == "raw")
    // zero dimension
    assert(fmt("P6\n0 2\n255\n".getBytes) == "raw")
    // and the stub still frames the bytes deterministically
    val d = decode(MediaRow(9L, "s", "x", "P6\n4 ".getBytes), frameLen = 16)
    assert(d.n_frames == 1 && d.data_off == 0 && d.n_bytes == 5)
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
