package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extraction / frame-sampling run as
  * partition-local JVM transforms (`Dataset.mapPartitions` — the Scala
  * analog of an arrow-batched Python UDF: one iterator per partition,
  * no per-row task overhead, executors never materialize the whole
  * column).
  *
  * Decode dispatches on the blob's magic bytes. [[decodePpm]] is a
  * REAL decoder for binary PPM (P6) — the netpbm container: ASCII
  * header (`P6`, whitespace/comment-separated width, height, maxval),
  * one whitespace byte, then `width*height*3` raw RGB bytes. Each
  * pixel ROW becomes one frame, so the frame features are per-scanline
  * statistics. Blobs that don't parse (wrong magic, malformed or
  * truncated header, short pixel payload) fall back to [[decodeStub]],
  * which pretends the blob is a sequence of fixed-length frames — the
  * deterministic catch-all for formats this container has no codec
  * for (a production deployment swaps the fallback for libjpeg/ffmpeg
  * calls inside the same partition-local loop).
  *
  * Scale notes: media blobs dominate row size, so operators preserve
  * partitioning (mapPartitions, no shuffle) until the small
  * feature/metadata rows exist, and only those shuffle into joins and
  * aggregations. For 100 TB of media: store blobs in parquet binary
  * columns (or file paths + spark.read.format("binaryFile")), size
  * `spark.sql.files.maxPartitionBytes` so a partition holds a few
  * hundred blobs, and never collect content to the driver.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(media_id: Long, source: String, media_type: String,
                      content: Array[Byte])

  /** Decoded frame geometry: `n_frames` frames of `frame_len` bytes
    * starting at `data_off`; `format` says which decoder produced it
    * ("ppm" = parsed container, "raw" = stub fallback). */
  case class Decoded(media_id: Long, source: String, n_bytes: Int,
                     frame_len: Int, n_frames: Int, data_off: Int,
                     format: String)

  /** One sampled frame with its cheap features. */
  case class FrameFeatures(media_id: Long, source: String, format: String,
                           frame_idx: Int, byte_sum: Long, byte_min: Int,
                           byte_max: Int)

  /** STUB decoder: pretends the blob is a sequence of fixed-length
    * frames of `frameLen` bytes from offset 0. Deterministic: geometry
    * depends only on the byte length. The fallback for formats without
    * a real decoder here. */
  def decodeStub(row: MediaRow, frameLen: Int): Decoded = {
    val n = row.content.length
    Decoded(row.media_id, row.source, n, frameLen,
      (n + frameLen - 1) / frameLen, 0, "raw")
  }

  /** REAL binary-PPM (P6) decoder: parses the netpbm header — magic,
    * then width/height/maxval as ASCII integers separated by
    * whitespace and `#`-to-end-of-line comments — and maps each pixel
    * row (width*3 bytes) to one frame starting after the single
    * whitespace byte that terminates the header. Returns None (caller
    * falls back to the stub) when the magic is absent, a header field
    * is missing or out of range (maxval must fit one byte), or the
    * pixel payload is truncated. */
  def decodePpm(row: MediaRow): Option[Decoded] = {
    val b = row.content
    if (b.length < 2 || b(0) != 'P'.toByte || b(1) != '6'.toByte) None
    else {
      var i = 2
      def skipSeparators(): Unit = {
        var go = true
        while (go && i < b.length) {
          val c = b(i).toChar
          if (c.isWhitespace) i += 1
          else if (c == '#') { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
          else go = false
        }
      }
      def readInt(): Option[Int] = {
        skipSeparators()
        val s = i
        while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte) i += 1
        if (i == s || i - s > 9) None else Some(new String(b, s, i - s).toInt)
      }
      for {
        w <- readInt()
        h <- readInt()
        maxval <- readInt()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        // exactly one whitespace byte separates header from pixels
        if i < b.length && b(i).toChar.isWhitespace
        dataOff = i + 1
        if b.length - dataOff >= w * h * 3 // truncated payload -> stub
      } yield Decoded(row.media_id, row.source, b.length, w * 3, h,
        dataOff, "ppm")
    }
  }

  /** Magic-dispatching decode: real container parse where one exists,
    * stub geometry otherwise. */
  def decode(row: MediaRow, frameLen: Int): Decoded =
    decodePpm(row).getOrElse(decodeStub(row, frameLen))

  /** Decode + sample every `stride`-th frame + extract per-frame byte
    * features, one partition at a time. The returned Dataset is small
    * (features only) — the binary column does not survive past this
    * operator. */
  def sampleFrameFeatures(media: Dataset[MediaRow], frameLen: Int, stride: Int)
                         (implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { row =>
        val dec = decode(row, frameLen)
        Iterator.range(0, dec.n_frames, stride).map { f =>
          val from = dec.data_off + f * dec.frame_len
          val until = math.min(from + dec.frame_len, row.content.length)
          var sum = 0L; var mn = 255; var mx = 0
          var i = from
          while (i < until) {
            val b = row.content(i) & 0xff
            sum += b; if (b < mn) mn = b; if (b > mx) mx = b
            i += 1
          }
          FrameFeatures(row.media_id, row.source, dec.format, f, sum, mn, mx)
        }
      }
    }
  }

  /** The documents table re-imagined as media: text bytes as the blob
    * (pure-ASCII in the test data, so byte features equal ascii-code
    * features — which is what makes the DuckDB oracle possible). */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      col("source"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("content"))
      .as[MediaRow]
  }
}
