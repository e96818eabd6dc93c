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
  * DECODE IS A STUB: this container has no media codecs, so
  * [[decodeStub]] derives a deterministic fake "decoded frame" layout
  * from the raw bytes (documented below). The Spark-side plumbing —
  * schema, encoders, partitioning, batch iteration, explode of frames
  * to rows — is real and tested; swapping in libjpeg/ffmpeg means
  * replacing the body of `decodeStub` only.
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

  /** Stub "decoded" media: frame geometry derived from the bytes. */
  case class Decoded(media_id: Long, source: String, n_bytes: Int,
                     frame_len: Int, n_frames: Int)

  /** One sampled frame with its cheap features. */
  case class FrameFeatures(media_id: Long, source: String, frame_idx: Int,
                           byte_sum: Long, byte_min: Int, byte_max: Int)

  /** STUB decoder: pretends the blob is a sequence of fixed-length
    * frames of `frameLen` bytes (a real implementation would parse the
    * container format here). Deterministic: geometry depends only on
    * the byte length. */
  def decodeStub(row: MediaRow, frameLen: Int): Decoded = {
    val n = row.content.length
    Decoded(row.media_id, row.source, n, frameLen,
      (n + frameLen - 1) / frameLen)
  }

  /** Decode + sample every `stride`-th frame + extract per-frame byte
    * features, one partition at a time. The returned Dataset is small
    * (features only) — the binary column does not survive past this
    * operator. */
  def sampleFrameFeatures(media: Dataset[MediaRow], frameLen: Int, stride: Int)
                         (implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { row =>
        val dec = decodeStub(row, frameLen)
        Iterator.range(0, dec.n_frames, stride).map { f =>
          val from = f * frameLen
          val until = math.min(from + frameLen, row.content.length)
          var sum = 0L; var mn = 255; var mx = 0
          var i = from
          while (i < until) {
            val b = row.content(i) & 0xff
            sum += b; if (b < mn) mn = b; if (b > mx) mx = b
            i += 1
          }
          FrameFeatures(row.media_id, row.source, f, sum, mn, mx)
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
