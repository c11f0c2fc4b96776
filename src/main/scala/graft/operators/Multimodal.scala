package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. */
final case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    bytes: Array[Byte],
    meta: Map[String, String],
)

/** Decoded media — what a real codec would hand back. */
final case class DecodedMedia(
    width: Int,
    height: Int,
    channels: Int,
    pixels: Array[Byte],
)

/** Extracted features, the pipeline's output schema. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    num_bytes: Long,
    width: Int,
    height: Int,
    brightness_histogram: Array[Long], // 16 bins
    frames_sampled: Int,
)

/** Pluggable decode step. The container has no image/audio codec
  * libraries, so the shipped implementation is [[FakeDecoder]] — a
  * clearly-marked deterministic stand-in. The Spark-side plumbing
  * (schema, partitioning, per-partition batching, feature extraction) is
  * real and tested; swapping in a JNI/FFMPEG decoder outside this sandbox
  * changes ONLY this trait's binding.
  */
trait MediaDecoder extends Serializable {
  def decode(bytes: Array[Byte]): DecodedMedia
}

/** STUB decoder: derives a fake raster deterministically from the raw
  * bytes (no codec libs in this container). Dimensions come from the byte
  * length; "pixels" are the bytes themselves.
  */
object FakeDecoder extends MediaDecoder {
  override def decode(bytes: Array[Byte]): DecodedMedia = {
    val side = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
    DecodedMedia(side, math.max(1, bytes.length / side), 1, bytes)
  }
}

/** Multimodal feature extraction over binary columns (SURVEY-adjacent
  * training-data layer).
  *
  * Scale shape: media bytes are the widest column by far, so the operator
  * (1) never shuffles the bytes — features are extracted in a single
  * mapPartitions pass over the scan, and only the small feature rows flow
  * downstream; (2) processes rows streaming (no per-partition
  * materialization), so one task handles arbitrarily many objects at a
  * bounded memory footprint.
  */
object Multimodal {

  /** Wrap any (id, text-ish payload) table as a media table — used to
    * exercise the pipeline in this codec-less sandbox (bytes = utf8 of a
    * string column).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String)
      : Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("bytes"),
        map(lit("origin"), lit("synthetic")).as("meta"),
      )
      .as[MediaRow]
  }

  /** Decode + feature-extract; `frameStride` samples every k-th row block
    * of the raster (the frame-sampling analogue for "video").
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder,
      frameStride: Int = 4,
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val d = decoder.decode(m.bytes)
        val hist = new Array[Long](16)
        var frames = 0
        var row = 0
        while (row < d.height) {
          frames += 1
          var i = row * d.width
          val end = math.min(i + d.width, d.pixels.length)
          while (i < end) {
            hist((d.pixels(i) & 0xff) >> 4) += 1
            i += 1
          }
          row += frameStride
        }
        MediaFeatures(
          m.media_id,
          m.kind,
          m.bytes.length.toLong,
          d.width,
          d.height,
          hist,
          frames,
        )
      }
    }
  }
}
