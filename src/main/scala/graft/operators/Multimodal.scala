package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (beyond-reference scope, SURVEY.md §7.4).
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * Spark-side machinery — schema, partition sizing, per-partition batch
  * decode loop, output shape — is real and tested. The codec call itself is
  * STUBBED with a deterministic fake (this container ships no image/audio
  * libs): [[FakeCodec.decode]] parses our synthetic header instead of
  * calling e.g. libjpeg. Swap `decode` for a real codec binding to go to
  * production; nothing else changes.
  */
object Multimodal {

  /** A decoded media asset's typed metadata. */
  final case class MediaMeta(
      id: Long, kind: String, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, ok: Boolean)

  /** Deterministic stand-in for a media codec. Layout of the synthetic
    * "container": bytes 0-1 kind tag, then the payload; dimensions are
    * derived stably from content length and a content hash byte. */
  object FakeCodec {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      if (payload == null || payload.length < 2)
        return MediaMeta(id, "invalid", if (payload == null) 0 else payload.length,
          0, 0, 0, ok = false)
      val kind = (payload(0) & 0xff) % 3 match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val h = java.util.Arrays.hashCode(payload).abs
      MediaMeta(id, kind, payload.length,
        width = 16 + h % 1024, height = 16 + (h / 1024) % 1024,
        n_frames = 1 + payload.length / 256, ok = true)
    }
  }

  /** Decode a binary column partition-by-partition. The real pattern for a
    * 100 TB corpus: repartition so each task holds a bounded byte volume,
    * decode in a tight per-partition loop (amortizing codec init), return
    * a typed Dataset. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String,
      partitions: Int = 0): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    val sized = if (partitions > 0) src.repartition(partitions) else src
    sized.mapPartitions { rows =>
      // per-partition: a real implementation opens the codec once here
      rows.map(r => FakeCodec.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
  }

  /** Frame sampling plan for video-like payloads: every `stride`-th frame
    * index — pure column math, no decode needed. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("id"), explode(
      sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)))
      .as("frame_idx"))

  /** REAL container-header metadata (no stub): sniff PNG/JPEG/GIF/BMP/WAV
    * from the byte layout via the native codegen'd
    * [[graft.functions.MediaProbe]] expression and flatten the struct —
    * the decode-free filter step (resolution/duration/channel gates)
    * that runs before any costly full decode. Map-only: no shuffle, no
    * UDF, stays inside whole-stage codegen. */
  def probeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.MediaProbe.media_probe(col(binCol)).as("__m"))
      .select(col(idCol), col("__m.format").as("format"),
        col("__m.width").as("width"), col("__m.height").as("height"),
        col("__m.channels").as("channels"),
        col("__m.sample_rate").as("sample_rate"),
        col("__m.bit_depth").as("bit_depth"),
        col("__m.duration_ms").as("duration_ms"))
}
