package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.MediaCodecs

/** Multimodal (image/audio/video) pipeline for training data (task brief):
  * opaque `binary` payloads + typed metadata travel through Spark untouched;
  * decode / feature-extract / resize / frame-sample run as partition-batched
  * typed transformations — the Scala analogue of `mapInPandas` (one iterator
  * per partition, amortized per-batch setup).
  *
  * Round 5 removed the stub boundary: the codecs are REAL pure-JVM decoders
  * ([[graft.core.MediaCodecs]]) for one library-free format per modality —
  * BMP (24-bit bitmap), WAV (PCM s16le mono), Y4M (YUV4MPEG2 Cmono) — so
  * decoded width/height/duration/frame-count and the content statistics
  * (mean luma, RMS amplitude, thumbnail mean after a real nearest-neighbour
  * resize, stride-2 frame sampling) are genuine functions of the payload
  * bytes. Corrupt payloads degrade to a decode_ok=false row with zeroed
  * stats — deterministic, never a throw (the parser-kernel contract).
  *
  * Plan shape at 100 TB: one mapPartitions over the media scan — no
  * shuffle, no driver collect; per-partition setup is where a heavier
  * codec would initialize once.
  */
object Multimodal {

  final case class MediaIn(
      doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  final case class MediaFeature(
      doc_id: Long, kind: String, format: String,
      byte_len: Long,
      decode_ok: Boolean,
      /** header dims (image/video); 0 for audio. */
      decoded_w: Int, decoded_h: Int,
      /** seconds of PCM audio; 0 for non-audio. */
      duration_sec: Double,
      /** total / stride-2-sampled frames; 0 for non-video. */
      n_frames: Int, n_frames_sampled: Int,
      /** mean luma (image, video's sampled frames) or RMS amplitude. */
      mean_signal: Double,
      /** real nearest-neighbour thumbnail (image): dims + mean luma. */
      thumb_w: Int, thumb_h: Int, thumb_mean: Double)

  private def r4(x: Double): Double = math.rint(x * 10000) / 10000

  /** Partition-batched decode + feature extraction over the media table. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { batch =>
      batch.map { m =>
        val len = if (m.payload == null) 0L else m.payload.length.toLong
        def failed = MediaFeature(m.doc_id, m.kind, m.format, len,
          decode_ok = false, 0, 0, 0.0, 0, 0, 0.0, 0, 0, 0.0)
        m.kind match {
          case "image" => MediaCodecs.decodeBmp(m.payload).fold(failed) { i =>
            MediaFeature(m.doc_id, m.kind, m.format, len, decode_ok = true,
              i.width, i.height, 0.0, 0, 0, r4(i.meanLuma),
              i.thumbW, i.thumbH, r4(i.thumbMeanLuma))
          }
          case "audio" => MediaCodecs.decodeWav(m.payload).fold(failed) { a =>
            MediaFeature(m.doc_id, m.kind, m.format, len, decode_ok = true,
              0, 0, r4(a.durationSec), 0, 0, r4(a.rms), 0, 0, 0.0)
          }
          case "video" => MediaCodecs.decodeY4m(m.payload).fold(failed) { v =>
            MediaFeature(m.doc_id, m.kind, m.format, len, decode_ok = true,
              v.width, v.height, 0.0, v.nFrames, v.nSampled,
              r4(v.sampledMeanLuma), 0, 0, 0.0)
          }
          case _ => failed
        }
      }
    }
  }
}
