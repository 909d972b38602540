package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) plumbing for a training-data pipeline
  * (task brief): opaque `binary` payloads + typed metadata travel through
  * Spark untouched; decode / feature-extract / resize / frame-sample run as
  * partition-batched typed transformations — the Scala analogue of
  * `mapInPandas` (one iterator per partition, amortized per-batch setup).
  *
  * ==== STUB BOUNDARY ====
  * This container has no image/audio codecs, so [[DecoderStub]] is a
  * clearly-marked DETERMINISTIC FAKE: it derives "decoded" statistics from
  * the payload bytes. The Spark-side plumbing — schema, partitioning, typed
  * signatures, batch shape — is real and tested (MultimodalSpec); swapping
  * in a real codec means replacing DecoderStub only.
  */
object Multimodal {

  final case class MediaIn(
      doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  final case class MediaFeature(
      doc_id: Long, kind: String, format: String,
      byte_len: Long, mean_byte: Double, content_hash: Long,
      thumb_w: Int, thumb_h: Int, n_frames_sampled: Int)

  /** The per-modality "codec" — a deterministic stub (see class note). */
  object DecoderStub {
    /** "Decode" payload bytes → (mean byte value, 64-bit content hash). */
    def decodeStats(payload: Array[Byte]): (Double, Long) = {
      var sum = 0L
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        sum += payload(i) & 0xff
        h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
        i += 1
      }
      (if (payload.length == 0) 0.0 else sum.toDouble / payload.length, h)
    }

    /** Resize stub: fit (w, h) into a 32x32 box preserving aspect ratio. */
    def thumbnail(w: Int, h: Int): (Int, Int) = {
      val scale = 32.0 / math.max(math.max(w, h), 1)
      (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    }

    /** Frame-sample stub: videos yield ceil(byte_len / 4096) frames. */
    def sampleFrames(kind: String, byteLen: Int): Int =
      if (kind == "video") ((byteLen + 4095) / 4096) else 0
  }

  /** Partition-batched decode + feature extraction over the media table. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { batch =>
      // Per-partition setup would initialize the real codec once here.
      batch.map { m =>
        val (meanByte, hash) = DecoderStub.decodeStats(m.payload)
        val (tw, th) = DecoderStub.thumbnail(m.width, m.height)
        MediaFeature(
          m.doc_id, m.kind, m.format,
          m.payload.length.toLong,
          math.rint(meanByte * 10000) / 10000,
          hash, tw, th,
          DecoderStub.sampleFrames(m.kind, m.payload.length))
      }
    }
  }
}
