package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload: binary bytes + typed metadata columns. */
final case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

/** Decoded/feature-extracted view of one media record. */
final case class MediaFeatures(media_id: Long, media_type: String,
                               byte_len: Long, first_byte: Int,
                               width: Int, height: Int, phash: Long)

/** One sampled frame of a video-like payload. */
final case class MediaFrame(media_id: Long, frame_idx: Int, frame_hash: Long)

/**
 * Multimodal column handling: image/audio/video as opaque `binary` columns
 * with typed metadata, decoded via per-partition batch functions.
 *
 * The decode step is a clearly-marked deterministic STUB (no image/audio
 * libraries in this container) — the Spark-side plumbing (schema, typed
 * Datasets, mapPartitions batching, partition sizing) is real and is what a
 * production codec would plug into.
 */
object Multimodal {

  /** Pack a text table into binary payloads (dev stand-in for real media). */
  def packText(df: DataFrame, idCol: String, textCol: String,
               mediaType: String = "image"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("payload"))

  // ---- STUB decode ----------------------------------------------------
  // A real implementation would decode image bytes here (e.g. via a JNI
  // codec) inside the same per-partition loop. The fake is a pure,
  // deterministic function of the bytes so tests and oracles can verify
  // the plumbing end-to-end.
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val len = payload.length
    val first = if (len > 0) payload(0) & 0xff else 0
    val width = 64 + (len % 1024)
    val height = 64 + ((first * 7) % 768)
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    var i = 0
    while (i < len) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    (width, height, h)
  }

  /**
   * Feature extraction over media payloads: one batch function per
   * partition (amortizes codec init the way a Pandas-UDF batch would),
   * typed output schema. Partition-parallel; no driver materialization.
   */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec initialization would happen once per partition here
      it.map { m =>
        val (w, h, ph) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
          if (m.payload.nonEmpty) m.payload(0) & 0xff else 0, w, h, ph)
      }
    }
  }

  /**
   * Frame sampling for video-like payloads: every `stride`-th byte window
   * becomes one "frame" row (STUB for real frame extraction). Output is
   * exploded to one row per sampled frame — downstream ops (dedup, ANN on
   * frame embeddings) operate on this long-form table.
   */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 64): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = math.max(m.payload.length / stride, 0)
      (0 until n).map { idx =>
        val slice = m.payload.slice(idx * stride, (idx + 1) * stride)
        var h = 1125899906842597L
        slice.foreach(b => h = 31 * h + (b & 0xff))
        MediaFrame(m.media_id, idx, h)
      }
    }
  }

  /** DataFrame facade over [[extractFeatures]] for dynamic-schema callers. */
  def extractFeaturesDf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(media.as[MediaRecord]).toDF()
  }
}
