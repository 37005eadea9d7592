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

/** Real-container decode result: BMP fills width/height/bits, WAV fills
  * channels/sample_rate/bits/duration_ms, unparseable payloads come back
  * `container = "unknown"` with zeros (quarantine, don't kill the job). */
final case class MediaDecoded(media_id: Long, container: String,
                              width: Int, height: Int, channels: Int,
                              sample_rate: Int, bits: Int, duration_ms: Long)

/** One output sample of a 2:1 audio decimation (channel 0). */
final case class ResampledSample(media_id: Long, in_samples: Long,
                                 out_samples: Long, out_idx: Long, value: Double)

/** One output pixel of a 2:1 nearest-neighbor image downsample
  * (top-down coordinates; b/g/r are unsigned byte values 0-255). */
final case class DownsampledPixel(media_id: Long, out_w: Int, out_h: Int,
                                  x: Int, y: Int, b: Int, g: Int, r: Int)

/** 64-bit perceptual difference hash of one image payload. */
final case class ImageHash(media_id: Long, dhash: Long)

/** 64-bit perceptual dHash of ONE video keyframe (m14). */
final case class VideoFrameHash(media_id: Long, frame_idx: Int, fdhash: Long)

/** 64-bit energy-envelope fingerprint of one audio payload. */
final case class AudioFp(media_id: Long, afp: Long)

/** 64-bit energy-envelope fingerprint of ONE audio segment (m17). */
final case class AudioSegFp(media_id: Long, seg_idx: Int, afp: Long)

/** PNG IHDR decode result with CRC32 validation verdict. */
final case class PngDecoded(media_id: Long, is_png: Boolean, width: Int,
                            height: Int, bit_depth: Int, color_type: Int,
                            crc_ok: Boolean)

/** GIF container decode result: logical-screen fields + a full block walk
  * (frame count, trailer verdict). */
final case class GifDecoded(media_id: Long, is_gif: Boolean, width: Int,
                            height: Int, gct_entries: Int, n_frames: Int,
                            trailer_ok: Boolean)

/** JPEG marker-walk decode result: SOF frame-header fields (dims,
  * component count, baseline vs progressive) + end-of-image verdict. */
final case class JpegDecoded(media_id: Long, is_jpeg: Boolean, width: Int,
                             height: Int, n_components: Int,
                             progressive: Boolean, eoi_ok: Boolean)

/** ID3v2 tag decode result: header fields + a frame walk with a padding
  * verdict. */
final case class Id3Decoded(media_id: Long, is_id3: Boolean, version: Int,
                            n_frames: Int, tag_size: Int,
                            has_title: Boolean, padding_ok: Boolean)

/** AVI (RIFF video) decode result: `avih` main-header fields + the
  * nested-LIST `movi` walk's stream-chunk counts and a clean-end verdict
  * (false on truncation or any declared-size overshoot). */
final case class AviDecoded(media_id: Long, is_avi: Boolean,
                            us_per_frame: Int, total_frames: Int,
                            n_streams: Int, width: Int, height: Int,
                            video_chunks: Int, audio_chunks: Int,
                            clean_end: Boolean)

/**
 * Multimodal column handling: image/audio/video as opaque `binary` columns
 * with typed metadata, decoded via per-partition batch functions.
 *
 * This file holds the Dataset-level OPERATORS (the Spark plumbing: typed
 * Datasets, mapPartitions batching, quarantine-lane output schemas).
 * Byte-level container codecs live in [[MediaContainers]] and the
 * deterministic real-container fixtures in [[MediaFixtures]] — both mixed
 * in (round-10 file split, pure move), so `Multimodal.packMediaById` /
 * `Multimodal.decodeBmp` / ... keep their call sites. Only the m1/m2
 * feature-extract path uses a clearly-marked deterministic STUB (no
 * image/audio libraries in this container); BMP/WAV/PNG/GIF/JPEG/ID3
 * decode is REAL header/stream parsing a production codec would extend.
 */
object Multimodal extends MediaFixtures with MediaDedup {

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

  // ---- REAL container decode (pure JVM, no codec libraries) -----------
  // BMP (BITMAPINFOHEADER) and WAV (RIFF/PCM) headers parsed byte-for-byte
  // — the decode step of this family is no longer a stub for these two
  // containers; the mapPartitions seam is the same one a JNI codec would
  // plug into. Anything else still routes to "unknown" (a 100 TB pipeline
  // quarantines undecodable payloads; it never throws mid-scan).

  /**
   * Decode media payloads into typed container features: real BMP/WAV
   * header parses, `"unknown"` + zeros for anything else. Same batch
   * mapPartitions shape as [[extractFeatures]] — partition-parallel, one
   * decoder init per partition, no driver materialization.
   */
  def decodeMedia(media: Dataset[MediaRecord]): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeBmp(m.payload) match {
          case Some((w, h, bpp)) =>
            MediaDecoded(m.media_id, "bmp", w, h, 0, 0, bpp, 0L)
          case None => decodeWav(m.payload) match {
            case Some((ch, rate, bits, durMs)) =>
              MediaDecoded(m.media_id, "wav", 0, 0, ch, rate, bits, durMs)
            case None =>
              MediaDecoded(m.media_id, "unknown", 0, 0, 0, 0, 0, 0L)
          }
        }
      }
    }
  }

  /**
   * REAL audio DSP in the codec seam: 2:1 decimation of channel 0 with a
   * box filter (each output sample = mean of two consecutive inputs) —
   * the resample/feature-extract stage a speech-data pipeline runs
   * between ingest and training. PCM is parsed from the actual container
   * bytes (8-bit unsigned recentered to ±, 16-bit little-endian signed,
   * frame stride = blockAlign so multi-channel payloads pick channel 0
   * correctly); non-WAV payloads are skipped (quarantine upstream at m3).
   *
   * Same mapPartitions batch shape as [[decodeMedia]] — partition-
   * parallel, one decoder init per partition, output size ≈ input/2, no
   * driver materialization. The mean of two ints in /2.0 is exactly
   * representable, so values replay bit-identically on any engine.
   */
  def resampleAudio2x(media: Dataset[MediaRecord]): Dataset[ResampledSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeWavChunks(m.payload) match {
          case Some((ch, _, bits, _, dataOff, dataSize)) if bits == 8 || bits == 16 =>
            val ba = ch * bits / 8
            // clamp against truncated payloads: never read past the bytes
            val avail = math.min(dataSize, (m.payload.length - dataOff).toLong)
            val n = if (ba > 0) (avail / ba).toInt else 0
            def sample(s: Int): Int = {
              val off = dataOff + s * ba
              if (bits == 8) (m.payload(off) & 0xff) - 128
              else ((m.payload(off) & 0xff) | (m.payload(off + 1) << 8)).toShort.toInt
            }
            val out = n / 2
            (0 until out).iterator.map { t =>
              ResampledSample(m.media_id, n.toLong, out.toLong, t.toLong,
                (sample(2 * t) + sample(2 * t + 1)) / 2.0)
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  /**
   * REAL image DSP in the codec seam: 2:1 nearest-neighbor downsample of
   * a 24bpp BMP — the resize/thumbnail stage an image-data pipeline runs
   * before feature extraction (vision encoders consume fixed small
   * resolutions, not crawl-native ones). Pixels are read from the actual
   * container bytes: data offset from the file header (offset 10), 4-byte
   * row padding, BOTTOM-UP row order folded to top-down coordinates,
   * B-G-R channel order — any one of these misread shifts every output
   * value, which is exactly what the closed-form oracle checks. Output
   * pixel (x, y) samples source pixel (2x, 2y); odd dimensions keep
   * their last row/column (ceil semantics). Non-BMP / non-24bpp payloads
   * are skipped (quarantine upstream at m3).
   *
   * Same mapPartitions batch shape as [[resampleAudio2x]]; output ≈ ¼ of
   * the input pixels, no driver materialization.
   */
  def downsampleImage2x(media: Dataset[MediaRecord]): Dataset[DownsampledPixel] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        (decodeBmp(m.payload), bmpDataOffset(m.payload)) match {
          // structural guard FIRST (round-10 review finding): the payload
          // must contain the FULL declared pixel array. A per-pixel bounds
          // check alone is not a quarantine — forged header dims (h = 2³⁰
          // over an 8×8 payload) leave a few offsets "in range" and leak
          // header bytes out as pixels, and the scan burns outW·outH
          // iterations doing it. Long arithmetic so forged w/h can't wrap.
          case (Some((w, h, 24)), Some(dataOff))
              if dataOff + bmpRowSize(w) * h <= m.payload.length =>
            val rowSize = bmpRowSize(w).toInt
            val outW = (w + 1) / 2
            val outH = (h + 1) / 2
            def pix(tx: Int, ty: Int): (Int, Int, Int) = {
              val off = dataOff + (h - 1 - ty) * rowSize + tx * 3
              ((m.payload(off) & 0xff),
                (m.payload(off + 1) & 0xff), (m.payload(off + 2) & 0xff))
            }
            for {
              y <- (0 until outH).iterator
              x <- (0 until outW).iterator
            } yield {
              val (bb, gg, rr) = pix(2 * x, 2 * y)
              DownsampledPixel(m.media_id, outW, outH, x, y, bb, gg, rr)
            }
          case _ => Iterator.empty
        }
      }
    }
  }


  /** Decode a PNG media batch: per-partition loop, one output row per
    * record — `is_png = false` rows are the quarantine lane (schema keeps
    * them visible instead of dropping or killing the job). */
  def decodePngMedia(media: Dataset[MediaRecord]): Dataset[PngDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodePng(r.payload) match {
        case Some((w, h, depth, ct, crcOk)) =>
          PngDecoded(r.media_id, is_png = true, w, h, depth, ct, crcOk)
        case None => PngDecoded(r.media_id, is_png = false, 0, 0, 0, 0, crc_ok = false)
      }
    })
  }

  /** Decode a GIF media batch — the quarantine-lane shape of
    * [[decodePngMedia]]: non-GIF rows surface as `is_gif = false`. */
  def decodeGifMedia(media: Dataset[MediaRecord]): Dataset[GifDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeGif(r.payload) match {
        case Some((w, h, gct, frames, ok)) =>
          GifDecoded(r.media_id, is_gif = true, w, h, gct, frames, ok)
        case None => GifDecoded(r.media_id, is_gif = false, 0, 0, 0, 0,
          trailer_ok = false)
      }
    })
  }

  /** Decode a JPEG media batch — the quarantine-lane shape of
    * [[decodePngMedia]]: non-JPEG (or SOF-less) rows surface as
    * `is_jpeg = false`, truncated scans as `eoi_ok = false`. */
  def decodeJpegMedia(media: Dataset[MediaRecord]): Dataset[JpegDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeJpeg(r.payload) match {
        case Some((w, h, nc, prog, eoi)) =>
          JpegDecoded(r.media_id, is_jpeg = true, w, h, nc, prog, eoi)
        case None => JpegDecoded(r.media_id, is_jpeg = false, 0, 0, 0,
          progressive = false, eoi_ok = false)
      }
    })
  }

  /** Decode an AVI media batch — the quarantine-lane shape of
    * [[decodePngMedia]]: non-AVI rows surface as `is_avi = false`,
    * truncated/overshooting containers as `clean_end = false` (leading
    * complete `movi` chunks still counted). */
  def decodeAviMedia(media: Dataset[MediaRecord]): Dataset[AviDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeAvi(r.payload) match {
        case Some((us, tf, ns, w, h, vc, ac, clean)) =>
          AviDecoded(r.media_id, is_avi = true, us, tf, ns, w, h, vc, ac, clean)
        case None => AviDecoded(r.media_id, is_avi = false, 0, 0, 0, 0, 0,
          0, 0, clean_end = false)
      }
    })
  }

  /** Decode an ID3 media batch — the quarantine-lane shape of
    * [[decodePngMedia]]: non-ID3 rows surface as `is_id3 = false`. */
  def decodeId3Media(media: Dataset[MediaRecord]): Dataset[Id3Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeId3(r.payload) match {
        case Some((ver, frames, size, title, padOk)) =>
          Id3Decoded(r.media_id, is_id3 = true, ver, frames, size, title, padOk)
        case None => Id3Decoded(r.media_id, is_id3 = false, 0, 0, 0,
          has_title = false, padding_ok = false)
      }
    })
  }
}
