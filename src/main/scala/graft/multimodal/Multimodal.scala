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
object Multimodal extends MediaFixtures {

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

  /**
   * REAL perceptual hashing in the codec seam: 64-bit difference hash
   * (dHash, the aHash/pHash family's gradient variant) of a 24bpp BMP —
   * the image analogue of SimHash, feeding image NEAR-dup dedup the way
   * [[graft.llm.Dedup.simhashNearDups]] feeds text. The image is resized
   * to a (gridW+1)×gridH grid by nearest-neighbor sampling of the REAL
   * container bytes (same offset/padding/bottom-up/BGR layout as
   * [[downsampleImage2x]]); gray = b+g+r (scale cancels in comparisons);
   * bit gy·gridW+gx is set iff gray brightens left→right between
   * horizontally adjacent grid cells. Comparing GRADIENTS, not values,
   * is what buys the robustness: re-encodes, small noise, and uniform
   * brightness shifts flip few bits, so near-dup images land within a
   * small Hamming radius while distinct images are ~32/64 apart.
   *
   * Nearest sampling (not block averaging) keeps every output bit an
   * exact function of two container bytes — replayable by an external
   * oracle — and is resolution-invariant for smooth content (the spec
   * proves a gradient hashes identically at 16×16 and 32×32). Non-BMP /
   * non-24bpp / truncated payloads are skipped (quarantine at m3).
   */
  def imageDHash(media: Dataset[MediaRecord],
                 gridW: Int = 8, gridH: Int = 8): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(m => dhashOfBmp(m.payload, gridW, gridH)
        .map(h => ImageHash(m.media_id, h)).iterator)
    }
  }

  /** The [[imageDHash]] core on raw bytes — shared with the per-frame
    * video path ([[videoFrameDHash]]). None for non-BMP / non-24bpp /
    * truncated payloads (quarantine at the caller). */
  private[multimodal] def dhashOfBmp(payload: Array[Byte],
                                     gridW: Int, gridH: Int): Option[Long] =
    (decodeBmp(payload), bmpDataOffset(payload)) match {
      // same structural full-pixel-array guard as [[downsampleImage2x]]:
      // forged dims or a truncated payload skip the record whole — a
      // partial grid would mis-hash, and per-pixel bounds checks alone
      // leak header bytes into the hash (round-10 review finding)
      case (Some((w, h, 24)), Some(dataOff))
          if dataOff + bmpRowSize(w) * h <= payload.length =>
        val rowSize = bmpRowSize(w).toInt
        def gray(tx: Int, ty: Int): Int = {
          val off = dataOff + (h - 1 - ty) * rowSize + tx * 3
          (payload(off) & 0xff) + (payload(off + 1) & 0xff) +
            (payload(off + 2) & 0xff)
        }
        val sx = (0 to gridW).map(gx => gx * w / (gridW + 1))
        val sy = (0 until gridH).map(gy => gy * h / gridH)
        val bits = for {
          gy <- 0 until gridH
          gx <- 0 until gridW
        } yield if (gray(sx(gx + 1), sy(gy)) > gray(sx(gx), sy(gy)))
          1L << (gy * gridW + gx) else 0L
        Some(bits.foldLeft(0L)(_ | _))
      case _ => None
    }

  /**
   * Frame-level video fingerprints (m14): walk each AVI's `movi` stream
   * ([[aviVideoFrames]] — nested LISTs, RIFF padding, truncation-safe),
   * dHash every video keyframe through the SAME perceptual core as the
   * image path. Non-AVI payloads and undecodable frames are skipped
   * (quarantine) — codec work stays in the mapPartitions seam; everything
   * downstream is plain relational.
   */
  def videoFrameDHash(media: Dataset[MediaRecord],
                      gridW: Int = 8, gridH: Int = 8): Dataset[VideoFrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        aviVideoFrames(m.payload).iterator.flatMap(_.iterator.zipWithIndex
          .flatMap { case (p, i) =>
            dhashOfBmp(p, gridW, gridH).map(h => VideoFrameHash(m.media_id, i, h))
          })
      }
    }
  }

  /**
   * TEMPORAL video near-dup pairs over per-frame fingerprints: the m6
   * banded-Hamming machinery applied per ALIGNED frame (same index — the
   * re-encode/duplicate-upload case; offset/trimmed variants ride the
   * shift search in [[videoNearDupPairsShifted]]), then video pairs where at least
   * `matchNum/matchDen` of the LONGER video's frames match. Scale shape:
   * frame keys pack (media_id, frame_idx) into one long so the
   * fingerprint join stays a single banded shuffle; the video roll-up is
   * two tiny hash-aggs + key joins. No pair explosion beyond the capped
   * fingerprint buckets.
   *
   * Input: [[videoFrameDHash]] output. Output: (id1, id2, matched, n1,
   * n2) with id1 < id2.
   */
  /** (media_id, frame_idx) packed into one long, GUARDED: a frame_idx
    * outside [0, maxFrames) would silently corrupt pair identity (frame
    * maxFrames of video v aliases frame 0 of video v+1) — fail fast with
    * a readable error instead. The guard rides the packing expression
    * itself, so column pruning can never drop it. */
  private def packedFid(maxFrames: Int) =
    col("media_id") * maxFrames +
      when(col("frame_idx").between(0, maxFrames - 1), col("frame_idx"))
        .otherwise(raise_error(concat(
          lit(s"video/audio shift dedup: frame_idx out of [0, $maxFrames): "),
          col("frame_idx").cast("string"))))

  def videoNearDupPairs(frames: DataFrame, maxHamming: Int = 3,
                        blocks: Int = 4, maxBucketSize: Int = 4000,
                        matchNum: Int = 2, matchDen: Int = 3,
                        maxFrames: Int = 4096): DataFrame = {
    import graft.llm.Dedup
    val keyed = frames.select(packedFid(maxFrames).as("fid"), col("fdhash"))
    val fp = Dedup.fingerprintNearDups(keyed, "fid", "fdhash",
      maxHamming, blocks, maxBucketSize)
    val aligned = fp
      .filter(col("id1") % maxFrames === col("id2") % maxFrames)
      .select(expr(s"id1 div $maxFrames").as("id1"),
        expr(s"id2 div $maxFrames").as("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).cast("long").as("matched"))
    val n = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("nf"))
    aligned
      .join(n.select(col("media_id").as("id1"), col("nf").as("n1")), "id1")
      .join(n.select(col("media_id").as("id2"), col("nf").as("n2")), "id2")
      .filter(col("matched") * matchDen >= greatest(col("n1"), col("n2")) * matchNum)
      .select(col("id1"), col("id2"), col("matched"), col("n1"), col("n2"))
  }

  /**
   * SHIFT-TOLERANT video near-dup pairs (m16) — the trimmed/offset case
   * [[videoNearDupPairs]]'s aligned-frame match misses: a duplicate
   * upload with a cut intro matches frame-for-frame at a constant index
   * OFFSET, never at equal indices. Same banded-Hamming candidate stage
   * (one shuffle, capped buckets, no pair explosion); then candidates
   * group by (video pair, frame-index delta) with |delta| ≤ `maxShift`,
   * the BEST alignment per pair wins (most matched frames; ties to the
   * smallest |shift|, then the smallest shift — deterministic via one
   * struct-min, no window sort), and a pair survives when the best
   * alignment covers ≥ matchNum/matchDen of the SHORTER video (the
   * trimmed side is contained in the original, so the shorter length is
   * the attainable ceiling — m14's longer-video bar would reject every
   * genuine trim).
   *
   * The delta search is FREE at candidate time: banding already emits
   * all cross-index fingerprint matches; bounding |delta| only prunes
   * the roll-up. Cost is the m14 envelope + one extra tiny hash-agg.
   *
   * Input: [[videoFrameDHash]] output. Output: (id1, id2, best_shift,
   * matched, n1, n2) with id1 < id2; best_shift is frame_idx(id2) −
   * frame_idx(id1) at the winning alignment (a trimmed id2 yields a
   * NEGATIVE shift: its frame j matches original frame j + trim).
   */
  def videoNearDupPairsShifted(frames: DataFrame, maxShift: Int = 2,
                               maxHamming: Int = 3, blocks: Int = 4,
                               maxBucketSize: Int = 4000,
                               matchNum: Int = 2, matchDen: Int = 3,
                               maxFrames: Int = 4096): DataFrame = {
    import graft.llm.Dedup
    val keyed = frames.select(packedFid(maxFrames).as("fid"), col("fdhash"))
    val fp = Dedup.fingerprintNearDups(keyed, "fid", "fdhash",
      maxHamming, blocks, maxBucketSize)
    // fid packs (media, frame) order-preservingly, so id1 < id2 at the
    // fid level implies media1 <= media2; equal-media frame pairs are
    // self-matches within one video and drop here
    val byShift = fp
      .select(expr(s"id1 div $maxFrames").as("v1"),
        expr(s"id1 % $maxFrames").as("f1"),
        expr(s"id2 div $maxFrames").as("v2"),
        expr(s"id2 % $maxFrames").as("f2"))
      .filter(col("v1") =!= col("v2"))
      .withColumn("shift", col("f2") - col("f1"))
      .filter(abs(col("shift")) <= maxShift)
      .groupBy(col("v1").as("id1"), col("v2").as("id2"), col("shift"))
      .agg(count(lit(1)).cast("long").as("matched"))
    val best = byShift.groupBy("id1", "id2")
      .agg(min(struct((-col("matched")).as("_nm"), abs(col("shift")).as("_abs"),
        col("shift").as("shift"), col("matched").as("matched"))).as("_b"))
      .select(col("id1"), col("id2"),
        col("_b.shift").as("best_shift"), col("_b.matched").as("matched"))
    val n = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("nf"))
    best
      .join(n.select(col("media_id").as("id1"), col("nf").as("n1")), "id1")
      .join(n.select(col("media_id").as("id2"), col("nf").as("n2")), "id2")
      .filter(col("matched") * matchDen >= least(col("n1"), col("n2")) * matchNum)
      .select(col("id1"), col("id2"), col("best_shift"), col("matched"),
        col("n1"), col("n2"))
  }

  /**
   * REAL audio perceptual hashing in the codec seam: 64-bit
   * energy-envelope fingerprint of a PCM WAV (the sign-of-gradient core
   * of Haitsma & Kalker 2002's audio fingerprint, on frame ENERGY
   * instead of per-band spectra — no FFT library in this container, and
   * the envelope alone already survives small-amplitude noise): channel
   * 0 is cut into `nBits+1` frames of `frameSize` samples, each frame's
   * energy is the exact integer Σ s², and bit f is set iff the envelope
   * rises frame f → f+1. Comparing energy GRADIENTS (like [[imageDHash]]
   * for pixels) makes re-encodes land within a small Hamming radius
   * while unrelated audio is ~32/64 away — the audio half of multimodal
   * near-dup dedup, feeding [[graft.llm.Dedup.fingerprintNearDups]].
   *
   * PCM is parsed from the actual container bytes (blockAlign stride,
   * 8-bit recenter / 16-bit LE sign fold — the [[resampleAudio2x]]
   * conventions); payloads shorter than `(nBits+1)·frameSize` frames of
   * channel-0 samples, or non-integer-PCM, are skipped (quarantine at
   * m3).
   */
  def audioFingerprint(media: Dataset[MediaRecord], frameSize: Int = 4,
                       nBits: Int = 64): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeWavChunks(m.payload) match {
          case Some((ch, _, bits, _, dataOff, dataSize)) if bits == 8 || bits == 16 =>
            val ba = ch * bits / 8
            val avail = math.min(dataSize, (m.payload.length - dataOff).toLong)
            val n = if (ba > 0) (avail / ba).toInt else 0
            if (n < (nBits + 1) * frameSize) Iterator.empty
            else {
              def sample(s: Int): Int = {
                val off = dataOff + s * ba
                if (bits == 8) (m.payload(off) & 0xff) - 128
                else ((m.payload(off) & 0xff) | (m.payload(off + 1) << 8)).toShort.toInt
              }
              val energy = Array.tabulate(nBits + 1) { f =>
                var e = 0L
                var i = f * frameSize
                while (i < (f + 1) * frameSize) {
                  val s = sample(i); e += s.toLong * s; i += 1
                }
                e
              }
              var fp = 0L
              var f = 0
              while (f < nBits) {
                if (energy(f + 1) > energy(f)) fp |= 1L << f
                f += 1
              }
              Iterator.single(AudioFp(m.media_id, fp))
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  /**
   * Per-SEGMENT audio fingerprints (m17): the [[audioFingerprint]]
   * energy-envelope core applied to OVERLAPPING segments — segment s
   * covers frames [s·hopFrames, s·hopFrames + nBits], one 64-bit
   * gradient fingerprint each — so a clip becomes an ordered fingerprint
   * SEQUENCE exactly like [[videoFrameDHash]]'s frames. That is what
   * makes audio dedup offset-tolerant: a clip trimmed by a multiple of
   * the hop re-aligns at a constant segment-index delta, and the SAME
   * shift roll-up the video path uses ([[videoNearDupPairsShifted]],
   * which only needs (media_id, frame_idx, fingerprint)) finds it.
   * Whole-clip m7 fingerprints can't: trimming shifts every frame
   * boundary's position in the single 64-bit hash. Clips shorter than
   * one segment emit nothing (quarantine-by-silence, like m7).
   */
  def audioSegmentFingerprints(media: Dataset[MediaRecord],
                               frameSize: Int = 4, nBits: Int = 64,
                               hopFrames: Int = 16): Dataset[AudioSegFp] = {
    require(frameSize > 0 && nBits > 0 && hopFrames > 0, "positive params")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeWavChunks(m.payload) match {
          case Some((ch, _, bits, _, dataOff, dataSize)) if bits == 8 || bits == 16 =>
            val ba = ch * bits / 8
            val avail = math.min(dataSize, (m.payload.length - dataOff).toLong)
            val n = if (ba > 0) (avail / ba).toInt else 0
            val frames = n / frameSize
            if (frames < nBits + 1) Iterator.empty
            else {
              def sample(s: Int): Int = {
                val off = dataOff + s * ba
                if (bits == 8) (m.payload(off) & 0xff) - 128
                else ((m.payload(off) & 0xff) | (m.payload(off + 1) << 8)).toShort.toInt
              }
              val energy = Array.tabulate(frames) { f =>
                var e = 0L
                var i = f * frameSize
                while (i < (f + 1) * frameSize) {
                  val s = sample(i); e += s.toLong * s; i += 1
                }
                e
              }
              val nSegs = (frames - nBits - 1) / hopFrames + 1
              (0 until nSegs).iterator.map { s =>
                val base = s * hopFrames
                var fp = 0L
                var f = 0
                while (f < nBits) {
                  if (energy(base + f + 1) > energy(base + f)) fp |= 1L << f
                  f += 1
                }
                AudioSegFp(m.media_id, s, fp)
              }
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
