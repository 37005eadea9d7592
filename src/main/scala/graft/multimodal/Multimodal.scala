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

/** 64-bit energy-envelope fingerprint of one audio payload. */
final case class AudioFp(media_id: Long, afp: Long)

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

  // ---- REAL container decode (pure JVM, no codec libraries) -----------
  // BMP (BITMAPINFOHEADER) and WAV (RIFF/PCM) headers parsed byte-for-byte
  // — the decode step of this family is no longer a stub for these two
  // containers; the mapPartitions seam is the same one a JNI codec would
  // plug into. Anything else still routes to "unknown" (a 100 TB pipeline
  // quarantines undecodable payloads; it never throws mid-scan).

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** DIB header sizes whose width/height/bpp live at offsets 18/22/28:
    * BITMAPINFOHEADER and its V2–V5 extensions. BITMAPCOREHEADER (12) lays
    * those fields out differently and must be refused, not misparsed. */
  private val BmpDibSizes = Set(40, 52, 56, 108, 124)

  /** Parse a BMP header: magic "BM", INFO-family DIB, width/height/bpp at
    * fixed offsets 18/22/28 (little-endian). None when not such a BMP. */
  private[multimodal] def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M' ||
        !BmpDibSizes.contains(leInt(b, 14))) None
    else {
      val w = leInt(b, 18)
      val h = leInt(b, 22)
      val bpp = leShort(b, 28)
      // negative height = top-down DIB; report magnitude
      if (w <= 0 || h == 0 || bpp <= 0) None else Some((w, math.abs(h), bpp))
    }

  /** Pixel-data offset (header byte 10), VALIDATED: a payload can pass
    * [[decodeBmp]] yet carry a negative/garbage offset, and an unguarded
    * `dataOff + row·rowSize` then indexes negative — an executor throw,
    * violating the module's quarantine-never-throw contract (round-9
    * advisor finding). None routes the record to the skip lane. */
  private[multimodal] def bmpDataOffset(b: Array[Byte]): Option[Int] = {
    val off = leInt(b, 10)
    if (off >= 54 && off < b.length) Some(off) else None
  }

  /** Walk RIFF/WAVE chunks: "fmt " → (channels, sampleRate, bits,
    * byteRate), "data" → (offset, size). Odd chunk sizes are padded per
    * the RIFF spec. None when not an integer-PCM WAV. */
  private[multimodal] def decodeWavChunks(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Long)] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length &&
        s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) None
    else {
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, byteRate
      var dataOff = -1
      var dataSize = -1L
      while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val size = leInt(b, off + 4).toLong & 0xffffffffL
        // audioFormat (data offset 0) must be 1 = integer PCM: float/ADPCM
        // containers would "parse" but the PCM bit/duration math is wrong
        // for them — quarantine as unknown instead
        if (tag(off, "fmt ") && off + 8 + 16 <= b.length &&
            leShort(b, off + 8) == 1)
          fmt = Some((leShort(b, off + 10), leInt(b, off + 12),
            leShort(b, off + 22), leInt(b, off + 16)))
        else if (tag(off, "data")) { dataOff = off + 8; dataSize = size }
        val step = 8L + size + (size & 1L)       // RIFF pads odd chunks
        // malformed/huge declared size: stop the walk instead of looping
        off = if (off + step > b.length.toLong) b.length else off + step.toInt
      }
      for ((ch, rate, bits, byteRate) <- fmt if dataSize >= 0 && byteRate > 0)
        yield (ch, rate, bits, byteRate, dataOff, dataSize)
    }
  }

  /** (channels, sampleRate, bits, duration_ms); duration floors
    * dataSize·1000 / byteRate. */
  private[multimodal] def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] =
    decodeWavChunks(b).map { case (ch, rate, bits, byteRate, _, dataSize) =>
      (ch, rate, bits, dataSize * 1000L / byteRate)
    }

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
          case (Some((w, h, 24)), Some(dataOff)) =>
            val rowSize = ((w * 3 + 3) / 4) * 4
            val outW = (w + 1) / 2
            val outH = (h + 1) / 2
            // clamp against truncated payloads (same guard as the audio
            // path); off < 0 guards w·h large enough to overflow Int
            def pix(tx: Int, ty: Int): Option[(Int, Int, Int)] = {
              val off = dataOff + (h - 1 - ty) * rowSize + tx * 3
              if (off < 0 || off + 2 >= m.payload.length) None
              else Some(((m.payload(off) & 0xff),
                (m.payload(off + 1) & 0xff), (m.payload(off + 2) & 0xff)))
            }
            for {
              y <- (0 until outH).iterator
              x <- (0 until outW).iterator
              (bb, gg, rr) <- pix(2 * x, 2 * y).iterator
            } yield DownsampledPixel(m.media_id, outW, outH, x, y, bb, gg, rr)
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
      it.flatMap { m =>
        (decodeBmp(m.payload), bmpDataOffset(m.payload)) match {
          case (Some((w, h, 24)), Some(dataOff)) =>
            val rowSize = ((w * 3 + 3) / 4) * 4
            def gray(tx: Int, ty: Int): Option[Int] = {
              val off = dataOff + (h - 1 - ty) * rowSize + tx * 3
              if (off < 0 || off + 2 >= m.payload.length) None
              else Some((m.payload(off) & 0xff) + (m.payload(off + 1) & 0xff) +
                (m.payload(off + 2) & 0xff))
            }
            val sx = (0 to gridW).map(gx => gx * w / (gridW + 1))
            val sy = (0 until gridH).map(gy => gy * h / gridH)
            val bits = for {
              gy <- 0 until gridH
              gx <- 0 until gridW
              a <- gray(sx(gx), sy(gy))
              b <- gray(sx(gx + 1), sy(gy))
            } yield if (b > a) 1L << (gy * gridW + gx) else 0L
            // a truncated payload loses samples: skip, don't mis-hash
            if (bits.length == gridW * gridH)
              Iterator.single(ImageHash(m.media_id, bits.foldLeft(0L)(_ | _)))
            else Iterator.empty
          case _ => Iterator.empty
        }
      }
    }
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

  // ---- deterministic real-container generators (dev fixtures) ---------

  /** A real 24bpp bottom-up BMP (54-byte header + padded pixel rows);
    * pixel bytes from a seeded LCG — decoders must get dimensions from the
    * HEADER, never from the payload length. */
  private[multimodal] def bmpBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                  // reserved, pixel offset
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)              // planes, bpp
      .putInt(0).putInt(dataSize)            // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var x = seed * 6364136223846793005L + 1442695040888963407L
    (0 until dataSize).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    bb.array()
  }

  /** A real PCM WAV (RIFF + fmt + data chunks), LCG-seeded samples. */
  private[multimodal] def wavBytes(channels: Int, sampleRate: Int, bits: Int,
                                   nSamples: Int, seed: Long): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bits % 8 == 0 && nSamples >= 0)
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                           // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign)       // byte rate
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var x = seed * 6364136223846793005L + 1442695040888963407L
    (0 until dataSize).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    bb.array()
  }

  /** A real 24bpp bottom-up BMP whose pixels come from `f(x, y)` in
    * TOP-DOWN coordinates (gray 0-255, written to all three channels) —
    * the structured-content sibling of [[bmpBytes]] for perceptual-hash
    * fixtures, where noise images would carry no gradients to hash. */
  private[multimodal] def bmpPatternBytes(width: Int, height: Int,
                                          f: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up row order, 4-byte row padding, B=G=R=gray
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val g = f(x, y).toByte
        bb.put(g).put(g).put(g)
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** dHash fixture side: 16×16 per-image size. */
  val PatternDim = 16

  /** Gray value of the structured dHash fixture at (x, y), top-down: a
    * low-degree polynomial of the pixel position with id-derived
    * coefficients (mod 251 keeps +noise below 256), plus a sparse +2
    * perturbation on the v=1 variant — the "re-encoded copy" whose hash
    * must land within a small Hamming radius of the v=0 original. Pure
    * closed form so the oracle recomputes every sampled gray from
    * (id, v, x, y) alone.
    *
    * Coefficient ENTROPY is deliberately wide (round-9 verdict task):
    * two independent ~2²⁰ prime-modulus mixes of the FULL id (~2⁴⁰
    * joint states, CRT-coprime so no id < 10¹² repeats a pair) instead
    * of the old id%7/%3/%11/%5/%13 residues (15 015 image families) —
    * at a ×100 corpus the old family count saturated, every fingerprint
    * gained ~100 exact twins, and the m6 pair OUTPUT grew quadratically
    * (a fixture artifact, not the engine). Products stay < 2⁵² — no
    * wraparound, so the oracle replays in plain BIGINT arithmetic. */
  private[multimodal] def patternGray(id: Long, v: Int, x: Int, y: Int): Int = {
    val m1 = (id % 1048573L) * 2654435761L % 1048573L
    val m2 = (id % 1048289L) * 97002529L % 1048289L
    val ax = 1 + m1 % 251L
    val bx = 1 + (m1 / 251L) % 251L
    val ay = 2 + m2 % 251L
    val axy = (m2 / 251L) % 251L
    val c0 = (m1 + m2) % 251L
    val base = ((ax * x + bx * x * x + ay * y + axy * x * y + c0) % 251L).toInt
    val noise = if (v == 1 && (x + 3L * y + id) % 11 == 0) 2 else 0
    base + noise
  }

  /** Two REAL BMPs per id: media_id = 2·id (original) and 2·id+1 (the
    * perturbed re-encode) — the planted near-dup pair for m6. */
  def packImagePairById(id: Long): Seq[MediaRecord] =
    Seq(0, 1).map { v =>
      MediaRecord(2 * id + v, "image",
        bmpPatternBytes(PatternDim, PatternDim, (x, y) => patternGray(id, v, x, y)))
    }

  /** A real mono 16-bit PCM WAV whose samples come from `f(i)` — the
    * structured-content sibling of [[wavBytes]] for the audio
    * fingerprint fixtures. */
  private[multimodal] def wavPatternBytes(nSamples: Int, f: Int => Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * nSamples)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * nSamples)
    (0 until nSamples).foreach(i => bb.putShort(f(i).toShort))
    bb.array()
  }

  /** m7 fixture length: (64+1) frames × 4 samples. */
  val AudioSamples = 260

  /** Channel-0 sample i of the audio-fingerprint fixture: a per-frame
    * quadratic walk (mod 1999, recentred to ±999 so it always fits
    * 16-bit PCM) plus a sparse +1 perturbation on the v=1 re-encode —
    * energy gradients survive it, exact sample values do not. Closed
    * form so the oracle recomputes every PCM sample from (id, v, i).
    * Same wide-entropy coefficient mix as [[patternGray]] (the m7
    * fingerprint space must scale with the corpus, not saturate at a
    * few hundred envelope families). */
  private[multimodal] def patternSample(id: Long, v: Int, i: Int): Int = {
    val u = i / 4
    val m1 = (id % 1048573L) * 2654435761L % 1048573L
    val m2 = (id % 1048289L) * 97002529L % 1048289L
    val a = 3 + m1 % 997L
    val b = 1 + (m1 / 997L) % 997L
    val c = m2 % 997L
    val base = ((a * u + b * u * u + c * i) % 1999L).toInt - 999
    val noise = if (v == 1 && (i + id) % 17 == 0) 1 else 0
    base + noise
  }

  /** Two REAL WAVs per id: media_id = 2·id and 2·id+1 (the perturbed
    * re-encode) — the planted near-dup pair for m7. */
  def packAudioPairById(id: Long): Seq[MediaRecord] =
    Seq(0, 1).map { v =>
      MediaRecord(2 * id + v, "audio",
        wavPatternBytes(AudioSamples, i => patternSample(id, v, i)))
    }

  /** Deterministic per-id media fixture: even ids → a real BMP, odd ids →
    * a real PCM WAV, with every header field a pure function of the id —
    * so an external oracle can assert the DECODED values from the id alone
    * (a misparsed offset or endianness flips the comparison). */
  def packMediaById(id: Long): MediaRecord =
    if (id % 2 == 0)
      MediaRecord(id, "image",
        bmpBytes(width = 1 + (id % 16).toInt, height = 1 + (id % 9).toInt, seed = id))
    else
      MediaRecord(id, "audio",
        wavBytes(channels = 1 + ((id >> 1) % 2).toInt,
          sampleRate = 8000 * (1 + (id % 3).toInt),
          bits = 8 * (1 + ((id >> 2) % 2).toInt),
          nSamples = 1 + (id % 97).toInt, seed = id))

  // ---- PNG: big-endian chunked container with per-chunk CRC32 ----------

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  /** A real minimal PNG: signature, IHDR (13-byte payload, true CRC32),
    * one LCG-filled IDAT, IEND. Every chunk carries its spec CRC — the
    * validation path in [[decodePng]] has something real to check. */
  private[multimodal] def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val arr = bb.array()
      bb.putInt(crc32(arr, 4, 4 + data.length).toInt)
      out.write(bb.array(), 0, arr.length)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)   // bit depth
      .put(2.toByte)   // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
      .array()
    chunk("IHDR", ihdr)
    var x = seed
    chunk("IDAT", Array.fill(16) {
      x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 56).toByte
    })
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Corrupt a PNG's IHDR CRC in place (last CRC byte flipped) — the
    * fixture for the must-reject validation path. */
  private[multimodal] def corruptIhdrCrc(png: Array[Byte]): Array[Byte] = {
    val b = png.clone()
    val crcOff = 8 + 4 + 4 + 13 + 3 // sig, len, type, data, last CRC byte
    b(crcOff) = (b(crcOff) ^ 0xff).toByte
    b
  }

  /** Parse + validate a PNG IHDR: signature, first-chunk rule, big-endian
    * dims, CRC32 over type+data verified against the stored CRC. None when
    * the container isn't PNG at all; `crcOk = false` when it is a PNG whose
    * IHDR fails its checksum (corrupt-in-transit — quarantine, not trust). */
  private[multimodal] def decodePng(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] =
    if (b.length < 33 || !b.take(8).sameElements(PngSig) ||
        beInt(b, 8) != 13 || new String(b, 12, 4, "US-ASCII") != "IHDR") None
    else {
      val w = beInt(b, 16)
      val h = beInt(b, 20)
      val bitDepth = b(24) & 0xff
      val colorType = b(25) & 0xff
      val stored = beInt(b, 29).toLong & 0xffffffffL
      val crcOk = crc32(b, 12, 17) == stored
      if (w <= 0 || h <= 0) None else Some((w, h, bitDepth, colorType, crcOk))
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

  /**
   * Build real GIF89a bytes: little-endian logical screen descriptor,
   * global color table, per-frame graphic-control extension + image
   * descriptor with LZW data sub-blocks, 0x3B trailer. Odd frames carry
   * a LOCAL color table and every frame ships TWO data sub-blocks, so a
   * decoder that miscounts either skip is caught. (The GIF87a/89a layout
   * is public — CompuServe 1989 spec / RFC-adjacent W3C note.)
   */
  private[multimodal] def gifBytes(width: Int, height: Int, gctBits: Int,
                                   frames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && gctBits >= 0 && gctBits <= 7 && frames >= 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | (1 << 4) | gctBits) // GCT flag, color res 1, size bits
    out.write(0); out.write(0)           // bg index, aspect
    var x = seed
    def lcgByte(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 56).toInt & 0xff }
    (0 until 3 * (1 << (gctBits + 1))).foreach(_ => out.write(lcgByte()))
    (0 until frames).foreach { f =>
      out.write(0x21); out.write(0xf9); out.write(4)       // GCE
      out.write(0); le16(10 * f); out.write(0); out.write(0)
      out.write(0x2c)                                      // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      val lct = f % 2 == 1
      out.write(if (lct) 0x80 | 1 else 0)                  // LCT flag, 4 entries
      if (lct) (0 until 3 * 4).foreach(_ => out.write(lcgByte()))
      out.write(2)                                         // LZW min code size
      out.write(3); out.write(lcgByte()); out.write(lcgByte()); out.write(lcgByte())
      out.write(2); out.write(lcgByte()); out.write(lcgByte())
      out.write(0)                                         // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Parse a GIF: signature + LE logical screen, then a FULL block walk —
    * extensions skipped by sub-block lengths, image descriptors counted
    * (local color tables skipped), trailer byte checked. None when the
    * container isn't GIF; `trailer_ok = false` when the walk runs off the
    * end or hits an unknown block (truncated-in-transit — quarantine). */
  private[multimodal] def decodeGif(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    val w = leShort(b, 6)
    val h = leShort(b, 8)
    val packed = b(10) & 0xff
    val entries = if ((packed & 0x80) != 0) 1 << ((packed & 7) + 1) else 0
    var p = 13 + 3 * entries
    var frames = 0
    var trailerOk = false
    var done = false
    def skipSubBlocks(): Boolean = {
      while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
      if (p < b.length) { p += 1; true } else false
    }
    while (!done && p < b.length) {
      (b(p) & 0xff) match {
        case 0x21 =>
          p += 2 // introducer + label
          if (!skipSubBlocks()) done = true
        case 0x2c =>
          if (p + 10 > b.length) { done = true }
          else {
            val ip = b(p + 9) & 0xff
            p += 10
            if ((ip & 0x80) != 0) p += 3 * (1 << ((ip & 7) + 1))
            p += 1 // LZW min code size
            if (p <= b.length && skipSubBlocks()) frames += 1 else done = true
          }
        case 0x3b => trailerOk = true; done = true
        case _ => done = true
      }
    }
    if (w <= 0 || h <= 0) None else Some((w, h, entries, frames, trailerOk))
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

  /** Deterministic per-id GIF fixture: every decoded field is a pure
    * function of the id; `id % 11 == 0` ships a non-GIF payload
    * (quarantine), `id % 7 == 0` (not quarantined) drops the 0x3B
    * trailer — frames before the cut still count, the verdict flags. */
  def packGifById(id: Long): MediaRecord = {
    val payload =
      if (id % 11 == 0) s"not a gif $id".getBytes("UTF-8")
      else {
        val g = gifBytes(width = 4 + (id % 12).toInt, height = 3 + (id % 9).toInt,
          gctBits = (id % 3).toInt, frames = 1 + (id % 3).toInt, seed = id)
        if (id % 7 == 0) g.dropRight(1) else g
      }
    MediaRecord(id, "image", payload)
  }

  /** Deterministic per-id PNG fixture: dims are pure functions of the id,
    * `id % 11 == 0` ships a non-PNG payload (quarantine lane), and
    * `id % 5 == 0` (not quarantined) ships a corrupted IHDR CRC — every
    * decoded field and flag is oracle-checkable from the id alone. */
  def packPngById(id: Long): MediaRecord = {
    val payload =
      if (id % 11 == 0) s"not a png $id".getBytes("UTF-8")
      else {
        val png = pngBytes(width = 8 + (id % 16).toInt, height = 4 + (id % 8).toInt,
          seed = id)
        if (id % 5 == 0) corruptIhdrCrc(png) else png
      }
    MediaRecord(id, "image", payload)
  }

  // ---- JPEG: big-endian marker/segment stream + entropy-coded scan -----

  /**
   * Build real JPEG-structured bytes (ITU-T T.81 / JFIF layout, public):
   * SOI, APP0-JFIF, COM, DQT, SOF0 or SOF2 (baseline vs progressive),
   * DHT, then SOS followed by an ENTROPY-CODED section with spec byte
   * stuffing (every data 0xFF is written 0xFF 0x00) and one RST0 restart
   * marker mid-stream, closed by EOI. A parser that trusts segment
   * lengths inside the scan, or stops at the first raw 0xFF, misreads
   * this fixture — the entropy walk is the part real JPEG parsers get
   * wrong.
   */
  private[multimodal] def jpegBytes(width: Int, height: Int, components: Int,
                                    progressive: Boolean, seed: Long): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    require(components == 1 || components == 3)
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def seg(marker: Int, data: Array[Byte]): Unit = {
      m(marker); be16(2 + data.length); out.write(data, 0, data.length)
    }
    var x = seed
    def lcgByte(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 56).toInt & 0xff }
    m(0xd8) // SOI
    seg(0xe0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0)) // version 1.1, density 1×1, no thumb
    seg(0xfe, s"seed $seed".getBytes("US-ASCII")) // COM
    seg(0xdb, Array(0.toByte) ++ Array.fill(64)(lcgByte().toByte)) // DQT
    val sofData = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(8) // precision
      b.write((height >> 8) & 0xff); b.write(height & 0xff)
      b.write((width >> 8) & 0xff); b.write(width & 0xff)
      b.write(components)
      (1 to components).foreach { c => b.write(c); b.write(0x11); b.write(0) }
      b.toByteArray
    }
    seg(if (progressive) 0xc2 else 0xc0, sofData)
    seg(0xc4, Array(0.toByte) ++ Array.tabulate(16)(i => (if (i == 1) 1 else 0).toByte)
      ++ Array(0.toByte)) // DHT: one 2-bit code
    val sosData = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(components)
      (1 to components).foreach { c => b.write(c); b.write(0) }
      b.write(0); b.write(63); b.write(0)
      b.toByteArray
    }
    seg(0xda, sosData)
    // entropy-coded bytes: stuff every 0xFF; drop a restart marker midway
    (0 until 24).foreach { i =>
      if (i == 12) { m(0xd0) } // RST0
      else {
        val v = if (i % 6 == 5) 0xff else lcgByte() // guaranteed stuffing cases
        out.write(v)
        if (v == 0xff) out.write(0x00)
      }
    }
    m(0xd9) // EOI
    out.toByteArray
  }

  /**
   * Parse a JPEG by walking the marker stream: SOI check, fill-byte
   * tolerance (0xFF padding before a marker is legal), big-endian segment
   * lengths, SOFn recognition (C0–CF minus DHT C4 / JPG C8 / DAC CC;
   * `progressive` = SOF2), and — the hard part — the post-SOS
   * entropy-coded scan, which has NO length field: it ends at the first
   * 0xFF followed by anything other than 0x00 (stuffing) or D0–D7
   * (restart). None when the payload isn't JPEG; `eoi_ok = false` when
   * the walk never reaches EOI (truncated-in-transit — quarantine). */
  private[multimodal] def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int, Boolean, Boolean)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    var p = 2
    var w = 0; var h = 0; var ncomp = 0
    var sofSeen = false; var progressive = false
    var eoiOk = false; var done = false
    while (!done && p + 1 < b.length) {
      if ((b(p) & 0xff) != 0xff) { done = true } // marker expected: corrupt
      else {
        while (p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1 // fill bytes
        if (p + 1 >= b.length) done = true
        else (b(p + 1) & 0xff) match {
          case 0xd9 => eoiOk = true; done = true
          case mk if mk == 0x01 || (mk >= 0xd0 && mk <= 0xd7) => p += 2 // standalone
          case mk =>
            if (p + 3 >= b.length) { done = true }
            else {
              val len = be16(p + 2)
              if (len < 2 || p + 2 + len > b.length) { done = true }
              else {
                if (mk >= 0xc0 && mk <= 0xcf && mk != 0xc4 && mk != 0xc8 && mk != 0xcc) {
                  if (p + 9 < b.length) {
                    h = be16(p + 5); w = be16(p + 7); ncomp = b(p + 9) & 0xff
                    sofSeen = true; progressive = mk == 0xc2
                  }
                  p += 2 + len
                } else if (mk == 0xda) {
                  p += 2 + len
                  // entropy scan: no length — walk to the next real marker
                  var inScan = true
                  while (inScan && p < b.length) {
                    if ((b(p) & 0xff) != 0xff) p += 1
                    else if (p + 1 >= b.length) { p += 1; inScan = false }
                    else {
                      val nx = b(p + 1) & 0xff
                      if (nx == 0x00 || (nx >= 0xd0 && nx <= 0xd7)) p += 2 // stuffed / restart
                      else inScan = false // real marker: outer loop handles it
                    }
                  }
                } else p += 2 + len
              }
            }
        }
      }
    }
    if (!sofSeen || w <= 0 || h <= 0) None
    else Some((w, h, ncomp, progressive, eoiOk))
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

  /** Deterministic per-id JPEG fixture: every decoded field is a pure
    * function of the id; `id % 11 == 0` ships a non-JPEG payload
    * (quarantine), `id % 7 == 0` (not quarantined) drops the EOI marker —
    * the scan walk still finds SOF dims, the verdict flags. */
  def packJpegById(id: Long): MediaRecord = {
    val payload =
      if (id % 11 == 0) s"not a jpeg $id".getBytes("UTF-8")
      else {
        val j = jpegBytes(width = 5 + (id % 13).toInt, height = 3 + (id % 10).toInt,
          components = if (id % 2 == 0) 3 else 1,
          progressive = id % 3 == 0, seed = id)
        if (id % 7 == 0) j.dropRight(2) else j
      }
    MediaRecord(id, "image", payload)
  }

  // ---- ID3v2: syncsafe integers + tag frame walk ------------------------

  private val Id3FrameIds = IndexedSeq("TIT2", "TPE1", "TALB")

  /** SYNCSAFE 28-bit integer (ID3v2.4 §6.2, public): 4 bytes of 7 bits
    * each, high bit always clear — sizes can't fake an MPEG sync word.
    * Decoding one as plain big-endian is the classic ID3 parser bug
    * (off by up to 2×7 bits once the size passes 127). */
  private def syncsafe(v: Int): Array[Byte] = {
    require(v >= 0 && v < (1 << 28))
    Array((v >> 21) & 0x7f, (v >> 14) & 0x7f, (v >> 7) & 0x7f, v & 0x7f)
      .map(_.toByte)
  }

  private def readSyncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

  /** Build a real ID3v2.4 tag: header with a SYNCSAFE declared size,
    * `nFrames` text frames rotating through TIT2/TPE1/TALB from `start`
    * (each a syncsafe-sized UTF-8 payload), then `padding` zero bytes.
    * `corruptPadding` plants one non-zero byte mid-padding — a walk that
    * blindly trusts the next non-zero byte as a frame id must flag it. */
  private[multimodal] def id3Bytes(nFrames: Int, start: Int, padding: Int,
                                   corruptPadding: Boolean, seed: Long): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 3 && start >= 0 && padding >= 8)
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(4); out.write(0) // version 2.4.0
    out.write(0)               // flags
    val frameBytes = (0 until nFrames).map { j =>
      val fid = Id3FrameIds((start + j) % 3)
      val payload = (0x03.toChar + f"v${(seed * 31 + j) % 1000000}%07d").getBytes("UTF-8")
      val fb = new java.io.ByteArrayOutputStream()
      fb.write(fid.getBytes("US-ASCII"))
      fb.write(syncsafe(payload.length))
      fb.write(0); fb.write(0) // frame flags
      fb.write(payload)
      fb.toByteArray
    }
    val size = frameBytes.map(_.length).sum + padding
    out.write(syncsafe(size))
    frameBytes.foreach(out.write)
    val pad = new Array[Byte](padding)
    if (corruptPadding) pad(padding / 2) = 0xee.toByte
    out.write(pad)
    out.toByteArray
  }

  /** Parse an ID3v2 tag: magic + version, SYNCSAFE declared size, then a
    * frame walk — ids must be [A-Z0-9]{4} (anything else inside the
    * declared span is corruption, not a frame), sizes syncsafe, and the
    * run after the last frame must be all-zero padding (`padding_ok`).
    * None when the payload has no ID3 header at all. */
  private[multimodal] def decodeId3(b: Array[Byte]): Option[(Int, Int, Int, Boolean, Boolean)] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
    val version = b(3) & 0xff
    val size = readSyncsafe(b, 6)
    val end = math.min(10 + size, b.length)
    var p = 10
    var frames = 0
    var hasTitle = false
    var paddingOk = true
    var inFrames = true
    def frameIdOk(off: Int): Boolean = (0 until 4).forall { i =>
      val c = b(off + i).toChar; (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
    }
    while (inFrames && p + 10 <= end && b(p) != 0) {
      if (!frameIdOk(p)) { paddingOk = false; inFrames = false }
      else {
        val fid = new String(b, p, 4, "US-ASCII")
        val fsize = readSyncsafe(b, p + 4)
        if (p + 10 + fsize > end) { paddingOk = false; inFrames = false }
        else {
          frames += 1
          if (fid == "TIT2") hasTitle = true
          p += 10 + fsize
        }
      }
    }
    // everything left inside the declared size must be zero padding
    while (paddingOk && p < end) { if (b(p) != 0) paddingOk = false; p += 1 }
    Some((version, frames, size, hasTitle, paddingOk))
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

  /** Deterministic per-id ID3 fixture: frame count/rotation/padding are
    * pure functions of the id (declared sizes always exceed 127, so a
    * plain big-endian size read fails loudly); `id % 11 == 0` ships a
    * non-ID3 payload, `id % 7 == 0` plants a corrupt byte mid-padding. */
  def packId3ById(id: Long): MediaRecord = {
    val payload =
      if (id % 11 == 0) s"not an id3 tag $id".getBytes("UTF-8")
      else id3Bytes(nFrames = 1 + (id % 3).toInt, start = (id % 3).toInt,
        padding = 120 + (id % 17).toInt, corruptPadding = id % 7 == 0, seed = id)
    MediaRecord(id, "audio", payload)
  }
}
