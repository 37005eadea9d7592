package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * The perceptual-fingerprint / near-dup half of [[Multimodal]] (round-13
 * file split, pure move, no behavior change): image dHash, per-frame
 * video dHash, aligned and shift-tolerant video dedup, whole-clip and
 * per-segment audio fingerprints. Mixed into `object Multimodal`, so
 * every call site keeps addressing `Multimodal.<member>`.
 */
private[multimodal] trait MediaDedup extends Serializable { this: Multimodal.type =>

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
}
