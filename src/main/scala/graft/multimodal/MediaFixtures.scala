package graft.multimodal

/**
 * Deterministic REAL-container fixture builders (dev/test/oracle side of
 * the multimodal family, split out of Multimodal.scala in round 10 — pure
 * move, no behavior change): every generated header field and payload
 * byte is a closed-form function of the id/seed, so external oracles can
 * recompute the expected DECODE of each fixture without parsing anything.
 */
private[multimodal] trait MediaFixtures extends MediaFormatFixtures {

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

  /**
   * Per-id TRIMMED audio pair fixture for m17: media 2·id is the original
   * (`3 + id % 3` fingerprint segments at the default frameSize=4 /
   * nBits=64 / hop=16 geometry, samples from the m7 closed form); media
   * 2·id+1 is the same clip with its first `1 + id % 2` segment-hops cut
   * off — its sample j carries original sample j + 64·trim, with the v=1
   * sparse noise — so the trimmed clip's segment s matches original
   * segment s + trim within a small Hamming radius. `id % 11 == 0` ships
   * non-WAV payloads for both variants (quarantine lane).
   */
  def packAudioTrimPairById(id: Long): Seq[MediaRecord] = {
    val nSegs = 3 + (id % 3).toInt
    val trim = 1 + (id % 2).toInt
    val frameSize = 4; val nBits = 64; val hop = 16
    val samples = frameSize * (nBits + hop * (nSegs - 1) + 1)
    Seq(0, 1).map { v =>
      val payload =
        if (id % 11 == 0) s"not audio $id $v".getBytes("UTF-8")
        else {
          val off = if (v == 0) 0 else frameSize * hop * trim
          wavPatternBytes(samples - off, i => patternSample(id, v, i + off))
        }
      MediaRecord(2 * id + v, "audio", payload)
    }
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


  /**
   * Per-id video PAIR fixture for m14: media 2·id (original, v=0) and
   * 2·id+1 (the perturbed re-encode, v=1), each an AVI of
   * `3 + id % 3` BMP keyframes whose grays are the closed form
   * [[patternGray]] keyed by `id·31 + frame` — so every frame dHash bit
   * is replayable by the oracle from (id, frame, v, x, y) alone, and the
   * re-encode's sparse +2 noise keeps each frame within a small Hamming
   * radius of its original (the m6 planting, per frame). `id % 11 == 0`
   * ships non-AVI payloads for BOTH variants (quarantine lane: no
   * frames, no cluster rows).
   */
  def packVideoPairById(id: Long): Seq[MediaRecord] =
    Seq(0, 1).map { v =>
      val payload =
        if (id % 11 == 0) s"not a video $id $v".getBytes("UTF-8")
        else {
          val nf = 3 + (id % 3).toInt
          val frames = (0 until nf).map(f =>
            bmpPatternBytes(PatternDim, PatternDim,
              (x, y) => patternGray(id * 31 + f, v, x, y)))
          aviWithFrames(frames, usPerFrame = 33333, PatternDim, PatternDim)
        }
      MediaRecord(2 * id + v, "video", payload)
    }

  /**
   * Per-id TRIMMED video pair fixture for m16: media 2·id is the original
   * (`4 + id % 3` keyframes, content keyed by `id·31 + f`); media 2·id+1
   * is a TRIMMED re-encode — the original's frames from offset
   * `1 + id % 2` onward, each carrying the v=1 sparse noise. Its j-th
   * container frame therefore matches original frame `j + trim` within a
   * small Hamming radius: the duplicate-upload-with-cut-intro case m14's
   * aligned-frame match misses by construction. `id % 11 == 0` ships
   * non-AVI payloads for both variants (quarantine lane).
   */
  def packVideoTrimPairById(id: Long): Seq[MediaRecord] = {
    val nf = 4 + (id % 3).toInt
    val trim = 1 + (id % 2).toInt
    Seq(0, 1).map { v =>
      val payload =
        if (id % 11 == 0) s"not a video $id $v".getBytes("UTF-8")
        else {
          val frames = ((if (v == 0) 0 else trim) until nf).map(f =>
            bmpPatternBytes(PatternDim, PatternDim,
              (x, y) => patternGray(id * 31 + f, v, x, y)))
          aviWithFrames(frames, usPerFrame = 33333, PatternDim, PatternDim)
        }
      MediaRecord(2 * id + v, "video", payload)
    }
  }
}
