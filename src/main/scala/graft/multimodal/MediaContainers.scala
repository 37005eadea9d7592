package graft.multimodal

/**
 * Pure byte-level container codecs (no Spark types): the parsing half of
 * the multimodal family, split out of Multimodal.scala in round 10 (file
 * size hygiene — pure move, no behavior change). Everything here is a
 * deterministic function of the payload bytes; `None` / verdict-flag
 * returns are the quarantine lane (a 100 TB pipeline never throws
 * mid-scan on a malformed payload).
 */
private[multimodal] trait MediaContainers {

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

  /** 4-byte-padded 24bpp row size in LONG arithmetic: a header-forged
    * width near 2³¹ wraps the Int form (w·3 overflows) and corrupts every
    * downstream offset/size check. */
  private[multimodal] def bmpRowSize(w: Int): Long = ((w.toLong * 3 + 3) / 4) * 4

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

  // ---- PNG: big-endian chunked container with per-chunk CRC32 ----------

  private[multimodal] val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private[multimodal] def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
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

  /** SYNCSAFE 28-bit integer (ID3v2.4 §6.2, public): 4 bytes of 7 bits
    * each, high bit always clear — sizes can't fake an MPEG sync word.
    * Decoding one as plain big-endian is the classic ID3 parser bug
    * (off by up to 2×7 bits once the size passes 127). */
  private[multimodal] def syncsafe(v: Int): Array[Byte] = {
    require(v >= 0 && v < (1 << 28))
    Array((v >> 21) & 0x7f, (v >> 14) & 0x7f, (v >> 7) & 0x7f, v & 0x7f)
      .map(_.toByte)
  }

  private def readSyncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

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

  // ---- AVI: the nested-LIST RIFF walk (video container) ----------------

  /**
   * Parse an AVI container (Microsoft RIFF/AVI spec, public): `RIFF`
   * size `AVI `, then a chunk walk where `LIST` chunks NEST — the walker
   * must descend into `hdrl` (for the 56-byte `avih` main header: LE
   * µs-per-frame @+0, total-frames @+16, streams @+24, width @+32,
   * height @+36) and into `movi` (counting `##dc`/`##db` video vs `##wb`
   * audio stream chunks), while SKIPPING unknown lists and chunks whole.
   * The two classic AVI parser bugs are both exercised by the fixture:
   * flat walks that treat LIST bodies as sibling chunks, and walks that
   * forget RIFF's odd-size pad byte. Truncated payloads (declared sizes
   * overshooting the buffer) keep the counts seen so far — quarantine
   * verdicts, never throws. Returns (µsPerFrame, totalFramesDeclared,
   * streams, width, height, videoChunks, audioChunks, cleanEnd); None
   * when the payload is not RIFF/AVI at all.
   */
  private[multimodal] def decodeAvi(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int, Int, Boolean)] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length &&
        s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var usPerFrame, totalFrames, streams, width, height = 0
    var videoChunks, audioChunks = 0
    var clean = true
    // walk [from, until) as a sibling-chunk sequence; recurse into LISTs.
    // depth > 64 marks unclean and stops descending: without the bound an
    // adversarial payload of nested 12-byte LIST headers recurses once per
    // level and can StackOverflowError, breaking the never-throws contract
    // (real AVI nests hdrl/strl/odml — depth < 8)
    def walk(from: Int, until: Int, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 64) { clean = false; return }
      var p = from
      while (p + 8 <= until) {
        val size = leInt(b, p + 4)
        val dataEnd = p + 8L + size
        if (size < 0 || dataEnd > until) {
          // truncated-in-transit: a LIST cut mid-body still yields its
          // complete leading children (the GIF dropped-trailer semantics);
          // the verdict flags, the walk never throws
          clean = false
          if (tag(p, "LIST") && p + 12 <= until)
            walk(p + 12, until, inMovi = tag(p + 8, "movi"), depth + 1)
          p = until
        }
        else {
          if (tag(p, "LIST")) {
            if (size >= 4) {
              val body = p + 12
              walk(body, (p + 8 + size), inMovi = tag(p + 8, "movi"), depth + 1)
            } else clean = false
          } else if (tag(p, "avih") && size >= 40) {
            usPerFrame = leInt(b, p + 8)
            totalFrames = leInt(b, p + 24)
            streams = leInt(b, p + 32)
            width = leInt(b, p + 40)
            height = leInt(b, p + 44)
          } else if (inMovi && p + 4 <= until &&
              b(p).toChar.isDigit && b(p + 1).toChar.isDigit) {
            val kind = new String(b, p + 2, 2, "US-ASCII")
            if (kind == "dc" || kind == "db") videoChunks += 1
            else if (kind == "wb") audioChunks += 1
          }
          // RIFF pads odd chunk sizes to even boundaries
          p = (dataEnd + (size & 1)).toInt
        }
      }
      if (p != until) clean = false
    }
    val declaredEnd = math.min(8L + leInt(b, 4), b.length.toLong).toInt
    walk(12, declaredEnd, inMovi = false, depth = 0)
    if (8L + leInt(b, 4) > b.length) clean = false
    Some((usPerFrame, totalFrames, streams, width, height,
      videoChunks, audioChunks, clean))
  }

  /**
   * Extract the `movi` stream's video chunk payloads (`##dc`/`##db`) in
   * stream order — the keyframe feed for frame-level video fingerprinting
   * (m14). Same walk conventions as [[decodeAvi]]: nested LISTs, RIFF odd
   * padding, the 64-level depth bound, truncation keeps the complete
   * leading frames, never throws. None when the payload is not RIFF/AVI
   * at all (quarantine at the caller).
   */
  private[multimodal] def aviVideoFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length &&
        s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, until: Int, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 64) return
      var p = from
      while (p + 8 <= until) {
        val size = leInt(b, p + 4)
        val dataEnd = p + 8L + size
        if (size < 0 || dataEnd > until) {
          // truncated: a LIST cut mid-body still yields its complete
          // leading frames (the decodeAvi semantics)
          if (tag(p, "LIST") && p + 12 <= until)
            walk(p + 12, until, inMovi = tag(p + 8, "movi"), depth + 1)
          p = until
        } else {
          if (tag(p, "LIST")) {
            if (size >= 4)
              walk(p + 12, (p + 8 + size).toInt, inMovi = tag(p + 8, "movi"), depth + 1)
          } else if (inMovi && p + 4 <= until &&
              b(p).toChar.isDigit && b(p + 1).toChar.isDigit) {
            val kind = new String(b, p + 2, 2, "US-ASCII")
            if (kind == "dc" || kind == "db")
              frames += java.util.Arrays.copyOfRange(b, p + 8, dataEnd.toInt)
          }
          p = (dataEnd + (size & 1)).toInt
        }
      }
    }
    val declaredEnd = math.min(8L + leInt(b, 4), b.length.toLong).toInt
    walk(12, declaredEnd, inMovi = false, depth = 0)
    Some(frames.result())
  }
}
