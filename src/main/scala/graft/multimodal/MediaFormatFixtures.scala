package graft.multimodal

/**
 * Format-specific deterministic fixture builders (GIF/PNG/JPEG/ID3/AVI;
 * round-13 file split of [[MediaFixtures]], pure move, no behavior
 * change): each packer ships a real container whose every decoded field
 * is a closed-form function of the id, with per-id quarantine lanes.
 * Mixed into [[MediaFixtures]] (and so into `object Multimodal`), so all
 * call sites keep addressing `Multimodal.pack*ById`.
 */
private[multimodal] trait MediaFormatFixtures extends MediaContainers { this: MediaFixtures =>

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

  // ---- AVI: RIFF nested-LIST video container ---------------------------

  /**
   * Build real AVI bytes (RIFF/AVI spec layout): `RIFF(AVI )` wrapping a
   * `LIST(hdrl)` — `avih` main header plus one `LIST(strl)`/`strh` per
   * stream — an ODD-sized top-level `JUNK` chunk (RIFF pads odd chunks;
   * a walker without the pad byte desyncs here, before `movi`), then
   * `LIST(movi)` interleaving one `00dc` video chunk per frame (odd/even
   * payload sizes mixed, so intra-movi padding is exercised too) with a
   * `01wb` audio chunk per frame when `streams == 2`. `truncateAfterFirstFrame`
   * cuts the byte stream right after the first video chunk's pad — the
   * in-transit-truncation lane (leading frames still count, verdict flags).
   */
  private[multimodal] def aviBytes(usPerFrame: Int, frames: Int, streams: Int,
                                   width: Int, height: Int,
                                   truncateAfterFirstFrame: Boolean,
                                   seed: Long): Array[Byte] = {
    require(frames >= 1 && (streams == 1 || streams == 2))
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    var x = seed
    def lcgByte(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 56).toInt & 0xff }
    def chunk(id: String, data: Array[Byte]): Unit = {
      fourcc(id); le32(data.length); out.write(data)
      if ((data.length & 1) == 1) out.write(0) // RIFF pad to even
    }
    def list(typ: String, body: Array[Byte]): Unit = {
      fourcc("LIST"); le32(4 + body.length); fourcc(typ); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    def bytesOf(f: => Unit): Array[Byte] = {
      val keep = out.toByteArray; out.reset(); f
      val got = out.toByteArray; out.reset(); out.write(keep, 0, keep.length); got
    }
    // avih: 56 bytes — µs/frame, maxBytesPerSec, padding, flags, total
    // frames, initial frames, streams, sugg. buffer, width, height, rsvd×4
    val avih = bytesOf {
      le32(usPerFrame); le32(0); le32(0); le32(0); le32(frames); le32(0)
      le32(streams); le32(0); le32(width); le32(height)
      le32(0); le32(0); le32(0); le32(0)
    }
    val strls = (0 until streams).map { s =>
      bytesOf {
        fourcc("strh"); le32(56)
        fourcc(if (s == 0) "vids" else "auds")
        (0 until 13).foreach(_ => le32(0))
      }
    }
    val hdrl = bytesOf {
      chunk("avih", avih)
      strls.foreach(b => list("strl", b))
    }
    val movi = bytesOf {
      (0 until frames).foreach { f =>
        chunk("00dc", Array.fill(5 + f % 3)(lcgByte().toByte)) // odd sizes mixed in
        if (streams == 2) chunk("01wb", Array.fill(4)(lcgByte().toByte))
      }
    }
    val junk = Array.fill(7)(lcgByte().toByte) // odd-sized on purpose
    val payload = bytesOf {
      list("hdrl", hdrl)
      chunk("JUNK", junk)
      list("movi", movi)
    }
    val full = bytesOf { fourcc("RIFF"); le32(4 + payload.length); fourcc("AVI "); out.write(payload, 0, payload.length) }
    if (!truncateAfterFirstFrame) full
    else {
      // cut right after the first 00dc chunk (incl. its pad): offset of
      // movi body start + first chunk span
      val firstDc = 5 // 5-byte payload at f=0 (5+0%3), odd → 1 pad byte
      val moviBodyStart = full.length - movi.length
      full.take(moviBodyStart + 8 + firstDc + 1)
    }
  }

  /** Deterministic per-id AVI fixture: every decoded field is a pure
    * function of the id; `id % 11 == 0` ships a non-AVI payload
    * (quarantine), `id % 7 == 0` (not quarantined) truncates mid-`movi` —
    * the first frame still counts, the verdict flags. */
  def packAviById(id: Long): MediaRecord = {
    val payload =
      if (id % 11 == 0) s"not an avi $id".getBytes("UTF-8")
      else aviBytes(
        usPerFrame = 33333 + (id % 5).toInt * 1000,
        frames = 2 + (id % 4).toInt,
        streams = 1 + (id % 2).toInt,
        width = 16 * (1 + (id % 8).toInt),
        height = 8 * (1 + (id % 6).toInt),
        truncateAfterFirstFrame = id % 7 == 0,
        seed = id)
    MediaRecord(id, "video", payload)
  }

  /**
   * AVI container carrying the GIVEN frame payloads as `00dc` chunks —
   * the structured-content sibling of [[aviBytes]] (whose frames are LCG
   * noise) for the frame-level fingerprint fixtures: `LIST(hdrl)` with a
   * correct `avih` + one `vids` `strl`, then `LIST(movi)` with one video
   * chunk per frame. Odd-sized payloads get the RIFF pad byte.
   */
  private[multimodal] def aviWithFrames(frames: Seq[Array[Byte]],
                                        usPerFrame: Int, width: Int,
                                        height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String, data: Array[Byte]): Unit = {
      fourcc(id); le32(data.length); out.write(data)
      if ((data.length & 1) == 1) out.write(0)
    }
    def list(typ: String, body: Array[Byte]): Unit = {
      fourcc("LIST"); le32(4 + body.length); fourcc(typ); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    def bytesOf(f: => Unit): Array[Byte] = {
      val keep = out.toByteArray; out.reset(); f
      val got = out.toByteArray; out.reset(); out.write(keep, 0, keep.length); got
    }
    val avih = bytesOf {
      le32(usPerFrame); le32(0); le32(0); le32(0); le32(frames.size); le32(0)
      le32(1); le32(0); le32(width); le32(height)
      le32(0); le32(0); le32(0); le32(0)
    }
    val strl = bytesOf {
      fourcc("strh"); le32(56); fourcc("vids")
      (0 until 13).foreach(_ => le32(0))
    }
    val hdrl = bytesOf { chunk("avih", avih); list("strl", strl) }
    val movi = bytesOf { frames.foreach(f => chunk("00dc", f)) }
    val payload = bytesOf { list("hdrl", hdrl); list("movi", movi) }
    bytesOf {
      fourcc("RIFF"); le32(4 + payload.length); fourcc("AVI ")
      out.write(payload, 0, payload.length)
    }
  }
}
