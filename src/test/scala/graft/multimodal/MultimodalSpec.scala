package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "image", "hello world payload".getBytes("UTF-8")),
    MediaRecord(2L, "image", Array.empty[Byte]),
    MediaRecord(3L, "video", ("x" * 300).getBytes("UTF-8"))).toDS()

  test("feature extraction is deterministic over bytes; empty payload safe") {
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    assert(f(1L).byte_len === 19L && f(1L).first_byte === 'h'.toInt)
    assert(f(1L).width === 64 + 19 && f(1L).height === 64 + (('h'.toInt * 7) % 768))
    assert(f(2L).byte_len === 0L && f(2L).first_byte === 0)
    // same payload → same phash
    val again = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m.phash).toMap
    assert(f.view.mapValues(_.phash).toMap === again)
  }

  test("frame sampling yields one row per stride window") {
    val frames = Multimodal.sampleFrames(media, stride = 100).collect()
    // payload 3 is 300 bytes → 3 frames; others too short
    assert(frames.count(_.media_id == 3L) === 3)
    assert(frames.count(_.media_id == 1L) === 0)
    assert(frames.map(_.frame_idx).toSet.subsetOf(Set(0, 1, 2)))
  }

  test("packText produces binary payload with typed metadata") {
    val df = Seq((7L, "abc")).toDF("id", "txt")
    val packed = Multimodal.packText(df, "id", "txt", "audio")
    val r = packed.as[MediaRecord].collect()(0)
    assert(r.media_id === 7L && r.media_type === "audio")
    assert(new String(r.payload, "UTF-8") === "abc")
  }

  test("BMP round-trip: generated header fields parse back exactly") {
    for ((w, h) <- Seq((1, 1), (5, 3), (16, 9), (33, 7))) {
      val b = Multimodal.bmpBytes(w, h, seed = 42L)
      assert(Multimodal.decodeBmp(b) === Some((w, h, 24)), s"($w,$h)")
      // dimensions come from the header, not the byte length: padding rows
      // to 4 bytes means len alone cannot recover an arbitrary width
      assert(b.length === 54 + ((w * 3 + 3) / 4) * 4 * h)
    }
    // truncated and non-BMP payloads refuse, not misparse
    assert(Multimodal.decodeBmp(Multimodal.bmpBytes(4, 4, 1L).take(30)) === None)
    assert(Multimodal.decodeBmp("BMnot really a bitmap".getBytes) === None)
    assert(Multimodal.decodeBmp(Array.empty[Byte]) === None)
    // a BITMAPCOREHEADER-style DIB (size 12) lays out w/h/bpp differently —
    // must refuse rather than read the INFO-header offsets as garbage
    val core = Multimodal.bmpBytes(4, 4, 1L).clone()
    core(14) = 12; core(15) = 0; core(16) = 0; core(17) = 0
    assert(Multimodal.decodeBmp(core) === None)
  }

  test("WAV round-trip: fmt/data chunk walk recovers channels, rate, bits, duration") {
    for ((ch, rate, bits, n) <- Seq((1, 8000, 8, 97), (2, 16000, 16, 1),
        (1, 24000, 16, 96), (2, 44100, 8, 13))) {
      val b = Multimodal.wavBytes(ch, rate, bits, n, seed = 7L)
      val expectMs = n.toLong * (ch * bits / 8) * 1000L / (rate.toLong * ch * bits / 8)
      assert(Multimodal.decodeWav(b) === Some((ch, rate, bits, expectMs)),
        s"($ch,$rate,$bits,$n)")
    }
    // truncated header / wrong magic → None (never a bogus parse)
    assert(Multimodal.decodeWav(Multimodal.wavBytes(1, 8000, 8, 10, 1L).take(40)) === None)
    assert(Multimodal.decodeWav("RIFFxxxxNOPE".getBytes) === None)
    // non-integer-PCM audioFormat (IEEE float = 3) → quarantine, since the
    // PCM bit/duration math would be wrong for it
    val float32 = Multimodal.wavBytes(1, 8000, 16, 10, 1L).clone()
    float32(20) = 3
    assert(Multimodal.decodeWav(float32) === None)
  }

  test("decodeMedia routes BMP/WAV/unknown per payload, distributed") {
    val ds = Seq(
      MediaRecord(0L, "image", Multimodal.bmpBytes(6, 2, 0L)),
      MediaRecord(1L, "audio", Multimodal.wavBytes(2, 16000, 16, 50, 1L)),
      MediaRecord(2L, "image", "definitely not media".getBytes)).toDS()
    val out = Multimodal.decodeMedia(ds).collect().map(d => d.media_id -> d).toMap
    assert(out(0L).container === "bmp" && out(0L).width === 6 &&
      out(0L).height === 2 && out(0L).bits === 24)
    assert(out(1L).container === "wav" && out(1L).channels === 2 &&
      out(1L).sample_rate === 16000 && out(1L).bits === 16 &&
      out(1L).duration_ms === 50L * 1000L / 16000L)
    assert(out(2L).container === "unknown" && out(2L).width === 0)
  }

  test("packMediaById: id-derived header fields match the m3 oracle formulas") {
    for (id <- 0L until 24L) {
      val rec = Multimodal.packMediaById(id)
      val d = Multimodal.decodeMedia(Seq(rec).toDS()).collect()(0)
      if (id % 2 == 0) {
        assert(d.container === "bmp")
        assert(d.width === 1 + (id % 16).toInt && d.height === 1 + (id % 9).toInt)
        assert(d.bits === 24)
      } else {
        assert(d.container === "wav")
        assert(d.channels === 1 + ((id / 2) % 2).toInt)
        assert(d.sample_rate === 8000 * (1 + (id % 3).toInt))
        assert(d.bits === 8 * (1 + ((id / 4) % 2).toInt))
        assert(d.duration_ms === (1 + id % 97) * 1000L / (8000L * (1 + id % 3)))
      }
    }
  }

  test("resampleAudio2x: channel-0 stride, sign folds, and box means are exact") {
    // hand-built 16-bit STEREO wav: ch0 samples 1000, -2000, 30000, -30000
    // interleaved with ch1 junk; expected out = mean of ch0 pairs
    val samples = Seq(
      (1000, 7), (-2000, 8), (30000, 9), (-30000, 11))
    val ba = 4 // 2ch * 16bit
    val data = new Array[Byte](samples.size * ba)
    samples.zipWithIndex.foreach { case ((c0, c1), i) =>
      data(i * ba) = (c0 & 0xff).toByte; data(i * ba + 1) = ((c0 >> 8) & 0xff).toByte
      data(i * ba + 2) = (c1 & 0xff).toByte; data(i * ba + 3) = ((c1 >> 8) & 0xff).toByte
    }
    val header = Multimodal.wavBytes(channels = 2, sampleRate = 8000, bits = 16,
      nSamples = samples.size, seed = 1L)
    System.arraycopy(data, 0, header, 44, data.length) // overwrite LCG payload
    val out = Multimodal.resampleAudio2x(
        Seq(MediaRecord(5L, "audio", header)).toDS())
      .collect().sortBy(_.out_idx)
    assert(out.map(_.value).toSeq == Seq((1000 - 2000) / 2.0, (30000 - 30000) / 2.0))
    assert(out.forall(r => r.in_samples == 4 && r.out_samples == 2))
  }

  test("resampleAudio2x: 8-bit recenters at -128 and odd tails drop") {
    // mono 8-bit, 3 samples: 0 -> -128, 255 -> 127, tail unpaired
    val wav = Multimodal.wavBytes(channels = 1, sampleRate = 8000, bits = 8,
      nSamples = 3, seed = 1L)
    wav(44) = 0; wav(45) = 255.toByte; wav(46) = 10
    val out = Multimodal.resampleAudio2x(Seq(MediaRecord(1L, "audio", wav)).toDS()).collect()
    assert(out.length == 1 && out(0).value == (-128 + 127) / 2.0)
    // truncated payload: declared 3 samples, bytes for 2 -> clamp, 1 pair
    val trunc = wav.take(46)
    val out2 = Multimodal.resampleAudio2x(Seq(MediaRecord(2L, "audio", trunc)).toDS()).collect()
    assert(out2.length == 1 && out2(0).in_samples == 2)
    // BMP payloads are skipped, not errored
    val bmp = Multimodal.packMediaById(0L)
    assert(Multimodal.resampleAudio2x(Seq(bmp).toDS()).collect().isEmpty)
  }

  test("downsampleImage2x: bottom-up fold, row padding, channel order, odd dims") {
    // hand-built 3x3 24bpp BMP: header + bottom-up padded rows; paint pixel
    // (x, y in TOP-DOWN coords) as B=x, G=y, R=10x+y so any axis mixup shows
    val w = 3; val h = 3
    val rowSize = ((w * 3 + 3) / 4) * 4 // 12
    val bytes = Multimodal.bmpBytes(w, h, seed = 1L)
    for (ty <- 0 until h; x <- 0 until w) {
      val off = 54 + (h - 1 - ty) * rowSize + x * 3
      bytes(off) = x.toByte; bytes(off + 1) = ty.toByte; bytes(off + 2) = (10 * x + ty).toByte
    }
    val out = Multimodal.downsampleImage2x(
        Seq(MediaRecord(7L, "image", bytes)).toDS()).collect()
      .map(p => (p.x, p.y) -> p).toMap
    // ceil dims: 3x3 -> 2x2; output (x,y) samples source (2x, 2y)
    assert(out.size === 4 && out.values.forall(p => p.out_w == 2 && p.out_h == 2))
    for (x <- 0 to 1; y <- 0 to 1) {
      val p = out((x, y))
      assert((p.b, p.g, p.r) === ((2 * x, 2 * y, 10 * (2 * x) + 2 * y)),
        s"pixel ($x,$y)")
    }
    // WAV payloads are skipped, not errored
    val wavRec = Multimodal.packMediaById(1L)
    assert(Multimodal.downsampleImage2x(Seq(wavRec).toDS()).collect().isEmpty)
    // truncated payload: pixels past the clamp are dropped, not thrown
    val trunc = MediaRecord(8L, "image", bytes.take(54 + rowSize)) // only bottom row
    val tout = Multimodal.downsampleImage2x(Seq(trunc).toDS()).collect()
    assert(tout.forall(p => p.y == 1), "only the bottom source row survives truncation")
  }

  test("imageDHash: hand-computed bits, hand-verified sampling grid") {
    // 18x8 horizontal sawtooth: gray rises by 10 per column up to x=8 then
    // falls — so resized columns brighten left->right exactly while
    // sampled x < 8, and the expected bit pattern is computable by hand
    def tooth(x: Int, y: Int): Int = if (x <= 8) 10 * x else 10 * (16 - x)
    val img = MediaRecord(1L, "image", Multimodal.bmpPatternBytes(18, 8, tooth))
    val got = Multimodal.imageDHash(Seq(img).toDS()).collect()(0).dhash
    // grid samples at sx = gx*18/9 = 2*gx, sy = gy (h = gridH = 8);
    // bit set iff tooth(2(gx+1)) > tooth(2gx): rises for gx=0..3, falls after
    val expect = (for {
      gy <- 0 until 8; gx <- 0 until 8
      if tooth(2 * (gx + 1), gy) > tooth(2 * gx, gy)
    } yield 1L << (gy * 8 + gx)).foldLeft(0L)(_ | _)
    assert(got === expect)
    assert(java.lang.Long.bitCount(got) === 32) // 4 rising of 8 per row
  }

  test("imageDHash: resolution-invariant for smooth gradients") {
    // the same normalized horizontal gradient rendered at 16x16 and 32x32:
    // dHash compares left->right brightening, which survives the resize
    def grad(w: Int)(x: Int, y: Int): Int = x * 255 / (w - 1)
    val small = MediaRecord(1L, "image",
      Multimodal.bmpPatternBytes(16, 16, grad(16)))
    val big = MediaRecord(2L, "image",
      Multimodal.bmpPatternBytes(32, 32, grad(32)))
    val h = Multimodal.imageDHash(Seq(small, big).toDS()).collect()
      .map(r => r.media_id -> r.dhash).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) === -1L) // every column brightens: all 64 bits set
  }

  test("imageDHash pairs: planted re-encode found near, distinct ids far") {
    import graft.llm.Dedup
    val media = Seq(100L, 101L, 102L).flatMap(Multimodal.packImagePairById).toDS()
    val hashes = Multimodal.imageDHash(media).toDF()
    val hs = hashes.as[(Long, Long)].collect().toMap
    // planted perturbation flips few gradient bits; distinct patterns many
    for (id <- Seq(100L, 101L, 102L)) {
      val d = java.lang.Long.bitCount(hs(2 * id) ^ hs(2 * id + 1))
      assert(d <= 3, s"planted pair of id $id at hamming $d")
    }
    assert(java.lang.Long.bitCount(hs(200L) ^ hs(202L)) > 10)
    // the banded Hamming join surfaces exactly the planted pairs here
    val pairs = Dedup.fingerprintNearDups(hashes, "media_id", "dhash",
        maxHamming = 3, blocks = 4, maxBucketSize = 1000)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(Seq(100L, 101L, 102L).forall(id => pairs.contains((2 * id, 2 * id + 1))))
    // non-BMP and truncated payloads are skipped, not errored
    val wav = Multimodal.packMediaById(1L)
    val truncated = MediaRecord(9L, "image",
      Multimodal.packImagePairById(100L).head.payload.take(60))
    assert(Multimodal.imageDHash(Seq(wav, truncated).toDS()).collect().isEmpty)
  }

  test("audioFingerprint: hand-computed envelope bits; quarantine semantics") {
    // 260 samples whose frame energy alternates LOW (frames 0,2,4,…: all 0)
    // and HIGH (odd frames: all 100): bit f = [E(f+1) > E(f)] = [f even]
    val alt = Multimodal.wavPatternBytes(260,
      i => if ((i / 4) % 2 == 1) 100 else 0)
    val got = Multimodal.audioFingerprint(
      Seq(MediaRecord(1L, "audio", alt)).toDS()).collect()(0).afp
    val expect = (0 until 64 by 2).map(1L << _).foldLeft(0L)(_ | _)
    assert(got === expect)
    // too-short payloads and non-WAV payloads are skipped, not errored
    val short = Multimodal.wavPatternBytes(100, _ => 1)
    val bmp = Multimodal.packMediaById(0L)
    assert(Multimodal.audioFingerprint(
      Seq(MediaRecord(2L, "audio", short), bmp).toDS()).collect().isEmpty)
  }

  test("audioFingerprint pairs: planted re-encode near, distinct ids far") {
    import graft.llm.Dedup
    val media = Seq(7L, 8L, 9L).flatMap(Multimodal.packAudioPairById).toDS()
    val fps = Multimodal.audioFingerprint(media).toDF()
    val hs = fps.as[(Long, Long)].collect().toMap
    for (id <- Seq(7L, 8L, 9L)) {
      val d = java.lang.Long.bitCount(hs(2 * id) ^ hs(2 * id + 1))
      assert(d <= 3, s"planted pair of id $id at hamming $d")
    }
    assert(java.lang.Long.bitCount(hs(14L) ^ hs(16L)) > 10)
    val pairs = Dedup.fingerprintNearDups(fps, "media_id", "afp",
        maxHamming = 3, blocks = 4, maxBucketSize = 1000)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(Seq(7L, 8L, 9L).forall(id => pairs.contains((2 * id, 2 * id + 1))))
  }

  test("PNG round-trip: generated chunks parse back; corrupt CRC detected; non-PNG refused") {
    val png = Multimodal.pngBytes(width = 13, height = 7, seed = 42L)
    assert(Multimodal.decodePng(png) === Some((13, 7, 8, 2, true)))
    assert(Multimodal.decodePng(Multimodal.corruptIhdrCrc(png))
      === Some((13, 7, 8, 2, false)), "flipped CRC byte must fail validation, not parsing")
    assert(Multimodal.decodePng("GIF89a not a png".getBytes("UTF-8")) === None)
    assert(Multimodal.decodePng(Array[Byte](0x89.toByte, 'P', 'N')) === None)
  }

  test("PNG parser agrees with the JDK's OWN ImageIO encoder (independent of our generator)") {
    val img = new java.awt.image.BufferedImage(21, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 9).foreach(y => (0 until 21).foreach(x => img.setRGB(x, y, x * 31 + y)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val got = Multimodal.decodePng(out.toByteArray)
    assert(got.isDefined, "real ImageIO PNG must parse")
    val (w, h, depth, _, crcOk) = got.get
    assert((w, h, depth, crcOk) === (21, 9, 8, true))
  }

  test("decodePngMedia + packPngById: m8 oracle formulas hold, quarantine lane routed") {
    val ids = (1L to 60L)
    val media = ids.map(Multimodal.packPngById).toDS()
    val out = Multimodal.decodePngMedia(media)
      .as[(Long, Boolean, Int, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    ids.foreach { id =>
      val (_, isPng, w, h, depth, ct, crcOk) = out(id)
      if (id % 11 == 0) assert((isPng, w, h, depth, ct, crcOk) === (false, 0, 0, 0, 0, false))
      else {
        assert((isPng, w, h, depth, ct) ===
          (true, 8 + (id % 16).toInt, 4 + (id % 8).toInt, 8, 2))
        assert(crcOk === (id % 5 != 0), s"id $id crc flag")
      }
    }
  }

  test("GIF decode: LE dims, GCT size, frame walk past LCTs and multi-sub-blocks") {
    // direct parser checks on hand-built containers
    val g = Multimodal.gifBytes(width = 300, height = 7, gctBits = 2,
      frames = 3, seed = 99L)
    // width 300 exercises the LE high byte; gctBits 2 → 8 entries; frame 1
    // carries a local color table; every frame has two data sub-blocks
    assert(Multimodal.decodeGif(g) === Some((300, 7, 8, 3, true)))
    assert(Multimodal.decodeGif(g.dropRight(1)) === Some((300, 7, 8, 3, false)))
    // truncation mid-frame loses that frame AND the trailer
    val cut = Multimodal.decodeGif(g.take(g.length - 9)).get
    assert(cut._4 < 3 && !cut._5, "mid-frame cut drops the frame and the verdict")
    assert(Multimodal.decodeGif("GIF90x?????????????".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodeGif(Array[Byte](1, 2, 3)) === None)
  }

  test("GIF media batch: per-id closed forms and quarantine lanes hold") {
    import spark.implicits._
    val ids = (1L to 80L)
    val out = Multimodal.decodeGifMedia(ids.toDS().map(Multimodal.packGifById))
      .collect().map(r => r.media_id -> r).toMap
    ids.foreach { id =>
      val r = out(id)
      if (id % 11 == 0)
        assert((r.is_gif, r.width, r.n_frames, r.trailer_ok) === (false, 0, 0, false))
      else {
        assert((r.is_gif, r.width, r.height) ===
          (true, 4 + (id % 12).toInt, 3 + (id % 9).toInt))
        assert(r.gct_entries === (1 << ((id % 3).toInt + 1)))
        assert(r.n_frames === 1 + (id % 3).toInt, s"id $id frames")
        assert(r.trailer_ok === (id % 7 != 0), s"id $id trailer")
      }
    }
  }

  test("JPEG decode: marker walk, entropy scan past stuffing + restarts, SOF2 flag") {
    val j = Multimodal.jpegBytes(width = 300, height = 7, components = 3,
      progressive = false, seed = 99L)
    // width 300 exercises the BE high byte; the fixture plants stuffed
    // 0xFF 0x00 pairs and an RST0 inside the scan — both must be walked over
    assert(Multimodal.decodeJpeg(j) === Some((300, 7, 3, false, true)))
    assert(Multimodal.decodeJpeg(j.dropRight(2)) === Some((300, 7, 3, false, false)),
      "dropped EOI: dims decode, verdict flags")
    val prog = Multimodal.jpegBytes(width = 5, height = 4, components = 1,
      progressive = true, seed = 7L)
    assert(Multimodal.decodeJpeg(prog) === Some((5, 4, 1, true, true)))
    assert(Multimodal.decodeJpeg("RIFF not a jpeg".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)) === None,
      "SOI alone has no SOF: refuse, don't fabricate dims")
  }

  test("JPEG parser agrees with the JDK's OWN ImageIO encoder (independent of our generator)") {
    val img = new java.awt.image.BufferedImage(21, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 9).foreach(y => (0 until 21).foreach(x => img.setRGB(x, y, x * 31 + y)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val got = Multimodal.decodeJpeg(out.toByteArray)
    assert(got.isDefined, "real ImageIO JPEG must parse")
    val (w, h, ncomp, _, eoiOk) = got.get
    assert((w, h, ncomp, eoiOk) === (21, 9, 3, true))
  }

  test("ID3v2: syncsafe sizes, frame rotation, corrupt-padding flag") {
    // declared size 2*19 + 128 = 166 > 127: a big-endian size read would
    // see 0x01 0x26 as 294, not syncsafe 166 — round-trip catches it
    val t = Multimodal.id3Bytes(nFrames = 2, start = 0, padding = 128,
      corruptPadding = false, seed = 5L)
    assert(Multimodal.decodeId3(t) === Some((4, 2, 166, true, true)))
    // start=1, n=2 → TPE1, TALB: no title frame
    val noTitle = Multimodal.id3Bytes(2, 1, 128, corruptPadding = false, 5L)
    assert(Multimodal.decodeId3(noTitle) === Some((4, 2, 166, false, true)))
    // corrupt padding byte: frames counted, verdict flags
    val bad = Multimodal.id3Bytes(2, 0, 128, corruptPadding = true, 5L)
    assert(Multimodal.decodeId3(bad) === Some((4, 2, 166, true, false)))
    assert(Multimodal.decodeId3("RIFF not id3".getBytes("US-ASCII")) === None)
  }

  test("ID3 media batch: per-id closed forms and quarantine lanes hold") {
    import spark.implicits._
    val ids = (1L to 80L)
    val out = Multimodal.decodeId3Media(ids.toDS().map(Multimodal.packId3ById))
      .collect().map(r => r.media_id -> r).toMap
    ids.foreach { id =>
      val r = out(id)
      if (id % 11 == 0)
        assert((r.is_id3, r.version, r.n_frames, r.tag_size) === (false, 0, 0, 0))
      else {
        assert((r.is_id3, r.version, r.n_frames) === (true, 4, 1 + (id % 3).toInt))
        assert(r.tag_size === 19 * (1 + (id % 3).toInt) + 120 + (id % 17).toInt, s"id $id size")
        assert(r.has_title === (id % 3 != 1), s"id $id title")
        assert(r.padding_ok === (id % 7 != 0), s"id $id padding")
      }
    }
  }

  test("JPEG media batch: per-id closed forms and quarantine lanes hold") {
    import spark.implicits._
    val ids = (1L to 80L)
    val out = Multimodal.decodeJpegMedia(ids.toDS().map(Multimodal.packJpegById))
      .collect().map(r => r.media_id -> r).toMap
    ids.foreach { id =>
      val r = out(id)
      if (id % 11 == 0)
        assert((r.is_jpeg, r.width, r.height, r.n_components, r.progressive, r.eoi_ok)
          === (false, 0, 0, 0, false, false))
      else {
        assert((r.is_jpeg, r.width, r.height) ===
          (true, 5 + (id % 13).toInt, 3 + (id % 10).toInt), s"id $id dims")
        assert(r.n_components === (if (id % 2 == 0) 3 else 1), s"id $id comps")
        assert(r.progressive === (id % 3 == 0), s"id $id sof kind")
        assert(r.eoi_ok === (id % 7 != 0), s"id $id eoi")
      }
    }
  }

  test("garbage BMP pixel-data offset is quarantined, never thrown (dHash + downsample)") {
    import spark.implicits._
    // valid header/dimensions, but byte 10 rewritten to a negative and an
    // out-of-range offset: decodeBmp still accepts; the offset guard must
    // route both to the skip lane instead of ArrayIndexOutOfBounds
    def corrupt(off: Int): Array[Byte] = {
      val b = Multimodal.bmpBytes(8, 8, seed = 3L).clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(10, off)
      b
    }
    val recs = Seq(
      MediaRecord(1L, "image", corrupt(-100)),
      MediaRecord(2L, "image", corrupt(Int.MinValue)),
      MediaRecord(3L, "image", corrupt(1 << 30)),   // far past payload end
      MediaRecord(4L, "image", corrupt(10)),        // inside the header
      MediaRecord(5L, "image", Multimodal.bmpBytes(8, 8, seed = 3L))).toDS()
    val hashes = Multimodal.imageDHash(recs).collect()
    assert(hashes.map(_.media_id).toSeq === Seq(5L), "only the intact BMP hashes")
    val pix = Multimodal.downsampleImage2x(recs).collect()
    assert(pix.nonEmpty && pix.forall(_.media_id == 5L), "only the intact BMP downsamples")
  }

  test("header-forged BMP dims that wrap Int offsets are quarantined, not mis-decoded") {
    import spark.implicits._
    // w=1, h=2^30 over an 8×8 payload: rowSize=4 and (h-1-ty)·rowSize wraps
    // a 32-bit int to a SMALL POSITIVE value — the old `off < 0` guard
    // passed it and downsampleImage2x emitted header bytes as pixels
    // (round-10 review finding); LONG offset math must skip the record
    def forge(w: Int, h: Int): Array[Byte] = {
      val b = Multimodal.bmpBytes(8, 8, seed = 11L).clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, w); bb.putInt(22, h)
      b
    }
    val recs = Seq(
      MediaRecord(1L, "image", forge(1, 1 << 30)),
      MediaRecord(2L, "image", forge(0x20000000, 3)), // w·3 wraps rowSize
      MediaRecord(3L, "image", Multimodal.bmpBytes(8, 8, seed = 11L))).toDS()
    val pix = Multimodal.downsampleImage2x(recs).collect()
    assert(pix.nonEmpty && pix.forall(_.media_id == 3L),
      s"forged dims must quarantine: ${pix.filter(_.media_id != 3L).take(3).toSeq}")
    val hashes = Multimodal.imageDHash(recs).collect()
    assert(hashes.map(_.media_id).toSeq === Seq(3L))
  }

  test("fixture fingerprint diversity scales with id count (no family saturation)") {
    import spark.implicits._
    // 2000 ids spanning a scaled-up id range (the ScaleUp stride pattern):
    // the wide-entropy coefficient mix must give ~all-distinct hashes —
    // the round-9 residue coefficients saturated at ~15k image families
    // and made the sf1 m6/m7 pair output quadratic in the duplication
    val ids = (0 until 2000).map(i => (i % 10) * 1000000L + i / 10 * 4L)
    val imgs = ids.map(id => Multimodal.packImagePairById(id).head).toDS()
    val nImg = Multimodal.imageDHash(imgs).collect().map(_.dhash).distinct.length
    assert(nImg >= 1990, s"image hash diversity $nImg/2000")
    val wavs = ids.map(id => Multimodal.packAudioPairById(id).head).toDS()
    val nWav = Multimodal.audioFingerprint(wavs).collect().map(_.afp).distinct.length
    assert(nWav >= 1990, s"audio fp diversity $nWav/2000")
  }

  test("AVI decode: nested-LIST walk, avih fields, odd-chunk padding, movi counts") {
    val a = Multimodal.aviBytes(usPerFrame = 40000, frames = 3, streams = 2,
      width = 320, height = 240, truncateAfterFirstFrame = false, seed = 7L)
    // hdrl is a LIST inside RIFF, avih a chunk inside hdrl, strl LISTs
    // nest one deeper, and an ODD-sized JUNK chunk sits before movi — a
    // flat or padless walk cannot produce these counts
    assert(Multimodal.decodeAvi(a) === Some((40000, 3, 2, 320, 240, 3, 3, true)))
    // single-stream: no audio chunks
    val v = Multimodal.aviBytes(usPerFrame = 33333, frames = 4, streams = 1,
      width = 64, height = 48, truncateAfterFirstFrame = false, seed = 8L)
    assert(Multimodal.decodeAvi(v) === Some((33333, 4, 1, 64, 48, 4, 0, true)))
    // truncated mid-movi: first complete frame still counts, verdict flags
    val t = Multimodal.aviBytes(usPerFrame = 40000, frames = 3, streams = 2,
      width = 320, height = 240, truncateAfterFirstFrame = true, seed = 7L)
    assert(Multimodal.decodeAvi(t) === Some((40000, 3, 2, 320, 240, 1, 0, false)))
    // an arbitrary byte-level cut (mid-chunk-header) must never throw
    (1 until a.length).by(13).foreach { n =>
      val r = Multimodal.decodeAvi(a.take(n))
      assert(n < 12 && r.isEmpty || r.exists(!_._8), s"cut at $n flags unclean")
    }
    assert(Multimodal.decodeAvi("RIFF????WAVE".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodeAvi(Array[Byte](1, 2, 3)) === None)
  }

  test("AVI decode: adversarial deep LIST nesting is depth-bounded (ADVICE r10)") {
    // 100k nested 12-byte LIST headers — an unbounded recursive walk
    // StackOverflowErrors here; the depth guard must flag unclean instead
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val levels = 100000
    val bb = java.nio.ByteBuffer.allocate(12 + levels * 12)
    bb.put("RIFF".getBytes("US-ASCII")).put(le(4 + levels * 12))
      .put("AVI ".getBytes("US-ASCII"))
    (0 until levels).foreach { i =>
      val remaining = (levels - i) * 12 - 8
      bb.put("LIST".getBytes("US-ASCII")).put(le(remaining))
        .put("xxxx".getBytes("US-ASCII"))
    }
    val r = Multimodal.decodeAvi(bb.array())
    assert(r.isDefined && !r.get._8, "deep nesting must parse unclean, not throw")
  }

  test("video frames: movi walk extracts BMP keyframes in order; dHash matches image path") {
    import spark.implicits._
    val media = Seq(3L, 4L, 5L).flatMap(Multimodal.packVideoPairById).toDS()
    val frames = Multimodal.videoFrameDHash(media).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.fdhash).toMap
    // frame counts: nf = 3 + id % 3 per variant
    Seq(3L -> 3, 4L -> 4, 5L -> 5).foreach { case (id, nf) =>
      Seq(0, 1).foreach { v =>
        val got = frames.keys.count(_._1 == 2 * id + v)
        assert(got === nf, s"id=$id v=$v frames")
      }
    }
    // each frame's dHash equals the IMAGE path's dHash of the same pattern
    val asImages = (0 until 3).map { f =>
      MediaRecord(f.toLong, "image", Multimodal.bmpPatternBytes(
        Multimodal.PatternDim, Multimodal.PatternDim,
        (x, y) => Multimodal.patternGray(3L * 31 + f, 0, x, y)))
    }.toDS()
    Multimodal.imageDHash(asImages).collect().foreach { ih =>
      assert(frames((6L, ih.media_id.toInt)) === ih.dhash,
        s"frame ${ih.media_id} dHash differs from image path")
    }
  }

  test("video near-dup clusters: planted re-encode pairs co-cluster; quarantine absent") {
    import spark.implicits._
    // 11 quarantines (non-AVI both variants); others plant (2id, 2id+1)
    val media = Seq(3L, 4L, 11L, 20L).flatMap(Multimodal.packVideoPairById).toDS()
    val frames = Multimodal.videoFrameDHash(media).toDF()
    val pairs = Multimodal.videoNearDupPairs(frames)
    val got = pairs.select("id1", "id2", "matched", "n1", "n2")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => (r._1, r._2) -> r).toMap
    Seq(3L, 4L, 20L).foreach { id =>
      val p = got.get((2 * id, 2 * id + 1))
      assert(p.isDefined, s"planted pair for id=$id missing")
      val (_, _, matched, n1, n2) = p.get
      assert(matched === n1 && n1 === n2, s"id=$id all aligned frames must match")
    }
    assert(!got.keys.exists(k => k._1 / 2 == 11L || k._2 / 2 == 11L),
      "quarantined id 11 must produce no pairs")
    val clusters = graft.llm.Dedup.nearDupClusters(
        pairs.select("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    Seq(3L, 4L, 20L).foreach { id =>
      assert(clusters(2 * id) === clusters(2 * id + 1), s"id=$id pair must co-cluster")
    }
  }

  test("video shift dedup: trimmed variants match at the planted offset; m14 misses them") {
    import spark.implicits._
    // trims: id=3 → trim 2 of 7 frames; id=4 → trim 1 of 8; id=11 quarantine
    val media = Seq(3L, 4L, 11L, 20L).flatMap(Multimodal.packVideoTrimPairById).toDS()
    val frames = Multimodal.videoFrameDHash(media).toDF()
    val got = Multimodal.videoNearDupPairsShifted(frames)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    Seq(3L, 4L, 20L).foreach { id =>
      val nf = 4 + (id % 3)
      val trim = 1 + (id % 2)
      val p = got.get((2 * id, 2 * id + 1))
      assert(p.isDefined, s"planted trimmed pair for id=$id missing")
      val (_, _, bestShift, matched, n1, n2) = p.get
      assert(bestShift === -trim, s"id=$id shift must be -trim")
      assert(n1 === nf && n2 === nf - trim, s"id=$id frame counts")
      assert(matched === n2, s"id=$id every trimmed frame must match")
    }
    assert(!got.keys.exists(k => k._1 / 2 == 11L || k._2 / 2 == 11L),
      "quarantined id 11 must produce no pairs")
    // the motivating asymmetry: m14's aligned matcher rejects the same
    // planted trims (no frame matches at delta 0)
    val aligned = Multimodal.videoNearDupPairs(frames)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    Seq(3L, 4L, 20L).foreach { id =>
      assert(!aligned.contains((2 * id, 2 * id + 1)),
        s"id=$id trimmed pair should be invisible to the aligned matcher")
    }
  }

  test("audio shift dedup: trimmed clips match at the planted offset; whole-clip m7 misses them") {
    import spark.implicits._
    // id=3 → 6 segs, trim 2; id=4 → 4 segs, trim 1; id=11 quarantine
    val media = Seq(3L, 4L, 11L, 20L).flatMap(Multimodal.packAudioTrimPairById).toDS()
    import org.apache.spark.sql.functions.col
    val segs = Multimodal.audioSegmentFingerprints(media).toDF()
      .select(col("media_id"), col("seg_idx").as("frame_idx"),
        col("afp").as("fdhash"))
    val got = Multimodal.videoNearDupPairsShifted(segs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    Seq(3L, 4L, 20L).foreach { id =>
      val nSegs = 3 + (id % 3)
      val trim = 1 + (id % 2)
      val p = got.get((2 * id, 2 * id + 1))
      assert(p.isDefined, s"planted trimmed audio pair for id=$id missing")
      val (_, _, bestShift, matched, n1, n2) = p.get
      assert(bestShift === -trim, s"id=$id shift must be -trim")
      assert(n1 === nSegs && n2 === nSegs - trim, s"id=$id segment counts")
      assert(matched === n2, s"id=$id every trimmed segment must match")
    }
    assert(!got.keys.exists(k => k._1 / 2 == 11L || k._2 / 2 == 11L),
      "quarantined id 11 must produce no pairs")
    // the whole-clip m7 fingerprint path cannot see the same trims
    val whole = Multimodal.audioFingerprint(media).toDF()
    val aligned = graft.llm.Dedup.fingerprintNearDups(whole, "media_id", "afp")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    Seq(3L, 4L, 20L).foreach { id =>
      assert(!aligned.contains((2 * id, 2 * id + 1)),
        s"id=$id trimmed clip should be invisible to the whole-clip fingerprint")
    }
  }

  test("AVI media batch: per-id closed forms and quarantine lanes hold") {
    import spark.implicits._
    val ids = (1L to 80L)
    val out = Multimodal.decodeAviMedia(ids.toDS().map(Multimodal.packAviById))
      .collect().map(r => r.media_id -> r).toMap
    ids.foreach { id =>
      val r = out(id)
      if (id % 11 == 0)
        assert((r.is_avi, r.width, r.video_chunks, r.clean_end) === (false, 0, 0, false))
      else {
        assert((r.is_avi, r.us_per_frame, r.total_frames, r.n_streams) ===
          (true, 33333 + (id % 5).toInt * 1000, 2 + (id % 4).toInt, 1 + (id % 2).toInt))
        assert((r.width, r.height) ===
          (16 * (1 + (id % 8).toInt), 8 * (1 + (id % 6).toInt)))
        if (id % 7 == 0)
          assert((r.video_chunks, r.audio_chunks, r.clean_end) === (1, 0, false),
            s"id $id truncation lane")
        else {
          assert(r.video_chunks === 2 + (id % 4).toInt, s"id $id video chunks")
          assert(r.audio_chunks === (id % 2).toInt * (2 + (id % 4).toInt), s"id $id audio chunks")
          assert(r.clean_end, s"id $id clean end")
        }
      }
    }
  }

  test("m15 gate cascade: first failing gate wins, in the fixed order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hand-picked ids: 1 odd -> not_image regardless of caption;
    // 2 -> w=3 (<4) low_res even though caption is short too;
    // 48 -> w=1 low_res; 30 -> w=15,h=4 bad_aspect (15>12);
    // 12 -> w=13,h=4 bad_aspect (13>12); 4 -> w=5,h=5, 4%8=4 -> ok;
    // 58 -> w=11,h=5 fine dims but 58%8=2 < 3 -> short_caption;
    // 10 -> w=11,h=2 low_res (h<3)
    val ids = Seq(1L, 2L, 48L, 30L, 12L, 4L, 58L, 10L)
    val docs = ids.map(i => (i, "five words of caption text here")).toDF("doc_id", "text")
    val media = docs.select(col("doc_id")).as[Long].map(Multimodal.packMediaById)
    val dec = Multimodal.decodeMedia(media).toDF()
    val cap = docs.select(col("doc_id").as("pair_id"),
      least(lit(6L), pmod(col("doc_id"), lit(8L))).as("n"))
    val out = dec.join(cap, col("media_id") === col("pair_id"))
      .select(col("pair_id"),
        when(col("container") =!= "bmp", "not_image")
          .when(col("width") < 4 || col("height") < 3, "low_res")
          .when(col("width") > col("height") * 3
            || col("height") > col("width") * 3, "bad_aspect")
          .when(col("n") < 3, "short_caption")
          .otherwise("ok").as("verdict"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "not_image")
    assert(out(2L) === "low_res")      // before short_caption: order fixed
    assert(out(48L) === "low_res")
    assert(out(30L) === "bad_aspect")
    assert(out(12L) === "bad_aspect")
    assert(out(4L) === "ok")
    assert(out(58L) === "short_caption")
    assert(out(10L) === "low_res")
  }
}
