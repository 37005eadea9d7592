package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.multimodal.Multimodal
import Registry.{td, tdw}

/**
 * Multimodal media registry rows (split from AnnQueries, round 11 — pure
 * mechanical move on the family seam, registry content unchanged; m1/m2
 * stay in AnnQueries where they interleave with the ANN rows): real
 * BMP/WAV/PNG/GIF/JPEG/ID3/AVI container decodes, audio resample, image
 * downsample, perceptual dHash / audio-fingerprint near-dup pairs and
 * clusters, frame-level video fingerprinting (m14), and the image-text
 * pair curation gate (m15).
 */
object MediaQueries {

  val all: Seq[(String, Q)] = Seq(
    // m15 — image-text PAIR curation gate (the LAION-style manifest step:
    // decode the image, gate on container/resolution/aspect, gate the
    // caption on token count, emit one verdict per pair with the FIRST
    // failing gate in a fixed order so reject accounting is unambiguous).
    // The image side runs the REAL m3 decode over the per-id containers
    // (odd ids pack WAV → 'not_image' lane is always live); the caption
    // side is the l2 token counter over a per-id caption PREFIX
    // (doc_id%8 tokens — the fixture rotation that keeps the
    // short-caption lane live; fixture texts are otherwise all long).
    // The oracle recomputes the decoded dims from doc_id via the fixture
    // closed form and replays the gate cascade
    "m15_pair_curation_gate" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = td(s, dir, "documents")
        val media = docs.select(col("doc_id")).as[Long]
          .map(id => Multimodal.packMediaById(id))
        val dec = Multimodal.decodeMedia(media).toDF()
          .select(col("media_id"), col("container"),
            col("width"), col("height"))
        val cap = docs.select(col("doc_id").as("pair_id"),
          least(coalesce(graft.llm.TextOps.tokenCount(col("text")), lit(0L)),
            pmod(col("doc_id"), lit(8L))).as("n_caption_tokens"))
        dec.join(cap, col("media_id") === col("pair_id"))
          .select(col("pair_id"), col("container"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_caption_tokens"),
            when(col("container") =!= "bmp", "not_image")
              .when(col("width") < 4 || col("height") < 3, "low_res")
              .when(col("width") > col("height") * 3
                || col("height") > col("width") * 3, "bad_aspect")
              .when(col("n_caption_tokens") < 3, "short_caption")
              .otherwise("ok").as("verdict"))
      },
      Some("""WITH d AS (SELECT doc_id AS pair_id,
             |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS container,
             |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16 ELSE 0 END AS BIGINT) AS width,
             |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 9 ELSE 0 END AS BIGINT) AS height,
             |    least(CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
             |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT),
             |      doc_id % 8) AS n_caption_tokens
             |  FROM documents)
             |SELECT pair_id, container, width, height, n_caption_tokens,
             |  CASE WHEN container <> 'bmp' THEN 'not_image'
             |       WHEN width < 4 OR height < 3 THEN 'low_res'
             |       WHEN width > height * 3 OR height > width * 3 THEN 'bad_aspect'
             |       WHEN n_caption_tokens < 3 THEN 'short_caption'
             |       ELSE 'ok' END AS verdict
             |FROM d""".stripMargin)),

    // REAL multimodal decode: per-id real BMP/WAV containers built with
    // every header field a function of the id, parsed back by the pure-JVM
    // header decoders. The oracle recomputes the expected decoded values
    // from doc_id alone — the decode itself is what's under test.
    "m3_media_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packMediaById(id))
        Multimodal.decodeMedia(media).toDF()
      },
      Some(MediaOracles.decodeSql)),

    // REAL audio DSP: 2:1 channel-0 box decimation of the PCM bytes in
    // the same per-id WAV fixtures; the oracle recomputes every sample
    // from doc_id via the LCG's closed form (A^n·id + C·geo(n) mod 2⁶⁴),
    // so a wrong data offset / stride / endianness / sign fold in the
    // decoder shifts every compared value
    "m4_audio_resample" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packMediaById(id))
        Multimodal.resampleAudio2x(media).toDF()
      },
      Some(MediaOracles.resampleSql)),

    // REAL image DSP: 2:1 nearest-neighbor downsample of the 24bpp BMP
    // fixtures — every output pixel's B/G/R recomputed by the oracle from
    // doc_id via the LCG closed form; a wrong data offset, row padding,
    // bottom-up fold, or channel order shifts every compared byte
    "m5_image_downsample" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packMediaById(id))
        Multimodal.downsampleImage2x(media).toDF()
      },
      Some(MediaOracles.downsampleSql)),

    // MULTIMODAL near-dup dedup: 64-bit perceptual dHash of real BMP
    // bytes (gradient bits over a 9×8 nearest-sampled grid) + the
    // simhash block-bucket Hamming join — each id plants an original +
    // perturbed re-encode pair; the oracle recomputes every hash bit
    // from the closed-form pixel pattern and replays banding + verify.
    // maxBucketSize=4000 ≥ the total image count at every oracle SF
    // (2500 at sf0.1), so the cap provably cannot bind where the oracle
    // runs — it exists for the sf1+ bench path (a degenerate slice
    // bucket is dropped whole, the capped-LSH semantics)
    "m6_image_dhash_pairs" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 0).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packImagePairById(id))
        val hashes = Multimodal.imageDHash(media).toDF()
        Dedup.fingerprintNearDups(hashes, "media_id", "dhash",
            maxHamming = 3, blocks = 4, maxBucketSize = 4000)
          .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"),
            (expr("id1 div 2") === expr("id2 div 2")).as("same_doc"))
      },
      Some(MediaOracles.dhashPairsSql())),

    // m13 — multimodal near-dup dedup taken END TO END: the m6 dHash
    // banded-Hamming pair graph collapsed into release-ready CLUSTERS via
    // the same pointer-jumping components as the text path (l13) — the
    // "which images are one asset" table a curation run publishes.
    // Oracle: the m6 candidate CTEs + Hamming verify + recursive reach
    "m13_media_dedup_clusters" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 0).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packImagePairById(id))
        val hashes = Multimodal.imageDHash(media).toDF()
        val pairs = Dedup.fingerprintNearDups(hashes, "media_id", "dhash",
            maxHamming = 3, blocks = 4, maxBucketSize = 4000)
          .select(col("id1"), col("id2"))
        Dedup.nearDupClusters(pairs)
          .select(col("id").as("media_id"), col("cluster_id"))
      },
      Some(MediaOracles.dhashClustersSql())),

    // the audio half of multimodal near-dup dedup: 64-bit energy-envelope
    // fingerprint (Haitsma-Kalker sign-of-gradient core) of real PCM WAV
    // bytes + the same banded Hamming tail as m6; ids %4==1 (disjoint
    // from m6's image slice), original + perturbed re-encode per id
    "m7_audio_fp_pairs" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 1).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packAudioPairById(id))
        val fps = Multimodal.audioFingerprint(media).toDF()
        Dedup.fingerprintNearDups(fps, "media_id", "afp",
            maxHamming = 3, blocks = 4, maxBucketSize = 4000)
          .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"),
            (expr("id1 div 2") === expr("id2 div 2")).as("same_doc"))
      },
      Some(MediaOracles.audioFpPairsSql())),

    // m8 — PNG header decode + CRC32 validation over REAL container bytes
    // (big-endian chunked layout, java.util.zip CRC): every field is a
    // closed-form function of the id, id%11 ships a non-PNG payload
    // (quarantine lane), id%5 a corrupted IHDR CRC — a misread offset,
    // endianness, or a skipped checksum flips the compared flags
    "m8_png_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packPngById(id))
        Multimodal.decodePngMedia(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  doc_id % 11 <> 0 AS is_png,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 8 + doc_id % 16 END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 4 + doc_id % 8 END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 8 END AS INTEGER) AS bit_depth,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 2 END AS INTEGER) AS color_type,
             |  (doc_id % 11 <> 0 AND doc_id % 5 <> 0) AS crc_ok
             |FROM documents""".stripMargin)),

    // m9 — GIF container decode over REAL bytes: the LITTLE-endian
    // sub-block complement to m8's big-endian chunks — LE logical-screen
    // dims, global color table size, and a FULL block walk counting
    // frames past graphic-control extensions, local color tables, and
    // multi-sub-block LZW data; id%11 non-GIF quarantine, id%7 dropped
    // trailer (frames still counted, verdict flags)
    "m9_gif_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packGifById(id))
        Multimodal.decodeGifMedia(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  doc_id % 11 <> 0 AS is_gif,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 4 + doc_id % 12 END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 3 + doc_id % 9 END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4
             |            ELSE 8 END END AS INTEGER) AS gct_entries,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 1 + doc_id % 3 END AS INTEGER) AS n_frames,
             |  (doc_id % 11 <> 0 AND doc_id % 7 <> 0) AS trailer_ok
             |FROM documents""".stripMargin)),

    // m10 — JPEG marker-walk decode over REAL bytes (ITU-T T.81/JFIF):
    // big-endian segment lengths like m8's PNG but with the part neither
    // m8 nor m9 has — the post-SOS ENTROPY-CODED scan, which carries no
    // length field and ends only at a 0xFF not followed by 0x00 stuffing
    // or a D0–D7 restart marker (the fixture plants both). SOF0 vs SOF2
    // distinguishes baseline from progressive; id%11 non-JPEG quarantine,
    // id%7 dropped EOI (dims still decode, verdict flags)
    "m10_jpeg_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packJpegById(id))
        Multimodal.decodeJpegMedia(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  doc_id % 11 <> 0 AS is_jpeg,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 5 + doc_id % 13 END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 3 + doc_id % 10 END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS n_components,
             |  (doc_id % 11 <> 0 AND doc_id % 3 = 0) AS progressive,
             |  (doc_id % 11 <> 0 AND doc_id % 7 <> 0) AS eoi_ok
             |FROM documents""".stripMargin)),

    // m11 — ID3v2.4 tag decode over REAL bytes: the SYNCSAFE-integer
    // container (7-bit size bytes — the classic ID3 parser bug is reading
    // them big-endian, off once sizes pass 127, which every fixture size
    // does by construction). Frame walk validates [A-Z0-9]{4} ids,
    // rotates TIT2/TPE1/TALB so has_title varies, and checks the
    // declared span's padding is all zeros; id%11 non-ID3 quarantine,
    // id%7 plants a corrupt byte mid-padding (frames still counted)
    "m11_id3_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packId3ById(id))
        Multimodal.decodeId3Media(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  doc_id % 11 <> 0 AS is_id3,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 4 END AS INTEGER) AS version,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 1 + doc_id % 3 END AS INTEGER) AS n_frames,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 19 * (1 + doc_id % 3) + 120 + doc_id % 17
             |       END AS INTEGER) AS tag_size,
             |  (doc_id % 11 <> 0 AND doc_id % 3 <> 1) AS has_title,
             |  (doc_id % 11 <> 0 AND doc_id % 7 <> 0) AS padding_ok
             |FROM documents""".stripMargin)),

    // m12 — AVI video container decode over REAL bytes: the NESTED-LIST
    // RIFF walk none of m8–m11 has — the walker must descend into
    // LIST(hdrl) for the avih main header and LIST(movi) for per-frame
    // ##dc/##wb stream chunks while skipping unknown chunks whole, and
    // honor RIFF's odd-size pad byte (an odd JUNK chunk sits before movi
    // so a padless walk desyncs before counting anything). id%11 non-AVI
    // quarantine; id%7 truncates mid-movi — the first frame still counts,
    // clean_end flags
    "m12_avi_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packAviById(id))
        Multimodal.decodeAviMedia(media).toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  doc_id % 11 <> 0 AS is_avi,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 33333 + (doc_id % 5) * 1000 END AS INTEGER) AS us_per_frame,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 2 + doc_id % 4 END AS INTEGER) AS total_frames,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 1 + doc_id % 2 END AS INTEGER) AS n_streams,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 16 * (1 + doc_id % 8) END AS INTEGER) AS width,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       ELSE 8 * (1 + doc_id % 6) END AS INTEGER) AS height,
             |  CAST(CASE WHEN doc_id % 11 = 0 THEN 0
             |       WHEN doc_id % 7 = 0 THEN 1
             |       ELSE 2 + doc_id % 4 END AS INTEGER) AS video_chunks,
             |  CAST(CASE WHEN doc_id % 11 = 0 OR doc_id % 7 = 0 THEN 0
             |       ELSE (doc_id % 2) * (2 + doc_id % 4) END AS INTEGER) AS audio_chunks,
             |  (doc_id % 11 <> 0 AND doc_id % 7 <> 0) AS clean_end
             |FROM documents""".stripMargin)),

    // m14 — frame-level VIDEO fingerprinting end to end (the m12→m6→m13
    // composition): walk each AVI's movi stream, dHash every keyframe
    // through the image perceptual core, banded-Hamming match per ALIGNED
    // frame, roll matches up to video pairs (≥ 2/3 of the longer video's
    // frames), collapse into release-ready clusters via the l13 pointer-
    // jumping components. Each id plants an original + re-encode video
    // pair; id%11 ships non-AVI payloads (quarantine: no frames, no
    // rows). The oracle recomputes every frame hash bit from the
    // closed-form pixel pattern and replays banding, alignment, roll-up,
    // and components
    "m14_video_dhash_clusters" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 2).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packVideoPairById(id))
        val frames = Multimodal.videoFrameDHash(media).toDF()
        val pairs = Multimodal.videoNearDupPairs(frames)
          .select(col("id1"), col("id2"))
        Dedup.nearDupClusters(pairs)
          .select(col("id").as("media_id"), col("cluster_id"))
      },
      Some(MediaOracles.videoClustersSql())),

    // m16 — SHIFT-TOLERANT video dedup (the trimmed-upload case m14's
    // aligned-frame match misses by construction): each id plants an
    // original + a TRIMMED re-encode starting 1-2 frames in, so every
    // genuine match sits at a constant NEGATIVE frame-index delta. Same
    // banded-Hamming candidate stage; the roll-up groups by (pair,
    // delta), picks the best alignment deterministically, and thresholds
    // against the SHORTER video. The oracle recomputes every frame hash
    // from the closed form (trimmed frame j carries pattern j + trim)
    // and replays the shift search end to end
    "m16_video_shift_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 3).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packVideoTrimPairById(id))
        val frames = Multimodal.videoFrameDHash(media).toDF()
        Multimodal.videoNearDupPairsShifted(frames)
      },
      Some(MediaOracles.videoShiftPairsSql())),

    // m17 — SHIFT-TOLERANT audio dedup (the audio half of the m16
    // asymmetry: m7's whole-clip fingerprint loses every trimmed upload,
    // because trimming moves every frame boundary inside the single
    // 64-bit hash): per-SEGMENT energy-envelope fingerprints (hop 16
    // frames) turn a clip into an ordered fingerprint sequence, and the
    // SAME shift roll-up the video path uses finds the constant
    // segment-index delta. Fixture trims cut whole hops so genuine
    // matches sit at -trim; the oracle recomputes every frame energy and
    // segment bit from the m7 closed form and replays the shift search
    "m17_audio_shift_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents")
          .filter(col("doc_id") % 4 === 1).select(col("doc_id")).as[Long]
          .flatMap(id => Multimodal.packAudioTrimPairById(id))
        val segs = Multimodal.audioSegmentFingerprints(media).toDF()
          .select(col("media_id"), col("seg_idx").as("frame_idx"),
            col("afp").as("fdhash"))
        Multimodal.videoNearDupPairsShifted(segs)
      },
      Some(MediaOracles.audioShiftPairsSql())),
  )
}
