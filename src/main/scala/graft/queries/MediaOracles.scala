package graft.queries

/**
 * DuckDB oracle SQL for the multimodal (m-family) queries. The decode stub
 * is a pure deterministic function of the payload bytes (see
 * graft/multimodal/Multimodal.scala), so even the "binary media" path gets
 * an exact external twin: Java's wrap-around long arithmetic is replayed as
 * HUGEINT arithmetic mod 2⁶⁴ with a final two's-complement sign fold.
 */
object MediaOracles {

  private val TwoPow64 = BigInt(1) << 64
  private val TwoPow63 = BigInt(1) << 63
  private val Seed = BigInt(1125899906842597L)

  /**
   * Exact twin of `Multimodal.sampleFrames(stride = 64)` over
   * `packText(documents, "doc_id", "text")`: frames are consecutive full
   * 64-byte slices of the UTF-8 payload; each frame's hash is the rolling
   * fold h = 31·h + byte (seed 1125899906842597, Java wrap-around).
   *
   * The fold is UNROLLED: h = seed·31⁶⁴ + Σ byteⱼ·31^(63−j) (mod 2⁶⁴),
   * with the powers precomputed here — no recursive CTE, one projection.
   */
  def sampleFramesSql(stride: Int = 64): String = {
    // 31^k mod 2^64 for k = 0..stride, and the seed's contribution
    val pows = Iterator.iterate(BigInt(1))(p => (p * 31) % TwoPow64)
      .take(stride + 1).toIndexedSeq
    val seedTerm = (Seed * pows(stride)) % TwoPow64
    // byte j of frame f = 2 hex chars at offset (f*stride + j)*2 + 1 of the
    // ONCE-hexed payload (3-arg substring over BLOB is not supported)
    val terms = (0 until stride).map { j =>
      val c = pows(stride - 1 - j)
      s"('0x'||substring(hx, (frame_idx*$stride + $j)*2 + 1, 2))::BIGINT::HUGEINT * CAST('$c' AS HUGEINT)"
    }.mkString("\n      + ")
    s"""WITH media AS (
       |  SELECT CAST(doc_id AS BIGINT) AS media_id, encode(text) AS p FROM documents),
       |frames AS (
       |  SELECT media_id, hex(p) AS hx,
       |    unnest(range(octet_length(p) // $stride)) AS frame_idx
       |  FROM media),
       |h AS (
       |  SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |    (CAST('$seedTerm' AS HUGEINT)
       |      + $terms) % CAST('$TwoPow64' AS HUGEINT) AS acc
       |  FROM frames)
       |SELECT media_id, frame_idx,
       |  CAST(CASE WHEN acc >= CAST('$TwoPow63' AS HUGEINT)
       |    THEN acc - CAST('$TwoPow64' AS HUGEINT) ELSE acc END AS BIGINT) AS frame_hash
       |FROM h""".stripMargin
  }

  /**
   * Oracle for the REAL container decode (m3): `packMediaById` builds every
   * BMP/WAV header field as a pure function of the id, so the expected
   * DECODED values are computable from `doc_id` alone — a misparsed offset,
   * a wrong endianness, or a bad chunk walk in the Scala decoder breaks the
   * comparison. WAV duration: dataSize·1000/byteRate floors to
   * (nSamples·1000)//sampleRate exactly (blockAlign cancels).
   */
  def decodeSql: String =
    s"""SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS container,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16 ELSE 0 END AS INTEGER) AS width,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 9 ELSE 0 END AS INTEGER) AS height,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + (doc_id // 2) % 2 END AS INTEGER) AS channels,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 * (1 + doc_id % 3) END AS INTEGER) AS sample_rate,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 8 * (1 + (doc_id // 4) % 2) END AS INTEGER) AS bits,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0
       |       ELSE ((1 + doc_id % 97) * 1000) // (8000 * (1 + doc_id % 3)) END AS BIGINT) AS duration_ms
       |FROM documents""".stripMargin

  /**
   * Sample-exact oracle for the REAL 2:1 audio decimation (m4). The WAV
   * data bytes come from the LCG x←x·A+C seeded with the id, and an LCG
   * has a CLOSED FORM: byte j = top-8-bits of A^(j+2)·id + C·Σ_{i<j+2}A^i
   * (mod 2⁶⁴) — so the oracle recomputes every PCM sample from doc_id
   * alone via two precomputed HUGEINT coefficient lists, then replays the
   * channel-0 extraction (stride = blockAlign), 8-bit recentering /
   * 16-bit LE sign fold, and the box-filter mean. A wrong data offset,
   * stride, endianness, or sign handling in the Scala decoder shifts
   * every compared value.
   */
  def resampleSql: String = {
    val A = BigInt(6364136223846793005L)
    val C = BigInt(1442695040888963407L)
    // byte j needs A^(j+2) and C·geo(j+2); max j = 96·4 + 1 = 385
    val maxN = 388
    val pows = Iterator.iterate(BigInt(1))(p => (p * A) % TwoPow64)
      .take(maxN + 2).toIndexedSeq // pows(n) = A^n
    val geo = pows.scanLeft(BigInt(0))((s, p) => (s + p) % TwoPow64) // geo(n) = Σ_{i<n} A^i
    val pList = (0 until maxN).map(j => pows(j + 2)).mkString(", ")
    val qList = (0 until maxN).map(j => (C * geo(j + 2)) % TwoPow64).mkString(", ")
    def byteE(j: String): String =
      s"CAST(((p[$j + 1] * media_id + q[$j + 1]) % 18446744073709551616) // 72057594037927936 AS BIGINT)"
    s"""WITH pq AS (SELECT [$pList]::HUGEINT[] AS p, [$qList]::HUGEINT[] AS q),
       |w AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |    CAST(1 + doc_id % 97 AS BIGINT) AS ns,
       |    CAST((1 + (doc_id // 2) % 2) * (8 * (1 + (doc_id // 4) % 2)) // 8 AS BIGINT) AS ba,
       |    CAST(8 * (1 + (doc_id // 4) % 2) AS BIGINT) AS bits
       |  FROM documents WHERE doc_id % 2 = 1),
       |s AS (SELECT media_id, ns, bits, ba, unnest(range(ns)) AS si FROM w),
       |raw AS (SELECT media_id, ns, bits, si,
       |    ${byteE("si*ba")} AS lo, ${byteE("si*ba + 1")} AS hi
       |  FROM s CROSS JOIN pq),
       |v AS (SELECT media_id, ns, si,
       |    CASE WHEN bits = 8 THEN lo - 128
       |         WHEN lo + 256*hi >= 32768 THEN lo + 256*hi - 65536
       |         ELSE lo + 256*hi END AS val
       |  FROM raw)
       |SELECT a.media_id, a.ns AS in_samples, CAST(a.ns // 2 AS BIGINT) AS out_samples,
       |  CAST(a.si // 2 AS BIGINT) AS out_idx, (a.val + b.val) / 2.0 AS value
       |FROM v a JOIN v b ON a.media_id = b.media_id AND b.si = a.si + 1
       |WHERE a.si % 2 = 0""".stripMargin
  }

  /**
   * Pixel-exact oracle for the 2:1 BMP downsample (m5): the same LCG
   * closed form as [[resampleSql]], applied at the IMAGE byte layout —
   * data byte j of the fixture for output pixel (x, y) sits at
   * j = (h−1−2y)·rowSize + 2x·3 (+0/1/2 for B/G/R): bottom-up rows
   * folded to top-down coordinates, rows padded to 4 bytes, ceil output
   * dims. A wrong stride, padding, row order, or channel order in the
   * Scala decoder shifts every compared byte.
   */
  /**
   * Bit-exact oracle for the perceptual-dHash near-dup pairs (m6): the
   * fixture's gray values are a closed-form polynomial of (id, variant,
   * x, y) — `Multimodal.patternGray` — so the oracle recomputes all 72
   * sampled grays per image, rebuilds every one of the 64 gradient bits,
   * sign-folds the HUGEINT hash to a Java long, and replays the banded
   * candidate join (16-bit slices, zipped unnest) plus the Hamming ≤
   * maxHamming verify. A wrong data offset, row-padding stride,
   * bottom-up fold, grid-sample position, or bit order in the Scala path
   * flips compared pairs in or out.
   */
  def dhashPairsSql(maxHamming: Int = 3): String =
    s"""WITH ${dhashCandCtes(maxHamming)}
       |SELECT id1, id2,
       |  CAST(bit_count(xor(dh1, dh2)) AS BIGINT) AS hamming,
       |  (id1 // 2 = id2 // 2) AS same_doc
       |FROM cand WHERE bit_count(xor(dh1, dh2)) <= $maxHamming""".stripMargin

  /** The m6 candidate pipeline as a reusable CTE block ending in
    * `cand(id1, id2, dh1, dh2)` — consumed by [[dhashPairsSql]] and
    * [[dhashClustersSql]] so the two can never desynchronize. */
  /** The 64 dHash gradient-bit CASE terms over the closed-form pattern,
    * reading coefficient columns (ax, bx, ay, axy, c0, v) with the sparse
    * re-encode noise keyed by `noiseKey` (the full id for images; the
    * frame-mixed key for video frames). Shared by the m6/m13 image CTEs
    * and the m14 video CTEs so the replicas can never desynchronize. */
  private def dhashBitTerms(noiseKey: String): String = {
    val dim = graft.multimodal.Multimodal.PatternDim
    val gridW = 8
    val gridH = 8
    val sxs = (0 to gridW).map(gx => gx * dim / (gridW + 1))
    def grayE(xv: Int, yv: Int): String =
      s"((ax*$xv + bx*${xv * xv} + ay*$yv + axy*${xv * yv} + c0) % 251" +
        s" + CASE WHEN v = 1 AND (${xv + 3 * yv} + $noiseKey) % 11 = 0 THEN 2 ELSE 0 END)"
    (for {
      gy <- 0 until gridH
      gx <- 0 until gridW
    } yield {
      val sy = gy * dim / gridH
      val p = BigInt(1) << (gy * gridW + gx)
      s"CASE WHEN ${grayE(sxs(gx + 1), sy)} > ${grayE(sxs(gx), sy)}" +
        s" THEN CAST('$p' AS HUGEINT) ELSE CAST('0' AS HUGEINT) END"
    }).mkString("\n      + ")
  }

  private def dhashCandCtes(maxHamming: Int): String = {
    val bitTerms = dhashBitTerms("id")
    s"""ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents WHERE doc_id % 4 = 0),
       |mx AS (SELECT id,
       |    (id % 1048573) * 2654435761 % 1048573 AS m1,
       |    (id % 1048289) * 97002529 % 1048289 AS m2
       |  FROM ids),
       |par AS (
       |  SELECT id, unnest([0, 1]) AS v, 1 + m1 % 251 AS ax, 1 + (m1 // 251) % 251 AS bx,
       |    2 + m2 % 251 AS ay, (m2 // 251) % 251 AS axy, (m1 + m2) % 251 AS c0
       |  FROM mx),
       |h AS (
       |  SELECT id * 2 + v AS media_id,
       |    ($bitTerms) AS uh
       |  FROM par),
       |hb AS (
       |  SELECT media_id, uh,
       |    CAST(CASE WHEN uh >= CAST('$TwoPow63' AS HUGEINT)
       |      THEN uh - CAST('$TwoPow64' AS HUGEINT) ELSE uh END AS BIGINT) AS dh
       |  FROM h),
       |sl AS (
       |  SELECT media_id, dh,
       |    unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS blk,
       |    unnest([CAST(uh % 65536 AS BIGINT),
       |            CAST((uh // 65536) % 65536 AS BIGINT),
       |            CAST((uh // 4294967296) % 65536 AS BIGINT),
       |            CAST((uh // 281474976710656) % 65536 AS BIGINT)]) AS slice
       |  FROM hb),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS id1, b.media_id AS id2, a.dh AS dh1, b.dh AS dh2
       |  FROM sl a JOIN sl b ON a.blk = b.blk AND a.slice = b.slice
       |    AND a.media_id < b.media_id)""".stripMargin
  }

  /**
   * Connected components over the m6 VERIFIED near-dup pair graph — the
   * exact twin of `nearDupClusters(fingerprintNearDups(imageDHash(...)))`
   * (m13): min-reachable-id labels via the recursive reach CTE (the
   * exactJaccardClustersSql pattern) over Hamming-verified pairs.
   */
  def dhashClustersSql(maxHamming: Int = 3): String =
    s"""WITH RECURSIVE ${dhashCandCtes(maxHamming)},
       |vp AS (SELECT id1, id2 FROM cand
       |  WHERE bit_count(xor(dh1, dh2)) <= $maxHamming),
       |edges AS (SELECT id1 AS a, id2 AS b FROM vp UNION SELECT id2, id1 FROM vp),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS media_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /**
   * Bit-exact oracle for frame-level video near-dup CLUSTERS (m14): the
   * fixture's keyframe grays are the closed form `patternGray(id·31 + f,
   * v, x, y)`, so the oracle recomputes every frame's 64 dHash bits,
   * replays the banded candidate join PER ALIGNED FRAME (same index —
   * the Spark side's fid-packing + index filter reduces to exactly
   * this), verifies Hamming ≤ maxHamming, rolls frame matches up to
   * video pairs at the matchNum/matchDen threshold of the LONGER video,
   * and runs the recursive-reach components. A wrong movi walk, frame
   * order, per-frame hash bit, banding slice, alignment, or roll-up
   * threshold flips compared rows.
   */
  def videoClustersSql(maxHamming: Int = 3, matchNum: Int = 2,
                       matchDen: Int = 3): String = {
    val bitTerms = dhashBitTerms("kid")
    s"""WITH RECURSIVE ids AS (
       |  SELECT CAST(doc_id AS BIGINT) AS id FROM documents
       |  WHERE doc_id % 4 = 2 AND doc_id % 11 <> 0),
       |fr AS (SELECT id, unnest(range(3 + id % 3)) AS f FROM ids),
       |mx AS (
       |  SELECT id, f, id*31 + f AS kid,
       |    ((id*31 + f) % 1048573) * 2654435761 % 1048573 AS m1,
       |    ((id*31 + f) % 1048289) * 97002529 % 1048289 AS m2
       |  FROM fr),
       |par AS (
       |  SELECT id, f, kid, unnest([0, 1]) AS v,
       |    1 + m1 % 251 AS ax, 1 + (m1 // 251) % 251 AS bx,
       |    2 + m2 % 251 AS ay, (m2 // 251) % 251 AS axy, (m1 + m2) % 251 AS c0
       |  FROM mx),
       |h AS (
       |  SELECT id * 2 + v AS media_id, f,
       |    ($bitTerms) AS uh
       |  FROM par),
       |hb AS (
       |  SELECT media_id, f,
       |    CAST(CASE WHEN uh >= CAST('$TwoPow63' AS HUGEINT)
       |      THEN uh - CAST('$TwoPow64' AS HUGEINT) ELSE uh END AS BIGINT) AS dh,
       |    uh
       |  FROM h),
       |sl AS (
       |  SELECT media_id, f, dh,
       |    unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS blk,
       |    unnest([CAST(uh % 65536 AS BIGINT),
       |            CAST((uh // 65536) % 65536 AS BIGINT),
       |            CAST((uh // 4294967296) % 65536 AS BIGINT),
       |            CAST((uh // 281474976710656) % 65536 AS BIGINT)]) AS slice
       |  FROM hb),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS v1, b.media_id AS v2, a.f AS f,
       |    a.dh AS d1, b.dh AS d2
       |  FROM sl a JOIN sl b ON a.blk = b.blk AND a.slice = b.slice
       |    AND a.f = b.f AND a.media_id < b.media_id),
       |mp AS (
       |  SELECT v1, v2, CAST(count(*) AS BIGINT) AS matched FROM cand
       |  WHERE bit_count(xor(d1, d2)) <= $maxHamming GROUP BY 1, 2),
       |nf AS (
       |  SELECT id * 2 + v AS media_id, CAST(count(*) AS BIGINT) AS n
       |  FROM par GROUP BY 1),
       |vp AS (
       |  SELECT mp.v1 AS id1, mp.v2 AS id2
       |  FROM mp JOIN nf a ON a.media_id = mp.v1 JOIN nf b ON b.media_id = mp.v2
       |  WHERE mp.matched * $matchDen >= greatest(a.n, b.n) * $matchNum),
       |edges AS (SELECT id1 AS a, id2 AS b FROM vp UNION SELECT id2, id1 FROM vp),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS media_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin
  }

  /**
   * Bit-exact oracle for the SHIFT-TOLERANT video near-dup pairs (m16):
   * the fixture plants a TRIMMED re-encode (original frames from offset
   * `1 + id % 2`, v=1 noise), so the oracle recomputes each variant's
   * per-frame dHash bits from the closed form (the trimmed side's
   * container frame j carries original frame j + trim's pattern), replays
   * the banded candidate join WITHOUT the m14 index-equality (the shift
   * search), caps |delta| at maxShift, rolls up per (pair, delta), picks
   * the best alignment (most matches; ties to smallest |shift| then
   * smallest shift), and thresholds against the SHORTER video. A wrong
   * frame re-index after the trim, a broken delta computation, or m14's
   * longer-video bar flips compared rows.
   */
  def videoShiftPairsSql(maxShift: Int = 2, maxHamming: Int = 3,
                         matchNum: Int = 2, matchDen: Int = 3,
                         maxBucketSize: Int = 4000): String = {
    val bitTerms = dhashBitTerms("kid")
    s"""WITH ids AS (
       |  SELECT CAST(doc_id AS BIGINT) AS id FROM documents
       |  WHERE doc_id % 4 = 3 AND doc_id % 11 <> 0),
       |fr AS (SELECT id, 1 + id % 2 AS trim, unnest(range(4 + id % 3)) AS f FROM ids),
       |vv AS (SELECT id, trim, f, unnest([0, 1]) AS v FROM fr),
       |fv AS (
       |  SELECT id, v, id*31 + f AS kid,
       |    CASE WHEN v = 0 THEN f ELSE f - trim END AS fi
       |  FROM vv WHERE v = 0 OR f >= trim),
       |mx AS (
       |  SELECT id, v, fi, kid,
       |    (kid % 1048573) * 2654435761 % 1048573 AS m1,
       |    (kid % 1048289) * 97002529 % 1048289 AS m2
       |  FROM fv),
       |par AS (
       |  SELECT id, v, fi, kid,
       |    1 + m1 % 251 AS ax, 1 + (m1 // 251) % 251 AS bx,
       |    2 + m2 % 251 AS ay, (m2 // 251) % 251 AS axy, (m1 + m2) % 251 AS c0
       |  FROM mx),
       |h AS (
       |  SELECT id * 2 + v AS media_id, fi,
       |    ($bitTerms) AS uh
       |  FROM par),
       |hb AS (
       |  SELECT media_id, fi,
       |    CAST(CASE WHEN uh >= CAST('$TwoPow63' AS HUGEINT)
       |      THEN uh - CAST('$TwoPow64' AS HUGEINT) ELSE uh END AS BIGINT) AS dh,
       |    uh
       |  FROM h),
       |sl AS (
       |  SELECT media_id, fi, dh,
       |    unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS blk,
       |    unnest([CAST(uh % 65536 AS BIGINT),
       |            CAST((uh // 65536) % 65536 AS BIGINT),
       |            CAST((uh // 4294967296) % 65536 AS BIGINT),
       |            CAST((uh // 281474976710656) % 65536 AS BIGINT)]) AS slice
       |  FROM hb),
       |slc AS (
       |  SELECT *, count(*) OVER (PARTITION BY blk, slice) AS bsz FROM sl),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS v1, b.media_id AS v2,
       |    a.fi AS f1, b.fi AS f2, a.dh AS d1, b.dh AS d2
       |  FROM slc a JOIN slc b ON a.blk = b.blk AND a.slice = b.slice
       |    AND a.media_id < b.media_id
       |  WHERE a.bsz <= $maxBucketSize),
       |mp AS (
       |  SELECT v1, v2, f2 - f1 AS shift, CAST(count(*) AS BIGINT) AS matched
       |  FROM cand
       |  WHERE bit_count(xor(d1, d2)) <= $maxHamming
       |    AND abs(f2 - f1) <= $maxShift
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT v1, v2, shift, matched,
       |    row_number() OVER (PARTITION BY v1, v2
       |      ORDER BY matched DESC, abs(shift), shift) AS rn
       |  FROM mp),
       |nf AS (
       |  SELECT id * 2 + v AS media_id, CAST(count(*) AS BIGINT) AS n
       |  FROM fv GROUP BY 1)
       |SELECT b.v1 AS id1, b.v2 AS id2, CAST(b.shift AS BIGINT) AS best_shift,
       |  b.matched, a.n AS n1, c.n AS n2
       |FROM best b JOIN nf a ON a.media_id = b.v1 JOIN nf c ON c.media_id = b.v2
       |WHERE b.rn = 1 AND b.matched * $matchDen >= least(a.n, c.n) * $matchNum""".stripMargin
  }

  /**
   * Bit-exact oracle for the SHIFT-TOLERANT audio near-dup pairs (m17):
   * the fixture's samples are the m7 closed form with the trimmed
   * variant's sample j carrying original sample j + 64·trim, so the
   * oracle recomputes every original frame energy from (id, v, frame)
   * alone, rebuilds each SEGMENT fingerprint (segment s of variant v
   * reads original frames starting at 16·(s + v·trim)), and replays the
   * m16 shift search — banding, |delta| ≤ maxShift, best alignment,
   * shorter-clip threshold. A wrong data offset after the trim, a
   * mis-based segment window, or a broken hop re-index flips rows.
   */
  def audioShiftPairsSql(maxShift: Int = 2, maxHamming: Int = 3,
                         matchNum: Int = 2, matchDen: Int = 3,
                         maxBucketSize: Int = 4000): String = {
    val pows = (0 until 64).map(f => s"CAST('${BigInt(1) << f}' AS HUGEINT)").mkString(", ")
    s"""WITH ids AS (
       |  SELECT CAST(doc_id AS BIGINT) AS id FROM documents
       |  WHERE doc_id % 4 = 1 AND doc_id % 11 <> 0),
       |par AS (SELECT id, unnest([0, 1]) AS v,
       |    3 + id % 3 AS nsg, 1 + id % 2 AS trim,
       |    (id % 1048573) * 2654435761 % 1048573 AS m1,
       |    (id % 1048289) * 97002529 % 1048289 AS m2
       |  FROM ids),
       |co AS (SELECT id, v, nsg, trim,
       |    3 + m1 % 997 AS a, 1 + (m1 // 997) % 997 AS b, m2 % 997 AS c
       |  FROM par),
       |fr AS (SELECT id, v, a, b, c,
       |    unnest(range(65 + 16 * (nsg - 1))) AS f FROM co),
       |smp AS (SELECT id, v, f, a, b, c, unnest(range(4)) AS k FROM fr),
       |sv AS (SELECT id, v, f,
       |    (a*f + b*f*f + c*(4*f + k)) % 1999 - 999
       |      + CASE WHEN v = 1 AND (4*f + k + id) % 17 = 0 THEN 1 ELSE 0 END AS s
       |  FROM smp),
       |en AS (SELECT id, v, f, CAST(sum(s * s) AS BIGINT) AS e FROM sv GROUP BY 1, 2, 3),
       |seg AS (SELECT id, v, trim,
       |    unnest(range(nsg - CASE WHEN v = 1 THEN trim ELSE 0 END)) AS sx
       |  FROM co),
       |pw AS (SELECT unnest(range(64)) AS fb, unnest([$pows]) AS p),
       |h AS (
       |  SELECT s.id * 2 + s.v AS media_id, s.sx AS fi,
       |    sum(CASE WHEN e2.e > e1.e THEN pw.p ELSE CAST('0' AS HUGEINT) END) AS uh
       |  FROM seg s CROSS JOIN pw
       |    JOIN en e1 ON e1.id = s.id AND e1.v = s.v
       |      AND e1.f = 16 * (s.sx + CASE WHEN s.v = 1 THEN s.trim ELSE 0 END) + pw.fb
       |    JOIN en e2 ON e2.id = s.id AND e2.v = s.v AND e2.f = e1.f + 1
       |  GROUP BY 1, 2),
       |hb AS (
       |  SELECT media_id, fi,
       |    CAST(CASE WHEN uh >= CAST('$TwoPow63' AS HUGEINT)
       |      THEN uh - CAST('$TwoPow64' AS HUGEINT) ELSE uh END AS BIGINT) AS dh,
       |    uh
       |  FROM h),
       |sl AS (
       |  SELECT media_id, fi, dh,
       |    unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS blk,
       |    unnest([CAST(uh % 65536 AS BIGINT),
       |            CAST((uh // 65536) % 65536 AS BIGINT),
       |            CAST((uh // 4294967296) % 65536 AS BIGINT),
       |            CAST((uh // 281474976710656) % 65536 AS BIGINT)]) AS slice
       |  FROM hb),
       |slc AS (
       |  SELECT *, count(*) OVER (PARTITION BY blk, slice) AS bsz FROM sl),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS v1, b.media_id AS v2,
       |    a.fi AS f1, b.fi AS f2, a.dh AS d1, b.dh AS d2
       |  FROM slc a JOIN slc b ON a.blk = b.blk AND a.slice = b.slice
       |    AND a.media_id < b.media_id
       |  WHERE a.bsz <= $maxBucketSize),
       |mp AS (
       |  SELECT v1, v2, f2 - f1 AS shift, CAST(count(*) AS BIGINT) AS matched
       |  FROM cand
       |  WHERE bit_count(xor(d1, d2)) <= $maxHamming
       |    AND abs(f2 - f1) <= $maxShift
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT v1, v2, shift, matched,
       |    row_number() OVER (PARTITION BY v1, v2
       |      ORDER BY matched DESC, abs(shift), shift) AS rn
       |  FROM mp),
       |nf AS (SELECT id * 2 + v AS media_id, CAST(count(*) AS BIGINT) AS n
       |  FROM seg GROUP BY 1)
       |SELECT b.v1 AS id1, b.v2 AS id2, CAST(b.shift AS BIGINT) AS best_shift,
       |  b.matched, a.n AS n1, c.n AS n2
       |FROM best b JOIN nf a ON a.media_id = b.v1 JOIN nf c ON c.media_id = b.v2
       |WHERE b.rn = 1 AND b.matched * $matchDen >= least(a.n, c.n) * $matchNum""".stripMargin
  }

  /**
   * Bit-exact oracle for the audio-fingerprint near-dup pairs (m7): the
   * fixture's PCM samples are the closed-form
   * `Multimodal.patternSample(id, v, i)`, so the oracle recomputes all
   * 260 samples per payload, the 65 exact frame energies, every one of
   * the 64 envelope-gradient bits, the sign-folded hash, and the banded
   * candidate join + Hamming verify (the m6 tail). A wrong data offset,
   * stride, sign fold, or frame boundary in the Scala decoder flips
   * compared pairs in or out.
   */
  def audioFpPairsSql(maxHamming: Int = 3): String = {
    val pows = (0 until 64).map(f => s"CAST('${BigInt(1) << f}' AS HUGEINT)").mkString(", ")
    s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents WHERE doc_id % 4 = 1),
       |par AS (SELECT id, unnest([0, 1]) AS v FROM ids),
       |mx AS (SELECT id, v,
       |    (id % 1048573) * 2654435761 % 1048573 AS m1,
       |    (id % 1048289) * 97002529 % 1048289 AS m2
       |  FROM par),
       |smp AS (SELECT id, v, m1, m2,
       |    unnest(range(${graft.multimodal.Multimodal.AudioSamples})) AS i FROM mx),
       |sv AS (SELECT id, v, i // 4 AS f,
       |    ((3 + m1 % 997) * (i // 4) + (1 + (m1 // 997) % 997) * (i // 4) * (i // 4)
       |      + (m2 % 997) * i) % 1999 - 999
       |      + CASE WHEN v = 1 AND (i + id) % 17 = 0 THEN 1 ELSE 0 END AS s
       |  FROM smp),
       |en AS (SELECT id, v, f, CAST(sum(s * s) AS BIGINT) AS e FROM sv GROUP BY 1, 2, 3),
       |pw AS (SELECT unnest(range(64)) AS f, unnest([$pows]) AS p),
       |h AS (SELECT a.id * 2 + a.v AS media_id,
       |    sum(CASE WHEN b.e > a.e THEN pw.p ELSE CAST('0' AS HUGEINT) END) AS uh
       |  FROM en a JOIN en b ON b.id = a.id AND b.v = a.v AND b.f = a.f + 1
       |    JOIN pw ON pw.f = a.f
       |  GROUP BY 1),
       |hb AS (
       |  SELECT media_id, uh,
       |    CAST(CASE WHEN uh >= CAST('$TwoPow63' AS HUGEINT)
       |      THEN uh - CAST('$TwoPow64' AS HUGEINT) ELSE uh END AS BIGINT) AS dh
       |  FROM h),
       |sl AS (
       |  SELECT media_id, dh,
       |    unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS blk,
       |    unnest([CAST(uh % 65536 AS BIGINT),
       |            CAST((uh // 65536) % 65536 AS BIGINT),
       |            CAST((uh // 4294967296) % 65536 AS BIGINT),
       |            CAST((uh // 281474976710656) % 65536 AS BIGINT)]) AS slice
       |  FROM hb),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS id1, b.media_id AS id2, a.dh AS dh1, b.dh AS dh2
       |  FROM sl a JOIN sl b ON a.blk = b.blk AND a.slice = b.slice
       |    AND a.media_id < b.media_id)
       |SELECT id1, id2,
       |  CAST(bit_count(xor(dh1, dh2)) AS BIGINT) AS hamming,
       |  (id1 // 2 = id2 // 2) AS same_doc
       |FROM cand WHERE bit_count(xor(dh1, dh2)) <= $maxHamming""".stripMargin
  }

  def downsampleSql: String = {
    val A = BigInt(6364136223846793005L)
    val C = BigInt(1442695040888963407L)
    // max byte index: (h−1)·rowSize + (w−1)·3 + 2 ≤ 8·48 + 45 + 2 = 431
    val maxN = 432
    val pows = Iterator.iterate(BigInt(1))(p => (p * A) % TwoPow64)
      .take(maxN + 2).toIndexedSeq
    val geo = pows.scanLeft(BigInt(0))((s, p) => (s + p) % TwoPow64)
    val pList = (0 until maxN).map(j => pows(j + 2)).mkString(", ")
    val qList = (0 until maxN).map(j => (C * geo(j + 2)) % TwoPow64).mkString(", ")
    def byteE(j: String): String =
      s"CAST(((p[$j + 1] * media_id + q[$j + 1]) % 18446744073709551616) // 72057594037927936 AS INTEGER)"
    s"""WITH pq AS (SELECT [$pList]::HUGEINT[] AS p, [$qList]::HUGEINT[] AS q),
       |b AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |    CAST(1 + doc_id % 16 AS BIGINT) AS w, CAST(1 + doc_id % 9 AS BIGINT) AS h
       |  FROM documents WHERE doc_id % 2 = 0),
       |d AS (SELECT media_id, w, h, ((3*w + 3) // 4) * 4 AS rs,
       |    (w + 1) // 2 AS ow, (h + 1) // 2 AS oh FROM b),
       |xs AS (SELECT media_id, w, h, rs, ow, oh, unnest(range(ow)) AS x FROM d),
       |ys AS (SELECT media_id, w, h, rs, ow, oh, x, unnest(range(oh)) AS y FROM xs),
       |o AS (SELECT media_id, ow, oh, x, y,
       |    (h - 1 - 2*y)*rs + 2*x*3 AS j FROM ys)
       |SELECT media_id, CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
       |  CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
       |  ${byteE("j")} AS b, ${byteE("j + 1")} AS g, ${byteE("j + 2")} AS r
       |FROM o CROSS JOIN pq""".stripMargin
  }
}
