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
}
