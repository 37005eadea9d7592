package graft.queries

import graft.llm.QualityClassifier.Model

/**
 * DuckDB oracle SQL for the frozen quality-classifier scoring row
 * ([[graft.llm.QualityClassifier.score]]) and the composed curation
 * funnel ([[graft.llm.Curation.curationFunnel]]). The weight table is
 * interpolated from the SAME frozen model object the Spark queries use,
 * so the two sides cannot skew. Everything compared is exact: the
 * feature hash is the portable md5-prefix hash (`hash60 % nBuckets`),
 * weights are DECIMAL(9,6) literals, the per-doc sum is exact decimal
 * addition (order-independent), and the keep decision is the sign of
 * `score_sum + n_tokens·(bias − minLogit)` — no division, no exp.
 */
object ClassifierOracles {

  /** `(bucket, wt)` VALUES rows from the frozen model. */
  private def weightValues(model: Model): String =
    model.weights.toSeq.sortBy(_._1)
      .map { case (b, wt) => s"($b, CAST(${wt.toPlainString} AS DECIMAL(9,6)))" }
      .mkString(", ")

  private def biasAdj(model: Model, minLogit: java.math.BigDecimal): String =
    model.bias.subtract(minLogit).toPlainString

  def scoreSql(model: Model,
               minLogit: java.math.BigDecimal = java.math.BigDecimal.ZERO): String =
    s"""WITH w(bucket, wt) AS (SELECT * FROM (VALUES ${weightValues(model)})),
       |tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    CAST(('0x'||substr(md5(token),1,15))::BIGINT % ${model.nBuckets} AS INTEGER) AS bucket
       |  FROM tk WHERE length(token) > 0),
       |j AS (
       |  SELECT doc_id, COALESCE(wt, CAST(0 AS DECIMAL(9,6))) AS wt0
       |  FROM t LEFT JOIN w USING (bucket)),
       |g AS (
       |  SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens, sum(wt0) AS s
       |  FROM j GROUP BY 1)
       |SELECT id, n_tokens, CAST(s AS DOUBLE) AS score_sum,
       |  (s + n_tokens * CAST(${biasAdj(model, minLogit)} AS DECIMAL(9,6))) > 0 AS keep
       |FROM g""".stripMargin

  /** Exact twin of [[graft.llm.QualityClassifier.calibrationTable]] with
    * ref = l4's heuristic quality ≥ `refThreshold` — l69_calibration.
    * Scoring replays [[scoreSql]]'s CTEs; the bin key is the 6-dp mean
    * token weight (exact-DECIMAL quotient, identical on both engines)
    * with id tie-break, so ntile is deterministic. */
  def calibrationSql(model: Model, minLogit: java.math.BigDecimal,
                     refThreshold: String, nBins: Int): String =
    s"""WITH w(bucket, wt) AS (SELECT * FROM (VALUES ${weightValues(model)})),
       |tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    CAST(('0x'||substr(md5(token),1,15))::BIGINT % ${model.nBuckets} AS INTEGER) AS bucket
       |  FROM tk WHERE length(token) > 0),
       |j AS (
       |  SELECT doc_id, COALESCE(wt, CAST(0 AS DECIMAL(9,6))) AS wt0
       |  FROM t LEFT JOIN w USING (bucket)),
       |g AS (
       |  SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_tokens, sum(wt0) AS s
       |  FROM j GROUP BY 1),
       |sc AS (
       |  SELECT id, n_tokens, CAST(s AS DOUBLE) AS score_sum,
       |    (s + n_tokens * CAST(${biasAdj(model, minLogit)} AS DECIMAL(9,6))) > 0 AS keep
       |  FROM g),
       |q AS (SELECT doc_id,
       |  CAST(length(text) AS DOUBLE) AS n_chars,
       |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS n_words,
       |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS n_punct
       |  FROM documents),
       |ql AS (SELECT doc_id,
       |  round(least(n_chars/200.0, 1.0) * (1.0 - n_punct/greatest(n_chars, 1.0))
       |    * (0.5 + 0.5*least((n_chars/greatest(n_words, 1.0))/8.0, 1.0)), 6)
       |    >= $refThreshold AS ref_ok
       |  FROM q),
       |jj AS (
       |  SELECT sc.id, sc.keep, ql.ref_ok,
       |    round(sc.score_sum / sc.n_tokens, 6) AS mw
       |  FROM sc JOIN ql ON sc.id = ql.doc_id),
       |b AS (SELECT *, ntile($nBins) OVER (ORDER BY mw, id) AS bin FROM jj)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(CASE WHEN ref_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_ok,
       |  CAST(sum(CASE WHEN keep = ref_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       |  round(CAST(sum(CASE WHEN keep = ref_ok THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS agree_rate
       |FROM b GROUP BY 1""".stripMargin

  /** Exact CTE-chain twin of the l51 curation funnel: the l47 normalize
    * chain, the l46 gate (LEFT-join-preserved zero-token docs),
    * opening-fingerprint keep-first dedup among survivors (md5 of the
    * first `prefixTokens` normalized tokens), per-source funnel counts. */
  def curationFunnelSql(model: Model, minLogit: java.math.BigDecimal,
                        prefixTokens: Int = 8): String =
    s"""WITH w(bucket, wt) AS (SELECT * FROM (VALUES ${weightValues(model)})),
       |nrm AS (
       |  SELECT doc_id, source,
       |    regexp_replace(
       |      regexp_replace(nfc_normalize(text),
       |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |      '[ \\t]+', ' ', 'g') AS norm
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(norm), '\\s+')) AS token
       |  FROM nrm),
       |tb AS (
       |  SELECT doc_id,
       |    CAST(('0x'||substr(md5(token),1,15))::BIGINT % ${model.nBuckets} AS INTEGER) AS bucket
       |  FROM tk WHERE length(token) > 0),
       |g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(COALESCE(wt, CAST(0 AS DECIMAL(9,6)))) AS s
       |  FROM tb LEFT JOIN w USING (bucket) GROUP BY 1),
       |q AS (
       |  SELECT n.doc_id, n.source, n.norm,
       |    COALESCE(g.n_tokens, 0) AS n_tokens,
       |    COALESCE((g.s + g.n_tokens * CAST(${biasAdj(model, minLogit)} AS DECIMAL(9,6))) > 0,
       |      false) AS keep
       |  FROM nrm n LEFT JOIN g USING (doc_id)),
       |r AS (
       |  SELECT doc_id, source, n_tokens, keep,
       |    keep AND row_number() OVER (
       |      PARTITION BY md5(array_to_string(
       |        (regexp_split_to_array(trim(lower(norm)), '\\s+'))[1:$prefixTokens], ' ')), keep
       |      ORDER BY doc_id) = 1 AS final
       |  FROM q)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_in,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN final THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       |  CAST(sum(CASE WHEN final THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_final
       |FROM r GROUP BY 1""".stripMargin

  /**
   * Exact twin of [[graft.llm.Curation.admitIncrement]] over the
   * `doc_id % mod = 0` new batch vs the rest as standing corpus: the l47
   * normalize chain on BOTH sides, the l46 gate over the new slice
   * (zero-token docs LEFT-join-preserved with keep = false), then the
   * l56 incremental-dedup verdicts for quality survivors — md5 exact
   * fingerprints and [[LshOracles.bandedCtes]] portable buckets over the
   * NORMALIZED text, exact-beats-near, and the admission mapping
   * (rejected_quality | exact_dup | near_dup | admitted).
   */
  def admitIncrementSql(model: Model, minLogit: java.math.BigDecimal,
                        mod: Int, n: Int = 3, k: Int = 32,
                        bands: Int = 8): String =
    s"""WITH w(bucket, wt) AS (SELECT * FROM (VALUES ${weightValues(model)})),
       |nrm AS (
       |  SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(nfc_normalize(text),
       |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |      '[ \\t]+', ' ', 'g') AS text
       |  FROM documents),
       |tk AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
       |  FROM nrm WHERE doc_id % $mod = 0),
       |tb AS (
       |  SELECT doc_id,
       |    CAST(('0x'||substr(md5(token),1,15))::BIGINT % ${model.nBuckets} AS INTEGER) AS bucket
       |  FROM tk WHERE length(token) > 0),
       |g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(COALESCE(wt, CAST(0 AS DECIMAL(9,6)))) AS s
       |  FROM tb LEFT JOIN w USING (bucket) GROUP BY 1),
       |q AS (
       |  SELECT b.doc_id, COALESCE(g.n_tokens, 0) AS n_tokens,
       |    COALESCE((g.s + g.n_tokens * CAST(${biasAdj(model, minLogit)} AS DECIMAL(9,6))) > 0,
       |      false) AS keep
       |  FROM (SELECT doc_id FROM nrm WHERE doc_id % $mod = 0) b
       |  LEFT JOIN g USING (doc_id)),
       |${LshOracles.bandedCtes(n, k, bands, src = "nrm")},
       |nb AS (SELECT q.doc_id, md5(nrm.text) AS fp
       |  FROM q JOIN nrm USING (doc_id) WHERE q.keep),
       |ex AS (SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper
       |  FROM nrm WHERE doc_id % $mod <> 0 GROUP BY 1),
       |bc AS (SELECT band_id, band_hash, CAST(min(doc_id) AS BIGINT) AS keeper
       |  FROM banded WHERE doc_id % $mod <> 0 GROUP BY 1, 2),
       |bn AS (SELECT banded.doc_id, band_id, band_hash
       |  FROM banded JOIN q USING (doc_id) WHERE q.keep),
       |near AS (SELECT bn.doc_id, min(bc.keeper) AS keeper
       |  FROM bn JOIN bc ON bn.band_id = bc.band_id AND bn.band_hash = bc.band_hash
       |  GROUP BY 1),
       |e AS (SELECT nb.doc_id, ex.keeper FROM nb JOIN ex USING (fp))
       |SELECT q.doc_id, q.n_tokens,
       |  CASE WHEN NOT q.keep THEN 'rejected_quality'
       |       WHEN e.keeper IS NOT NULL THEN 'exact_dup'
       |       WHEN near.keeper IS NOT NULL THEN 'near_dup'
       |       ELSE 'admitted' END AS verdict,
       |  COALESCE(e.keeper, near.keeper) AS dup_of
       |FROM q LEFT JOIN e USING (doc_id) LEFT JOIN near USING (doc_id)""".stripMargin
}
