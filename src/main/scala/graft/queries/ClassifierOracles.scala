package graft.queries

import graft.llm.QualityClassifier.Model

/**
 * DuckDB oracle SQL for the frozen quality-classifier scoring row
 * ([[graft.llm.QualityClassifier.score]]). The weight table is
 * interpolated from the SAME frozen model object the Spark query uses, so
 * the two sides cannot skew. Everything compared is exact: the feature
 * hash is the portable md5-prefix hash (`hash60 % nBuckets`), weights are
 * DECIMAL(9,6) literals, the per-doc sum is exact decimal addition
 * (order-independent), and the keep decision is the sign of
 * `score_sum + n_tokens·bias` — no division, no exp.
 */
object ClassifierOracles {

  def scoreSql(model: Model,
               minLogit: java.math.BigDecimal = java.math.BigDecimal.ZERO): String = {
    val biasAdj = model.bias.subtract(minLogit)
    val values = model.weights.toSeq.sortBy(_._1)
      .map { case (b, wt) => s"($b, CAST(${wt.toPlainString} AS DECIMAL(9,6)))" }
      .mkString(", ")
    s"""WITH w(bucket, wt) AS (SELECT * FROM (VALUES $values)),
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
       |  (s + n_tokens * CAST(${biasAdj.toPlainString} AS DECIMAL(9,6))) > 0 AS keep
       |FROM g""".stripMargin
  }
}
