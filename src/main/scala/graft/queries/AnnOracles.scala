package graft.queries

import graft.llm.Ann

/**
 * DuckDB oracle SQL generators for the EMBEDDING-space ANN family (split
 * from [[LshOracles]] on the shingle-vs-vector seam, round 11 — pure
 * mechanical move): hyperplane-LSH top-k, embedding near-dups, IVF and
 * IVF-PQ/ADC probes, LSH kNN join, semantic dedup, retrieval metrics,
 * kNN label propagation, hard negatives, and bitext margin mining.
 * Every hyperplane coefficient/centroid constant is interpolated from
 * the SAME Scala values the Spark expressions carry.
 *
 * All-pairs forms are only viable at oracle scale (sf0.01); the Spark
 * side is the scale path.
 */
object AnnOracles {
  /** DuckDB cosine similarity matching [[Ann.cosine]] (0 on zero norms). */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a,$a)) = 0 OR sqrt(list_dot_product($b,$b)) = 0
       | THEN 0.0 ELSE list_dot_product($a,$b)
       |   / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b))) END""".stripMargin

  /** Hyperplane sign-bucket over a DOUBLE[] expression — the literal-
    * coefficient twin of [[graft.llm.HyperplaneBucket]]; `planeOffset`
    * selects the plane slice (table t of a multi-table index interpolates
    * the coefficients for planes t·nPlanes …, same as the Scala side). */
  private def bucketSql(vec: String, nPlanes: Int, dim: Int,
                        planeOffset: Int = 0): String =
    (0 until nPlanes).map { p =>
      val coeffs = (0 until dim).map(d => Ann.planeCoeff(planeOffset + p, d)).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vec, $coeffs) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", "\n + ", ")")

  /** Multi-probe, multi-TABLE hyperplane-LSH top-k: the oracle for
    * l10_ann_lsh_topk. Table t's bucket arm interpolates its own plane
    * slice's coefficients and tags keys with `t << nPlanes`, exactly like
    * [[Ann.lshTopK]]; probes XOR only the low plane bits, preserving the
    * tag. */
  def lshTopKSql(nPlanes: Int, dim: Int, nQueries: Int, k: Int,
                 nTables: Int = 1): String = {
    val probes = ("qb" +: (0 until nPlanes).map(p => s"xor(qb, ${1L << p})")).mkString(", ")
    val tableArms = (0 until nTables).map { t =>
      s"SELECT vec_id, e, ${t.toLong << nPlanes} + ${bucketSql("e", nPlanes, dim, t * nPlanes)} AS bucket FROM v"
    }.mkString("\n UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS ($tableArms),
       |q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb FROM b WHERE vec_id < $nQueries),
       |pr AS (SELECT query_id, qe, unnest([$probes]) AS bucket FROM q),
       |sc AS (SELECT DISTINCT p.query_id, c.vec_id AS corpus_id,
       |    ${cosSql("p.qe", "c.e")} AS sim
       |  FROM pr p JOIN b c ON p.bucket = c.bucket AND c.vec_id <> p.query_id),
       |rk AS (SELECT query_id, corpus_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, corpus_id) AS r
       |  FROM sc)
       |SELECT query_id, corpus_id, round(sim, 6) AS cosine_sim FROM rk WHERE r <= $k""".stripMargin
  }

  /** Hyperplane-bucketed near-dup pairs: the oracle for
    * l11_embedding_neardups. Multi-table arms tag buckets `t << nPlanes`
    * with per-slice coefficients, exactly like [[Ann.embeddingNearDups]];
    * the DISTINCT in `p` dedups pairs found by several tables. */
  def embeddingNearDupsSql(nPlanes: Int, dim: Int, threshold: Double, cap: Int,
                           nTables: Int = 1): String = {
    val arms = (0 until nTables).map { t =>
      s"SELECT vec_id, e, ${t.toLong << nPlanes} + ${bucketSql("e", nPlanes, dim, t * nPlanes)} AS bucket FROM v"
    }.mkString("\n UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS ($arms),
       |cnt AS (SELECT bucket, count(*) AS nb FROM b GROUP BY 1),
       |ok AS (SELECT b.vec_id, b.e, b.bucket FROM b JOIN cnt USING (bucket)
       |  WHERE cnt.nb BETWEEN 2 AND $cap),
       |p AS (SELECT DISTINCT a.vec_id AS id1, c.vec_id AS id2,
       |    ${cosSql("a.e", "c.e")} AS sim
       |  FROM ok a JOIN ok c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |SELECT id1, id2, round(sim, 6) AS cosine_sim FROM p WHERE sim >= $threshold""".stripMargin
  }

  /** IVF (first-k centroids, nProbe cells) top-k: the oracle for
    * l12_ann_ivf_topk. Cell ids are the centroid's rank in vec_id order,
    * matching [[Ann.firstKCentroids]]. */
  def ivfTopKSql(nCentroids: Int, nProbe: Int, nQueries: Int, k: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS ce
       |  FROM v ORDER BY vec_id LIMIT $nCentroids),
       |sims AS (SELECT v.vec_id, v.e, c.cell, ${cosSql("v.e", "c.ce")} AS sim
       |  FROM v CROSS JOIN c),
       |rkd AS (SELECT vec_id, e, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS r
       |  FROM sims),
       |corpus AS (SELECT vec_id AS corpus_id, e AS ce2, cell FROM rkd WHERE r = 1),
       |queries AS (SELECT vec_id AS query_id, e AS qe, cell
       |  FROM rkd WHERE vec_id < $nQueries AND r <= $nProbe),
       |sc AS (SELECT DISTINCT q.query_id, c2.corpus_id, ${cosSql("q.qe", "c2.ce2")} AS sim
       |  FROM queries q JOIN corpus c2 ON q.cell = c2.cell AND c2.corpus_id <> q.query_id),
       |rk AS (SELECT query_id, corpus_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, corpus_id) AS r
       |  FROM sc)
       |SELECT query_id, corpus_id, round(sim, 6) AS cosine_sim FROM rk WHERE r <= $k""".stripMargin

  /** Exact twin of [[graft.llm.Ann.lshKnnJoin]] over `embeddings` —
    * l37_knn_join. Candidate arms replay [[embeddingNearDupsSql]] at
    * threshold −1 (all bucketed pairs), mirrored to both directions, then
    * the per-id window keeps k by the rounded rank key. */
  def lshKnnJoinSql(nPlanes: Int, dim: Int, k: Int, cap: Int,
                    nTables: Int): String = {
    val arms = (0 until nTables).map { t =>
      s"SELECT vec_id, e, ${t.toLong << nPlanes} + ${bucketSql("e", nPlanes, dim, t * nPlanes)} AS bucket FROM v"
    }.mkString("\n UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS ($arms),
       |cnt AS (SELECT bucket, count(*) AS nb FROM b GROUP BY 1),
       |ok AS (SELECT b.vec_id, b.e, b.bucket FROM b JOIN cnt USING (bucket)
       |  WHERE cnt.nb BETWEEN 2 AND $cap),
       |p AS (SELECT DISTINCT a.vec_id AS id1, c.vec_id AS id2,
       |    ${cosSql("a.e", "c.e")} AS sim
       |  FROM ok a JOIN ok c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
       |sym AS (SELECT id1 AS id, id2 AS neighbor_id, sim FROM p
       |  UNION ALL SELECT id2, id1, sim FROM p),
       |rk AS (SELECT id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY id ORDER BY round(sim, 6) DESC, neighbor_id) AS r
       |  FROM sym)
       |SELECT id, neighbor_id, CAST(r AS BIGINT) AS "rank",
       |  round(sim, 6) AS cosine_sim FROM rk WHERE r <= $k""".stripMargin
  }

  /** Exact twin of [[graft.llm.Ann.semanticDedup]] over `embeddings` with
    * [[graft.llm.Ann.firstKCentroids]] centroids — l38_semantic_dedup.
    * Cell assignment replays [[ivfTopKSql]]'s argmax CTE (sim DESC, cell
    * tie-break = the Scala side's (neg, cell) array_min); cells above the
    * cap produce no pairs, so their members stay kept. */
  def semanticDedupSql(nCentroids: Int, threshold: Double, cap: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS ce
       |  FROM v ORDER BY vec_id LIMIT $nCentroids),
       |sims AS (SELECT v.vec_id, v.e, c.cell, ${cosSql("v.e", "c.ce")} AS sim
       |  FROM v CROSS JOIN c),
       |asg AS (SELECT vec_id, e, cell FROM (
       |    SELECT vec_id, e, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS r
       |    FROM sims) WHERE r = 1),
       |cnt AS (SELECT cell, count(*) AS nc FROM asg GROUP BY 1),
       |okc AS (SELECT a.vec_id, a.e, a.cell FROM asg a JOIN cnt USING (cell)
       |  WHERE cnt.nc BETWEEN 2 AND $cap),
       |drops AS (SELECT DISTINCT c2.vec_id AS did
       |  FROM okc a JOIN okc c2 ON a.cell = c2.cell AND a.vec_id < c2.vec_id
       |  WHERE ${cosSql("a.e", "c2.e")} >= $threshold)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, d.did IS NULL AS kept
       |FROM asg a LEFT JOIN drops d ON a.vec_id = d.did""".stripMargin

  /** Exact twin of [[graft.llm.RetrievalEval.retrievalMetrics]] over the
    * l10 configuration — l68_retrieval_metrics. Ground truth is the exact
    * per-query top-k (all-pairs window, oracle-scale only); the system
    * side is [[lshTopKSql]] verbatim; ranks recompute from the rounded
    * key on both sides. */
  def retrievalMetricsSql(nPlanes: Int, dim: Int, nQueries: Int, k: Int,
                          nTables: Int): String =
    s"""WITH res AS (
       |  SELECT * FROM (${lshTopKSql(nPlanes, dim, nQueries, k, nTables)})),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |tr AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(${cosSql("q.e", "c.e")}, 6) DESC, c.vec_id) AS r
       |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |truth AS (SELECT query_id, corpus_id FROM tr WHERE r <= $k),
       |rk AS (SELECT query_id, corpus_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY round(cosine_sim, 6) DESC,
       |    corpus_id) AS rnk
       |  FROM res),
       |h AS (SELECT t.query_id, count(*) AS n_hits, min(rk.rnk) AS fr
       |  FROM truth t JOIN rk ON t.query_id = rk.query_id
       |    AND t.corpus_id = rk.corpus_id
       |  GROUP BY 1)
       |SELECT q.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  round(COALESCE(h.n_hits, 0) / $k.0, 6) AS recall_at_k,
       |  round(CASE WHEN h.fr IS NULL THEN 0.0 ELSE 1.0 / h.fr END, 6) AS rr
       |FROM (SELECT DISTINCT query_id FROM truth) q
       |LEFT JOIN h USING (query_id)""".stripMargin

  /** Exact twin of [[graft.llm.LabelProp.knnLabelVote]] over `embeddings`
    * with seed labels = lang of every `seedMod`-th document —
    * l67_knn_label_prop. The neighbor graph is [[lshKnnJoinSql]] verbatim
    * (wrapped as a derived table); the vote joins seed labels on the
    * neighbor side, restricts targets to unlabeled ids, sums DECIMAL
    * weights, and breaks ties by (weight DESC, label ASC). */
  def knnLabelPropSql(nPlanes: Int, dim: Int, k: Int, cap: Int,
                      nTables: Int, seedMod: Int): String =
    s"""WITH nn AS (
       |  SELECT * FROM (${lshKnnJoinSql(nPlanes, dim, k, cap, nTables)})),
       |lab AS (SELECT doc_id AS id, lang AS label FROM documents
       |  WHERE doc_id % $seedMod = 0),
       |votes AS (
       |  SELECT nn.id, l.label,
       |    sum(CAST(nn.cosine_sim AS DECIMAL(16,6))) AS w,
       |    count(*) AS n
       |  FROM nn JOIN lab l ON nn.neighbor_id = l.id
       |  WHERE nn.id NOT IN (SELECT id FROM lab)
       |  GROUP BY 1, 2),
       |rk AS (SELECT id, label, w, n, row_number() OVER (
       |    PARTITION BY id ORDER BY w DESC, label) AS r
       |  FROM votes)
       |SELECT id AS vec_id, label AS pred_label,
       |  CAST(w AS DOUBLE) AS weight, CAST(n AS BIGINT) AS n_votes
       |FROM rk WHERE r = 1""".stripMargin

  /** Exact twin of [[graft.llm.Pq.ivfAdcTopK]] over `embeddings` with
    * [[graft.llm.Ann.firstKCentroids]] IVF cells, l52's seed codebooks and
    * the first vector as query — l66_ivfpq_topk. Cell assignment replays
    * [[semanticDedupSql]]'s argmax CTE; probe selection ranks the same
    * cosine per cell; ADC replays l53's lookup tables restricted to
    * members of probed cells. */
  def ivfAdcTopKSql(nCells: Int, nProbe: Int, m: Int, kCodes: Int,
                    dim: Int, topK: Int): String = {
    val d = dim / m
    s"""WITH s AS (SELECT unnest(range($m)) AS sub),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS ce
       |  FROM v ORDER BY vec_id LIMIT $nCells),
       |sims AS (SELECT v.vec_id, c.cell, ${cosSql("v.e", "c.ce")} AS sim
       |  FROM v CROSS JOIN c),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY sim DESC, cell) AS r
       |    FROM sims) WHERE r = 1),
       |qv AS (SELECT e AS q FROM v ORDER BY vec_id LIMIT 1),
       |qc AS (SELECT cell FROM (
       |    SELECT c.cell, row_number() OVER (
       |      ORDER BY ${cosSql("qv.q", "c.ce")} DESC, c.cell) AS r
       |    FROM c CROSS JOIN qv) WHERE r <= $nProbe),
       |seeds AS (
       |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS code
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $kCodes)),
       |cb AS (
       |  SELECT s.sub, seeds.code,
       |    list_transform(embedding[s.sub*$d+1 : s.sub*$d+$d],
       |      x -> CAST(x AS DOUBLE)) AS cent
       |  FROM seeds CROSS JOIN s),
       |qt AS (
       |  SELECT cb.sub, cb.code,
       |    CAST(round(list_sum(list_transform(range(1, ${d + 1}),
       |      i -> (CAST(q[cb.sub*$d+i] AS DOUBLE)-cent[i])
       |         * (CAST(q[cb.sub*$d+i] AS DOUBLE)-cent[i]))), 6)
       |      AS DECIMAL(18,6)) AS qd
       |  FROM cb CROSS JOIN qv),
       |vv AS (
       |  SELECT e2.vec_id, s.sub,
       |    list_transform(e2.embedding[s.sub*$d+1 : s.sub*$d+$d],
       |      x -> CAST(x AS DOUBLE)) AS sv
       |  FROM embeddings e2
       |  JOIN asg ON e2.vec_id = asg.vec_id
       |  JOIN qc ON asg.cell = qc.cell
       |  CROSS JOIN s),
       |dd AS (
       |  SELECT vv.vec_id, vv.sub, cb.code,
       |    round(list_sum(list_transform(range(1, ${d + 1}),
       |      i -> (sv[i]-cent[i])*(sv[i]-cent[i]))), 6) AS dist
       |  FROM vv JOIN cb USING (sub)),
       |r AS (SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code, row_number() OVER (
       |      PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
       |    FROM dd) WHERE rn = 1)
       |SELECT r.vec_id, CAST(a2.cell AS BIGINT) AS cell,
       |  CAST(sum(qt.qd) AS DOUBLE) AS adc_score
       |FROM r JOIN qt ON r.sub = qt.sub AND r.code = qt.code
       |JOIN asg a2 ON r.vec_id = a2.vec_id
       |GROUP BY r.vec_id, a2.cell
       |ORDER BY adc_score, r.vec_id LIMIT $topK""".stripMargin
  }

  /** Exact twin of [[graft.llm.Ann.hardNegativesLsh]] over `embeddings`
    * with queries = `vec_id % queryMod = 0` — the candidate-path l73.
    * Replays [[lshTopKSql]]'s multi-table arms + 1-bit-flip probes with
    * labels carried, the different-label filter before DISTINCT, and the
    * rounded-sim rank. */
  def hardNegativesLshSql(nPlanes: Int, dim: Int, k: Int, nTables: Int,
                          queryMod: Int): String = {
    val probes = ("qb" +: (0 until nPlanes).map(p => s"xor(qb, ${1L << p})")).mkString(", ")
    val arms = (0 until nTables).map { t =>
      s"SELECT vec_id, label, e, ${t.toLong << nPlanes} + ${bucketSql("e", nPlanes, dim, t * nPlanes)} AS bucket FROM v"
    }.mkString("\n UNION ALL ")
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS ($arms),
       |q AS (SELECT vec_id AS query_id, label AS query_label, e AS qe,
       |    bucket AS qb FROM b WHERE vec_id % $queryMod = 0),
       |pr AS (SELECT query_id, query_label, qe, unnest([$probes]) AS bucket FROM q),
       |sc AS (SELECT DISTINCT p.query_id, p.query_label, c.vec_id AS corpus_id,
       |    c.label AS corpus_label, ${cosSql("p.qe", "c.e")} AS sim
       |  FROM pr p JOIN b c ON p.bucket = c.bucket
       |  WHERE c.label <> p.query_label),
       |rk AS (SELECT query_id, query_label, corpus_id, corpus_label, sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(sim, 6) DESC, corpus_id) AS r
       |  FROM sc)
       |SELECT query_id, query_label, corpus_id, corpus_label,
       |  round(sim, 6) AS cosine_sim, CAST(r AS BIGINT) AS rank
       |FROM rk WHERE r <= $k""".stripMargin
  }

  /** Exact twin of [[graft.llm.Ann.marginBitextMineLsh]] over `embeddings`
    * with sides = label % 2 — the candidate-path l84. Multi-table arms
    * replay the literal-coefficient hyperplane buckets (tag `t << nPlanes`,
    * plane slice t·nPlanes — same as [[embeddingNearDupsSql]]), capped
    * buckets yield cross-SIDE pairs only, then the same mutual-top-1 +
    * DECIMAL-exact margin tail as the exact-form l84 oracle. */
  def marginBitextLshSql(nPlanes: Int, dim: Int, k: Int, cap: Int,
                         nTables: Int, minMargin: Double): String = {
    val arms = (0 until nTables).map { t =>
      s"SELECT vec_id, v, side, ${t.toLong << nPlanes} + ${bucketSql("v", nPlanes, dim, t * nPlanes)} AS bucket FROM e"
    }.mkString("\n UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label % 2 AS side
       |  FROM embeddings),
       |b AS ($arms),
       |cnt AS (SELECT bucket, count(*) AS nb FROM b GROUP BY 1),
       |ok AS (SELECT b.vec_id, b.v, b.side, b.bucket FROM b JOIN cnt USING (bucket)
       |  WHERE cnt.nb BETWEEN 2 AND $cap),
       |p AS (SELECT DISTINCT a.vec_id AS a_id, c.vec_id AS b_id,
       |    round(${cosSql("a.v", "c.v")}, 6) AS sim
       |  FROM ok a JOIN ok c ON a.bucket = c.bucket AND a.side = 0 AND c.side = 1),
       |r AS (SELECT a_id, b_id, sim,
       |    row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS ra,
       |    row_number() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rb
       |  FROM p),
       |aa AS (SELECT a_id, CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS sa,
       |    CAST(count(*) AS BIGINT) AS na FROM r WHERE ra <= $k GROUP BY 1),
       |bb AS (SELECT b_id, CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS sb,
       |    CAST(count(*) AS BIGINT) AS nb FROM r WHERE rb <= $k GROUP BY 1)
       |SELECT r.a_id, r.b_id, r.sim,
       |  round(r.sim / (0.5 * (sa / na + sb / nb)), 6) AS margin
       |FROM r JOIN aa USING (a_id) JOIN bb USING (b_id)
       |WHERE ra = 1 AND rb = 1
       |  AND round(r.sim / (0.5 * (sa / na + sb / nb)), 6) >= $minMargin""".stripMargin
  }

}
