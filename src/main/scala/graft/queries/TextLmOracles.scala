package graft.queries

/**
 * DuckDB oracle SQL — the LM / RETRIEVAL / GRAPH half of the former
 * monolithic TextOracles (round-10 file split, pure move, no behavior
 * change): bigram surprisal + Kneser-Ney + perplexity buckets, count-min
 * heavy hitters, inverted index / TF-IDF / BM25, domain PageRank and
 * triangle counting, n-gram precision, and the unigram-LM Viterbi
 * segmentation replays.
 */
private[queries] trait TextLmOracles extends TextOracleSqlBase {


  /** Exact twin of [[graft.llm.LangModel.bigramSurprisal]] over
    * `documents` — l43_bigram_surprisal. The bigram stream aligns two
    * same-length unnests (BOS-prepended prefix vs tokens); the single-token
    * case is guarded because `tk[1:0]` is NULL in DuckDB, not []. Count
    * windows, the V constant, smoothing arithmetic, and the DECIMAL
    * contribution sum replay the Spark side exactly. */
  /** The l43 surprisal pipeline as a reusable CTE block (ends at `g`);
    * shared verbatim by l43 and the l82 perplexity-bucket twin so the two
    * oracles can never drift on the per-doc scores. */
  /** The BOS-prepended bigram stream (CTEs t + s) shared by every bigram
    * LM oracle (l43/l82/l98) — one definition, no cross-oracle drift. */
  private def bigramStreamCtes: String =
    s"""t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents),
       |s AS (SELECT doc_id,
       |    unnest(CASE WHEN len(tk) = 1 THEN [chr(2)]
       |           ELSE list_prepend(chr(2), tk[1:len(tk)-1]) END) AS prev,
       |    unnest(tk) AS w
       |  FROM t WHERE len(tk) > 0)""".stripMargin


  private def surprisalCtes: String =
    s"""$bigramStreamCtes,
       |c AS (SELECT doc_id,
       |    count(*) OVER (PARTITION BY prev, w) AS c2,
       |    count(*) OVER (PARTITION BY prev) AS c1
       |  FROM s),
       |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM s),
       |sc AS (SELECT doc_id,
       |    CAST(round(-ln((c2 + 1) / (c1 + v)), 6) AS DECIMAL(18,6)) AS sc
       |  FROM c CROSS JOIN v),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(sc) AS DOUBLE) AS nll
       |  FROM sc GROUP BY 1)""".stripMargin


  def bigramSurprisalSql: String =
    s"""WITH $surprisalCtes
       |SELECT doc_id, n_bigrams, nll, nll / n_bigrams AS avg_nll FROM g""".stripMargin


  /** Exact twin of [[graft.llm.LangModel.kneserNeyScores]] —
    * l98_kneser_ney. Shares the l43/l82 bigram-stream CTEs; type/context/
    * continuation counts come from the distinct-bigram table (exactly the
    * sums Spark's windows compute), the one-row N1+(··) total cross-joins,
    * and the float probability mirrors the Spark expression operation for
    * operation (every input cast to DOUBLE first; IEEE +,−,×,÷ are
    * correctly rounded on both engines), rounded to 6 dp into DECIMAL. */
  def kneserNeySql(discount: String = "0.75"): String =
    s"""WITH $bigramStreamCtes,
       |ty AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c2 FROM s GROUP BY 1, 2),
       |cp AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1,
       |    CAST(count(*) AS BIGINT) AS n1p FROM ty GROUP BY 1),
       |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS n1c FROM ty GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM ty),
       |sc AS (SELECT doc_id,
       |    CAST(round(0.0 - ln(
       |      (greatest(CAST(c2 AS DOUBLE) - $discount, 0.0)
       |        + $discount * CAST(n1p AS DOUBLE) * CAST(n1c AS DOUBLE) / CAST(nt AS DOUBLE))
       |      / CAST(c1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS sc
       |  FROM s JOIN ty USING (prev, w) JOIN cp USING (prev) JOIN cw USING (w)
       |    CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(sc) AS DOUBLE) AS kn_nll,
       |  CAST(sum(sc) AS DOUBLE) / count(*) AS avg_kn_nll
       |FROM sc GROUP BY 1""".stripMargin


  /** Exact twin of [[graft.llm.LangModel.perplexityBuckets]] —
    * l82_perplexity_buckets. Rides the SAME surprisal CTEs as l43 (so
    * per-doc avg_nll is bit-identical by construction), then NTILE(3)
    * per language ordered (avg_nll, doc_id) and the (lang,bucket)
    * summary with the DECIMAL-summed mean of 6-dp-rounded doubles. */
  def perplexityBucketsSql: String =
    s"""WITH $surprisalCtes,
       |sc2 AS (SELECT doc_id, n_bigrams, nll / n_bigrams AS avg_nll FROM g),
       |j AS (SELECT d.lang, sc2.doc_id, sc2.n_bigrams, sc2.avg_nll
       |  FROM sc2 JOIN documents d USING (doc_id)),
       |nt AS (SELECT lang, n_bigrams, avg_nll,
       |    ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS t3
       |  FROM j)
       |SELECT lang,
       |  CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       |  round(CAST(sum(CAST(round(avg_nll, 6) AS DECIMAL(18,6))) AS DOUBLE)
       |    / count(*), 6) AS mean_avg_nll
       |FROM nt GROUP BY 1, 2""".stripMargin


  /** Exact twin of [[graft.llm.Sketch.cmsHeavyHitters]] over `documents` —
    * l45_cms_heavy_hitters. The portable hash family makes the whole
    * sketch engine-deterministic, so the oracle replays cell placement,
    * cell sums, and the min-over-rows estimates EXACTLY (unpopulated
    * probe cells are 0 via the left join). */
  def cmsHeavyHittersSql(probes: Seq[String], d: Int, w: Int): String = {
    val vals = probes.map(p => s"('${OracleSqlUtil.esc(p)}')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
       |  FROM documents),
       |tf AS (SELECT token, count(*) AS cnt FROM toks
       |  WHERE length(token) > 0 GROUP BY 1),
       |cells AS (SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT cnt, t.r,
       |      ('0x'||substr(md5('cms'||t.r||chr(31)||token),1,15))::BIGINT % $w AS bucket
       |    FROM tf CROSS JOIN range(0, $d) t(r))
       |  GROUP BY 1, 2),
       |probes(term) AS (VALUES $vals),
       |pc AS (SELECT term, t.r,
       |    ('0x'||substr(md5('cms'||t.r||chr(31)||term),1,15))::BIGINT % $w AS bucket
       |  FROM probes CROSS JOIN range(0, $d) t(r))
       |SELECT term, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
       |FROM pc LEFT JOIN cells USING (r, bucket) GROUP BY 1""".stripMargin
  }


  /** Exact twin of [[graft.llm.Index.invertedIndex]] over `documents` —
    * l39_inverted_index: per-token document frequency, total term
    * frequency, and the first `maxPostings` `doc:tf` postings in doc-id
    * order. Token stream = lowercase, trim, split on whitespace runs,
    * empties excluded (the registry-wide text-op token definition). */
  def invertedIndexSql(minDf: Int, maxPostings: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
       |  FROM documents),
       |tf AS (SELECT token, doc_id, count(*) AS tf FROM toks
       |  WHERE length(token) > 0 GROUP BY 1, 2),
       |stats AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
       |    CAST(sum(tf) AS BIGINT) AS tf_total
       |  FROM tf GROUP BY 1 HAVING count(*) >= $minDf),
       |rk AS (SELECT token, doc_id, tf,
       |    row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
       |  FROM tf),
       |po AS (SELECT token, string_agg(doc_id || ':' || tf, '|' ORDER BY doc_id) AS postings
       |  FROM rk WHERE rn <= $maxPostings GROUP BY 1)
       |SELECT s.token, s.df, s.tf_total, p.postings
       |FROM stats s JOIN po p USING (token)""".stripMargin


  /** Exact twin of [[graft.llm.Index.tfidfTopTerms]] over `documents` —
    * l44_tfidf_keywords: per-doc top-k terms by `tf · ln(N/df)`, stopword
    * cut at df > maxDfFrac·N, 6-dp rank key with term tie-break. */
  def tfidfTopTermsSql(topK: Int, maxDfFrac: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
       |  FROM documents),
       |tf AS (SELECT token, doc_id, count(*) AS tf FROM toks
       |  WHERE length(token) > 0 GROUP BY 1, 2),
       |dft AS (SELECT token, doc_id, tf,
       |    count(*) OVER (PARTITION BY token) AS t_df
       |  FROM tf),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |sc AS (SELECT doc_id, token AS term,
       |    round(tf * ln(n_docs / t_df), 6) AS score
       |  FROM dft CROSS JOIN tot
       |  WHERE t_df <= n_docs * $maxDfFrac),
       |rk AS (SELECT doc_id, term, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS r
       |  FROM sc)
       |SELECT doc_id, term, CAST(r AS BIGINT) AS "rank", score
       |FROM rk WHERE r <= $topK""".stripMargin


  /** Exact twin of [[graft.llm.Index.bm25TopK]] over `documents` —
    * l40_bm25_topk. Identical operation ORDER inside every double
    * expression (idf numerator/denominator, tf saturation, (b·dl)/avgdl)
    * so both engines fold the same IEEE sequence; per-term contributions
    * round to 6 dp and sum in DECIMAL(18,6), the registry-wide
    * order-independent double-sum rule. */
  def bm25TopKSql(terms: Seq[String], topK: Int,
                  k1: Double = 1.2, b: Double = 0.75): String = {
    val termList = terms.map(t => s"'${OracleSqlUtil.esc(t)}'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |docs AS (SELECT doc_id, tk,
       |    CAST(len(list_filter(tk, x -> length(x) > 0)) AS BIGINT) AS dl
       |  FROM d),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS dl_total FROM docs),
       |tf AS (SELECT doc_id, dl, token, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(tk) AS token FROM docs)
       |  WHERE token IN ($termList) GROUP BY 1, 2, 3),
       |dft AS (SELECT token, CAST(count(*) AS BIGINT) AS t_df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id,
       |    CAST(round(
       |      ln((n_docs - t_df + 0.5) / (t_df + 0.5) + 1.0)
       |      * ((tf * ($k1 + 1.0))
       |        / (tf + $k1 * (1.0 - $b + $b * dl / (CAST(dl_total AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
       |      6) AS DECIMAL(18,6)) AS c
       |  FROM tf JOIN dft USING (token) CROSS JOIN tot)
       |SELECT doc_id, CAST(sum(c) AS DOUBLE) AS score
       |FROM sc GROUP BY 1 ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }


  /** Exact twin of the l130 registry row: N BM25 lists fused by
    * reciprocal rank — per-list ranks from (score DESC, doc_id), each
    * contribution the floor quotient 10⁹ // (kConst + rank) (DuckDB `//`
    * truncates exactly like Spark `div` on non-negatives). */
  def rrfFusionSql(termSets: Seq[Seq[String]], listTopK: Int,
                   kConst: Int, topK: Int): String = {
    val lists = termSets.zipWithIndex.map { case (ts, i) =>
      s"""l$i AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
         |  FROM (${bm25TopKSql(ts, listTopK)}))""".stripMargin
    }.mkString(",\n")
    val unioned = termSets.indices.map(i => s"SELECT * FROM l$i")
      .mkString(" UNION ALL ")
    s"""WITH $lists,
       |ranked AS ($unioned),
       |fused AS (SELECT doc_id,
       |    CAST(sum(1000000000 // ($kConst + rnk)) AS BIGINT) AS rrf_score_nano,
       |    CAST(count(*) AS BIGINT) AS n_lists
       |  FROM ranked GROUP BY 1)
       |SELECT * FROM (
       |  SELECT doc_id, rrf_score_nano, n_lists,
       |    CAST(row_number() OVER (ORDER BY rrf_score_nano DESC, doc_id) AS BIGINT) AS rrf_rank
       |  FROM fused)
       |WHERE rrf_rank <= $topK""".stripMargin
  }

  /** Exact twin of the l89 registry row: the deterministic doc→domain
    * link synthesis plus [[graft.ops.Graph.pageRankInt]]'s integer
    * iterations unrolled as chained CTEs — floor arithmetic end to end,
    * so all `iters` rounds replay bit-for-bit. */
  def domainPageRankSql(iters: Int, nDomains: Int, dampNum: Long,
                        dampDen: Long): String = {
    val baseMicro = ((dampDen - dampNum) * 1000000L) / dampDen
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |    CAST($baseMicro + ($dampNum * COALESCE(c.infl, 0)) // $dampDen AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r${i - 1}.r // od.od) AS infl
         |    FROM e JOIN od USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |    GROUP BY 1) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH arms AS (
       |  SELECT source AS src,
       |    'src' || CAST(('0x'||substr(md5('link'||t.r||chr(31)
       |      ||CAST(doc_id AS VARCHAR)),1,15))::BIGINT % $nDomains AS VARCHAR) AS dst
       |  FROM documents CROSS JOIN range(0, 2) t(r)),
       |e AS (SELECT src, dst FROM arms WHERE src <> dst),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$iterCtes
       |SELECT node, r AS rank_micro FROM r$iters""".stripMargin
  }


  /** Exact twin of [[graft.ops.Graph.triangleCounts]] over the l89
    * synthesized domain link graph — l101_triangle_count. Same arms CTE
    * as the PageRank oracle, then the full degree-oriented wedge
    * construction replayed relationally: undirected dedupe, (degree,
    * node)-lexicographic orientation, value-ordered wedge pairs, the
    * both-directions closing join, per-corner unpivot, and the
    * floor-arithmetic clustering coefficient. */
  def triangleCountSql(nDomains: Int): String =
    s"""WITH arms AS (
       |  SELECT source AS src,
       |    'src' || CAST(('0x'||substr(md5('link'||t.r||chr(31)
       |      ||CAST(doc_id AS VARCHAR)),1,15))::BIGINT % $nDomains AS VARCHAR) AS dst
       |  FROM documents CROSS JOIN range(0, 2) t(r)),
       |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM arms WHERE src <> dst),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
       |    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
       |wd AS (SELECT e0.a, e0.b, da.degree AS da, db.degree AS db
       |  FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b),
       |o AS (SELECT
       |    CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS lo,
       |    CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS hi
       |  FROM wd),
       |wg AS (SELECT w1.lo, w1.hi AS x, w2.hi AS y
       |  FROM o w1 JOIN o w2 USING (lo) WHERE w1.hi < w2.hi),
       |cl AS (SELECT lo AS x, hi AS y FROM o UNION ALL SELECT hi, lo FROM o),
       |tr AS (SELECT wg.lo AS n1, wg.x AS n2, wg.y AS n3
       |  FROM wg JOIN cl ON cl.x = wg.x AND cl.y = wg.y),
       |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
       |    SELECT n1 AS node FROM tr UNION ALL SELECT n2 FROM tr
       |    UNION ALL SELECT n3 FROM tr) GROUP BY 1)
       |SELECT deg.node, deg.degree,
       |  CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
       |  CAST(CASE WHEN deg.degree >= 2
       |    THEN (2 * COALESCE(pn.triangles, 0) * 1000000)
       |      // (deg.degree * (deg.degree - 1))
       |    ELSE 0 END AS BIGINT) AS lcc_micro
       |FROM deg LEFT JOIN pn USING (node)""".stripMargin


  /** Exact twin of [[graft.llm.CorpusStats.ngramPrecisionEval]] over
    * `documents` — l92: per-source corpus-level clipped unigram/bigram
    * precision between each doc and its same-source predecessor, multiset
    * clipping replayed with list lambdas. */
  val ngramPrecisionSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> length(x) > 0) AS t1
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, source, t1,
      |    CASE WHEN len(t1) >= 2
      |      THEN list_transform(range(1, len(t1)), i -> t1[i] || ' ' || t1[i+1])
      |      ELSE [] END AS t2
      |  FROM tk),
      |pairs AS (
      |  SELECT source, doc_id, t1, t2,
      |    lag(t1) OVER (PARTITION BY source ORDER BY doc_id) AS r1,
      |    lag(t2) OVER (PARTITION BY source ORDER BY doc_id) AS r2
      |  FROM bg),
      |scored AS (
      |  SELECT source,
      |    list_sum(list_transform(list_distinct(t1), g ->
      |      least(len(list_filter(t1, x -> x = g)),
      |            len(list_filter(r1, x -> x = g))))) AS c1,
      |    len(t1) AS d1,
      |    coalesce(list_sum(list_transform(list_distinct(t2), g ->
      |      least(len(list_filter(t2, x -> x = g)),
      |            len(list_filter(r2, x -> x = g))))), 0) AS c2,
      |    len(t2) AS d2
      |  FROM pairs WHERE r1 IS NOT NULL AND len(t1) > 0 AND len(r1) > 0)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(c1) AS BIGINT) AS p1_num, CAST(sum(d1) AS BIGINT) AS p1_den,
      |  CAST(sum(c2) AS BIGINT) AS p2_num, CAST(sum(d2) AS BIGINT) AS p2_den,
      |  round(CAST(sum(c1) AS DOUBLE) / sum(d1), 6) AS p1,
      |  CASE WHEN sum(d2) > 0
      |    THEN round(CAST(sum(c2) AS DOUBLE) / sum(d2), 6) END AS p2
      |FROM scored GROUP BY 1""".stripMargin


  /**
   * Exact twin of [[graft.llm.Unigram.segmentCost]] — l93: the unigram-LM
   * Viterbi DP replayed as a recursive CTE over character positions, one
   * packed-long dp list per word, the SAME interpolated vocabulary/cost
   * table, and the same `coalesce(…, BIG)` infeasible-candidate sentinel —
   * so every per-doc (cost, pieces) pair replays bit-for-bit, including
   * tie-breaks (the packed value makes (cost, pieces) lexicographic min a
   * numeric min on both engines).
   */
  /** Shared unigram-DP CTE block (ut → uw → useg → ufin → uagg) ending in
    * `uagg(doc_id, cost_micro, n_pieces, n_words_seg)` — one hand-
    * maintained copy of the recursive Viterbi replay, consumed by both
    * [[unigramSegmentSql]] and [[tokenizerComparisonSql]] so the two can
    * never desynchronize (the BpeOracles.encodeCtes pattern). CTE names
    * are u-prefixed to coexist with the BPE block in one WITH RECURSIVE. */
  private def unigramDpCtes(vocab: Seq[(String, Long)], unkCost: Long,
                            maxLen: Int): String = {
    val big = graft.llm.Unigram.Big
    def costCase(k: Int): String = {
      val entries = vocab.filter(_._1.length == k)
      val whens = entries.map { case (p, c) => s"WHEN '${esc(p)}' THEN $c" }.mkString(" ")
      val els = if (k == 1) unkCost.toString else "NULL"
      if (entries.isEmpty) els
      else s"CASE substr(w, i - ${k - 1}, $k) $whens ELSE $els END"
    }
    val cands = (1 to maxLen).map { k =>
      s"COALESCE(CASE WHEN i >= $k THEN dp[i - ${k - 1}] + CAST(${costCase(k)} AS BIGINT) * 2048 + 1 END, CAST($big AS BIGINT))"
    }.mkString(",\n      ")
    s"""ut AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |    x -> length(x) > 0) AS ws
       |  FROM documents),
       |uw AS (SELECT doc_id, substr(w, 1, ${graft.llm.Unigram.MaxWordChars}) AS w, wi
       |  FROM (SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS wi FROM ut)),
       |useg AS (
       |  SELECT doc_id, wi, w, length(w) AS n, 1 AS i, [CAST(0 AS BIGINT)] AS dp
       |  FROM uw
       |  UNION ALL
       |  SELECT doc_id, wi, w, n, i + 1,
       |    list_append(dp, least($cands))
       |  FROM useg WHERE i <= n),
       |ufin AS (SELECT doc_id, dp[n + 1] AS packed FROM useg WHERE i = n + 1),
       |uagg AS (SELECT doc_id, CAST(sum(packed >> 11) AS BIGINT) AS cost_micro,
       |    CAST(sum(packed & 2047) AS BIGINT) AS n_pieces,
       |    CAST(count(*) AS BIGINT) AS n_words_seg
       |  FROM ufin GROUP BY 1)""".stripMargin
  }


  def unigramSegmentSql(vocab: Seq[(String, Long)], unkCost: Long,
                        maxLen: Int): String =
    s"""WITH RECURSIVE ${unigramDpCtes(vocab, unkCost, maxLen)}
       |SELECT ut.doc_id, COALESCE(uagg.cost_micro, 0) AS cost_micro,
       |  COALESCE(uagg.n_pieces, 0) AS n_pieces,
       |  CAST(COALESCE(len(ut.ws), 0) AS BIGINT) AS n_words
       |FROM ut LEFT JOIN uagg USING (doc_id)""".stripMargin


  /**
   * Exact twin of the l94 tokenizer family comparison: per language, the
   * BPE token count (BpeOracles' recursive merge replay) NEXT TO the
   * unigram piece count (the recursive Viterbi replay) over the same
   * docs — both tokenizer families in ONE WITH RECURSIVE block, exact
   * integer sums, the only doubles the two final per-word ratios.
   */
  /**
   * Exact twin of [[graft.llm.UnigramTrain.emTrain]] (rounds = 1) —
   * l115: the WHOLE hard-EM train replayed in one WITH RECURSIVE —
   * top-word frequency cut, weighted substring candidate counts, seed
   * top-V cut, seed costs via the [[graft.llm.Log2Micro]] recurrence
   * (prefix `lga`), the packed Viterbi DP per word JOINING the
   * data-derived seed-cost table (l93's DP with vocab joins instead of
   * literal CASE chains), the smallest-k backtrace, EM counts at word
   * frequency, the M-step top-V re-cut, and final costs via a SECOND
   * log2 instance (prefix `lgb` — the two stages' inputs are
   * sequentially dependent, so one shared `ns` would be cyclic).
   */
  def unigramEmTrainSql(topWords: Int, vocabSize: Int, topK: Int,
                        maxLen: Int, unkCost: Long): String = {
    require(maxLen == 4, "the DP/backtrace SQL is written for maxLen = 4")
    val big = graft.llm.Unigram.Big
    val cap = graft.llm.Unigram.MaxWordChars
    // DP candidate for piece length k ending at char i (list dp is
    // 1-indexed; dp[i] = packed cost of the first i-1 chars)
    def dpCand(k: Int): String =
      if (k == 1) s"u.dp[u.i] + COALESCE(v1.cost, $unkCost)*2048 + 1"
      else s"COALESCE(CASE WHEN u.i >= $k THEN u.dp[u.i - ${k - 1}] + v$k.cost*2048 + 1 END, CAST($big AS BIGINT))"
    // backtrace: smallest k whose candidate achieves dp[j] (CASE order =
    // the Scala tie-break); piece of length k ends at char j-1
    val kCase =
      s"""CASE
         | WHEN u.dp[u.j] = u.dp[u.j-1] + COALESCE(b1.cost, $unkCost)*2048 + 1 THEN 1
         | WHEN u.j >= 3 AND b2.cost IS NOT NULL
         |   AND u.dp[u.j] = u.dp[u.j-2] + b2.cost*2048 + 1 THEN 2
         | WHEN u.j >= 4 AND b3.cost IS NOT NULL
         |   AND u.dp[u.j] = u.dp[u.j-3] + b3.cost*2048 + 1 THEN 3
         | ELSE 4 END""".stripMargin
    val candUnions = (1 to maxLen).map { k =>
      s"""    SELECT unnest(list_transform(range(1, length(w) - ${k - 1} + 1),
         |      p -> substr(w, p, $k))) AS piece, f FROM wf""".stripMargin
    }.mkString("\n    UNION ALL\n")
    s"""WITH RECURSIVE
       |wt AS (
       |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |    x -> length(x) > 0) AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |wfall AS (
       |  SELECT substr(w, 1, $cap) AS w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(ws) AS w FROM wt) GROUP BY 1),
       |wf AS (SELECT w, f FROM wfall ORDER BY f DESC, w LIMIT $topWords),
       |cnd AS (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS cnt FROM (
       |$candUnions
       |  ) GROUP BY 1),
       |seed AS (SELECT piece, cnt FROM cnd ORDER BY cnt DESC, piece LIMIT $vocabSize),
       |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM seed),
       |nsa AS (SELECT DISTINCT cnt AS n FROM seed UNION SELECT t FROM t0),
       |${graft.llm.Log2Micro.duckSqlCtes("nsa", "lga")},
       |seedcost AS (
       |  SELECT s.piece,
       |    (SELECT l2m FROM lga WHERE n = (SELECT t FROM t0)) - g.l2m AS cost
       |  FROM seed s JOIN lga g ON g.n = s.cnt),
       |udp AS (
       |  SELECT w, f, length(w) AS n, 1 AS i, [CAST(0 AS BIGINT)] AS dp FROM wf
       |  UNION ALL
       |  SELECT u.w, u.f, u.n, u.i + 1,
       |    list_append(u.dp, least(
       |      ${(1 to maxLen).map(dpCand).mkString(",\n      ")}))
       |  FROM udp u
       |  LEFT JOIN seedcost v1 ON v1.piece = substr(u.w, u.i, 1)
       |  LEFT JOIN seedcost v2 ON u.i >= 2 AND v2.piece = substr(u.w, u.i - 1, 2)
       |  LEFT JOIN seedcost v3 ON u.i >= 3 AND v3.piece = substr(u.w, u.i - 2, 3)
       |  LEFT JOIN seedcost v4 ON u.i >= 4 AND v4.piece = substr(u.w, u.i - 3, 4)
       |  WHERE u.i <= u.n),
       |uback AS (
       |  SELECT w, f, n, dp, n + 1 AS j, CAST(NULL AS VARCHAR) AS piece
       |  FROM udp WHERE i = n + 1
       |  UNION ALL
       |  SELECT u.w, u.f, u.n, u.dp,
       |    u.j - ($kCase) AS j,
       |    substr(u.w, u.j - ($kCase), ($kCase)) AS piece
       |  FROM uback u
       |  LEFT JOIN seedcost b1 ON b1.piece = substr(u.w, u.j - 1, 1)
       |  LEFT JOIN seedcost b2 ON u.j >= 3 AND b2.piece = substr(u.w, u.j - 2, 2)
       |  LEFT JOIN seedcost b3 ON u.j >= 4 AND b3.piece = substr(u.w, u.j - 3, 3)
       |  WHERE u.j > 1),
       |em AS (SELECT piece, CAST(sum(f) AS BIGINT) AS cnt
       |  FROM uback WHERE piece IS NOT NULL GROUP BY 1),
       |emtop AS (SELECT piece, cnt FROM em ORDER BY cnt DESC, piece LIMIT $vocabSize),
       |t1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM emtop),
       |nsb AS (SELECT DISTINCT cnt AS n FROM emtop UNION SELECT t FROM t1),
       |${graft.llm.Log2Micro.duckSqlCtes("nsb", "lgb")}
       |SELECT e.piece, e.cnt AS em_count,
       |  (SELECT l2m FROM lgb WHERE n = (SELECT t FROM t1)) - g.l2m AS cost_micro
       |FROM emtop e JOIN lgb g ON g.n = e.cnt
       |ORDER BY em_count DESC, piece LIMIT $topK""".stripMargin
  }

  def tokenizerComparisonSql(merges: Seq[(String, String)],
                             vocab: Seq[(String, Long)], unkCost: Long,
                             maxLen: Int): String =
    s"""WITH RECURSIVE
       |${BpeOracles.encodeCtes(merges)},
       |cnt AS (SELECT t.doc_id, SUM(len(wc.syms)) AS n
       |        FROM tok t JOIN wc USING (w) GROUP BY 1),
       |${unigramDpCtes(vocab, unkCost, maxLen)},
       |base AS (SELECT d.lang,
       |    CAST(COALESCE(c.n, 0) AS BIGINT) AS bpe,
       |    COALESCE(u.n_pieces, 0) AS pieces,
       |    CAST(COALESCE(len(ut.ws), 0) AS BIGINT) AS words
       |  FROM documents d
       |  LEFT JOIN cnt c USING (doc_id)
       |  LEFT JOIN uagg u USING (doc_id)
       |  LEFT JOIN ut USING (doc_id)
       |  WHERE d.text IS NOT NULL)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(words) AS BIGINT) AS n_words,
       |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(pieces) AS BIGINT) AS n_unigram_pieces,
       |  round(CAST(sum(bpe) AS DOUBLE) / CAST(nullif(sum(words), 0) AS DOUBLE), 6)
       |    AS bpe_per_word,
       |  round(CAST(sum(pieces) AS DOUBLE) / CAST(nullif(sum(words), 0) AS DOUBLE), 6)
       |    AS unigram_per_word
       |FROM base GROUP BY 1""".stripMargin
}
