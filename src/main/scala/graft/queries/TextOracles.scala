package graft.queries

import graft.llm.NgramLangId

/**
 * DuckDB oracle SQL for the text-analysis family beyond the l3 stopword
 * heuristic: the char-trigram language ID replayed with the SAME profile
 * weights the Spark expression carries (interpolated from
 * [[NgramLangId.Profiles]]), multiplicity-weighted sums, and the identical
 * smallest-code argmax tie-break.
 */
object TextOracles {

  private def esc(s: String): String = OracleSqlUtil.esc(s)

  /** `CASE t WHEN 'tg' THEN w ... ELSE 0 END` scorer for one language. */
  private def weightCase(lang: String): String = {
    val whens = NgramLangId.Profiles(lang)
      .map { case (t, w) => s"WHEN '${esc(t)}' THEN $w" }.mkString(" ")
    s"CASE t $whens ELSE 0 END"
  }

  /** Exact twin of `Decontaminate.flaggedDocs` with corpus =
    * `doc_id % $benchMod <> 0` and bench = `doc_id % $benchMod = 0` over
    * `documents`: (doc_id, n_shared distinct collided n-grams). Shingle
    * hashes are the portable md5 family, replayed verbatim. */
  def decontaminateSql(n: Int, benchMod: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-${n - 2}),
       |    i -> ('0x'||substr(md5(array_to_string(t[i:i+${n - 1}], ' ')),1,15))::BIGINT)) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |ch AS (SELECT doc_id, unnest(sh) AS h FROM shs WHERE doc_id % $benchMod <> 0),
       |bh AS (SELECT DISTINCT unnest(sh) AS h FROM shs WHERE doc_id % $benchMod = 0)
       |SELECT c.doc_id, CAST(count(DISTINCT c.h) AS BIGINT) AS n_shared
       |FROM ch c JOIN bh USING (h) GROUP BY 1""".stripMargin

  /** Twin of the l31 contamination-fraction query: same shingle CTEs as
    * [[decontaminateSql]], but a LEFT join keeps zero-shared docs and the
    * fraction is the matched share of each doc's distinct shingles. */
  def contaminationScoreSql(n: Int, benchMod: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-${n - 2}),
       |    i -> ('0x'||substr(md5(array_to_string(t[i:i+${n - 1}], ' ')),1,15))::BIGINT)) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |ch AS (SELECT doc_id, unnest(sh) AS h FROM shs WHERE doc_id % $benchMod <> 0),
       |bh AS (SELECT DISTINCT unnest(sh) AS h FROM shs WHERE doc_id % $benchMod = 0)
       |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(b.h) AS BIGINT) AS n_shared,
       |  round(CAST(count(b.h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS contamination
       |FROM ch c LEFT JOIN bh b ON c.h = b.h GROUP BY 1""".stripMargin

  /** Twin of the l30 line-dedup query: document frequency per trimmed
    * line, lines in ≥ minDf distinct docs removed everywhere, remaining
    * lines rejoined in order (blank lines kept, md5 of the rebuilt text). */
  def lineDedupSql(minDf: Int): String =
    s"""WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS a
       |  FROM documents WHERE text IS NOT NULL),
       |l AS (SELECT doc_id, unnest(a) AS line, unnest(range(len(a))) AS pos FROM ls),
       |hv AS (SELECT trim(line) AS k FROM l WHERE trim(line) <> ''
       |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= $minDf),
       |kept AS (SELECT doc_id, line, pos FROM l
       |  WHERE trim(line) = '' OR trim(line) NOT IN (SELECT k FROM hv)),
       |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
       |  count(*) AS n_kept FROM kept GROUP BY 1)
       |SELECT b.doc_id, md5(coalesce(a.clean, '')) AS clean_md5,
       |  CAST(len(b.a) AS BIGINT) AS n_lines,
       |  CAST(len(b.a) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
       |FROM ls b LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Twin of the l32 sliding-window chunking query: identical window
    * arithmetic in BIGINT (DuckDB `//` floors like the truncated
    * non-negative Spark division). */
  def slidingWindowsSql(window: Int, stride: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
       |nw AS (SELECT doc_id, toks,
       |  CASE WHEN len(toks) <= $window THEN 1
       |       ELSE (len(toks) - $window + $stride - 1) // $stride + 1 END AS n
       |  FROM t),
       |w AS (SELECT doc_id, unnest(range(n)) AS win_id, toks FROM nw)
       |SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
       |  array_to_string(toks[win_id*$stride + 1 : win_id*$stride + $window], ' ') AS win_text,
       |  CAST(len(toks[win_id*$stride + 1 : win_id*$stride + $window]) AS BIGINT) AS win_tokens
       |FROM w""".stripMargin

  /** Twin of the l33 domain-balance query: replays the exact long
    * floor-division rate arithmetic of
    * [[graft.llm.Sampling.balanceToShares]] in SQL CTEs, then the same
    * basis-point hash keep-decision. `targets` must list the same
    * (stratum → pct) pairs. */
  def balanceToSharesSql(stratumCol: String, weightCol: String,
                         targets: Seq[(String, Int)], seed: String): String = {
    val inList = targets.map { case (s, _) => s"'${OracleSqlUtil.esc(s)}'" }.mkString(", ")
    val pCase = targets.map { case (s, p) =>
      s"WHEN '${OracleSqlUtil.esc(s)}' THEN $p" }.mkString(" ")
    s"""WITH w AS (
       |  SELECT $stratumCol AS s, CAST(SUM($weightCol) AS BIGINT) AS w,
       |    CAST(CASE $stratumCol $pCase END AS BIGINT) AS p
       |  FROM documents WHERE $stratumCol IN ($inList) GROUP BY 1),
       |x AS (SELECT MIN(100 * w // p) AS xs FROM w),
       |bp AS (SELECT s, LEAST(10000, p * xs * 10000 // (100 * w)) AS bp FROM w, x)
       |SELECT d.doc_id, d.$stratumCol AS $stratumCol, CAST(d.$weightCol AS BIGINT) AS $weightCol
       |FROM documents d JOIN bp ON d.$stratumCol = bp.s
       |WHERE ('0x'||substr(md5('${OracleSqlUtil.esc(seed)}' || chr(31) || CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 10000 < bp.bp""".stripMargin
  }

  /** Twin of [[graft.llm.Sampling.temperedMixture]]: per-stratum totals,
    * exact isqrt (IEEE sqrt + one-step fix-up, the same closed form as
    * the Scala side), and the min-over-strata basis-point rate with
    * HUGEINT cross-products mirroring the driver's BigInt arithmetic. */
  def temperedMixtureSql(stratumCol: String, weightCol: String,
                         seed: String): String =
    s"""WITH w AS (
       |  SELECT $stratumCol AS s, CAST(SUM($weightCol) AS BIGINT) AS w
       |  FROM documents WHERE $stratumCol IS NOT NULL GROUP BY 1),
       |r AS (SELECT s, w,
       |    CASE WHEN (r0+1)*(r0+1) <= w THEN r0+1
       |         WHEN r0*r0 > w THEN r0-1 ELSE r0 END AS r
       |  FROM (SELECT s, w,
       |    CAST(floor(sqrt(CAST(w AS DOUBLE))) AS BIGINT) AS r0 FROM w)),
       |bp AS (SELECT a.s,
       |    MIN(CAST(10000 AS HUGEINT) * a.r * b.w // (b.r * a.w)) AS bp
       |  FROM r a, r b GROUP BY 1)
       |SELECT d.doc_id, d.$stratumCol AS $stratumCol,
       |  CAST(d.$weightCol AS BIGINT) AS $weightCol
       |FROM documents d JOIN bp ON d.$stratumCol = bp.s
       |WHERE ('0x'||substr(md5('${OracleSqlUtil.esc(seed)}' || chr(31) || CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 10000 < bp.bp""".stripMargin

  /** Twin of [[graft.llm.Dsir.importanceWeights]] with target =
    * `source = '<targetSource>'`: hashed unigram+bigram buckets
    * (portable md5 hash mod B), add-one smoothed target/raw models, and
    * the per-bucket base-2 log-ratio replayed in the EXACT int64
    * fixed-point recurrence of [[graft.llm.Log2Micro]] (a recursive CTE
    * over the ≤4B distinct factors) — no libm `ln` anywhere, so the
    * compare columns are bit-identical across engines. */
  def dsirSql(nBuckets: Int, targetSource: String): String = {
    val src = OracleSqlUtil.esc(targetSource)
    s"""WITH RECURSIVE tk AS (SELECT doc_id, source,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE length(trim(text)) > 0),
       |fe AS (
       |  SELECT doc_id, source, unnest(t) AS f FROM tk
       |  UNION ALL
       |  SELECT doc_id, source, unnest(list_transform(range(1, len(t)),
       |    i -> array_to_string(t[i:i+1], ' '))) AS f
       |  FROM tk WHERE len(t) >= 2),
       |fb AS (SELECT doc_id, source,
       |    ('0x'||substr(md5(f),1,15))::BIGINT % $nBuckets AS b FROM fe),
       |tm AS (SELECT b, count(*) AS ct FROM fb WHERE source = '$src' GROUP BY 1),
       |tt AS (SELECT count(*) AS tot FROM fb WHERE source = '$src'),
       |rm AS (SELECT b, count(*) AS cr FROM fb GROUP BY 1),
       |rt AS (SELECT count(*) AS tot FROM fb),
       |mdl AS (SELECT rm.b, CAST(COALESCE(tm.ct, 0) + 1 AS BIGINT) AS ct1,
       |    CAST(rm.cr + 1 AS BIGINT) AS cr1,
       |    CAST(rt.tot + $nBuckets AS BIGINT) AS rb,
       |    CAST(tt.tot + $nBuckets AS BIGINT) AS tb
       |  FROM rm LEFT JOIN tm USING (b), tt, rt),
       |ns AS (SELECT DISTINCT n FROM (
       |    SELECT ct1 AS n FROM mdl UNION ALL SELECT cr1 FROM mdl
       |    UNION ALL SELECT rb FROM mdl UNION ALL SELECT tb FROM mdl) u),
       |${graft.llm.Log2Micro.duckSqlCtes("ns")},
       |sc2 AS (SELECT mdl.b, l1.l2m - l2.l2m + l3.l2m - l4.l2m AS s2
       |  FROM mdl
       |  JOIN lg l1 ON l1.n = mdl.ct1 JOIN lg l2 ON l2.n = mdl.cr1
       |  JOIN lg l3 ON l3.n = mdl.rb  JOIN lg l4 ON l4.n = mdl.tb)
       |SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |  CAST(sum(s2) AS BIGINT) AS logw2_micro, sum(s2) > 0 AS selected
       |FROM fb JOIN sc2 USING (b) GROUP BY 1""".stripMargin
  }

  /** Twin of the l34 repeated-span scrub: same string shingles, DF
    * threshold, covered-position expansion, and ordered rebuild. */
  def repeatedSpanScrubSql(n: Int, minDf: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
       |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
       |tok AS (SELECT doc_id, unnest(tk) AS w, unnest(range(len(tk))) AS pos FROM t),
       |sh AS (SELECT doc_id, unnest(range(len(tk) - ${n - 1})) AS spos, tk
       |  FROM t WHERE len(tk) >= $n),
       |sg AS (SELECT doc_id, spos, array_to_string(tk[spos+1 : spos+$n], ' ') AS s FROM sh),
       |hv AS (SELECT s FROM sg GROUP BY 1 HAVING count(DISTINCT doc_id) >= $minDf),
       |cov AS (SELECT DISTINCT g.doc_id, g.spos + r.range AS pos
       |  FROM sg g JOIN hv USING (s) CROSS JOIN range(0, $n) r),
       |kept AS (SELECT k.doc_id, k.w, k.pos FROM tok k
       |  LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos
       |  WHERE c.pos IS NULL),
       |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean,
       |  count(*) AS n_kept FROM kept GROUP BY 1)
       |SELECT t.doc_id, md5(coalesce(a.clean, '')) AS clean_md5,
       |  CAST(len(t.tk) AS BIGINT) AS n_tokens,
       |  CAST(len(t.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
       |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Exact twin of the l26 PII-scrub query: synthetic PII appended from
    * doc_id, then the identical Java∩RE2 replace chain. */
  def piiScrubSql: String = {
    // single-quoted SQL literals pass backslashes through verbatim, so the
    // Scala pattern strings interpolate unchanged
    val email = graft.llm.TextOps.EmailPattern
    val phone = graft.llm.TextOps.PhonePattern
    s"""WITH syn AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com or +1 (555) 010-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(s, '${OracleSqlUtil.esc(email)}', '<EMAIL>', 'g'),
       |    '${OracleSqlUtil.esc(phone)}', '<PHONE>', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(s, '${OracleSqlUtil.esc(email)}'))
       |    + len(regexp_extract_all(s, '${OracleSqlUtil.esc(phone)}')) AS BIGINT) AS n_pii
       |FROM syn""".stripMargin
  }

  /** Exact twin of `RepetitionStats.repetitionStats` over `documents`:
    * (doc_id, top_token_frac, top_bigram_frac, uniq_token_frac). Empty
    * split tokens are excluded from token stats but kept in the bigram
    * stream, and token-less docs are absent — all mirrored from the Spark
    * side's filter placement. */
  def repetitionStatsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |tokf AS (
       |  SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest(t) AS g FROM toks)
       |  WHERE length(g) > 0 GROUP BY 1, 2),
       |toka AS (
       |  SELECT doc_id,
       |    round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_frac,
       |    round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS uniq_token_frac
       |  FROM tokf GROUP BY 1),
       |bigf AS (
       |  SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
       |        FROM toks WHERE len(t) >= 2)
       |  GROUP BY 1, 2),
       |biga AS (
       |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac
       |  FROM bigf GROUP BY 1)
       |SELECT t.doc_id, t.top_token_frac, b.top_bigram_frac, t.uniq_token_frac
       |FROM toka t LEFT JOIN biga b USING (doc_id)""".stripMargin

  /** Exact twin of `NgramLangId.langIdNgram(col("text"))` over
    * `documents`: (doc_id, pred_lang). Langs are scored in sorted order
    * and ties resolve to the first (smallest) code via `>=` chaining. */
  def langIdNgramSql: String = {
    val langs = NgramLangId.Langs // sorted
    val scores = langs.map { l =>
      s"""coalesce(list_sum(list_transform(tgs, t -> ${weightCase(l)})), 0) AS ${l}_s"""
    }.mkString(",\n  ")
    // argmax with smallest-code-wins ties: lang i wins when >= all later
    val all = langs.map(l => s"${l}_s")
    val arms = langs.init.zipWithIndex.map { case (l, i) =>
      val later = all.drop(i + 1).map(o => s"${l}_s >= $o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH t0 AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |tg AS (
       |  SELECT doc_id, CASE WHEN length(s) < 3 THEN []::VARCHAR[]
       |    ELSE list_transform(range(1, length(s)-1), i -> s[i:i+2]) END AS tgs
       |  FROM t0),
       |sc AS (
       |  SELECT doc_id,
       |  $scores
       |  FROM tg)
       |SELECT doc_id, CASE
       |    WHEN greatest(${all.mkString(", ")}) <= 0 THEN 'und'
       |    $arms
       |    ELSE '${langs.last}' END AS pred_lang
       |FROM sc""".stripMargin
  }

  /** Exact twin of [[graft.llm.TextOps.fimTransform]] over `documents` —
    * l42_fim_transform. Cut arithmetic, slice bounds, and the PSM
    * serialization are replayed exactly; DuckDB list slicing is 1-based
    * inclusive (`tk[1:lo]` = Spark `slice(tk, 1, lo)`). */
  def fimTransformSql(seed: String, minTokens: Int): String = {
    val esc = OracleSqlUtil.esc(seed)
    def cut(arm: String) =
      s"('0x'||substr(md5('$esc' || chr(31) || '$arm' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT % (len(tk)+1)"
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
       |c AS (SELECT doc_id, tk, len(tk) AS n,
       |    ${cut("a")} AS h1,
       |    ${cut("b")} AS h2
       |  FROM t),
       |d AS (SELECT doc_id, tk, n,
       |    CASE WHEN n < $minTokens THEN n ELSE least(h1, h2) END AS lo,
       |    CASE WHEN n < $minTokens THEN n ELSE greatest(h1, h2) END AS hi
       |  FROM c)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  CAST(lo AS BIGINT) AS cut_lo, CAST(hi AS BIGINT) AS cut_hi,
       |  md5('<PRE>' || (CASE WHEN lo < 1 THEN '' ELSE array_to_string(tk[1:lo], ' ') END)
       |    || '<SUF>' || (CASE WHEN hi + 1 > n THEN '' ELSE array_to_string(tk[hi+1:n], ' ') END)
       |    || '<MID>' || (CASE WHEN lo + 1 > hi THEN '' ELSE array_to_string(tk[lo+1:hi], ' ') END)) AS fim_md5
       |FROM d""".stripMargin
  }

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

  /**
   * Oracle for l47: the same doc_id-keyed augmentation (decomposed
   * combining sequences / control characters / an already-clean tail),
   * then DuckDB's `nfc_normalize` + the identical RE2 regex steps.
   * Combining marks ride as REAL UTF-8 in the generated SQL; control
   * characters are spliced with `chr()` so the SQL stays printable. Both
   * `regexp_replace` calls need the 'g' flag — DuckDB replaces only the
   * first match by default, Spark replaces all.
   */
  def normalizeTextSql: String = {
    val acute = "\u0301"; val ring = "\u030A"; val uml = "\u0308"
    s"""WITH aug AS (
       |  SELECT doc_id, concat_ws(' ', text,
       |    CASE CAST(doc_id % 4 AS INTEGER)
       |      WHEN 0 THEN 'cafe$acute touche$acute'
       |      WHEN 1 THEN 'A${ring}ngstro${uml}m'
       |      WHEN 2 THEN 'bad'||chr(7)||'ctl'||chr(31)||'tail'
       |      ELSE 'plain tail' END) AS raw
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, raw,
       |    regexp_replace(
       |      regexp_replace(nfc_normalize(raw),
       |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |      '[ \\t]+', ' ', 'g') AS norm_text
       |  FROM aug)
       |SELECT doc_id, norm_text, norm_text <> raw AS changed FROM n""".stripMargin
  }

  /**
   * Oracle for l49: prompt/response derived from the fixture exactly as
   * the Spark row does, then the identical template concatenation. The
   * role tags are interpolated from [[graft.llm.TextOps]]'s constants
   * (newlines spliced as `chr(10)` to keep the SQL printable), so the
   * mask arithmetic can never skew between the two sides.
   */
  def sftTemplateSql(systemPrompt: String): String = {
    def tag(s: String): String =
      "'" + esc(s).replace("\n", "'||chr(10)||'") + "'"
    val preTags = tag(graft.llm.TextOps.SftSystemTag + systemPrompt +
      graft.llm.TextOps.SftUserTag)
    val asst = tag(graft.llm.TextOps.SftAssistantTag)
    val end = tag(graft.llm.TextOps.SftEndTag)
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
       |  FROM documents),
       |pr AS (
       |  SELECT doc_id, array_to_string(tk[1:8], ' ') AS prompt,
       |    array_to_string(tk[9:], ' ') AS resp
       |  FROM t),
       |r AS (
       |  SELECT doc_id, $preTags || prompt || $asst AS pre, resp FROM pr)
       |SELECT doc_id, md5(pre || resp || $end) AS rendered_md5,
       |  CAST(length(pre) AS BIGINT) AS mask_start,
       |  CAST(length(resp) AS BIGINT) AS mask_len
       |FROM r""".stripMargin
  }

  /** Exact twin of [[graft.llm.Sketch.bloomDecontaminate]] with corpus =
    * `doc_id % benchMod <> 0`, bench = `doc_id % benchMod = 0` (the l25
    * split): the same portable-hash Bloom positions, so every per-doc
    * flagged count — INCLUDING the filter's false positives — replays
    * exactly. */
  def bloomDecontaminateSql(n: Int, benchMod: Int, k: Int, m: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-${n - 2}),
       |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |cs AS (SELECT doc_id, unnest(sh) AS s FROM shs WHERE doc_id % $benchMod <> 0),
       |bs AS (SELECT DISTINCT unnest(sh) AS s FROM shs WHERE doc_id % $benchMod = 0),
       |bbits AS (SELECT DISTINCT
       |    ('0x'||substr(md5('bloom'||t.r||chr(31)||s),1,15))::BIGINT % $m AS pos
       |  FROM bs CROSS JOIN range(0, $k) t(r)),
       |arms AS (SELECT doc_id, ('0x'||substr(md5(s),1,15))::BIGINT AS h,
       |    ('0x'||substr(md5('bloom'||t.r||chr(31)||s),1,15))::BIGINT % $m AS pos
       |  FROM cs CROSS JOIN range(0, $k) t(r)),
       |per AS (SELECT doc_id, h,
       |    min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS hit
       |  FROM arms a LEFT JOIN bbits b ON a.pos = b.pos GROUP BY 1, 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(hit) AS BIGINT) AS n_flagged
       |FROM per GROUP BY 1""".stripMargin

  /** Exact twin of [[graft.llm.TextOps.spanCorrupt]]: the same
    * (seed, doc, position) mask decisions, lag-based run starts,
    * running-sum sentinel numbering, and ordered rebuild — every
    * sentinel boundary replays bit-for-bit. */
  def spanCorruptSql(maskPct: Int, seed: String): String = {
    val s = esc(seed)
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(tk) AS w, unnest(range(len(tk))) AS pos FROM t),
       |mk AS (SELECT doc_id, w, pos,
       |    (('0x'||substr(md5('$s'||chr(31)||CAST(doc_id AS VARCHAR)
       |      ||':'||CAST(pos AS VARCHAR)),1,15))::BIGINT % 100 < $maskPct) AS m
       |  FROM tok),
       |rn AS (SELECT *, m AND NOT coalesce(
       |    lag(m) OVER (PARTITION BY doc_id ORDER BY pos), false) AS rs FROM mk),
       |sd AS (SELECT *, CAST(sum(CASE WHEN rs THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS sid FROM rn),
       |pieces AS (SELECT doc_id, pos, m, rs, sid,
       |    CASE WHEN NOT m THEN w
       |         WHEN rs THEN '<extra_id_'||sid||'>' END AS ip,
       |    CASE WHEN rs THEN '<extra_id_'||sid||'> '||w
       |         WHEN m THEN w END AS tp
       |  FROM sd),
       |agg AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       |    CAST(max(sid) + 1 AS BIGINT) AS n_spans,
       |    string_agg(ip, ' ' ORDER BY pos) AS itext,
       |    string_agg(tp, ' ' ORDER BY pos) AS ttext
       |  FROM pieces GROUP BY 1)
       |SELECT doc_id, COALESCE(itext, '') AS input_text,
       |  CASE WHEN n_spans > 0 THEN ttext||' <extra_id_'||n_spans||'>'
       |       ELSE '' END AS target_text,
       |  n_tokens, n_masked, n_spans
       |FROM agg""".stripMargin
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

  /** Exact twin of the l90 registry row: the l4 quality score feeding
    * fixed-threshold phases, hash shards, and dense per-(phase, shard)
    * positions ([[graft.llm.Sampling.curriculumSchedule]]). */
  def curriculumSql(thresholds: Seq[Double], nShards: Int, seed: String): String = {
    val s = esc(seed)
    val phaseCase = thresholds.zipWithIndex
      .map { case (t, i) => s"WHEN q >= $t THEN ${i + 1}" }
      .mkString(" ")
    s"""WITH t AS (SELECT doc_id,
       |  CAST(length(text) AS DOUBLE) AS n_chars,
       |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS n_words,
       |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS n_punct
       |  FROM documents),
       |q AS (SELECT doc_id, round(least(n_chars/200.0, 1.0) * (1.0 - n_punct/greatest(n_chars, 1.0))
       |  * (0.5 + 0.5*least((n_chars/greatest(n_words, 1.0))/8.0, 1.0)), 6) AS q FROM t),
       |ph AS (SELECT doc_id,
       |    CAST(CASE $phaseCase ELSE ${thresholds.size + 1} END AS BIGINT) AS phase,
       |    ('0x'||substr(md5('$s'||chr(31)||CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
       |  FROM q)
       |SELECT doc_id, phase, CAST(h % $nShards AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY phase, h % $nShards
       |    ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM ph""".stripMargin
  }

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

  /** Exact twin of the l91 registry row: deterministic obfuscated-term
    * augmentation, the shared leet `translate` fold, and word-boundary
    * blocklist counts (patterns in the Java∩RE2 subset). */
  def obfuscationBlocklistSql(terms: Seq[String]): String = {
    val from = esc(graft.llm.TextOps.LeetFrom)
    val to = esc(graft.llm.TextOps.LeetTo)
    val hitSum = terms.map(t =>
      s"len(regexp_extract_all(folded, '\\b${esc(t)}\\b'))").mkString(" + ")
    s"""WITH aug AS (SELECT doc_id, text || ' ' ||
       |    CASE CAST(doc_id % 4 AS INTEGER)
       |      WHEN 0 THEN 'j01n h4sh' WHEN 1 THEN '$$can t4ble'
       |      WHEN 2 THEN 'gr0up 0rder' ELSE 'plain r0w' END AS raw
       |  FROM documents),
       |f AS (SELECT doc_id, translate(lower(raw), '$from', '$to') AS folded FROM aug)
       |SELECT doc_id, md5(folded) AS folded_md5,
       |  CAST($hitSum AS BIGINT) AS n_hits
       |FROM f""".stripMargin
  }
}
