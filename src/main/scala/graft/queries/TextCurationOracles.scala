package graft.queries

import graft.llm.NgramLangId

/**
 * DuckDB oracle SQL — the text CURATION/GOVERNANCE half of the former
 * monolithic TextOracles (round-10 file split, pure move, no behavior
 * change): decontamination, line dedup, windowing, mixture balancing,
 * DSIR, scrubbing, repetition stats, language ID, FIM/span-corrupt
 * transforms, SFT templating, curriculum scheduling, and the
 * obfuscation blocklist.
 */
private[queries] trait TextCurationOracles extends TextOracleSqlBase {


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

  /** l125 twin: DoReMi-style multiplicative-weights domain reweighting,
    * rounds UNROLLED into chained CTEs (an aggregate per round is not
    * expressible inside one recursive CTE term), every step the exact
    * integer/HUGEINT floor arithmetic of `DomainReweight.doremiWeights`. */
  def doremiWeightsSql(domainCol: String, valueCol: String, rounds: Int,
                       etaBp: Long, alphaBp: Long): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = if (r == 1) "w0" else s"w${r - 1}"
      s"""u$r AS (SELECT m.domain, p.w * m.mult AS u FROM $prev p JOIN m ON m.domain = p.domain),
         |t$r AS (SELECT sum(u) AS su FROM u$r),
         |w$r AS (SELECT domain, (CAST(1000000 AS HUGEINT) * u) // su AS w FROM u$r, t$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT $domainCol AS domain, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum($valueCol) AS BIGINT) AS s
       |  FROM documents WHERE $domainCol IS NOT NULL GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
       |    CAST(count(*) AS BIGINT) AS k FROM d),
       |rel AS (SELECT domain, n,
       |    CAST((CAST(1000000 AS HUGEINT) * (CAST(s AS HUGEINT) * nn - CAST(ss AS HUGEINT) * n))
       |      // (CAST(ss AS HUGEINT) * n) AS BIGINT) AS rel
       |  FROM d, t),
       |m AS (SELECT domain, n, rel,
       |    greatest(CAST(10000 AS HUGEINT),
       |      CAST(1000000 AS HUGEINT) + ($etaBp * rel) // 10000) AS mult
       |  FROM rel),
       |w0 AS (SELECT domain, CAST(1000000 AS HUGEINT) AS w FROM m),
       |$roundCtes
       |SELECT m.domain, m.n AS n_docs, m.rel AS rel_excess_micro,
       |  CAST(((${10000 - alphaBp} * w.w) // 10000
       |    + ($alphaBp * CAST(1000000 AS HUGEINT)) // (10000 * t.k)) AS BIGINT)
       |    AS weight_micro
       |FROM w$rounds w JOIN m ON m.domain = w.domain, t""".stripMargin
  }
}
