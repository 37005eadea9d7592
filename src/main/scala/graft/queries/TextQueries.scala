package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdw, tdEventsUs}

/**
 * Text-analysis-family registry rows (split from LlmQueries, round 9 —
 * pure mechanical move, registry content unchanged): token counting, the
 * BPE tokenizer family, lang-id, quality scoring + classifier,
 * decontamination, chunking, sampling/balancing/capping, epoch shuffle,
 * FIM, surprisal, TF-IDF/BM25/inverted index, CMS, entropy, dropout,
 * SFT templating, URL filtering, Unicode normalization, and the
 * composed curation funnel (l51).
 */
object TextQueries {

  val all: Seq[(String, Q)] = Seq(
    // language-ID heuristic: argmax of per-language stopword hits
    "l3_lang_id" -> Q(
      (s, dir) => tdw(s, dir, "documents").select(
        col("doc_id"), TextOps.langIdHeuristic(col("text")).as("pred_lang")),
      Some("""WITH h AS (SELECT doc_id,
             |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t IN ('der','die','das','und','ist','ein'))) AS de_h,
             |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t IN ('the','a','and','of','to','in','is'))) AS en_h,
             |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t IN ('el','la','los','y','es','un'))) AS es_h,
             |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t IN ('le','la','les','et','est','un'))) AS fr_h
             |  FROM documents)
             |SELECT doc_id, CASE
             |  WHEN greatest(de_h, en_h, es_h, fr_h) = 0 THEN 'und'
             |  WHEN fr_h >= es_h AND fr_h >= en_h AND fr_h >= de_h THEN 'fr'
             |  WHEN es_h >= en_h AND es_h >= de_h THEN 'es'
             |  WHEN en_h >= de_h THEN 'en'
             |  ELSE 'de' END AS pred_lang FROM h""".stripMargin)),

    // char-trigram-profile language ID (Cavnar–Trenkle weights): catches
    // languages even when function words are absent; profiles interpolated
    // into the oracle from the same Scala constants
    "l24_lang_id_ngram" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), graft.llm.NgramLangId.langIdNgram(col("text")).as("pred_lang")),
      Some(TextOracles.langIdNgramSql)),

    // benchmark decontamination: corpus docs sharing 5-grams with the
    // held-out "benchmark" slice (every 50th doc) — broadcast-hash check,
    // portable md5 shingle hashes so the oracle replays it exactly
    "l25_decontaminate" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
        graft.llm.Decontaminate.flaggedDocs(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 5)
      },
      Some(TextOracles.decontaminateSql(n = 5, benchMod = 50))),

    // contamination fraction: matched share of each doc's distinct
    // 5-gram shingles vs the benchmark slice — zero-shared docs included
    // (a release gate needs the zeros); same broadcast shape as l25
    "l31_contamination_score" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
        graft.llm.Decontaminate.contaminationScore(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 5)
      },
      Some(TextOracles.contaminationScoreSql(n = 5, benchMod = 50))),

    // sliding token-window chunking (RAG / context-window prep): 64-token
    // windows, stride 48 — expression-only windows + one posexplode, no
    // shuffle; the oracle replays the window arithmetic in BIGINT
    "l32_doc_chunking" -> Q(
      (s, dir) => TextOps.slidingWindows(
        td(s, dir, "documents"), "doc_id", "text",
        windowTokens = 64, strideTokens = 48),
      Some(TextOracles.slidingWindowsSql(window = 64, stride = 48))),

    // domain-mixture balancing: down-sample sources so output char-weight
    // shares hit the target mix (40/40/20 over three sources; the rest
    // drop). Driver-side per-stratum totals are bounded by the mix size;
    // rates are exact long floor-division basis points the oracle replays
    "l33_domain_balance" -> Q(
      (s, dir) => graft.llm.Sampling.balanceToShares(
          td(s, dir, "documents"), "doc_id", "source", "n_chars",
          targetPct = Map("src0" -> 40, "src1" -> 40, "src2" -> 20))
        .select(col("doc_id"), col("source"), col("n_chars")),
      Some(TextOracles.balanceToSharesSql("source", "n_chars",
        targets = Seq("src0" -> 40, "src1" -> 40, "src2" -> 20), seed = "s1")),
      eager = true),

    // temperature-flattened mixture (T = 2): output char-weight shares
    // ∝ √(per-source chars) — the tail-source up-weighting knob of a
    // multilingual/multi-source training mix. √ because IEEE sqrt is
    // exact cross-engine where pow is not; the oracle replays the isqrt
    // fix-up and the HUGEINT min-rate arithmetic verbatim
    "l63_tempered_mixture" -> Q(
      (s, dir) => graft.llm.Sampling.temperedMixture(
          td(s, dir, "documents"), "doc_id", "source", "n_chars", seed = "t2")
        .select(col("doc_id"), col("source"), col("n_chars")),
      Some(TextOracles.temperedMixtureSql("source", "n_chars", seed = "t2")),
      eager = true),

    // T=2 token-budget plan: per-source allocation of a 10⁹-token budget
    // with shares ∝ √w — the planning table l63's filter realizes, plus
    // repeat factors. Fully distributed (expression-side isqrt fix-up,
    // broadcast Σr, DECIMAL/HUGEINT exact floored allocation)
    "l79_token_budget_plan" -> Q(
      (s, dir) => graft.llm.Sampling.tokenBudgetPlan(
        td(s, dir, "documents"), "source", "n_chars", budget = 1000000000L),
      Some("""WITH w AS (SELECT source AS stratum, CAST(SUM(n_chars) AS BIGINT) AS w
             |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
             |r AS (SELECT stratum, w,
             |    CASE WHEN (r0+1)*(r0+1) <= w THEN r0+1
             |         WHEN r0*r0 > w THEN r0-1 ELSE r0 END AS r
             |  FROM (SELECT stratum, w,
             |    CAST(floor(sqrt(CAST(w AS DOUBLE))) AS BIGINT) AS r0 FROM w)),
             |t AS (SELECT CAST(SUM(r) AS BIGINT) AS rsum FROM r)
             |SELECT stratum, w AS tokens_available, CAST(r AS BIGINT) AS r,
             |  CAST(CAST(1000000000 AS HUGEINT) * r // rsum AS BIGINT) AS allocated_tokens,
             |  round(CAST(CAST(1000000000 AS HUGEINT) * r // rsum AS DOUBLE) / w, 6) AS repeat_factor
             |FROM r, t""".stripMargin)),

    // l125 — DoReMi-style domain reweighting (Xie et al. 2023):
    // multiplicative-weights updates over per-domain relative excess,
    // uniform smoothing, ALL exact integer/HUGEINT floor arithmetic (the
    // linear 1+η·excess multiplier is exp's first-order form — no libm).
    // One corpus hash-agg; the recurrence runs on the ≤|domains| table
    // driver-side (trainer-table precedent); oracle unrolls the rounds
    "l125_doremi_weights" -> Q(
      (s, dir) => graft.llm.DomainReweight.doremiWeights(
        td(s, dir, "documents"), "source", "n_chars",
        rounds = 4, etaBp = 100L, alphaBp = 200L),
      Some(TextOracles.doremiWeightsSql("source", "n_chars",
        rounds = 4, etaBp = 100L, alphaBp = 200L)),
      eager = true),

    // DSIR importance resampling (Xie 2023): raw corpus scored against a
    // target domain (source='src0') via hashed unigram+bigram models —
    // log2 p_target/p_raw per doc in EXACT int64 fixed-point micro-units
    // (graft_log2micro; no libm ln — the l104 round-9 ULP lesson),
    // selected = logw2_micro>0. Models are B-bounded broadcasts; the
    // oracle replays the identical integer recurrence as a recursive CTE
    "l64_dsir_importance" -> Q(
      (s, dir) => {
        val docs = tdw(s, dir, "documents")
        graft.llm.Dsir.importanceWeights(
          docs, docs.filter(col("source") === "src0"),
          "doc_id", "text", nBuckets = 1024)
      },
      Some(TextOracles.dsirSql(nBuckets = 1024, targetSource = "src0"))),

    // HTML → text extraction: doc text wrapped in a deterministic page
    // template (head/style/script/comment boilerplate, nav div, entity-
    // encoded tail), then the fixed strip chain — script/style/comment
    // removal, block tags → newlines, tag strip, single-pass entity
    // decode, whitespace normalize. Compared via md5 + length so rows
    // stay small; the oracle replays template AND chain verbatim
    "l65_html_strip" -> Q(
      (s, dir) => {
        val d = col("doc_id")
        val html = concat(
          lit("<html><HEAD><title>T</title><style>body { color: red; }</style></HEAD>\n"),
          lit("<body><div class=\"nav\">Home | About | Doc "), d.cast("string"),
          lit("</div><!-- id "), d.cast("string"), lit(" -->\n"),
          lit("<p>"), col("text"), lit("</p>\n"),
          lit("<script type=\"text/javascript\">var x = "), d.cast("string"),
          lit("; if (x < 2) { x = x && 1; }</script>\n"),
          lit("<p>&quot;tail&quot; &amp; more&nbsp;here</p></body></html>"))
        tdw(s, dir, "documents")
          .select(d, TextOps.stripHtml(html).as("c"))
          .select(col("doc_id"), md5(col("c").cast("binary")).as("clean_md5"),
            length(col("c")).cast("long").as("n_chars_clean"))
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><HEAD><title>T</title><style>body { color: red; }</style></HEAD>' || chr(10) ||
             |  '<body><div class="nav">Home | About | Doc ' || CAST(doc_id AS VARCHAR) ||
             |  '</div><!-- id ' || CAST(doc_id AS VARCHAR) || ' -->' || chr(10) ||
             |  '<p>' || text || '</p>' || chr(10) ||
             |  '<script type="text/javascript">var x = ' || CAST(doc_id AS VARCHAR) ||
             |  '; if (x < 2) { x = x && 1; }</script>' || chr(10) ||
             |  '<p>&quot;tail&quot; &amp; more&nbsp;here</p></body></html>' AS html
             |  FROM documents),
             |s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script\b[^>]*>.*?</script>', '', 'g') AS t FROM h),
             |s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<style\b[^>]*>.*?</style>', '', 'g') AS t FROM s1),
             |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', '', 'g') AS t FROM s2),
             |s4 AS (SELECT doc_id, regexp_replace(t, '(?i)</?(p|div|br|li|tr|h[1-6])\b[^>]*>', chr(10), 'g') AS t FROM s3),
             |s5 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', '', 'g') AS t FROM s4),
             |e1 AS (SELECT doc_id, regexp_replace(t, '&nbsp;', ' ', 'g') AS t FROM s5),
             |e2 AS (SELECT doc_id, regexp_replace(t, '&lt;', '<', 'g') AS t FROM e1),
             |e3 AS (SELECT doc_id, regexp_replace(t, '&gt;', '>', 'g') AS t FROM e2),
             |e4 AS (SELECT doc_id, regexp_replace(t, '&quot;', '"', 'g') AS t FROM e3),
             |e5 AS (SELECT doc_id, regexp_replace(t, '&#39;', '''', 'g') AS t FROM e4),
             |e6 AS (SELECT doc_id, regexp_replace(t, '&amp;', '&', 'g') AS t FROM e5),
             |w1 AS (SELECT doc_id, regexp_replace(t, '[ \t\r]+', ' ', 'g') AS t FROM e6),
             |w2 AS (SELECT doc_id, regexp_replace(t, ' ?\n ?', chr(10), 'g') AS t FROM w1),
             |w3 AS (SELECT doc_id, regexp_replace(t, '\n+', chr(10), 'g') AS t FROM w2),
             |w4 AS (SELECT doc_id, trim(regexp_replace(t, '^\n+|\n+$', '', 'g')) AS t FROM w3)
             |SELECT doc_id, md5(t) AS clean_md5,
             |  CAST(length(t) AS BIGINT) AS n_chars_clean FROM w4""".stripMargin)),

    // PII scrubbing: synthetic emails/phones appended from doc_id, then
    // the Java∩RE2 replace chain — redaction + count, exact twin in SQL
    "l26_pii_scrub" -> Q(
      (s, dir) => {
        val syn = concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1 (555) 010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        tdw(s, dir, "documents").select(
          col("doc_id"),
          graft.llm.TextOps.scrubPii(syn).as("scrubbed"),
          graft.llm.TextOps.piiCount(syn).as("n_pii"))
      },
      Some(TextOracles.piiScrubSql)),

    // packed bins materialized into training SEQUENCES: texts joined in
    // id order with the <doc> boundary marker; compared via md5 so rows
    // stay small
    "l29_pack_materialize" -> Q(
      (s, dir) => graft.llm.Packing.materializeBins(
          td(s, dir, "documents"), "doc_id", "text",
          binCapacity = 512L, chunkSize = 32L)
        .select(col("chunk"), col("bin"), md5(col("seq_text")).as("seq_md5"),
          col("n_docs"), col("total_tokens")),
      Some(BpeOracles.packMaterializeSql(graft.llm.Bpe.DefaultMerges,
        binCapacity = 512L, chunkSize = 32L, docSep = " <doc> "))),

    // deterministic stratified sampling: keep-decision is a pure function
    // of (seed, key) — reproducible across runs/engines/retries, unlike
    // df.sample's RNG; per-stratum rates downsample dominant event types
    "l28_stratified_sample" -> Q(
      (s, dir) => graft.llm.Sampling.stratifiedSample(
        td(s, dir, "events"), "event_id", "event_type",
        rates = Map("click" -> 25, "view" -> 10, "purchase" -> 100, "error" -> 50))
        .select(col("event_id"), col("event_type")),
      Some("""SELECT event_id, event_type FROM events
             |WHERE ('0x'||substr(md5('s1' || chr(31) || CAST(event_id AS VARCHAR)),1,15))::BIGINT % 100 <
             |  CASE event_type WHEN 'click' THEN 25 WHEN 'view' THEN 10
             |    WHEN 'purchase' THEN 100 WHEN 'error' THEN 50 ELSE 0 END""".stripMargin)),

    // l122 — MERGEABLE bottom-k uniform sample (KMV idiom, Bar-Yossef et
    // al. 2002): per stratum, the k keys with the smallest seeded hash —
    // a fixed-size eval panel where l28 keeps a corpus-growing fraction.
    // bottom-k(A∪B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) (spec'd), and
    // the rank<=k window filter plans as WindowGroupLimit: per-partition
    // partial top-k before the stratum exchange — no global sort
    "l122_bottomk_sample" -> Q(
      (s, dir) => graft.llm.Sampling.bottomKSample(
        td(s, dir, "events"), "event_id", "event_type", k = 20),
      Some("""WITH h AS (SELECT DISTINCT event_type AS stratum,
             |    CAST(event_id AS BIGINT) AS key,
             |    ('0x'||substr(md5('s1' || chr(31) || CAST(event_id AS VARCHAR)),1,15))::BIGINT AS _h
             |  FROM events),
             |r AS (SELECT stratum, key,
             |    CAST(row_number() OVER (PARTITION BY stratum ORDER BY _h, key) AS BIGINT) AS rk
             |  FROM h)
             |SELECT stratum, key, rk FROM r WHERE rk <= 20""".stripMargin)),

    // l124 — KMV distinct estimate from the l122 bottom-k panel
    // (Bar-Yossef et al. 2002: distinct ≈ (k−1)·2⁶⁰ / h_k): the
    // quantile-based cardinality sketch next to a40's register-based
    // HLL — the panel doubles as the sketch for free. Exact integer
    // floor-quotient (the a40 DECIMAL remainder trick) so the estimate
    // itself hash-compares; under-k strata report their exact size.
    // events has ~250k distinct ids per type at sf0.1, k=64 → ~12% rsd
    "l124_kmv_distinct" -> Q(
      (s, dir) => graft.llm.Sampling.kmvDistinctEstimate(
        td(s, dir, "events"), "event_id", "event_type", k = 64),
      Some(s"""WITH h AS (SELECT DISTINCT event_type AS stratum,
             |    CAST(event_id AS VARCHAR) AS key,
             |    ('0x'||substr(md5('s1' || chr(31) || CAST(event_id AS VARCHAR)),1,15))::BIGINT AS _h
             |  FROM events),
             |r AS (SELECT stratum, _h,
             |    row_number() OVER (PARTITION BY stratum ORDER BY _h, key) AS rk
             |  FROM h),
             |p AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_panel,
             |    CAST(max(_h) AS BIGINT) AS kth_hash
             |  FROM r WHERE rk <= 64 GROUP BY 1)
             |SELECT stratum, n_panel, kth_hash,
             |  CAST(CASE WHEN n_panel < 64 THEN n_panel
             |    ELSE CAST('${(BigInt(63) * (BigInt(1) << 60))}' AS HUGEINT) // kth_hash
             |  END AS BIGINT) AS est_distinct
             |FROM p""".stripMargin)),

    // Gopher-style repetition quality filters: top-token / top-bigram /
    // unique-token fractions per doc — two relational hash-aggs, no
    // per-row array lambdas
    "l27_repetition_filters" -> Q(
      (s, dir) => graft.llm.RepetitionStats.repetitionStats(
        tdw(s, dir, "documents"), "doc_id", "text"),
      Some(TextOracles.repetitionStatsSql)),

    // quality scoring: length/punctuation/word-shape composite
    "l4_quality_score" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), TextOps.qualityScore(col("text")).as("quality")),
      Some("""WITH t AS (SELECT doc_id,
             |  CAST(length(text) AS DOUBLE) AS n_chars,
             |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS n_words,
             |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct
             |  FROM documents)
             |SELECT doc_id, round(least(n_chars/200.0, 1.0) * (1.0 - n_punct/greatest(n_chars, 1.0))
             |  * (0.5 + 0.5*least((n_chars/greatest(n_words, 1.0))/8.0, 1.0)), 6) AS quality FROM t""".stripMargin)),

    // l114 — Flesch-Kincaid readability (Kincaid 1975): word / sentence /
    // vowel-group-syllable counts per doc, grade + reading-ease in EXACT
    // integer micro-units over one common-denominator rational with
    // sign-split division (no doubles — the a25/l89 ULP rule).
    // Expression-only over the scan, zero shuffles
    "l114_readability" -> Q(
      (s, dir) => graft.llm.CorpusStats.readabilityStats(
        tdw(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH b AS (SELECT doc_id, lower(trim(text)) AS t
             |  FROM documents WHERE length(trim(text)) > 0),
             |c AS (SELECT doc_id,
             |    CAST(len(regexp_split_to_array(t, '\s+')) AS BIGINT) AS w,
             |    greatest(1, CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT)) AS s,
             |    CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT)
             |      + CAST(len(list_filter(regexp_split_to_array(t, '\s+'),
             |          x -> NOT regexp_matches(x, '[aeiouy]'))) AS BIGINT) AS y
             |  FROM b),
             |n AS (SELECT doc_id, w, s, y,
             |    390000*w*w + 11800000*y*s - 15590000*s*w AS gnum,
             |    206835000*s*w - 1015000*w*w - 84600000*y*s AS en,
             |    s*w AS den
             |  FROM c)
             |SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
             |  CAST(CASE WHEN gnum < 0 THEN -((-gnum) // den)
             |       ELSE gnum // den END AS BIGINT) AS fk_grade_micro,
             |  CAST(CASE WHEN en < 0 THEN -((-en) // den)
             |       ELSE en // den END AS BIGINT) AS ease_micro
             |FROM n""".stripMargin)),

  )
}
