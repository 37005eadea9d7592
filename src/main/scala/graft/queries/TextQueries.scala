package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdEventsUs}

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
      (s, dir) => td(s, dir, "documents").select(
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
        val docs = td(s, dir, "documents")
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
        td(s, dir, "documents")
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
        td(s, dir, "documents").select(
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
        td(s, dir, "documents"), "doc_id", "text"),
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
        td(s, dir, "documents"), "doc_id", "text"),
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

    // inverted index: per-token df / total tf / first-20 doc:tf postings,
    // hapax pruned at df >= 5; postings capped by a bounded window rank,
    // never an unbounded collect_list
    "l39_inverted_index" -> Q(
      (s, dir) => graft.llm.Index.invertedIndex(
        td(s, dir, "documents"), "doc_id", "text", minDf = 5, maxPostings = 20),
      Some(TextOracles.invertedIndexSql(minDf = 5, maxPostings = 20))),

    // BM25 ranked retrieval for a 4-term probe query: Robertson idf + tf
    // saturation, per-term contributions rounded to 6 dp and summed in
    // DECIMAL(18,6) (order-independent), global top-25
    "l40_bm25_topk" -> Q(
      (s, dir) => graft.llm.Index.bm25TopK(
        td(s, dir, "documents"), "doc_id", "text",
        terms = Seq("join", "vector", "filter", "merge"), topK = 25),
      Some(TextOracles.bm25TopKSql(
        terms = Seq("join", "vector", "filter", "merge"), topK = 25))),

    // deterministic epoch shuffle: hash-order training permutation +
    // 4-shard assignment as a pure function of (seed, doc_id) — rerunning
    // a crashed epoch reproduces the identical order (orderBy(rand())
    // cannot); one exchange + per-shard sort
    "l41_epoch_shuffle" -> Q(
      (s, dir) => graft.llm.Sampling.epochShuffle(
        td(s, dir, "documents"), "doc_id", nShards = 4, seed = "e1"),
      Some("""WITH h AS (SELECT doc_id,
             |    ('0x'||substr(md5('e1' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hv
             |  FROM documents)
             |SELECT doc_id, CAST(hv % 4 AS BIGINT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY hv % 4 ORDER BY hv, doc_id) AS BIGINT) AS pos
             |FROM h""".stripMargin)),

    // fill-in-the-middle (PSM) transform: two deterministic hash cuts per
    // doc, re-serialized <PRE>..<SUF>..<MID>..; expression-only, zero
    // shuffles; short docs (< 3 tokens) keep lo=hi=n (all-prefix)
    "l42_fim_transform" -> Q(
      (s, dir) => TextOps.fimTransform(
        td(s, dir, "documents"), "doc_id", "text", seed = "f1", minTokens = 3),
      Some(TextOracles.fimTransformSql(seed = "f1", minTokens = 3))),

    // CCNet-style bigram-LM surprisal: the corpus scores itself under an
    // add-one bigram model (BOS per doc) — low avg_nll = fluent, high =
    // boilerplate/gibberish. Counts ride windows over ONE exploded
    // stream; V on a non-foldable-key broadcast; 6-dp DECIMAL sums
    "l43_bigram_surprisal" -> Q(
      (s, dir) => graft.llm.LangModel.bigramSurprisal(
        td(s, dir, "documents"), "doc_id", "text"),
      Some(TextOracles.bigramSurprisalSql)),

    // TF-IDF keyword extraction: per-doc top-5 characteristic terms,
    // stopword cut at df > 80% of docs (the fixture's 31-token vocab has
    // median df 388/500 — 0.5 would blank out most docs); df via the
    // one-stream token window (no join-back), 6-dp rank key
    "l44_tfidf_keywords" -> Q(
      (s, dir) => graft.llm.Index.tfidfTopTerms(
        td(s, dir, "documents"), "doc_id", "text", topK = 5, maxDfFrac = 0.8),
      Some(TextOracles.tfidfTopTermsSql(topK = 5, maxDfFrac = 0.8))),

    // deterministic count-min sketch heavy hitters: 4 rows x 64 buckets
    // of portable-hash cells — the SAME sketch on any engine, so the
    // estimates (unlike HLL a15 / GK a17) oracle-replay EXACTLY; the
    // cell table is constant-size, the bounded-memory heavy-hitter form
    "l45_cms_heavy_hitters" -> Q(
      (s, dir) => graft.llm.Sketch.cmsHeavyHitters(
        td(s, dir, "documents"), "doc_id", "text",
        probes = Seq("join", "hash", "filter", "zzz_absent"), d = 4, w = 64),
      Some(TextOracles.cmsHeavyHittersSql(
        probes = Seq("join", "hash", "filter", "zzz_absent"), d = 4, w = 64))),

    // trainable quality classifier (fastText-style hashed bag-of-words
    // logistic regression) scoring under the frozen seed model — the BPE
    // pattern again: the deterministic seed-trained model feeds both the
    // Spark query and the generated DuckDB oracle. Exact-DECIMAL scoring,
    // keep = sign of the n-scaled logit (no exp in the compared columns)
    // minLogit is CALIBRATED: bias + 0.05 keeps docs whose mean token
    // weight exceeds 0.05 — the fixture median is ~0.057, so the gate
    // splits the corpus near half rather than rubber-stamping every row
    "l46_quality_classifier" -> Q(
      (s, dir) => graft.llm.QualityClassifier.score(
        td(s, dir, "documents"), "doc_id", "text",
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))),
      Some(ClassifierOracles.scoreSql(graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))))),

    // classifier calibration / reliability table: decile bins of the
    // frozen gate's mean token weight vs the independent l4 heuristic at
    // 0.5 — the "is the gate actually separating quality?" audit shipped
    // next to a curation funnel. Bin key is the exact-DECIMAL quotient
    // rounded to 6 dp with id tie-break, so ntile agrees across engines
    "l69_calibration" -> Q(
      (s, dir) => graft.llm.QualityClassifier.calibrationTable(
        td(s, dir, "documents"), "doc_id", "text",
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000")),
        ref = graft.llm.TextOps.qualityScore(col("text")) >= 0.5,
        nBins = 10),
      Some(ClassifierOracles.calibrationSql(
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000")),
        refThreshold = "0.5", nBins = 10))),

    // accent folding for search/match keys (native NFD->strip-marks->NFC
    // expression, DuckDB's strip_accents): doc_id-keyed accented tails
    // (l26/l47 pattern) exercise the fold on the ASCII fixture
    "l57_accent_fold" -> Q(
      (s, dir) => {
        val suffix = element_at(array(
          lit("café touché"), lit("Ångström"),
          lit("naïve façade"), lit("plain tail")),
          (col("doc_id") % 4).cast("int") + 1)
        td(s, dir, "documents")
          .select(col("doc_id"), concat_ws(" ", col("text"), suffix).as("_raw"))
          .withColumn("folded", graft.llm.TextOps.foldAccents(col("_raw")))
          .select(col("doc_id"), col("folded"),
            (col("folded") =!= col("_raw")).as("changed"))
      },
      Some(s"""WITH aug AS (
             |  SELECT doc_id, concat_ws(' ', text,
             |    CASE CAST(doc_id % 4 AS INTEGER)
             |      WHEN 0 THEN 'café touché'
             |      WHEN 1 THEN 'Ångström'
             |      WHEN 2 THEN 'naïve façade'
             |      ELSE 'plain tail' END) AS raw
             |  FROM documents)
             |SELECT doc_id, strip_accents(raw) AS folded,
             |  strip_accents(raw) <> raw AS changed
             |FROM aug""".stripMargin)),

    // seeded word-dropout augmentation: keep-decision a pure function of
    // (seed, doc, position) — reproducible denoising augmentation; an
    // RNG dropout can never re-materialize the same epoch
    "l55_word_dropout" -> Q(
      (s, dir) => graft.llm.TextOps.wordDropout(
          td(s, dir, "documents"), "doc_id", "text", dropPct = 10, seed = "d1")
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             |    x -> length(x) > 0) AS tk
             |  FROM documents),
             |tok AS (
             |  SELECT doc_id, unnest(tk) AS w, unnest(range(len(tk))) AS pos FROM t),
             |k AS (
             |  SELECT doc_id, w, pos FROM tok
             |  WHERE ('0x'||substr(md5('d1' || chr(31) || CAST(doc_id AS VARCHAR)
             |    || ':' || CAST(pos AS VARCHAR)),1,15))::BIGINT % 100 >= 10),
             |agg AS (
             |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS s,
             |    CAST(count(*) AS BIGINT) AS n_kept
             |  FROM k GROUP BY 1)
             |SELECT t.doc_id, COALESCE(agg.s, '') AS aug_text,
             |  CAST(len(t.tk) AS BIGINT) AS n_tokens,
             |  COALESCE(agg.n_kept, 0) AS n_kept
             |FROM t LEFT JOIN agg USING (doc_id)""".stripMargin)),

    // token-entropy quality signal: Shannon entropy of the token
    // distribution — repetitive/templated docs score low, varied prose
    // high; complements the Gopher repetition rules (l27) with a single
    // scalar. Per-term contributions round to 6 dp into DECIMAL (the BM25
    // pattern) so the cross-engine sum is order-independent and exact
    "l54_token_entropy" -> Q(
      (s, dir) => {
        val tf = td(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        val n = sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")))
        val p = col("c").cast("double") / col("_n").cast("double")
        tf.withColumn("_n", n)
          .withColumn("_term",
            round(-(p * log(p) / log(lit(2.0))), 6)
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .groupBy("doc_id")
          .agg(first(col("_n")).as("n_tokens"),
            count(lit(1)).as("distinct_tokens"),
            sum(col("_term")).cast("double").as("entropy"))
          .withColumn("low_entropy", col("entropy") < 3.0)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, token, count(*) AS c FROM tk
             |  WHERE length(token) > 0 GROUP BY 1, 2),
             |wn AS (
             |  SELECT doc_id, token, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM tf),
             |t AS (
             |  SELECT doc_id, n,
             |    CAST(round(-((CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
             |      * ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) / ln(2.0)), 6)
             |      AS DECIMAL(18,6)) AS term
             |  FROM wn)
             |SELECT doc_id, CAST(min(n) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS distinct_tokens,
             |  CAST(sum(term) AS DOUBLE) AS entropy,
             |  CAST(sum(term) AS DOUBLE) < 3.0 AS low_entropy
             |FROM t GROUP BY 1""".stripMargin)),

    // feature hashing (TextOps.featureHashSparse — Weinberger 2009): the
    // vocabulary-free signed hashing-trick vectorizer, sparse (doc, idx,
    // w) output with zero weights dropped. Both hashes are the portable
    // md5 family, replayed bit for bit by the oracle; one explode + one
    // (doc, idx) hash-agg
    "l109_feature_hashing" -> Q(
      (s, dir) => graft.llm.TextOps.featureHashSparse(
        td(s, dir, "documents"), "doc_id", "text", dim = 16),
      Some("""WITH t AS (SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> length(x) > 0)) AS tok
             |  FROM documents WHERE text IS NOT NULL),
             |h AS (SELECT doc_id,
             |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 16 AS idx,
             |    CASE WHEN ('0x' || substr(md5('sgn:' || tok), 1, 15))::BIGINT % 2 = 1
             |         THEN 1 ELSE -1 END AS sgn
             |  FROM t)
             |SELECT doc_id, CAST(idx AS BIGINT) AS idx,
             |  CAST(sum(sgn) AS BIGINT) AS w
             |FROM h GROUP BY 1, 2 HAVING sum(sgn) <> 0""".stripMargin)),

    // prefix-cache-aware serving order (Packing.prefixCacheOrder — the
    // vLLM/RadixAttention batch-scheduling step): order requests by
    // k-token prefix within first-token buckets so shared prompts run
    // adjacently; est_cached_tokens = exact token-LCP with the
    // predecessor via monotone slice-equality indicators. The window
    // partitions by first token — never a global sort
    "l111_prefix_cache_order" -> Q(
      (s, dir) => graft.llm.Packing.prefixCacheOrder(
        td(s, dir, "documents"), "doc_id", "text", k = 4),
      Some("""WITH b AS (SELECT doc_id,
             |    (list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> length(x) > 0))[1:4] AS pk
             |  FROM documents
             |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
             |w AS (SELECT doc_id, pk[1] AS bucket,
             |    CAST(row_number() OVER win AS BIGINT) AS pos,
             |    lag(pk) OVER win AS prev, pk
             |  FROM b
             |  WINDOW win AS (PARTITION BY pk[1]
             |    ORDER BY array_to_string(pk, ' '), doc_id))
             |SELECT doc_id, bucket, pos,
             |  CAST(len(pk) AS BIGINT) AS n_prefix_tokens,
             |  CAST(CASE WHEN prev IS NULL THEN 0 ELSE
             |    least(
             |      (CASE WHEN pk[1:1] = prev[1:1] THEN 1 ELSE 0 END) +
             |      (CASE WHEN pk[1:2] = prev[1:2] THEN 1 ELSE 0 END) +
             |      (CASE WHEN pk[1:3] = prev[1:3] THEN 1 ELSE 0 END) +
             |      (CASE WHEN pk[1:4] = prev[1:4] THEN 1 ELSE 0 END),
             |      len(pk), len(prev))
             |  END AS BIGINT) AS est_cached_tokens
             |FROM w""".stripMargin)),

    // l112 — stride-scheduled mixture interleave (Packing
    // .mixtureInterleave — Waldspurger-Weihl stride scheduling): the
    // deterministic epoch order that serves a 5:3:2 source mix evenly in
    // EVERY batch window, no RNG, no shuffle buffer. The global position
    // is a closed form over per-source totals (one rank window per source
    // partition + a mixture-sized count collect — never a global sort);
    // the oracle replays the order with an ACTUAL global sort, so the
    // hash compare independently proves the closed form. eager: the
    // per-source count map collects at construction (the l33/l63 shape)
    "l112_mixture_interleave" -> Q(
      (s, dir) => graft.llm.Packing.mixtureInterleave(
        td(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 5, "src1" -> 3, "src2" -> 2)),
      Some("""WITH d AS (SELECT doc_id, source FROM documents
             |  WHERE source IN ('src0', 'src1', 'src2')),
             |r AS (SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
             |      AS BIGINT) AS src_rank
             |  FROM d),
             |v AS (SELECT doc_id, source, src_rank,
             |    src_rank * (CASE source WHEN 'src0' THEN 6
             |                WHEN 'src1' THEN 10 ELSE 15 END) AS vt,
             |    (CASE source WHEN 'src0' THEN 0
             |     WHEN 'src1' THEN 1 ELSE 2 END) AS si
             |  FROM r)
             |SELECT doc_id, source, src_rank, CAST(vt AS BIGINT) AS vt,
             |  CAST(row_number() OVER (ORDER BY vt, si, doc_id) - 1
             |    AS BIGINT) AS position
             |FROM v""".stripMargin),
      eager = true),

  )
}
