package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdw, tdEventsUs}

/**
 * Corpus-analytics / eval registry rows (split from TextQueries, round 9;
 * post-training rows moved out to [[PostTrainQueries]] in round 11 — both
 * pure mechanical moves, registry content unchanged): edit-distance
 * verify, perplexity buckets + Kneser-Ney, n-gram diversity/precision,
 * bloom decontamination, the domain link-graph family (PageRank,
 * triangles), filter-overlap ablation, obfuscation blocklist, the
 * unigram tokenizer family, lang-ID confusion, CDC chunking, mojibake
 * repair, PMI collocations, ROUGE-L, the AC blocklist, and the dataset
 * card.
 */
object TextEvalQueries {

  val all: Seq[(String, Q)] = Seq(
    // char-level near-dup verify for short docs: prefix-blocked
    // Levenshtein with the LSH-family block cap (rank ≤ 16 by id) so a
    // boilerplate mega-block can't go quadratic; sim filters on the
    // 6-dp-rounded value so the boundary is engine-identical
    "l81_edit_distance_verify" -> Q(
      (s, dir) => graft.llm.EditSim.prefixBlockedEditVerify(
        td(s, dir, "documents"), "doc_id", "text",
        prefixLen = 32, capLen = 400, blockCap = 16, minSim = 0.5),
      Some("""WITH b AS (SELECT doc_id AS id,
             |    substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 400) AS t
             |  FROM documents WHERE text IS NOT NULL),
             |k AS (SELECT id, t, substr(t, 1, 32) AS blk,
             |    row_number() OVER (PARTITION BY substr(t, 1, 32) ORDER BY id) AS rk
             |  FROM b WHERE length(t) >= 1),
             |c AS (SELECT id, t, blk FROM k WHERE rk <= 16)
             |SELECT a.id AS doc_a, b2.id AS doc_b,
             |  CAST(levenshtein(a.t, b2.t) AS BIGINT) AS lev,
             |  CAST(greatest(length(a.t), length(b2.t)) AS BIGINT) AS max_len,
             |  round(1.0 - levenshtein(a.t, b2.t) / greatest(length(a.t), length(b2.t)), 6) AS sim
             |FROM c a JOIN c b2 ON a.blk = b2.blk AND a.id < b2.id
             |WHERE round(1.0 - levenshtein(a.t, b2.t) / greatest(length(a.t), length(b2.t)), 6) >= 0.5""".stripMargin)),

    // CCNet head/middle/tail perplexity bucketing per language — the mix
    // planner's fluency terciles over the l43 self-scored surprisal;
    // oracle rides the SAME CTE block as l43 so per-doc scores cannot
    // drift between the two rows
    "l82_perplexity_buckets" -> Q(
      (s, dir) => graft.llm.LangModel.perplexityBuckets(
        tdw(s, dir, "documents"), "doc_id", "text", "lang"),
      Some(TextOracles.perplexityBucketsSql)),

    // per-source lexical diversity: type-token ratio + distinct-4gram
    // ratio (self-repetition / distinct-n) — the cross-crawl template-mill
    // comparator; heavy key is (source, gram), never a corpus distinct
    "l83_ngram_diversity" -> Q(
      (s, dir) => graft.llm.CorpusStats.ngramDiversity(
        tdw(s, dir, "documents"), "source", "text", n = 4),
      Some("""WITH tk AS (SELECT source,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> length(x) > 0) AS t
             |  FROM documents WHERE text IS NOT NULL),
             |tk2 AS (SELECT * FROM tk WHERE len(t) > 0),
             |u0 AS (SELECT source, unnest(t) AS g FROM tk2),
             |uni AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(count(DISTINCT g) AS BIGINT) AS n_types
             |  FROM u0 GROUP BY 1),
             |g0 AS (SELECT source, unnest(list_transform(range(1, len(t) - 2),
             |    i -> array_to_string(t[i:i+3], ' '))) AS g
             |  FROM tk2 WHERE len(t) >= 4),
             |gr AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ngrams,
             |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_ngrams
             |  FROM g0 GROUP BY 1)
             |SELECT u.source, n_tokens, n_types,
             |  round(n_types / n_tokens, 6) AS ttr,
             |  coalesce(n_ngrams, 0) AS n_ngrams,
             |  coalesce(n_distinct_ngrams, 0) AS n_distinct_ngrams,
             |  round(n_distinct_ngrams / n_ngrams, 6) AS distinct_ngram_ratio
             |FROM uni u LEFT JOIN gr USING (source)""".stripMargin)),

    // Bloom-filter decontamination: the constant-memory scale path for
    // l25/l31 — the bench side reduces to ≤ k·|shingles| set bits
    // (broadcast, an m-bit array in deployment) instead of the full hash
    // set; one-sided error (no false negatives). Portable-hash positions
    // ⇒ the oracle replays every count INCLUDING the false positives.
    // m = 65536 keeps the sf0.1 bench slice at ~37% occupancy (FP ≈ 5%)
    "l86_bloom_decontaminate" -> Q(
      (s, dir) => {
        val docs = tdw(s, dir, "documents")
        graft.llm.Sketch.bloomDecontaminate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 5, k = 3, m = 65536)
      },
      Some(TextOracles.bloomDecontaminateSql(n = 5, benchMod = 50, k = 3, m = 65536))),

    // domain-graph PageRank (integer micro-units, 5 iterations, damping
    // 0.85): crawl-quality ranking over the doc→domain link graph
    // (deterministic hash-synthesized outlinks — the fixture stand-in for
    // a real crawl's hyperlinks, the l50 synthetic-URL precedent); every
    // iteration is floor arithmetic, so all 5 rounds oracle-replay exactly
    "l89_domain_pagerank" -> Q(
      (s, dir) => {
        val arms = td(s, dir, "documents").select(col("source").as("src"),
          explode(array((0 until 2).map(r =>
            concat(lit("src"), pmod(TextOps.portableHash60(
              concat(lit("link" + r + graft.llm.Sampling.SeedSep),
                col("doc_id").cast("string"))), lit(20L)).cast("string"))): _*)).as("dst"))
          .filter(col("src") =!= col("dst"))
        graft.ops.Graph.pageRankInt(arms, "src", "dst", iters = 5)
      },
      Some(TextOracles.domainPageRankSql(iters = 5, nDomains = 20,
        dampNum = 85L, dampDen = 100L))),

    // exact triangle counting + local clustering coefficient over the
    // SAME synthesized domain link graph as l89: the density/link-farm
    // signal next to centrality. Degree-oriented wedges (hub-safe O(√m)
    // fan-out), one closing equi-join, floor-arithmetic coefficient
    "l101_triangle_count" -> Q(
      (s, dir) => {
        val arms = td(s, dir, "documents").select(col("source").as("src"),
          explode(array((0 until 2).map(r =>
            concat(lit("src"), pmod(TextOps.portableHash60(
              concat(lit("link" + r + graft.llm.Sampling.SeedSep),
                col("doc_id").cast("string"))), lit(20L)).cast("string"))): _*)).as("dst"))
        graft.ops.Graph.triangleCounts(arms, "src", "dst")
      },
      Some(TextOracles.triangleCountSql(nDomains = 20))),

    // filter-overlap ablation matrix (the Gopher/RefinedWeb rule-study
    // table as a query): per filter PAIR, docs failing both; per filter,
    // docs ONLY it catches — the "is this rule redundant / dead weight"
    // diagnostic. Five replayable reject rules over documents; expression-
    // side pair explosion + ONE hash-agg
    "l102_filter_overlap" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
          .withColumn("_q", TextOps.qualityScore(col("text")))
          .withColumn("_fpc",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(graft.llm.Dedup.exactFingerprint(col("text")))))
        graft.llm.Curation.filterOverlapMatrix(docs, Seq(
          "short" -> (length(col("text")) < 200),
          "low_quality" -> (col("_q") < 0.3),
          "pii" -> (TextOps.piiCount(col("text")) > 0),
          "exact_dup" -> (col("_fpc") > 1),
          "non_en" -> not(col("lang") <=> lit("en"))))
      },
      Some {
        val names = Seq("short", "low_quality", "pii", "exact_dup", "non_en")
        val pairSelects = (for {
          i <- names.indices; j <- i until names.size
        } yield
          s"""SELECT '${names(i)}' AS filter_a, '${names(j)}' AS filter_b,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM flags WHERE f_${names(i)} AND f_${names(j)} HAVING count(*) > 0""".stripMargin)
        val onlySelects = names.map { n =>
          val others = names.filter(_ != n).map(o => s"NOT f_$o").mkString(" AND ")
          s"""SELECT '$n', '__only__', CAST(count(*) AS BIGINT)
             |FROM flags WHERE f_$n AND $others HAVING count(*) > 0""".stripMargin
        }
        s"""WITH t AS (SELECT doc_id, lang, text,
           |    CAST(length(text) AS DOUBLE) AS nc,
           |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
           |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS nw,
           |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS np,
           |    count(*) OVER (PARTITION BY md5(text)) AS fpc
           |  FROM documents),
           |flags AS (SELECT
           |    length(text) < 200 AS f_short,
           |    round(least(nc/200.0, 1.0) * (1.0 - np/greatest(nc, 1.0))
           |      * (0.5 + 0.5*least((nc/greatest(nw, 1.0))/8.0, 1.0)), 6) < 0.3 AS f_low_quality,
           |    len(regexp_extract_all(text, '${graft.llm.TextOps.EmailPattern}'))
           |      + len(regexp_extract_all(text, '${graft.llm.TextOps.PhonePattern}')) > 0 AS f_pii,
           |    fpc > 1 AS f_exact_dup,
           |    lang IS DISTINCT FROM 'en' AS f_non_en
           |  FROM t)
           |${(pairSelects ++ onlySelects).mkString("\nUNION ALL\n")}""".stripMargin
      }),

    // obfuscation folding + blocklist: leet/homoglyph translate fold,
    // THEN word-boundary blocklist counts — catches the trivially-
    // obfuscated terms a raw regex misses (deterministic doc_id-keyed
    // obfuscated augmentation, the l47/l50 fixture pattern); the corpus
    // vocabulary itself also hits the blocklist, so counts mix natural
    // and planted matches
    "l91_obfuscation_blocklist" -> Q(
      (s, dir) => {
        val terms = Seq("join", "hash", "scan", "table", "group", "order")
        val aug = tdw(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit(" "),
            element_at(array(lit("j01n h4sh"), lit("$can t4ble"),
              lit("gr0up 0rder"), lit("plain r0w")),
              (col("doc_id") % 4).cast("int") + 1)).as("raw"))
        aug.select(col("doc_id"),
            TextOps.foldObfuscation(col("raw")).as("folded"))
          .select(col("doc_id"), md5(col("folded")).as("folded_md5"),
            TextOps.blocklistHits(col("folded"), terms).as("n_hits"))
      },
      Some(TextOracles.obfuscationBlocklistSql(
        Seq("join", "hash", "scan", "table", "group", "order")))),

    // corpus-level clipped n-gram precision (BLEU-1/BLEU-2 core) between
    // adjacent same-source docs: MULTISET counting — a candidate n-gram
    // scores only up to its count in the reference — vs l74's
    // distinct-set Jaccard; integer numerators/denominators emitted so
    // the oracle compares exact counts, 6-dp ratios alongside
    "l92_ngram_precision_eval" -> Q(
      (s, dir) => graft.llm.CorpusStats.ngramPrecisionEval(
        tdw(s, dir, "documents"), "doc_id", "source", "text"),
      Some(TextOracles.ngramPrecisionSql)),

    // unigram-LM (SentencePiece-style) Viterbi segmentation: the second
    // real tokenizer family next to BPE — global-min-cost subword split
    // per word under an integer micro-nat cost model, the WHOLE DP a
    // Catalyst expression fold (zero shuffles, no UDF); the oracle
    // replays the DP as a recursive CTE with the same packed-long cells
    "l93_unigram_segment" -> Q(
      (s, dir) => graft.llm.Unigram.segmentCost(
        td(s, dir, "documents"), "doc_id", "text"),
      Some(TextOracles.unigramSegmentSql(
        graft.llm.Unigram.DefaultVocab, graft.llm.Unigram.UnkCostMicro,
        graft.llm.Unigram.MaxPieceLen))),

    // l115 — hard-EM unigram-LM tokenizer TRAINING (Kudo 2018's EM
    // re-estimation, Viterbi E-step): the training-side complement to
    // l93's segmentation, structured like the BPE trainer — corpus-scale
    // word-frequency shuffle, then EM over the bounded top-word table.
    // Every count is an integer and every cost a Log2Micro fixed-point
    // value, so the ENTIRE train (seed cut, DP, backtrace, EM counts,
    // M-step costs) replays bit-for-bit in the oracle. eager: collects
    // the bounded top-word table at construction (the l16 precedent)
    "l115_unigram_em_train" -> Q(
      (s, dir) => graft.llm.UnigramTrain.emTrain(
        s, td(s, dir, "documents"), "text",
        topWords = 2000, vocabSize = 64, topK = 40, rounds = 1),
      Some(TextOracles.unigramEmTrainSql(topWords = 2000, vocabSize = 64,
        topK = 40, maxLen = graft.llm.Unigram.MaxPieceLen,
        unkCost = graft.llm.Unigram.UnkCostMicro)),
      eager = true),

    // tokenizer FAMILY comparison: per language, BPE tokens-per-word vs
    // unigram pieces-per-word over the same docs in ONE scan — the table
    // a tokenizer rollout decision reads (which family compresses which
    // language better); both recursive replays share one oracle block
    "l94_tokenizer_comparison" -> Q(
      (s, dir) => {
        val d = td(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("lang"),
            coalesce(graft.llm.Bpe.countTokens(col("text")), lit(0L)).as("bpe"),
            graft.llm.Unigram.segmentArray(col("text")).as("_s"))
          .select(col("lang"), col("bpe"),
            element_at(col("_s"), 2).as("pieces"),
            element_at(col("_s"), 3).as("words"))
        d.groupBy("lang").agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum("words").cast("long").as("n_words"),
          sum("bpe").cast("long").as("n_bpe_tokens"),
          sum("pieces").cast("long").as("n_unigram_pieces"),
          round(sum("bpe").cast("double")
            / nullif(sum("words"), lit(0L)).cast("double"), 6).as("bpe_per_word"),
          round(sum("pieces").cast("double")
            / nullif(sum("words"), lit(0L)).cast("double"), 6).as("unigram_per_word"))
      },
      Some(TextOracles.tokenizerComparisonSql(
        graft.llm.Bpe.DefaultMerges, graft.llm.Unigram.DefaultVocab,
        graft.llm.Unigram.UnkCostMicro, graft.llm.Unigram.MaxPieceLen))),

    // language-ID CONFUSION MATRIX: the l24 trigram classifier's
    // predictions against the corpus's labeled lang column — the
    // (true, predicted, count) cells every classifier eval reports;
    // one scan + one hash-agg, prediction expression-side
    "l95_langid_confusion" -> Q(
      (s, dir) => td(s, dir, "documents")
        .select(col("lang"),
          graft.llm.NgramLangId.langIdNgram(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).cast("long").as("n_docs")),
      Some(s"""SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
              |FROM documents d JOIN (
              |${TextOracles.langIdNgramSql}
              |) p USING (doc_id)
              |GROUP BY 1, 2""".stripMargin)),

    // content-defined chunking (Rabin/CDC, LBFS 2001): boundaries where
    // the rolling 3-token hash ≡ 0 (mod 16) — boundaries follow CONTENT,
    // so an insertion re-synchronizes within k tokens and chunk-level
    // dedup keeps matching the unchanged tail (fixed-stride l32 loses all
    // alignment after one insertion); one posexplode + ONE doc-key
    // exchange, portable-hash cuts replay exactly
    "l96_cdc_chunking" -> Q(
      (s, dir) => graft.llm.TextOps.cdcChunks(
        td(s, dir, "documents"), "doc_id", "text", k = 3, m = 16),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> length(x) > 0) AS tk
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(tk) AS tok, unnest(range(len(tk))) AS pos FROM t),
             |ws AS (SELECT doc_id, tok, pos,
             |    concat_ws(' ',
             |      lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos),
             |      lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos),
             |      tok) AS wstr
             |  FROM tok),
             |b AS (SELECT doc_id, tok, pos,
             |    (pos >= 2 AND ('0x'||substr(md5(wstr),1,15))::BIGINT % 16 = 0) AS bnd
             |  FROM ws),
             |c AS (SELECT doc_id, tok, pos,
             |    CAST(coalesce(sum(CASE WHEN bnd THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY pos
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS chunk_idx
             |  FROM b)
             |SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_tokens,
             |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
             |FROM c GROUP BY 1, 2""".stripMargin)),

    // mojibake repair (ftfy fix_encoding core): docs get deterministic
    // non-ASCII plants (2-byte accents / 3-byte punctuation), are then
    // REALLY double-encoded via UTF-8 encode → Latin-1 decode (Spark
    // built-ins — the actual corruption every crawl pipeline sees), and
    // repaired by the native strictly-gated inverse transcode. The oracle
    // replays corruption AND repair as replace-chains over the finite
    // planted alphabet — exact because the base corpus is pure ASCII, so
    // every suspicious sequence is a planted one. `restored` asserting
    // repaired == planted rides in the output: a half-decoded or
    // over-eager repair flips it
    "l97_mojibake_repair" -> Q(
      (s, dir) => {
        val mojibakePair = "[\u00C2-\u00F4][\u0080-\u00BF]"
        td(s, dir, "documents")
          .withColumn("planted",
            when(col("doc_id") % 3 === 0, translate(col("text"), "aeou", "áéöú"))
              .when(col("doc_id") % 3 === 1, concat(col("text"), lit(" — fin…")))
              .otherwise(col("text")))
          .withColumn("ctext",
            when(col("doc_id") % 3 === 2, col("planted"))
              .otherwise(decode(encode(col("planted"), "UTF-8"), "ISO-8859-1")))
          .withColumn("rtext", TextOps.repairMojibake(col("ctext")))
          .select(col("doc_id"),
            when(col("rtext") =!= col("ctext"), lit("repaired"))
              .otherwise(lit("clean")).as("status"),
            size(regexp_extract_all(col("ctext"), lit(mojibakePair), lit(0)))
              .cast("long").as("n_bad"),
            length(col("ctext")).cast("long").as("len_corrupt"),
            length(col("rtext")).cast("long").as("len_repaired"),
            (col("rtext") === col("planted")).as("restored"),
            md5(col("rtext").cast("binary")).as("text_md5"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id, text,
             |    CASE WHEN doc_id % 3 = 0 THEN translate(text, 'aeou', 'áéöú')
             |         WHEN doc_id % 3 = 1 THEN text || ' — fin…'
             |         ELSE text END AS planted
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, planted,
             |    CASE WHEN doc_id % 3 = 2 THEN planted ELSE
             |      replace(replace(replace(replace(replace(replace(planted,
             |        'á', 'Ã' || chr(161)), 'é', 'Ã' || chr(169)),
             |        'ö', 'Ã' || chr(182)), 'ú', 'Ã' || chr(186)),
             |        '—', 'â' || chr(128) || chr(148)),
             |        '…', 'â' || chr(128) || chr(166))
             |    END AS ctext
             |  FROM p),
             |r AS (
             |  SELECT doc_id, planted, ctext,
             |    CASE WHEN doc_id % 3 = 2 THEN ctext ELSE
             |      replace(replace(replace(replace(replace(replace(ctext,
             |        'Ã' || chr(161), 'á'), 'Ã' || chr(169), 'é'),
             |        'Ã' || chr(182), 'ö'), 'Ã' || chr(186), 'ú'),
             |        'â' || chr(128) || chr(148), '—'),
             |        'â' || chr(128) || chr(166), '…')
             |    END AS rtext
             |  FROM c)
             |SELECT doc_id,
             |  CASE WHEN rtext <> ctext THEN 'repaired' ELSE 'clean' END AS status,
             |  CAST(len(regexp_extract_all(ctext,
             |    '[\x{00C2}-\x{00F4}][\x{0080}-\x{00BF}]')) AS BIGINT) AS n_bad,
             |  CAST(length(ctext) AS BIGINT) AS len_corrupt,
             |  CAST(length(rtext) AS BIGINT) AS len_repaired,
             |  rtext = planted AS restored,
             |  md5(rtext) AS text_md5
             |FROM r""".stripMargin)),

    // interpolated Kneser-Ney bigram scoring — the KenLM smoothing family
    // behind CCNet's actual perplexity gate (l43's add-one model is the
    // strawman twin): absolute discount + continuation-unigram backoff,
    // a PROPER per-context distribution (sums to 1 over the vocab,
    // spec-checked). One exploded bigram stream carries all count
    // windows; the oracle rebuilds the same counts from the distinct-
    // bigram table and mirrors the float expression op-for-op
    "l98_kneser_ney" -> Q(
      (s, dir) => graft.llm.LangModel.kneserNeyScores(
        td(s, dir, "documents"), "doc_id", "text"),
      Some(TextOracles.kneserNeySql())),

    // dataset card (Gebru et al. 2021): one long-form (section, dim,
    // metric, value) table of corpus composition — overall / per-lang /
    // per-source counts, token mass, exact-dup share, mean quality —
    // composed from the same primitives l1/l2/l4 oracle individually
    "l99_dataset_card" -> Q(
      (s, dir) => graft.llm.DatasetCard.datasetCard(
        td(s, dir, "documents"), "doc_id", "text", "lang", "source"),
      Some("""WITH t AS (SELECT doc_id, lang, source, text,
             |    CAST(length(text) AS DOUBLE) AS nc,
             |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS nw,
             |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS np
             |  FROM documents),
             |base AS (SELECT doc_id, lang, source,
             |    CAST(nw AS BIGINT) AS n_tok, CAST(nc AS BIGINT) AS n_chr,
             |    round(least(nc/200.0, 1.0) * (1.0 - np/greatest(nc, 1.0))
             |      * (0.5 + 0.5*least((nc/greatest(nw, 1.0))/8.0, 1.0)), 6) AS q,
             |    md5(text) AS fp
             |  FROM t),
             |d AS (SELECT *, CASE WHEN count(*) OVER (PARTITION BY fp) > 1
             |    THEN 1 ELSE 0 END AS is_dup FROM base),
             |c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |    CAST(sum(n_chr) AS BIGINT) AS n_chars,
             |    round(CAST(sum(is_dup) AS DOUBLE)/count(*), 6) AS dup_share,
             |    round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE)/count(*), 6) AS mean_q
             |  FROM d),
             |lg AS (SELECT lang AS dim, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |    round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE)/count(*), 6) AS mean_q
             |  FROM d GROUP BY 1),
             |sr AS (SELECT source AS dim, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |    round(CAST(sum(is_dup) AS DOUBLE)/count(*), 6) AS dup_share
             |  FROM d GROUP BY 1)
             |SELECT 'corpus' AS section, 'all' AS dim, 'n_docs' AS metric,
             |  CAST(n_docs AS DOUBLE) AS value FROM c
             |UNION ALL SELECT 'corpus', 'all', 'n_tokens', CAST(n_tokens AS DOUBLE) FROM c
             |UNION ALL SELECT 'corpus', 'all', 'n_chars', CAST(n_chars AS DOUBLE) FROM c
             |UNION ALL SELECT 'corpus', 'all', 'dup_doc_share', dup_share FROM c
             |UNION ALL SELECT 'corpus', 'all', 'mean_quality', mean_q FROM c
             |UNION ALL SELECT 'lang', dim, 'n_docs', CAST(n_docs AS DOUBLE) FROM lg
             |UNION ALL SELECT 'lang', dim, 'n_tokens', CAST(n_tokens AS DOUBLE) FROM lg
             |UNION ALL SELECT 'lang', dim, 'mean_quality', mean_q FROM lg
             |UNION ALL SELECT 'source', dim, 'n_docs', CAST(n_docs AS DOUBLE) FROM sr
             |UNION ALL SELECT 'source', dim, 'n_tokens', CAST(n_tokens AS DOUBLE) FROM sr
             |UNION ALL SELECT 'source', dim, 'dup_doc_share', dup_share FROM sr""".stripMargin)),

    // l104 — PMI collocation mining (Church & Hanks 1990): top adjacent
    // word pairs by pointwise mutual information, both marginals taken
    // from the joint bigram table (contingency form — no separate
    // unigram pass); min-count cutoff kills rare-pair PMI inflation.
    // ln is monotone, so the ranking rides the exact integer
    // micro-quotient (10⁶·c_pair·n_tot) div (c_x·c_y) — ULP-robust
    // across libm builds (round(ln(x),6) flipped a digit in round 9).
    // One corpus shuffle; marginals are windows over the pair table only
    "l104_pmi_collocations" -> Q(
      (s, dir) => graft.llm.LangModel.pmiCollocations(
        td(s, dir, "documents"), "doc_id", "text", minCount = 5L, topK = 50),
      Some("""WITH t AS (SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> length(x) > 0) AS tk FROM documents),
             |s AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
             |  FROM t WHERE len(tk) >= 2),
             |p AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair FROM s GROUP BY 1, 2),
             |m AS (SELECT w1, w2, c_pair,
             |    CAST(sum(c_pair) OVER (PARTITION BY w1) AS BIGINT) AS c_x,
             |    CAST(sum(c_pair) OVER (PARTITION BY w2) AS BIGINT) AS c_y
             |  FROM p),
             |tot AS (SELECT CAST(sum(c_pair) AS BIGINT) AS n_tot FROM p)
             |SELECT w1, w2, c_pair,
             |  CAST((c_pair::HUGEINT * n_tot * 1000000) // (c_x::HUGEINT * c_y) AS BIGINT)
             |    AS pmi_ratio_micro
             |FROM m CROSS JOIN tot WHERE c_pair >= 5
             |ORDER BY pmi_ratio_micro DESC, w1, w2 LIMIT 50""".stripMargin)),

    // l105 — ROUGE-L per source over the l92 adjacent candidate/reference
    // pairing: LCS in the native codegen'd LcsLen expression (a HOF fold
    // can't carry the DP row's left neighbor), sequences truncated to 40
    // tokens (prefix-ROUGE — the quadratic DP is capped by config, not
    // corpus). The oracle replays the DP as a recursive CTE whose step is
    // the tentative-row + prefix-max reformulation (newdp = running max
    // of [match ? dp[j-1]+1 : dp[j]]), exactly the native loop's algebra
    "l105_rouge_l" -> Q(
      (s, dir) => graft.llm.CorpusStats.rougeLBySource(
        td(s, dir, "documents"), "doc_id", "source", "text", maxTokens = 40),
      Some("""WITH RECURSIVE t AS (SELECT doc_id, source,
             |    (list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> length(x) > 0))[1:40] AS tk
             |  FROM documents),
             |p AS (SELECT source, doc_id, tk AS c,
             |    lag(tk) OVER (PARTITION BY source ORDER BY doc_id) AS r
             |  FROM t),
             |pr AS (SELECT source, doc_id, c, r FROM p
             |  WHERE r IS NOT NULL AND len(c) > 0 AND len(r) > 0),
             |seg AS (
             |  SELECT source, doc_id, c, r, len(c) AS m, 1 AS i,
             |    list_transform(range(len(r) + 1), x -> CAST(0 AS BIGINT)) AS dp
             |  FROM pr
             |  UNION ALL
             |  SELECT source, doc_id, c, r, m, i + 1,
             |    list_transform(range(1, len(r) + 2), j -> list_max(
             |      list_transform(range(1, j + 1), j2 -> CASE
             |        WHEN j2 = 1 THEN CAST(0 AS BIGINT)
             |        WHEN c[i] = r[j2 - 1] THEN dp[j2 - 1] + 1
             |        ELSE dp[j2] END)))
             |  FROM seg WHERE i <= m),
             |fin AS (SELECT source, dp[len(r) + 1] AS lcs, len(c) AS clen, len(r) AS rlen
             |  FROM seg WHERE i = m + 1),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(lcs) AS BIGINT) AS lcs_sum,
             |    CAST(sum(clen) AS BIGINT) AS cand_sum,
             |    CAST(sum(rlen) AS BIGINT) AS ref_sum
             |  FROM fin GROUP BY 1)
             |SELECT source, n_pairs, lcs_sum, cand_sum, ref_sum,
             |  round(CAST(lcs_sum AS DOUBLE) / cand_sum, 6) AS rouge_p,
             |  round(CAST(lcs_sum AS DOUBLE) / ref_sum, 6) AS rouge_r,
             |  round(2.0 * lcs_sum / (cand_sum + ref_sum), 6) AS rouge_f
             |FROM g""".stripMargin)),

    // l107 — Aho-Corasick multi-pattern blocklist: ALL patterns matched in
    // ONE automaton pass per document (vs l91's per-term word-boundary
    // regex family — this is the P-doesn't-multiply-scans substring form;
    // at 100 TB a P-term LIKE stack scans the corpus P times). Counts are
    // all-occurrence (nested hits fire too: every "scan" also hits "can");
    // the oracle's replace-count formula equals that exactly because the
    // pattern set is border-free — AhoCorasickSpec asserts the property,
    // and "can"⊂"scan" / "bat"⊂"batch" keep the nested lane honest
    "l107_ac_blocklist" -> Q(
      (s, dir) => graft.llm.AhoCorasick.blocklistHits(
        s, td(s, dir, "documents"), "doc_id", "text",
        Seq("scan", "can", "merge", "bat", "spark", "row")),
      Some("""WITH p AS (SELECT unnest(['scan', 'can', 'merge', 'bat', 'spark', 'row']) AS pattern),
             |c AS (SELECT doc_id, pattern,
             |    CAST((length(text) - length(replace(text, pattern, ''))) / length(pattern) AS BIGINT) AS n_hits
             |  FROM documents CROSS JOIN p)
             |SELECT doc_id, pattern, n_hits FROM c WHERE n_hits > 0""".stripMargin)),
  )
}
