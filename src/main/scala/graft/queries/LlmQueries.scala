package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Ann, Dedup, PortableFamily, TextOps}
import graft.multimodal.Multimodal
import Registry.td

/**
 * LLM training-data pipeline operators over `documents` / `embeddings`:
 * dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
 * (brute-force + LSH + IVF), the BPE tokenizer family (count l20, full
 * encode l21, vocab stats l22, sequence packing l23/l29), text analysis
 * (lang-id l3/l24, quality l4/l27, PII l26, bigram-LM surprisal l43),
 * corpus hygiene (decontamination l25, deterministic sampling l28, epoch
 * shuffle l41, FIM transform l42), retrieval (kNN self-join l37, inverted
 * index l39, BM25 l40, TF-IDF keywords l44, CMS heavy hitters l45),
 * semantic dedup (l38), multimodal plumbing + real BMP/WAV decode (m1–m3).
 *
 * Oracle notes: xxhash64-based ops are not DuckDB-expressible → registered
 * rows-only, with `l5p`/`l6p`/`l13p` portable-family TWINS of the same
 * pipelines (md5-derived universal hashes, [[LshOracles]]) carrying exact
 * DuckDB oracles end to end. The ANN family (l10/l11/l12) is oracle-checked
 * directly: hyperplane coefficients are interpolated into the SQL from the
 * same Scala constants. The BPE family replays its greedy merge loop in a
 * recursive CTE ([[BpeOracles]]); lang-id/PII/repetition twins live in
 * [[TextOracles]].
 */
object LlmQueries {

  val all: Seq[(String, Q)] = Seq(

    // exact dedup on a 5-token prefix fingerprint (creates real dup groups
    // in the synthetic corpus; md5 matches across engines)
    "l1_exact_dedup" -> Q(
      (s, dir) => {
        val pre = td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(TextOps.whitespaceTokens(col("text")), 1, 5), " ").as("prefix"))
        Dedup.exactDedup(pre, "prefix", "doc_id")
      },
      Some("""SELECT md5(array_to_string(regexp_split_to_array(trim(text), '\s+')[1:5], ' ')) AS fingerprint,
             |CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS dup_cnt
             |FROM documents GROUP BY 1""".stripMargin)),

    // the filter step after exact dedup: corpus reduced to one row per group
    "l14_dedup_keep_first" -> Q(
      (s, dir) => {
        val pre = td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(TextOps.whitespaceTokens(col("text")), 1, 5), " ").as("prefix"))
        Dedup.dedupKeepFirst(pre, "prefix", "doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |  array_to_string(regexp_split_to_array(trim(text), '\s+')[1:5], ' ') AS prefix
             |  FROM documents)
             |SELECT doc_id, prefix FROM p
             |WHERE doc_id IN (SELECT min(doc_id) FROM p GROUP BY prefix)""".stripMargin)),

    // token counting: whitespace + BPE-ish regex units
    "l2_token_count" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.bpeishCount(col("text")).as("n_bpeish")),
      Some("""SELECT doc_id,
             |CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
             |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
             |FROM documents""".stripMargin)),

    // REAL BPE token count: native codegen'd greedy-merge encoder with the
    // fixed DefaultMerges table; the oracle replays the identical merge
    // loop in a recursive CTE with the SAME interpolated merges
    "l20_bpe_token_count" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), graft.llm.Bpe.countTokens(col("text")).as("bpe_tokens")),
      Some(BpeOracles.tokenCountSql(graft.llm.Bpe.DefaultMerges))),

    // full BPE ENCODING (not just the count): the entire token sequence is
    // hash-compared, so any divergence in any merge step of any word fails
    // the row — the strongest external check on the tokenizer
    "l21_bpe_encode" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), graft.llm.Bpe.encodeTokens(col("text")).as("bpe_text")),
      Some(BpeOracles.encodeSql(graft.llm.Bpe.DefaultMerges))),

    // corpus vocabulary stats over the BPE encoding: top-50 tokens by
    // frequency — the vocab-audit step of a tokenizer rollout
    "l22_bpe_vocab_stats" -> Q(
      (s, dir) => td(s, dir, "documents")
        .select(explode(split(graft.llm.Bpe.encodeTokens(col("text")), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(50),
      Some(BpeOracles.vocabStatsSql(graft.llm.Bpe.DefaultMerges, k = 50))),

    // sequence packing: docs → bins of ≤512 BPE tokens, greedy first-fit
    // in id order within 32-doc chunks (chunks are the parallel unit; the
    // oracle replays the identical greedy fold per chunk recursively)
    "l23_token_packing" -> Q(
      (s, dir) => graft.llm.Packing.packTextByTokenBudget(
        td(s, dir, "documents"), "doc_id", "text",
        binCapacity = 512L, chunkSize = 32L).toDF(),
      Some(BpeOracles.packingSql(graft.llm.Bpe.DefaultMerges,
        binCapacity = 512L, chunkSize = 32L))),

    // tokenizer LOSSLESSNESS audit: stripping the separator from the
    // encoding must reproduce the whitespace-collapsed source for EVERY
    // doc — the invariant a tokenizer rollout gates on. Both engines
    // compute the mismatch count independently; expected (n_docs, 0)
    "l35_bpe_roundtrip" -> Q(
      (s, dir) => td(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(
          (translate(graft.llm.Bpe.encodeTokens(col("text")), " ", "")
            =!= regexp_replace(trim(col("text")), "\\s+", "")).as("_bad"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("_bad"), 1L).otherwise(0L)).cast("long").as("n_mismatch")),
      Some(BpeOracles.roundTripSql(graft.llm.Bpe.DefaultMerges))),

    // one-row corpus HEALTH REPORT (the numbers a pipeline run gates on):
    // doc/blank/token counts, exact-dup docs, mean quality. Mean is summed
    // in DECIMAL(18,6) over per-doc 6-dp-rounded scores (exact arithmetic
    // ⇒ engine-identical), then divided as double by an exact long
    "l36_corpus_report" -> Q(
      (s, dir) => td(s, dir, "documents").agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
          .otherwise(0L)).cast("long").as("n_blank"),
        sum(coalesce(TextOps.tokenCount(col("text")), lit(0L))).cast("long").as("n_tokens"),
        (count(col("text")) - countDistinct(Dedup.exactFingerprint(col("text"))))
          .cast("long").as("n_dup_docs"),
        round(sum(TextOps.qualityScore(col("text")).cast("decimal(18,6)")).cast("double")
          / count(col("text")).cast("double"), 6).as("mean_quality")),
      Some("""WITH q AS (SELECT doc_id, text,
             |  CAST(length(text) AS DOUBLE) AS n_chars,
             |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS n_words,
             |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct
             |  FROM documents)
             |SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
             |  CAST(COALESCE(SUM(CAST(n_words AS BIGINT)), 0) AS BIGINT) AS n_tokens,
             |  CAST(count(text) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
             |  round(CAST(SUM(CAST(round(least(n_chars/200.0, 1.0) * (1.0 - n_punct/greatest(n_chars, 1.0))
             |      * (0.5 + 0.5*least((n_chars/greatest(n_words, 1.0))/8.0, 1.0)), 6) AS DECIMAL(18,6))) AS DOUBLE)
             |    / CAST(count(text) AS DOUBLE), 6) AS mean_quality
             |FROM q""".stripMargin)),

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

    // corpus-level line dedup (CCNet/RefinedWeb boilerplate removal):
    // lines in >= 3 distinct docs removed everywhere, docs rebuilt in
    // order; heavy-line set broadcast, md5 keeps output rows small
    "l30_line_dedup" -> Q(
      (s, dir) => graft.llm.Dedup.lineDedup(
          td(s, dir, "documents"), "doc_id", "text", minDf = 3)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_lines"), col("n_removed")),
      Some(TextOracles.lineDedupSql(minDf = 3))),

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

    // repeated-span scrubbing (bucketed exact-substring dedup, Lee et al.
    // 2021): token runs covered by 8-grams appearing in >= 2 distinct docs
    // removed everywhere; md5 keeps output rows small
    "l34_repeated_span_scrub" -> Q(
      (s, dir) => Dedup.repeatedSpanScrub(
          td(s, dir, "documents"), "doc_id", "text", n = 8, minDf = 2)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_tokens"), col("n_removed")),
      Some(TextOracles.repeatedSpanScrubSql(n = 8, minDf = 2))),

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

    // MinHash-LSH near-dup candidates (xxhash64 signatures → rows-only);
    // plan property: single shuffle on (band_id, band_hash), no crossJoin
    "l5_minhash_lsh_pairs" -> Q(
      (s, dir) => Dedup.minhashCandidatePairs(
        td(s, dir, "documents"), "text", "doc_id", shingleSize = 3, k = 32, bands = 16),
      None),

    // portable-family twin of l5: identical staged pipeline, md5-derived
    // universal hashes → the ENTIRE LSH pipeline (shingle, sign, band,
    // bucket, pair) is cross-checked against a DuckDB exact twin
    "l5p_minhash_lsh_pairs_portable" -> Q(
      (s, dir) => Dedup.minhashCandidatePairs(
        td(s, dir, "documents"), "text", "doc_id", shingleSize = 3, k = 32, bands = 16,
        family = PortableFamily),
      Some(LshOracles.minhashPortableSql(n = 3, k = 32, bands = 16, cap = 1000))),

    // LSH candidates verified with exact n-gram Jaccard
    "l6_ngram_jaccard_neardups" -> Q(
      (s, dir) => Dedup.nearDupPairs(
        td(s, dir, "documents"), "text", "doc_id",
        threshold = 0.5, shingleSize = 3, k = 32, bands = 16),
      None),

    // portable-family twin of l6: candidates + Jaccard verify, both
    // reproduced exactly in the oracle (Jaccard over the same md5 shingle
    // hashes, rounded to 6 dp before the threshold filter)
    "l6p_ngram_jaccard_neardups_portable" -> Q(
      (s, dir) => Dedup.nearDupPairs(
        td(s, dir, "documents"), "text", "doc_id",
        threshold = 0.5, shingleSize = 3, k = 32, bands = 16,
        family = PortableFamily),
      Some(LshOracles.portableNearDupPairsSql(n = 3, k = 32, bands = 16,
        cap = 1000, threshold = 0.5))),

    // SimHash fingerprints + blocked near-dup pairs (rows-only). Manku-
    // standard hamming<=3 with the minimal EXACT banding (4 x 16-bit
    // slices): r7's 8 x 8-bit banding at maxHamming=8 was not pigeonhole-
    // exact AND its 256-value slices saturated - pairs grew quadratically
    // (x18 time for x10 docs); 16-bit slices scale linearly
    "l7_simhash_neardups" -> Q(
      (s, dir) => Dedup.simhashNearDups(
        td(s, dir, "documents"), "text", "doc_id", maxHamming = 3, blocks = 4),
      None),

    // portable twin of l7: same vote/block/hamming pipeline over md5-derived
    // 60-bit token hashes a DuckDB CTE chain replays exactly
    "l7p_simhash_neardups_portable" -> Q(
      (s, dir) => Dedup.simhashNearDupsPortable(
        td(s, dir, "documents"), "text", "doc_id", maxHamming = 3, blocks = 4),
      Some(LshOracles.portableSimhashNearDupsSql(maxHamming = 3, blocks = 4, cap = 1000))),

    // near-dup clusters: LSH candidates → connected components → the
    // keep-one-per-cluster assignment (rows-only)
    "l13_neardup_clusters" -> Q(
      (s, dir) => Dedup.nearDupClusters(
        Dedup.minhashCandidatePairs(td(s, dir, "documents"), "text", "doc_id",
          shingleSize = 3, k = 32, bands = 16)),
      None),

    // portable-family twin of l13: connected components over the SAME
    // candidate graph the oracle derives (recursive-CTE reachability)
    "l13p_neardup_clusters_portable" -> Q(
      (s, dir) => Dedup.nearDupClusters(
        Dedup.minhashCandidatePairs(td(s, dir, "documents"), "text", "doc_id",
          shingleSize = 3, k = 32, bands = 16, family = PortableFamily)),
      Some(LshOracles.portableClustersSql(n = 3, k = 32, bands = 16, cap = 1000))),

    // rolling-hash document fingerprint (order-sensitive; rows-only)
    "l8_doc_fingerprint" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), TextOps.docFingerprint(col("text")).as("fingerprint")),
      None),

    // portable twin of l8: same order-sensitive fold with modular
    // arithmetic a DuckDB recursive CTE replays exactly
    "l8p_doc_fingerprint_portable" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), TextOps.portableDocFingerprint(col("text")).as("fingerprint")),
      Some(LshOracles.portableFingerprintSql)),

    // brute-force cosine top-k vs the vec_id=0 query vector (exact baseline)
    "l9_ann_bruteforce_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        Ann.bruteForceTopK(e, "embedding", "vec_id", q, k = 10, excludeId = Some(0L))
          .select(col("vec_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
             |s AS (SELECT e.vec_id,
             |  list_dot_product(e.embedding::DOUBLE[], q.qv)
             |    / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
             |       * sqrt(list_dot_product(q.qv, q.qv))) AS sim
             |  FROM embeddings e, q WHERE e.vec_id <> 0)
             |SELECT vec_id, round(sim, 6) AS cosine_sim FROM s
             |ORDER BY round(sim, 6) DESC, vec_id LIMIT 10""".stripMargin), eager = true),

    // LSH-bucketed ANN: 16 queries probe hyperplane buckets only. Oracle:
    // literal-coefficient hyperplane twin; rank on the 6-dp-ROUNDED sim on
    // both sides (engine-stable rank key: a last-ulp divergence between
    // Spark's fold dot product and DuckDB's summation can't flip the
    // row_number boundary), output rounded to 6 dp
    // 8 tables × 6 planes (the amplified default): a single 12-plane table
    // measured recall@5 = 0.013 on this fixture (AnnRecallSpec) — useless
    // as a search structure even though its oracle replayed it exactly.
    "l10_ann_lsh_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 16)
        Ann.lshTopK(e, queries, "embedding", "vec_id", dim = 64, k = 5,
            nPlanes = 6, nTables = 8)
          .select(col("query_id"), col("corpus_id"),
            round(col("cosine_sim"), 6).as("cosine_sim"))
      },
      Some(LshOracles.lshTopKSql(nPlanes = 6, dim = 64, nQueries = 16, k = 5,
        nTables = 8))),

    // embedding-cosine near-dup pairs, hyperplane-bucketed with 4-table
    // amplification (recall in the realistic >=0.9-cosine regime is gated
    // by AnnRecallSpec on planted dups; nPlanes=8 keeps buckets sparse as
    // the corpus grows). Oracle: same tagged buckets from the same
    // interpolated per-slice coefficients; threshold on raw sim
    "l11_embedding_neardups" -> Q(
      (s, dir) => Ann.embeddingNearDups(
        td(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, threshold = 0.2, nPlanes = 8, nTables = 4)
        .select(col("id1"), col("id2"),
          round(col("cosine_sim"), 6).as("cosine_sim")),
      Some(LshOracles.embeddingNearDupsSql(nPlanes = 8, dim = 64,
        threshold = 0.2, cap = 2000, nTables = 4))),

    // embedding preprocessing: L2-normalize → int8-quantize (the 4×-smaller
    // storage form); norms oracle-checked alongside
    // q8 serialized to CSV on BOTH sides: the driver's pandas comparator
    // cannot hash an array column. Zero-norm guard mirrored in the oracle
    // (l2Normalize passes zero vectors through; a raw divide would NaN).
    "l15_embedding_quantize" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
          .select(col("vec_id"), Ann.l2Normalize(col("embedding")).as("unit"))
        e.select(col("vec_id"),
          array_join(transform(Ann.quantizeInt8(col("unit")), _.cast("string")), ",").as("q8_csv"),
          round(Ann.norm(col("unit")), 6).as("unit_norm"))
      },
      Some("""WITH u AS (SELECT vec_id,
             |  CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0
             |    THEN embedding::DOUBLE[]
             |    ELSE list_transform(embedding::DOUBLE[],
             |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) END AS unit
             |  FROM embeddings)
             |SELECT vec_id,
             |array_to_string(list_transform(unit,
             |  x -> CAST(CAST(round(greatest(-1.0, least(1.0, x)) * 127) AS BIGINT) AS VARCHAR)), ',') AS q8_csv,
             |round(sqrt(list_dot_product(unit, unit)), 6) AS unit_norm FROM u""".stripMargin)),

    // multimodal plumbing: binary payload → typed feature extraction via
    // per-partition batch decode (decode itself is a deterministic stub);
    // byte-level fields are oracle-checked, the stub hash is not exposed here
    "m1_media_features" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.packText(td(s, dir, "documents"), "doc_id", "text")
        Multimodal.extractFeatures(media.as[graft.multimodal.MediaRecord])
          .toDF().select(
            col("media_id"), col("byte_len"), col("first_byte").cast("long").as("first_byte"),
            col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS media_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
             |CAST(64 + octet_length(encode(text)) % 1024 AS BIGINT) AS width,
             |CAST(64 + (ascii(substr(text, 1, 1)) * 7) % 768 AS BIGINT) AS height
             |FROM documents""".stripMargin)),

    // VERIFIED clusters: components over Jaccard-verified pairs, not raw
    // band collisions — the semantically stronger clustering (l13 keeps the
    // candidate-graph shape; this is the quality-gated variant, exact-twin
    // checked end to end)
    "l19_verified_clusters_portable" -> Q(
      (s, dir) => Dedup.nearDupClusters(
        Dedup.nearDupPairs(td(s, dir, "documents"), "text", "doc_id",
            threshold = 0.5, shingleSize = 3, k = 32, bands = 16,
            family = PortableFamily)
          .select(col("id1"), col("id2"))),
      Some(LshOracles.portableVerifiedClustersSql(n = 3, k = 32, bands = 16,
        cap = 1000, threshold = 0.5))),

    // keep-first near-dup detection — the batch twin of the STREAMING
    // detector (Streaming.nearDupDetectStream): linear per-bucket-keeper
    // min + equi-join, no pair explosion. ts = epoch + doc_id seconds makes
    // event-time order ≡ id order, so the portable oracle replays it exactly
    "l17_neardup_detect_portable" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents").select(col("doc_id"),
          timestamp_seconds(lit(946684800L) + col("doc_id")).as("ts"), col("text"))
        Dedup.nearDupDetectBatch(docs, "text", "doc_id", "ts",
          shingleSize = 3, k = 32, bands = 16, family = PortableFamily)
      },
      Some(LshOracles.portableNearDupDetectSql(n = 3, k = 32, bands = 16))),

    // the cleaned corpus: anti-join of documents against l17's verdicts —
    // the one-call near-dup dedupe a training pipeline runs. Oracle: the
    // same detect SQL as an anti-filter
    "l18_neardup_keep_first_portable" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents").select(col("doc_id"),
          timestamp_seconds(lit(946684800L) + col("doc_id")).as("ts"), col("text"))
        Dedup.nearDupKeepFirst(docs, "text", "doc_id", "ts",
            shingleSize = 3, k = 32, bands = 16, family = PortableFamily)
          .select(col("doc_id"))
      },
      Some(s"""WITH dups AS (${LshOracles.portableNearDupDetectSql(n = 3, k = 32, bands = 16)})
              |SELECT doc_id FROM documents
              |WHERE doc_id NOT IN (SELECT doc_id FROM dups)""".stripMargin)),

    // IVF k-means trainer: distributed Lloyd iterations over the embedding
    // corpus. Trained centroids are float-sum nondeterministic at the bit
    // level, so (like a15) the OUTPUT is the externally checkable property:
    // training must not worsen mean routing cost vs the first-k seeds
    // (asserted in-query with a small float-jitter tolerance).
    "l16_ivf_kmeans_train" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = td(s, dir, "embeddings")
        val k = 16
        val seeds = Ann.firstKCentroids(e, "embedding", "vec_id", k)
        val trained = Ann.kmeansCentroids(e, "embedding", "vec_id", k, iters = 3)
        val seedCost = Ann.meanAssignmentCost(e, "embedding", seeds)
        val trainedCost = Ann.meanAssignmentCost(e, "embedding", trained)
        // no assert-throw: cosine-assignment + mean-update Lloyd is not
        // strictly monotone in the 1−cos objective, and the sums are
        // float-nondeterministic — a regression should fail THIS row's
        // hash compare visibly, not kill the whole verify/bench dump
        val improved = trainedCost <= seedCost + 1e-6
        Seq((k.toLong, improved)).toDF("k", "improved")
      },
      Some("SELECT CAST(16 AS BIGINT) AS k, true AS improved"), eager = true),

    // multimodal frame sampling: video-like payload → per-frame rows.
    // The stub decode is a pure function of the payload bytes, so even this
    // path is oracle-checked: DuckDB replays the wrap-around rolling hash
    // via HUGEINT arithmetic mod 2^64 (MediaOracles.sampleFramesSql)
    "m2_media_frames" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.packText(td(s, dir, "documents"), "doc_id", "text", "video")
        Multimodal.sampleFrames(media.as[graft.multimodal.MediaRecord], stride = 64)
          .toDF().select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("frame_hash"))
      },
      Some(MediaOracles.sampleFramesSql(stride = 64))),

    // approximate k-NN SELF-join: every vector's top-3 neighbors among
    // multi-table LSH candidates (same 8-plane × 4-table index as l11) —
    // the "for each doc, its k nearest corpus docs" retrieval shape. The
    // oracle replays buckets, mirrors pairs, and ranks by the same
    // rounded key
    "l37_knn_join" -> Q(
      (s, dir) => Ann.lshKnnJoin(td(s, dir, "embeddings"), "embedding",
        "vec_id", dim = 64, k = 3, nPlanes = 8, nTables = 4),
      Some(LshOracles.lshKnnJoinSql(nPlanes = 8, dim = 64, k = 3,
        cap = 2000, nTables = 4))),

    // SemDeDup-style semantic dedup: nearest-of-16-centroids cells (IVF
    // scorer family, firstKCentroids seed), in-cell pairs only, drop on a
    // lower-id neighbor at cosine >= 0.35 (12% of the fixture — the
    // SemDeDup paper's single-digit-to-low-tens regime); every row comes
    // back with its cell and kept flag (the release-gate form)
    "l38_semantic_dedup" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val centroids = Ann.firstKCentroids(e, "embedding", "vec_id", k = 16)
        Ann.semanticDedup(e, "embedding", "vec_id", centroids, threshold = 0.35)
          .select(col("id").as("vec_id"), col("cell"), col("kept"))
      },
      Some(LshOracles.semanticDedupSql(nCentroids = 16, threshold = 0.35,
        cap = 2000))),

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

    // product quantization encode (Jégou 2011): 64 floats -> 8 codes via
    // per-subspace seed codebooks sliced from the first-16 vectors — a
    // pure function of the DATA, so the oracle rebuilds the identical
    // codebook from the same parquet and replays encoding exactly
    "l52_pq_encode" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        graft.llm.Pq.encode(e, "embedding", "vec_id",
            graft.llm.Pq.seedCodebooks(e, "embedding", "vec_id", m = 8, k = 16))
          .select(col("id").as("vec_id"), col("codes"), col("recon_err"))
      },
      Some("""WITH s AS (SELECT unnest(range(8)) AS sub),
             |seeds AS (
             |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cell
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT s.sub, seeds.cell,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS cent
             |  FROM seeds CROSS JOIN s),
             |v AS (
             |  SELECT vec_id, s.sub,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS sv
             |  FROM embeddings CROSS JOIN s),
             |d AS (
             |  SELECT v.vec_id, v.sub, cb.cell,
             |    round(list_sum(list_transform(range(1, 9),
             |      i -> (sv[i]-cent[i])*(sv[i]-cent[i]))), 6) AS dist
             |  FROM v JOIN cb USING (sub)),
             |r AS (
             |  SELECT vec_id, sub, cell, dist, row_number() OVER (
             |    PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
             |  FROM d)
             |SELECT vec_id,
             |  string_agg(CAST(cell AS VARCHAR), ',' ORDER BY sub) AS codes,
             |  CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS recon_err
             |FROM r WHERE rn = 1 GROUP BY vec_id""".stripMargin)),

    // per-source embedding centroids: elementwise mean vector per domain
    // (the domain-centroid step behind SemDeDup cell seeding and per-
    // source drift monitoring). Output as (source, dim, c) ROWS — no
    // array/string rendering to diverge across engines; one skinny
    // (source, dim) shuffle, map-side partials
    "l58_domain_centroids" -> Q(
      (s, dir) => {
        val j = td(s, dir, "embeddings")
          .join(td(s, dir, "documents").select(col("doc_id"), col("source")),
            col("vec_id") === col("doc_id"))
        // per-element round→DECIMAL before the sum: a raw-double avg is
        // accumulation-order-dependent (Spark partial-merge order is
        // nondeterministic), which can flip the 6-dp round between runs
        // let alone engines; decimal sums are exact and order-free
        j.select(col("source"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("source", "dim")
          .agg(round(
              sum(round(col("v").cast("double"), 9)
                .cast(org.apache.spark.sql.types.DecimalType(20, 9)))
                .cast("double") / count(lit(1)), 6).as("c"),
            count(lit(1)).as("n_docs"))
          .select(col("source"), col("dim").cast("long").as("dim"),
            col("c"), col("n_docs"))
      },
      Some("""WITH j AS (
             |  SELECT d.source, e.embedding
             |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
             |x AS (
             |  SELECT source, unnest(embedding) AS v,
             |    unnest(range(len(embedding))) AS dim
             |  FROM j)
             |SELECT source, CAST(dim AS BIGINT) AS dim,
             |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 9) AS DECIMAL(20,9))) AS DOUBLE)
             |    / count(*), 6) AS c,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM x GROUP BY 1, 2""".stripMargin)),

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

    // split-leakage audit: near-dup candidate pairs that cross a 90/5/5
    // hash split from train into test — the internal-leakage guard
    // benchmark decontamination (l25) can't provide (near-dups hash
    // independently, so a random split WILL put some on both sides)
    "l59_split_leakage" -> Q(
      (s, dir) => graft.llm.Dedup.splitLeakage(
        td(s, dir, "documents"), "text", "doc_id",
        seed = "sp1", trainPct = 90, valPct = 5,
        family = graft.llm.PortableFamily),
      Some(LshOracles.splitLeakageSql(n = 3, k = 32, bands = 8, cap = 1000,
        seed = "sp1", trainPct = 90, valPct = 5))),

    // incremental-ingest dedup: verdicts for a new batch (doc_id % 10 = 0)
    // against the existing corpus — the daily-ingest shape where the
    // corpus reduces to fingerprint/bucket keeper aggregates and is never
    // re-clustered; portable family ⇒ exact DuckDB replay
    "l56_incremental_dedup" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
        graft.llm.Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "text", "doc_id", family = graft.llm.PortableFamily)
      },
      Some(LshOracles.incrementalDedupSql(n = 3, k = 32, bands = 8, mod = 10))),

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

    // PQ-ADC retrieval: the query side of product quantization — score
    // compressed codes against the first vector via per-subspace lookup
    // tables, never decompressing the corpus. Query + codebook + tables
    // all derive from the data, so the oracle replays the ranking exactly
    "l53_pq_adc_topk" -> Q(
      (s, dir) => {
        val e = td(s, dir, "embeddings")
        val cbs = graft.llm.Pq.seedCodebooks(e, "embedding", "vec_id", m = 8, k = 16)
        val query = graft.llm.Ann.firstKCentroids(e, "embedding", "vec_id", 1).head
        graft.llm.Pq.adcTopK(e, "embedding", "vec_id", cbs, query, k = 25)
          .select(col("id").as("vec_id"), col("adc_score"))
      },
      Some("""WITH s AS (SELECT unnest(range(8)) AS sub),
             |seeds AS (
             |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cell
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
             |cb AS (
             |  SELECT s.sub, seeds.cell,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS cent
             |  FROM seeds CROSS JOIN s),
             |qv AS (SELECT embedding AS q FROM embeddings ORDER BY vec_id LIMIT 1),
             |qt AS (
             |  SELECT cb.sub, cb.cell,
             |    CAST(round(list_sum(list_transform(range(1, 9),
             |      i -> (CAST(q[cb.sub*8+i] AS DOUBLE)-cent[i])
             |         * (CAST(q[cb.sub*8+i] AS DOUBLE)-cent[i]))), 6)
             |      AS DECIMAL(18,6)) AS qd
             |  FROM cb CROSS JOIN qv),
             |v AS (
             |  SELECT vec_id, s.sub,
             |    list_transform(embedding[s.sub*8+1 : s.sub*8+8],
             |      x -> CAST(x AS DOUBLE)) AS sv
             |  FROM embeddings CROSS JOIN s),
             |d AS (
             |  SELECT v.vec_id, v.sub, cb.cell,
             |    round(list_sum(list_transform(range(1, 9),
             |      i -> (sv[i]-cent[i])*(sv[i]-cent[i]))), 6) AS dist
             |  FROM v JOIN cb USING (sub)),
             |r AS (
             |  SELECT vec_id, sub, cell, row_number() OVER (
             |    PARTITION BY vec_id, sub ORDER BY dist, cell) AS rn
             |  FROM d)
             |SELECT vec_id, CAST(sum(qt.qd) AS DOUBLE) AS adc_score
             |FROM r JOIN qt ON r.sub = qt.sub AND r.cell = qt.cell
             |WHERE r.rn = 1 GROUP BY vec_id
             |ORDER BY adc_score, vec_id LIMIT 25""".stripMargin)),

    // COMPOSED curation pipeline: normalize (l47) -> learned quality gate
    // (l46) -> md5 keep-first dedup (l1 family) -> per-source funnel
    // report. The operators prove they compose; the oracle is the same
    // CTE chain end to end and stays exact
    "l51_curation_funnel" -> Q(
      (s, dir) => graft.llm.Curation.curationFunnel(
        td(s, dir, "documents"), "doc_id", "text", "source",
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))),
      Some(ClassifierOracles.curationFunnelSql(
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))))),

    // domain-level URL filtering: synthetic doc_id-keyed URLs (l26
    // pattern), hosts extracted with a Java∩RE2 regex, aggregated per
    // domain with a blocklist flag — the corpus-curation step that drops
    // ad/tracker/spam domains wholesale
    "l50_url_domain_filter" -> Q(
      (s, dir) => {
        val doms = array(lit("ads.example.com"), lit("docs.example.org"),
          lit("spam.click.net"), lit("data.example.io"),
          lit("tracker.bad.site"), lit("wiki.example.edu"))
        val aug = concat(col("text"),
          lit(" see https://"), element_at(doms, (col("doc_id") % 6).cast("int") + 1),
          lit("/p/"), col("doc_id").cast("string"),
          when(col("doc_id") % 3 === 0, lit(" and http://mirror.example.net/x"))
            .otherwise(lit("")))
        td(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.llm.TextOps.extractUrlDomains(aug)).as("domain"))
          .groupBy("domain")
          .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_urls"))
          .withColumn("blocked", col("domain")
            .isin("spam.click.net", "tracker.bad.site"))
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text || ' see https://' ||
             |    CASE CAST(doc_id % 6 AS INTEGER)
             |      WHEN 0 THEN 'ads.example.com' WHEN 1 THEN 'docs.example.org'
             |      WHEN 2 THEN 'spam.click.net' WHEN 3 THEN 'data.example.io'
             |      WHEN 4 THEN 'tracker.bad.site' ELSE 'wiki.example.edu' END
             |    || '/p/' || CAST(doc_id AS VARCHAR) ||
             |    CASE WHEN doc_id % 3 = 0 THEN ' and http://mirror.example.net/x' ELSE '' END AS t
             |  FROM documents),
             |d AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
             |  FROM aug)
             |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_urls,
             |  domain IN ('spam.click.net', 'tracker.bad.site') AS blocked
             |FROM d GROUP BY 1""".stripMargin)),

    // SFT chat-template rendering with the loss-mask span: fixture docs
    // become (prompt = first 8 tokens, response = rest); the compared
    // columns are the rendered-string md5 (l29 pattern) plus the EXACT
    // code-point mask offsets SFT loss depends on
    "l49_sft_template" -> Q(
      (s, dir) => {
        val tk = split(trim(col("text")), "\\s+")
        val d = td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(tk, 1, 8), " ").as("prompt"),
          array_join(slice(tk, 9, 1 << 20), " ").as("resp"))
        graft.llm.TextOps.renderSftTemplate(
            d, "doc_id", "prompt", "resp", "You are a helpful assistant.")
          .select(col("id").as("doc_id"), md5(col("rendered")).as("rendered_md5"),
            col("mask_start"), col("mask_len"))
      },
      Some(TextOracles.sftTemplateSql("You are a helpful assistant."))),

    // per-source cap: at most 15 docs per source, hash-chosen — the
    // C4-style "don't let one over-crawled site dominate the mix" ceiling;
    // one exchange on source + per-group sort, engine-reproducible
    "l48_source_cap" -> Q(
      (s, dir) => graft.llm.Sampling.capPerGroup(
        td(s, dir, "documents"), "doc_id", "source", maxPerGroup = 15),
      Some("""WITH h AS (SELECT doc_id, source,
             |    ('0x'||substr(md5('c1' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hv
             |  FROM documents)
             |SELECT doc_id, source, pos FROM (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS BIGINT) AS pos
             |  FROM h) WHERE pos <= 15""".stripMargin)),

    // Unicode ingestion normalization: NFC composition (native codegen'd
    // expression — Spark has no built-in) + control strip + whitespace
    // collapse. Fixture text is clean ASCII, so the row augments it with
    // doc_id-keyed decomposed/control/clean tails (the l26 pattern) to
    // exercise every path; the oracle replays via DuckDB nfc_normalize
    "l47_unicode_normalize" -> Q(
      (s, dir) => {
        val suffix = element_at(array(
          lit("cafe\u0301 touche\u0301"),
          lit("A\u030Angstro\u0308m"),
          lit("bad\u0007ctl\u001Ftail"),
          lit("plain tail")), (col("doc_id") % 4).cast("int") + 1)
        val raw = concat_ws(" ", col("text"), suffix)
        td(s, dir, "documents")
          .select(col("doc_id"), raw.as("_raw"))
          .withColumn("norm_text", graft.llm.TextOps.normalizeText(col("_raw")))
          .select(col("doc_id"), col("norm_text"),
            (col("norm_text") =!= col("_raw")).as("changed"))
      },
      Some(TextOracles.normalizeTextSql)),

    // REAL multimodal decode: per-id real BMP/WAV containers built with
    // every header field a function of the id, parsed back by the pure-JVM
    // header decoders. The oracle recomputes the expected decoded values
    // from doc_id alone — the decode itself is what's under test.
    "m3_media_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = td(s, dir, "documents").select(col("doc_id")).as[Long]
          .map(id => Multimodal.packMediaById(id))
        Multimodal.decodeMedia(media).toDF()
      },
      Some(MediaOracles.decodeSql))
  )
}
