package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdw}

/**
 * Tokenizer / packing-family registry rows (split from TextQueries,
 * round 11 — pure mechanical move on the family seam, registry content
 * unchanged; Registry.all concatenates this BEFORE TextQueries so the
 * global inventory order is preserved): token counting, the BPE tokenizer
 * family (encode, vocab stats, round-trip, fertility), sequence packing +
 * packing efficiency, vocabulary growth, length/dup histograms, n-gram
 * novelty, consecutive overlap, and the corpus report.
 */
object TokenizerQueries {

  val all: Seq[(String, Q)] = Seq(
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

    // l118 — full WORDPIECE encoding (Wu et al. 2016, BERT's greedy
    // longest-match-first scan; graft.llm.WordPiece): the third tokenizer
    // family next to BPE (l21, rank-greedy) and unigram-LM (l93, Viterbi).
    // The whole token sequence is hash-compared; the oracle replays the
    // identical scan in a recursive CTE over the SAME interpolated vocab
    "l118_wordpiece_encode" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"),
        graft.llm.WordPiece.encodeTokens(col("text")).as("wp_text")),
      Some(WordPieceOracles.encodeSql(graft.llm.WordPiece.DefaultVocab))),

    // l119 — WordPiece OOV audit: per-language word/token/[UNK] totals —
    // the out-of-vocabulary rate a tokenizer migration gates on. Both
    // engines re-derive from their own replay of the encoding, so the
    // aggregate cross-checks the scan independently of l118's hash.
    // ([UNK] words emit exactly one '[UNK]' piece and no vocab piece can
    // equal '[UNK]' — uppercase/brackets aren't in the seed charset — so
    // counting '[UNK]' pieces == counting UNK words.)
    "l119_wordpiece_unk_audit" -> Q(
      (s, dir) => {
        val enc = graft.llm.WordPiece.encodeTokens(col("text"))
        tdw(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("lang"),
            TextOps.tokenCount(col("text")).as("words"),
            when(length(enc) === 0, 0L)
              .otherwise(size(split(enc, " ")).cast("long")).as("wp"),
            when(length(enc) === 0, 0L)
              .otherwise(size(filter(split(enc, " "), t => t === "[UNK]")).cast("long"))
              .as("unk"))
          .groupBy("lang").agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum("words").cast("long").as("n_words"),
            sum("wp").cast("long").as("wp_tokens"),
            sum("unk").cast("long").as("wp_unk_words"))
      },
      Some(WordPieceOracles.unkAuditSql(graft.llm.WordPiece.DefaultVocab))),

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

    // l116 — packing-EFFICIENCY audit (Johnson 1973): bins used by l23's
    // streaming next-fit fold vs first-fit-decreasing vs the
    // ceil(tokens/capacity) lower bound, with micro-unit utilizations —
    // the one-row report that decides whether pre-sorting bins is worth
    // a materialization. Same one-shuffle chunk shape as l23
    "l116_packing_efficiency" -> Q(
      (s, dir) => graft.llm.Packing.packingEfficiency(
        td(s, dir, "documents"), "doc_id", "text",
        binCapacity = 512L, chunkSize = 32L),
      Some(BpeOracles.packingEfficiencySql(graft.llm.Bpe.DefaultMerges,
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

    // Heaps-law vocabulary growth: per decile of the id range, NEW types
    // first seen there (+ their df) and cumulative vocabulary — the "is
    // the corpus still adding types?" audit curve. Types are 3-gram
    // shingles (the synthetic generator's UNIGRAM vocab saturates in
    // decile 0 — a 1-row curve; trigram types keep growing, so the hash
    // check exercises all 10 rows). One token hash-agg; the window sorts
    // 10 rows, not the corpus
    "l71_vocab_growth" -> Q(
      (s, dir) => graft.llm.CorpusStats.vocabGrowth(
        tdw(s, dir, "documents"), "doc_id",
        TextOps.shingles(col("text"), 3), nBuckets = 10),
      Some("""WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |    FROM documents WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3),
             |toks AS (SELECT doc_id AS doc, unnest(list_distinct(list_transform(range(1, len(t)-1),
             |    i -> array_to_string(t[i:i+2], ' ')))) AS tok FROM tk),
             |ft AS (SELECT tok, min(doc) AS first_doc, CAST(count(*) AS BIGINT) AS df
             |  FROM toks GROUP BY 1),
             |n AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n_ids FROM documents),
             |pb AS (SELECT CAST(least((first_doc * 10) // n_ids, 9) AS BIGINT) AS bucket,
             |    CAST(count(*) AS BIGINT) AS new_types, CAST(sum(df) AS BIGINT) AS new_type_docfreq
             |  FROM ft, n GROUP BY 1)
             |SELECT bucket, new_types, new_type_docfreq,
             |  CAST(sum(new_types) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
             |FROM pb""".stripMargin)),

    // per-language tokenizer FERTILITY (tokens/word, chars/token) from
    // the trained BPE — the "how expensive is each language to tokenize"
    // table a multilingual data budget is planned around. Exact integer
    // sums; the only doubles are the two final divisions
    "l77_bpe_fertility" -> Q(
      (s, dir) => {
        val d = td(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("lang"),
            coalesce(graft.llm.Bpe.countTokens(col("text")), lit(0L)).as("bpe"),
            TextOps.tokenCount(col("text")).as("words"),
            length(col("text")).cast("long").as("chars"))
        d.groupBy("lang").agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum("bpe").cast("long").as("n_bpe_tokens"),
          sum("words").cast("long").as("n_words"),
          sum("chars").cast("long").as("n_chars"),
          round(sum("bpe").cast("double")
            / nullif(sum("words"), lit(0L)).cast("double"), 6).as("tokens_per_word"),
          round(sum("chars").cast("double")
            / nullif(sum("bpe"), lit(0L)).cast("double"), 6).as("chars_per_token"))
      },
      Some(BpeOracles.fertilitySql(graft.llm.Bpe.DefaultMerges))),

    // per-source log2 token-length histogram: the packing/context-window
    // planner's input. Bucket = binary-digit count (exact at power-of-two
    // boundaries, no floating log); one (source,bucket) hash-agg
    "l78_length_histogram" -> Q(
      (s, dir) => graft.llm.CorpusStats.lengthHistogram(
        td(s, dir, "documents"), "source", "text"),
      Some("""WITH t AS (SELECT source,
             |    CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
             |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS tc
             |  FROM documents)
             |SELECT source,
             |  CAST(CASE WHEN tc <= 0 THEN -1
             |    ELSE len(format('{:b}', tc)) - 1 END AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(tc) AS BIGINT) AS n_tokens,
             |  CAST(min(tc) AS BIGINT) AS min_tokens,
             |  CAST(max(tc) AS BIGINT) AS max_tokens
             |FROM t GROUP BY 1, 2""".stripMargin)),

    // per-doc 8-gram novelty: fraction of a doc's shingles FIRST seen in
    // that doc — the duplication/memorization audit; low novelty =
    // recycled text even without a single near-dup partner. Explode →
    // min-id agg → shingle join → per-doc agg; no windows, no all-pairs
    "l75_ngram_novelty" -> Q(
      (s, dir) => graft.llm.CorpusStats.ngramNovelty(
        tdw(s, dir, "documents"), "doc_id", "text", n = 8),
      Some("""WITH tk AS (SELECT doc_id,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
             |shs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' ')))) AS sh
             |  FROM tk WHERE len(t) >= 8),
             |f AS (SELECT sh, min(doc_id) AS first_doc FROM shs GROUP BY 1)
             |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*), 6) AS novelty
             |FROM shs s JOIN f USING (sh) GROUP BY 1""".stripMargin)),

    // per-source consecutive-doc trigram overlap: the "template mill"
    // crawl diagnostic — mean adjacent-doc Jaccard + high-overlap pair
    // count per source. One shuffle on source; decimal-summed mean
    "l74_consecutive_overlap" -> Q(
      (s, dir) => graft.llm.CorpusStats.consecutiveOverlap(
        tdw(s, dir, "documents"), "doc_id", "source", "text",
        n = 3, highThreshold = 0.5),
      Some("""WITH tk AS (SELECT doc_id, source,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
             |shs AS (SELECT doc_id, source,
             |    CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(range(1, len(t)-1),
             |      i -> array_to_string(t[i:i+2], ' '))) ELSE [] END AS sh
             |  FROM tk),
             |pr AS (SELECT source, sh,
             |    lag(sh) OVER (PARTITION BY source ORDER BY doc_id) AS psh FROM shs),
             |j AS (SELECT source,
             |    round(CAST(len(list_intersect(sh, psh)) AS DOUBLE)
             |      / (len(sh) + len(psh) - len(list_intersect(sh, psh))), 6) AS j
             |  FROM pr WHERE psh IS NOT NULL AND len(sh) > 0 AND len(psh) > 0)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
             |  round(CAST(sum(CAST(j AS DECIMAL(18,6))) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS mean_jaccard,
             |  CAST(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM j GROUP BY 1""".stripMargin)),

    // duplicate-group size histogram + keep-first dedup savings over the
    // l1 fingerprint groups: one row per group size with group/doc counts
    // and the exact chars a keep-smallest-id dedup would delete (keeper
    // weight via min_by/arg_min — deterministic, ids are unique)
    "l72_dup_histogram" -> Q(
      (s, dir) => graft.llm.CorpusStats.dupSizeHistogram(
        td(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          Dedup.exactFingerprint(
            array_join(slice(TextOps.whitespaceTokens(col("text")), 1, 5), " ")).as("fp")),
        "fp", "doc_id", "n_chars"),
      Some("""WITH p AS (SELECT doc_id, n_chars,
             |    md5(array_to_string(regexp_split_to_array(trim(text), '\s+')[1:5], ' ')) AS fp
             |  FROM documents),
             |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS group_size,
             |    CAST(sum(n_chars) AS BIGINT) AS total_w,
             |    CAST(arg_min(n_chars, doc_id) AS BIGINT) AS keeper_w
             |  FROM p GROUP BY 1)
             |SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(group_size) - count(*) AS BIGINT) AS n_redundant_docs,
             |  CAST(sum(total_w - keeper_w) AS BIGINT) AS removable_weight
             |FROM g GROUP BY 1""".stripMargin)),

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

  )
}
