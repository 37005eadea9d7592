package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdw, tdEventsUs}

/**
 * Retrieval / feature / ordering half of the text family (round-13 file
 * split of [[TextQueries]], pure mechanical move, registry content
 * unchanged; Registry.all concatenates this right after TextQueries so
 * the global inventory order is preserved): inverted index, BM25, epoch
 * shuffle, FIM, surprisal, TF-IDF, CMS heavy hitters, quality
 * classifier + calibration, accent folding, word dropout, token entropy,
 * feature hashing, prefix-cache ordering, mixture interleave.
 */
object TextRetrievalQueries {

  val all: Seq[(String, Q)] = Seq(

    // l127 — cross-document n-gram diversity per source (llm/Diversity):
    // type-token ratio + singleton fraction over 3-grams — the Gopher
    // repetition signal lifted from document scope to SOURCE scope (a
    // templating crawl collapses ttr between snapshots). Counting key is
    // the portable 60-bit md5 hash of the gram (8-byte shuffle key,
    // engine-identical collisions); one exploded hash-agg, no windows
    "l127_ngram_diversity" -> Q(
      (s, dir) => graft.llm.Diversity.ngramDiversity(
        td(s, dir, "documents"), "source", "text", n = 3),
      Some("""WITH toks AS (SELECT source,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |  FROM documents
             |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3),
             |gr AS (SELECT source,
             |    unnest(list_transform(range(1, len(t)-1),
             |      i -> array_to_string(t[i:i+2], ' '))) AS g
             |  FROM toks),
             |h AS (SELECT source,
             |    CAST(('0x'||substr(md5(g),1,15)) AS BIGINT) AS hg FROM gr),
             |c AS (SELECT source, hg, count(*) AS c FROM h GROUP BY 1, 2)
             |SELECT source AS grp, CAST(sum(c) AS BIGINT) AS total_ngrams,
             |  CAST(count(*) AS BIGINT) AS distinct_ngrams,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS singleton_ngrams,
             |  CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_micro
             |FROM c GROUP BY 1""".stripMargin)),

    // l129 — duplicate-WEIGHTED sampling (llm/Diversity): weight 1/s and
    // a deterministic 1/s keep flag per member of a size-s exact-dup
    // cluster (count-proportional down-weighting; E[kept per cluster]=1,
    // reproducible across engines/retries). Cluster key = first-5-word
    // prefix (the l1 planted-duplicate fixture); one fingerprint
    // hash-agg + one fingerprint-keyed join, all integer thresholds
    "l129_dup_weighted_sample" -> Q(
      (s, dir) => graft.llm.Diversity.dupWeightedSample(
        td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
            .as("prefix")),
        "doc_id", "prefix"),
      Some("""WITH f AS (SELECT doc_id,
             |    array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:5], ' ') AS p
             |  FROM documents),
             |h AS (SELECT doc_id,
             |    CAST(('0x'||substr(md5(p),1,15)) AS BIGINT) AS fp FROM f),
             |s AS (SELECT fp, CAST(count(*) AS BIGINT) AS cluster_size
             |  FROM h GROUP BY 1)
             |SELECT doc_id, cluster_size,
             |  CAST(1000000 // cluster_size AS BIGINT) AS weight_micro,
             |  CAST(('0x'||substr(md5('d1' || chr(31) || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
             |    < 1152921504606846976 // cluster_size AS kept
             |FROM h JOIN s USING (fp)""".stripMargin)),

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

    // reciprocal-rank fusion (Cormack et al. 2009): three BM25 probe
    // rankings fused by Σ 10⁹ div (60 + rank) — the hybrid-search combiner
    // (lexical + dense lists fuse identically: only RANKS enter, so no
    // cross-system score calibration). Inputs are k-bounded lists, so the
    // fusion windows never see the corpus
    "l130_rrf_fusion" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
        def bm25(terms: Seq[String]) = graft.llm.Index.bm25TopK(
          docs, "doc_id", "text", terms, topK = 25)
        graft.llm.RetrievalEval.rrfFuse(
          Seq(bm25(Seq("join", "vector", "filter", "merge")),
            bm25(Seq("hash", "sort", "shuffle")),
            bm25(Seq("stream", "filter", "window"))),
          "doc_id", "score", kConst = 60, topK = 20)
      },
      Some(TextOracles.rrfFusionSql(
        Seq(Seq("join", "vector", "filter", "merge"),
          Seq("hash", "sort", "shuffle"),
          Seq("stream", "filter", "window")),
        listTopK = 25, kConst = 60, topK = 20))),

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
        tdw(s, dir, "documents"), "doc_id", "text"),
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
          tdw(s, dir, "documents"), "doc_id", "text", dropPct = 10, seed = "d1")
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
