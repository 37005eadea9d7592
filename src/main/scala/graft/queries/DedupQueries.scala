package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, PortableFamily, TextOps}
import Registry.td

/**
 * Dedup-family registry rows (split from LlmQueries, round 9 — pure
 * mechanical move, registry content unchanged): exact/keep-first dedup,
 * MinHash-LSH candidates + portable twins, SimHash, n-gram Jaccard,
 * near-dup clustering, keep-first detection, line/span dedup,
 * split-leakage audit, incremental-ingest dedup. Oracle notes and the
 * portable-twin scheme: see [[LshOracles]].
 */
object DedupQueries {

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

    // exact dedup with a PRIORITY keeper: same 5-token-prefix groups as
    // l1, but the keeper is the LONGEST member (n_chars desc, id asc) —
    // the "keep the best copy" curation form. The packed-long min rides
    // the one hash-agg; the oracle replays the integer packing exactly
    "l61_dedup_keep_best" -> Q(
      (s, dir) => {
        val pre = td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(TextOps.whitespaceTokens(col("text")), 1, 5), " ").as("prefix"),
          col("n_chars"))
        Dedup.exactDedupKeepBest(pre, "prefix", "doc_id", "n_chars")
      },
      Some("""WITH p AS (SELECT doc_id, n_chars,
             |  md5(array_to_string(regexp_split_to_array(trim(text), '\s+')[1:5], ' ')) AS fingerprint
             |  FROM documents),
             |g AS (SELECT fingerprint,
             |    min((1048576 - n_chars) * 8589934592 + doc_id) AS pk,
             |    CAST(count(*) AS BIGINT) AS dup_cnt
             |  FROM p GROUP BY 1)
             |SELECT fingerprint, CAST(pk & 8589934591 AS BIGINT) AS keep_id,
             |  CAST(1048576 - (pk >> 33) AS BIGINT) AS keep_merit, dup_cnt
             |FROM g""".stripMargin)),

    // corpus-level line dedup (CCNet/RefinedWeb boilerplate removal):
    // lines in >= 3 distinct docs removed everywhere, docs rebuilt in
    // order; heavy-line set broadcast, md5 keeps output rows small
    "l30_line_dedup" -> Q(
      (s, dir) => graft.llm.Dedup.lineDedup(
          td(s, dir, "documents"), "doc_id", "text", minDf = 3)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_lines"), col("n_removed")),
      Some(TextOracles.lineDedupSql(minDf = 3))),

    // repeated-span scrubbing (bucketed exact-substring dedup, Lee et al.
    // 2021): token runs covered by 8-grams appearing in >= 2 distinct docs
    // removed everywhere; md5 keeps output rows small
    "l34_repeated_span_scrub" -> Q(
      (s, dir) => Dedup.repeatedSpanScrub(
          td(s, dir, "documents"), "doc_id", "text", n = 8, minDf = 2)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_tokens"), col("n_removed")),
      Some(TextOracles.repeatedSpanScrubSql(n = 8, minDf = 2))),

    // MinHash-LSH near-dup candidates (xxhash64 scale path). DuckDB cannot
    // replay xxhash64, so the registered OUTPUT is the property audit
    // (graft.llm.DedupAudit, round 11 — the a15/a17 sketch-oracle
    // precedent): planted completeness (every exact shingle-Jaccard ≥ 0.9
    // pair is a candidate), soundness (every candidate shares ≥ 1 exact
    // shingle), canonical order, no duplicates. The oracle recomputes the
    // planted count exactly and expects every violation counter = 0. The
    // raw pair output (and its full exact-twin replay) is l5p below. Plan
    // property unchanged: single shuffle on (band_id, band_hash), no
    // crossJoin; the audit adds one AllPairs prefix join (τ=0.9 ⇒ tiny
    // prefixes) and candidate-keyed joins off a localCheckpointed frame
    "l5_minhash_lsh_pairs" -> Q(
      (s, dir) => graft.llm.DedupAudit.minhashCandidateAudit(
        td(s, dir, "documents"), "text", "doc_id", shingleSize = 3, k = 32, bands = 16),
      Some(LshOracles.minhashAuditSql(n = 3)), eager = true),

    // portable-family twin of l5: identical staged pipeline, md5-derived
    // universal hashes → the ENTIRE LSH pipeline (shingle, sign, band,
    // bucket, pair) is cross-checked against a DuckDB exact twin
    "l5p_minhash_lsh_pairs_portable" -> Q(
      (s, dir) => Dedup.minhashCandidatePairs(
        td(s, dir, "documents"), "text", "doc_id", shingleSize = 3, k = 32, bands = 16,
        family = PortableFamily),
      Some(LshOracles.minhashPortableSql(n = 3, k = 32, bands = 16, cap = 1000))),

    // One-Permutation-Hashing MinHash candidates (Li-Owen-Zhang 2012 +
    // Shrivastava-Li rotation densification): the SIGNATURE-stage scale
    // path — one native-expression pass over the shingle hashes (O(n+k))
    // instead of k seed-mix transforms (O(n·k)); same single shuffle on
    // (band_id, band_hash), same capped buckets. Portable family: bins,
    // mins, rotation borrows, and band folds all replayed in DuckDB
    "l113_oph_minhash_pairs" -> Q(
      (s, dir) => Dedup.ophCandidatePairs(
        td(s, dir, "documents"), "text", "doc_id", shingleSize = 3, k = 32,
        bands = 16, family = PortableFamily),
      Some(LshOracles.ophPairsSql(n = 3, k = 32, bands = 16, cap = 1000))),

    // LSH candidates verified with exact n-gram Jaccard (xxhash64 scale
    // path) — property-audit output like l5: planted completeness,
    // soundness (emitted Jaccard recomputed from raw shingle STRINGS, an
    // independent path from the hashed-shingle one that produced it, and
    // re-tested against the threshold), structure. Raw pairs: l6p
    "l6_ngram_jaccard_neardups" -> Q(
      (s, dir) => graft.llm.DedupAudit.nearDupPairsAudit(
        td(s, dir, "documents"), "text", "doc_id",
        threshold = 0.5, shingleSize = 3, k = 32, bands = 16),
      Some(LshOracles.nearDupAuditSql(n = 3)), eager = true),

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
    // Property-audit output (xxhash64 token hashes aren't DuckDB-replayable):
    // planted = identical lowered token MULTISETS (SimHash is a multiset
    // function — hamming 0 ⇒ identical block slices ⇒ guaranteed pair),
    // soundness = every emitted pair has token-set Jaccard ≥ 1/10 (a15-style
    // empirical-deterministic floor; measured minima sit far above it),
    // structure. Raw pairs: l7p
    "l7_simhash_neardups" -> Q(
      (s, dir) => graft.llm.DedupAudit.simhashAudit(
        td(s, dir, "documents"), "text", "doc_id", maxHamming = 3, blocks = 4),
      Some(LshOracles.simhashAuditSql), eager = true),

    // portable twin of l7: same vote/block/hamming pipeline over md5-derived
    // 60-bit token hashes a DuckDB CTE chain replays exactly
    "l7p_simhash_neardups_portable" -> Q(
      (s, dir) => Dedup.simhashNearDupsPortable(
        td(s, dir, "documents"), "text", "doc_id", maxHamming = 3, blocks = 4),
      Some(LshOracles.portableSimhashNearDupsSql(maxHamming = 3, blocks = 4, cap = 1000))),

    // near-dup clusters: LSH candidates → connected components → the
    // keep-one-per-cluster assignment (rows-only)
    // Property-audit output (cluster shapes ride the xx candidate graph):
    // planted pairs co-clustered, every candidate edge's endpoints share a
    // label (label propagation CONVERGED), labels are idempotent minima,
    // unique membership. Raw cluster assignment: l13p
    "l13_neardup_clusters" -> Q(
      (s, dir) => graft.llm.DedupAudit.clustersAudit(
        td(s, dir, "documents"), "text", "doc_id",
        shingleSize = 3, k = 32, bands = 16),
      Some(LshOracles.clustersAuditSql(n = 3)), eager = true),

    // portable-family twin of l13: connected components over the SAME
    // candidate graph the oracle derives (recursive-CTE reachability)
    "l13p_neardup_clusters_portable" -> Q(
      (s, dir) => Dedup.nearDupClusters(
        Dedup.minhashCandidatePairs(td(s, dir, "documents"), "text", "doc_id",
          shingleSize = 3, k = 32, bands = 16, family = PortableFamily)),
      Some(LshOracles.portableClustersSql(n = 3, k = 32, bands = 16, cap = 1000))),

    // rolling-hash document fingerprint — property-audit output: the
    // fingerprint is a pure function of the token SEQUENCE (same sequence
    // ⇒ same fp; distinct sequences ⇒ distinct fps at 64 bits; REVERSED
    // non-palindromic sequences ⇒ different fp — the order-sensitivity a
    // bag-of-words hash fails). Raw fingerprints: l8p
    "l8_doc_fingerprint" -> Q(
      (s, dir) => graft.llm.DedupAudit.fingerprintAudit(
        td(s, dir, "documents"), "text", "doc_id"),
      Some(LshOracles.fingerprintAuditSql), eager = true),

    // portable twin of l8: same order-sensitive fold with modular
    // arithmetic a DuckDB recursive CTE replays exactly
    "l8p_doc_fingerprint_portable" -> Q(
      (s, dir) => td(s, dir, "documents").select(
        col("doc_id"), TextOps.portableDocFingerprint(col("text")).as("fingerprint")),
      Some(LshOracles.portableFingerprintSql)),

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

    // release/snapshot diff: incremental-dedup verdicts (batch = doc_id
    // % 7 = 0 vs the rest) collapsed to the carried/near-dup/fresh
    // summary + distinct-parent counts a corpus-release review reads
    "l76_snapshot_diff" -> Q(
      (s, dir) => {
        val docs = td(s, dir, "documents")
        Dedup.snapshotDiffReport(
          docs.filter(col("doc_id") % 7 === 0),
          docs.filter(col("doc_id") % 7 =!= 0),
          "text", "doc_id", family = PortableFamily)
      },
      Some(s"""WITH v AS (${LshOracles.incrementalDedupSql(n = 3, k = 32, bands = 8, mod = 7)})
              |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(count(DISTINCT dup_of) AS BIGINT) AS n_distinct_parents
              |FROM v GROUP BY 1""".stripMargin)),

    // EXACT set-similarity self-join with prefix filtering (AllPairs/
    // PPJoin): every pair with token-set Jaccard >= 3/5, no banding
    // probability — the deterministic complement to l5/l6. Registered on
    // a 1/10 slice: "report every pair" is inherently quadratic inside
    // the synthetic corpus's template mega-clusters (~71k true pairs at
    // sf0.01 full-corpus, ~100x that at sf0.1) — the exact form is for
    // bounded slices (per-source shards, incremental batches, audit
    // reruns); LSH (l5/l6) remains the full-corpus scale path. Threshold
    // tested in exact integer arithmetic on both engines
    "l70_prefix_jaccard_join" -> Q(
      (s, dir) => graft.llm.SetSimJoin.prefixJaccardJoin(
        td(s, dir, "documents").filter(col("doc_id") % 10 === 3),
        "text", "doc_id", tNum = 3, tDen = 5),
      Some("""WITH toks AS (SELECT DISTINCT doc, tok FROM (
             |    SELECT doc_id AS doc, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             |    FROM documents WHERE doc_id % 10 = 3)),
             |freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1),
             |ord AS (SELECT t.doc, t.tok,
             |    row_number() OVER (PARTITION BY t.doc ORDER BY f.df, t.tok) AS rn,
             |    CAST(count(*) OVER (PARTITION BY t.doc) AS BIGINT) AS n
             |  FROM toks t JOIN freq f USING (tok)),
             |pref AS (SELECT doc, tok, n FROM ord
             |  WHERE rn <= n - ((3 * n + 4) // 5) + 1),
             |cand AS (SELECT DISTINCT a.doc AS id1, b.doc AS id2, a.n AS size1, b.n AS size2
             |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc < b.doc
             |  WHERE greatest(a.n, b.n) * 3 <= least(a.n, b.n) * 5),
             |i AS (SELECT c.id1, c.id2, c.size1, c.size2, CAST(count(*) AS BIGINT) AS inter
             |  FROM cand c JOIN toks x ON x.doc = c.id1
             |  JOIN toks y ON y.doc = c.id2 AND y.tok = x.tok
             |  GROUP BY 1, 2, 3, 4)
             |SELECT id1, id2, size1, size2, inter,
             |  round(inter / (size1 + size2 - inter), 6) AS jaccard
             |FROM i WHERE inter * 5 >= (size1 + size2 - inter) * 3""".stripMargin)),

    // EXACT asymmetric CONTAINMENT join over 5-gram shingle sets: the
    // quote/subset-duplicate detector Jaccard structurally misses (a
    // paragraph inside a long article has tiny Jaccard, containment ≈ 1).
    // Prefix filter is exact for containment (a qualifying intersection
    // can't fit in the probe's non-prefix); the container side indexes
    // ALL its shingles. Same 1/10-slice registration as l70 — exact
    // pair reporting is for bounded slices; LSH is the full-corpus path.
    // The oracle computes ground truth from all shared-shingle pairs,
    // which equals the prefix-filtered output because tau > 0
    "l87_containment_join" -> Q(
      (s, dir) => graft.llm.SetSimJoin.containmentJoin(
        td(s, dir, "documents").filter(col("doc_id") % 10 === 7),
        "text", "doc_id", n = 5, tNum = 1, tDen = 2),
      Some("""WITH shs AS (
             |  SELECT doc_id AS doc, list_distinct(list_transform(range(1, len(t)-3),
             |    i -> ('0x'||substr(md5(array_to_string(t[i:i+4], ' ')),1,15))::BIGINT)) AS sh
             |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM documents WHERE doc_id % 10 = 7)
             |  WHERE len(t) >= 5),
             |e AS (SELECT doc, unnest(sh) AS h FROM shs),
             |n AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n FROM shs),
             |p AS (SELECT a.doc AS id_in, b.doc AS id_out, CAST(count(*) AS BIGINT) AS inter
             |  FROM e a JOIN e b ON a.h = b.h AND a.doc <> b.doc GROUP BY 1, 2),
             |j AS (SELECT p.id_in, p.id_out, na.n AS n_in, nb.n AS n_out, p.inter
             |  FROM p JOIN n na ON na.doc = p.id_in JOIN n nb ON nb.doc = p.id_out)
             |SELECT id_in, id_out, n_in, n_out, inter,
             |  round(inter / n_in, 6) AS containment
             |FROM j
             |WHERE (n_in < n_out OR (n_in = n_out AND id_in < id_out))
             |  AND inter * 2 >= n_in * 1""".stripMargin)),
  )
}
