package graft.queries

import graft.llm.{Ann, PortableFamily}

/**
 * DuckDB oracle SQL generators for the LSH/ANN query family. These are the
 * exact-twin checks VERDICT r3 asked for: every constant the Spark side uses
 * (universal-hash seeds, hyperplane coefficients) is interpolated into the
 * SQL from the SAME Scala values, so both engines compute the identical
 * pipeline — shingling, banding, bucketing, probing, ranking — end to end.
 *
 * All-pairs forms (exact Jaccard, recursive-CTE components) are only viable
 * at oracle scale (sf0.01, ~500 docs); the Spark side is the scale path.
 */
object LshOracles {

  private val P = PortableFamily.P

  /** Shared CTE prefix: tokenized docs (short docs excluded, mirroring the
    * lshBands pre-filter) + distinct string shingles. */
  private def shingleCtes(n: Int, src: String = "documents"): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM $src
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $n),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-${n - 2}),
       |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS sh
       |  FROM toks)""".stripMargin

  /** Exact all-pairs n-gram Jaccard ≥ threshold: the oracle for
    * l6_ngram_jaccard_neardups. Matches Spark's rounded-then-filtered
    * semantics (jaccard() rounds to 6 dp before the threshold filter). */
  def exactJaccardPairsSql(n: Int, threshold: Double): String =
    s"""WITH ${shingleCtes(n)},
       |p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
       |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id)
       |SELECT id1, id2, jaccard FROM p WHERE jaccard >= $threshold""".stripMargin

  /** Connected components (min-reachable-id labels) over the exact-Jaccard
    * near-dup graph: the oracle for l13_neardup_clusters. */
  def exactJaccardClustersSql(n: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${shingleCtes(n)},
       |p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
       |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= $threshold),
       |edges AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** Shared prefix: tokenize → md5-hash shingles → portable signatures →
    * banded (doc_id, band_id, band_hash) rows; also exposes `hsh(doc_id,
    * sh)` (hashed shingles) for downstream Jaccard verify. */
  private[queries] def bandedCtes(n: Int, k: Int, bands: Int,
                                  src: String = "documents"): String = {
    require(k % bands == 0)
    val rows = k / bands
    val sigExprs = (0 until k).map { i =>
      val (a, b) = PortableFamily.seeds(i)
      s"list_min(list_transform(sh, h -> ($a*(h%$P)+$b)%$P))"
    }.mkString(",\n    ")
    // band hash: fold acc = (acc*8191 + sig[j]) % P over the band's rows,
    // seeded with the band id — identical to PortableFamily.bandHash
    val bandHash = (1 to rows).foldLeft("r.range") { (acc, j) =>
      s"(($acc)*8191 + sg[$rows*r.range+$j]) % $P"
    }
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM $src
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $n),
       |hsh AS (
       |  SELECT doc_id, list_transform(range(1, len(t)-${n - 2}),
       |    i -> ('0x'||substr(md5(array_to_string(t[i:i+${n - 1}], ' ')),1,15))::BIGINT) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id, [$sigExprs] AS sg FROM hsh),
       |banded AS (
       |  SELECT doc_id, r.range AS band_id, $bandHash AS band_hash
       |  FROM sig CROSS JOIN range(0,$bands) r)""".stripMargin
  }

  /** [[bandedCtes]] + capped buckets + within-bucket pairing — the shared
    * body of the pair/cluster twins. Ends with `cand(id1, id2)`. */
  private def candidateCtes(n: Int, k: Int, bands: Int, cap: Int): String =
    s"""${bandedCtes(n, k, bands)},
       |buckets AS (
       |  SELECT band_id, band_hash, list_sort(list(doc_id)) AS ids
       |  FROM banded GROUP BY 1,2 HAVING count(*) BETWEEN 2 AND $cap),
       |pl AS (
       |  SELECT unnest(flatten(list_transform(ids,
       |    x -> list_transform(list_filter(ids, y -> y > x), y -> [x, y])))) AS pr
       |  FROM buckets),
       |cand AS (
       |  SELECT DISTINCT pr[1] AS id1, pr[2] AS id2 FROM pl)""".stripMargin

  /** Connected components over the VERIFIED near-dup graph (portable LSH
    * candidates + exact shingle-Jaccard ≥ threshold) — the exact twin of
    * `nearDupClusters(nearDupPairs(..., family = PortableFamily))`: the
    * semantically stronger clustering (band-collision false edges removed
    * before components form). */
  def portableVerifiedClustersSql(n: Int, k: Int, bands: Int, cap: Int,
                                  threshold: Double): String =
    s"""WITH RECURSIVE ${candidateCtes(n, k, bands, cap)},
       |dsh AS (SELECT doc_id, list_distinct(sh) AS sh FROM hsh),
       |vp AS (
       |  SELECT c.id1, c.id2
       |  FROM cand c JOIN dsh a ON c.id1 = a.doc_id JOIN dsh b ON c.id2 = b.doc_id
       |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= $threshold),
       |edges AS (SELECT id1 AS a, id2 AS b FROM vp UNION SELECT id2, id1 FROM vp),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** Keep-first near-dup DETECTION — the exact twin of
    * `nearDupDetectBatch(..., family = PortableFamily)` when the ts column
    * is monotone in doc_id (the fixture's ts = epoch + doc_id): per-bucket
    * keeper = min doc_id; a doc's dup_of = the minimum keeper among its
    * buckets whose keeper precedes it. */
  def portableNearDupDetectSql(n: Int, k: Int, bands: Int): String =
    s"""WITH ${bandedCtes(n, k, bands)},
       |bmin AS (
       |  SELECT band_id, band_hash, min(doc_id) AS keeper
       |  FROM banded GROUP BY 1, 2),
       |d AS (
       |  SELECT b.doc_id, min(m.keeper) AS dup_of
       |  FROM banded b JOIN bmin m USING (band_id, band_hash)
       |  WHERE m.keeper < b.doc_id GROUP BY 1)
       |SELECT doc_id, dup_of FROM d""".stripMargin

  /** Full MinHash-LSH candidate pipeline with the portable hash family:
    * the exact twin of `minhashCandidatePairs(..., family = PortableFamily)`. */
  def minhashPortableSql(n: Int, k: Int, bands: Int, cap: Int): String =
    s"""WITH ${candidateCtes(n, k, bands, cap)}
       |SELECT id1, id2 FROM cand""".stripMargin

  /** Portable LSH candidates + exact shingle-Jaccard verify — the exact twin
    * of `nearDupPairs(..., family = PortableFamily)`. Jaccard is computed
    * over DISTINCT hashed shingles on both sides (same md5-derived hashes),
    * rounded to 6 dp BEFORE the threshold filter, mirroring [[graft.llm.Dedup.jaccard]]. */
  def portableNearDupPairsSql(n: Int, k: Int, bands: Int, cap: Int,
                              threshold: Double): String =
    s"""WITH ${candidateCtes(n, k, bands, cap)},
       |dsh AS (SELECT doc_id, list_distinct(sh) AS sh FROM hsh),
       |j AS (
       |  SELECT c.id1, c.id2,
       |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
       |  FROM cand c JOIN dsh a ON c.id1 = a.doc_id JOIN dsh b ON c.id2 = b.doc_id)
       |SELECT id1, id2, jaccard FROM j WHERE jaccard >= $threshold""".stripMargin

  /** Connected components (min-reachable-id labels) over the portable LSH
    * CANDIDATE graph — the exact twin of
    * `nearDupClusters(minhashCandidatePairs(..., family = PortableFamily))`,
    * which clusters unverified candidates (no Jaccard step), matching the
    * registered l13 shape. */
  def portableClustersSql(n: Int, k: Int, bands: Int, cap: Int): String =
    s"""WITH RECURSIVE ${candidateCtes(n, k, bands, cap)},
       |edges AS (SELECT id1 AS a, id2 AS b FROM cand UNION SELECT id2, id1 FROM cand),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** Portable rolling doc fingerprint — the exact twin of
    * [[graft.llm.TextOps.portableDocFingerprint]]: a recursive CTE replays
    * the identical left-fold (acc·8191 + md5-hash60(token)) mod P over
    * whitespace tokens, in order. */
  def portableFingerprintSql: String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |f(doc_id, i, acc) AS (
       |  SELECT doc_id, 0, CAST(0 AS BIGINT) FROM toks
       |  UNION ALL
       |  SELECT f.doc_id, f.i + 1,
       |    (f.acc*8191 + ('0x'||substr(md5(t[f.i+1]),1,15))::BIGINT) % $P
       |  FROM f JOIN toks USING (doc_id) WHERE f.i < len(t))
       |SELECT f.doc_id, f.acc AS fingerprint
       |FROM f JOIN toks USING (doc_id) WHERE f.i = len(t)""".stripMargin

  /** Portable SimHash near-dup pairs — the exact twin of
    * `simhashNearDupsPortable`: md5-derived 60-bit token hashes, per-bit
    * majority vote (strictly positive), byte-slice blocking with capped
    * buckets, hamming-verified pairs. */
  def portableSimhashNearDupsSql(maxHamming: Int, blocks: Int, cap: Int): String = {
    val bits = 64 / blocks
    val mask = (1L << bits) - 1
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |hv AS (SELECT doc_id, ('0x'||substr(md5(w),1,15))::BIGINT AS h FROM tok),
       |votes AS (
       |  SELECT doc_id, r.range AS b,
       |    SUM(CASE WHEN (h >> CAST(r.range AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hv CROSS JOIN range(0, 60) r GROUP BY 1, 2),
       |sh AS (
       |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1),
       |sl AS (
       |  SELECT doc_id, simhash, r.range AS block_id,
       |    (simhash >> CAST(r.range * $bits AS INTEGER)) & $mask AS slice
       |  FROM sh CROSS JOIN range(0, $blocks) r),
       |bk AS (
       |  SELECT block_id, slice FROM sl GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $cap),
       |p AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM sl a
       |  JOIN sl b ON a.block_id = b.block_id AND a.slice = b.slice
       |    AND a.doc_id < b.doc_id
       |  JOIN bk ON bk.block_id = a.block_id AND bk.slice = a.slice)
       |SELECT id1, id2, hamming FROM p WHERE hamming <= $maxHamming""".stripMargin
  }

  /** Exact twin of [[graft.llm.Dedup.splitLeakage]]: portable banded
    * candidates (capped), hash-split membership recomputed per side, pairs
    * crossing train→test in either orientation. */
  def splitLeakageSql(n: Int, k: Int, bands: Int, cap: Int,
                      seed: String, trainPct: Int, valPct: Int): String = {
    val testPct = trainPct + valPct
    val esc = OracleSqlUtil.esc(seed)
    s"""WITH ${candidateCtes(n, k, bands, cap)},
       |sp AS (
       |  SELECT doc_id,
       |    ('0x'||substr(md5('$esc' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 100 AS b
       |  FROM documents)
       |SELECT CASE WHEN s1.b >= $testPct THEN c.id1 ELSE c.id2 END AS test_id,
       |  CASE WHEN s1.b >= $testPct THEN c.id2 ELSE c.id1 END AS train_id
       |FROM cand c
       |JOIN sp s1 ON c.id1 = s1.doc_id
       |JOIN sp s2 ON c.id2 = s2.doc_id
       |WHERE (s1.b >= $testPct AND s2.b < $trainPct)
       |   OR (s2.b >= $testPct AND s1.b < $trainPct)""".stripMargin
  }

  /** Exact twin of [[graft.llm.Dedup.incrementalDedup]] with corpus =
    * `doc_id % mod <> 0` and new batch = `doc_id % mod = 0`: md5 exact
    * fingerprints, portable banded buckets reduced to per-bucket corpus
    * keepers, bucket-collision near verdicts, exact-beats-near. The
    * banded CTE runs ONCE over all docs and splits downstream — band
    * hashes are per-doc, independent of the split. */
  def incrementalDedupSql(n: Int, k: Int, bands: Int, mod: Int): String =
    s"""WITH ${bandedCtes(n, k, bands)},
       |nb AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % $mod = 0),
       |ex AS (SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keeper
       |  FROM documents WHERE doc_id % $mod <> 0 GROUP BY 1),
       |bc AS (SELECT band_id, band_hash, CAST(min(doc_id) AS BIGINT) AS keeper
       |  FROM banded WHERE doc_id % $mod <> 0 GROUP BY 1, 2),
       |bn AS (SELECT doc_id, band_id, band_hash FROM banded WHERE doc_id % $mod = 0),
       |near AS (SELECT bn.doc_id, min(bc.keeper) AS keeper
       |  FROM bn JOIN bc ON bn.band_id = bc.band_id AND bn.band_hash = bc.band_hash
       |  GROUP BY 1),
       |e AS (SELECT nb.doc_id, ex.keeper FROM nb JOIN ex USING (fp))
       |SELECT nb.doc_id,
       |  CASE WHEN e.keeper IS NOT NULL THEN 'exact_dup'
       |       WHEN near.keeper IS NOT NULL THEN 'near_dup'
       |       ELSE 'unique' END AS verdict,
       |  COALESCE(e.keeper, near.keeper) AS dup_of
       |FROM nb LEFT JOIN e USING (doc_id) LEFT JOIN near USING (doc_id)""".stripMargin

  /** One-Permutation-Hashing banded CTEs — the exact twin of
    * [[graft.llm.Dedup.lshBandsOph]] with [[PortableFamily]]: md5 60-bit
    * shingle hashes (already < 2⁶⁰, so [[graft.llm.OphMinHash]]'s mask is
    * the identity), per-(doc, h mod k) bin mins, rotation densification
    * (empty bin j borrows min[(j+t) mod k] + t·C for the smallest t), and
    * the SAME per-band modular fold as [[bandedCtes]]. */
  private[queries] def ophBandedCtes(n: Int, k: Int, bands: Int): String = {
    require(k % bands == 0)
    val rows = k / bands
    val c = graft.llm.OphMinHash.C
    val bandHash = (1 to rows).foldLeft("r.range") { (acc, j) =>
      s"(($acc)*8191 + sg[$rows*r.range+$j]) % $P"
    }
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $n),
       |hsh AS (
       |  SELECT doc_id, list_transform(range(1, len(t)-${n - 2}),
       |    i -> ('0x'||substr(md5(array_to_string(t[i:i+${n - 1}], ' ')),1,15))::BIGINT) AS sh
       |  FROM toks),
       |binmin AS (
       |  SELECT doc_id, h % $k AS bin, min(h) AS mv
       |  FROM (SELECT doc_id, unnest(sh) AS h FROM hsh) GROUP BY 1, 2),
       |binsx AS (SELECT doc_id, r.range AS j FROM hsh CROSS JOIN range(0, $k) r),
       |tdist AS (
       |  SELECT b.doc_id, b.j, min((m.bin - b.j + $k) % $k) AS t
       |  FROM binsx b JOIN binmin m USING (doc_id) GROUP BY 1, 2),
       |sigv AS (
       |  SELECT t.doc_id, t.j, m.mv + t.t * $c AS s
       |  FROM tdist t JOIN binmin m ON m.doc_id = t.doc_id
       |    AND m.bin = (t.j + t.t) % $k),
       |sig AS (SELECT doc_id, list(s ORDER BY j) AS sg FROM sigv GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, r.range AS band_id, $bandHash AS band_hash
       |  FROM sig CROSS JOIN range(0,$bands) r)""".stripMargin
  }

  /** Full OPH MinHash-LSH candidate pipeline, portable family — the exact
    * twin of `ophCandidatePairs(..., family = PortableFamily)`. */
  def ophPairsSql(n: Int, k: Int, bands: Int, cap: Int): String =
    s"""WITH ${ophBandedCtes(n, k, bands)},
       |buckets AS (
       |  SELECT band_id, band_hash, list_sort(list(doc_id)) AS ids
       |  FROM banded GROUP BY 1,2 HAVING count(*) BETWEEN 2 AND $cap),
       |pl AS (
       |  SELECT unnest(flatten(list_transform(ids,
       |    x -> list_transform(list_filter(ids, y -> y > x), y -> [x, y])))) AS pr
       |  FROM buckets)
       |SELECT DISTINCT pr[1] AS id1, pr[2] AS id2 FROM pl""".stripMargin

  // ---- property-audit oracles for the xxhash64 scale paths (round 11) ----
  //
  // DuckDB cannot replay xxhash64, so l5/l6/l7/l8/l13 are gated on OUTPUT
  // PROPERTIES (graft.llm.DedupAudit): the oracle derives the data-driven
  // expectations (planted-pair counts, doc counts) independently from
  // documents.parquet with exact integer arithmetic, and expects every
  // violation counter the Spark side measured to be 0.

  /** Exact ground-truth pairs with n-gram-shingle Jaccard ≥ tNum/tDen —
    * the engine-neutral planted set of [[graft.llm.DedupAudit.plantedPairs]]
    * (shared-shingle join; the Spark side uses the AllPairs prefix join,
    * both exact so the sets are identical). Ends with `planted(id1, id2)`. */
  /** Cap-admissible doc universe (the DedupAudit.capAdmissible twin):
    * exact-text duplicate groups above the bucket cap are excluded from
    * planting — the cap drops them whole by design. */
  private def admCte(cap: Int): String =
    s"""adm AS (SELECT doc_id, text FROM (
       |    SELECT doc_id, text, count(*) OVER (PARTITION BY text) AS _tg
       |    FROM documents) WHERE _tg <= $cap)"""
      .stripMargin

  private def plantedCtes(n: Int, tNum: Int, tDen: Int,
                          cap: Int = 1000): String =
    s"""${admCte(cap)},
       |${shingleCtes(n, src = "adm")},
       |se AS (SELECT doc_id, unnest(sh) AS h FROM shs),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shs),
       |ip AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS inter
       |  FROM se a JOIN se b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |planted AS (
       |  SELECT ip.id1, ip.id2 FROM ip
       |  JOIN sz na ON na.doc_id = ip.id1 JOIN sz nb ON nb.doc_id = ip.id2
       |  WHERE ip.inter * $tDen >= (na.n + nb.n - ip.inter) * $tNum)""".stripMargin

  private def zeroMetrics(names: Seq[String]): String =
    names.map(m => s"UNION ALL SELECT '$m', CAST(0 AS BIGINT)").mkString("\n")

  /** Property oracle for l5 (MinHash-LSH candidates, xxhash64 family). */
  def minhashAuditSql(n: Int): String =
    s"""WITH ${plantedCtes(n, 9, 10)}
       |SELECT 'planted_pairs' AS metric, CAST(count(*) AS BIGINT) AS value FROM planted
       |${zeroMetrics(Seq("planted_missed", "zero_overlap_pairs", "misordered", "dup_rows"))}""".stripMargin

  /** Property oracle for l6 (verified near-dup pairs, xxhash64 family). */
  def nearDupAuditSql(n: Int): String =
    s"""WITH ${plantedCtes(n, 9, 10)}
       |SELECT 'planted_pairs' AS metric, CAST(count(*) AS BIGINT) AS value FROM planted
       |${zeroMetrics(Seq("planted_missed", "below_threshold", "jaccard_mismatch",
          "misordered", "dup_rows"))}""".stripMargin

  /** Property oracle for l7 (SimHash near-dups): planted = identical
    * lowered token MULTISETS (SimHash is a multiset function — hamming 0
    * ⇒ same bucket in every block). */
  def simhashAuditSql: String = simhashAuditSql(1000)

  def simhashAuditSql(cap: Int): String =
    s"""WITH ${admCte(cap)},
       |mk AS (
       |  SELECT doc_id, md5(array_to_string(
       |    list_sort(regexp_split_to_array(trim(lower(text)), '\\s+')), ' ')) AS k
       |  FROM adm),
       |planted AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM mk a JOIN mk b ON a.k = b.k AND a.doc_id < b.doc_id)
       |SELECT 'planted_pairs' AS metric, CAST(count(*) AS BIGINT) AS value FROM planted
       |${zeroMetrics(Seq("planted_missed", "low_overlap_pairs", "misordered", "dup_rows"))}""".stripMargin

  /** Property oracle for l8 (rolling-hash fingerprint): the fingerprint is
    * a pure injective-in-practice function of the token SEQUENCE. */
  def fingerprintAuditSql: String =
    s"""SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
       |UNION ALL SELECT 'distinct_keys', CAST(count(DISTINCT
       |  array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' ')) AS BIGINT)
       |FROM documents
       |${zeroMetrics(Seq("key_fp_mismatch", "fp_collisions", "order_collisions"))}""".stripMargin

  /** Property oracle for l13 (near-dup clusters over the xx candidate graph). */
  def clustersAuditSql(n: Int): String =
    s"""WITH ${plantedCtes(n, 9, 10)}
       |SELECT 'planted_pairs' AS metric, CAST(count(*) AS BIGINT) AS value FROM planted
       |${zeroMetrics(Seq("split_planted", "edge_violations", "keeper_violations",
          "dup_ids", "uncovered_ids"))}""".stripMargin
}
