package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScanPar.widen

/**
 * Property audits for the xxhash64-family dedup scale paths (l5/l6/l7/l8/
 * l13): DuckDB cannot replay xxhash64, so these rows are verified by
 * OUTPUT PROPERTIES instead of output replay — the a15/a17 sketch-oracle
 * precedent ("the output IS the property"). Each audit runs the scale-path
 * operator unchanged, then checks, IN SPARK, properties whose expected
 * values a DuckDB oracle derives independently from documents.parquet:
 *
 *  - **Planted completeness.** A pair whose exact 3-gram-shingle Jaccard
 *    is ≥ 9/10 collides in at least one of 16 two-row bands with
 *    probability ≥ 1 − (1 − 0.9²)¹⁶ ≈ 1 − 1.4·10⁻¹² over the hash-family
 *    draw — and for the FIXED xxhash64 family the outcome is a
 *    deterministic fact of the data, verified at sf0.01/sf0.1 (the same
 *    empirical-deterministic footing as a15's "HLL within 5%" flag).
 *    The planted set itself is exact and engine-neutral: computed here
 *    with the AllPairs prefix join ([[SetSimJoin.prefixJaccardJoinElems]],
 *    integer threshold arithmetic) and in DuckDB with a shared-shingle
 *    join — identical sets by exactness of both algorithms.
 *  - **Soundness.** Every emitted candidate pair shares ≥ 1 exact shingle
 *    (a band collision equates two min-hashes, which equates two shingle
 *    hashes; a 64-bit cross-shingle collision is the only escape). For
 *    verified pairs (l6) the emitted Jaccard is recomputed from raw
 *    shingle STRINGS — an independent path from the hashed-shingle one
 *    that produced it.
 *  - **Structure.** Canonical id1 < id2, no duplicate rows; for clusters:
 *    label idempotence (cluster_id = min member id), edge consistency
 *    (every candidate edge's endpoints share a label — i.e. the label
 *    propagation actually converged), unique membership.
 *
 * Output is long-format `(metric STRING, value BIGINT)` — the oracle
 * computes the data-derived rows (planted counts, doc counts) exactly and
 * expects every violation counter to be 0.
 *
 * Scale: the audit adds one AllPairs prefix join (τ = 0.9 ⇒ prefixes are
 * ~1/10 of each doc's rarest shingles; 3-gram shingles are near-unique so
 * bucket fan-out is tiny) and small joins keyed on the candidate set. The
 * candidate frame is localCheckpointed once — audit legs never re-run the
 * LSH pipeline.
 */
object DedupAudit {

  /** Long-format audit row. */
  private def metricRow(df: DataFrame, name: String): DataFrame =
    df.agg(count(lit(1)).cast("long").as("value"))
      .select(lit(name).as("metric"), col("value"))

  /** Exact ground-truth near-dup pairs: shingle-set Jaccard ≥ tNum/tDen
    * over distinct n-gram shingles (lowered, whitespace-tokenized — the
    * same staging as [[Dedup.lshBands]]). Engine-neutral: DuckDB replays
    * it from raw strings. Returns (id1, id2), id1 < id2. */
  def plantedPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int, tNum: Int, tDen: Int,
                   capExclude: Int = Int.MaxValue): DataFrame =
    SetSimJoin.prefixJaccardJoinElems(
      widen(capAdmissible(df, textCol, capExclude))
        .select(col(idCol).as("doc"),
          explode(TextOps.shingles(col(textCol), n)).as("tok"))
        .distinct(),
      tNum, tDen)
      .select(col("id1"), col("id2"))

  /**
   * The cap-ADMISSIBLE planted universe: docs whose EXACT-text duplicate
   * group exceeds the LSH bucket cap are excluded from planting. Such a
   * group provably shares every band bucket (identical text ⇒ identical
   * signatures), so the cap drops it whole by design — its recall is the
   * documented cap-drop semantics (DropStats + the measured recall
   * gates), not an audit violation. The remaining limit is explicit: a
   * NEAR-identical (not byte-identical) cluster above the cap would
   * still trip the zero-invariant — the audit contract assumes near-dup
   * clusters beyond exact-dup groups stay under the cap. Replayed in the
   * oracle as a count(*) OVER (PARTITION BY text) pre-filter.
   */
  private def capAdmissible(df: DataFrame, textCol: String,
                            capExclude: Int): DataFrame =
    if (capExclude == Int.MaxValue) df
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(textCol))
      df.withColumn("_tg", count(lit(1)).over(w))
        .filter(col("_tg") <= capExclude).drop("_tg")
    }

  /** Distinct string shingles per doc, keyed for pair-side joins. */
  private def shingleSets(df: DataFrame, textCol: String, idCol: String,
                          n: Int): DataFrame =
    widen(df).select(col(idCol).as("sid"),
      array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))

  /** Join (id1, id2) pairs to both docs' shingle sets → adds sh1, sh2. */
  private def withShingles(pairs: DataFrame, sh: DataFrame): DataFrame =
    pairs
      .join(sh, pairs("id1") === sh("sid")).withColumnRenamed("sh", "sh1").drop("sid")
      .join(sh, pairs("id2") === sh("sid")).withColumnRenamed("sh", "sh2").drop("sid")

  /** Structural legs shared by all pair-emitting audits. */
  private def structureRows(pairs: DataFrame): Seq[DataFrame] = Seq(
    metricRow(pairs.filter(col("id1") >= col("id2")), "misordered"),
    metricRow(pairs.groupBy("id1", "id2").count().filter(col("count") > 1), "dup_rows"))

  private def plantedRows(planted: DataFrame, pairs: DataFrame): Seq[DataFrame] = Seq(
    metricRow(planted, "planted_pairs"),
    metricRow(planted.join(pairs.select("id1", "id2"), Seq("id1", "id2"), "left_anti"),
      "planted_missed"))

  /** l5 audit: MinHash-LSH candidate pairs (xxhash64 scale path). */
  def minhashCandidateAudit(df: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, k: Int = 32,
                            bands: Int = 16,
                            maxBucketSize: Int = 1000): DataFrame = {
    val cands = Dedup.minhashCandidatePairs(df, textCol, idCol, shingleSize, k, bands,
      maxBucketSize = maxBucketSize)
      .localCheckpoint()
    val planted = plantedPairs(df, textCol, idCol, shingleSize, 9, 10,
      capExclude = maxBucketSize).localCheckpoint()
    val zeroOverlap = withShingles(cands, shingleSets(df, textCol, idCol, shingleSize))
      .filter(size(array_intersect(col("sh1"), col("sh2"))) === 0)
    (plantedRows(planted, cands) ++
      Seq(metricRow(zeroOverlap, "zero_overlap_pairs")) ++
      structureRows(cands)).reduce(_ unionByName _)
  }

  /** l6 audit: Jaccard-verified near-dup pairs (xxhash64 scale path). */
  def nearDupPairsAudit(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double, shingleSize: Int = 3, k: Int = 32,
                        bands: Int = 16,
                        maxBucketSize: Int = 1000): DataFrame = {
    val pairs = Dedup.nearDupPairs(df, textCol, idCol, threshold, shingleSize, k, bands,
      maxBucketSize = maxBucketSize)
      .localCheckpoint()
    val planted = plantedPairs(df, textCol, idCol, shingleSize, 9, 10,
      capExclude = maxBucketSize).localCheckpoint()
    // independent recompute: Jaccard from raw shingle STRINGS (the emitted
    // value came from xxhash64-hashed shingles) — identical modulo 2⁻⁶⁴
    // collisions, same 6-dp round-then-compare as the emitting filter
    val re = withShingles(pairs, shingleSets(df, textCol, idCol, shingleSize))
      .withColumn("jstr", Dedup.jaccard(col("sh1"), col("sh2")))
    (plantedRows(planted, pairs) ++ Seq(
      metricRow(re.filter(col("jstr") < threshold), "below_threshold"),
      metricRow(re.filter(col("jstr") =!= col("jaccard")), "jaccard_mismatch")) ++
      structureRows(pairs)).reduce(_ unionByName _)
  }

  /**
   * l7 audit: SimHash near-dup pairs. SimHash is a token-MULTISET
   * function, so the guaranteed-planted set is pairs with identical
   * lowered token multisets (hamming 0 ⇒ identical block slices ⇒ same
   * bucket in every block). The soundness leg is empirical-deterministic
   * (a15-style): hamming ≤ 3 of 64 with the per-token vote structure
   * implies heavy token overlap — every emitted pair must have token-set
   * Jaccard ≥ 1/10 (measured minima via `Drive simhashfloor`: 0.862 at
   * sf0.01, 0.500 at sf0.1 and sf1 — ≥ 5× margin).
   */
  def simhashAudit(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, blocks: Int = 4,
                   maxBucketSize: Int = 1000): DataFrame = {
    val pairs = Dedup.simhashNearDups(df, textCol, idCol, maxHamming, blocks,
      maxBucketSize = maxBucketSize)
      .localCheckpoint()
    val key = array_join(array_sort(TextOps.whitespaceTokens(lower(col(textCol)))), " ")
    // same cap-admissible planted universe as the MinHash audits: an
    // identical-text group above the bucket cap drops whole by design
    val keyed = capAdmissible(df, textCol, maxBucketSize)
      .select(col(idCol).as("doc"), md5(key).as("mk"))
    val planted = keyed.as("a").join(keyed.as("b"),
        col("a.mk") === col("b.mk") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"))
    val toks = widen(df).select(col(idCol).as("sid"),
      array_distinct(TextOps.whitespaceTokens(lower(col(textCol)))).as("sh"))
    val overlap = withShingles(pairs, toks)
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("un", size(array_union(col("sh1"), col("sh2"))))
    (plantedRows(planted, pairs) ++
      Seq(metricRow(overlap.filter(col("inter") * 10 < col("un")), "low_overlap_pairs")) ++
      structureRows(pairs)).reduce(_ unionByName _)
  }

  /**
   * l8 audit: rolling-hash document fingerprint. The fingerprint is a
   * pure function of the whitespace token SEQUENCE (NOT lowered — order
   * sensitivity is the point), so: same token sequence ⇒ same fingerprint
   * (mismatch counter), distinct sequences ⇒ distinct fingerprints
   * (collision counter; 64-bit, empirical-deterministic), and reversing a
   * non-palindromic token sequence must CHANGE the fingerprint — the
   * property a bag-of-words hash fails (order counter).
   */
  def fingerprintAudit(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextOps.whitespaceTokens(col(textCol))
    val fold = (arr: Column) => aggregate(arr, lit(0L), (acc, t) => xxhash64(acc, t))
    val fp = df.select(col(idCol),
        md5(array_join(toks, " ")).as("key"),
        TextOps.docFingerprint(col(textCol)).as("fp"),
        fold(reverse(toks)).as("fp_rev"),
        (reverse(toks) === toks).as("palin"))
      .localCheckpoint()
    val perKey = fp.groupBy("key")
      .agg(countDistinct(col("fp")).as("nfp"))
    Seq(
      metricRow(fp, "n_docs"),
      perKey.agg(count(lit(1)).cast("long").as("value"))
        .select(lit("distinct_keys").as("metric"), col("value")),
      metricRow(perKey.filter(col("nfp") > 1), "key_fp_mismatch"),
      fp.select("key", "fp").distinct()
        .agg((count(lit(1)) - countDistinct(col("fp"))).cast("long").as("value"))
        .select(lit("fp_collisions").as("metric"), col("value")),
      metricRow(fp.filter(!col("palin") && col("fp") === col("fp_rev")),
        "order_collisions")).reduce(_ unionByName _)
  }

  /** l13 audit: connected-component clusters over the xxhash64 candidate
    * graph — ADMITTED planted pairs land in one cluster, every edge's
    * endpoints share a label (convergence), labels are idempotent minima,
    * and each doc appears exactly once. Candidate-stage recall (planted
    * pairs whose bucket the cap dropped whole) is DropStats/recall-gate
    * territory, not a clustering violation — see splitPlanted below. */
  def clustersAudit(df: DataFrame, textCol: String, idCol: String,
                    shingleSize: Int = 3, k: Int = 32,
                    bands: Int = 16, maxBucketSize: Int = 1000): DataFrame = {
    val cands = Dedup.minhashCandidatePairs(df, textCol, idCol, shingleSize, k, bands,
      maxBucketSize = maxBucketSize)
      .localCheckpoint()
    val labels = Dedup.nearDupClusters(cands).localCheckpoint()
    val planted = plantedPairs(df, textCol, idCol, shingleSize, 9, 10,
      capExclude = maxBucketSize).localCheckpoint()
    val lab1 = labels.select(col("id").as("id1"), col("cluster_id").as("c1"))
    val lab2 = labels.select(col("id").as("id2"), col("cluster_id").as("c2"))
    // CLUSTERING-stage invariant only: a planted pair the label
    // propagation ADMITTED (both sides labeled) must never land in two
    // clusters. Pairs that never entered the candidate graph — e.g. a
    // boilerplate mega-cluster whose LSH bucket was cap-dropped WHOLE
    // (the documented scale semantics, surfaced by DropStats and bounded
    // by the measured recall gates) — are candidate-stage recall, not a
    // clustering violation; the skew replica (CORRECTNESS_SKEW) is
    // exactly the fixture that distinguishes the two stages.
    val splitPlanted = planted
      .join(lab1, Seq("id1")).join(lab2, Seq("id2"))
      .filter(col("c1") =!= col("c2"))
    val edgeViolations = cands.join(lab1, "id1").join(lab2, "id2")
      .filter(col("c1") =!= col("c2"))
    val keeperViolations = labels.groupBy("cluster_id")
      .agg(min(col("id")).as("m")).filter(col("m") =!= col("cluster_id"))
    val dupIds = labels.groupBy("id").count().filter(col("count") > 1)
    val uncovered = cands.select(col("id1").as("id"))
      .unionByName(cands.select(col("id2").as("id"))).distinct()
      .join(labels.select("id"), Seq("id"), "left_anti")
    Seq(
      metricRow(planted, "planted_pairs"),
      metricRow(splitPlanted, "split_planted"),
      metricRow(edgeViolations, "edge_violations"),
      metricRow(keeperViolations, "keeper_violations"),
      metricRow(dupIds, "dup_ids"),
      metricRow(uncovered, "uncovered_ids")).reduce(_ unionByName _)
  }
}
