package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ScanPar.widen

/**
 * Pluggable hash family for the MinHash-LSH pipeline. Two members:
 *
 *  - [[Xx64Family]] (default): xxhash64 token-composed shingle hashes — the
 *    fast path (PERF.md rule #2: hash early, never build shingle strings).
 *  - [[PortableFamily]]: md5-derived shingle hashes + universal-hash seed
 *    mixes + modular band folds. Slower (string shingles + md5), but every
 *    step is exactly reproducible in ANSI SQL, so the DuckDB oracle can
 *    cross-check the ENTIRE LSH pipeline end-to-end (shingling, banding,
 *    bucketing, pairing) — the verification the xx-family can't have.
 *
 * Both run the identical staged pipeline in [[Dedup.lshBands]]; only the
 * hash arithmetic differs.
 */
sealed trait MinHashFamily {
  /** Stage 1: per-row array materialized before shingle hashing. */
  private[graft] def stage1(text: Column, n: Int): Column
  /** Stage 2: array<bigint> shingle hashes from the stage-1 column. */
  private[graft] def stage2(c: Column, n: Int): Column
  /** Seed-mix of one 64-bit shingle hash for signature row i. */
  private[graft] def seedMix(h: Column, i: Int): Column
  /** Hash of one band's signature slice (band id acts as the seed). */
  private[graft] def bandHash(sigSlice: Column, b: Int): Column
  /** True when hashing is expensive enough that a multi-consumer plan
    * should pay one exchange to materialize hashed output rather than
    * recompute it per consumer (md5: yes; xxhash64: recompute is cheaper
    * than shuffling wide shingle arrays — measured both ways at sf0.1). */
  private[graft] def exchangeWorthMaterializing: Boolean
}

object Xx64Family extends MinHashFamily {
  private[graft] def stage1(text: Column, n: Int): Column = TextOps.tokenHashes(text)
  private[graft] def stage2(c: Column, n: Int): Column =
    TextOps.shingleHashesFromTokenHashes(c, n)
  private[graft] def seedMix(h: Column, i: Int): Column = xxhash64(h, lit(i))
  private[graft] def bandHash(sigSlice: Column, b: Int): Column =
    xxhash64(sigSlice, lit(b))
  private[graft] def exchangeWorthMaterializing: Boolean = false
}

object PortableFamily extends MinHashFamily {
  /** Modulus for the universal hash family (2^31 - 1, prime): products
    * a_i * (h mod P) stay < 2^62, safe under ANSI long arithmetic. */
  val P = 2147483647L

  /** Fixed (a_i, b_i) seeds — java.util.Random(42) is LCG-spec'd, so these
    * are stable constants; the DuckDB oracle SQL interpolates the SAME
    * values (generated from this very sequence, not re-derived). */
  val seeds: IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    IndexedSeq.fill(64)(
      ((rng.nextInt(Int.MaxValue - 1) + 1).toLong, rng.nextInt(Int.MaxValue).toLong))
  }

  private[graft] def stage1(text: Column, n: Int): Column = TextOps.shingles(text, n)
  private[graft] def stage2(c: Column, n: Int): Column =
    transform(c, s => TextOps.portableHash60(s))
  private[graft] def seedMix(h: Column, i: Int): Column = {
    val (a, b) = seeds(i)
    (lit(a) * (h % lit(P)) + lit(b)) % lit(P)
  }
  private[graft] def bandHash(sigSlice: Column, b: Int): Column =
    aggregate(sigSlice, lit(b.toLong), (acc, v) => (acc * lit(8191L) + v) % lit(P))
  private[graft] def exchangeWorthMaterializing: Boolean = true
}

/**
 * Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.
 *
 * Scale design (the 100 TB contract): near-dup detection is ALWAYS bucketed —
 * signatures are computed per-row with expression-only code (no shuffle),
 * candidate generation shuffles once on (band_id, band_hash), and pairs are
 * compared only within buckets. There is no crossJoin anywhere; worst-case
 * skew (a giant bucket of identical docs) is bounded by `maxBucketSize`.
 */
object Dedup extends ExactDedupOps with SimHashDedupOps {

  /**
   * MinHash signature over word `n`-gram shingles: `k` independent hash
   * functions, each the min over shingles of xxhash64(seed_i ++ shingle).
   * Expression-only (transform/aggregate over the shingle array) — computed
   * in the scan stage, no shuffle, no UDF.
   */
  /** Convenience inline form — prefer the staged pipeline in [[lshBands]]
    * for hot paths (this inlines token hashing into the signature). */
  def minhashSignature(text: Column, shingleSize: Int, k: Int): Column =
    minhashFromShingles(TextOps.shingles(text, shingleSize), k)

  /**
   * MinHash from a pre-materialized HASHED-shingle array column
   * ([[TextOps.shingleHashes]]): k seed-mixes of each 64-bit shingle hash,
   * min-folded per seed. Accepts string shingles too (hashed first).
   */
  def minhashFromShingles(sh: Column, k: Int,
                          family: MinHashFamily = Xx64Family): Column = {
    val hashes = (0 until k).map { i =>
      array_min(transform(sh, h => family.seedMix(h, i)))
    }
    // Empty shingle array → NULL signature (not an array of 32 nulls): a
    // caller that bands a null signature gets per-band constant buckets
    // instead of silently collapsing every short doc into one mega-bucket.
    // [[lshBands]] pre-filters short docs so this branch never fires there.
    when(size(sh) > 0, array(hashes: _*)).otherwise(lit(null).cast("array<bigint>"))
  }

  /**
   * [[minhashFromShingles]] over HASHED shingles (array<bigint>) via the
   * native one-pass [[MinHashSeeds]] expression — BIT-IDENTICAL values
   * (round-14 spec proves expr ≡ HOF per family), one array traversal, no
   * per-seed Catalyst array allocations. The HOF form was the suite's
   * hottest stage (16 CPU-seconds per l5/l6/l13 run at sf0.1). The
   * string-shingle convenience path must keep the HOF ([[minhashSignature]]
   * hashes raw strings inside seedMix — a different value domain).
   */
  private[graft] def minhashFromHashedShingles(sh: Column, k: Int,
                                               family: MinHashFamily): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    val portable = family match {
      case PortableFamily => true
      case _ => false
    }
    when(size(sh) > 0, column(MinHashSeeds(expression(sh), k, portable)))
      .otherwise(lit(null).cast("array<bigint>"))
  }

  /**
   * LSH banding: split the k-wide signature into `bands` bands of k/bands
   * rows each; each band hashes to one bucket key. Docs sharing ANY band
   * bucket become candidate pairs.
   *
   * Returns (idCol, carry..., band_id, band_hash) — one row per doc per
   * band; `carry` columns (e.g. an event-time column for the streaming
   * detector) ride through the staged projections unchanged.
   */
  def lshBands(df: DataFrame, textCol: String, idCol: String,
               shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
               family: MinHashFamily = Xx64Family,
               carry: Seq[String] = Nil): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rows = k / bands
    val carried = carry.map(col)
    // Stage token hashes → shingle hashes → signature as SEPARATE
    // projections: inlining any stage into the next re-evaluates it per
    // reference (measured 40× slowdown on the signature, quadratic blowup
    // on per-element `get`s against an inlined transform).
    // Docs with fewer than `shingleSize` tokens have NO shingles and thus no
    // MinHash signature — drop them BEFORE the staged projections with a
    // cheap token-count predicate. Filtering mid-pipeline on size(_sh) is a
    // trap: PushDownPredicates substitutes the aliases and re-inlines the
    // whole tokenize→hash→shingle chain into the scan-level Filter, turning
    // the scan O(tokens²) per row (measured 12–20× at sf0.1). The source
    // predicate below is linear, evaluated once, and semantically identical
    // (size(_sh) > 0 ⟺ n_tokens ≥ shingleSize).
    // widen: the signature pipeline is the suite's densest per-row compute;
    // a one-row-group source would run it single-task (ScanPar doc).
    val withSig = widen(df)
      .filter(size(TextOps.whitespaceTokens(col(textCol))) >= shingleSize)
      .select(col(idCol) +: carried :+ family.stage1(col(textCol), shingleSize).as("_s1"): _*)
      .select(col(idCol) +: carried :+ family.stage2(col("_s1"), shingleSize).as("_sh"): _*)
      .select(col(idCol) +: carried :+ minhashFromHashedShingles(col("_sh"), k, family).as("_sig"): _*)
    val bandHashes = (0 until bands).map(b => family.bandHash(slice(col("_sig"), b * rows + 1, rows), b))
    withSig.select(col(idCol) +: carried :+ posexplode(array(bandHashes: _*)).as(Seq("band_id", "band_hash")): _*)
  }

  /**
   * Batch near-dup DETECTION, keep-first semantics: a doc is a near-dup if
   * any of its LSH buckets contains an EARLIER doc (by (tsCol, idCol));
   * `dup_of` is the earliest such bucket-keeper across its buckets. Unlike
   * pair generation this is LINEAR — per-bucket min + one equi-join back,
   * no pair explosion, so giant boilerplate buckets need no cap. The batch
   * twin of [[graft.streaming.Streaming.nearDupDetectStream]]; with
   * [[PortableFamily]] it is exactly reproducible in the DuckDB oracle.
   *
   * Returns (idCol, dup_of) for dup docs only (keepers are absent).
   */
  def nearDupDetectBatch(df: DataFrame, textCol: String, idCol: String,
                         tsCol: String, shingleSize: Int = 3, k: Int = 32,
                         bands: Int = 8,
                         family: MinHashFamily = Xx64Family): DataFrame = {
    // Explicit repartition on the bucket keys: the banded frame feeds BOTH
    // the keeper aggregation and the join probe; without a shared exchange
    // the whole signature pipeline (the expensive part) is computed twice —
    // the broadcast-join fast path reads the probe side directly. One
    // exchange, reused by both consumers (AQE stage reuse), near-halves the
    // work (measured 9.4 s → 5.4 s at sf0.1 with the portable family).
    val banded = lshBands(df, textCol, idCol, shingleSize, k, bands, family,
        carry = Seq(tsCol))
      .repartition(col("band_id"), col("band_hash"))
    val keepers = banded.groupBy("band_id", "band_hash")
      .agg(min(struct(col(tsCol), col(idCol))).as("keeper"))
    banded.join(keepers, Seq("band_id", "band_hash"))
      .filter(struct(col(tsCol), col(idCol)) > col("keeper"))
      .groupBy(col(idCol))
      .agg(min(col("keeper")).getField(idCol).as("dup_of"))
  }

  /**
   * Near-dup-cleaned corpus: every doc minus the keep-first near-dups
   * [[nearDupDetectBatch]] flags — the one-call "dedupe my corpus" API a
   * training-data pipeline actually wants (the near-dup analogue of
   * [[dedupKeepFirst]]). One anti-join on the id.
   */
  def nearDupKeepFirst(df: DataFrame, textCol: String, idCol: String,
                       tsCol: String, shingleSize: Int = 3, k: Int = 32,
                       bands: Int = 8,
                       family: MinHashFamily = Xx64Family): DataFrame = {
    val dups = nearDupDetectBatch(df, textCol, idCol, tsCol, shingleSize, k,
      bands, family)
    df.join(dups.select(col(idCol)), Seq(idCol), "left_anti")
  }

  /**
   * Incremental-ingest dedup: verdicts for a NEW batch against an
   * EXISTING corpus — the daily-ingest shape, where re-clustering the
   * whole corpus per batch is the thing a production pipeline must never
   * do. Each new doc gets exactly one row:
   * (id, verdict ∈ exact_dup | near_dup | unique, dup_of = the smallest
   * matching corpus id, NULL for unique). exact = same md5 fingerprint;
   * near = any shared LSH band bucket (the same bucket-level linear
   * semantics as [[nearDupDetectBatch]] — no pair explosion, corpus
   * buckets reduce to ONE keeper row each before the join). Precedence:
   * exact beats near.
   *
   * Scale shape: corpus side reduces to (fingerprint → keeper) and
   * (band, hash → keeper) aggregates — both shrink with dedup state, not
   * corpus text; the join keys are hashes, so the batch never shuffles
   * corpus text. With [[PortableFamily]] the whole verdict is exactly
   * replayable in DuckDB.
   */
  def incrementalDedup(newDf: DataFrame, corpusDf: DataFrame,
                       textCol: String, idCol: String,
                       shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                       family: MinHashFamily = Xx64Family): DataFrame = {
    val nb = newDf.select(col(idCol), exactFingerprint(col(textCol)).as("_fp"))
    val ex = widen(corpusDf)
      .select(exactFingerprint(col(textCol)).as("_fp"), col(idCol).as("_cid"))
      .groupBy("_fp").agg(min(col("_cid")).as("_exact_keeper"))
    val bc = lshBands(corpusDf, textCol, idCol, shingleSize, k, bands, family)
      .groupBy("band_id", "band_hash").agg(min(col(idCol)).as("_bkeeper"))
    val near = lshBands(newDf, textCol, idCol, shingleSize, k, bands, family)
      .join(bc, Seq("band_id", "band_hash"))
      .groupBy(idCol).agg(min(col("_bkeeper")).as("_near_keeper"))
    nb.join(ex, Seq("_fp"), "left")
      .join(near, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_exact_keeper").isNotNull, lit("exact_dup"))
          .when(col("_near_keeper").isNotNull, lit("near_dup"))
          .otherwise(lit("unique")).as("verdict"),
        coalesce(col("_exact_keeper"), col("_near_keeper")).as("dup_of"))
  }

  /**
   * Release / snapshot diff report: [[incrementalDedup]]'s per-doc
   * verdicts collapsed to the three-row summary a corpus-release review
   * reads — how much of the new snapshot is carried exact, near-dup
   * against the old corpus, or genuinely fresh, plus how many distinct
   * old docs the duplicates trace back to (a few parents = a template
   * burst; many = broad overlap). Adds one tiny hash-agg on top of the
   * incremental-dedup shape, so it scales wherever that does.
   */
  def snapshotDiffReport(newDf: DataFrame, corpusDf: DataFrame,
                         textCol: String, idCol: String,
                         shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                         family: MinHashFamily = Xx64Family): DataFrame =
    incrementalDedup(newDf, corpusDf, textCol, idCol, shingleSize, k, bands, family)
      .groupBy("verdict")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("dup_of")).cast("long").as("n_distinct_parents"))

  /**
   * Candidate near-dup pairs via MinHash-LSH: shuffle once on
   * (band_id, band_hash), self-join within buckets only (id1 < id2),
   * distinct across bands. `maxBucketSize` caps pathological buckets
   * (e.g. millions of identical boilerplate docs) so no single bucket
   * produces O(n²) pairs — standard practice at web scale.
   */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                            maxBucketSize: Int = 1000,
                            family: MinHashFamily = Xx64Family,
                            dropStats: Option[DropStats] = None): DataFrame = {
    val banded = lshBands(df, textCol, idCol, shingleSize, k, bands, family)
    // Bound bucket size BEFORE pairing: collect ids per bucket, cap, pair.
    val grouped = banded.groupBy("band_id", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"))
    val buckets = observeDrops(grouped, "ids", maxBucketSize, dropStats)
      .filter(size(col("ids")).between(2, maxBucketSize))
    buckets.select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id1"), col("p._2").as("id2"))
      .distinct()
  }

  /**
   * One-Permutation-Hashing signature ([[OphMinHash]]): the k-wide MinHash
   * computed in ONE pass over the hashed-shingle array instead of k
   * seed-mix passes — the signature-stage scale path (O(n+k) per doc vs
   * O(n·k)). Same null contract as [[minhashFromShingles]]: empty shingle
   * arrays yield a NULL signature, never a constant one.
   */
  def ophSignature(sh: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    when(size(sh) > 0, column(OphMinHash(expression(sh), k)))
      .otherwise(lit(null).cast("array<bigint>"))
  }

  /**
   * [[lshBands]] with the OPH signature: identical staging (tokenize →
   * shingle-hash → signature → per-band fold → posexplode), identical
   * banding arithmetic — only the signature stage changes. With
   * [[PortableFamily]] every step including the one-pass OPH bin/min/
   * rotation-borrow is exact integer SQL, so the DuckDB oracle replays
   * the whole pipeline (see LshOracles.ophBandedCtes).
   */
  def lshBandsOph(df: DataFrame, textCol: String, idCol: String,
                  shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                  family: MinHashFamily = Xx64Family): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rows = k / bands
    val withSig = widen(df)
      .filter(size(TextOps.whitespaceTokens(col(textCol))) >= shingleSize)
      .select(col(idCol), family.stage1(col(textCol), shingleSize).as("_s1"))
      .select(col(idCol), family.stage2(col("_s1"), shingleSize).as("_sh"))
      .select(col(idCol), ophSignature(col("_sh"), k).as("_sig"))
    val bandHashes = (0 until bands).map(b => family.bandHash(slice(col("_sig"), b * rows + 1, rows), b))
    withSig.select(col(idCol), posexplode(array(bandHashes: _*)).as(Seq("band_id", "band_hash")))
  }

  /** [[minhashCandidatePairs]] with the OPH signature path: one shuffle on
    * (band_id, band_hash), capped buckets, within-bucket pairing. */
  def ophCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                        maxBucketSize: Int = 1000,
                        family: MinHashFamily = Xx64Family): DataFrame = {
    val banded = lshBandsOph(df, textCol, idCol, shingleSize, k, bands, family)
    val buckets = banded.groupBy("band_id", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    buckets.select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id1"), col("p._2").as("id2"))
      .distinct()
  }

  /**
   * Train/test split leakage audit: deterministic hash split (train <
   * `trainPct`, val < `trainPct+valPct`, test above — the
   * [[Sampling.keepCol]] arithmetic) + LSH candidate pairs that CROSS
   * from train into test. Benchmark decontamination ([[Decontaminate]])
   * guards against EXTERNAL eval sets; this guards the split itself —
   * near-identical docs landing on both sides of a random split silently
   * inflate held-out metrics, and hash splitting cannot prevent it
   * (near-dups hash independently).
   *
   * Output: one row per leaked (test_id, train_id) candidate pair.
   * Scale shape: [[minhashCandidatePairs]]'s bucket-capped single
   * shuffle, then an expression-only split filter — the split bucket is
   * a pure hash of each id, computed once per side in a staged
   * projection, never stored or joined.
   */
  def splitLeakage(df: DataFrame, textCol: String, idCol: String,
                   seed: String, trainPct: Int, valPct: Int,
                   shingleSize: Int = 3, k: Int = 32, bands: Int = 8,
                   maxBucketSize: Int = 1000,
                   family: MinHashFamily = Xx64Family): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split $trainPct/$valPct")
    val pairs = minhashCandidatePairs(df, textCol, idCol, shingleSize, k,
      bands, maxBucketSize, family)
    val testPct = trainPct + valPct
    // stage the two bucket values as their OWN projection: boolean columns
    // each embedding the hash would re-evaluate md5 4× in the pushed-down
    // filter plus once more in the output CASE (the l38 multi-reference
    // lesson; CollapseProject leaves multiply-referenced projections alone)
    pairs
      .select(col("id1"), col("id2"),
        Sampling.hashBucket(col("id1"), seed).as("_b1"),
        Sampling.hashBucket(col("id2"), seed).as("_b2"))
      .filter((col("_b1") >= testPct && col("_b2") < trainPct) ||
        (col("_b2") >= testPct && col("_b1") < trainPct))
      .select(
        when(col("_b1") >= testPct, col("id1")).otherwise(col("id2")).as("test_id"),
        when(col("_b1") >= testPct, col("id2")).otherwise(col("id1")).as("train_id"))
  }

  /**
   * Over-cap bucket telemetry: count `dropped_buckets` / `dropped_rows`
   * (rows = members of dropped buckets) on the pre-filter frame. Counters
   * ride the normal action — zero extra jobs — via core accumulators, which
   * survive AQE re-planning where `df.observe` does not (see [[DropStats]]).
   * The tracking pass-through filter runs on bucket rows (post-aggregation
   * cardinality), so its non-codegen cost is noise next to the
   * `collect_list`; with `stats = None` the plan is untouched.
   *
   * Telemetry only — callers must never gate control flow or correctness
   * on these counts (re-execution over-counts; see [[DropStats]]).
   */
  private[llm] def observeDrops(grouped: DataFrame, membersCol: String,
                                cap: Int, stats: Option[DropStats]): DataFrame =
    stats.fold(grouped) { st =>
      val track = udf { n: Int =>
        if (n > cap) { st.droppedBuckets.add(1L); st.droppedRows.add(n.toLong) }
        true
      }.asNondeterministic() // keep it un-reordered and un-collapsed
      grouped.filter(track(size(col(membersCol))))
    }

  /** All ordered pairs (a,b) with a<b from an array — expression-only. */
  private def pairsOf(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (a, i) =>
      transform(slice(sorted, i + 2, size(sorted)), b => struct(a.as("_1"), b.as("_2")))))
  }

  /**
   * Exact n-gram Jaccard similarity for candidate verification:
   * |A ∩ B| / |A ∪ B| over distinct shingles. Run on LSH candidates only —
   * never all pairs.
   */
  def jaccard(a: Column, b: Column): Column = {
    val ua = array_distinct(a); val ub = array_distinct(b)
    val inter = size(array_intersect(ua, ub)).cast("double")
    val union = size(array_union(ua, ub)).cast("double")
    when(union === 0, lit(0.0)).otherwise(round(inter / union, 6))
  }

  /**
   * Verified near-dup pairs: LSH candidates + exact shingle-Jaccard filter.
   * Joins the (small) candidate set back to the corpus twice to fetch
   * shingle arrays — both joins are on the id key. The shingle-hash side
   * uses the SAME `family` as candidate generation, so the PortableFamily
   * variant is end-to-end reproducible in the DuckDB oracle
   * ([[graft.queries.LshOracles.portableNearDupPairsSql]]).
   */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double, shingleSize: Int = 3,
                   k: Int = 32, bands: Int = 8,
                   family: MinHashFamily = Xx64Family,
                   maxBucketSize: Int = 1000): DataFrame = {
    val cands = minhashCandidatePairs(df, textCol, idCol, shingleSize, k, bands,
      maxBucketSize = maxBucketSize, family = family)
    // The shingle pipeline feeds BOTH pair-side joins; broadcast-candidate
    // joins recompute it per side. For expensive hash families one explicit
    // exchange is materialized once and reused (l6p 8.0→6.3 s at sf0.1);
    // for xxhash64 the recompute is cheaper than shuffling wide shingle
    // arrays (measured +0.5 s), so the exchange is family-gated.
    val shBase = widen(df).select(col(idCol).as("sid"), family.stage1(col(textCol), shingleSize).as("_s1"))
      .select(col("sid"),
        array_distinct(family.stage2(col("_s1"), shingleSize)).as("sh"))
    val sh = if (family.exchangeWorthMaterializing) shBase.repartition(col("sid")) else shBase
    cands.join(sh, col("id1") === col("sid")).withColumnRenamed("sh", "sh1").drop("sid")
      .join(sh, col("id2") === col("sid")).withColumnRenamed("sh", "sh2").drop("sid")
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Near-dup cluster assignment: given candidate pairs (id1, id2), assign
   * every doc the MINIMUM id reachable through the pair graph (connected
   * components via iterative label propagation — each round is two
   * join+aggregate passes; rounds needed = graph diameter, which for dedup
   * clusters is tiny). The canonical "keep one per duplicate cluster" step:
   * keep rows where id == cluster_id.
   *
   * Driver loop checks only an aggregated changed-count per round (a long
   * accumulator fed during the round's one materialization job) — no row
   * data is collected, and no separate convergence-probe job runs.
   */
  def nearDupClusters(pairs: DataFrame, maxIter: Int = 10,
                      loopPartitions: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // The candidate graph is tiny relative to the corpus, so the loop's cost
    // is tiny-task scheduling. Partitioning is scoped to the LOOP'S FRAMES
    // via explicit repartition(loopPartitions, key) before each checkpoint —
    // never by mutating the session's shuffle-partition conf, which
    // concurrent queries on a shared session would observe. (The per-round
    // join/agg exchanges still run at the session setting; AQE coalesces
    // them, and only the checkpointed frames pin a partition count.)
    //
    // Materialize the edge list ONCE (localCheckpoint is eager): without
    // this, every propagation round would re-execute the upstream candidate
    // generation (e.g. the whole MinHash-LSH pipeline) — measured 16 s → 2 s
    // at sf0.1.
    val edges = pairs.select(col("id1").cast("long"), col("id2").cast("long"))
      .unionByName(pairs.select(col("id2").cast("long").as("id1"), col("id1").cast("long").as("id2")))
      .distinct()
      .repartition(loopPartitions, col("id2"))
      .localCheckpoint()
    var labels = edges.select(col("id1").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node adopts min(own label, neighbors' labels), then jumps one
      // pointer (adopts its label's label) — path doubling makes the round
      // count O(log diameter) instead of O(diameter). ONE job per round:
      // the typed map below feeds a changed-count accumulator while the
      // round's frame materializes (RDD localCheckpoint is lazy — the
      // count() action materializes it), so convergence needs no second
      // pass. Task retries can only OVER-count changes, and the test is
      // `== 0`, so a retry can never fake convergence.
      // Round 1 runs on IDENTITY labels (cluster_id = id), so both label
      // lookups are algebraically removable (round 14, measured: 2 fewer
      // joins + exchanges on the latency-bound loop): the neighbor label
      // IS the neighbor id, and the jump table maps mid → mid.
      val neighborMin =
        if (iter == 0)
          edges.groupBy(col("id1").as("id")).agg(min(col("id2")).as("neighbor_min"))
        else edges
          .join(labels.withColumnRenamed("id", "id2").withColumnRenamed("cluster_id", "nl"), Seq("id2"))
          .groupBy(col("id1").as("id"))
          .agg(min(col("nl")).as("neighbor_min"))
      val adopted = labels.withColumnRenamed("cluster_id", "old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("neighbor_min"), col("old"))).as("mid"))
      val jump = labels.select(col("id").as("mid"), col("cluster_id").as("jl"))
      val changed = spark.sparkContext.longAccumulator(s"graft.clusterChanges.r$iter")
      val roundDf =
        if (iter == 0) adopted.select(col("id"), col("old"), col("mid").as("cluster_id"))
        else adopted.join(jump, Seq("mid"), "left")
          .select(col("id"), col("old"),
            least(col("mid"), coalesce(col("jl"), col("mid"))).as("cluster_id"))
      // no repartition before the checkpoint (round 14): AQE already sizes
      // the round's output, and the extra exchange per round was pure
      // latency on a loop whose frames are KBs
      val roundRdd = roundDf
        .as[(Long, Long, Long)].rdd
        .map { case (id, old, cl) => if (cl != old) changed.add(1L); (id, cl) }
      roundRdd.localCheckpoint()
      roundRdd.count() // single action: materializes the checkpoint + drives the accumulator
      converged = changed.value == 0L
      labels = roundRdd.toDF("id", "cluster_id")
      iter += 1
    }
    labels
  }

}
