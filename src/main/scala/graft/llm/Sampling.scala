package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling: a row is kept iff
 * `portableHash60(seed ‖ key) mod 100 < pct`. Unlike `df.sample` (RNG
 * state, partition-order-dependent), the decision is a pure function of
 * the row's KEY — reproducible across runs, engines, cluster layouts, and
 * retries, and stable under re-partitioning: the properties corpus
 * sampling actually needs (resumable pipelines, auditable subsets,
 * train/validation splits that never leak across reruns).
 *
 * The stratified form varies the rate by a stratum column (downsample
 * dominant classes, keep rare ones whole). Expression-only — the filter
 * pushes into the scan stage; no shuffle, no RNG.
 *
 * Exact DuckDB twin: the md5-derived hash is the portable family's
 * (`('0x'||substr(md5(s),1,15))::BIGINT`).
 */
object Sampling {

  /** Separator between seed and key in the hash input: without one,
    * (seed "s1", key "23") and (seed "s12", key "3") would hash the same
    * bytes and correlate what should be independent samples (train/val
    * leakage). Unit-separator keeps both sides printable-safe; seeds must
    * not contain it. */
  val SeedSep = "\u001f"

  /** Seeded percent bucket (0–99) for one key — the shared primitive
    * behind [[keepCol]] and [[Dedup.splitLeakage]]'s split assignment,
    * with the SeedSep guard every seeded API must carry. */
  def hashBucket(key: Column, seed: String): Column = {
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    pmod(TextOps.portableHash60(concat(lit(seed + SeedSep), key.cast("string"))),
      lit(100L))
  }

  /** Keep-decision column for one key at `pct`% (0–100). */
  def keepCol(key: Column, pct: Column, seed: String): Column =
    hashBucket(key, seed) < pct

  /** String/integral key types only: doubles, decimals, and timestamps
    * render to string DIFFERENTLY across engines, which would silently
    * break the cross-engine reproducibility contract. */
  private def requireStableKeyType(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"deterministic sampling key '$keyCol' must be string or integral " +
          s"(got ${other.catalogString}): other types' string renderings " +
          "differ across engines")
    }
  }

  /**
   * Mergeable bottom-k uniform sample (the KMV idiom — Bar-Yossef et al.
   * 2002): per stratum, the k keys with the SMALLEST seeded hash. Because
   * the hash order is global and data-independent, bottom-k(A ∪ B) =
   * bottom-k(bottom-k(A) ∪ bottom-k(B)) — shards sample independently and
   * merge by re-taking the k smallest, the property that makes "a uniform
   * 10k-doc sample of 100 TB" one map-side partial TakeOrdered per
   * partition plus a tiny reduce, with NO global sort and NO second scan
   * when shards arrive incrementally. [[deterministicSample]] keeps a
   * FRACTION (grows with the corpus); bottom-k keeps a fixed-size panel —
   * the eval-panel / spot-check shape.
   *
   * Determinism: rank by (hash, key) so equal hashes (coupon collisions)
   * break identically in any engine; ties are already vanishing at 60
   * hash bits. Emits (stratum, key, hash-rank) for the k smallest.
   */
  def bottomKSample(df: DataFrame, keyCol: String, stratumCol: String,
                    k: Int, seed: String = "s1"): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    requireStableKeyType(df, keyCol)
    val h = TextOps.portableHash60(
      concat(lit(seed + SeedSep), col(keyCol).cast("string")))
    df.select(col(stratumCol).as("stratum"),
        col(keyCol).cast("long").as("key"), h.as("_h"))
      .distinct()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum")).orderBy(col("_h").asc, col("key").asc))
        .cast("long"))
      .filter(col("rk") <= k)
      .select(col("stratum"), col("key"), col("rk"))
  }

  /**
   * KMV distinct estimator (Bar-Yossef et al. 2002) from the
   * [[bottomKSample]] panel: if the k-th smallest 60-bit hash is h_k,
   * the distinct count estimates as (k−1)·2⁶⁰ / h_k — the QUANTILE-based
   * sketch next to a40's register-based HLL, and the reason the bottom-k
   * panel doubles as a cardinality sketch for free. Exact integer
   * arithmetic: the numerator is one fixed literal, the floor-quotient
   * is taken by the DECIMAL(38,0) remainder trick (the a40 pattern), so
   * DuckDB replays the estimate bit-exactly. Strata with fewer than k
   * distinct keys report their EXACT panel size (the sketch saw
   * everything). Merge story = bottomKSample's: union panels, re-take
   * the k smallest, re-read h_k.
   */
  def kmvDistinctEstimate(df: DataFrame, keyCol: String, stratumCol: String,
                          k: Int, seed: String = "s1"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (got $k)")
    requireStableKeyType(df, keyCol)
    val numerator = (BigInt(k) - 1) * (BigInt(1) << 60)
    val h = TextOps.portableHash60(
      concat(lit(seed + SeedSep), col(keyCol).cast("string")))
    df.select(col(stratumCol).as("stratum"),
        col(keyCol).cast("string").as("key"), h.as("_h"))
      .distinct()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum")).orderBy(col("_h").asc, col("key").asc))
        .cast("long"))
      .filter(col("rk") <= k)
      .groupBy("stratum")
      .agg(count(lit(1)).cast("long").as("n_panel"),
        max(col("_h")).as("kth_hash"))
      .select(col("stratum"), col("n_panel"), col("kth_hash"),
        when(col("n_panel") < k, col("n_panel"))
          .otherwise(expr(s"CAST((CAST('$numerator' AS DECIMAL(38,0)) " +
            s"- CAST('$numerator' AS DECIMAL(38,0)) % kth_hash) / kth_hash AS BIGINT)"))
          .as("est_distinct"))
  }

  /** Uniform deterministic sample: keep `pct`% of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int,
                          seed: String = "s1"): DataFrame = {
    require(pct >= 0 && pct <= 100)
    requireStableKeyType(df, keyCol)
    df.filter(keepCol(col(keyCol), lit(pct), seed))
  }

  /**
   * Weighted sampling WITHOUT replacement, top-k (Efraimidis & Spirakis
   * 2006's A-ES, public): each row draws the deterministic uniform
   * u = (hash60(seed·key)+1)/2⁶⁰ ∈ (0,1] and ranks by u^(1/w) — here in
   * the equivalent, overflow-free log form score = ln(u)/w (larger is
   * better); the global top-k is a weighted sample without replacement
   * with inclusion odds ∝ weight. This is THE one-pass distributed
   * weighted reservoir: no per-stratum rates to precompute (l33's shape),
   * no sequential state — any engine that agrees on the hash agrees on
   * the sample.
   *
   * Determinism: u's division is IEEE-correctly-rounded from the same
   * integer, but the score itself is a libm `ln` — reproducible within
   * ONE JVM (spec-replayed in SamplingSpec), NOT guaranteed bit-equal
   * across engines/libm builds at 6-dp rounding boundaries. The
   * cross-engine-oracled registry row is [[weightedSamplePriority]],
   * the all-integer order-sampling form of the same πps target.
   *
   * Scale shape: expression-only per row + `TakeOrderedAndProject` for
   * the top-k (per-partition heaps, no global sort, no shuffle of the
   * corpus). Zero-weight rows are excluded (A-ES is undefined there).
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     seed: String = "s1"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    requireStableKeyType(df, keyCol)
    val u = (TextOps.portableHash60(
        concat(lit(seed + SeedSep), col(keyCol).cast("string"))) + 1)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    df.filter(col(weightCol) > 0)
      .select(col(keyCol), col(weightCol),
        round(log(u) / col(weightCol).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col(keyCol))
      .limit(k)
  }

  /**
   * Weighted sampling without replacement, exact-INTEGER order form
   * (Ohlsson 1998's "sequential Poisson sampling", public): each row
   * draws the deterministic 60-bit integer u_int = hash60(seed·key)+1
   * and ranks ASCENDING by the floored order variable
   * `priority = u_int div w` — the fixed-point analogue of Ohlsson's
   * ξ = u/p, whose k smallest form a without-replacement sample with
   * inclusion odds ∝ weight (the same πps target [[weightedSample]]'s
   * A-ES hits via ln(u)/w).
   *
   * Why this variant is the ORACLED registry row: the A-ES score is a
   * libm `ln`, and a round(ln(x),6) compare column can flip a digit
   * across libm builds at a rounding boundary (the l104 round-9
   * lesson). Here everything is int64 arithmetic — hash, +1, floor
   * div — so any engine replays the order, tie-break, and cut
   * bit-for-bit. Floor quantization is harmless: u_int spans 2⁶⁰, so
   * 60−log₂(w) priority bits remain (≥ 40 even for million-token
   * weights); exact collisions break on the key, both engines alike.
   *
   * Scale shape: expression-only per row + TakeOrderedAndProject
   * (per-partition heaps) — no corpus shuffle, no global sort. Weights
   * are cast to BIGINT (integer weights: chars, tokens, bytes);
   * zero/negative weights are excluded (the order variable is
   * undefined there, as in A-ES).
   */
  def weightedSamplePriority(df: DataFrame, keyCol: String, weightCol: String,
                             k: Int, seed: String = "s1"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    requireStableKeyType(df, keyCol)
    // filter on the CAST weight, not the raw column: a fractional weight
    // in (0, 1) passes `raw > 0` but casts to BIGINT 0, and `div 0` then
    // throws under ANSI (or yields NULL priorities that sort FIRST and
    // silently dominate the sample on a non-ANSI session) — the integer
    // contract (chars/tokens/bytes) is enforced by the cast, and sub-1
    // weights are excluded like any other weight that floors to 0
    df.withColumn("_w", col(weightCol).cast("long"))
      .filter(col("_w") > 0)
      .withColumn("_u", TextOps.portableHash60(
        concat(lit(seed + SeedSep), col(keyCol).cast("string"))) + 1)
      .select(col(keyCol), col(weightCol),
        expr("_u div _w").as("priority"))
      .orderBy(col("priority"), col(keyCol))
      .limit(k)
  }

  /**
   * Stratified deterministic sample: per-stratum keep percentages;
   * strata absent from `rates` are dropped (rate 0). The rates map rides
   * the plan as ONE map literal (`typedlit`, not per-entry CASE nodes).
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int], seed: String = "s1"): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100))
    requireStableKeyType(df, keyCol)
    val rate = coalesce(element_at(typedlit(rates), col(stratumCol)), lit(0))
    df.filter(keepCol(col(keyCol), rate, seed))
  }

  /** Basis-point keep decision (0–10000): the resolution [[balanceToShares]]
    * needs — whole percents are too coarse for computed rates. */
  def keepColBp(key: Column, bp: Column, seed: String): Column = {
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    pmod(TextOps.portableHash60(concat(lit(seed + SeedSep), key.cast("string"))),
      lit(10000L)) < bp
  }

  /**
   * Domain-mixture balancing: down-sample strata so the OUTPUT's
   * per-stratum weight shares (token counts, char counts) hit
   * `targetPct` — the "English 60 / code 30 / other 10" knob of a
   * training-mix spec. Strata absent from `targetPct` are dropped.
   *
   * Rates derive from the largest output satisfying every target with
   * down-sampling only: stratum s with weight wₛ caps the output at
   * `100·wₛ/pₛ`; the binding (minimum) cap X* fixes
   * `rateₛ = pₛ·X* / (100·wₛ)`, stored in BASIS POINTS via pure long
   * floor-division so the DuckDB oracle replays the arithmetic bit for bit
   * (no doubles anywhere — ULP-boundary floors would diverge across
   * engines). Overflow-safe for stratum weights up to ~9·10¹² (pₛ·X*·10⁴
   * must fit a long) — count weight in units (tokens, KB) that keep totals
   * under that, which 100 TB corpora comfortably can (token counts in
   * billions are ~10¹⁰).
   *
   * The per-stratum totals are a driver-side collect BOUNDED by the
   * number of targeted strata (a mix spec names a handful) — same
   * O(small) pattern as the BPE trainer's vocab collect. The keep filter
   * itself is expression-only and pushes to the scan.
   */
  def balanceToShares(df: DataFrame, keyCol: String, stratumCol: String,
                      weightCol: String, targetPct: Map[String, Int],
                      seed: String = "s1"): DataFrame = {
    require(targetPct.nonEmpty && targetPct.values.forall(p => p > 0 && p <= 100),
      "target shares must be positive percentages")
    require(targetPct.values.sum <= 100, "target shares must sum to <= 100")
    requireStableKeyType(df, keyCol)
    // stratum compared/keyed AS STRING so a non-string stratum column (int
    // source id, date bucket) balances by its canonical text form instead
    // of failing the driver collect with an opaque ClassCastException
    val stratumStr = col(stratumCol).cast("string")
    val weights: Map[String, Long] = df
      .filter(stratumStr.isin(targetPct.keys.toSeq: _*))
      .groupBy(stratumStr.as("stratum")).agg(sum(col(weightCol)).cast("long").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targetPct.keySet -- weights.keySet
    require(missing.isEmpty, s"targeted strata absent from data: ${missing.mkString(", ")}")
    val xStar = targetPct.map { case (s, p) => 100L * weights(s) / p }.min
    val bp: Map[String, Long] = targetPct.map { case (s, p) =>
      s -> math.min(10000L, p * xStar * 10000L / (100L * weights(s)))
    }
    val bpCol = coalesce(element_at(typedlit(bp), stratumStr), lit(0L))
    df.filter(keepColBp(col(keyCol), bpCol, seed))
  }

  /** Exact integer sqrt: floor(√w), computed as IEEE `sqrt` plus a
    * one-step fix-up of the rounding — the SAME closed form the DuckDB
    * oracle replays (a bare `floor(sqrt(w))` can be off by one at ulp
    * boundaries; the fix-up makes both engines exact for w ≤ ~4·10¹⁵). */
  private[llm] def isqrt(w: Long): Long = {
    require(w >= 0, s"isqrt of negative $w")
    val r0 = math.sqrt(w.toDouble).toLong
    if ((r0 + 1) * (r0 + 1) <= w) r0 + 1
    else if (r0 * r0 > w) r0 - 1
    else r0
  }

  /**
   * TEMPERATURE-flattened mixture resampling at T = 2: down-sample strata
   * so output weight shares are ∝ √wₛ instead of ∝ wₛ — the standard
   * temperature-sampling knob (multilingual training mixes up-weight
   * tail languages exactly this way) expressed as a deterministic filter.
   * T = 2 specifically because √ is an IEEE-exact operation: a general
   * T needs libm `pow`, whose last-ulp differences across engines break
   * replayable arithmetic; √ plus the [[isqrt]] fix-up is bit-exact in
   * both engines. (T = 1 is the identity; flatter mixes can iterate:
   * applying the transform twice gives shares ∝ w^¼.)
   *
   * Rates: with rₛ = isqrt(wₛ), the largest down-sample-only output with
   * shares ∝ rₛ keeps stratum s at `rateₛ = min_t ⌊10⁴·rₛ·w_t / (r_t·wₛ)⌋`
   * basis points (the t = s term caps the min at 10⁴, so the binding
   * stratum is kept whole — same structure as [[balanceToShares]]).
   * Cross-products run in BigInt driver-side and HUGEINT oracle-side —
   * wₛ up to 2⁶² stays exact. The per-stratum totals are a driver-side
   * collect bounded by stratum cardinality (a mixture has a bounded
   * source/language set — guarded by `maxStrata`); the keep filter is
   * expression-only and pushes to the scan.
   */
  def temperedMixture(df: DataFrame, keyCol: String, stratumCol: String,
                      weightCol: String, seed: String = "s1",
                      maxStrata: Int = 10000): DataFrame = {
    requireStableKeyType(df, keyCol)
    val stratumStr = col(stratumCol).cast("string")
    val weights: Seq[(String, Long)] = df
      .filter(col(stratumCol).isNotNull)
      .groupBy(stratumStr.as("stratum"))
      .agg(sum(col(weightCol)).cast("long").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(weights.nonEmpty, "temperedMixture: no strata")
    require(weights.size <= maxStrata,
      s"temperedMixture: ${weights.size} strata exceed maxStrata=$maxStrata — " +
        "a mixture spec needs a bounded stratum set")
    require(weights.forall(_._2 > 0),
      "temperedMixture: every stratum needs positive total weight")
    val r: Map[String, Long] = weights.map { case (s, w) => s -> isqrt(w) }.toMap
    val bp: Map[String, Long] = weights.map { case (s, ws) =>
      s -> weights.map { case (t, wt) =>
        BigInt(10000) * BigInt(r(s)) * BigInt(wt) / (BigInt(r(t)) * BigInt(ws))
      }.min.toLong
    }.toMap
    val bpCol = coalesce(element_at(typedlit(bp), stratumStr), lit(0L))
    df.filter(keepColBp(col(keyCol), bpCol, seed))
  }

  /**
   * Temperature-flattened TOKEN-BUDGET PLAN (T = 2): per stratum, how
   * many of `budget` total tokens to draw so output shares are ∝ √wₛ —
   * the planning table [[temperedMixture]]'s row filter realizes, plus
   * the repeat factor (allocated/available > 1 ⇒ the stratum runs
   * multiple epochs; the multilingual up-weighting trade-off made
   * visible). Unlike the filter, this is FULLY distributed: the isqrt
   * fix-up runs expression-side per stratum row, the Σr total is a
   * broadcast 1-row aggregate, and the allocation is exact integer
   * arithmetic (DECIMAL(38) product, floored division — HUGEINT in the
   * oracle), so no driver collect bounds the stratum count.
   */
  def tokenBudgetPlan(df: DataFrame, stratumCol: String, weightCol: String,
                      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(sum(col(weightCol)).cast("long").as("w"))
    val r0 = floor(sqrt(col("w").cast("double"))).cast("long")
    val r = w.withColumn("_r0", r0)
      .withColumn("r",
        when((col("_r0") + 1) * (col("_r0") + 1) <= col("w"), col("_r0") + 1)
          .when(col("_r0") * col("_r0") > col("w"), col("_r0") - 1)
          .otherwise(col("_r0")).cast("long"))
    val total = r.agg(sum("r").cast("long").as("rsum"))
    val alloc = floor(lit(budget).cast("decimal(38,0)") * col("r") / col("rsum"))
      .cast("long")
    // 1-row broadcast attach as a BroadcastHashJoin (crossJoin would plan
    // a BroadcastNestedLoopJoin, forbidden by the registry plan audit)
    graft.ops.JoinOps.withScalar(r, total)
      .select(col("stratum"), col("w").as("tokens_available"), col("r"),
        alloc.as("allocated_tokens"),
        round(alloc.cast("double") / col("w").cast("double"), 6).as("repeat_factor"))
  }

  /**
   * Deterministic EPOCH SHUFFLE + shard assignment: the global training
   * order for one epoch as a pure function of (seed, key) — no RNG state,
   * no `orderBy(rand())`. Each row's sort key is `portableHash60(seed ‖
   * key)`; its shard is that hash mod `nShards`, and its position is the
   * hash-order rank WITHIN the shard (key tie-breaks duplicate hashes).
   * Changing the seed is a fresh permutation; re-running a crashed epoch
   * reproduces the identical order — the resumability property
   * `orderBy(rand())` cannot give.
   *
   * Scale shape: expression-only hashing, then ONE exchange (hash on
   * shard) + per-shard sort for the rank. Pick nShards ≈ the number of
   * training readers (each shard is one reader's sequential stream);
   * per-shard sort is the unavoidable cost of materializing an order, and
   * it parallelizes across shards.
   *
   * Output: (<keyCol>, shard, pos) — pos is 1-based within shard.
   */
  def epochShuffle(df: DataFrame, keyCol: String, nShards: Int,
                   seed: String = "e1"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    requireStableKeyType(df, keyCol)
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.portableHash60(
      concat(lit(seed + SeedSep), col(keyCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(keyCol))
    df.select(col(keyCol), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /**
   * Per-group cap: keep at most `maxPerGroup` rows of each group, chosen
   * by seeded key hash — the "cap every domain/source at N documents"
   * step that keeps one over-crawled site from dominating a training mix
   * (the over-representation knob behind C4/CCNet-style source balancing;
   * same idea as [[balanceToShares]] but a hard per-group ceiling instead
   * of proportional shares). Hash order — not doc order — so the survivors
   * are an unbiased deterministic sample of each group, reproducible
   * across engines/retries, and a re-crawl that appends rows only
   * DISPLACES hash-later rows rather than shifting everyone's rank.
   *
   * Scale shape (round 13 — the r12 plan row_numbered the WHOLE corpus on
   * |group| tasks, a 3-source key serializing the sort): hash-bucket
   * PRE-SELECTION, the range-partitioned-selection pattern on the
   * uniform 60-bit hash. Rows bucket by their hash prefix (monotone in
   * h, so bucket-major order IS hash order); one parallel hash-agg
   * counts each (group, bucket); a cumulative window over ≤ nBuckets
   * rows per group finds the buckets intersecting the first
   * `maxPerGroup` ranks (prev < cap); only rows in THOSE buckets — at
   * most cap + one bucket's worth per group, never the corpus — join
   * back and take the final exact row_number. The kept-bucket list is
   * ~⌈cap·nBuckets/n⌉ rows PER GROUP, i.e. it grows with |group|
   * (at least one surviving bucket each), so the join is left to AQE:
   * broadcast when the list is actually small, shuffle-hash when a
   * high-cardinality group column would blow the driver. Identical
   * output: same
   * (hash, key) order, same cap. Groups at or under the cap pass
   * through unchanged. Output: (key, group, pos) with pos
   * 1..maxPerGroup.
   */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                  maxPerGroup: Int, seed: String = "c1",
                  nBuckets: Int = 4096): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    require(nBuckets > 0, "nBuckets must be positive")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    requireStableKeyType(df, keyCol)
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.portableHash60(
      concat(lit(seed + SeedSep), col(keyCol).cast("string")))
    val width = math.max(1L, (1L << 60) / nBuckets)
    val bucketed = df.select(col(keyCol), col(groupCol), h.as("_h"))
      .withColumn("_b", expr(s"_h div $width"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBuckets = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_prev", sum("_c").over(cumW) - col("_c"))
      .filter(col("_prev") < maxPerGroup)
      .select(col(groupCol), col("_b"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h"), col(keyCol))
    bucketed.join(keptBuckets, Seq(groupCol, "_b"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= maxPerGroup)
      .select(col(keyCol), col(groupCol), col("pos"))
  }

  /**
   * Curriculum training schedule: phase docs by quality-score THRESHOLDS
   * (cleanest first — the data-curriculum ordering of Bengio et al. 2009
   * applied to corpus quality), then within each phase assign a shard and
   * a dense position by seeded hash — the [[epochShuffle]] shape, so a
   * 1000-reader job consumes phase 1's shards in parallel, then phase 2's.
   *
   * Phases come from FIXED score thresholds, not quantiles: a global
   * ntile needs a full sort ([[graft.llm.QualityClassifier.calibrationTable]]
   * documents that trade); thresholds are data-independent, so the phase
   * assignment is a stateless filter that pushes to the scan and two
   * corpora curated separately get CONSISTENT phase meanings.
   *
   * `thresholds` descending: score >= t(0) → phase 1, score >= t(1) →
   * phase 2, …, below all → phase thresholds.size + 1.
   *
   * Scale shape: one exchange on (phase, shard) + per-partition sort;
   * parallelism = nPhases × nShards, state O(1) per partition.
   * Output: (key, phase, shard, pos) — pos dense 1-based per
   * (phase, shard).
   */
  def curriculumSchedule(df: DataFrame, keyCol: String, scoreCol: String,
                         thresholds: Seq[Double], nShards: Int,
                         seed: String = "cu1"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(thresholds.nonEmpty && thresholds == thresholds.sorted.reverse,
      "thresholds must be nonempty and descending")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    requireStableKeyType(df, keyCol)
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.portableHash60(
      concat(lit(seed + SeedSep), col(keyCol).cast("string")))
    val phase = thresholds.zipWithIndex.foldRight(
        lit(thresholds.size + 1).cast("long"): org.apache.spark.sql.Column) {
      case ((t, i), els) => when(col(scoreCol) >= t, lit(i + 1).cast("long")).otherwise(els)
    }
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("_h"), col(keyCol))
    df.select(col(keyCol), phase.as("phase"), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(keyCol), col("phase"), col("shard"), col("pos"))
  }

  /**
   * Leakage-safe train/val/test split: the split bucket is hashed from
   * the document's CONTENT fingerprint (TextOps.portableDocFingerprint),
   * not its id — byte-identical documents land in the SAME split no
   * matter how many times or under how many ids they occur, closing the
   * classic eval-inflation hole where one copy of a duplicated document
   * trains while its twin is tested (Lee et al. 2021 measure exactly
   * this leak; the l59 split-leakage audit DETECTS it after the fact —
   * this constructor prevents it for exact dups, and composing with the
   * l13 cluster ids instead of the fingerprint extends the guarantee to
   * near-dups).
   *
   * Deterministic by the registry's seeded portable-hash convention:
   * bucket = hash60(seed·fingerprint) mod 100 → train < trainPct ≤ val <
   * trainPct+valPct ≤ test. Expression-only, one pass, no shuffle.
   *
   * Output: (doc_id, fingerprint, split).
   */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       trainPct: Int, valPct: Int,
                       seed: String = "sp1"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; " +
        s"got $trainPct/$valPct")
    require(!seed.contains(SeedSep), "seed must not contain the unit separator")
    val fp = TextOps.portableDocFingerprint(col(textCol))
    val bucket = pmod(TextOps.portableHash60(
      concat(lit(seed + SeedSep), col("fingerprint").cast("string"))), lit(100L))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), fp.as("fingerprint"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }
}
