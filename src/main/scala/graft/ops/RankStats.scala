package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The rank/order-window half of [[Stats]] (round-12 file split, pure
 * move, no behavior change): autocorrelation, Gini, trimmed mean (and
 * its shared overflow-safe micro-mean helper), Theil–Sen, mode,
 * Spearman, weighted median. Mixed into `object Stats`, so every call
 * site keeps addressing `Stats.<member>`.
 */
private[ops] trait RankStats { this: Stats.type =>

  /**
   * Exact Gini coefficient per group (Gini 1912, the sorted-rank form:
   * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over x ascending) — the corpus-
   * balance audit next to the source-cap/balance samplers (llm/Sampling):
   * how concentrated is token/byte mass across a group's members? G=0 is
   * perfectly even, G→1 is one-member dominance.
   *
   * Exactness: ranks are a row_number over ascending value; tied values
   * contribute the same xᵢ under ANY rank permutation, so Σ i·xᵢ — and
   * hence G — is tie-order invariant, no tiebreak column needed. The
   * quotient is one floor division in micro-units computed in
   * DECIMAL(38,0) (Σ i·x reaches n²·max(x); DuckDB replays in HUGEINT).
   *
   * Scale shape (round 13, histogram-first): the c rows holding distinct
   * value x occupy ranks (prev, prev+c], so their Σi = c·prev + c(c+1)/2
   * and Σ i·x = x·(c·prev + c(c+1)/2) — a closed form in the (key, value)
   * histogram's counts. One parallel hash-agg to the histogram, one
   * cumulative window over DISTINCT values (domain-bounded, never the
   * corpus — the old plan row_number-sorted the whole table onto |key|
   * tasks), one hash-agg; Σi·x accumulates in DECIMAL(38,0) so the 100×
   * corpus can't wrap the long the r12 plan summed into. Negative values
   * are the caller's contract violation (Gini is defined on non-negative
   * quantities).
   *
   * Output: (key, n, total, gini_micro); gini_micro NULL when total = 0.
   */
  def giniByGroup(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    HistogramSelect.annotate(
      df.select(col(keyCol).as("key"), col(valueCol).cast("long").as("_v"))
        .groupBy("key", "_v").agg(count(lit(1)).as("_c")),
      "key")
      .groupBy("key")
      .agg(sum("_c").cast("long").as("n"),
        sum(col("_v") * col("_c")).cast("long").as("total"),
        // Σi over the value's rank span, formed entirely in DECIMAL(38,0):
        // c·prev alone reaches n² (wraps LONG above ~3e9-row groups), so
        // both factors are cast before multiplying; the triangular term
        // c(c+1)/2 halves the EVEN factor in LONG (safe: c div 2 ≤ c)
        // and multiplies in decimal — exact, no decimal division.
        sum(col("_v").cast("decimal(38,0)") *
          expr("""CAST(_c AS DECIMAL(38,0)) * _prev +
                 |CASE WHEN _c % 2 = 0
                 |     THEN CAST(_c div 2 AS DECIMAL(38,0)) * (_c + 1)
                 |     ELSE CAST(_c AS DECIMAL(38,0)) * ((_c + 1) div 2)
                 |END""".stripMargin))
          .cast("decimal(38,0)").as("ix"))
      .select(col("key"), col("n"), col("total"),
        expr("""CASE WHEN total > 0 THEN
               |  CAST((CAST(2 AS DECIMAL(38,0)) * ix - (n + 1) * total)
               |    * 1000000 div (CAST(n AS DECIMAL(38,0)) * total) AS LONG)
               |END""".stripMargin).as("gini_micro"))

  /**
   * Exact lag-k autocorrelation per series (the sample ACF estimator,
   * Box & Jenkins form with the global mean) — the SEASONALITY detector
   * next to the level (a21-a24), trend (a25), and change-point (a30)
   * monitors: lag-7 autocorrelation of daily volumes is the weekly-
   * rhythm signal, and its absence on a feed that should have one is an
   * ingest bug.
   *
   * Exactness: clear the mean's denominator — with S = Σx over the
   * key's n buckets, r_k = Σ(n·xᵢ−S)(n·xᵢ₊ₖ−S) / Σ(n·xᵢ−S)², every
   * term an exact long product; the final quotient is the registry's
   * sign-split floor-of-abs micro division (truncating `div` ≡ flooring
   * `//` on non-negatives, so both engines agree on NEGATIVE
   * correlations too — the a25 rule). Lags are TIME offsets, not row
   * offsets: a pair exists only when both t and t+k exist, so gaps
   * shrink n_pairs instead of silently pairing across holes.
   *
   * Scale shape: one (key, t) hash-agg, one tiny per-key stats agg
   * joined back broadcast-size, one self-equi-join of the per-time
   * table on (key, t+k) per requested lag (exploded once, single
   * shuffle) — everything after the first agg is calendar-bounded.
   *
   * Output: (key, lag, n_pairs, r_micro); r_micro NULL for a
   * zero-variance series.
   */
  def autocorr(df: DataFrame, keyCol: String, timeCol: String,
               valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"lags must be positive: $lags")
    val perT = df.groupBy(col(keyCol).as("key"),
        col(timeCol).cast("long").as("t"))
      .agg(sum(col(valueCol).cast("long")).as("x"))
    val st = perT.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("x").cast("long").as("s"))
    val withDev = perT.join(st, "key")
      .withColumn("dev", col("n") * col("x") - col("s"))
    val den = withDev.groupBy("key")
      .agg(sum(col("dev") * col("dev")).cast("long").as("den"))
    val a = withDev.select(col("key"), col("t"), col("dev").as("dev_a"))
      .withColumn("lag", explode(array(lags.map(k => lit(k.toLong)): _*)))
    val b = withDev.select(col("key"), col("t").as("tb"), col("dev").as("dev_b"))
    a.join(b, a("key") === b("key") && col("tb") === col("t") + col("lag"))
      .drop(b("key"))
      .groupBy("key", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev_a") * col("dev_b")).cast("long").as("num"))
      .join(den, "key")
      .select(col("key"), col("lag"), col("n_pairs"),
        expr("""CASE WHEN den > 0 THEN
               |  CASE WHEN num >= 0 THEN CAST((num * 1000000) div den AS LONG)
               |       ELSE -CAST(((-num) * 1000000) div den AS LONG) END
               |END""".stripMargin).as("r_micro"))
  }

  /** `(s * 1000000L) div n` without the 10⁶·s long overflow (hit by a38 at
    * sf1: 10⁶ · Σcents over a ~3M-row group passes 2⁶³ and ANSI mode
    * throws): split |s| = q·n + r, then 10⁶|s|/n = 10⁶q + 10⁶r/n with
    * 10⁶r < 10⁶n. Sign-split trunc-toward-zero, so the value is IDENTICAL
    * to the old `(s * 1000000L) div n` for every long input — compared
    * outputs cannot move, only the overflow goes away. Safe while the
    * MEAN (not the sum) fits micro units (|s/n| < 2⁶³/10⁶ ≈ 9.2·10¹²). */
  private[graft] def microMeanSql(s: String, n: String): String = {
    def pos(ss: String) =
      s"(1000000L * (($ss) div ($n)) + (1000000L * (($ss) % ($n))) div ($n))"
    s"(CASE WHEN ($s) >= 0 THEN ${pos(s)} ELSE -${pos(s"-($s)")} END)"
  }

  /**
   * Exact TRIMMED mean per group — the robust location between the mean
   * (breakdown 0%) and the median (discards all order information):
   * drop the lowest and highest ⌊n·trimBp/10⁴⌋ values by rank, average
   * the rest in pure integer micro units (⌊10⁶·Σkept / n_kept⌋). Rank
   * ties are interchangeable for a SUM — equal values dropped from
   * either end contribute identically — so the result is deterministic
   * even though row_number breaks value ties arbitrarily.
   *
   * Scale shape (round 13, histogram-first): the r12 plan row_numbered
   * the raw corpus on |group| tasks; this one hash-aggs to the
   * (group, value) histogram, runs the cumulative window over DISTINCT
   * values, and keeps, per value, the overlap of its rank span
   * (prev, cum] with the kept band (k, n−k]:
   * kept_c = min(cum, n−k) − max(prev, k), clamped at 0 — the same
   * rank-interchangeability argument as before, now in closed form.
   * trimBp < 5000 guarantees at least one survivor per group.
   *
   * Output: (group, n, n_trim_each, trimmed_mean_micro) — all BIGINT.
   */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valCol: String,
                         trimBp: Long): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000, s"trimBp must be in [0, 5000), got $trimBp")
    val g = col(groupCol)
    HistogramSelect.cumHistogram(df, groupCol, col(valCol).cast("long"))
      .withColumn("_k", expr(s"(_n * $trimBp) div 10000"))
      .withColumn("_kc", greatest(lit(0L),
        least(col("_cum"), col("_n") - col("_k")) -
          greatest(col("_prev"), col("_k"))))
      .filter(col("_kc") > 0)
      .groupBy(g)
      .agg(first(col("_n")).cast("long").as("n"),
        first(col("_k")).cast("long").as("n_trim_each"),
        // sign-split floor-of-abs (the a25/a32 rule): Spark `div`
        // truncates toward zero while DuckDB `//` floors toward −∞, so a
        // negative sum must route through its absolute value on BOTH
        // engines for bit parity; the q/r split inside microMeanSql keeps
        // 10⁶·Σ out of long overflow at sf1+ group sizes
        expr(microMeanSql("sum(_v * _kc)", "sum(_kc)")).as("trimmed_mean_micro"))
  }

  /**
   * Theil–Sen robust slope per key — the median of all pairwise slopes
   * (Theil 1950 / Sen 1968, public): the trend estimator that shrugs off
   * the outliers a25's least-squares OLS chases (breakdown point ~29%
   * vs 0%). Slopes are SIGN-SPLIT floor micro-quotients (the a25/a32
   * rule — `div` floors toward −∞ which would skew negative slopes), and
   * the reported value is the LOWER median (rank ⌈n/2⌉ of the sorted
   * slopes) so selection is pure and engine-exact — no interpolation.
   *
   * Contract: input is a PRE-AGGREGATED series (key, t, x) — the a30/a32
   * monitor shape, hundreds of points per key — because pairwise slopes
   * are O(n²) per key by definition; this is the bounded-series robust
   * trend, not a raw-event operator.
   *
   * Output: (key, n_pairs, slope_micro).
   */
  def theilSen(df: DataFrame, keyCol: String, timeCol: String,
               valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = df.select(col(keyCol).as("key"),
      col(timeCol).cast("long").as("ta"), col(valCol).cast("long").as("xa"))
    val b = df.select(col(keyCol).as("key"),
      col(timeCol).cast("long").as("tb"), col(valCol).cast("long").as("xb"))
    val pairs = a.join(b, Seq("key")).filter(col("tb") > col("ta"))
      .withColumn("s_micro", expr(
        """CASE WHEN xb >= xa THEN ((xb - xa) * 1000000L) div (tb - ta)
          |ELSE -(((xa - xb) * 1000000L) div (tb - ta)) END""".stripMargin))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("s_micro"))))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("key"), col("n_pairs").cast("long").as("n_pairs"),
        col("s_micro").as("slope_micro"))
  }

  /**
   * Exact MODE per group with deterministic ties: the most frequent
   * value, ties resolved to the SMALLEST value — `mode()` alone is
   * nondeterministic under parallel aggregation, which makes it
   * unusable in a replayed pipeline. Two hash aggregations, no window
   * sort: count per (group, value), then `min` over a `(−count, value)`
   * struct whose lexicographic order IS "highest count, then smallest
   * value". Map-side partials apply to both; the second shuffle carries
   * one row per distinct (group, value).
   *
   * Output: (group, mode_value, mode_count, n_distinct) — value/count
   * BIGINT, n_distinct the group's distinct value count.
   */
  def modeByGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.select(col(groupCol), col(valCol).cast("long").as("_v"))
      .groupBy(col(groupCol), col("_v"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(groupCol))
      .agg(min(struct((-col("_cnt")).as("_nc"), col("_v"))).as("_best"),
        count(lit(1)).as("n_distinct"))
      .select(col(groupCol), col("_best._v").as("mode_value"),
        (-col("_best._nc")).as("mode_count"), col("n_distinct"))

  /**
   * Spearman rank correlation per group — the monotone-association
   * complement to a18's Pearson `corr`: rank both variables (AVERAGE
   * ranks over ties, the standard Spearman treatment) and correlate the
   * ranks. Robust to outliers and nonlinear-but-monotone relations, which
   * is why drift monitors prefer it for heavy-tailed metrics.
   *
   * Average rank = rank() + (|ties| − 1)/2 — an exact multiple of ½.
   * Groups need ≥ 2 rows and nonzero rank variance on both sides or rho
   * is NULL (undefined, not 0); 6-dp rounding like a18/a20 absorbs
   * engine accumulation order.
   *
   * Shape (round 13, histogram-first — the r12 plan ran both rank
   * windows over the raw corpus, a sort-shuffle onto |group| tasks):
   *  1. joint (g, x, y) → count histogram — parallel hash-agg on a
   *     high-cardinality composite key, map-side partials;
   *  2. marginal (g, x) and (g, y) histograms DERIVED from the joint one;
   *     the cumulative window that turns counts into average ranks runs
   *     over distinct values only (avg rank = prev + (c+1)/2);
   *  3. join the rank maps back onto the joint histogram (the x side is
   *     groups×|x-domain| rows — broadcast, so CALLERS PASS THE
   *     LOWER-CARDINALITY VARIABLE AS xCol; the y side shuffles on the
   *     high-cardinality (g, y));
   *  4. one hash-agg of EXACT integer moments: with doubled ranks
   *     d = 2·rank − (n+1) (integers, since avg ranks are ½-multiples,
   *     and Σ avg ranks = n(n+1)/2 makes their mean exactly (n+1)/2),
   *     rho = Σw·dx·dy / √(Σw·dx²·Σw·dy²) — the ½s and the centering
   *     cancel. Moments accumulate in DECIMAL(38,0) (≤ 4n³ ≈ 10²⁶ at
   *     2·10⁸-row groups), so the only floating point is the final
   *     quotient — no corpus-sized sort, no FP accumulation order at all.
   */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val g = col(groupCol)
    val joint = df.select(g, col(xCol).as("_x"), col(yCol).as("_y"))
      .groupBy(g, col("_x"), col("_y"))
      .agg(count(lit(1)).as("_c"))
    // doubled average rank of each distinct value: 2·(prev + (c+1)/2)
    // = 2·prev + c + 1 — integer-exact, no halves anywhere. Cumulative via
    // the two-level parallel form (round 15, HistogramSelect.parCumSum):
    // the r13 window ran ≤|group| tasks over the marginal histogram
    def rankMap(valCol: String, out: String): DataFrame =
      HistogramSelect.parCumSum(
        joint.groupBy(g, col(valCol).as("_v")).agg(sum("_c").as("_cv")),
        groupCol, "_v", Seq("_cv"))
        .select(g, col("_v").as(valCol),
          (col("_cum_cv") * 2 - col("_cv") + 1).as(out))
    val ranked = joint
      .join(broadcast(rankMap("_x", "_r2x")), Seq(groupCol, "_x"))
      .join(rankMap("_y", "_r2y"), Seq(groupCol, "_y"))
    val dec = "decimal(38,0)"
    ranked
      .groupBy(g)
      .agg(sum("_c").cast("long").as("n"),
        sum(col("_c").cast(dec) * col("_r2x") * col("_r2y")).cast(dec).as("_sxy"),
        sum(col("_c").cast(dec) * col("_r2x") * col("_r2x")).cast(dec).as("_sxx"),
        sum(col("_c").cast(dec) * col("_r2y") * col("_r2y")).cast(dec).as("_syy"))
      // centered moments via the exact mean 2·(n+1)/2 = n+1 of doubled
      // ranks: Σw·d² = Σw·r² − n·(n+1)², Σw·dx·dy = Σw·rx·ry − n·(n+1)²
      .withColumn("_m", (col("n").cast(dec) * (col("n") + 1) * (col("n") + 1)).cast(dec))
      .withColumn("_vx", (col("_sxx") - col("_m")).cast("double"))
      .withColumn("_vy", (col("_syy") - col("_m")).cast("double"))
      .withColumn("_cov", (col("_sxy") - col("_m")).cast("double"))
      // guarded quotient: zero rank variance (a constant column) must
      // yield NULL (the DuckDB corr behavior), never divide or throw
      .select(g,
        when(col("_vx") > 0 && col("_vy") > 0,
          round(col("_cov") / sqrt(col("_vx") * col("_vy")), 6)).as("rho"),
        col("n"))
  }

  /**
   * Exact LOWER weighted median per group: the smallest value v with
   * 2·W(≤v) ≥ W_total — the robust center a14's unweighted percentile
   * can't give when rows carry unequal mass (price median weighted by
   * quantity, latency median weighted by request count). Pure integer
   * selection, no interpolation: bit-identical across engines by
   * construction.
   *
   * Shape (round 13, histogram-first): hash-agg to the (group, value)
   * histogram carrying (Σweight, row count) per distinct value — the r12
   * plan's RANGE-frame cumulative over the raw corpus sort-shuffled the
   * whole table onto |group| tasks; merging equal values FIRST makes a
   * rows-frame cumulative over the histogram identical to it (equal
   * values share one cumulative mass by construction, so tie order still
   * can't move the crossing) while the window input stays domain-bounded.
   * Then the same skinny min-per-group of the crossing rows.
   *
   * Contract: weights ≥ 0 (zero-weight rows can never cross the half
   * mass and cannot become the median); an all-zero-weight group
   * degenerates to its min value.
   *
   * Output: (group, n, total_weight, wmedian) — all BIGINT.
   */
  def weightedMedianByGroup(df: DataFrame, groupCol: String, valCol: String,
                            weightCol: String): DataFrame = {
    val g = col(groupCol)
    // cumulative weight via the two-level parallel form (round 15,
    // HistogramSelect.parCumSum — the r13 windows ran ≤|group| tasks);
    // group totals ride the same bucket-offset pass
    HistogramSelect.parCumSum(
      df.select(g, col(valCol).cast("long").as("_v"),
          col(weightCol).cast("long").as("_w"))
        .groupBy(g, col("_v"))
        .agg(sum("_w").as("_wv"), count(lit(1)).as("_c")),
      groupCol, "_v", Seq("_wv", "_c"))
      .filter(col("_cum_wv") * 2 >= col("_tot_wv"))
      .groupBy(g)
      .agg(first(col("_tot_c")).cast("long").as("n"),
        first(col("_tot_wv")).cast("long").as("total_weight"),
        min(col("_v")).as("wmedian"))
  }
}
