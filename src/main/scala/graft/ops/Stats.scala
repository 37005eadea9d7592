package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Statistical-test and robust-statistics aggregates (split from [[Agg]]
 * on the basic-vs-statistical seam, round 11 — pure mechanical move):
 * MAD, Welch / Mann-Whitney / KS one-vs-rest drift tests, OLS and
 * Theil-Sen trends, autocorrelation, Gini, trimmed mean, mode, Spearman,
 * weighted median. All exact integer/decimal micro-unit arithmetic —
 * see each member's scaladoc for the cross-engine rounding contract.
 */
object Stats {
  /**
   * Per-group robust location/scale: exact median plus median absolute
   * deviation (MAD = median(|x − median(x)|)) — the outlier-resistant
   * complement to a20's mean/stddev z-scores (a fat-tailed metric column
   * makes mean±3σ useless; median±k·MAD is the standard robust gate).
   *
   * Two hash-aggregates with a BROADCAST of the tiny per-group median
   * table between them (the second pass needs each row's group median to
   * form |x − m|; medians ≤ #groups rows, so the join never shuffles the
   * data side). Exact `percentile` (not approx) on both passes — values
   * are per-row arithmetic, no accumulation-order doubles; results round
   * to 4dp like a14 to absorb interpolation float noise.
   *
   * Output: (group, n, med, mad) — n BIGINT, med/mad rounded doubles.
   */
  def madByGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val x = col(valCol)
    val medians = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("_med"),
        count(x).cast("long").as("n"))
    df.select(col(groupCol), x)
      .join(broadcast(medians), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        first(col("n")).as("n"),
        round(first(col("_med")), 4).as("med"),
        round(expr(s"percentile(abs($valCol - _med), 0.5)"), 4).as("mad"))
  }

  /**
   * One-vs-rest Welch two-sample location test per group, in EXACT
   * integer/decimal arithmetic: for each group g, is mean(x | g)
   * significantly different from mean(x | not g) at |t| > tCrit? The
   * drift gate a pipeline runs per ingest source — "is src7 sending
   * shorter documents than everyone else?" — next to the w10 volume
   * monitor and a21's robust spreads.
   *
   * The trick is the w10 one again, scaled up to Welch's statistic:
   * t² > tCrit² is a polynomial inequality in the per-group integer
   * sufficient statistics (n, Σx, Σx²), evaluated in DECIMAL(38,0) —
   * products reach ~10²⁵ at sf1, far past BIGINT but exact in 128-bit
   * decimal on both engines — so the flag is bit-identical everywhere,
   * with no libm sqrt/division in any compared column:
   *
   *   (ΣA·nB − ΣB·nA)²·(nA−1)·(nB−1)
   *     > tCrit² · [ (nA·QA − ΣA²)·nB²·(nB−1) + (nB·QB − ΣB²)·nA²·(nA−1) ]
   *
   * (both sides are the t² inequality multiplied by (nA·nB)²(nA−1)(nB−1);
   * QA = Σx² over A). Means are reported as exact floor micro-units.
   *
   * DOMAIN BOUND (since the polynomial is degree ~7 in the inputs): the
   * lhs is ~ (Σ·n)²·n², so DECIMAL(38,0) holds up to roughly n ≈ 10⁶ rows
   * per side with values ≤ 10⁴ (lhs ≈ 10³⁴); at larger corpora normalize
   * units first (scale values down by a constant — the t statistic is
   * scale-invariant) or run per-shard. ANSI mode makes an overflow a loud
   * NUMERIC_VALUE_OUT_OF_RANGE, never a silent wrap.
   *
   * Scale shape: ONE corpus scan → per-group (n, Σ, Σ²) partials; the
   * "rest" side of every test is derived by subtracting the group row
   * from the broadcast one-row global totals — the one-vs-rest family
   * costs the same as one aggregation, not |G| scans. Groups with < 2
   * rows on either side emit flag = false (variance undefined).
   *
   * Output: (group, n, mean_micro, rest_mean_micro, significant).
   */
  def welchOneVsRest(df: DataFrame, groupCol: String, valCol: String,
                     tCritNum: Long = 2L, tCritDen: Long = 1L): DataFrame = {
    require(tCritNum > 0 && tCritDen > 0, "tCrit must be positive")
    val d38 = "decimal(38,0)"
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).cast("long").as("na"),
        sum(col(valCol).cast("long")).cast("long").as("sa"),
        sum((col(valCol).cast(d38)) * col(valCol).cast(d38)).cast(d38).as("qa"))
    // one-row totals ride a NON-FOLDABLE-key broadcast (xxhash64 % 1 = 0
    // on both sides): a foldable lit key would constant-fold into a
    // cross-join condition and plan a BroadcastNestedLoopJoin (the
    // Ann.joinedCellScores trick; the registry-wide plan audit enforces it)
    val tot = g.agg(sum(col("na")).cast("long").as("n_tot"),
        sum(col("sa")).cast("long").as("s_tot"),
        sum(col("qa")).cast(d38).as("q_tot"))
      .withColumn("_k", pmod(xxhash64(col("n_tot")), lit(1)))
    val j = g.withColumn("_k", pmod(xxhash64(col("na")), lit(1)))
      .join(broadcast(tot), "_k")
      .withColumn("nb", (col("n_tot") - col("na")).cast("long"))
      .withColumn("sb", (col("s_tot") - col("sa")).cast("long"))
      .withColumn("qb", (col("q_tot") - col("qa")).cast(d38))
    def dec(c: Column): Column = c.cast(d38)
    val diff = dec(col("sa")) * dec(col("nb")) - dec(col("sb")) * dec(col("na"))
    val varTermA = (dec(col("na")) * col("qa") - dec(col("sa")) * dec(col("sa"))) *
      dec(col("nb")) * dec(col("nb")) * dec(col("nb") - 1)
    val varTermB = (dec(col("nb")) * col("qb") - dec(col("sb")) * dec(col("sb"))) *
      dec(col("na")) * dec(col("na")) * dec(col("na") - 1)
    val lhs = diff * diff * dec(col("na") - 1) * dec(col("nb") - 1) *
      lit(tCritDen * tCritDen).cast(d38)
    val rhs = lit(tCritNum * tCritNum).cast(d38) * (varTermA + varTermB)
    j.select(col("grp").as(groupCol),
      col("na").as("n"),
      expr(microMeanSql("sa", "na")).cast("long").as("mean_micro"),
      // nb = 0 when the input has a single group: no "rest" exists —
      // null mean, flag false (CASE is lazy, so ANSI div never sees the 0)
      when(col("nb") > 0, expr(microMeanSql("sb", "nb")).cast("long"))
        .as("rest_mean_micro"),
      (col("na") >= 2 && col("nb") >= 2 && lhs > rhs).as("significant"))
  }

  /**
   * One-vs-rest Mann–Whitney U test per group, in EXACT integer
   * arithmetic — the NONPARAMETRIC complement to [[welchOneVsRest]]: no
   * normality assumption, robust to the heavy tails and outliers real
   * ingest metrics have (a few giant documents shift a mean but barely
   * move ranks). A drift gate runs both; disagreement between them IS the
   * "distribution changed shape, not location" signal.
   *
   * Exactness via DOUBLED ranks: tie-averaged ranks are half-integers, so
   * everything carries 2·rank — integers throughout. With
   * U2 = 2·(ΣR_g) − na(na+1), the tie-corrected normal test |z| > zCrit
   * is the integer polynomial inequality
   *
   *   3·n·(n−1)·(U2 − na·nb)² > zCrit²·na·nb·((n³−n) − Σ(t³−t))
   *
   * (both sides the z² inequality with denominators cleared; t = per-value
   * tie counts), evaluated in DECIMAL(38,0) — no sqrt, no float division,
   * bit-identical flags on any engine. Also emits the rank-biserial
   * effect size r = 1 − 2U/(na·nb) as exact floor micro-units.
   *
   * Scale shape: ONE value-histogram shuffle (distinct (group, value)
   * counts), a window over the VALUE histogram (rows = distinct values,
   * not the corpus) for cumulative ranks, a broadcast rank join back to
   * per-group aggregates, and the a22-style broadcast one-row totals for
   * the "rest" side. The corpus is never globally sorted — ranks come
   * from the tiny per-value table.
   *
   * Output: (group, n, u2, effect_micro, significant).
   */
  def mannWhitneyOneVsRest(df: DataFrame, groupCol: String, valCol: String,
                           zCritNum: Long = 2L): DataFrame = {
    require(zCritNum > 0, "zCrit must be positive")
    val d38 = "decimal(38,0)"
    import org.apache.spark.sql.expressions.Window
    // per-value counts (value histogram — the only corpus-wide shuffle)
    val gv = df.groupBy(col(groupCol).as("grp"), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("c"))
    val vh = gv.groupBy("v").agg(sum("c").cast("long").as("t"))
    // doubled average rank per value: 2·rank = 2·cumBefore + t + 1
    val wv = Window.orderBy("v")
    val ranks = vh
      .withColumn("cumBefore",
        coalesce(sum("t").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("v"), col("t"),
        (lit(2L) * col("cumBefore") + col("t") + 1L).as("r2"))
    // per-group doubled rank sums + n; tie term rides the same rows
    val g = gv.join(broadcast(ranks), "v")
      .groupBy("grp")
      .agg(sum("c").cast("long").as("na"),
        sum(col("c").cast(d38) * col("r2")).cast(d38).as("sr2"))
    val tieTerm = ranks.agg(
        sum(col("t").cast(d38) * col("t") * col("t") - col("t").cast(d38))
          .cast(d38).as("ties"),
        sum("t").cast("long").as("n_tot"))
      .withColumn("_k", pmod(xxhash64(col("n_tot")), lit(1)))
    val j = g.withColumn("_k", pmod(xxhash64(col("na")), lit(1)))
      .join(broadcast(tieTerm), "_k")
      .withColumn("nb", (col("n_tot") - col("na")).cast("long"))
    def dec(c: Column): Column = c.cast(d38)
    // U2 = 2·U = sr2 − na(na+1)
    val u2 = col("sr2") - dec(col("na")) * (col("na") + 1)
    val nTot = dec(col("n_tot"))
    val diff = u2 - dec(col("na")) * col("nb")
    val lhs = lit(3L).cast(d38) * nTot * (nTot - 1) * diff * diff
    val rhs = lit(zCritNum * zCritNum).cast(d38) * dec(col("na")) * col("nb") *
      ((nTot * nTot * nTot - nTot) - col("ties"))
    j.select(col("grp").as(groupCol),
      col("na").as("n"),
      u2.cast("long").as("u2"),
      when(col("nb") > 0,
        expr(s"CAST(((CAST(na AS $d38) * nb - (sr2 - CAST(na AS $d38) * (na + 1)))" +
          s" * 1000000) div (CAST(na AS $d38) * nb) AS LONG)"))
        .as("effect_micro"),
      (col("na") >= 2 && col("nb") >= 2 && lhs > rhs).as("significant"))
  }

  /**
   * Exact per-group ordinary least squares over a daily series — the
   * volume-TREND monitor next to the level drift tests (a21-a24): fit
   * count ~ day per key and report slope, intercept, and R² in integer
   * micro-units, all floor arithmetic on exact integer sums so the fit is
   * bit-identical on any engine (floating-point OLS is
   * summation-order-dependent).
   *
   *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),  x centered to day − min(day)
   *   R²    = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
   *
   * Products run in DECIMAL(38,0) (longs overflow at the ·10⁶ step);
   * slope/intercept sign-split so Spark's truncating `div` and DuckDB's
   * flooring `//` agree on negatives (the a24 rule). Constant-x or
   * constant-y degenerate groups yield NULL slope / R².
   *
   * Scale shape: events reduce to one (key, day) row via a hash-agg, the
   * window min for centering runs over that TINY daily table, and the
   * regression is ONE more hash-agg — 100 TB of events never sort.
   */
  def olsTrend(df: DataFrame, keyCol: String, tsUsCol: String): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val daily = df
      .groupBy(col(keyCol).as("key"), expr(s"$tsUsCol div 86400000000").as("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    val centered = daily
      .withColumn("x", col("day") -
        min(col("day")).over(org.apache.spark.sql.expressions.Window.partitionBy("key")))
    val g = centered.groupBy("key").agg(
      count(lit(1)).cast("long").as("n"),
      sum("x").cast(d38).as("sx"),
      sum("y").cast(d38).as("sy"),
      sum(col("x").cast(d38) * col("y")).cast(d38).as("sxy"),
      sum(col("x").cast(d38) * col("x")).cast(d38).as("sxx"),
      sum(col("y").cast(d38) * col("y")).cast(d38).as("syy"))
    g.withColumn("num", expr(s"CAST(n AS $d38) * sxy - sx * sy"))
      .withColumn("den", expr(s"CAST(n AS $d38) * sxx - sx * sx"))
      .withColumn("deny", expr(s"CAST(n AS $d38) * syy - sy * sy"))
      // sign-split floor-of-abs (truncating div == flooring // on ≥ 0)
      .withColumn("slope_micro", expr(
        """CASE WHEN den > 0 THEN
          |  CASE WHEN num >= 0 THEN CAST((num * 1000000) div den AS LONG)
          |       ELSE -CAST(((-num) * 1000000) div den AS LONG) END
          |END""".stripMargin))
      .withColumn("icnum", expr(s"sy * 1000000 - CAST(slope_micro AS $d38) * sx"))
      .withColumn("intercept_micro", expr(
        """CASE WHEN den > 0 THEN
          |  CASE WHEN icnum >= 0 THEN CAST(icnum div n AS LONG)
          |       ELSE -CAST((-icnum) div n AS LONG) END
          |END""".stripMargin))
      .withColumn("r2_micro", expr(
        "CASE WHEN den > 0 AND deny > 0 THEN CAST((num * num * 1000000) div (den * deny) AS LONG) END"))
      .select(col("key").as(keyCol), col("n").as("n_days"),
        col("slope_micro"), col("intercept_micro"), col("r2_micro"))
  }

  /**
   * One-vs-rest two-sample Kolmogorov–Smirnov test per group, in EXACT
   * integer arithmetic — the DISTRIBUTION-SHAPE complement that closes the
   * drift-test family: Welch (a22) tests location under normality,
   * Mann–Whitney (a24) tests stochastic dominance by ranks, chi-square
   * (a23) tests categorical mix; KS is sensitive to ANY ECDF difference
   * (spread, modality, tails) between group g and the pooled rest.
   *
   * Exactness: with cumG(v) = #{group ≤ v}, cumTot(v) = #{pooled ≤ v},
   * ng = |group|, nb = n − ng, the scaled deviation at pooled value v is
   *
   *   f(v) = cumG(v)·n − cumTot(v)·ng   ( = (F_g − F_rest)·ng·nb·n/(…) numerator )
   *
   * because cumG·nb − (cumTot−cumG)·ng = cumG·n − cumTot·ng. D's numerator
   * D_num = max over pooled v of |f(v)| need only be evaluated SPARSELY at
   * each group's own value points: between two consecutive group points
   * cumG is constant and f is monotone in cumTot, so the supremum over the
   * interval is attained at its endpoints — candidate A (at the group
   * point: cumG_i·n − cumTot_i·ng) and candidate B (just before the group
   * point: (cumG_i − c_i)·n − (cumTot_i − t_i)·ng, which is the right
   * endpoint of the PREVIOUS interval). The head interval (cumG = 0) is
   * candidate B of the first row; the tail decays to 0. No group×values
   * densification, no global sort of the corpus — the evaluation table is
   * exactly the sparse (group, value) histogram.
   *
   * Significance at level α: D > c(α)·√((na+nb)/(na·nb)) (two-sample
   * Smirnov bound; c(α) = √(−ln(α/2)/2), c(0.05)² ≈ 1.84444). Squared and
   * denominator-cleared to the integer inequality
   *
   *   10⁶ · D_num² > c2Micro · n · ng · nb
   *
   * in DECIMAL(38,0) — no sqrt, no float, bit-identical on any engine.
   * Exact range: |D_num| ≤ ng·nb < n², so the lhs needs n⁴·10⁶ < 10³⁸,
   * i.e. n ≲ 10⁸ per comparison — ample for per-day/per-source monitor
   * slices; shard the monitor window before the sum at larger n.
   *
   * Scale shape: ONE corpus-wide shuffle (the (group, value) histogram),
   * a single-partition window over the pooled VALUE histogram (rows =
   * distinct values, broadcast back), and per-group windows + final max
   * that share one exchange on the group key. Same cost envelope as a24.
   *
   * Output: (group, n, d_micro = ⌊10⁶·D/(ng·nb)⌋… i.e. ⌊10⁶·D_num/(ng·nb)⌋,
   * significant).
   */
  def ksOneVsRest(df: DataFrame, groupCol: String, valCol: String,
                  c2Micro: Long = 1844440L): DataFrame = {
    require(c2Micro > 0, "c2Micro must be positive")
    val d38 = "decimal(38,0)"
    import org.apache.spark.sql.expressions.Window
    // sparse (group, value) histogram — the only corpus-wide shuffle
    val gv = df.groupBy(col(groupCol).as("grp"), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("c"))
    // pooled value histogram with cumulative totals (rows = distinct values)
    val wv = Window.orderBy("v")
    val vh = gv.groupBy("v").agg(sum("c").cast("long").as("t"))
      .withColumn("cumTot",
        sum("t").over(wv.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    // per-group cumulative + totals ride one exchange on grp
    val wg = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wga = Window.partitionBy("grp")
    val rows = gv.join(broadcast(vh), "v")
      .withColumn("cumG", sum("c").over(wg).cast("long"))
      .withColumn("ng", sum("c").over(wga).cast("long"))
    // n rides a one-row broadcast on a NON-FOLDABLE key (BHJ, not BNLJ)
    val tot = vh.agg(sum("t").cast("long").as("n_tot"))
      .withColumn("_k", pmod(xxhash64(col("n_tot")), lit(1)))
    val cand = rows.withColumn("_k", pmod(xxhash64(col("ng")), lit(1)))
      .join(broadcast(tot), "_k")
      .withColumn("candA", expr(
        s"abs(CAST(cumG AS $d38) * n_tot - CAST(cumTot AS $d38) * ng)"))
      .withColumn("candB", expr(
        s"abs(CAST(cumG - c AS $d38) * n_tot - CAST(cumTot - t AS $d38) * ng)"))
    cand.groupBy("grp")
      .agg(max("ng").as("ng"), max("n_tot").as("n_tot"),
        max(greatest(col("candA"), col("candB"))).as("dnum"))
      .withColumn("nb", expr("n_tot - ng"))
      .select(col("grp").as(groupCol),
        col("ng").as("n"),
        expr(s"CASE WHEN nb > 0 THEN CAST((dnum * 1000000) div (CAST(ng AS $d38) * nb) AS LONG) END")
          .as("d_micro"),
        expr(s"ng >= 1 AND nb >= 1 AND dnum * dnum * 1000000 > " +
          s"CAST($c2Micro AS $d38) * n_tot * ng * nb").as("significant"))
  }

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
   * Scale shape: one per-group sort window + one hash-agg. Negative
   * values are the caller's contract violation (Gini is defined on
   * non-negative quantities).
   *
   * Output: (key, n, total, gini_micro); gini_micro NULL when total = 0.
   */
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

  def giniByGroup(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(keyCol).as("key"),
        col(valueCol).cast("long").as("x"))
      .withColumn("i", row_number().over(
        Window.partitionBy("key").orderBy("x")).cast("long"))
    ranked.groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("total"),
        sum(col("i") * col("x")).cast("long").as("ix"))
      .select(col("key"), col("n"), col("total"),
        expr("""CASE WHEN total > 0 THEN
               |  CAST((CAST(2 AS DECIMAL(38,0)) * ix - (n + 1) * total)
               |    * 1000000 div (CAST(n AS DECIMAL(38,0)) * total) AS LONG)
               |END""".stripMargin).as("gini_micro"))
  }

  /**
   * Exact LOWER weighted median per group: the smallest value v with
   * 2·W(≤v) ≥ W_total — the robust center a14's unweighted percentile
   * can't give when rows carry unequal mass (price median weighted by
   * quantity, latency median weighted by request count). Pure integer
   * selection, no interpolation: bit-identical across engines by
   * construction.
   *
   * Shape: one value-ordered window per group (RANGE frame, so equal
   * values always share one cumulative mass — tie order can't move the
   * crossing), the group total riding the SAME partitioning (no second
   * shuffle), then a skinny min-per-group of the crossing rows. At 100 TB
   * this is one sort-shuffle of the (group, value, weight) projection —
   * the exact-selection floor; a histogram/t-digest two-pass trades that
   * exactness for a scan when the sort is too hot.
   *
   * Contract: weights ≥ 0 (zero-weight rows can never cross the half
   * mass and cannot become the median); an all-zero-weight group
   * degenerates to its min value.
   *
   * Output: (group, n, total_weight, wmedian) — all BIGINT.
   */
  /**
   * Exact TRIMMED mean per group — the robust location between the mean
   * (breakdown 0%) and the median (discards all order information):
   * drop the lowest and highest ⌊n·trimBp/10⁴⌋ values by rank, average
   * the rest in pure integer micro units (⌊10⁶·Σkept / n_kept⌋). Rank
   * ties are interchangeable for a SUM — equal values dropped from
   * either end contribute identically — so the result is deterministic
   * even though row_number breaks value ties arbitrarily.
   *
   * One value-ordered window per group + a hash-agg; trimBp < 5000
   * guarantees at least one survivor per group.
   *
   * Output: (group, n, n_trim_each, trimmed_mean_micro) — all BIGINT.
   */
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

  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valCol: String,
                         trimBp: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimBp >= 0 && trimBp < 5000, s"trimBp must be in [0, 5000), got $trimBp")
    val g = col(groupCol)
    df.select(g, col(valCol).cast("long").as("_v"))
      .withColumn("_rn", row_number().over(Window.partitionBy(g).orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(g)))
      .withColumn("_k", expr(s"(_n * $trimBp) div 10000"))
      .filter(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"))
      .groupBy(g)
      .agg(first(col("_n")).cast("long").as("n"),
        first(col("_k")).cast("long").as("n_trim_each"),
        // sign-split floor-of-abs (the a25/a32 rule): Spark `div`
        // truncates toward zero while DuckDB `//` floors toward −∞, so a
        // negative sum must route through its absolute value on BOTH
        // engines for bit parity; the q/r split inside microMeanSql keeps
        // 10⁶·Σ out of long overflow at sf1+ group sizes
        expr(microMeanSql("sum(_v)", "count(1)")).as("trimmed_mean_micro"))
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
   * Average rank = rank() + (|ties| − 1)/2 — an exact multiple of ½, so
   * the rank columns are noise-free in double on every engine; the final
   * `corr` is 6-dp-rounded exactly like a18/a20 to absorb accumulation
   * order. Groups need ≥ 2 rows and nonzero rank variance on both sides
   * or rho is NULL (undefined, not 0).
   *
   * Shape: one exchange on the group key reused by both rank windows
   * (same partitioning, two in-partition sorts), then a hash-agg. No
   * joins, no global sort.
   */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    def avgRank(c: String): Column =
      rank().over(Window.partitionBy(g).orderBy(col(c))) +
        (count(lit(1)).over(Window.partitionBy(g, col(c))) - 1) / 2.0
    df.select(g, avgRank(xCol).as("_rx"), avgRank(yCol).as("_ry"))
      .groupBy(g)
      .agg(covar_samp(col("_rx"), col("_ry")).as("_cov"),
        stddev_samp(col("_rx")).as("_sx"), stddev_samp(col("_ry")).as("_sy"),
        count(lit(1)).as("n"))
      // corr as the guarded quotient: Spark 4's ANSI `corr` THROWS on a
      // zero-variance side, where the statistic is undefined — a constant
      // column must yield NULL (the DuckDB behavior), never kill the scan.
      // CaseWhen evaluates its branch lazily, so the division can't fire.
      .select(g,
        when(col("_sx") > 0 && col("_sy") > 0,
          round(col("_cov") / (col("_sx") * col("_sy")), 6)).as("rho"),
        col("n"))
  }

  def weightedMedianByGroup(df: DataFrame, groupCol: String, valCol: String,
                            weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valCol).cast("long").as("_v"),
        col(weightCol).cast("long").as("_w"))
      .withColumn("_cum", sum(col("_w")).over(byVal))
      .withColumn("_tot", sum(col("_w")).over(all))
      .withColumn("_n", count(lit(1)).over(all))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(groupCol))
      .agg(first(col("_n")).cast("long").as("n"),
        first(col("_tot")).cast("long").as("total_weight"),
        min(col("_v")).as("wmedian"))
  }
}

