package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Statistical-test aggregates (split from [[Agg]] round 11; the
 * rank/order-window half moved to [[RankStats]] round 12 — both pure
 * mechanical moves): MAD, Welch / Mann-Whitney / KS one-vs-rest drift
 * tests, OLS trend. All exact integer/decimal micro-unit arithmetic —
 * see each member's scaladoc for the cross-engine rounding contract.
 */
object Stats extends RankStats {
  /**
   * Per-group robust location/scale: exact median plus median absolute
   * deviation (MAD = median(|x − median(x)|)) — the outlier-resistant
   * complement to a20's mean/stddev z-scores (a fat-tailed metric column
   * makes mean±3σ useless; median±k·MAD is the standard robust gate).
   *
   * Scale shape (round 13, the histogram-first rule): ONE corpus scan
   * builds a (group, value) → count histogram — a fully parallel hash
   * aggregation — and both medians are interpolated selections over
   * cumulative histograms ([[HistogramSelect]], bit-identical arithmetic
   * to Spark's `percentile`: h = p·(n−1), interpolate ranks ⌊h⌋+1 and
   * ⌊h⌋+2). The DEVIATION histogram is derived from the value histogram
   * (|v − med| per distinct value, counts re-merged), never from a second
   * corpus pass, so nothing downstream of the first aggregation is
   * corpus-sized and no task ever buffers a group's values. Replaces the
   * r12 plan whose exact `percentile` buffered O(corpus/|groups|) rows
   * per agg buffer. Results round to 4dp like a14 to absorb interpolation
   * float noise.
   *
   * Output: (group, n, med, mad) — n BIGINT, med/mad rounded doubles.
   */
  def madByGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val g = col(groupCol)
    val hist = HistogramSelect.cumHistogram(df, groupCol, col(valCol))
    // med and n ride the selection agg; the deviation stage carries them
    // forward as group constants so nothing ever joins back to this
    // branch — the histogram is consumed once here, once below (two
    // corpus scans total, like the r12 plan, minus its value buffering)
    val meds = HistogramSelect.percentilesFromHistogram(
      hist, groupCol, Seq(("_med", 0.5)),
      extra = Seq("_hn" -> max(col("_n")).cast("long")))
    val devHist = HistogramSelect.annotate(
      hist.select(g, col("_v"), col("_c"))
        .join(broadcast(meds), Seq(groupCol))
        .groupBy(g, abs(col("_v") - col("_med")).as("_v"))
        .agg(sum("_c").as("_c"), first("_med").as("_m0"), first("_hn").as("_n0")),
      groupCol)
    HistogramSelect.percentilesFromHistogram(
      devHist, groupCol, Seq(("_mad", 0.5)),
      extra = Seq("_m1" -> first("_m0"), "_n1" -> first("_n0")))
      .select(g, col("_n1").as("n"), round(col("_m1"), 4).as("med"),
        round(col("_mad"), 4).as("mad"))
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
}
