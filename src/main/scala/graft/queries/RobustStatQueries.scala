package graft.queries

import org.apache.spark.sql.functions._
import Registry.td

/**
 * Survival / robust-statistics registry rows (split from StatQueries,
 * round 11 — pure mechanical move on the family seam, registry content
 * unchanged; Registry.all concatenates this AFTER StatQueries so the
 * global inventory order is preserved): Kaplan-Meier, log-rank, Gini,
 * autocorrelation, weighted median, Spearman, mode, seasonal profile,
 * Theil-Sen, and the trimmed mean.
 */
object RobustStatQueries {

  val all: Seq[(String, Q)] = Seq(
    // Kaplan-Meier survival curves (Kaplan & Meier 1958) — the clinical-
    // outcomes estimator over the reference's days_to_event/vital_status
    // shapes (clinical/Survival.scala). Cohort derived from orders:
    // arm = o_orderpriority, follow-up = day-of-year of o_orderdate,
    // event = status F (O/P censored). Exact integer micro-unit per-step
    // floor recursion S_k = floor(S_{k-1}·(n_k-d_k)/n_k) — the oracle
    // replays it as an ordered recursive CTE with `//`; the per-time
    // table is calendar-bounded, never subject-bounded
    "a28_kaplan_meier" -> Q(
      (s, dir) => graft.clinical.Survival.kaplanMeier(
        td(s, dir, "orders").select(
          col("o_orderpriority").as("grp"),
          dayofyear(col("o_orderdate")).as("t"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("ev")),
        "grp", "t", "ev"),
      Some("""WITH RECURSIVE base AS (SELECT o_orderpriority AS grp,
             |    CAST(dayofyear(o_orderdate) AS BIGINT) AS t,
             |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
             |  FROM orders),
             |pt AS (SELECT grp, t, CAST(sum(ev) AS BIGINT) AS d,
             |    CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
             |r AS (SELECT grp, t, d,
             |    CAST(sum(c) OVER (PARTITION BY grp)
             |      - COALESCE(sum(c) OVER (PARTITION BY grp ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n_risk
             |  FROM pt),
             |e AS (SELECT grp, t, d, n_risk,
             |    row_number() OVER (PARTITION BY grp ORDER BY t) AS rn
             |  FROM r WHERE d > 0),
             |km AS (
             |  SELECT grp, t, d, n_risk, rn,
             |    (CAST(1000000 AS BIGINT) * (n_risk - d)) // n_risk AS surv
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.grp, e.t, e.d, e.n_risk, e.rn,
             |    (km.surv * (e.n_risk - e.d)) // e.n_risk
             |  FROM km JOIN e ON e.grp = km.grp AND e.rn = km.rn + 1)
             |SELECT grp, t, n_risk, d AS d_events, surv AS surv_micro
             |FROM km""".stripMargin)),

    // log-rank test (Mantel 1966) over the a28 cohort: URGENT arm vs
    // rest. Every per-time O/E/V term is floor-divided integer micro-
    // arithmetic (variance in DECIMAL(38,0) ↔ HUGEINT — the intermediate
    // reaches ~10²¹); sums of exact longs need no recursion, so unlike
    // a28 this is one hash-agg + one calendar-bounded window + one agg
    "a29_logrank" -> Q(
      (s, dir) => graft.clinical.Survival.logRank(
        td(s, dir, "orders").select(
          col("o_orderpriority").as("grp"),
          dayofyear(col("o_orderdate")).as("t"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("ev")),
        "grp", "t", "ev", armA = "1-URGENT"),
      Some("""WITH base AS (SELECT CAST(dayofyear(o_orderdate) AS BIGINT) AS t,
             |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
             |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a1
             |  FROM orders),
             |pt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
             |    CAST(count(*) AS BIGINT) AS c,
             |    CAST(sum(ev * a1) AS BIGINT) AS d1,
             |    CAST(sum(a1) AS BIGINT) AS c1
             |  FROM base GROUP BY 1),
             |r AS (SELECT t, d, d1,
             |    CAST(sum(c) OVER () - COALESCE(sum(c) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n,
             |    CAST(sum(c1) OVER () - COALESCE(sum(c1) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n1
             |  FROM pt),
             |terms AS (SELECT d1, (d * n1 * 1000000) // n AS e_micro,
             |    CASE WHEN n > 1 THEN CAST(
             |      (d::HUGEINT * (n - d) * n1 * (n - n1) * 1000000)
             |        // (n::HUGEINT * n * (n - 1)) AS BIGINT)
             |      ELSE 0 END AS v_micro
             |  FROM r WHERE d > 0),
             |s AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |    CAST(sum(e_micro) AS BIGINT) AS e1_micro,
             |    CAST(sum(v_micro) AS BIGINT) AS v_micro,
             |    CAST(count(*) AS BIGINT) AS n_times FROM terms)
             |SELECT o1, e1_micro, v_micro,
             |  CASE WHEN v_micro > 0 THEN CAST(
             |    ((o1 * 1000000 - e1_micro)::HUGEINT * (o1 * 1000000 - e1_micro))
             |      // v_micro AS BIGINT) ELSE 0 END AS chi2_micro,
             |  n_times
             |FROM s""".stripMargin)),

    // exact Gini concentration per source (ops/Stats.giniByGroup): how
    // unevenly is character mass distributed across each source's docs —
    // the inequality audit beside the balance samplers (l33/l48).
    // Sorted-rank closed form, tie-invariant, one DECIMAL(38,0)/HUGEINT
    // floor division in micro-units
    "a31_gini" -> Q(
      (s, dir) => graft.ops.Stats.giniByGroup(
        td(s, dir, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars"),
      Some("""WITH r AS (SELECT source AS key, CAST(n_chars AS BIGINT) AS x,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars) AS BIGINT) AS i
             |  FROM documents)
             |SELECT key, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(x) AS BIGINT) AS total,
             |  CAST(CASE WHEN sum(x) > 0 THEN
             |    ((2::HUGEINT * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000)
             |      // (count(*)::HUGEINT * sum(x)) END AS BIGINT) AS gini_micro
             |FROM r GROUP BY 1""".stripMargin)),

    // exact lag-k autocorrelation per event_type over daily volumes
    // (Stats.autocorr): lag 7 is the weekly-rhythm signal beside the
    // level/trend/change-point monitors. Cleared-denominator integer
    // products, time-offset pairing (gaps shrink n_pairs), sign-split
    // floor-of-abs micro quotient — the a25 rule
    "a32_autocorr" -> Q(
      (s, dir) => graft.ops.Stats.autocorr(
        Registry.tdEventsUs(s, dir)
          .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
            lit(1L).as("one")),
        "event_type", "day", "one", lags = Seq(1, 2, 7)),
      Some("""WITH pt AS (SELECT event_type AS key,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS s FROM pt GROUP BY 1),
             |d AS (SELECT pt.key, t, n * x - s AS dev
             |  FROM pt JOIN st USING (key)),
             |den AS (SELECT key, CAST(sum(dev * dev) AS BIGINT) AS den
             |  FROM d GROUP BY 1),
             |lg AS (SELECT a.key, l.k AS lag,
             |    CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(a.dev * b.dev) AS BIGINT) AS num
             |  FROM d a
             |  CROSS JOIN (VALUES (1), (2), (7)) l(k)
             |  JOIN d b ON a.key = b.key AND b.t = a.t + l.k
             |  GROUP BY 1, 2)
             |SELECT lg.key, CAST(lag AS BIGINT) AS lag, n_pairs,
             |  CAST(CASE WHEN den > 0 THEN
             |    CASE WHEN num >= 0 THEN (num * 1000000) // den
             |         ELSE -(((-num) * 1000000) // den) END
             |  END AS BIGINT) AS r_micro
             |FROM lg JOIN den USING (key)""".stripMargin)),

    // a33 — exact lower WEIGHTED median (Stats.weightedMedianByGroup):
    // price center per return flag where each line item counts with its
    // quantity's mass, not once — the unequal-row-mass complement to
    // a14's percentile and a21's MAD. Pure integer selection (smallest v
    // with 2·W(≤v) ≥ W_total), RANGE-frame cumulative so tie order can't
    // move the crossing; one value-ordered window + a skinny min
    "a33_weighted_median" -> Q(
      (s, dir) => graft.ops.Stats.weightedMedianByGroup(
        td(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
          col("l_quantity").cast("long").as("qty")),
        "grp", "price_cents", "qty"),
      Some("""WITH r AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS v,
             |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
             |c AS (SELECT grp, v, w,
             |    sum(w) OVER (PARTITION BY grp ORDER BY v
             |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(w) OVER (PARTITION BY grp) AS tot,
             |    count(*) OVER (PARTITION BY grp) AS cnt
             |  FROM r)
             |SELECT grp, CAST(min(cnt) AS BIGINT) AS n,
             |  CAST(min(tot) AS BIGINT) AS total_weight,
             |  CAST(min(v) AS BIGINT) AS wmedian
             |FROM c WHERE 2*cum >= tot GROUP BY 1""".stripMargin)),

    // a34 — Spearman rank correlation (Stats.spearmanByGroup): monotone
    // association per return flag, robust where a18's Pearson bends to
    // outliers. Average ranks over ties are exact multiples of 1/2
    // (noise-free in double); the rank corr rounds to 6 dp — the a18 rule
    "a34_spearman" -> Q(
      (s, dir) => graft.ops.Stats.spearmanByGroup(
        td(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
          col("l_quantity"), col("l_extendedprice")),
        "grp", "l_quantity", "l_extendedprice"),
      Some("""WITH rk AS (SELECT l_returnflag AS grp,
             |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
             |      + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)/2.0 AS rx,
             |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
             |      + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)/2.0 AS ry
             |  FROM lineitem)
             |SELECT grp, round(corr(rx, ry), 6) AS rho,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM rk GROUP BY 1""".stripMargin)),

    // a35 — exact mode with deterministic ties (Stats.modeByGroup): the
    // most frequent quantity per return flag, ties to the smallest
    // value — engine-native mode() is tie-nondeterministic under
    // parallelism, so replayed pipelines need this pinned form. Two
    // hash-aggs via a (−count, value) struct min; no window sort
    "a35_mode" -> Q(
      (s, dir) => graft.ops.Stats.modeByGroup(
        td(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
          col("l_quantity")),
        "grp", "l_quantity"),
      Some("""WITH c AS (SELECT l_returnflag AS grp,
             |    CAST(l_quantity AS BIGINT) AS v,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT grp, v, cnt,
             |    row_number() OVER (PARTITION BY grp
             |      ORDER BY cnt DESC, v) AS rn,
             |    count(*) OVER (PARTITION BY grp) AS nd
             |  FROM c)
             |SELECT grp, v AS mode_value, cnt AS mode_count,
             |  CAST(nd AS BIGINT) AS n_distinct
             |FROM r WHERE rn = 1""".stripMargin)),

    // a36 — seasonal profile + residual (Anomaly.seasonalProfile): the
    // weekly-rhythm baseline per (event_type, day-of-period) that w10's
    // trailing z-test and a30's CUSUM would otherwise read as perpetual
    // drift. Exact ⌊10⁶·Σx/n⌋ season means (integer div, engine-exact),
    // residuals in micro units; both season windows share one
    // (key, season) exchange
    "a36_seasonal_profile" -> Q(
      (s, dir) => graft.ops.Anomaly.seasonalProfile(
        Registry.tdEventsUs(s, dir)
          .groupBy(col("event_type").as("key"),
            expr("ts_us div 86400000000").as("day"))
          .agg(count(lit(1)).as("x")),
        "key", "day", "x", period = 7),
      Some("""WITH pt AS (SELECT event_type AS key,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2)
             |SELECT key, t, x, CAST(t % 7 AS BIGINT) AS season,
             |  CAST((1000000 * sum(x) OVER w) // (count(*) OVER w) AS BIGINT)
             |    AS season_micro,
             |  CAST(x * 1000000
             |    - (1000000 * sum(x) OVER w) // (count(*) OVER w) AS BIGINT)
             |    AS resid_micro
             |FROM pt
             |WINDOW w AS (PARTITION BY key, t % 7)""".stripMargin)),

    // a37 — Theil–Sen robust slope (Stats.theilSen): median of all
    // pairwise slopes of the daily-volume series per event_type — the
    // outlier-proof trend beside a25's OLS (breakdown ~29% vs 0%).
    // Sign-split floor micro slopes (the a25/a32 rule), LOWER median by
    // pure rank selection; pairwise is O(n²) in SERIES points (bounded
    // monitor series), never in raw events
    "a37_theil_sen" -> Q(
      (s, dir) => graft.ops.Stats.theilSen(
        Registry.tdEventsUs(s, dir)
          .groupBy(col("event_type").as("key"),
            expr("ts_us div 86400000000").as("day"))
          .agg(count(lit(1)).as("x")),
        "key", "day", "x"),
      Some("""WITH pt AS (SELECT event_type AS key,
             |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS t,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.key,
             |    CASE WHEN b.x >= a.x
             |      THEN ((b.x - a.x) * 1000000) // (b.t - a.t)
             |      ELSE -(((a.x - b.x) * 1000000) // (b.t - a.t)) END AS s
             |  FROM pt a JOIN pt b ON a.key = b.key AND b.t > a.t),
             |r AS (SELECT key, s,
             |    row_number() OVER (PARTITION BY key ORDER BY s) AS rn,
             |    count(*) OVER (PARTITION BY key) AS n
             |  FROM p)
             |SELECT key, CAST(n AS BIGINT) AS n_pairs,
             |  CAST(s AS BIGINT) AS slope_micro
             |FROM r WHERE rn = (n + 1) // 2""".stripMargin)),

    // a38 — exact trimmed mean (Stats.trimmedMeanByGroup): 5%-each-side
    // trimmed price center per return flag — the robust location between
    // mean and median. Rank ties are interchangeable for a SUM so the
    // arbitrary row_number tie-break cannot move the result; micro mean
    // via sign-split floor-of-abs (the a25/a32 div-vs-// rule)
    "a38_trimmed_mean" -> Q(
      (s, dir) => graft.ops.Stats.trimmedMeanByGroup(
        td(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "grp", "cents", trimBp = 500L),
      Some("""WITH r AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS v FROM lineitem),
             |w AS (SELECT grp, v,
             |    row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
             |    count(*) OVER (PARTITION BY grp) AS n
             |  FROM r),
             |kept AS (SELECT grp, v, n, (n * 500) // 10000 AS k FROM w
             |  WHERE rn > (n * 500) // 10000 AND rn <= n - (n * 500) // 10000)
             |SELECT grp, CAST(min(n) AS BIGINT) AS n,
             |  CAST(min(k) AS BIGINT) AS n_trim_each,
             |  CAST(CASE WHEN sum(v) >= 0
             |    THEN (1000000 * sum(v)) // count(*)
             |    ELSE -((1000000 * -sum(v)) // count(*)) END AS BIGINT)
             |    AS trimmed_mean_micro
             |FROM kept GROUP BY 1""".stripMargin))
  )
}
