package graft.queries

import org.apache.spark.sql.functions._
import Registry.{td, tdw}

/**
 * Statistical operators: exact percentiles (oracle), HLL sketch distinct
 * counts (self-checking; sketch internals differ per engine), and the
 * tumor/normal pairing shape from the CN build.
 */
object StatQueries {

  /** Exact decimal sum surfaced as double (same trick as AggQueries). */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  val all: Seq[(String, Q)] = Seq(

    // (a13 is an intentional gap — never assigned; a12 "paginated
    // accumulate" is covered by s13 per COVERAGE.md, and the statistics
    // family starts at a14. Tombstoned so audits don't hunt for a
    // missing row.)
    // exact percentiles over money — interpolation formula is shared
    // (sorted values, (n-1)*p), rounded for cross-engine stability.
    // Round 13: selected from the (status, price) → count histogram
    // (ops/HistogramSelect) instead of the buffering `percentile`
    // aggregate, whose per-group agg buffer holds EVERY value — O(corpus/
    // |groups|) heap on a 3-value key. The histogram selection is
    // bit-identical arithmetic on a domain-bounded input.
    "a14_percentiles" -> Q(
      (s, dir) => graft.ops.HistogramSelect.percentilesByGroup(
          td(s, dir, "orders"), "o_orderstatus", col("o_totalprice"),
          Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
        .select(col("o_orderstatus"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"),
          round(col("p99"), 4).as("p99")),
      Some("""SELECT o_orderstatus,
             |round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |round(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |FROM orders GROUP BY 1""".stripMargin)),

    // robust location/scale: exact per-group median + median absolute
    // deviation (ops/Stats.madByGroup) — the outlier-resistant complement
    // to a20's mean/σ z-scores; two hash-aggs + broadcast median join
    "a21_mad" -> Q(
      (s, dir) => graft.ops.Stats.madByGroup(
        td(s, dir, "lineitem"), "l_returnflag", "l_extendedprice"),
      Some("""WITH m AS (SELECT l_returnflag,
             |    quantile_cont(l_extendedprice, 0.5) AS med,
             |    CAST(count(l_extendedprice) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1)
             |SELECT l.l_returnflag, max(m.n) AS n, round(max(m.med), 4) AS med,
             |  round(quantile_cont(abs(l.l_extendedprice - m.med), 0.5), 4) AS mad
             |FROM lineitem l JOIN m USING (l_returnflag) GROUP BY 1""".stripMargin)),

    // a42 — range-partitioned EXACT percentiles (ops/RangeSelect): the
    // unbounded-domain complement to a14's histogram selection — the
    // approx_percentile sketch only ROUTES rows to ranges, the final
    // interpolated selection inside the located range is exact and
    // bit-identical to percentile()'s arithmetic; no task ever holds
    // more than ~n/nRanges rows per group
    "a42_percentiles_rangepart" -> Q(
      (s, dir) => graft.ops.RangeSelect.exactPercentilesByGroup(
          td(s, dir, "lineitem"), "l_returnflag", col("l_extendedprice"),
          Seq(("p25", 0.25), ("p50", 0.5), ("p95", 0.95)))
        .select(col("l_returnflag"),
          round(col("p25"), 4).as("p25"),
          round(col("p50"), 4).as("p50"),
          round(col("p95"), 4).as("p95")),
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // approx-percentile sketch (Greenwald-Khanna): like a15, the sketch
    // value itself is engine-specific, so the OUTPUT is the property the
    // sketch guarantees — the estimate brackets the exact percentile
    // within the configured relative-rank tolerance — which the oracle
    // recomputes exactly and expects true
    "a17_approx_percentile_sketch" -> Q(
      (s, dir) => {
        // rank-error bound: approx_percentile(accuracy=1000) returns a
        // value whose RANK is within n/1000 of 0.9n — so it must lie
        // between the exact percentiles at 0.9 ∓ 5/1000 (generous margin)
        td(s, dir, "orders").agg(
            expr("percentile(o_totalprice, 0.895)").as("lo"),
            expr("percentile(o_totalprice, 0.905)").as("hi"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("exact_p90"),
            expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap"))
          .select(col("exact_p90"),
            (col("ap") >= col("lo") && col("ap") <= col("hi")).as("within_bound"))
      },
      Some("""SELECT round(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
             |true AS within_bound FROM orders""".stripMargin)),

    // HLL-sketch distinct count: engines' sketches differ, so the raw
    // estimate can't be hash-compared — instead the OUTPUT is the property
    // the sketch must satisfy (exact count + a within-5% flag), which the
    // DuckDB oracle CAN verify: it recomputes the exact count and expects
    // the flag true. The sketch still runs; a drifted estimate flips the
    // flag and fails the row.
    //
    // a40 — HLL distinct sketch with PORTABLE registers (Flajolet et al.
    // 2007; graft/ops/HllSketch.scala): the mergeable-state path next to
    // a15's opaque approx_count_distinct — shards sketch independently
    // and merge by per-bucket max (spec'd). md5-derived hash, exact
    // integer bitlen ranks, and an exact ⌊A/S⌋ estimator (DECIMAL(38,0)
    // remainder trick, α₂₅₆ pinned as the micro constant 718273) — the
    // WHOLE sketch replays in DuckDB: registers, checksum, estimate.
    "a40_hll_distinct_sketch" -> Q(
      (s, dir) => graft.ops.HllSketch.summary(
        td(s, dir, "lineitem"), "l_returnflag", "l_partkey"),
      Some(s"""WITH vals AS (SELECT DISTINCT l_returnflag AS grp,
             |    CAST(l_partkey AS VARCHAR) AS v FROM lineitem),
             |h AS (SELECT grp, CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h60 FROM vals),
             |b AS (SELECT grp, h60 % 256 AS bucket, h60 // 256 AS w FROM h),
             |r AS (SELECT grp, bucket,
             |    MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - len(format('{:b}', w)) END) AS reg
             |  FROM b GROUP BY 1, 2),
             |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_hit,
             |    CAST(sum(reg * (bucket + 1)) AS BIGINT) AS reg_checksum,
             |    sum(CAST(9007199254740992 // (CAST(1 AS BIGINT) << reg) AS HUGEINT)) AS s_hit
             |  FROM r GROUP BY 1),
             |f AS (SELECT grp, n_hit, reg_checksum,
             |    s_hit + (256 - n_hit) * CAST(9007199254740992 AS HUGEINT) AS s_sum FROM s),
             |e AS (SELECT grp, CAST(count(*) AS BIGINT) AS exact_distinct FROM vals GROUP BY 1)
             |SELECT f.grp, f.n_hit, f.reg_checksum,
             |  CAST(CAST('${graft.ops.HllSketch.NumeratorA}' AS HUGEINT) // f.s_sum AS BIGINT) AS est_micro,
             |  e.exact_distinct,
             |  abs(CAST(CAST('${graft.ops.HllSketch.NumeratorA}' AS HUGEINT) // f.s_sum AS BIGINT)
             |    - e.exact_distinct * 1000000) <= e.exact_distinct * 500000 AS within_50pct
             |FROM f JOIN e USING (grp)""".stripMargin)),

    // Aggregate over the DISTINCT frame, not the raw one (round 10): with
    // countDistinct + HLL in ONE agg, Spark's distinct rewrite grouped the
    // partial HLL by l_partkey — a 410-word sketch shuffled PER KEY (3.3 KB
    // × every distinct partkey; explains/a15 r9:24). HLL depends only on
    // the SET of hashed values, so dedup-first is estimate-identical, and
    // the partial sketch count drops from |keys| to |partitions| — rsd 0.02
    // costs 3.3 KB × 32 partitions, which is why it can stay at the
    // tighter-than-default width.
    "a15_approx_distinct_sketch" -> Q(
      (s, dir) => {
        // count(col), not count(*): a NULL key survives distinct() as its
        // own row, but COUNT(DISTINCT ...) (the oracle) and the HLL both
        // exclude NULLs — count(col) keeps all three aligned
        val out = td(s, dir, "lineitem").select("l_partkey").distinct().agg(
          count(col("l_partkey")).cast("long").as("exact"),
          approx_count_distinct(col("l_partkey"), 0.02).cast("long").as("approx"))
          .withColumn("within_5pct",
            abs(col("approx") - col("exact")).cast("double") / col("exact") <= 0.05)
        assert(out.filter(!col("within_5pct")).isEmpty, "HLL estimate drifted > 5%")
        out.select(col("exact"), col("within_5pct"))
      },
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact,
             |true AS within_5pct FROM lineitem""".stripMargin), eager = true),

    // A16 — STRING_AGG ordered by a different key than the value (struct
    //   sort; the general ORDER BY case)
    "a16_string_agg_by_key" -> Q(
      (s, dir) => td(s, dir, "customer").groupBy("c_nationkey")
        .agg(graft.ops.Agg.stringAggOrderedBy(
          col("c_name"), col("c_acctbal"), ";").as("names_by_balance")),
      Some("""SELECT c_nationkey,
             |string_agg(c_name, ';' ORDER BY c_acctbal, c_name) AS names_by_balance
             |FROM customer GROUP BY 1""".stripMargin)),

    // Pearson correlation + sample covariance per group. corr is scale-free
    // (|r| ≤ 1): engine co-moment noise ~1e-14, safe at 6 dp. covar rides
    // the VALUE scale (~1e4 here): noise ~1e-6 absolute, so it rounds at
    // 2 dp where the boundary half-width (5e-3) dwarfs it
    "a18_corr_covar" -> Q(
      (s, dir) => td(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
             |round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
             |round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
             |CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ROLLUP: per-(flag,status) rows plus flag subtotals plus the grand
    // total in ONE aggregation pass — the report shape the reference
    // builds with repeated queries. Sums in exact DECIMAL (dsum)
    "a19_rollup" -> Q(
      (s, dir) => td(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // a39 — CUBE (all 2^k grouping-set combinations, the full OLAP
    // materialization next to a19's hierarchy-ordered ROLLUP): one
    // Expand + hash-agg plan, grouping-set id exposed so every subtotal
    // level is addressable
    "a39_cube" -> Q(
      (s, dir) => td(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(expr("grouping_id()").cast("long").as("gid"),
          count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // a41 — explicit GROUPING SETS (the third grouping-analytics form
    // next to a19 ROLLUP and a39 CUBE): a HAND-PICKED lattice — by
    // (flag, status), by flag, by status-only, and the grand total,
    // but NOT the (status, flag) redundancies CUBE would add — the
    // report-table shape when only some margins are wanted. grouping_id
    // disambiguates rows where a grouping column is NULL-by-data vs
    // NULL-by-aggregation
    "a41_grouping_sets" -> Q(
      (s, dir) => td(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(expr("grouping_id()").cast("long").as("gid"),
          count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |CAST(count(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |  (l_returnflag), (l_linestatus), ())""".stripMargin)),

    // per-group z-score standardization (windowed mean/stddev — the
    // feature-scaling step of any numeric ML prep): z is scale-free
    // (O(1)), so 6-dp rounding absorbs cross-engine moment noise exactly
    // as in a18
    "a20_zscore" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
        td(s, dir, "events").select(col("event_id"), col("event_type"),
            col("value"), avg(col("value")).over(w).as("_m"),
            stddev_samp(col("value")).over(w).as("_sd"))
          .select(col("event_id"), col("event_type"),
            round((col("value") - col("_m")) / col("_sd"), 6).as("z"))
      },
      Some("""SELECT event_id, event_type,
             |round((value - avg(value) OVER (PARTITION BY event_type))
             |  / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
             |FROM events""".stripMargin)),

    // C15 — one-pass table profile: the reference's QC metrics as a single
    //   aggregate (support.py:2219-2228)
    "c15_table_profile" -> Q(
      (s, dir) => graft.ops.Profile.profile(
        // money pre-cast to decimal: double→string rendering diverges across
        // engines at ≥1e7 (Spark goes scientific), decimal doesn't
        tdw(s, dir, "orders").withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)")),
        Seq("o_orderstatus", "o_custkey", "o_totalprice")),
      Some("""WITH a AS (SELECT CAST(count(o_orderstatus) AS BIGINT) AS s_nn, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
             |  CAST(min(o_orderstatus) AS VARCHAR) AS s_min, CAST(max(o_orderstatus) AS VARCHAR) AS s_max,
             |  CAST(count(o_custkey) AS BIGINT) AS c_nn, CAST(count(DISTINCT o_custkey) AS BIGINT) AS c_d,
             |  CAST(min(o_custkey) AS VARCHAR) AS c_min, CAST(max(o_custkey) AS VARCHAR) AS c_max,
             |  CAST(count(o_totalprice) AS BIGINT) AS t_nn,
             |  CAST(count(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) AS t_d,
             |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS t_min,
             |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS t_max,
             |  CAST(count(*) AS BIGINT) AS total FROM orders)
             |SELECT 'o_orderstatus' AS column_name, s_nn AS nonnull_count, s_d AS distinct_count,
             |  s_min AS min_value, s_max AS max_value, total AS total_count FROM a
             |UNION ALL SELECT 'o_custkey', c_nn, c_d, c_min, c_max, total FROM a
             |UNION ALL SELECT 'o_totalprice', t_nn, t_d, t_min, t_max, total FROM a""".stripMargin)),

    // C14 — tumor LEFT JOIN normal pairing (gene_level_copy_number.py:138-142):
    //   per (case, gene) the tumor measurement joined to its optional normal
    "c14_tumor_normal_pairing" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem")
        val measurements = l.select(
          (col("l_orderkey") % 500).as("case_id"),
          col("l_partkey").as("gene_id"),
          when(col("l_linenumber") % 2 === 0, lit("tumor")).otherwise(lit("normal")).as("sample_kind"),
          round(col("l_quantity") * 100).cast("long").as("cn"))
        val tumor = measurements.filter(col("sample_kind") === "tumor")
          .groupBy("case_id", "gene_id").agg(max(col("cn")).as("tumor_cn"))
        val normal = measurements.filter(col("sample_kind") === "normal")
          .groupBy(col("case_id").as("nc"), col("gene_id").as("ng"))
          .agg(max(col("cn")).as("normal_cn"))
        tumor.join(normal,
            tumor("case_id") === col("nc") && tumor("gene_id") === col("ng"), "left")
          .select(col("case_id"), col("gene_id"), col("tumor_cn"),
            coalesce(col("normal_cn"), lit(-1L)).as("normal_cn"))
      },
      Some("""WITH m AS (SELECT l_orderkey % 500 AS case_id, l_partkey AS gene_id,
             |  CASE WHEN l_linenumber % 2 = 0 THEN 'tumor' ELSE 'normal' END AS sample_kind,
             |  CAST(round(l_quantity*100) AS BIGINT) AS cn FROM lineitem),
             |t AS (SELECT case_id, gene_id, max(cn) AS tumor_cn FROM m WHERE sample_kind='tumor' GROUP BY 1,2),
             |n AS (SELECT case_id, gene_id, max(cn) AS normal_cn FROM m WHERE sample_kind='normal' GROUP BY 1,2)
             |SELECT t.case_id, t.gene_id, t.tumor_cn, COALESCE(n.normal_cn, -1) AS normal_cn
             |FROM t LEFT JOIN n ON t.case_id = n.case_id AND t.gene_id = n.gene_id""".stripMargin)),

    // one-vs-rest Welch two-sample location test per ingest source, in
    // EXACT integer/decimal arithmetic (the w10 strategy scaled to
    // Welch's t): is source X sending documents with different mean
    // length than everyone else? ONE corpus scan — every group's "rest"
    // derives from the broadcast global totals; |t| > 2 evaluated as a
    // DECIMAL(38,0)/HUGEINT polynomial inequality, bit-identical on
    // both engines, no sqrt anywhere
    "a22_welch_drift" -> Q(
      (s, dir) => graft.ops.Stats.welchOneVsRest(
        td(s, dir, "documents"), "source", "n_chars"),
      Some("""WITH g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS na,
             |    CAST(sum(n_chars) AS BIGINT) AS sa,
             |    CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS qa
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(na) AS BIGINT) AS n_tot,
             |    CAST(sum(sa) AS BIGINT) AS s_tot,
             |    CAST(sum(qa) AS HUGEINT) AS q_tot FROM g),
             |j AS (SELECT g.*, t.n_tot - g.na AS nb, t.s_tot - g.sa AS sb,
             |    t.q_tot - g.qa AS qb FROM g, t)
             |SELECT grp AS source, na AS n,
             |  CAST((sa * 1000000) // na AS BIGINT) AS mean_micro,
             |  CAST((sb * 1000000) // nb AS BIGINT) AS rest_mean_micro,
             |  (na >= 2 AND nb >= 2 AND
             |    (CAST(sa AS HUGEINT)*nb - CAST(sb AS HUGEINT)*na)
             |      * (CAST(sa AS HUGEINT)*nb - CAST(sb AS HUGEINT)*na)
             |      * (na - 1) * (nb - 1)
             |    > 4 * ((na*qa - CAST(sa AS HUGEINT)*sa) * nb * nb * (nb - 1)
             |         + (nb*qb - CAST(sb AS HUGEINT)*sb) * na * na * (na - 1))
             |  ) AS significant
             |FROM j""".stripMargin)),

    // chi-square drift table: event_type x day-of-week contingency with
    // exact floor-micro-unit expected counts and chi2 contributions —
    // the categorical-mix complement to a22's location test and w10's
    // volume z-test; integer arithmetic only (no float division), so
    // every cell replays bit-for-bit
    "a23_chi2_drift" -> Q(
      (s, dir) => {
        val e = Registry.tdEventsUs(s, dir)
          .select(col("event_type"),
            expr("(ts_us div 86400000000 + 4) % 7").cast("long").as("dow"))
        graft.ops.Anomaly.chiSquareDrift(e, "event_type", "dow")
      },
      Some("""WITH base AS (SELECT event_type,
             |    CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow
             |  FROM events),
             |cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
             |  FROM base GROUP BY 1, 2),
             |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
             |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
             |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
             |SELECT c.event_type, c.dow, c.o,
             |  CAST((CAST(rt.rt AS HUGEINT) * ct.ct * 1000000) // nt.n AS BIGINT) AS e_micro,
             |  CAST(((CAST(nt.n AS HUGEINT)*c.o - CAST(rt.rt AS HUGEINT)*ct.ct)
             |      * (CAST(nt.n AS HUGEINT)*c.o - CAST(rt.rt AS HUGEINT)*ct.ct)
             |      * 1000000) // (CAST(nt.n AS HUGEINT) * rt.rt * ct.ct) AS BIGINT)
             |    AS contrib_micro
             |FROM cells c
             |JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nt""".stripMargin)),

    // one-vs-rest Mann-Whitney U per source (nonparametric complement to
    // a22's Welch test — rank-based, outlier-robust): doubled tie-averaged
    // ranks keep everything integer; the tie-corrected |z| > 2 test is a
    // cleared-denominator polynomial inequality; rank-biserial effect
    // size in floor micro-units with explicit TRUNCATING division
    // (Spark div truncates, DuckDB // floors — the oracle spells
    // sign-split floor-of-abs so negatives can't diverge)
    "a24_mann_whitney" -> Q(
      (s, dir) => graft.ops.Stats.mannWhitneyOneVsRest(
        td(s, dir, "documents"), "source", "n_chars"),
      Some("""WITH gv AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM gv GROUP BY 1),
             |rk AS (SELECT v, t,
             |    2 * CAST(coalesce(sum(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      + t + 1 AS r2
             |  FROM vh),
             |g AS (SELECT grp, CAST(sum(c) AS BIGINT) AS na,
             |    CAST(sum(CAST(c AS HUGEINT) * r2) AS HUGEINT) AS sr2
             |  FROM gv JOIN rk USING (v) GROUP BY 1),
             |tt AS (SELECT CAST(sum(CAST(t AS HUGEINT)*t*t - t) AS HUGEINT) AS ties,
             |    CAST(sum(t) AS BIGINT) AS n_tot FROM rk),
             |j AS (SELECT g.grp, g.na, g.sr2, tt.ties, tt.n_tot,
             |    tt.n_tot - g.na AS nb FROM g, tt),
             |u AS (SELECT grp, na, nb, n_tot, ties,
             |    sr2 - CAST(na AS HUGEINT) * (na + 1) AS u2h,
             |    CAST(na AS HUGEINT) * nb AS nanb
             |  FROM j)
             |SELECT grp AS source, na AS n, CAST(u2h AS BIGINT) AS u2,
             |  CASE WHEN nb > 0 THEN
             |    CASE WHEN nanb - u2h >= 0
             |      THEN CAST(((nanb - u2h) * 1000000) // nanb AS BIGINT)
             |      ELSE -CAST(((u2h - nanb) * 1000000) // nanb AS BIGINT)
             |    END END AS effect_micro,
             |  (na >= 2 AND nb >= 2 AND
             |    3 * CAST(n_tot AS HUGEINT) * (n_tot - 1) * (u2h - nanb) * (u2h - nanb)
             |    > 4 * nanb * ((CAST(n_tot AS HUGEINT)*n_tot*n_tot - n_tot) - ties)
             |  ) AS significant
             |FROM u""".stripMargin)),

    // a25 — exact per-key OLS volume trend over the daily event series:
    // the TREND monitor next to the level drift tests (a21-a24); slope /
    // intercept / R² in integer micro-units from exact integer sums,
    // DECIMAL(38,0)·HUGEINT products, sign-split floor division (the a24
    // rule). Events reduce to one (key, day) row before any window
    "a25_ols_trend" -> Q(
      (s, dir) => graft.ops.Stats.olsTrend(
        Registry.tdEventsUs(s, dir), "event_type", "ts_us"),
      Some("""WITH daily AS (SELECT event_type AS key,
             |    epoch_us(ts)//86400000000 AS day, CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |c AS (SELECT key, day - min(day) OVER (PARTITION BY key) AS x, y FROM daily),
             |g AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
             |  FROM c GROUP BY 1),
             |t AS (SELECT key, n,
             |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
             |    CAST(n AS HUGEINT) * sxx - sx * sx AS den,
             |    CAST(n AS HUGEINT) * syy - sy * sy AS deny,
             |    sx, sy FROM g),
             |sl AS (SELECT *, CASE WHEN den > 0 THEN
             |    CASE WHEN num >= 0 THEN CAST((num * 1000000) // den AS BIGINT)
             |         ELSE -CAST(((-num) * 1000000) // den AS BIGINT) END
             |  END AS slope_micro FROM t),
             |ic AS (SELECT *, sy * 1000000 - CAST(slope_micro AS HUGEINT) * sx AS icnum FROM sl)
             |SELECT key AS event_type, n AS n_days, slope_micro,
             |  CASE WHEN den > 0 THEN
             |    CASE WHEN icnum >= 0 THEN CAST(icnum // n AS BIGINT)
             |         ELSE -CAST((-icnum) // n AS BIGINT) END
             |  END AS intercept_micro,
             |  CASE WHEN den > 0 AND deny > 0
             |    THEN CAST((num * num * 1000000) // (den * deny) AS BIGINT)
             |  END AS r2_micro
             |FROM ic""".stripMargin)),

    // a26 — one-vs-rest two-sample Kolmogorov–Smirnov per source, exact
    // integer ECDF arithmetic: closes the drift family (a22 location /
    // a23 categorical mix / a24 ranks / a26 full distribution shape).
    // D's numerator is evaluated SPARSELY at each group's own value
    // points + just-before points (provably covers the supremum — cumG
    // is constant and f monotone between group points); the Smirnov
    // threshold is the cleared-denominator integer inequality
    // 1e6·D_num² > c²micro·n·ng·nb — no sqrt, no float, replays exactly
    "a26_ks_drift" -> Q(
      (s, dir) => graft.ops.Stats.ksOneVsRest(
        td(s, dir, "documents"), "source", "n_chars"),
      Some("""WITH gv AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS t,
             |    CAST(sum(sum(c)) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumtot
             |  FROM gv GROUP BY 1),
             |r AS (SELECT gv.grp, gv.v, gv.c, vh.t, vh.cumtot,
             |    CAST(sum(gv.c) OVER (PARTITION BY gv.grp ORDER BY gv.v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumg,
             |    CAST(sum(gv.c) OVER (PARTITION BY gv.grp) AS BIGINT) AS ng
             |  FROM gv JOIN vh USING (v)),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM gv),
             |cand AS (SELECT r.grp, r.ng, t.n_tot,
             |    abs(CAST(r.cumg AS HUGEINT) * t.n_tot - CAST(r.cumtot AS HUGEINT) * r.ng) AS canda,
             |    abs(CAST(r.cumg - r.c AS HUGEINT) * t.n_tot - CAST(r.cumtot - r.t AS HUGEINT) * r.ng) AS candb
             |  FROM r, t),
             |m AS (SELECT grp, max(ng) AS ng, max(n_tot) AS n_tot,
             |    max(greatest(canda, candb)) AS dnum FROM cand GROUP BY 1)
             |SELECT grp AS source, ng AS n,
             |  CASE WHEN n_tot - ng > 0
             |    THEN CAST((dnum * 1000000) // (CAST(ng AS HUGEINT) * (n_tot - ng)) AS BIGINT) END AS d_micro,
             |  (ng >= 1 AND n_tot - ng >= 1 AND
             |    dnum * dnum * 1000000 > CAST(1844440 AS HUGEINT) * n_tot * ng * (n_tot - ng)
             |  ) AS significant
             |FROM m""".stripMargin)),

    // a27 — Benford's-law first-digit audit over exact price cents: the
    // forensic screen for fabricated/truncated numeric feeds next to the
    // drift tests. Micro-proportions of log10(1+1/d) sum to exactly 1e6,
    // so expected counts and the per-digit micro-chi2 contributions are
    // pure integer arithmetic; leading digit = first character of the
    // decimal string (engine-identical); absent digits still emit o=0
    "a27_benford" -> Q(
      (s, dir) => graft.ops.Anomaly.benfordAudit(
        td(s, dir, "lineitem")
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "cents"),
      Some("""WITH v AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS v
             |  FROM lineitem WHERE CAST(round(l_extendedprice*100) AS BIGINT) > 0),
             |obs AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    CAST(count(*) AS BIGINT) AS o FROM v GROUP BY 1),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
             |p AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             |    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
             |    (9, 45757)) t(digit, pm)),
             |d AS (SELECT CAST(p.digit AS BIGINT) AS digit, CAST(p.pm AS HUGEINT) AS pm,
             |    n.n, COALESCE(obs.o, 0) AS o
             |  FROM p CROSS JOIN n LEFT JOIN obs ON obs.digit = p.digit)
             |SELECT digit, o, CAST(n * pm AS BIGINT) AS e_micro,
             |  CAST(((1000000::HUGEINT * o - CAST(n AS HUGEINT) * pm)
             |      * (1000000::HUGEINT * o - CAST(n AS HUGEINT) * pm))
             |    // (CAST(n AS HUGEINT) * pm) AS BIGINT) AS contrib_micro
             |FROM d""".stripMargin)),

    // k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    // al. 2007) — the release-gate governance table next to the PII scrub
    // (l26): one row per quasi-identifier class (nation, segment) with
    // its size, sensitive-value (acctbal) diversity, and both violation
    // flags; ONE hash-agg, no joins
    "l100_k_anonymity" -> Q(
      (s, dir) => graft.ops.Anonymity.kAnonymityAudit(
        td(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        "c_acctbal", k = 5, l = 3),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS class_n,
             |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS sensitive_distinct,
             |  count(*) < 5 AS violates_k,
             |  count(DISTINCT c_acctbal) < 3 AS violates_l
             |FROM customer GROUP BY 1, 2""".stripMargin)),

    // l117 — t-closeness audit (Li-Li-Venkatasubramanian 2007): the third
    // anonymity rung after l100's k/l — each QI class's ORDERED sensitive
    // distribution must stay within EMD t of the global one. Ordered EMD
    // closed form over integer bucket counts: cumulative numerators on
    // the n_class·n_total common denominator, EXACT micro-unit floor.
    // Buckets = floor(c_acctbal/1500.0) — IEEE ÷ and floor are
    // correctly-rounded (bit-identical cross-engine); only libm is not
    "l117_t_closeness" -> Q(
      (s, dir) => graft.ops.Anonymity.tClosenessAudit(
        td(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / lit(1500.0)), tMicro = 150000L),
      oracle = Some("""WITH b AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 1500.0) AS BIGINT) AS bk
             |  FROM customer),
             |cb AS (SELECT c_nationkey, c_mktsegment, bk,
             |    CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
             |gb AS (SELECT bk, CAST(count(*) AS BIGINT) AS g FROM b GROUP BY 1),
             |cls AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM cb),
             |grid AS (SELECT cls.c_nationkey, cls.c_mktsegment, gb.bk, gb.g,
             |    COALESCE(cb.c, 0) AS c
             |  FROM cls CROSS JOIN gb
             |  LEFT JOIN cb USING (c_nationkey, c_mktsegment, bk)),
             |w AS (SELECT *,
             |    sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS nc,
             |    sum(g) OVER (PARTITION BY c_nationkey, c_mktsegment) AS nt
             |  FROM grid),
             |cum AS (SELECT *,
             |    sum(c * nt - g * nc) OVER (PARTITION BY c_nationkey, c_mktsegment
             |      ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cm
             |  FROM w),
             |agg AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(max(nc) AS BIGINT) AS class_n,
             |    CAST(count(*) AS BIGINT) AS m_buckets,
             |    CAST(sum(abs(cm)) AS BIGINT) AS sa,
             |    CAST(max(nt) AS BIGINT) AS nt
             |  FROM cum GROUP BY 1, 2)
             |SELECT c_nationkey, c_mktsegment, class_n, m_buckets,
             |  CAST(CASE WHEN m_buckets <= 1 THEN 0
             |       ELSE sa * 1000000 // ((m_buckets - 1) * class_n * nt)
             |       END AS BIGINT) AS emd_micro,
             |  CASE WHEN m_buckets <= 1 THEN 0
             |       ELSE sa * 1000000 // ((m_buckets - 1) * class_n * nt)
             |       END > 150000 AS violates_t
             |FROM agg""".stripMargin), eager = true),

  )
}
