package graft.queries

import org.apache.spark.sql.functions._
import graft.clinical.Clinical
import graft.normalize.Normalize
import graft.ops.{Agg, JoinOps}
import Registry.{td, tdw}

/**
 * Scale-pattern operators: theta-join rewrite, skew salting, null-column
 * pruning, and the file-metadata DAG composite (SURVEY §3.2) — the
 * reference's driver-memory merge re-expressed as one distributed plan.
 */
object ScaleQueries {

  val all: Seq[(String, Q)] = Seq(

    // J12 — OR-of-regex theta join → union of equi-joins
    //   (gene_level_copy_number.py:57-59). Oracle keeps the raw OR join as
    //   ground truth (DuckDB nested-loops it; fine at oracle scale).
    "j12_or_of_regex_join" -> Q(
      (s, dir) => {
        val left = td(s, dir, "lineitem")
          .filter(col("l_orderkey") % 20 === 0)
          .select(concat(col("l_partkey"), lit("-"), col("l_suppkey")).as("code"),
            col("l_orderkey"))
          .distinct()
        val right = td(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        JoinOps.orOfKeysJoin(left, right,
          Seq(regexp_extract(col("code"), "^([0-9]+)-", 1).cast("long"),
            regexp_extract(col("code"), "-([0-9]+)$", 1).cast("long")),
          "s_suppkey")
          .select("code", "l_orderkey", "s_suppkey", "s_name")
      },
      Some("""SELECT DISTINCT code, l_orderkey, s_suppkey, s_name
             |FROM (SELECT DISTINCT l_partkey || '-' || l_suppkey AS code, l_orderkey
             |      FROM lineitem WHERE l_orderkey % 20 = 0) l
             |JOIN supplier ON CAST(regexp_extract(code, '^([0-9]+)-', 1) AS BIGINT) = s_suppkey
             |  OR CAST(regexp_extract(code, '-([0-9]+)$', 1) AS BIGINT) = s_suppkey""".stripMargin)),

    // J13 — skew-salted join: result identical to the plain join, shuffle
    //   spread over `buckets` tasks per hot key
    "j13_salted_join" -> Q(
      (s, dir) => {
        val l = td(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        val p = td(s, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_name"))
        JoinOps.saltedJoin(l, p, "l_partkey", buckets = 8)
          .select("l_orderkey", "l_partkey", "l_quantity", "p_name")
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity, p_name
             |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),

    // J24 — join-key SKEW report (the pre-join diagnostic that decides
    //   plain hash join vs AQE skew split vs j13's explicit salting):
    //   top-5 heaviest keys with exact row shares + the max/mean skew
    //   factor in micro-units, over a deliberately skewed key (30% of
    //   rows collapse onto key 0). One corpus hash-agg; the totals ride
    //   a broadcast scalar join and the rank window sees only 5 rows
    "j24_skew_report" -> Q(
      (s, dir) => graft.ops.JoinOps.skewReport(
        td(s, dir, "lineitem").select(
          when(col("l_orderkey") % 10 < 3, lit(0L))
            .otherwise(col("l_partkey") % 100).as("k")),
        "k", topK = 5),
      Some("""WITH kk AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0
             |    ELSE l_partkey % 100 END AS k FROM lineitem),
             |c AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM kk GROUP BY 1),
             |s AS (SELECT CAST(sum(n) AS BIGINT) AS rows_,
             |    CAST(count(*) AS BIGINT) AS keys_,
             |    CAST(max(n) AS BIGINT) AS mx FROM c),
             |t AS (SELECT k, n,
             |    row_number() OVER (ORDER BY n DESC, k) AS rank FROM c)
             |SELECT CAST(rank AS BIGINT) AS rank, k, n,
             |  CAST(n * 1000000 // rows_ AS BIGINT) AS share_micro,
             |  CAST(mx * 1000000 * keys_ // rows_ AS BIGINT) AS skew_factor_micro
             |FROM t CROSS JOIN s WHERE rank <= 5""".stripMargin)),

    // J14 — as-of (nearest-prior) join: for each order, the latest event of
    //   its user bucket at-or-before the order date; union+window technique,
    //   oracle via DuckDB's native ASOF LEFT JOIN
    "j14_asof_join" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders").select(col("o_orderkey"),
          // NTZ → TZ cast is an identity instant under the UTC session zone
          (col("o_custkey") % 20).as("k"), unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
        val e = Registry.tdEventsUs(s, dir)
          .select((col("user_id") % 20).as("k"), col("ts_us").as("t"), col("event_id"))
          .groupBy("k", "t").agg(max(col("event_id")).as("ev"))
        graft.ops.AsOf.asofBackward(o, e,
            col("k"), col("k"), col("t"), col("t"), Seq("ev" -> col("ev")))
          .select(col("o_orderkey"), col("__asof.ev").as("last_event_id"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey % 20 AS k, epoch_us(o_orderdate) AS t FROM orders),
             |e AS (SELECT user_id % 20 AS k, epoch_us(ts) AS t, max(event_id) AS ev
             |  FROM events GROUP BY 1, 2)
             |SELECT o.o_orderkey, e.ev AS last_event_id
             |FROM o ASOF LEFT JOIN e ON o.k = e.k AND e.t <= o.t""".stripMargin)),

    // j26 — FORWARD as-of join (AsOf.asofForward): each order picks the
    // NEXT event at-or-after its time per key — the "next scheduled
    // event" direction, implemented by time negation over the proven
    // backward plan (one tagged union, one key shuffle, one carry)
    "j26_asof_forward" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders").select(col("o_orderkey"),
          (col("o_custkey") % 20).as("k"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
        val e = Registry.tdEventsUs(s, dir)
          .select((col("user_id") % 20).as("k"), col("ts_us").as("t"), col("event_id"))
          .groupBy("k", "t").agg(max(col("event_id")).as("ev"))
        graft.ops.AsOf.asofForward(o, e,
            col("k"), col("k"), col("t"), col("t"), Seq("ev" -> col("ev")))
          .select(col("o_orderkey"), col("__asof.ev").as("next_event_id"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey % 20 AS k, epoch_us(o_orderdate) AS t FROM orders),
             |e AS (SELECT user_id % 20 AS k, epoch_us(ts) AS t, max(event_id) AS ev
             |  FROM events GROUP BY 1, 2)
             |SELECT o.o_orderkey, e.ev AS next_event_id
             |FROM o ASOF LEFT JOIN e ON o.k = e.k AND e.t >= o.t""".stripMargin)),

    // J15 — binned range join: events falling inside derived order windows;
    //   oracle keeps the plain range predicate as ground truth
    "j15_range_join" -> Q(
      (s, dir) => {
        val e = Registry.tdEventsUs(s, dir)
          .select(col("event_id"), (col("user_id") % 10).as("bucket_id"),
            col("ts_us").as("t"))
        // synthetic 1-hour windows anchored per bucket (deterministic)
        val windows = Registry.tdEventsUs(s, dir)
          .groupBy((col("user_id") % 10).as("wb"))
          .agg(min(col("ts_us")).as("ws"))
          .select(col("wb"), col("ws"), (col("ws") + 3600L * 1000000L).as("we"))
        graft.ops.AsOf.binnedRangeJoin(e, windows,
            col("t"), col("ws"), col("we"), binSize = 600L * 1000000L)
          .filter(col("bucket_id") === col("wb"))
          .select(col("event_id"), col("wb"))
      },
      Some("""WITH e AS (SELECT event_id, user_id % 10 AS bucket_id, epoch_us(ts) AS t FROM events),
             |w AS (SELECT user_id % 10 AS wb, min(epoch_us(ts)) AS ws,
             |  min(epoch_us(ts)) + CAST(3600 AS BIGINT)*1000000 AS we FROM events GROUP BY 1)
             |SELECT e.event_id, w.wb FROM e JOIN w
             |ON e.t >= w.ws AND e.t <= w.we AND e.bucket_id = w.wb""".stripMargin)),

    // J16 — fuzzy join (edit-distance ≤ 1): misspelled nation names joined
    //   back by first-letter equi-key + length band, levenshtein-verified.
    //   The scale shape: candidates come from an EQUI join on a cheap
    //   blocking key (never all-pairs), the expensive distance runs only on
    //   candidates — the standard entity-resolution blocking pattern
    "j16_fuzzy_join" -> Q(
      (s, dir) => {
        val nation = td(s, dir, "nation")
        val mangled = nation.select(col("n_nationkey").as("m_key"),
          // 2-arg substring (to end of string) — the oracle's substr(x, 2)
          // exactly; a capped 3-arg form would silently diverge on long names
          concat(substring(col("n_name"), 1, 1), lit("X"),
            expr("substring(n_name, 2)")).as("m_name"))
        mangled.join(nation.select(col("n_nationkey").as("n_key"), col("n_name")),
            substring(col("m_name"), 1, 1) === substring(col("n_name"), 1, 1))
          .filter(abs(length(col("m_name")) - length(col("n_name"))) <= 1)
          .select(col("m_key"), col("n_key"),
            levenshtein(col("m_name"), col("n_name")).cast("long").as("dist"))
          .filter(col("dist") <= 1)
      },
      Some("""WITH m AS (SELECT n_nationkey AS m_key,
             |  substr(n_name, 1, 1) || 'X' || substr(n_name, 2) AS m_name FROM nation)
             |SELECT m.m_key, n.n_nationkey AS n_key,
             |  CAST(levenshtein(m.m_name, n.n_name) AS BIGINT) AS dist
             |FROM m JOIN nation n ON substr(m.m_name, 1, 1) = substr(n.n_name, 1, 1)
             |WHERE abs(length(m.m_name) - length(n.n_name)) <= 1
             |  AND levenshtein(m.m_name, n.n_name) <= 1""".stripMargin)),

    // J19 — reciprocal-overlap interval join (AsOf.intervalOverlapJoin —
    //   the bedtools intersect -f -r genomic shape): 20-day order windows
    //   vs 14-day shipment windows on a shared key, keep pairs whose
    //   overlap covers ≥50% of BOTH. Candidates from a (key, bin)
    //   equi-join with first-shared-bin dedup (no distinct shuffle); the
    //   oracle is the naive theta join — ground truth the binning must
    //   reproduce exactly
    "j19_interval_overlap" -> Q(
      (s, dir) => {
        val a = td(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("a_id"), (col("o_custkey") % 5).as("ka"),
            datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("sa"))
          .withColumn("ea", col("sa") + 20L)
        val b = td(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
          .select((col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
            (col("l_suppkey") % 5).as("kb"),
            datediff(col("l_shipdate"), lit("1990-01-01")).cast("long").as("sb"))
          .withColumn("eb", col("sb") + 14L)
        graft.ops.AsOf.intervalOverlapJoin(a, b, col("ka"), col("kb"),
            col("sa"), col("ea"), col("sb"), col("eb"),
            binSize = 16L, minOverlapBp = 5000L)
          .select(col("a_id"), col("b_id"), col("overlap_len"))
      },
      Some("""WITH a AS (SELECT o_orderkey AS a_id, o_custkey % 5 AS k,
             |    CAST(date_diff('day', DATE '1990-01-01', o_orderdate::DATE) AS BIGINT) AS s
             |  FROM orders WHERE o_orderkey % 100 = 0),
             |b AS (SELECT l_orderkey * 10 + l_linenumber AS b_id, l_suppkey % 5 AS k,
             |    CAST(date_diff('day', DATE '1990-01-01', l_shipdate::DATE) AS BIGINT) AS s
             |  FROM lineitem WHERE l_orderkey % 10 = 0)
             |SELECT a.a_id, b.b_id,
             |  least(a.s + 20, b.s + 14) - greatest(a.s, b.s) AS overlap_len
             |FROM a JOIN b ON a.k = b.k
             |WHERE least(a.s + 20, b.s + 14) - greatest(a.s, b.s) > 0
             |  AND (least(a.s + 20, b.s + 14) - greatest(a.s, b.s)) * 10000
             |        >= 5000 * 20
             |  AND (least(a.s + 20, b.s + 14) - greatest(a.s, b.s)) * 10000
             |        >= 5000 * 14""".stripMargin)),

    // J20 — Bloom pre-filtered semi join (BloomIndex.bloomSemiJoin): a
    //   ~1%-selective dim (every 97th part key) probes lineitem; the dim
    //   keys fold into one bit_or Bloom whose might-contain test filters
    //   the fact side BEFORE the join exchange — the explicit form of
    //   AQE's runtime filter, and at 100 TB the difference between
    //   shuffling the whole fact table and shuffling ~1% of it. Output is
    //   EXACTLY the plain semi join (no false negatives; false positives
    //   die in the verifying join), which is what the oracle replays —
    //   the Bloom changes where rows drop, never which. eager: the
    //   ⌈mBits/60⌉-word filter collects at construction
    "j20_bloom_semi_join" -> Q(
      (s, dir) => graft.ops.BloomIndex.bloomSemiJoin(
        td(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty")),
        td(s, dir, "part").filter(col("p_partkey") % 97 === 0),
        "l_partkey", "p_partkey"),
      Some("""SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part
             |                    WHERE p_partkey % 97 = 0)""".stripMargin),
      eager = true),

    // J22 — interval COVERAGE histogram (AsOf.intervalCoverage — the
    //   bedtools genomecov sweep-line): 20-day order windows per customer
    //   bucket stack into per-depth covered lengths. Boundary events
    //   (+1/−1) merge per position, ONE key-ordered running sum + lead
    //   closes segments — O(endpoints), never O(covered bases); the
    //   per-base explode this avoids is the classic genome-scale blowup
    "j22_interval_coverage" -> Q(
      (s, dir) => {
        val iv = td(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
          .select((col("o_custkey") % 5).as("k"),
            datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("sa"))
          .withColumn("ea", col("sa") + 20L)
        graft.ops.AsOf.intervalCoverage(iv, col("k"), col("sa"), col("ea"))
      },
      Some("""WITH iv AS (SELECT o_custkey % 5 AS k,
             |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS sa
             |  FROM orders WHERE o_orderkey % 10 = 0),
             |ev AS (SELECT k, sa AS pos, 1 AS d FROM iv
             |       UNION ALL SELECT k, sa + 20, -1 FROM iv),
             |pts AS (SELECT k, pos, sum(d) AS dd FROM ev GROUP BY 1, 2),
             |seg AS (SELECT k, pos,
             |    sum(dd) OVER (PARTITION BY k ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth,
             |    lead(pos) OVER (PARTITION BY k ORDER BY pos) AS next
             |  FROM pts)
             |SELECT k, CAST(depth AS BIGINT) AS depth,
             |  CAST(sum(next - pos) AS BIGINT) AS covered_len
             |FROM seg WHERE next IS NOT NULL AND depth > 0
             |GROUP BY 1, 2""".stripMargin)),

    // J23 — interval MERGE into maximal islands (AsOf.mergeIntervals —
    //   gaps-and-islands / bedtools merge): 20-day order windows per
    //   customer bucket coalesce into covered spans. Running-max-end lag
    //   + island-id running sum on ONE per-key window sort, then a
    //   hash-agg reusing the partitioning — no explode, no self-join,
    //   island size bounded by interval count not span length
    "j23_interval_merge" -> Q(
      (s, dir) => {
        val iv = td(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
          .select((col("o_custkey") % 5).as("k"),
            datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("sa"))
          .withColumn("ea", col("sa") + 20L)
        graft.ops.AsOf.mergeIntervals(iv, col("k"), col("sa"), col("ea"))
      },
      Some("""WITH iv AS (SELECT o_custkey % 5 AS k,
             |    CAST(datediff('day', DATE '1990-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS s
             |  FROM orders WHERE o_orderkey % 10 = 0),
             |m AS (SELECT k, s, s + 20 AS e,
             |    max(s + 20) OVER (PARTITION BY k ORDER BY s, s + 20
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
             |  FROM iv),
             |g AS (SELECT k, s, e,
             |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY k ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM m)
             |SELECT k, min(s) AS island_start, max(e) AS island_end,
             |  CAST(count(*) AS BIGINT) AS n_intervals
             |FROM g GROUP BY k, island""".stripMargin)),

    // j25 — interval COMPLEMENT (bedtools-complement over the covered
    // span; graft/ops/AsOf.intervalGaps): the gaps BETWEEN j23's merged
    // islands — the uncovered-region QC a genome-coverage build reports.
    // Same fixture as j23; every gap has length >= 1 by construction
    // (touching intervals already merged)
    "j25_interval_gaps" -> Q(
      (s, dir) => {
        val iv = td(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
          .select((col("o_custkey") % 5).as("k"),
            datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("sa"))
          .withColumn("ea", col("sa") + 20L)
        graft.ops.AsOf.intervalGaps(iv, col("k"), col("sa"), col("ea"))
      },
      Some("""WITH iv AS (SELECT o_custkey % 5 AS k,
             |    CAST(datediff('day', DATE '1990-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS s
             |  FROM orders WHERE o_orderkey % 10 = 0),
             |m AS (SELECT k, s, s + 20 AS e,
             |    max(s + 20) OVER (PARTITION BY k ORDER BY s, s + 20
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
             |  FROM iv),
             |g AS (SELECT k, s, e,
             |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY k ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM m),
             |isl AS (SELECT k, min(s) AS island_start, max(e) AS island_end
             |  FROM g GROUP BY k, island),
             |x AS (SELECT k, island_end,
             |    lead(island_start) OVER (PARTITION BY k ORDER BY island_start) AS next_start
             |  FROM isl)
             |SELECT k, CAST(island_end AS BIGINT) AS gap_start,
             |  CAST(next_start AS BIGINT) AS gap_end,
             |  CAST(next_start - island_end AS BIGINT) AS gap_len
             |FROM x WHERE next_start IS NOT NULL""".stripMargin)),

    // J21 — TEMPORAL dimension join (Scd.temporalJoin): each fact picks
    //   the SCD2 version current AT ITS TIME — key equi-join + interval
    //   filter, deliberately NOT a range join (the key carries the
    //   selectivity; versions per key are a handful). Two-version fixture:
    //   k%3 keys re-versioned at t=50 with half-open boundary semantics
    //   (a fact AT t=50 sees the new version); oracle derives the expected
    //   segment from the same closed-form version split
    "j21_temporal_dim_join" -> Q(
      (s, dir) => {
        val c = td(s, dir, "customer")
        val v1 = c.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("seg"), lit(0L).as("valid_from"),
          when(col("c_custkey") % 3 === 0, lit(50L)).otherwise(lit(null).cast("long"))
            .as("valid_to"))
        val v2 = c.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"),
            concat(col("c_mktsegment"), lit("-U")).as("seg"),
            lit(50L).as("valid_from"), lit(null).cast("long").as("valid_to"))
        val history = v1.unionByName(v2)
        val facts = td(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey").as("ck"), (col("o_orderkey") % 100).as("t"))
        graft.ops.Scd.temporalJoin(facts, history, "ck", "t", "k")
          .select(col("o_orderkey"), col("ck"), col("t").cast("long").as("t"),
            col("seg"))
      },
      Some("""SELECT f.o_orderkey, f.ck, CAST(f.t AS BIGINT) AS t,
             |  CASE WHEN c.c_custkey % 3 = 0 AND f.t >= 50
             |       THEN c.c_mktsegment || '-U'
             |       ELSE c.c_mktsegment END AS seg
             |FROM (SELECT o_orderkey, o_custkey AS ck, o_orderkey % 100 AS t
             |      FROM orders) f
             |JOIN customer c ON f.ck = c.c_custkey""".stripMargin)),

    // J17 — Jaro–Winkler fuzzy record linkage at part scale (20k–200k
    //   rows, vs j16's 25-row nation demo): a swap-corrupted twin of every
    //   part record resolves to its BEST registry match. Scored once per
    //   DISTINCT name pair (the fixture's names repeat up to 347×; the
    //   r9 pair-level form's output grew quadratically in that duplication
    //   — 6.3M rows at sf0.1 — and benched a 27.7× ×10-data hop), then
    //   fanned back to records by one name equi-join. Native exact-rational
    //   JaroWinklerMicro scoring, DuckDB jaro_winkler_similarity oracle,
    //   levenshtein kept for audit. Output: one row per resolved record.
    "j17_jw_linkage" -> Q(
      (s, dir) => {
        val part = td(s, dir, "part")
        val mangled = part.select(col("p_partkey").as("m_key"),
          graft.ops.Linkage.swap34(col("p_name"), "p_name").as("m_name"))
        graft.ops.Linkage.jwResolveBest(s,
          mangled, "m_key", "m_name",
          part, "p_partkey", "p_name",
          minJwMicro = 900000L)
      },
      Some("""WITH m AS (SELECT p_partkey AS m_key,
             |  substr(p_name, 1, 2) || substr(p_name, 4, 1) || substr(p_name, 3, 1) || substr(p_name, 5) AS m_name
             |  FROM part),
             |dm AS (SELECT DISTINCT m_name FROM m),
             |dr AS (SELECT p_name AS cand_name, min(p_partkey) AS cand_key FROM part GROUP BY p_name),
             |scored AS (SELECT dm.m_name, dr.cand_name, dr.cand_key,
             |    CAST(round(jaro_winkler_similarity(dm.m_name, dr.cand_name) * 1000000) AS BIGINT) AS jw_micro
             |  FROM dm JOIN dr
             |    ON substr(dm.m_name, 1, 2) = substr(dr.cand_name, 1, 2)
             |   AND length(dm.m_name) = length(dr.cand_name)
             |  WHERE round(jaro_winkler_similarity(dm.m_name, dr.cand_name) * 1000000) >= 900000),
             |best AS (SELECT m_name, cand_key, jw_micro,
             |    CAST(levenshtein(m_name, cand_name) AS BIGINT) AS dist,
             |    row_number() OVER (PARTITION BY m_name ORDER BY jw_micro DESC, cand_key) AS rn
             |  FROM scored)
             |SELECT m.m_key, b.cand_key, b.jw_micro, b.dist
             |FROM m JOIN best b ON m.m_name = b.m_name AND b.rn = 1""".stripMargin)),

    // J18 — nearest-event join (BIDIRECTIONAL as-of; sensor-alignment /
    //   log-correlation shape): each click attaches its |Δt|-closest view
    //   by the same user, either direction, ties to the prior side. One
    //   tagged-union shuffle on the user key (AsOf.nearestJoin) — the
    //   oracle replays it as a pairwise rank, which the engine must never
    //   do at scale. Views deduped to one per (user, ts) first (the
    //   operator's determinism contract)
    "j18_nearest_event" -> Q(
      (s, dir) => {
        val e = Registry.tdEventsUs(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts_us").as("click_us"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id").as("v_user"), col("ts_us").as("view_us"))
          .agg(min(col("event_id")).as("view_id"))
        graft.ops.AsOf.nearestJoin(clicks, views,
            col("user_id"), col("v_user"), col("click_us"), col("view_us"),
            Seq("view_id" -> col("view_id")))
          .select(col("click_id"), col("user_id"),
            col("__near.view_id").as("view_id"), col("__dt").as("dt_us"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
             |  FROM events),
             |c AS (SELECT event_id AS click_id, user_id, us AS click_us
             |  FROM ev WHERE event_type = 'click'),
             |v AS (SELECT user_id, us AS view_us, CAST(min(event_id) AS BIGINT) AS view_id
             |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
             |j AS (SELECT c.click_id, c.user_id, c.click_us, v.view_id, v.view_us
             |  FROM c LEFT JOIN v ON c.user_id = v.user_id),
             |r AS (SELECT click_id, user_id, view_id, view_us - click_us AS dt_us,
             |    row_number() OVER (PARTITION BY click_id
             |      ORDER BY abs(view_us - click_us) NULLS LAST, view_us - click_us) AS rn
             |  FROM j)
             |SELECT click_id, user_id, view_id, dt_us FROM r WHERE rn = 1""".stripMargin)),

    // C12 — null-column pruning pre-pass (A2-driven,
    //   create_tables_clinical_gdc.py:155-244): the all-null column must
    //   vanish from the output schema
    "c12_prune_null_columns" -> Q(
      (s, dir) => {
        val df = td(s, dir, "customer").select(
          col("c_custkey"), col("c_name"),
          lit(null).cast("string").as("dead_column"),
          nullif(col("c_mktsegment"), lit("__NEVER__")).as("live_column"))
        Clinical.pruneNullColumns(df)
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment AS live_column FROM customer""".stripMargin)),

    // C13 — file-metadata DAG (SURVEY §3.2, create_tables_file_metadata_gdc
    //   .py:78-438): base + aggregate branches LEFT-joined, STRING_AGG
    //   columns collapsed to 'multi' past MAX_CONCAT_COUNT, values
    //   normalized — the reference's seven-query driver merge as ONE plan
    "c13_file_metadata_dag" -> Q(
      (s, dir) => {
        val o = td(s, dir, "orders")
        val l = tdw(s, dir, "lineitem")
        val acl = l.groupBy(col("l_orderkey").as("k1"))
          .agg(Agg.stringAggDistinctOrdered(concat(lit("acl-"), col("l_suppkey")), ";").as("acl_ids"))
        val parts = l.groupBy(col("l_orderkey").as("k2"))
          .agg(Agg.stringAggDistinctOrdered(col("l_partkey").cast("string"), ";").as("part_ids"),
            count(lit(1)).cast("long").as("n_items"))
        o.join(acl, o("o_orderkey") === col("k1"), "left")
          .join(parts, o("o_orderkey") === col("k2"), "left")
          .select(o("o_orderkey"),
            // default must NOT be a normalize null-marker ('none' would → NULL)
            Normalize.normalizeValue(coalesce(col("acl_ids"), lit("unmapped"))).as("acl_ids"),
            Normalize.convertConcatToMulti(col("part_ids")).as("part_ids"),
            coalesce(col("n_items"), lit(0L)).as("n_items"))
      },
      Some("""WITH acl AS (SELECT l_orderkey,
             |  string_agg(DISTINCT 'acl-' || l_suppkey, ';' ORDER BY 'acl-' || l_suppkey) AS acl_ids
             |  FROM lineitem GROUP BY 1),
             |parts AS (SELECT l_orderkey,
             |  string_agg(DISTINCT CAST(l_partkey AS VARCHAR), ';' ORDER BY CAST(l_partkey AS VARCHAR)) AS part_ids,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  count(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY 1)
             |SELECT o_orderkey, COALESCE(acl_ids, 'unmapped') AS acl_ids,
             |  CASE WHEN n_parts > 8 THEN 'multi' ELSE part_ids END AS part_ids,
             |  COALESCE(n_items, 0) AS n_items
             |FROM orders
             |LEFT JOIN acl ON o_orderkey = acl.l_orderkey
             |LEFT JOIN parts ON o_orderkey = parts.l_orderkey""".stripMargin))
  )
}
