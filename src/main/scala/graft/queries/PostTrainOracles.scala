package graft.queries

/**
 * DuckDB oracles for the post-training family that need multi-CTE
 * assembly (round 13). Only exact integer/HUGEINT arithmetic — every
 * division is `//` (truncation toward zero; all quantities non-negative
 * here, so it equals the engine's BigInt `/`).
 */
object PostTrainOracles {

  /** l126 twin: the Bradley–Terry MM recurrence of
    * `PreferenceRank.bradleyTerry`, rounds UNROLLED as chained CTEs (an
    * aggregate per round can't live inside one recursive CTE term — the
    * l125 precedent). The preference fixture (first-event-wins per user,
    * ties dropped) is replayed verbatim. */
  def bradleyTerrySql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = if (r == 1) "w0" else s"w${r - 1}"
      s"""d$r AS MATERIALIZED (SELECT cm.i AS it,
         |    sum((cm.c * CAST('1000000000000' AS HUGEINT)) // (wi.w + wj.w)) AS d
         |  FROM cm JOIN $prev wi ON wi.it = cm.i JOIN $prev wj ON wj.it = cm.j
         |  GROUP BY 1),
         |wp$r AS MATERIALIZED (SELECT d.it, greatest(CAST(1 AS HUGEINT),
         |    (COALESCE(wn.wi, CAST(0 AS HUGEINT)) * CAST('1000000000000' AS HUGEINT)) // d.d) AS w
         |  FROM d$r d LEFT JOIN wn ON wn.it = d.it),
         |s$r AS MATERIALIZED (SELECT sum(w) AS s FROM wp$r),
         |w$r AS MATERIALIZED (SELECT it, greatest(CAST(1 AS HUGEINT),
         |    (CAST(1000000 AS HUGEINT) * w) // s) AS w FROM wp$r, s$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ft AS MATERIALIZED (SELECT user_id, event_type, min(epoch_us(ts)) AS t0
       |  FROM events GROUP BY 1, 2),
       |p AS MATERIALIZED (SELECT
       |    CASE WHEN a.t0 < b.t0 THEN a.event_type ELSE b.event_type END AS winner,
       |    CASE WHEN a.t0 < b.t0 THEN b.event_type ELSE a.event_type END AS loser
       |  FROM ft a JOIN ft b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  WHERE a.t0 <> b.t0),
       |c0 AS MATERIALIZED (SELECT winner, loser, CAST(count(*) AS HUGEINT) AS n
       |  FROM p GROUP BY 1, 2),
       |items AS MATERIALIZED (SELECT winner AS it FROM c0 UNION SELECT loser FROM c0),
       |cm AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS HUGEINT) AS c FROM (
       |    SELECT winner AS i, loser AS j, n FROM c0
       |    UNION ALL SELECT loser, winner, n FROM c0) GROUP BY 1, 2),
       |wn AS MATERIALIZED (SELECT winner AS it, CAST(sum(n) AS HUGEINT) AS wi FROM c0 GROUP BY 1),
       |ls AS MATERIALIZED (SELECT loser AS it, CAST(sum(n) AS HUGEINT) AS li FROM c0 GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT it, CAST(1000000 AS HUGEINT) AS w FROM items),
       |$roundCtes
       |SELECT i.it AS item,
       |  CAST(COALESCE(wn.wi, 0) AS BIGINT) AS wins,
       |  CAST(COALESCE(ls.li, 0) AS BIGINT) AS losses,
       |  CAST(w.w AS BIGINT) AS weight_micro
       |FROM items i
       |LEFT JOIN wn ON wn.it = i.it
       |LEFT JOIN ls ON ls.it = i.it
       |JOIN w$rounds w ON w.it = i.it""".stripMargin
  }

  /** Shared labeling fixture for l131/l132: events become a
    * (item, annotator, label) table, one label per (item, annotator) by
    * keep-first on (ts, event_id) — the Annotation.scala input contract. */
  private def labCte(nItems: Int, nAnnotators: Int): String =
    s"""lab AS MATERIALIZED (SELECT item, annot, label FROM (
       |    SELECT event_id % $nItems AS item, user_id % $nAnnotators AS annot,
       |      event_type AS label,
       |      row_number() OVER (PARTITION BY event_id % $nItems,
       |        user_id % $nAnnotators ORDER BY ts, event_id) AS rn
       |    FROM events) WHERE rn = 1)""".stripMargin

  /** l131 twin: pairwise Cohen's kappa of `Annotation.cohenKappaPairs`
    * over the keep-first label fixture. All divisions `//` over HUGEINT
    * products (non-negative), mirroring the DECIMAL(38,0) `div` chain. */
  def annotatorAgreementSql(nItems: Int, nAnnotators: Int): String =
    s"""WITH ${labCte(nItems, nAnnotators)},
       |cm AS MATERIALIZED (SELECT a.annot AS annotator_a, b.annot AS annotator_b,
       |    a.label AS la, b.label AS lb, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lab a JOIN lab b ON a.item = b.item AND a.annot < b.annot
       |  GROUP BY 1, 2, 3, 4),
       |base AS (SELECT annotator_a, annotator_b,
       |    CAST(sum(cnt) AS BIGINT) AS n_items,
       |    CAST(sum(CASE WHEN la = lb THEN cnt ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM cm GROUP BY 1, 2),
       |ma AS (SELECT annotator_a, annotator_b, la AS c, sum(cnt) AS na
       |  FROM cm GROUP BY 1, 2, 3),
       |mb AS (SELECT annotator_a, annotator_b, lb AS c, sum(cnt) AS nb
       |  FROM cm GROUP BY 1, 2, 3),
       |pe AS (SELECT annotator_a, annotator_b,
       |    sum(CAST(na AS HUGEINT) * nb) AS pe_num
       |  FROM ma JOIN mb USING (annotator_a, annotator_b, c) GROUP BY 1, 2)
       |SELECT b.annotator_a, b.annotator_b, n_items, n_agree,
       |  CAST(10000 * CAST(n_agree AS HUGEINT) // n_items AS BIGINT) AS po_bp,
       |  CASE WHEN CAST(n_items AS HUGEINT) * n_items
       |      <> COALESCE(pe_num, CAST(0 AS HUGEINT))
       |    THEN CAST(1000000 * (CAST(n_items AS HUGEINT) * n_agree
       |        - COALESCE(pe_num, CAST(0 AS HUGEINT)))
       |      // (CAST(n_items AS HUGEINT) * n_items
       |        - COALESCE(pe_num, CAST(0 AS HUGEINT))) AS BIGINT)
       |  END AS kappa_micro
       |FROM base b LEFT JOIN pe USING (annotator_a, annotator_b)""".stripMargin

  /** l132 twin: majority-vote resolution of `Annotation.resolveLabels`
    * (ties to the LARGEST label) over the same keep-first fixture. */
  def labelResolutionSql(nItems: Int, nAnnotators: Int): String =
    s"""WITH ${labCte(nItems, nAnnotators)},
       |votes AS (SELECT item, label AS lb, CAST(count(*) AS BIGINT) AS v
       |  FROM lab GROUP BY 1, 2),
       |st AS (SELECT item, lb, v,
       |    max(v) OVER (PARTITION BY item) AS maxv,
       |    sum(v) OVER (PARTITION BY item) AS nv,
       |    CAST(count(*) OVER (PARTITION BY item) AS BIGINT) AS nlb
       |  FROM votes),
       |nt AS (SELECT item, CAST(count(*) AS BIGINT) AS ntop
       |  FROM st WHERE v = maxv GROUP BY 1)
       |SELECT st.item, max(st.lb) AS label,
       |  CAST(max(st.nv) AS BIGINT) AS n_votes,
       |  max(st.nlb) AS n_distinct_labels,
       |  CAST(max(st.maxv) AS BIGINT) AS top_votes,
       |  CAST(10000 * CAST(max(st.maxv) AS HUGEINT) // max(st.nv) AS BIGINT)
       |    AS confidence_bp,
       |  max(nt.ntop) > 1 AS tied,
       |  max(st.maxv) = max(st.nv) AS unanimous
       |FROM st JOIN nt ON nt.item = st.item
       |WHERE st.v = st.maxv
       |GROUP BY st.item""".stripMargin

  /** l133 twin: the length-bias audit of `Annotation.lengthBiasAudit`
    * over best-vs-worst pairs scored by DISTINCT-WORD count (so length
    * correlates with, but does not determine, the preference — the
    * signal the audit exists to measure). Bucket arithmetic and both
    * rates replay the exact HUGEINT `//` chain; the grand-total row is
    * bucket = -1. */
  def lengthBiasSql(nPrompts: Int): String =
    s"""WITH c AS MATERIALIZED (SELECT doc_id % $nPrompts AS prompt_id,
       |    doc_id AS cid,
       |    CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS score,
       |    CAST(length(text) AS BIGINT) AS len
       |  FROM documents WHERE text IS NOT NULL),
       |r AS (SELECT prompt_id, len, score, cid,
       |    row_number() OVER (PARTITION BY prompt_id
       |      ORDER BY score DESC, cid DESC) AS rb,
       |    row_number() OVER (PARTITION BY prompt_id
       |      ORDER BY score ASC, cid ASC) AS rw
       |  FROM c),
       |p AS (SELECT prompt_id,
       |    max(CASE WHEN rb = 1 THEN len END) AS cl,
       |    max(CASE WHEN rw = 1 THEN len END) AS rl
       |  FROM r GROUP BY 1),
       |b AS (SELECT
       |    CASE WHEN greatest(cl, rl) = 0 THEN CAST(9 AS BIGINT)
       |      ELSE least(CAST(9 AS BIGINT),
       |        CAST(10000 * CAST(least(cl, rl) AS HUGEINT)
       |          // greatest(cl, rl) // 1000 AS BIGINT)) END AS bucket,
       |    CASE WHEN cl > rl THEN 1 ELSE 0 END AS lc,
       |    CASE WHEN cl <> rl THEN 1 ELSE 0 END AS hg,
       |    cl - rl AS gap
       |  FROM p),
       |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(lc) AS BIGINT) AS longer_chosen,
       |    CAST(sum(hg) AS BIGINT) AS n_unequal,
       |    CAST(sum(gap) AS BIGINT) AS gap_sum
       |  FROM b GROUP BY 1
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
       |    CAST(sum(lc) AS BIGINT), CAST(sum(hg) AS BIGINT),
       |    CAST(sum(gap) AS BIGINT)
       |  FROM b)
       |SELECT bucket, n_pairs, longer_chosen,
       |  CASE WHEN n_unequal > 0 THEN
       |    CAST(10000 * CAST(longer_chosen AS HUGEINT) // n_unequal AS BIGINT)
       |  END AS longer_chosen_bp,
       |  CAST(1000 * CAST(gap_sum AS HUGEINT) // n_pairs AS BIGINT)
       |    AS mean_gap_milli
       |FROM g""".stripMargin
}
