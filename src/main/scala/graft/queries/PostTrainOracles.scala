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
}
